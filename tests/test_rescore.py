"""Phase-B rescore kernel vs the literal reference-translation oracle."""
import numpy as np
import pytest

from burst_tpu.alphabet import score_matrix
from burst_tpu.kernels.refdp import rescore as oracle_rescore
from burst_tpu.kernels.refdp import edit_distance_glocal
from burst_tpu.kernels.rescore import rescore_pairs

SM = score_matrix()
SM_Y = score_matrix(0)


def rand_codes(rng, n, ambig=False):
    return rng.integers(1, 16 if ambig else 5, size=n).astype(np.uint8)


def run_batch(cases, smat):
    """cases: list of (q, r, max_ed). Pads into one bucket and runs kernel."""
    W = max(-(-len(q) // 32) for q, _, _ in cases)
    m_pad = W * 32
    Lp = max(len(r) for _, r, _ in cases) + m_pad
    Lp = -(-Lp // 64) * 64
    P = len(cases)
    qs = np.zeros((P, m_pad), np.uint8)
    ts = np.zeros((P, Lp), np.uint8)
    qlens = np.zeros(P, np.int32)
    meds = np.zeros(P, np.int32)
    for i, (q, r, me) in enumerate(cases):
        qs[i, :len(q)] = q
        ts[i, :len(r)] = r
        qlens[i] = len(q)
        meds[i] = me
    return rescore_pairs(qs, qlens, ts, meds, W, smat)


@pytest.mark.parametrize("seed,ambig,smat", [
    (0, False, SM), (1, True, SM), (2, False, SM_Y), (3, True, SM_Y),
])
def test_rescore_matches_oracle_random(seed, ambig, smat):
    rng = np.random.default_rng(seed)
    cases, expects = [], []
    for _ in range(24):
        m = int(rng.integers(2, 70))
        L = int(rng.integers(2, 110))
        q = rand_codes(rng, m, ambig)
        r = rand_codes(rng, L, ambig)
        ed = edit_distance_glocal(q, r, smat)
        if ed > 250:
            continue
        max_ed = min(254, ed + int(rng.integers(0, 4)))
        cases.append((q, r, max_ed))
        expects.append(oracle_rescore(q, r, max_ed, smat))
    ed, gq, gr, fp, sc = run_batch(cases, smat)
    for i, ex in enumerate(expects):
        assert ed[i] == ex["ed"], i
        assert gq[i] == ex["gap_q"], i
        assert gr[i] == ex["gap_r"], i
        assert fp[i] == ex["final_pos"], i
        assert sc[i] == ex["score"], i


def test_rescore_near_matches_with_gaps():
    rng = np.random.default_rng(9)
    cases, expects = [], []
    for _ in range(16):
        L = 200
        r = rand_codes(rng, L)
        st = int(rng.integers(0, 80))
        q = list(r[st:st + 90])
        # random small edits
        for _ in range(int(rng.integers(0, 4))):
            op = rng.integers(0, 3)
            p = int(rng.integers(0, len(q) - 1))
            if op == 0:
                q[p] = 1 + ((q[p] + 1) % 4)
            elif op == 1:
                q.insert(p, int(rng.integers(1, 5)))
            else:
                del q[p]
        q = np.array(q, np.uint8)
        ed = edit_distance_glocal(q, r, SM)
        max_ed = min(254, ed)
        cases.append((q, r, max_ed))
        expects.append(oracle_rescore(q, r, max_ed, SM))
    ed, gq, gr, fp, sc = run_batch(cases, SM)
    for i, ex in enumerate(expects):
        assert (ed[i], gq[i], gr[i], fp[i]) == \
            (ex["ed"], ex["gap_q"], ex["gap_r"], ex["final_pos"]), i
        assert sc[i] == ex["score"], i


def test_mixed_query_lengths_same_bucket():
    rng = np.random.default_rng(21)
    cases, expects = [], []
    for m in (33, 40, 50, 64, 63, 34):
        q = rand_codes(rng, m)
        r = rand_codes(rng, 100)
        ed = edit_distance_glocal(q, r, SM)
        cases.append((q, r, min(254, ed + 1)))
        expects.append(oracle_rescore(q, r, min(254, ed + 1), SM))
    ed, gq, gr, fp, sc = run_batch(cases, SM)
    for i, ex in enumerate(expects):
        assert (ed[i], gq[i], gr[i], fp[i], sc[i]) == \
            (ex["ed"], ex["gap_q"], ex["gap_r"], ex["final_pos"], ex["score"]), i


def test_wide_packing_long_query():
    """Queries past the 511-row packed-key limit use the 4-plane wide
    comparison; stats must match the narrow path run on a padded-up
    tile (both exact)."""
    import numpy as np

    from burst_tpu.alphabet import score_matrix
    from burst_tpu.kernels.rescore import rescore_pairs

    rng = np.random.default_rng(11)
    qlen = 600                       # W = 19 -> m_pad 608 > 511 (wide)
    ref = rng.integers(1, 5, size=900).astype(np.uint8)
    q = ref[100:100 + qlen].copy()
    for p in rng.integers(0, qlen, size=5):
        q[p] = rng.integers(1, 5)
    q2 = np.concatenate([ref[150:150 + 300], ref[500:500 + 300]]
                        ).astype(np.uint8)
    W = -(-qlen // 32)
    m_pad = W * 32
    tiles = np.zeros((2, 900 + m_pad), np.uint8)
    tiles[0, :900] = ref
    tiles[1, :900] = ref
    queries = np.zeros((2, m_pad), np.uint8)
    queries[0, :qlen] = q
    queries[1, :600] = q2
    qlens = np.array([qlen, 600], np.int64)
    max_ed = np.array([200, 200], np.int64)
    ed, gq, gr, fp, sc = rescore_pairs(queries, qlens, tiles, max_ed, W,
                                       score_matrix())
    # oracle: exact tie-aware DP
    from burst_tpu.kernels.refdp import rescore as ref_rescore
    for i, qq in enumerate((q, q2)):
        o = ref_rescore(qq, ref, int(max_ed[i]))
        assert ed[i] == o["ed"], (i, ed[i], o["ed"])
        assert gq[i] == o["gap_q"] and gr[i] == o["gap_r"], i
        assert fp[i] == o["final_pos"], (i, fp[i], o["final_pos"])
