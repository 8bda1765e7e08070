"""Validate the numpy DP oracle against brute-force references."""
import numpy as np
import pytest

from burst_tpu.alphabet import score_matrix, translate_str
from burst_tpu.kernels.refdp import edit_distance_glocal, rescore

SM = score_matrix()          # default: N penalized (Z=1)
SM_Y = score_matrix(0)       # '-y': N/X wildcard


def brute_glocal_ed(q, r, smat):
    """Textbook O(m*L) DP, row 0 = 0 (free ref start), min over last row.

    Matches the reference's cost model: cost 255 (pad) acts as infinity.
    """
    m, L = len(q), len(r)
    INF = 1 << 20
    prev = [0] * (L + 1)
    for y in range(1, m + 1):
        cur = [y] + [0] * L
        for x in range(1, L + 1):
            c = int(smat[q[y - 1], r[x - 1]])
            c = INF if c == 255 else c
            cur[x] = min(prev[x - 1] + c, prev[x] + 1, cur[x - 1] + 1, INF)
        prev = cur
    return min(prev[1:]) if L else m


def rand_codes(rng, n, ambig=False):
    hi = 16 if ambig else 5
    return rng.integers(1, hi, size=n).astype(np.uint8)


@pytest.mark.parametrize("seed", range(8))
def test_ed_matches_bruteforce_random(seed):
    rng = np.random.default_rng(seed)
    for _ in range(10):
        m = int(rng.integers(1, 40))
        L = int(rng.integers(1, 60))
        q = rand_codes(rng, m, ambig=seed % 2)
        r = rand_codes(rng, L, ambig=seed % 2)
        sm = SM if seed % 3 else SM_Y
        assert edit_distance_glocal(q, r, sm) == brute_glocal_ed(q, r, sm)


def test_ed_exact_substring():
    r = translate_str("ACGTACGTTTGCAGGCAT")
    q = r[5:14].copy()
    assert edit_distance_glocal(q, r, SM) == 0


def test_ed_planted_errors():
    rng = np.random.default_rng(0)
    r = rand_codes(rng, 500)
    q = r[100:250].copy()
    # plant 3 substitutions with guaranteed letter change
    for pos in (10, 70, 120):
        q[pos] = 1 + (q[pos] % 4)
        assert q[pos] != r[100 + pos] or True
    ed = edit_distance_glocal(q, r, SM)
    assert ed <= 3


def test_n_penalty_modes():
    q = translate_str("ACGNNACGT")
    r = translate_str("ACGTTACGT")
    assert edit_distance_glocal(q, r, SM) == 2      # N costs Z=1 each
    assert edit_distance_glocal(q, r, SM_Y) == 0    # N matches anything


def test_iupac_compat():
    # R matches A and G at cost 0; mismatches C/T
    q = translate_str("R")
    assert edit_distance_glocal(q, translate_str("A"), SM) == 0
    assert edit_distance_glocal(q, translate_str("G"), SM) == 0
    assert edit_distance_glocal(q, translate_str("C"), SM) == 1


def test_rescore_agrees_with_ed():
    rng = np.random.default_rng(42)
    for _ in range(20):
        m = int(rng.integers(2, 40))
        L = int(rng.integers(2, 60))
        q = rand_codes(rng, m)
        r = rand_codes(rng, L)
        ed = edit_distance_glocal(q, r, SM)
        if ed > 200:
            continue
        res = rescore(q, r, max_ed=max(ed, 1), smat=SM)
        assert res["ed"] == ed


def test_rescore_identity_formula():
    # perfect match: ed 0, gaps 0, score 1.0, final_pos = end of match
    r = translate_str("ACGTACGTTTGCAGGCAT")
    q = r[5:14].copy()
    res = rescore(q, r, max_ed=1)
    assert res["ed"] == 0 and res["gap_q"] == 0 and res["gap_r"] == 0
    assert res["score"] == np.float32(1.0)
    assert res["final_pos"] == 14  # 1-based end column


def test_rescore_gap_tiebreak_prefers_longer_alignment():
    # query has an extra letter vs a window of ref: one ref gap (gap_r)
    r = translate_str("AAAACGTACGTAAAA")
    q = translate_str("ACGTTACGT")  # insertion of T relative to ref window
    res = rescore(q, r, max_ed=2)
    assert res["ed"] == 1
    assert res["gap_r"] == 1 and res["gap_q"] == 0
    # identity = 1 - 1/(9+0)
    assert res["score"] == np.float32(1.0) - np.float32(1.0) / np.float32(9)


def test_rescore_query_gap_counts():
    # query missing a letter vs ref window: one query gap
    r = translate_str("AAAACGTTACGTAAAA")
    q = translate_str("ACGTACGT")
    res = rescore(q, r, max_ed=2)
    assert res["ed"] == 1
    assert res["gap_q"] == 1 and res["gap_r"] == 0
    assert res["score"] == np.float32(1.0) - np.float32(1.0) / np.float32(9)
