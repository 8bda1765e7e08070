"""Alignment engine: bucketed phase-A scan + phase-B rescore -> result pods.

This is the TPU-native replacement for the reference's do_alignments
orchestrator (/root/reference/burst.c:3632-4521). Instead of the
reference's sequential clump sweep with prefix-seek stacks, all
(unique-query x reference-unit) pairs are evaluated in batched device
kernels; budgets, tie selection and pod ordering are applied afterwards
on the result matrix, which reproduces the reference's surviving pod set
and its single-thread full-path insertion order exactly
(pods sorted by descending (clump, query-row, lane)).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .alphabet import score_matrix
from .kernels import myers
from .kernels.rescore import rescore_pairs
from .process import QueryData, RefData

VECSZ = 16  # the reference's clump width; defines pod ordering only


@dataclasses.dataclass
class Pods:
    """Columnar result pods (one row per surviving (query, unit) hit)."""
    six: np.ndarray        # base unique-query index
    juni: np.ndarray       # unibin row (fwd: six, rc: six + numUniq)
    refpos: np.ndarray     # position in sorted/dedup unit order ("refIx")
    ed: np.ndarray         # mismatches (total edit distance)
    rc: np.ndarray
    gap_q: np.ndarray
    gap_r: np.ndarray
    final_pos: np.ndarray
    score: np.ndarray      # float32 identity


def _bucket_queries(qd: QueryData):
    """Group unibin rows by Myers word count W."""
    buckets: dict[int, list[int]] = {}
    for j, s in enumerate(qd.seqs):
        buckets.setdefault(myers.words_for(len(s)), []).append(j)
    return buckets


def _bucket_units(rd: RefData, granularity: int = 64):
    """Group sorted unit positions by padded tile length."""
    buckets: dict[int, list[int]] = {}
    for p in range(rd.tot_units):
        ln = int(rd.lens[rd.ix_srt[p]])
        lb = -(-max(ln, 1) // granularity) * granularity
        buckets.setdefault(lb, []).append(p)
    return buckets


QCHUNK = 2048   # canonical query-block height (fixed shapes -> one compile)
TCHUNK = 512    # canonical tile-block width


def compute_ed_matrix(qd: QueryData, rd: RefData,
                      smat: np.ndarray | None = None) -> np.ndarray:
    """Phase A: [numUnibins, tot_units] uint8 min-ED matrix (clipped 255)."""
    if smat is None:
        smat = score_matrix()
    nj = len(qd.seqs)
    ed = np.full((nj, rd.tot_units), 255, dtype=np.uint8)
    qbuckets = _bucket_queries(qd)
    ubuckets = _bucket_units(rd)
    for W, rows in sorted(qbuckets.items()):
        m_pad = W * 32
        qarr = np.zeros((len(rows), m_pad), dtype=np.uint8)
        qlens = np.zeros(len(rows), dtype=np.int64)
        for i, j in enumerate(rows):
            s = qd.seqs[j]
            qarr[i, : len(s)] = s
            qlens[i] = len(s)
        peq = myers.build_peq(qarr, qlens, W, smat)
        for lb, poss in sorted(ubuckets.items()):
            lp = lb + 32
            tiles = np.zeros((len(poss), lp), dtype=np.uint8)
            for i, p in enumerate(poss):
                s = rd.seqs[rd.ix_srt[p]]
                tiles[i, : len(s)] = s
            qchunk = min(QCHUNK, _pow2_ceil(len(rows)))
            tchunk = min(TCHUNK, _pow2_ceil(len(poss)))
            for q0 in range(0, len(rows), qchunk):
                pq = _pad_rows(peq[q0:q0 + qchunk], qchunk)
                for t0 in range(0, len(poss), tchunk):
                    tb = _pad_rows(tiles[t0:t0 + tchunk], tchunk)
                    block = myers.myers_min_ed_cross(pq, tb, W)
                    block = np.minimum(np.asarray(block), 255).astype(np.uint8)
                    nq = min(qchunk, len(rows) - q0)
                    nt = min(tchunk, len(poss) - t0)
                    ed[np.ix_(rows[q0:q0 + nq], poss[t0:t0 + nt])] = \
                        block[:nq, :nt]
    return ed


def _pow2_ceil(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    """Pad the leading dim to exactly n rows (canonical kernel shapes)."""
    if a.shape[0] == n:
        return a
    out = np.zeros((n,) + a.shape[1:], dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


def select_pods(qd: QueryData, rd: RefData, ed: np.ndarray, mode: str):
    """Apply budgets and tie selection; return winner (juni, refpos, ed)."""
    nu = qd.num_uniq
    budgets = qd.ed  # [numUniq]
    rows_of = [[] for _ in range(nu)]
    for j in range(len(qd.seqs)):
        rows_of[int(qd.six[j])].append(j)
    picks_j, picks_p, picks_e = [], [], []
    for i in range(nu):
        rows = rows_of[i]
        sub = ed[rows]                       # [1 or 2, U]
        bud = int(budgets[i])
        if mode == "FORAGE":
            mask = sub <= bud
        else:
            best = int(sub.min()) if sub.size else 255
            if best > bud:
                continue
            mask = sub == best
        jj, pp = np.nonzero(mask)
        if jj.size == 0:
            continue
        picks_j.append(np.array(rows, dtype=np.int64)[jj])
        picks_p.append(pp.astype(np.int64))
        picks_e.append(sub[jj, pp].astype(np.int64))
    if not picks_j:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    return (np.concatenate(picks_j), np.concatenate(picks_p),
            np.concatenate(picks_e))


def rescore_winners(qd: QueryData, rd: RefData, juni, refpos, eds,
                    mode: str, smat: np.ndarray | None = None,
                    pod_order: np.ndarray | None = None) -> Pods:
    """Phase B: exact stats for winner pairs, then reference pod ordering."""
    if smat is None:
        smat = score_matrix()
    n = len(juni)
    gap_q = np.zeros(n, np.int64)
    gap_r = np.zeros(n, np.int64)
    fpos = np.zeros(n, np.int64)
    score = np.zeros(n, np.float32)
    out_ed = np.array(eds, dtype=np.int64)

    budgets = qd.ed
    # rescore bound: the pair's own ED (tie modes) or the query budget
    # (FORAGE/ANY explore all valid refs: burst.c:4437 'min = Emac')
    if mode in ("FORAGE", "ANY"):
        bound = budgets[qd.six[juni]]
    else:
        bound = out_ed

    # bucket pairs like phase A
    order = np.arange(n)
    qws = np.array([myers.words_for(len(qd.seqs[j])) for j in juni],
                   dtype=np.int64) if n else np.zeros(0, np.int64)
    ulens = np.array([int(rd.lens[rd.ix_srt[p]]) for p in refpos],
                     dtype=np.int64) if n else np.zeros(0, np.int64)
    lbs = -(-np.maximum(ulens, 1) // 64) * 64
    for W in np.unique(qws):
        for lb in np.unique(lbs[qws == W]):
            sel = order[(qws == W) & (lbs == lb)]
            m_pad = int(W) * 32
            lp = int(lb) + m_pad
            lp = -(-lp // 64) * 64
            # canonical batch height: pow2-padded, chunked at QCHUNK
            pchunk = min(QCHUNK, _pow2_ceil(len(sel)))
            for s0 in range(0, len(sel), pchunk):
                part = sel[s0:s0 + pchunk]
                qs = np.zeros((pchunk, m_pad), np.uint8)
                ts = np.zeros((pchunk, lp), np.uint8)
                qlens = np.full(pchunk, 2, np.int64)  # dummies stay valid
                for i, ix in enumerate(part):
                    s = qd.seqs[juni[ix]]
                    qs[i, : len(s)] = s
                    qlens[i] = len(s)
                    u = rd.seqs[rd.ix_srt[refpos[ix]]]
                    ts[i, : len(u)] = u
                bnd = np.zeros(pchunk, np.int64)
                bnd[: len(part)] = bound[part]
                e, gq, gr, fp, sc = rescore_pairs(
                    qs, qlens, ts, bnd, int(W), smat)
                n = len(part)
                gap_q[part] = gq[:n]
                gap_r[part] = gr[:n]
                fpos[part] = fp[:n]
                score[part] = sc[:n]
                out_ed[part] = e[:n]

    # Reference pod ordering: single-thread full-path insertion order is
    # (clump asc, query-row asc, lane asc) head-inserted, i.e. iteration
    # order (clump desc, query-row desc, lane desc) (burst.c:4343-4477).
    # The accel path passes its own visit-rank ordering via pod_order.
    if pod_order is not None:
        srt = pod_order
    else:
        clump = refpos // VECSZ
        lane = refpos % VECSZ
        srt = np.lexsort((-lane, -juni, -clump))
    return Pods(six=qd.six[juni][srt], juni=juni[srt], refpos=refpos[srt],
                ed=out_ed[srt], rc=qd.rc[juni][srt], gap_q=gap_q[srt],
                gap_r=gap_r[srt], final_pos=fpos[srt], score=score[srt])


def align(qd: QueryData, rd: RefData, mode: str,
          smat: np.ndarray | None = None):
    ed = compute_ed_matrix(qd, rd, smat)
    juni, refpos, eds = select_pods(qd, rd, ed, mode)
    return rescore_winners(qd, rd, juni, refpos, eds, mode, smat)


# ------------------------------------------------------------ accel path

def accel_candidates(qd: QueryData, rd: RefData, acc, qbins: np.ndarray,
                     do_heur: bool = False):
    """Per-unibin candidate clump visit lists (burst.c:4077-4136).

    Returns (visits, eval_rows): visits[j] is the ordered clump visit
    list for unibin j (pigeonhole-filtered candidates sorted by hit
    count descending with stable first-touch tie order, then the
    BadList); unibins in [qbins[1], n) get visits[j] = None meaning the
    full scan covers them.
    """
    from .accel import query_words, scour_candidates

    k = acc.k
    n = len(qd.seqs)
    n_clumps = rd.tot_units // VECSZ + (1 if rd.tot_units % VECSZ else 0)
    bad = list(int(b) for b in acc.bad)
    visits: list[list[int] | None] = [None] * n
    for j in range(int(qbins[1])):
        s = qd.seqs[j]
        ln = int(qd.lens[qd.six[j]])
        err = int(qd.ed[qd.six[j]])
        kload = err * k + k
        mm_bunch = (ln - kload) if kload < ln else 0
        if do_heur:
            mm_bunch = max(mm_bunch, (ln >> 4) + 1)
        mm_inner = (ln - kload) if kload < ln else 1
        words = query_words(s, k, acc.z, ambiguous=(j < int(qbins[0])))
        clumps, counts = scour_candidates(acc, words, n_clumps)
        keep = (counts > mm_bunch) & (counts > mm_inner)
        cand = clumps[keep]
        cnt = counts[keep]
        srt = np.argsort(-cnt, kind="stable")
        visits[j] = [int(c) for c in cand[srt]] + bad
    return visits


def compute_ed_matrix_accel(qd: QueryData, rd: RefData, visits,
                            smat: np.ndarray | None = None) -> np.ndarray:
    """Phase A over candidate pairs only; unevaluated pairs stay 255.

    Dense unibin-major batches: all (unibin, candidate-unit) pairs are
    flattened and run through the paired Myers kernel in canonical
    chunks.
    """
    if smat is None:
        smat = score_matrix()
    nj = len(qd.seqs)
    ed = np.full((nj, rd.tot_units), 255, dtype=np.uint8)
    # full scan for unibins without visit lists
    full_rows = [j for j in range(nj) if visits[j] is None]
    if full_rows:
        sub = _subset_qd(qd, full_rows)
        edf = compute_ed_matrix(sub, rd, smat)
        ed[full_rows] = edf
    # pair list for accel unibins
    pj, pp = [], []
    for j in range(nj):
        v = visits[j]
        if v is None:
            continue
        for c in v:
            for p in range(c * VECSZ, min((c + 1) * VECSZ, rd.tot_units)):
                pj.append(j)
                pp.append(p)
    if pj:
        pj = np.array(pj, dtype=np.int64)
        pp = np.array(pp, dtype=np.int64)
        eds = _pairs_min_ed(qd, rd, pj, pp, smat)
        ed[pj, pp] = np.minimum(eds, 255).astype(np.uint8)
    return ed


def _subset_qd(qd: QueryData, rows: list[int]) -> QueryData:
    import copy
    sub = copy.copy(qd)
    sub.seqs = [qd.seqs[j] for j in rows]
    sub.six = qd.six[rows]
    sub.rc = qd.rc[rows]
    return sub


def _pairs_min_ed(qd: QueryData, rd: RefData, pj: np.ndarray,
                  pp: np.ndarray, smat: np.ndarray) -> np.ndarray:
    """Paired phase A (burst.c accel inner loop): bucketed like rescore."""
    n = len(pj)
    out = np.full(n, 255, dtype=np.int64)
    qws = np.array([myers.words_for(len(qd.seqs[j])) for j in pj])
    ulen = np.array([int(rd.lens[rd.ix_srt[p]]) for p in pp])
    lbs = -(-np.maximum(ulen, 1) // 64) * 64
    order = np.arange(n)
    for W in np.unique(qws):
        for lb in np.unique(lbs[qws == W]):
            sel = order[(qws == W) & (lbs == lb)]
            m_pad = int(W) * 32
            lp = int(lb) + 32
            pchunk = min(QCHUNK * 4, _pow2_ceil(len(sel)))
            for s0 in range(0, len(sel), pchunk):
                part = sel[s0:s0 + pchunk]
                qarr = np.zeros((pchunk, m_pad), np.uint8)
                qlens = np.full(pchunk, 1, np.int64)
                tiles = np.zeros((pchunk, lp), np.uint8)
                for i, ix in enumerate(part):
                    s = qd.seqs[pj[ix]]
                    qarr[i, : len(s)] = s
                    qlens[i] = len(s)
                    u = rd.seqs[rd.ix_srt[pp[ix]]]
                    tiles[i, : len(u)] = u
                peq = myers.build_peq(qarr, qlens, int(W), smat)
                res = np.asarray(myers.myers_min_ed(peq, tiles, int(W)))
                out[part] = res[: len(part)]
    return out


def accel_pod_order(qd: QueryData, rd: RefData, visits, juni, refpos, eds):
    """Order winner pods like the reference accel path's linked lists:
    per base query, forward-strand pods then reverse (fold at
    burst.c:4299-4312), each block in reverse insertion order
    (clump visit rank desc, lane desc)."""
    n = len(juni)
    rank = np.zeros(n, dtype=np.int64)
    for ix in range(n):
        j = int(juni[ix])
        v = visits[j]
        c = int(refpos[ix]) // VECSZ
        if v is None:
            rank[ix] = -1 - c  # full-path block: clump desc == rank asc
        else:
            rank[ix] = v.index(c)
    lane = refpos % VECSZ
    is_rc = qd.rc[juni].astype(np.int64)
    # full-path pods (rank<0) keep full-path ordering among themselves;
    # they belong to bad-bin queries, disjoint from accel queries.
    full_mask = rank < 0
    keys_full = np.lexsort((-lane[full_mask], -juni[full_mask],
                            rank[full_mask]))
    keys_acc = np.lexsort((-lane[~full_mask], -rank[~full_mask],
                           is_rc[~full_mask], qd.six[juni[~full_mask]]))
    idx_full = np.nonzero(full_mask)[0][keys_full]
    idx_acc = np.nonzero(~full_mask)[0][keys_acc]
    return np.concatenate([idx_acc, idx_full])
