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
from .kernels.rescore import rescore_pairs, rescore_pairs_gather  # noqa: F401
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


def _query_matrix(qd: QueryData):
    """Cached [nj, 32*Wmax] padded query matrix + per-row lengths/W."""
    cache = getattr(qd, "_qmat", None)
    if cache is not None:
        return cache
    nj = len(qd.seqs)
    qlens = np.array([len(s) for s in qd.seqs], dtype=np.int64)
    wmax = max(1, int(-(-qlens.max() // 32))) if nj else 1
    qmat = np.zeros((nj, wmax * 32), dtype=np.uint8)
    for j, s in enumerate(qd.seqs):
        qmat[j, : len(s)] = s
    qw = np.maximum(1, -(-qlens // 32))
    cache = (qmat, qlens, qw)
    qd._qmat = cache
    return cache


def _tile_matrix(rd: RefData, lb: int, positions: np.ndarray, pad: int):
    """Cached [n, lb+pad] padded tile matrix for one length bucket."""
    cache = getattr(rd, "_tilecache", None)
    if cache is None:
        cache = {}
        rd._tilecache = cache
    key = (lb, pad)
    got = cache.get(key)
    if got is not None:
        return got
    mat = np.zeros((len(positions), lb + pad), dtype=np.uint8)
    for i, p in enumerate(positions):
        s = rd.seqs[rd.ix_srt[p]]
        mat[i, : len(s)] = s
    pos2row = {}
    for i, p in enumerate(positions):
        pos2row[int(p)] = i
    cache[key] = (mat, pos2row)
    return cache[key]


def _peq_cache(qd: QueryData, W: int, smat: np.ndarray):
    """Per-(W, scoring-matrix) Peq tables for the W-bucket's rows.

    Returns (row2local [nj] int64 with -1 for rows outside the bucket,
    peq [n_bucket, 16, W] uint32)."""
    cache = getattr(qd, "_peqcache", None)
    if cache is None:
        cache = {}
        qd._peqcache = cache
    key = (W, smat.tobytes())
    got = cache.get(key)
    if got is not None:
        return got
    qmat, qlens, qw = _query_matrix(qd)
    rows = np.nonzero(qw == W)[0]
    peq = myers.build_peq(qmat[rows, : 32 * W], qlens[rows], W, smat)
    row2local = np.full(len(qd.seqs), -1, dtype=np.int64)
    row2local[rows] = np.arange(len(rows))
    cache[key] = (row2local, peq)
    return cache[key]


def _peq_device(qd: QueryData, W: int, smat: np.ndarray):
    """Device-resident pow2-padded Peq for the W bucket."""
    cache = getattr(qd, "_peqdev", None)
    if cache is None:
        cache = {}
        qd._peqdev = cache
    key = (W, smat.tobytes())
    got = cache.get(key)
    if got is None:
        import jax.numpy as jnp
        row2local, peq = _peq_cache(qd, W, smat)
        n = _pow2_ceil(max(1, peq.shape[0]))
        padded = np.zeros((n, 16, W), dtype=np.uint32)
        padded[: peq.shape[0]] = peq
        got = cache[key] = (row2local, jnp.asarray(padded))
    return got


def _tiles_device(rd: RefData, lb: int, pad: int):
    """Device-resident pow2-padded tile matrix for one length bucket."""
    cache = getattr(rd, "_tiledev", None)
    if cache is None:
        cache = {}
        rd._tiledev = cache
    key = (lb, pad)
    got = cache.get(key)
    if got is None:
        import jax.numpy as jnp
        bpos = np.nonzero(_unit_lb(rd) == lb)[0]
        tmat, pos2row = _tile_matrix(rd, lb, bpos, pad)
        n = _pow2_ceil(max(1, tmat.shape[0]))
        padded = np.zeros((n, tmat.shape[1]), dtype=np.uint8)
        padded[: tmat.shape[0]] = tmat
        got = cache[key] = (pos2row, jnp.asarray(padded))
    return got


def _unit_lb(rd: RefData, granularity: int = 64):
    """[tot_units] padded length bucket per sorted position (cached)."""
    lbs = getattr(rd, "_unit_lb", None)
    if lbs is None:
        ulen = rd.lens[rd.ix_srt[: rd.tot_units]]
        lbs = (-(-np.maximum(ulen, 1) // granularity) * granularity
               ).astype(np.int64)
        rd._unit_lb = lbs
    return lbs


def compute_ed_matrix(qd: QueryData, rd: RefData,
                      smat: np.ndarray | None = None) -> np.ndarray:
    """Phase A: [numUnibins, tot_units] uint8 min-ED matrix (clipped 255)."""
    if smat is None:
        smat = score_matrix()
    nj = len(qd.seqs)
    ed = np.full((nj, rd.tot_units), 255, dtype=np.uint8)
    qbuckets = _bucket_queries(qd)
    ubuckets = _bucket_units(rd)
    qmat, qlens_all, _ = _query_matrix(qd)
    for W, rows in sorted(qbuckets.items()):
        m_pad = W * 32
        rows_a = np.array(rows, dtype=np.int64)
        qarr = qmat[rows_a, :m_pad]
        qlens = qlens_all[rows_a]
        peq = myers.build_peq(qarr, qlens, W, smat)
        for lb, poss in sorted(ubuckets.items()):
            tiles, _ = _tile_matrix(rd, int(lb), np.array(poss), 32)
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


def select_pods(qd: QueryData, rd: RefData, ed: np.ndarray, mode: str,
                pairs: tuple[np.ndarray, np.ndarray] | None = None):
    """Apply budgets and tie selection; return winner (juni, refpos, ed).

    With `pairs` (the evaluated (juni, refpos) lists from the accel
    path), selection runs on the sparse pair arrays instead of the dense
    matrix.
    """
    nu = qd.num_uniq
    budgets = qd.ed  # [numUniq]
    if pairs is not None:
        pj, pp, full_rows = pairs
        pe = ed[pj, pp].astype(np.int64)
        six = qd.six[pj]
        frows = np.asarray(full_rows, dtype=np.int64)
        if mode == "FORAGE":
            keep = pe <= budgets[six]
            out = [(pj[keep], pp[keep], pe[keep])]
            if frows.size:
                sub = ed[frows]
                mask = sub <= budgets[qd.six[frows]][:, None]
                r, c = np.nonzero(mask)
                out.append((frows[r], c.astype(np.int64),
                            sub[r, c].astype(np.int64)))
        else:
            best = np.full(nu, 255, dtype=np.int64)
            np.minimum.at(best, six, pe)
            if frows.size:
                sub = ed[frows]
                np.minimum.at(best, qd.six[frows],
                              sub.min(axis=1).astype(np.int64))
            keep = (pe == best[six]) & (pe <= budgets[six])
            out = [(pj[keep], pp[keep], pe[keep])]
            if frows.size:
                fsix = qd.six[frows]
                mask = (sub == best[fsix][:, None]) & \
                    (best[fsix] <= budgets[fsix])[:, None]
                r, c = np.nonzero(mask)
                out.append((frows[r], c.astype(np.int64),
                            sub[r, c].astype(np.int64)))
        return (np.concatenate([o[0] for o in out]),
                np.concatenate([o[1] for o in out]),
                np.concatenate([o[2] for o in out]))
    budj = budgets[qd.six]                   # [nj]
    if mode == "FORAGE":
        maskj = ed <= budj[:, None]
    else:
        # fold strands: per-base-query minimum over its unibin rows
        best = np.full(nu, 255, dtype=np.int64)
        np.minimum.at(best, qd.six, ed.min(axis=1).astype(np.int64))
        valid = best <= budgets
        maskj = (ed == best[qd.six][:, None]) & valid[qd.six][:, None]
    jj, pp = np.nonzero(maskj)
    eds = ed[jj, pp].astype(np.int64)
    return jj.astype(np.int64), pp.astype(np.int64), eds


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
    qmat, qlens_all, qw_all = _query_matrix(qd)
    qws = qw_all[juni] if n else np.zeros(0, np.int64)
    lbs = _unit_lb(rd)[refpos] if n else np.zeros(0, np.int64)
    for W in np.unique(qws):
        for lb in np.unique(lbs[qws == W]):
            sel = order[(qws == W) & (lbs == lb)]
            m_pad = int(W) * 32
            lp = int(lb) + m_pad
            lp = -(-lp // 64) * 64
            pos2row, tiles_dev = _tiles_device(rd, int(lb), lp - int(lb))
            trows = np.array([pos2row[int(p)] for p in refpos[sel]],
                             dtype=np.int64)
            # canonical batch height: pow2-padded, chunked at QCHUNK
            row2local, peq_dev = _peq_device(qd, int(W), smat)
            prows = row2local[juni[sel]]
            pchunk = min(QCHUNK, _pow2_ceil(len(sel)))
            for s0 in range(0, len(sel), pchunk):
                part = sel[s0:s0 + pchunk]
                pidx = np.zeros(pchunk, np.int32)
                tidx = np.zeros(pchunk, np.int32)
                pidx[: len(part)] = prows[s0:s0 + pchunk]
                tidx[: len(part)] = trows[s0:s0 + pchunk]
                qlens = np.full(pchunk, 2, np.int64)  # dummies stay valid
                qlens[: len(part)] = qlens_all[juni[part]]
                bnd = np.zeros(pchunk, np.int64)
                bnd[: len(part)] = bound[part]
                e, gq, gr, fp, sc = rescore_pairs_gather(
                    peq_dev, tiles_dev, pidx, tidx, qlens, bnd,
                    int(W), smat)
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
    from .accel import query_words

    k = acc.k
    n = len(qd.seqs)
    n_clumps = rd.tot_units // VECSZ + (1 if rd.tot_units % VECSZ else 0)
    bad = list(int(b) for b in acc.bad)
    visits: list[list[int] | None] = [None] * n
    b0, b1 = int(qbins[0]), int(qbins[1])

    # word multisets of all accelerator-eligible unibins, batched
    bad_arr = np.asarray(bad, dtype=np.int64)
    qidx_parts, word_parts = [], []
    for j in range(b1):
        visits[j] = bad_arr            # default: BadList only
    # ambiguous unibins: per-query expansion (few)
    for j in range(b0):
        words = query_words(qd.seqs[j], k, acc.z, ambiguous=True)
        if words.size:
            qidx_parts.append(np.full(words.size, j, dtype=np.int64))
            word_parts.append(words)
    # clear unibins: vectorized rolling k-mers, grouped by length
    if b1 > b0:
        qmat, qlens_all, _ = _query_matrix(qd)
        clear = np.arange(b0, b1)
        lens_c = qlens_all[clear]
        pw = (4 ** np.arange(k - 1, -1, -1, dtype=np.int64))
        for ln in np.unique(lens_c):
            rows = clear[lens_c == ln]
            if ln < k:
                continue
            sub = qmat[rows, :ln].astype(np.int64) - 1
            win = np.lib.stride_tricks.sliding_window_view(sub, k, axis=1)
            words = (win * pw).sum(axis=2)          # [R, ln-k+1]
            qidx_parts.append(np.repeat(rows, ln - k + 1))
            word_parts.append(words.ravel())
    if not qidx_parts:
        return visits
    qidx = np.concatenate(qidx_parts)
    words = np.concatenate(word_parts)
    span = np.int64(1) << np.int64(2 * k)
    ukey, mult = np.unique(qidx * span + words, return_counts=True)
    uq = ukey // span
    uw = ukey % span
    seg = (acc.offsets[uw + 1] - acc.offsets[uw]).astype(np.int64)
    total = int(seg.sum())
    if total == 0:
        return visits
    starts = acc.offsets[uw]
    base = np.repeat(starts - np.concatenate(
        ([0], np.cumsum(seg)[:-1])), seg)
    flat = base + np.arange(total)
    cl = acc.ids[flat].astype(np.int64)
    qrep = np.repeat(uq, seg)
    wgt = np.repeat(mult, seg)
    pkey = qrep * n_clumps + cl
    u2, first, inv = np.unique(pkey, return_index=True, return_inverse=True)
    hits = np.bincount(inv, weights=wgt).astype(np.int64)
    np.minimum(hits, 0xFFFF, out=hits)
    pq = (u2 // n_clumps).astype(np.int64)
    pc = (u2 % n_clumps).astype(np.int64)

    # thresholds per unibin (burst.c:4091-4095, 4163-4165)
    lns = qd.lens[qd.six[:b1]].astype(np.int64)
    errs = qd.ed[qd.six[:b1]].astype(np.int64)
    kload = errs * k + k
    mm_bunch = np.where(kload < lns, lns - kload, 0)
    if do_heur:
        mm_bunch = np.maximum(mm_bunch, (lns >> 4) + 1)
    mm_inner = np.where(kload < lns, lns - kload, 1)

    # group rows by query (u2 is query-major sorted)
    grp_start = np.searchsorted(pq, np.arange(b1))
    grp_end = np.searchsorted(pq, np.arange(b1) + 1)
    for j in range(b1):
        a, b = int(grp_start[j]), int(grp_end[j])
        if a == b:
            continue
        h = hits[a:b]
        keep = (h > mm_bunch[j]) & (h > mm_inner[j])
        if not keep.any():
            continue
        cand = pc[a:b][keep]
        cnt = h[keep]
        ft = first[a:b][keep]
        srt = np.lexsort((ft, -cnt))
        visits[j] = np.concatenate([cand[srt], bad_arr])
    return visits


def compute_ed_matrix_accel(qd: QueryData, rd: RefData, visits,
                            smat: np.ndarray | None = None):
    """Phase A over candidate pairs only; unevaluated pairs stay 255.

    Dense unibin-major batches: all (unibin, candidate-unit) pairs are
    flattened and run through the paired Myers kernel in canonical
    chunks. Returns (ed_matrix, (pair_rows, pair_cols, full_rows)) so
    selection can stay sparse.
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
    pj_parts, pp_parts = [], []
    lane = np.arange(VECSZ, dtype=np.int64)
    for j in range(nj):
        v = visits[j]
        if v is None or len(v) == 0:
            continue
        ps = (np.asarray(v, dtype=np.int64)[:, None] * VECSZ + lane).ravel()
        ps = ps[ps < rd.tot_units]
        pp_parts.append(ps)
        pj_parts.append(np.full(len(ps), j, dtype=np.int64))
    if pj_parts:
        pj = np.concatenate(pj_parts)
        pp = np.concatenate(pp_parts)
        eds = _pairs_min_ed(qd, rd, pj, pp, smat)
        ed[pj, pp] = np.minimum(eds, 255).astype(np.uint8)
    else:
        pj = pp = np.zeros(0, dtype=np.int64)
    return ed, (pj, pp, np.asarray(full_rows, dtype=np.int64))


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
    qmat, qlens_all, qw_all = _query_matrix(qd)
    qws = qw_all[pj]
    lbs = _unit_lb(rd)[pp]
    order = np.arange(n)
    for W in np.unique(qws):
        for lb in np.unique(lbs[qws == W]):
            sel = order[(qws == W) & (lbs == lb)]
            pos2row, tiles_dev = _tiles_device(rd, int(lb), 32)
            trows = np.array([pos2row[int(p)] for p in pp[sel]],
                             dtype=np.int64)
            row2local, peq_dev = _peq_device(qd, int(W), smat)
            prows = row2local[pj[sel]]
            pchunk = min(QCHUNK * 4, _pow2_ceil(len(sel)))
            for s0 in range(0, len(sel), pchunk):
                part = sel[s0:s0 + pchunk]
                pidx = np.zeros(pchunk, np.int32)
                tidx = np.zeros(pchunk, np.int32)
                pidx[: len(part)] = prows[s0:s0 + pchunk]
                tidx[: len(part)] = trows[s0:s0 + pchunk]
                res = np.asarray(myers.myers_min_ed_gather(
                    peq_dev, tiles_dev, pidx, tidx, int(W)))
                out[part] = res[: len(part)]
    return out


def accel_pod_order(qd: QueryData, rd: RefData, visits, juni, refpos, eds):
    """Order winner pods like the reference accel path's linked lists:
    per base query, forward-strand pods then reverse (fold at
    burst.c:4299-4312), each block in reverse insertion order
    (clump visit rank desc, lane desc)."""
    n = len(juni)
    rank = np.zeros(n, dtype=np.int64)
    rank_maps: dict[int, dict[int, int]] = {}
    for ix in range(n):
        j = int(juni[ix])
        v = visits[j]
        c = int(refpos[ix]) // VECSZ
        if v is None:
            rank[ix] = -1 - c  # full-path block: clump desc == rank asc
        else:
            rm = rank_maps.get(j)
            if rm is None:
                rm = rank_maps[j] = {int(cc): r for r, cc in enumerate(v)}
            rank[ix] = rm[c]
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
