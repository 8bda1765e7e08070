"""Host (CPU) twins of the phase-A Myers and phase-B rescore kernels.

Why these exist: the dev rig tunnels the TPU through a link that stalls
for minutes at a time, and a blocked device fetch wedges the whole
process (jax caches the broken client). Every device dispatch site in
`engine` therefore carries a host fallback closure; when
`devtime.fetch` times out, the pending chunks are recomputed here and
the batch completes with byte-identical output. The same code paths
power `BURST_TPU_HOST=1` (pure-CPU execution, no device touched) -- the
bench's guaranteed-metric mode and a CPU deployment story.

Two implementations per kernel:
  * native C++ (burst_host.cpp: `myers_pairs` / `rescore_pairs`),
    the fast path;
  * vectorized numpy ports of the exact jax recurrences (this file),
    used as the oracle for the C++ kernels in tests and as the last
    resort when no compiler is available.

Both are bit-identical to the jax kernels (tests/test_host_kernels.py
fuzzes all three against each other).

Semantics references: myers.myers_min_ed_gather_pos (phase A packed
(ed, first, last)), rescore.make_rescore (phase B tie-aware DP,
/root/reference/burst.c:713-886 re-expression).
"""
from __future__ import annotations

import numpy as np

DEAD = 511
WORD = 32
TOP = np.uint32(1 << 31)


# --------------------------------------------------------------- phase A

def myers_pairs_np(peq_all: np.ndarray, tiles_all: np.ndarray,
                   pidx: np.ndarray, tidx: np.ndarray, W: int
                   ) -> np.ndarray:
    """numpy port of myers.myers_min_ed_gather_pos: packed [3, B] int32
    (min ED, first best column, last best column), columns 1-based in
    padded coordinates."""
    peq = peq_all[np.asarray(pidx, dtype=np.int64)]      # [B, C, W]
    tiles = tiles_all[np.asarray(tidx, dtype=np.int64)]  # [B, Lp]
    B = peq.shape[0]
    Lp = tiles.shape[1]
    VP = np.full((W, B), 0xFFFFFFFF, dtype=np.uint32)
    VN = np.zeros((W, B), dtype=np.uint32)
    score = np.full(B, W * WORD, dtype=np.int32)
    best = score.copy()
    first = np.zeros(B, dtype=np.int32)
    last = np.zeros(B, dtype=np.int32)
    brange = np.arange(B)
    one = np.uint32(1)
    Ph = np.empty((W, B), dtype=np.uint32)
    Mh = np.empty((W, B), dtype=np.uint32)
    Xv = np.empty((W, B), dtype=np.uint32)
    for j in range(Lp):
        col = tiles[:, j].astype(np.int64)               # [B]
        Eq_b = peq[brange, col]                          # [B, W]
        carry = np.zeros(B, dtype=np.uint32)
        for w in range(W):
            Eq = Eq_b[:, w]
            Xv[w] = Eq | VN[w]
            a = Eq & VP[w]
            s1 = a + VP[w]
            c1 = (s1 < a).astype(np.uint32)
            s2 = s1 + carry
            c2 = (s2 < s1).astype(np.uint32)
            Xh = (s2 ^ VP[w]) | Eq
            Ph[w] = VN[w] | ~(Xh | VP[w])
            Mh[w] = VP[w] & Xh
            carry = c1 | c2
        score = score + (Ph[W - 1] >> 31).astype(np.int32) \
                      - (Mh[W - 1] >> 31).astype(np.int32)
        jj = np.int32(j + 1)
        strict = score < best
        upd = score <= best
        first[strict] = jj
        last[upd] = jj
        best = np.where(upd, score, best)
        pc = np.zeros(B, dtype=np.uint32)
        mc = np.zeros(B, dtype=np.uint32)
        for w in range(W):
            phs = (Ph[w] << one) | pc
            mhs = (Mh[w] << one) | mc
            pc = Ph[w] >> 31
            mc = Mh[w] >> 31
            VP[w] = mhs | ~(Xv[w] | phs)
            VN[w] = phs & Xv[w]
    return np.stack([best, first, last]).astype(np.int32)


# --------------------------------------------------------------- phase B

def rescore_pairs_np(peq_all: np.ndarray, tiles_all: np.ndarray,
                     pidx: np.ndarray, tidx: np.ndarray,
                     qlens: np.ndarray, max_ed: np.ndarray, W: int,
                     rows: int | None = None,
                     x0: np.ndarray | None = None,
                     Lw: int | None = None) -> np.ndarray:
    """numpy port of rescore.make_rescore (+ gather/window wrappers):
    packed [4, B] int32 (ED, gapQ, gapR, final_pos).

    Narrow shapes (tile width <= 7679 columns, rows <= 511) run the
    int64 key-packed left-chain scan -- the same envelope as the device
    fast path; wider shapes route to _rescore_np_wide (unpacked
    doubling scan, no limits), so this fallback completes on every
    shape the engine can produce, like the C++ kernel.

    Contract (shared with the C++ kernel): bit-identical to the jax
    kernel for every pair whose true ED <= max_ed -- i.e. every pair
    the engine actually rescores (engine.rescore_winners bounds are
    always >= the pair's phase-A ED). Pairs over budget return ED 255
    identically, but their aux stats (gapQ/gapR/final_pos) are
    implementation-defined: the jax kernel's left-chain look-back is
    windowed to the error budget (rescore._levels_for), which only
    changes DEAD cells, while the host chain is unwindowed.
    """
    peq = peq_all[np.asarray(pidx, dtype=np.int64)]      # [B, C, W]
    tiles = tiles_all[np.asarray(tidx, dtype=np.int64)]  # [B, Lp]
    if x0 is not None:
        idx = np.asarray(x0, dtype=np.int64)[:, None] + \
            np.arange(Lw - 1, dtype=np.int64)[None, :]
        np.clip(idx, 0, tiles.shape[1] - 1, out=idx)
        tiles = np.take_along_axis(tiles, idx, axis=1)
    B, Lp = tiles.shape
    m_pad = W * WORD if rows is None else rows
    if Lp > 7679 or m_pad > 511:
        # wide shapes exceed the int64 key-packing envelope: run the
        # unpacked doubling-scan variant instead (same recurrence,
        # fields carried as separate arrays, no size limits)
        return _rescore_np_wide(peq, tiles, qlens, max_ed, W, m_pad)
    qlens = np.asarray(qlens, dtype=np.int32)
    bad = (np.asarray(max_ed, dtype=np.int32) + 1)[:, None]  # [B, 1]
    L1 = Lp + 1
    pad_col = tiles == 0

    # Eq bit columns from the Peq tables (match <=> unit cost 0)
    brange = np.arange(B)
    eq_cols = np.empty((W, B, Lp), dtype=np.uint32)
    colv = tiles.astype(np.int64)
    for w in range(W):
        eq_cols[w] = peq[brange[:, None], colv, w]

    def cost_row(y):
        w = (y - 1) // WORD
        b = np.uint32((y - 1) % WORD)
        match = ((eq_cols[w] >> b) & np.uint32(1)).astype(bool)
        return np.where(match, 0,
                        np.where(pad_col, DEAD, 1)).astype(np.int32)

    # --- row 1, special-cased exactly like the reference ---
    d1 = cost_row(1)
    sc = np.concatenate([np.ones((B, 1), np.int32), d1], axis=1)
    left = sc[:, :-1]
    sh1 = ((d1 == 1) & (left == 0)).astype(np.int32)
    sh = np.concatenate([np.zeros((B, 1), np.int32), sh1], axis=1)
    shr = np.zeros((B, L1), np.int32)
    shr[:, 0] = 1
    sc = np.where(sc >= bad, DEAD, sc)

    # int64 key packing for the running left-chain minimum:
    # (eff score asc, eff gapQ desc, origin x desc, shiftR desc)
    OFF = np.int64(8192)
    M14 = np.int64(16383)
    xs = np.arange(L1, dtype=np.int64)[None, :]
    x_field = (np.int64(8191) - xs) << 10

    for y in range(2, m_pad + 1):
        d = cost_row(y)
        sO = np.minimum(sc[:, :-1] + d, DEAD + 1)
        sU = np.minimum(sc[:, 1:] + 1, DEAD + 1)
        gO, gU = sh[:, :-1], sh[:, 1:]
        takeU = (sU < sO) | ((sU == sO) & (gU > gO))
        bs = np.where(takeU, sU, sO)
        bg = np.where(takeU, gU, gO)
        br = np.where(takeU, shr[:, 1:] + 1, shr[:, :-1])
        ycol = np.full((B, 1), y, np.int32)
        bs = np.concatenate([ycol, bs], axis=1)
        bg = np.concatenate([np.zeros((B, 1), np.int32), bg], axis=1)
        br = np.concatenate([ycol, br], axis=1)
        A = np.minimum(bs, DEAD + 1).astype(np.int64) - xs + OFF
        Bf = M14 - (bg.astype(np.int64) - xs + OFF)
        key = (A << 37) | (Bf << 23) | x_field | \
            (np.int64(1023) - br.astype(np.int64))
        np.minimum.accumulate(key, axis=1, out=key)
        nsc = (((key >> 37) & M14) - OFF + xs).astype(np.int32)
        nsh = ((M14 - ((key >> 23) & M14)) - OFF + xs).astype(np.int32)
        nshr = (np.int64(1023) - (key & np.int64(1023))).astype(np.int32)
        nsc = np.where(nsc >= bad, DEAD, nsc)
        nsc[:, 0] = y
        nsh[:, 0] = 0
        nshr[:, 0] = y
        sc, sh, shr = nsc, nsh, nshr

    # --- final lane reduction over columns 1..Lp ---
    s_last, g_last, r_last = sc[:, 1:], sh[:, 1:], shr[:, 1:]
    best_s = s_last.min(axis=1)
    is_min = s_last == best_s[:, None]
    best_g = np.where(is_min, g_last, -1).max(axis=1)
    is_best = is_min & (g_last == best_g[:, None])
    colix = np.arange(1, Lp + 1, dtype=np.int32)[None, :]
    first_col = np.where(is_best, colix, np.int32(1 << 30)).min(axis=1)
    last_col = np.where(is_best, colix, 0).max(axis=1)
    best_r = np.take_along_axis(
        r_last, np.clip(first_col - 1, 0, Lp - 1)[:, None], axis=1)[:, 0]
    ed = np.minimum(best_s, 255)
    final_pos = last_col - (m_pad - qlens)
    return np.stack([ed, best_g.astype(np.int32), best_r,
                     final_pos]).astype(np.int32)


def _rescore_np_wide(peq, tiles, qlens, max_ed, W, m_pad):
    """Unpacked twin of the key-packed DP in rescore_pairs_np for
    shapes outside its envelope (rows > 511 or > 7679 columns): the
    running left-chain minimum is a lexicographic prefix-min over four
    separate int32 field arrays (score-x asc, gapQ-x desc, origin-x
    desc, shiftR desc) computed by a Hillis-Steele doubling scan --
    identical order to the packed key, no field-width limits. Used only
    when the native C++ kernel is unavailable."""
    B, Lp = tiles.shape
    qlens = np.asarray(qlens, dtype=np.int32)
    bad = (np.asarray(max_ed, dtype=np.int32) + 1)[:, None]
    L1 = Lp + 1
    pad_col = tiles == 0
    brange = np.arange(B)
    eq_cols = np.empty((W, B, Lp), dtype=np.uint32)
    colv = tiles.astype(np.int64)
    for w in range(W):
        eq_cols[w] = peq[brange[:, None], colv, w]

    def cost_row(y):
        w = (y - 1) // WORD
        b = np.uint32((y - 1) % WORD)
        match = ((eq_cols[w] >> b) & np.uint32(1)).astype(bool)
        return np.where(match, 0,
                        np.where(pad_col, DEAD, 1)).astype(np.int32)

    d1 = cost_row(1)
    sc = np.concatenate([np.ones((B, 1), np.int32), d1], axis=1)
    left = sc[:, :-1]
    sh1 = ((d1 == 1) & (left == 0)).astype(np.int32)
    sh = np.concatenate([np.zeros((B, 1), np.int32), sh1], axis=1)
    shr = np.zeros((B, L1), np.int32)
    shr[:, 0] = 1
    sc = np.where(sc >= bad, DEAD, sc)

    xs = np.arange(L1, dtype=np.int32)[None, :]
    BIG = np.int32(1 << 29)
    for y in range(2, m_pad + 1):
        d = cost_row(y)
        sO = np.minimum(sc[:, :-1] + d, DEAD + 1)
        sU = np.minimum(sc[:, 1:] + 1, DEAD + 1)
        gO, gU = sh[:, :-1], sh[:, 1:]
        takeU = (sU < sO) | ((sU == sO) & (gU > gO))
        bs = np.where(takeU, sU, sO)
        bg = np.where(takeU, gU, gO)
        br = np.where(takeU, shr[:, 1:] + 1, shr[:, :-1])
        ycol = np.full((B, 1), y, np.int32)
        bs = np.concatenate([ycol, bs], axis=1)
        bg = np.concatenate([np.zeros((B, 1), np.int32), bg], axis=1)
        br = np.concatenate([ycol, br], axis=1)
        A = np.minimum(bs, DEAD + 1).astype(np.int32) - xs
        G = bg.astype(np.int32) - xs
        X = np.broadcast_to(xs, A.shape).copy()
        R = br.astype(np.int32)
        s = 1
        while s < L1:
            Ac = np.concatenate([np.full((B, s), BIG, np.int32),
                                 A[:, :-s]], axis=1)
            Gc = np.concatenate([np.full((B, s), -BIG, np.int32),
                                 G[:, :-s]], axis=1)
            Xc = np.concatenate([np.full((B, s), -1, np.int32),
                                 X[:, :-s]], axis=1)
            Rc = np.concatenate([np.zeros((B, s), np.int32),
                                 R[:, :-s]], axis=1)
            take = (Ac < A) | ((Ac == A) &
                   ((Gc > G) | ((Gc == G) &
                    ((Xc > X) | ((Xc == X) & (Rc > R))))))
            A = np.where(take, Ac, A)
            G = np.where(take, Gc, G)
            X = np.where(take, Xc, X)
            R = np.where(take, Rc, R)
            s <<= 1
        nsc = A + xs
        nsh = G + xs
        nshr = R
        nsc = np.where(nsc >= bad, DEAD, nsc)
        nsc[:, 0] = y
        nsh[:, 0] = 0
        nshr[:, 0] = y
        sc, sh, shr = nsc, nsh, nshr

    s_last, g_last, r_last = sc[:, 1:], sh[:, 1:], shr[:, 1:]
    best_s = s_last.min(axis=1)
    is_min = s_last == best_s[:, None]
    best_g = np.where(is_min, g_last, -1).max(axis=1)
    is_best = is_min & (g_last == best_g[:, None])
    colix = np.arange(1, Lp + 1, dtype=np.int32)[None, :]
    first_col = np.where(is_best, colix, np.int32(1 << 30)).min(axis=1)
    last_col = np.where(is_best, colix, 0).max(axis=1)
    best_r = np.take_along_axis(
        r_last, np.clip(first_col - 1, 0, Lp - 1)[:, None], axis=1)[:, 0]
    ed = np.minimum(best_s, 255)
    final_pos = last_col - (m_pad - qlens)
    return np.stack([ed, best_g.astype(np.int32), best_r,
                     final_pos]).astype(np.int32)


# ------------------------------------------------- native-first wrappers

def myers_pairs_host(peq_all, tiles_all, pidx, tidx, W: int,
                     n: int | None = None) -> np.ndarray:
    """Packed [3, B] phase-A result, native C++ when available.

    `n`: compute only the first n pairs (dispatch chunks are padded to
    a power of two; the tail duplicates pair 0 and is discarded by the
    caller anyway)."""
    if n is not None and n < len(pidx):
        pidx, tidx = pidx[:n], tidx[:n]
    from ..native import myers_pairs_native
    out = myers_pairs_native(peq_all, tiles_all, pidx, tidx, W)
    if out is None:
        out = myers_pairs_np(peq_all, tiles_all, pidx, tidx, W)
    return out


def rescore_pairs_host(peq_all, tiles_all, pidx, tidx, qlens, max_ed,
                       W: int, rows: int | None = None,
                       x0=None, Lw: int | None = None,
                       n: int | None = None) -> np.ndarray:
    """Packed [4, B] phase-B result, native C++ when available."""
    if n is not None and n < len(pidx):
        pidx, tidx = pidx[:n], tidx[:n]
        qlens, max_ed = qlens[:n], max_ed[:n]
        if x0 is not None:
            x0 = x0[:n]
    from ..native import rescore_pairs_native
    out = rescore_pairs_native(peq_all, tiles_all, pidx, tidx, qlens,
                               max_ed, W, rows, x0, Lw)
    if out is None:
        out = rescore_pairs_np(peq_all, tiles_all, pidx, tidx, qlens,
                               max_ed, W, rows, x0, Lw)
    return out
