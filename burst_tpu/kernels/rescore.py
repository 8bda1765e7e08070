"""Phase-B kernel: exact tie-aware rescoring DP (batched, JAX).

Reproduces the reference's reScoreM semantics
(/root/reference/burst.c:713-886) for a batch of (query, reference-tile)
winner pairs: per pair it returns the minimum glocal edit distance together
with the reference's dual-objective statistics:

  * gap_q / gap_r  -- query/reference gap counts of the winning path,
    chosen per cell by the exact tiebreak (min score; on ties, max gap_q),
    reported from the *earliest* last-row column attaining (min ED, max
    gap_q) -- matching the reference's sequential lane reduction;
  * final_pos      -- the *latest* last-row column attaining that pair
    (1-based reference end coordinate);
  * score          -- float32 identity 1 - ED/(qlen + gap_q).

TPU mapping: the scan runs over query rows; within a row the left-gap
dependency (cur[x] = min(base[x], cur[x-1]+1) with tiebreaks) is resolved
by an associative prefix scan over keys (score - x, -(gap_q - x), -x),
which XLA lowers to log2(L) vector steps -- no sequential column loop.
Mixed query lengths use wildcard tail rows (see kernels/myers.py); the
padding shifts final_pos right by (m_pad - qlen), which is subtracted
before returning.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import score_matrix

BIG = jnp.int32(1 << 20)


def _combine(a, b):
    """Associative pick for the in-row left-gap chain.

    Elements are tuples (k1, k2, j, shr): k1 = score - x (minimize),
    k2 = gap_q - x (maximize), j = column (maximize; the local candidate
    wins full ties, matching the reference's keep-current-on-tie rule).
    """
    k1a, k2a, ja, sa = a
    k1b, k2b, jb, sb = b
    b_wins = (k1b < k1a) | ((k1b == k1a) & ((k2b > k2a) |
                                            ((k2b == k2a) & (jb > ja))))
    pick = lambda x, y: jnp.where(b_wins, y, x)
    return (pick(k1a, k1b), pick(k2a, k2b), pick(ja, jb), pick(sa, sb))


def make_rescore(smat_np: np.ndarray):
    """Build a jitted rescore function closed over a scoring matrix."""
    smat_flat = jnp.asarray(smat_np.astype(np.int32).reshape(-1))

    @functools.partial(jax.jit, static_argnames=("W",))
    def rescore_batch(queries, qlens, tiles, max_ed, W: int):
        P, Lp = tiles.shape
        m_pad = W * 32
        tiles_i = tiles.astype(jnp.int32)                    # [P, Lp]
        qpad = jnp.zeros((P, m_pad), jnp.int32)
        qpad = qpad.at[:, : queries.shape[1]].set(queries.astype(jnp.int32))
        bad = (max_ed + 1).astype(jnp.int32)                 # [P]
        xs = jnp.arange(Lp + 1, dtype=jnp.int32)             # column index

        def diag_cost(y):
            """Cost row for query letter at row y (1-based): [P, Lp]."""
            qy = qpad[:, y - 1]                              # [P]
            c = jnp.take(smat_flat, qy[:, None] * 16 + tiles_i)
            c = jnp.where(c == 255, BIG, c)
            return jnp.where((y - 1) < qlens[:, None], c, 0)  # wildcard rows

        # --- row 1, special-cased exactly like the reference ---
        d1 = diag_cost(1)                                    # [P, Lp]
        sc = jnp.concatenate([jnp.ones((P, 1), jnp.int32), d1], axis=1)
        left = sc[:, :-1]
        sh1 = ((d1 == 1) & (left == 0)).astype(jnp.int32)
        sh = jnp.concatenate([jnp.zeros((P, 1), jnp.int32), sh1], axis=1)
        shr = jnp.zeros((P, Lp + 1), jnp.int32)
        shr = shr.at[:, 0].set(1)
        sc = jnp.where(sc >= bad[:, None], BIG, sc)

        def row_step(carry, y):
            psc, psh, pshr = carry
            d = diag_cost(y)
            # diagonal candidate
            sO = jnp.minimum(psc[:, :-1] + d, BIG)
            gO, rO = psh[:, :-1], pshr[:, :-1]
            # up candidate (gap in reference)
            sU = jnp.minimum(psc[:, 1:] + 1, BIG)
            gU, rU = psh[:, 1:], pshr[:, 1:] + 1
            takeU = (sU < sO) | ((sU == sO) & (gU > gO))
            bs = jnp.where(takeU, sU, sO)
            bg = jnp.where(takeU, gU, gO)
            br = jnp.where(takeU, rU, rO)
            # column 0 boundary: (y, 0, y) like the reference (min(y,255)
            # saturation only affects dead cells)
            bs = jnp.concatenate([jnp.full((P, 1), y, jnp.int32), bs], axis=1)
            bg = jnp.concatenate([jnp.zeros((P, 1), jnp.int32), bg], axis=1)
            br = jnp.concatenate([jnp.full((P, 1), y, jnp.int32), br], axis=1)
            # left-gap chain: prefix pick over (score - x, gap_q - x, x)
            k1 = bs - xs[None, :]
            k2 = bg - xs[None, :]
            jj = jnp.broadcast_to(xs[None, :], (P, Lp + 1))
            w1, w2, wj, wr = jax.lax.associative_scan(
                _combine, (k1, k2, jj, br), axis=1)
            nsc = w1 + xs[None, :]
            nsh = w2 + xs[None, :]
            nshr = wr
            nsc = jnp.where(nsc >= bad[:, None], BIG, nsc)
            # column 0 stays at the boundary value
            nsc = nsc.at[:, 0].set(y)
            nsh = nsh.at[:, 0].set(0)
            nshr = nshr.at[:, 0].set(y)
            return (nsc, nsh, nshr), None

        (sc, sh, shr), _ = jax.lax.scan(
            row_step, (sc, sh, shr), jnp.arange(2, m_pad + 1, dtype=jnp.int32))

        # --- final lane reduction over columns 1..Lp ---
        s_last, g_last, r_last = sc[:, 1:], sh[:, 1:], shr[:, 1:]
        best_s = jnp.min(s_last, axis=1)                     # [P]
        is_min = s_last == best_s[:, None]
        best_g = jnp.max(jnp.where(is_min, g_last, -1), axis=1)
        is_best = is_min & (g_last == best_g[:, None])
        colix = jnp.arange(1, Lp + 1, dtype=jnp.int32)[None, :]
        first_col = jnp.min(jnp.where(is_best, colix, jnp.int32(1 << 30)),
                            axis=1)
        last_col = jnp.max(jnp.where(is_best, colix, 0), axis=1)
        best_r = jnp.take_along_axis(
            r_last, jnp.clip(first_col - 1, 0, Lp - 1)[:, None], axis=1)[:, 0]
        ed = jnp.minimum(best_s, 255)
        final_pos = last_col - (m_pad - qlens)               # undo tail pad
        return ed, best_g, best_r, final_pos

    return rescore_batch


_DEFAULT = {}


def rescore_pairs(queries: np.ndarray, qlens: np.ndarray, tiles: np.ndarray,
                  max_ed: np.ndarray, W: int,
                  smat: np.ndarray | None = None):
    """Host-facing wrapper caching jitted functions per scoring matrix."""
    if smat is None:
        smat = score_matrix()
    key = smat.tobytes()
    fn = _DEFAULT.get(key)
    if fn is None:
        fn = _DEFAULT[key] = make_rescore(smat)
    out = fn(jnp.asarray(queries), jnp.asarray(qlens.astype(np.int32)),
             jnp.asarray(tiles), jnp.asarray(max_ed.astype(np.int32)), W)
    ed, gq, gr, fp = (np.asarray(o) for o in out)
    # Identity is computed on the host in float32 so it is bit-identical to
    # the reference's SSE float division (burst.c:844-860); XLA's device
    # division can differ by one ulp.
    score = np.float32(1.0) - ed.astype(np.float32) / (
        qlens.astype(np.int64) + gq).astype(np.float32)
    return ed, gq, gr, fp, score.astype(np.float32)
