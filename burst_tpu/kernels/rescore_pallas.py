"""Pallas TPU kernel for the phase-B tie-aware rescore.

Same integer semantics as kernels/rescore.make_rescore (exact reScoreM
replication, see that module's docstring); this version keeps the
[B, L1] DP state in VMEM scratch and loops rows inside the kernel, so
per-row elementwise chains hit the VPU without HBM round-trips -- the
jnp scan materializes its carry in HBM every row and is bandwidth-bound.

Used on TPU backends only; CPU (tests) falls back to the jnp version.
Outputs are bit-identical: all arithmetic is int32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEAD = 511
BLOCK = 256


def _shift_right(x, d, fill):
    """Shift columns right by d (static), filling the head with `fill`."""
    head = jnp.full((x.shape[0], d), fill, x.dtype)
    return jnp.concatenate([head, x[:, :-d]], axis=1)


def _make_kernel(W: int, L1: int, levels: int, rows: int):
    m_pad = rows

    def kernel(peq_ref, tiles_ref, qmeta_ref, ed_ref, gq_ref, gr_ref,
               fp_ref, sc_ref, sh_ref, shr_ref, eq_ref):
        B = BLOCK
        Lp = L1 - 1
        # --- decode Eq bit columns from peq via a 4-level select tree
        colv = tiles_ref[:, :Lp].astype(jnp.int32)          # [B, Lp]
        pad_col = colv == 0
        for w in range(W):
            v = [peq_ref[:, c * W + w][:, None] for c in range(16)]
            for kbit in range(4):
                bit = ((colv >> kbit) & 1).astype(bool)
                v = [jnp.where(bit, v[2 * t + 1], v[2 * t])
                     for t in range(len(v) // 2)]
            eq_ref[w] = v[0]                                 # [B, Lp]

        bad = qmeta_ref[:, 1][:, None] + 1                   # [B,1] i32
        xs = jax.lax.broadcasted_iota(jnp.int32, (B, L1), 1)
        offs = jnp.int32(Lp)
        neg_inf_key = jnp.int32((8191 << 13) | 8191)

        def cost_row_w(w_static: int, y):
            """Unit cost of row y, for y in word block w (static)."""
            b = ((y - 1) % 32).astype(jnp.uint32)
            eq = eq_ref[w_static]
            match = ((eq >> b) & jnp.uint32(1)).astype(bool)
            return jnp.where(match, 0,
                             jnp.where(pad_col, DEAD, 1)).astype(jnp.int32)

        # --- row 1 (reference special case)
        d1 = cost_row_w(0, jnp.int32(1))
        col = jax.lax.broadcasted_iota(jnp.int32, (B, L1), 1)
        sc = jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32), d1], axis=1)
        left = sc[:, :-1]
        sh1 = ((d1 == 1) & (left == 0)).astype(jnp.int32)
        sh = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), sh1], axis=1)
        shr = jnp.where(col == 0, 1, 0)
        sc = jnp.where(sc >= bad, DEAD, sc)
        sc_ref[...] = sc
        sh_ref[...] = sh
        shr_ref[...] = shr

        def row_step_w(w_static: int, y, _):
            psc = sc_ref[...]
            psh = sh_ref[...]
            pshr = shr_ref[...]
            d = cost_row_w(w_static, y)
            sO = jnp.minimum(psc[:, :-1] + d, DEAD + 1)
            sU = jnp.minimum(psc[:, 1:] + 1, DEAD + 1)
            gO, gU = psh[:, :-1], psh[:, 1:]
            takeU = (sU < sO) | ((sU == sO) & (gU > gO))
            bs = jnp.where(takeU, sU, sO)
            bg = jnp.where(takeU, gU, gO)
            br = jnp.where(takeU, pshr[:, 1:] + 1, pshr[:, :-1])
            ycol = jnp.full((B, 1), y, jnp.int32)
            bs = jnp.concatenate([ycol, bs], axis=1)
            bg = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), bg],
                                 axis=1)
            br = jnp.concatenate([ycol, br], axis=1)
            key = ((jnp.minimum(bs, DEAD + 1) - xs + offs)
                   << jnp.int32(13)) | \
                (jnp.int32(8191) - (bg - xs + offs))
            pay = (xs << jnp.int32(9)) | br
            d_shift = 1
            while d_shift < min(L1, 1 << levels):
                ks = _shift_right(key, d_shift, neg_inf_key)
                ps = _shift_right(pay, d_shift, jnp.int32(0))
                better = (ks < key) | ((ks == key) & (ps > pay))
                key = jnp.where(better, ks, key)
                pay = jnp.where(better, ps, pay)
                d_shift <<= 1
            nsc = (key >> jnp.int32(13)) - offs + xs
            nsh = (jnp.int32(8191) - (key & jnp.int32(8191))) - offs + xs
            nshr = pay & jnp.int32(511)
            nsc = jnp.where(nsc >= bad, DEAD, nsc)
            nsc = jnp.where(col == 0, y, nsc)
            nsh = jnp.where(col == 0, 0, nsh)
            nshr = jnp.where(col == 0, y, nshr)
            sc_ref[...] = nsc
            sh_ref[...] = nsh
            shr_ref[...] = nshr
            return 0

        # rows grouped by Peq word so eq_ref indexing stays static
        for w in range(W):
            y_lo = max(2, w * 32 + 1)
            y_hi = min(m_pad, (w + 1) * 32)
            if y_lo > y_hi:
                continue
            jax.lax.fori_loop(y_lo, y_hi + 1,
                              functools.partial(row_step_w, w), 0)

        # --- final lane reduction over columns 1..Lp
        s_last = sc_ref[:, 1:]
        g_last = sh_ref[:, 1:]
        r_last = shr_ref[:, 1:]
        live = tiles_ref[:, :Lp] != jnp.uint8(255)   # always true; keep Lp
        del live
        best_s = jnp.min(s_last, axis=1, keepdims=True)
        is_min = s_last == best_s
        best_g = jnp.max(jnp.where(is_min, g_last, -1), axis=1,
                         keepdims=True)
        is_best = is_min & (g_last == best_g)
        colix = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1) + 1
        first_col = jnp.min(jnp.where(is_best, colix, jnp.int32(1 << 30)),
                            axis=1, keepdims=True)
        last_col = jnp.max(jnp.where(is_best, colix, 0), axis=1,
                           keepdims=True)
        at_first = colix == first_col
        best_r = jnp.max(jnp.where(at_first, r_last, -(1 << 30)), axis=1,
                         keepdims=True)
        qlens = qmeta_ref[:, 0][:, None]
        ed_ref[...] = jnp.minimum(best_s, 255)
        gq_ref[...] = best_g
        gr_ref[...] = best_r
        fp_ref[...] = last_col - (jnp.int32(m_pad) - qlens)

    return kernel


@functools.partial(jax.jit, static_argnames=("W", "levels", "rows", "L1"))
def rescore_pallas(peq_flat, tiles, qmeta, W: int, levels: int, rows: int,
                   L1: int):
    """peq_flat [N, 16*W] u32, tiles [N, L1-1+pad?] u8 (expects exactly
    L1-1 columns), qmeta [N, 2] i32 (qlen, max_ed). N multiple of BLOCK.
    Returns (ed, gq, gr, fp) each [N] i32."""
    N = peq_flat.shape[0]
    grid = (N // BLOCK,)
    kern = _make_kernel(W, L1, levels, rows)
    out_shape = [jax.ShapeDtypeStruct((N, 1), jnp.int32)] * 4
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK, 16 * W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, L1 - 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((BLOCK, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BLOCK, L1), jnp.int32),
            pltpu.VMEM((BLOCK, L1), jnp.int32),
            pltpu.VMEM((BLOCK, L1), jnp.int32),
            pltpu.VMEM((W, BLOCK, L1 - 1), jnp.uint32),
        ],
    )(peq_flat, tiles, qmeta)
    return tuple(o[:, 0] for o in outs)
