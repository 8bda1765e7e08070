"""Pallas TPU kernels for the phase-A bit-parallel Myers scan.

Same integer semantics as kernels/myers (exact; all u32/i32 math), but
the scan state (VP/VN bit planes, running scores) lives in VMEM
scratch across the whole column sweep -- the jnp lax.scan
materializes its carry through HBM every column and is
bandwidth-bound at scale.

Layouts put queries on sublanes and tiles/pairs on lanes so every
per-column op is a whole (8, 128) vreg:

* cross kernel: grid (Q/8, T/128); state [W, 8, 128]; tiles arrive
  transposed [Lp, T] so a column read is one [1, 128] row.
* pair kernel: grid (B/1024); 1024 gathered pairs per block as
  [Lp, 8, 128] transposed tiles; returns packed (ed, first, last).

CPU (tests) falls back to the jnp kernels; bit-equality between the
two is asserted by tools/validate_myers_pallas.py on real TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QSUB = 8      # queries per sublane block
TLAN = 128    # tiles/pairs per lane block


def _myers_col(eq, vp, vn, sc, W):
    """One Myers column update. eq: list of W [8,128] u32 planes;
    vp/vn: scratch refs [W,8,128]; returns new score [8,128] i32 and
    writes back VP/VN."""
    carry = jnp.zeros((QSUB, TLAN), jnp.uint32)
    phs, mhs = [], []
    for w in range(W):
        VP = vp[w]
        a = eq[w] & VP
        s1 = a + VP
        c1 = (s1 < a).astype(jnp.uint32)
        s2 = s1 + carry
        c2 = (s2 < s1).astype(jnp.uint32)
        carry = c1 | c2
        Xh = (s2 ^ VP) | eq[w]
        phs.append(vn[w] | ~(Xh | VP))
        mhs.append(VP & Xh)
    s = sc[...] + (phs[W - 1] >> 31).astype(jnp.int32) \
        - (mhs[W - 1] >> 31).astype(jnp.int32)
    sc[...] = s
    pc = jnp.zeros((QSUB, TLAN), jnp.uint32)
    mc = jnp.zeros((QSUB, TLAN), jnp.uint32)
    one = jnp.uint32(1)
    for w in range(W):
        Xv = eq[w] | vn[w]
        ph_s = (phs[w] << one) | pc
        mh_s = (mhs[w] << one) | mc
        pc = phs[w] >> 31
        mc = mhs[w] >> 31
        vp[w] = mh_s | ~(Xv | ph_s)
        vn[w] = ph_s & Xv
    return s


def _make_cross_kernel(W: int, Lp: int):
    m_pad = W * 32

    def kernel(peq_ref, tilesT_ref, out_ref, vp, vn, sc, best):
        for w in range(W):
            vp[w] = jnp.full((QSUB, TLAN), 0xFFFFFFFF, jnp.uint32)
            vn[w] = jnp.zeros((QSUB, TLAN), jnp.uint32)
        sc[...] = jnp.full((QSUB, TLAN), m_pad, jnp.int32)
        best[...] = jnp.full((QSUB, TLAN), m_pad, jnp.int32)

        def col(j, _):
            code = tilesT_ref[pl.ds(j, 1), :].astype(jnp.int32)
            # [1, TLAN]; Eq select tree: planes [QSUB, 1] broadcast
            eq = []
            for w in range(W):
                v = [peq_ref[:, c, w][:, None] for c in range(16)]
                for k in range(4):
                    bit = ((code >> k) & 1).astype(bool)   # [1, TLAN]
                    v = [jnp.where(bit, v[2 * t + 1], v[2 * t])
                         for t in range(len(v) // 2)]
                eq.append(v[0])                            # [QSUB, TLAN]
            s = _myers_col(eq, vp, vn, sc, W)
            best[...] = jnp.minimum(best[...], s)
            return 0

        jax.lax.fori_loop(0, Lp, col, 0)
        out_ref[...] = best[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("W",))
def myers_cross_pallas(peq, tiles, W: int):
    """[Q, T] min glocal ED; peq [Q,16,W] u32, tiles [T, Lp] u8.

    Q must be a multiple of 8 and T a multiple of 128 (caller pads;
    pad-query rows are wildcards, pad tiles all-pad columns)."""
    Q = peq.shape[0]
    T, Lp = tiles.shape
    # int32 columns: (1,128) i8 vector loads break Mosaic's int8
    # tiling; the 4x VMEM cost is still small
    tilesT = tiles.T.astype(jnp.int32)                     # [Lp, T]
    grid = (Q // QSUB, T // TLAN)
    kern = _make_cross_kernel(W, Lp)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QSUB, 16, W), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, TLAN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QSUB, TLAN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, T), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((W, QSUB, TLAN), jnp.uint32),
            pltpu.VMEM((W, QSUB, TLAN), jnp.uint32),
            pltpu.VMEM((QSUB, TLAN), jnp.int32),
            pltpu.VMEM((QSUB, TLAN), jnp.int32),
        ],
        interpret=_interpret(),
    )(peq, tilesT)
    return out


def _make_pair_kernel(W: int, Lp: int, Lpw: int):
    """Packed-word pair kernel: tiles arrive as [Lpw, 8, 128] uint32
    words holding 8 nibble codes each (column j = word j>>3, nibble
    j&7). One VMEM word load feeds EIGHT unrolled column steps, so the
    tile-state traffic is 1/32 of the round-4 int32-column layout (4
    bytes/column -> 0.5), and the XLA prologue transposes 1/8 of the
    data. Updates past the true column count Lp are masked (the pack
    pads Lp up to a multiple of 8)."""
    m_pad = W * 32

    def kernel(peq_ref, tilesT_ref, out_ref, vp, vn, sc, best, first,
               last):
        for w in range(W):
            vp[w] = jnp.full((QSUB, TLAN), 0xFFFFFFFF, jnp.uint32)
            vn[w] = jnp.zeros((QSUB, TLAN), jnp.uint32)
        sc[...] = jnp.full((QSUB, TLAN), m_pad, jnp.int32)
        best[...] = jnp.full((QSUB, TLAN), m_pad, jnp.int32)
        first[...] = jnp.zeros((QSUB, TLAN), jnp.int32)
        last[...] = jnp.zeros((QSUB, TLAN), jnp.int32)

        def word_step(wj, _):
            word = tilesT_ref[0, pl.ds(wj, 1), :, :].reshape(
                QSUB, TLAN)                              # [8,128] u32
            for sub in range(8):
                code = ((word >> jnp.uint32(4 * sub)) &
                        jnp.uint32(15)).astype(jnp.int32)
                eq = []
                for w in range(W):
                    v = [peq_ref[0, c * W + w] for c in range(16)]
                    for k in range(4):
                        bit = ((code >> k) & 1).astype(bool)
                        v = [jnp.where(bit, v[2 * t + 1], v[2 * t])
                             for t in range(len(v) // 2)]
                    eq.append(v[0])
                s = _myers_col(eq, vp, vn, sc, W)
                j = wj * 8 + sub
                valid = j < Lp
                b = best[...]
                strict = (s < b) & valid
                upd = (s <= b) & valid
                best[...] = jnp.where(upd, s, b)
                first[...] = jnp.where(strict, j + 1, first[...])
                last[...] = jnp.where(upd, j + 1, last[...])
            return 0

        jax.lax.fori_loop(0, Lpw, word_step, 0)
        out_ref[0, 0] = best[...]
        out_ref[0, 1] = first[...]
        out_ref[0, 2] = last[...]

    return kernel


def _interpret() -> bool:
    """CPU interpret mode (tests only): bit-validates the Pallas path
    without a TPU. Off in production (TPU compiles Mosaic)."""
    import os
    return os.environ.get("BURST_TPU_PALLAS_INTERPRET") == "1"


def _words_from_packed(pk):
    """[B, Lpb] nibble-packed u8 rows -> [B, ceil(Lpb/4)] u32 words
    (little-endian bytes, so column j lives at word j>>3, bits
    4*(j&7))."""
    B, Lpb = pk.shape
    pad = (-Lpb) % 4
    if pad:
        pk = jnp.pad(pk, ((0, 0), (0, pad)))
    g = pk.reshape(B, -1, 4).astype(jnp.uint32)
    return (g[:, :, 0] | (g[:, :, 1] << 8) | (g[:, :, 2] << 16)
            | (g[:, :, 3] << 24))


@functools.partial(jax.jit, static_argnames=("W",))
def myers_pairs_pallas_packed(peq_all, tiles_packed, pidx, tidx,
                              W: int):
    """myers_pairs_pallas over the nibble-packed tile store: gathered
    packed rows go STRAIGHT into u32 words for the kernel -- no unpack
    to one-byte codes, so the XLA prologue transposes 1/8 of the
    round-4 layout's data."""
    pk = jnp.take(tiles_packed, tidx, axis=0)              # [B, Lpb]
    words = _words_from_packed(pk)
    # the packed store scans 2*Lpb columns (trailing pad nibble for
    # odd logical widths), matching the round-4 unpacked behavior
    return _pairs_from_words(peq_all, words, pidx, W, 2 * pk.shape[1])


@functools.partial(jax.jit, static_argnames=("W",))
def myers_pairs_pallas(peq_all, tiles_all, pidx, tidx, W: int):
    """Packed [3, B] (ed, first, last) for B gathered pairs.

    B must be a multiple of 1024. Gathers, nibble packing, and the
    [Lpw, 8, 128] word transposes run as XLA ops feeding the kernel."""
    tiles = jnp.take(tiles_all, tidx, axis=0)              # [B, Lp]
    Lp = tiles.shape[1]
    if Lp % 2:
        tiles = jnp.pad(tiles, ((0, 0), (0, 1)))
    pk = tiles[:, 0::2] | (tiles[:, 1::2] << jnp.uint8(4))
    words = _words_from_packed(pk)
    return _pairs_from_words(peq_all, words, pidx, W, Lp)


def _pairs_from_words(peq_all, words, pidx, W: int, Lp: int):
    B = pidx.shape[0]
    Lpw = words.shape[1]
    peq = jnp.take(peq_all, pidx, axis=0)                  # [B,16,W]
    peq_r = jnp.transpose(peq.reshape(B // TLAN, TLAN, 16 * W),
                          (0, 2, 1))                       # [r,16W,128]
    peq_r = peq_r.reshape(B // (QSUB * TLAN), QSUB, 16 * W, TLAN)
    peq_r = jnp.transpose(peq_r, (0, 2, 1, 3))             # [g,16W,8,128]
    t_r = jnp.transpose(words.reshape(B // TLAN, TLAN, Lpw), (0, 2, 1))
    t_r = t_r.reshape(B // (QSUB * TLAN), QSUB, Lpw, TLAN)
    t_r = jnp.transpose(t_r, (0, 2, 1, 3))                 # [g,Lpw,8,128]
    grid = (B // (QSUB * TLAN),)
    kern = _make_pair_kernel(W, Lp, Lpw)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16 * W, QSUB, TLAN),
                         lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lpw, QSUB, TLAN), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, QSUB, TLAN),
                               lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // (QSUB * TLAN), 3, QSUB,
                                        TLAN), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((W, QSUB, TLAN), jnp.uint32),
            pltpu.VMEM((W, QSUB, TLAN), jnp.uint32),
            pltpu.VMEM((QSUB, TLAN), jnp.int32),
            pltpu.VMEM((QSUB, TLAN), jnp.int32),
            pltpu.VMEM((QSUB, TLAN), jnp.int32),
            pltpu.VMEM((QSUB, TLAN), jnp.int32),
        ],
        interpret=_interpret(),
    )(peq_r, t_r)
    # [g, 3, 8, 128] -> [3, B] in pair order (b = g*1024 + q*128 + l)
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(3, B // TLAN, TLAN)
    return out.reshape(3, B)
