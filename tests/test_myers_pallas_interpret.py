"""Pallas Myers kernels vs the jnp reference, CPU interpret mode.

The Pallas kernels are TPU-only in production; interpret mode runs the
same kernel program on CPU so the packed-word layout (8 nibble codes
per u32, unrolled in-register unpack) stays bit-validated without a
chip. The real-TPU sweep is tools/validate_myers_pallas.py.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.full      # ~50s: heavy tier only

os.environ["BURST_TPU_PALLAS_INTERPRET"] = "1"


@pytest.mark.parametrize("B,NT,Lp,W", [
    (1024, 128, 192, 2),      # even columns, no tail mask
    (1024, 64, 177, 1),       # odd width: packed pad column + mask
])
def test_pairs_packed_words_interpret(B, NT, Lp, W):
    import jax.numpy as jnp

    from burst_tpu.alphabet import score_matrix
    from burst_tpu.kernels import myers
    from burst_tpu.kernels.myers_pallas import (
        myers_pairs_pallas, myers_pairs_pallas_packed)

    rng = np.random.default_rng(B + Lp)
    smat = score_matrix()
    NQ = 256
    qs = rng.integers(1, 16, size=(NQ, W * 32)).astype(np.uint8)
    qlens = rng.integers(16, W * 32 + 1, size=NQ).astype(np.int64)
    peq = myers.build_peq(qs, qlens, W, smat)
    tiles = np.zeros((NT, Lp), np.uint8)
    ln = max(1, Lp - 16)
    tiles[:, :ln] = rng.integers(1, 16, size=(NT, ln))
    pidx = rng.integers(0, NQ, B).astype(np.int32)
    tidx = rng.integers(0, NT, B).astype(np.int32)
    ref = np.asarray(myers.myers_min_ed_gather_pos(
        jnp.asarray(peq), jnp.asarray(tiles), jnp.asarray(pidx),
        jnp.asarray(tidx), W))
    got = np.asarray(myers_pairs_pallas(
        jnp.asarray(peq), jnp.asarray(tiles), jnp.asarray(pidx),
        jnp.asarray(tidx), W))
    np.testing.assert_array_equal(got, ref)
    if Lp % 2 == 0:
        packed = myers.pack_nibbles_np(tiles)
        gotp = np.asarray(myers_pairs_pallas_packed(
            jnp.asarray(peq), jnp.asarray(packed), jnp.asarray(pidx),
            jnp.asarray(tidx), W))
        np.testing.assert_array_equal(gotp, ref)
