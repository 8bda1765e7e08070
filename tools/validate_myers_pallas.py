#!/usr/bin/env python
"""Bit-equality sweep: Pallas Myers kernels vs the jnp reference path.

Run on a real TPU (the Pallas kernels are TPU-only; CPU runs skip).
Exercises a range of W word counts, tile widths, and batch shapes for
both the cross (full-DB) and gathered-pair kernels.

    python tools/validate_myers_pallas.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    plat = jax.devices()[0].platform.lower()
    if "tpu" not in plat and "axon" not in plat:
        print(f"SKIP: needs a TPU device (got {plat})")
        return 0
    sys.path.insert(0, ".")
    from burst_tpu.alphabet import score_matrix
    from burst_tpu.kernels import myers
    from burst_tpu.kernels.myers_pallas import (myers_cross_pallas,
                                                myers_pairs_pallas)

    rng = np.random.default_rng(3)
    smat = score_matrix()
    fails = 0

    for (Q, T, Lp, W) in ((8, 128, 256, 4), (16, 256, 512, 4),
                          (8, 128, 640, 10), (8, 128, 192, 1),
                          (24, 384, 384, 2)):
        qs = rng.integers(1, 16, size=(Q, W * 32)).astype(np.uint8)
        qlens = rng.integers(16, W * 32 + 1, size=Q).astype(np.int64)
        peq = myers.build_peq(qs, qlens, W, smat)
        tiles = np.zeros((T, Lp), np.uint8)
        ln = max(1, Lp - 32 * W)
        tiles[:, :ln] = rng.integers(1, 16, size=(T, ln))
        ref = np.asarray(myers.myers_min_ed_cross(
            jnp.asarray(peq), jnp.asarray(tiles), W))
        got = np.asarray(myers_cross_pallas(
            jnp.asarray(peq), jnp.asarray(tiles), W))
        ok = np.array_equal(ref, got)
        fails += not ok
        print(f"cross Q{Q} T{T} Lp{Lp} W{W}: {'OK' if ok else 'FAIL'}")

    for (B, NT, Lp, W) in ((1024, 512, 512, 4), (2048, 1024, 576, 4),
                           (1024, 256, 448, 2), (3072, 512, 320, 8)):
        NQ = 4096
        qs = rng.integers(1, 16, size=(NQ, W * 32)).astype(np.uint8)
        qlens = rng.integers(16, W * 32 + 1, size=NQ).astype(np.int64)
        peq = myers.build_peq(qs, qlens, W, smat)
        tiles = np.zeros((NT, Lp), np.uint8)
        ln = max(1, Lp - 32 * W)
        tiles[:, :ln] = rng.integers(1, 16, size=(NT, ln))
        pidx = rng.integers(0, NQ, B).astype(np.int32)
        tidx = rng.integers(0, NT, B).astype(np.int32)
        ref = np.asarray(myers.myers_min_ed_gather_pos(
            jnp.asarray(peq), jnp.asarray(tiles), jnp.asarray(pidx),
            jnp.asarray(tidx), W))
        got = np.asarray(myers_pairs_pallas(
            jnp.asarray(peq), jnp.asarray(tiles), jnp.asarray(pidx),
            jnp.asarray(tidx), W))
        ok = np.array_equal(ref, got)
        fails += not ok
        print(f"pairs B{B} Lp{Lp} W{W}: {'OK' if ok else 'FAIL'}")
        # nibble-packed tile store (fused path layout)
        from burst_tpu.kernels.myers_pallas import \
            myers_pairs_pallas_packed
        packed = myers.pack_nibbles_np(tiles)
        gotp = np.asarray(myers_pairs_pallas_packed(
            jnp.asarray(peq), jnp.asarray(packed), jnp.asarray(pidx),
            jnp.asarray(tidx), W))
        okp = np.array_equal(ref, gotp)
        fails += not okp
        print(f"pairs-packed B{B} Lp{Lp} W{W}: "
              f"{'OK' if okp else 'FAIL'}")

    # ---- kernel throughput (GCUPS = DP lane-cells/s) ----
    # VERDICT-r4 item 6's yardstick: the packed-word kernel vs the r4
    # int32-column layout measured ~1 GCUPS; target >= 5x.
    import time
    B, NT, Lp, W = 8192, 1024, 512, 4
    NQ = 4096
    qs = rng.integers(1, 16, size=(NQ, W * 32)).astype(np.uint8)
    qlens = rng.integers(16, W * 32 + 1, size=NQ).astype(np.int64)
    peq = jnp.asarray(myers.build_peq(qs, qlens, W, smat))
    tiles = np.zeros((NT, Lp), np.uint8)
    tiles[:, :Lp - 32 * W] = rng.integers(
        1, 16, size=(NT, Lp - 32 * W))
    tiles_d = jnp.asarray(tiles)
    pidx = jnp.asarray(rng.integers(0, NQ, B).astype(np.int32))
    tidx = jnp.asarray(rng.integers(0, NT, B).astype(np.int32))
    out = myers_pairs_pallas(peq, tiles_d, pidx, tidx, W)
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = myers_pairs_pallas(peq, tiles_d, pidx, tidx, W)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    cells = B * (W * 32) * Lp
    print(f"pairs kernel: B{B} Lp{Lp} W{W}: {dt*1e3:.2f} ms/call, "
          f"{cells/dt/1e9:.0f} GCUPS")

    print("ALL OK" if not fails else f"{fails} FAILURES")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
