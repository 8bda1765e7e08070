"""Host (CPU) kernel twins == device kernels, bit for bit.

Fuzzes the native C++ and numpy implementations of the phase-A Myers
pair scan and the phase-B tie-aware rescore (kernels/host.py,
native/burst_host.cpp) against the jax kernels they shadow
(kernels/myers.myers_min_ed_gather_pos, kernels/rescore). These twins
are the device-stall fallback path (devtime fetch timeouts) and the
BURST_TPU_HOST=1 pure-CPU mode, so any divergence silently breaks the
byte-identity guarantee under fallback.
"""
import os

import numpy as np
import pytest

from burst_tpu.alphabet import score_matrix, translate
from burst_tpu.kernels import host, myers
from burst_tpu.kernels.rescore import (rescore_finalize,
                                       rescore_pairs_gather_async)
from burst_tpu.native import myers_pairs_native, rescore_pairs_native

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk(seed, NQ=13, NT=9, B=64, W=2, lb=128, ambig=True):
    rng = np.random.default_rng(seed)
    smat = score_matrix()
    alpha = b"ACGT" + (b"NRYKMSWBVHD" if ambig else b"")
    qlens = rng.integers(30, W * 32 + 1, NQ)
    qmat = np.zeros((NQ, W * 32), dtype=np.uint8)
    for i in range(NQ):
        raw = rng.choice(np.frombuffer(alpha, np.uint8), qlens[i])
        qmat[i, : qlens[i]] = translate(raw)
    peq = myers.build_peq(qmat, qlens.astype(np.int64), W, smat)
    tlens = rng.integers(W * 32, lb + 1, NT)
    tiles = np.zeros((NT, lb + 32), dtype=np.uint8)
    for i in range(NT):
        raw = rng.choice(np.frombuffer(alpha, np.uint8), tlens[i])
        tiles[i, : tlens[i]] = translate(raw)
    pidx = rng.integers(0, NQ, B).astype(np.int32)
    tidx = rng.integers(0, NT, B).astype(np.int32)
    return smat, peq, qlens, tiles, pidx, tidx


@pytest.mark.parametrize("seed,W,lb", [(1, 1, 64), (2, 2, 128),
                                       (3, 4, 320), (4, 2, 256)])
def test_myers_host_vs_jax(seed, W, lb):
    smat, peq, qlens, tiles, pidx, tidx = _mk(seed, W=W, lb=lb)
    import jax.numpy as jnp
    ref = np.asarray(myers.myers_min_ed_gather_pos(
        jnp.asarray(peq), jnp.asarray(tiles), jnp.asarray(pidx),
        jnp.asarray(tidx), W))
    got_np = host.myers_pairs_np(peq, tiles, pidx, tidx, W)
    np.testing.assert_array_equal(got_np, ref)
    got_c = myers_pairs_native(peq, tiles, pidx, tidx, W)
    assert got_c is not None, "native lib must build in this env"
    np.testing.assert_array_equal(got_c, ref)


def _rescore_case(seed, W, lb, win):
    """One rescore fuzz case: jax reference vs numpy vs native C++.

    Called in a SUBPROCESS by test_rescore_host_vs_jax: these
    particular jax rescore compiles (64-pair batches, int64 gather
    indices -- shapes the engine never uses) leave XLA CPU in a state
    where an unrelated compile ~50 tests later segfaults inside
    backend_compile_and_load (jaxlib bug, bisected in round 4; the
    suite is green with these cases isolated). Subprocess isolation
    costs ~10s/case and keeps the coverage.
    """
    smat, peq, qlens, tiles, pidx, tidx = _mk(seed, W=W, lb=lb)
    rng = np.random.default_rng(seed + 100)
    B = len(pidx)
    max_ed = rng.integers(0, 30, B).astype(np.int64)
    ql = qlens[pidx].astype(np.int64)
    rows = min(W * 32, int(-(-int(ql.max()) // 8)) * 8)
    if win:
        x0 = rng.integers(0, 40, B).astype(np.int64)
        Lw = -(-(rows + int(max_ed.max()) + 2) // 128) * 128
    else:
        x0, Lw = None, None
    import jax.numpy as jnp
    dev = rescore_pairs_gather_async(
        jnp.asarray(peq), jnp.asarray(tiles), pidx.astype(np.int64),
        tidx.astype(np.int64), ql, max_ed, W, smat,
        x0=x0, Lw=Lw)
    re, rg, rr, rf, _ = rescore_finalize(dev, ql)
    ref = np.stack([re, rg, rr, rf]).astype(np.int32)
    # the equality contract covers pairs within budget (all the engine
    # ever rescores); over-budget pairs agree on ED=255 but their aux
    # stats are implementation-defined (see kernels/host.py docstring)
    live = ref[0] < 255
    assert live.any() and (~live).any(), "fuzz should cover both"
    got_np = host.rescore_pairs_np(peq, tiles, pidx, tidx, ql, max_ed,
                                   W, rows, x0, Lw)
    np.testing.assert_array_equal(got_np[0], ref[0])
    np.testing.assert_array_equal(got_np[:, live], ref[:, live])
    got_c = rescore_pairs_native(peq, tiles, pidx, tidx, ql, max_ed,
                                 W, rows, x0, Lw)
    assert got_c is not None
    np.testing.assert_array_equal(got_c[0], ref[0])
    np.testing.assert_array_equal(got_c[:, live], ref[:, live])


@pytest.mark.parametrize("seed,W,lb,win", [
    (11, 1, 64, False), (12, 2, 128, False), (13, 4, 320, False),
    (14, 2, 192, True), (15, 4, 320, True)])
def test_rescore_host_vs_jax(seed, W, lb, win):
    """Subprocess-isolated (see _rescore_case docstring)."""
    import subprocess
    import sys

    code = (f"import sys; sys.path.insert(0, {repr(_REPO)}); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from tests.test_host_kernels import _rescore_case; "
            f"_rescore_case({seed}, {W}, {lb}, {win}); print('CASE_OK')")
    r = subprocess.run([sys.executable, "-c", code], timeout=300,
                       capture_output=True, text=True)
    assert r.returncode == 0 and "CASE_OK" in r.stdout, \
        r.stdout + r.stderr


@pytest.mark.parametrize("seed", [21, 22])
def test_rescore_np_wide_vs_packed(seed):
    """The unpacked doubling-scan fallback == the packed DP inside the
    packed envelope (same recurrence, different chain-min machinery)."""
    smat, peq, qlens, tiles, pidx, tidx = _mk(seed, W=2, lb=192)
    rng = np.random.default_rng(seed + 500)
    B = len(pidx)
    max_ed = rng.integers(0, 30, B).astype(np.int64)
    ql = qlens[pidx].astype(np.int64)
    rows = 64
    packed = host.rescore_pairs_np(peq, tiles, pidx, tidx, ql, max_ed,
                                   2, rows)
    wide = host._rescore_np_wide(
        peq[np.asarray(pidx, np.int64)], tiles[np.asarray(tidx, np.int64)],
        ql, max_ed, 2, rows)
    np.testing.assert_array_equal(wide, packed)


@pytest.mark.parametrize("seed,W,lb", [(31, 17, 1024), (32, 16, 8000)])
def test_rescore_np_wide_shapes_vs_native(seed, W, lb):
    """Shapes outside the packing envelope (rows > 511 via W=17, or
    > 7679 columns) complete through rescore_pairs_np's wide fallback
    and match the C++ kernel -- the ADVICE-r4 crash case: long queries
    or long-reference buckets under BURST_TPU_HOST=1 with no compiler."""
    smat, peq, qlens, tiles, pidx, tidx = _mk(seed, NQ=4, NT=3, B=8,
                                              W=W, lb=lb)
    rng = np.random.default_rng(seed + 500)
    B = len(pidx)
    max_ed = rng.integers(5, 60, B).astype(np.int64)
    ql = qlens[pidx].astype(np.int64)
    rows = W * 32
    got_np = host.rescore_pairs_np(peq, tiles, pidx, tidx, ql, max_ed,
                                   W, rows)
    got_c = rescore_pairs_native(peq, tiles, pidx, tidx, ql, max_ed,
                                 W, rows)
    assert got_c is not None
    live = got_c[0] < 255
    assert live.any()
    np.testing.assert_array_equal(got_np[0], got_c[0])
    np.testing.assert_array_equal(got_np[:, live], got_c[:, live])


def test_myers_host_xalpha():
    """256-code (Xalpha) Peq tables route through the same kernels."""
    rng = np.random.default_rng(77)
    W = 2
    NQ, NT, B = 5, 4, 32
    qlens = rng.integers(20, W * 32 + 1, NQ).astype(np.int64)
    qmat = np.zeros((NQ, W * 32), dtype=np.uint8)
    for i in range(NQ):
        qmat[i, : qlens[i]] = rng.integers(1, 200, qlens[i])
    peq = myers.build_peq_x(qmat, qlens, W)
    tiles = np.zeros((NT, 160), dtype=np.uint8)
    for i in range(NT):
        n = int(rng.integers(80, 129))
        tiles[i, :n] = rng.integers(1, 200, n)
    pidx = rng.integers(0, NQ, B).astype(np.int32)
    tidx = rng.integers(0, NT, B).astype(np.int32)
    import jax.numpy as jnp
    ref = np.asarray(myers.myers_min_ed_gather_pos(
        jnp.asarray(peq), jnp.asarray(tiles), jnp.asarray(pidx),
        jnp.asarray(tidx), W))
    got_c = myers_pairs_native(peq, tiles, pidx, tidx, W)
    assert got_c is not None
    np.testing.assert_array_equal(got_c, ref)
    got_np = host.myers_pairs_np(peq, tiles, pidx, tidx, W)
    np.testing.assert_array_equal(got_np, ref)


def test_em_swap_native_vs_python():
    """Native -cr EM swap descent == the Python executable spec."""
    import os

    import burst_tpu.native as N
    from burst_tpu.fingerprint import em_refine

    rng = np.random.default_rng(17)
    tot_r = 320
    p = (rng.integers(0, 256, (tot_r, 32))
         & rng.integers(0, 256, (tot_r, 32))).astype(np.uint8)
    ix = np.arange(tot_r)
    os.environ["BURST_TPU_NO_NATIVE"] = "1"
    N._HOST_TRIED, N._HOST = False, None
    try:
        a = em_refine(p, ix.copy(), tot_r, 4)
    finally:
        del os.environ["BURST_TPU_NO_NATIVE"]
        N._HOST_TRIED, N._HOST = False, None
    b = em_refine(p, ix.copy(), tot_r, 4)
    np.testing.assert_array_equal(a, b)
