"""BURST_TPU_HOST=1 and device-stall fallback: byte-identical output.

Two recovery layers are promised by devtime/engine:
  * host mode (BURST_TPU_HOST=1): no device is ever touched; every
    dispatch site routes to kernels/host.py;
  * stall fallback: a device fetch that exceeds the timeout marks the
    backend dead and the pending chunks are recomputed on the host via
    the closures every dispatch site registers.
Both must reproduce the device-path bytes exactly.
"""
import os

import numpy as np
import pytest

from burst_tpu import devtime, engine, modes
from burst_tpu.accel import build_accelerator
from burst_tpu.process import (bin_queries_for_accel, process_queries,
                               process_references)
from burst_tpu.serving import Aligner


def _workload(seed=5, n_refs=25, ref_len=500, n_reads=200):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = [rng.choice(bases, size=ref_len) for _ in range(n_refs)]
    rheads = [f"r{i:03d}".encode() for i in range(n_refs)]
    reads, qheads = [], []
    for i in range(n_reads):
        s = refs[int(rng.integers(0, n_refs))]
        st = int(rng.integers(0, ref_len - 100))
        r = s[st:st + 100].copy()
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, 100))] = bases[int(rng.integers(0, 4))]
        if i % 23 == 0:
            r[int(rng.integers(0, 100))] = ord("N")
        reads.append(r)
        qheads.append(f"q{i:05d}".encode())
    rd = process_references(rheads, [r.copy() for r in refs],
                            max_len_q=100, thres=0.98, rebase=True,
                            rebase_amt=320, curate=2)
    acc = build_accelerator(rd, k=12, z=1)
    return rd, acc, qheads, reads


@pytest.fixture
def _clean_devtime():
    prev = devtime._DEAD
    yield
    devtime._DEAD = prev


@pytest.mark.parametrize("mode", ["BEST", "ALLPATHS", "CAPITALIST",
                                  "FORAGE", "ANY"])
def test_host_mode_byte_identical(mode, monkeypatch, _clean_devtime):
    rd, acc, qheads, reads = _workload()
    ref = Aligner(rd, acc, thres=0.98, mode=mode, do_rc=True
                  ).align_batch(qheads, [r.copy() for r in reads])
    monkeypatch.setenv("BURST_TPU_HOST", "1")
    assert not devtime.device_ok()
    got = Aligner(rd, acc, thres=0.98, mode=mode, do_rc=True
                  ).align_batch(qheads, [r.copy() for r in reads])
    assert got == ref and ref.count(b"\n") > 100


def test_host_mode_direct_path(monkeypatch, _clean_devtime):
    """Non-accel full path (streamed compute_ed_select) in host mode."""
    rd, _, qheads, reads = _workload(n_refs=10, n_reads=60)
    ref = Aligner(rd, None, thres=0.98, mode="BEST", do_rc=True
                  ).align_batch(qheads, [r.copy() for r in reads])
    monkeypatch.setenv("BURST_TPU_HOST", "1")
    got = Aligner(rd, None, thres=0.98, mode="BEST", do_rc=True
                  ).align_batch(qheads, [r.copy() for r in reads])
    assert got == ref and ref.count(b"\n") > 30


def test_stall_fallback_byte_identical(monkeypatch, _clean_devtime):
    """A hung device fetch trips the watchdog; pending chunks recompute
    through the host closures and the batch completes identically."""
    import time

    rd, acc, qheads, reads = _workload(seed=9)
    ref = Aligner(rd, acc, thres=0.98, mode="BEST", do_rc=True
                  ).align_batch(qheads, [r.copy() for r in reads])

    real_get = devtime._get

    def hung_get(tree):
        # simulate a dead tunnel: block past the timeout WITHOUT ever
        # touching jax -- the abandoned worker thread must not issue a
        # concurrent device_get while later tests compile (XLA CPU in
        # this jaxlib corrupts state under that interleaving; bisected
        # in round 4 as the delayed test-170 segfault)
        time.sleep(30)
        return None

    monkeypatch.setattr(devtime, "_get", hung_get)
    monkeypatch.setenv("BURST_TPU_FETCH_TIMEOUT_S", "0.3")
    got = Aligner(rd, acc, thres=0.98, mode="BEST", do_rc=True
                  ).align_batch(qheads, [r.copy() for r in reads])
    assert got == ref and ref.count(b"\n") > 100
    assert devtime._DEAD, "watchdog must mark the backend dead"
    # the rest of the process keeps working, now on the host path
    monkeypatch.setattr(devtime, "_get", real_get)
    again = Aligner(rd, acc, thres=0.98, mode="BEST", do_rc=True
                    ).align_batch(qheads, [r.copy() for r in reads])
    assert again == ref


def test_stall_raises_without_fallback(monkeypatch, _clean_devtime):
    import time

    import jax.numpy as jnp

    monkeypatch.setenv("BURST_TPU_FETCH_TIMEOUT_S", "0.2")
    monkeypatch.setattr(devtime, "_get",
                        lambda tree: time.sleep(10))
    with pytest.raises(devtime.DeviceStall):
        devtime.fetch(jnp.zeros(4))
    assert devtime._DEAD
