"""Thread-safety of the native scour result handoff.

serving.Aligner.align_stream pipelines batches on worker threads, so
two align_batch calls can be inside the C++ scour concurrently. The
scour result is passed from scour_run to scour_fetch through library
state; that state must be per-thread (burst_host.cpp ScourResult is
thread_local) or one batch's run clobbers another's results between
its run and fetch -- observed once as mismatched mflat/mcnt sizes in
engine._assemble_visits (which now also guards the invariant).
"""
import os
import threading

import numpy as np
import pytest

from burst_tpu import engine
from burst_tpu.native import load_host

from .test_scour_device import _workload, _visits_with, \
    _assert_visits_equal


@pytest.mark.skipif(load_host() is None, reason="no native library")
def test_concurrent_host_scour_consistent():
    qd, rd, acc, qbins = _workload(seed=21, n_refs=40, n_reads=600)
    ref_vis = _visits_with(qd, rd, acc, qbins, dev=False)
    errs = []
    hold = threading.Barrier(4)

    def work():
        try:
            hold.wait()
            for _ in range(6):
                vis = _visits_with(qd, rd, acc, qbins, dev=False)
                _assert_visits_equal(vis, ref_vis)
        except Exception as e:          # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=work) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs[0]


@pytest.mark.skipif(load_host() is None, reason="no native library")
def test_stream_depth2_host_scour_identical():
    """align_stream with depth-2 overlap, host scour forced on every
    batch: byte-identical to sequential align_batch."""
    from burst_tpu.serving import Aligner

    rng = np.random.default_rng(22)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = [rng.choice(bases, size=600) for _ in range(30)]
    rheads = [f"r{i:03d}".encode() for i in range(30)]
    from burst_tpu.accel import build_accelerator
    from burst_tpu.process import process_references
    rd = process_references(rheads, [r.copy() for r in refs],
                            max_len_q=100, thres=0.98, rebase=True,
                            rebase_amt=320, curate=2)
    acc = build_accelerator(rd, k=12, z=1)
    heads, seqs = [], []
    for i in range(300):
        s = refs[int(rng.integers(0, 30))]
        st = int(rng.integers(0, 500))
        r = s[st:st + 100].copy()
        r[int(rng.integers(0, 100))] = bases[int(rng.integers(0, 4))]
        heads.append(f"q{i:05d}".encode())
        seqs.append(r)
    al = Aligner(rd, acc, thres=0.98, mode="BEST", do_rc=False)
    os.environ["BURST_TPU_DEV_SCOUR"] = "0"
    try:
        seq_out = [al.align_batch(heads, seqs) for _ in range(4)]
        got = list(al.align_stream([(heads, seqs)] * 4))
    finally:
        os.environ.pop("BURST_TPU_DEV_SCOUR", None)
    assert got == seq_out
