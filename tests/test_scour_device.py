"""Device scour == native scour, end to end through accel_candidates.

The device path (kernels/scour_device) must reproduce the native host
scour bit-for-bit: same candidate clump lists in the same (hits desc,
first-touch asc) order, same member expansion, and the same passing
unit-key set -- including when per-row slot budgets overflow and rows
are re-scoured on the host.
"""
import os

import numpy as np
import pytest

from burst_tpu import engine
from burst_tpu.accel import build_accelerator

from burst_tpu.process import (bin_queries_for_accel, process_queries,
                               process_references)


def _workload(seed=7, n_refs=30, ref_len=600, n_reads=400, k=12,
              with_ambig=True):
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
        if with_ambig and i % 37 == 0:
            r[int(rng.integers(0, 100))] = ord("N")
        reads.append(r)
        qheads.append(f"q{i:05d}".encode())
    rd = process_references(rheads, [r.copy() for r in refs],
                            max_len_q=100, thres=0.98, rebase=True,
                            rebase_amt=320, curate=2)
    acc = build_accelerator(rd, k=k, z=1)
    qd = process_queries(qheads, reads, 0.98, do_rc=False)
    qbins = bin_queries_for_accel(qd, acc.k, 1)
    return qd, rd, acc, qbins


def _visits_with(qd, rd, acc, qbins, dev: bool, qbunch: int = 1):
    os.environ["BURST_TPU_DEV_SCOUR"] = "1" if dev else "0"
    try:
        return engine.accel_candidates(qd, rd, acc, qbins,
                                       qbunch=qbunch)
    finally:
        os.environ.pop("BURST_TPU_DEV_SCOUR", None)


def _assert_visits_equal(a, b):
    np.testing.assert_array_equal(a.offs, b.offs)
    np.testing.assert_array_equal(a.flat, b.flat)
    np.testing.assert_array_equal(a.full, b.full)
    assert (a.pass_keys is None) == (b.pass_keys is None)
    if a.pass_keys is not None:
        np.testing.assert_array_equal(a.pass_keys, b.pass_keys)
        np.testing.assert_array_equal(a.filtered, b.filtered)
    np.testing.assert_array_equal(np.asarray(a.bflat),
                                  np.asarray(b.bflat))
    np.testing.assert_array_equal(a.boffs, b.boffs)


def test_device_scour_matches_native():
    qd, rd, acc, qbins = _workload()
    ref = _visits_with(qd, rd, acc, qbins, dev=False)
    got = _visits_with(qd, rd, acc, qbins, dev=True)
    assert got.offs[-1] > 0          # nonempty workload
    _assert_visits_equal(ref, got)


@pytest.mark.parametrize("E", ["32", "96"])   # total / partial overflow
def test_device_scour_overflow_fallback(E):
    qd, rd, acc, qbins = _workload(seed=11)
    ref = _visits_with(qd, rd, acc, qbins, dev=False)
    os.environ["BURST_TPU_SCOUR_E"] = E
    try:
        got = _visits_with(qd, rd, acc, qbins, dev=True)
    finally:
        os.environ.pop("BURST_TPU_SCOUR_E", None)
    _assert_visits_equal(ref, got)


def test_device_scour_k15_searchsorted():
    """k=15 has no dense rank table; binary-search lookup must agree."""
    qd, rd, acc, qbins = _workload(seed=13, k=15, n_reads=150)
    ref = _visits_with(qd, rd, acc, qbins, dev=False)
    got = _visits_with(qd, rd, acc, qbins, dev=True)
    assert got.offs[-1] > 0
    _assert_visits_equal(ref, got)


def test_device_scour_no_ambig():
    qd, rd, acc, qbins = _workload(seed=3, with_ambig=False)
    assert int(qbins[0]) == 0
    ref = _visits_with(qd, rd, acc, qbins, dev=False)
    got = _visits_with(qd, rd, acc, qbins, dev=True)
    _assert_visits_equal(ref, got)


def _fused_scan(qd, rd, acc, qbins):
    from burst_tpu.alphabet import score_matrix
    os.environ["BURST_TPU_DEV_SCOUR"] = "1"
    try:
        return engine.accel_scan_fused(qd, rd, acc, qbins,
                                       score_matrix(), qbunch=1)
    finally:
        os.environ.pop("BURST_TPU_DEV_SCOUR", None)


def test_fused_scan_matches_two_step():
    from burst_tpu.alphabet import score_matrix

    qd, rd, acc, qbins = _workload(seed=19)
    smat = score_matrix()
    ref_vis = _visits_with(qd, rd, acc, qbins, dev=False)
    ref_sed = engine.compute_ed_matrix_accel(qd, rd, ref_vis, smat)
    got = _fused_scan(qd, rd, acc, qbins)
    assert got is not None
    vis, sed = got
    _assert_visits_equal(ref_vis, vis)
    nj = len(qd.seqs)
    ref_d = engine.densify(ref_sed, nj, rd.tot_units)
    got_d = engine.densify(sed.materialize(), nj, rd.tot_units)
    np.testing.assert_array_equal(ref_d, got_d)
    # (first, last) best-column records may differ by trailing-pad
    # ties (the fused path pads every unit to one common width); the
    # windowed rescore stays exact either way -- checked by the
    # end-to-end b6 test below.


def test_fused_scan_matches_two_step_k15():
    """The production DB15 configuration through the FUSED chain: the
    scour lookups take the sorted-nonzero-word binary-search path (no
    dense rank table at 4^15), everything else identical. VERDICT-r4
    item 8."""
    from burst_tpu.alphabet import score_matrix

    qd, rd, acc, qbins = _workload(seed=29, k=15, n_reads=200)
    smat = score_matrix()
    ref_vis = _visits_with(qd, rd, acc, qbins, dev=False)
    ref_sed = engine.compute_ed_matrix_accel(qd, rd, ref_vis, smat)
    got = _fused_scan(qd, rd, acc, qbins)
    assert got is not None
    vis, sed = got
    _assert_visits_equal(ref_vis, vis)
    nj = len(qd.seqs)
    ref_d = engine.densify(ref_sed, nj, rd.tot_units)
    got_d = engine.densify(sed.materialize(), nj, rd.tot_units)
    np.testing.assert_array_equal(ref_d, got_d)


def test_fused_scan_overflow():
    from burst_tpu.alphabet import score_matrix

    qd, rd, acc, qbins = _workload(seed=23)
    smat = score_matrix()
    ref_vis = _visits_with(qd, rd, acc, qbins, dev=False)
    ref_sed = engine.compute_ed_matrix_accel(qd, rd, ref_vis, smat)
    os.environ["BURST_TPU_SCOUR_E"] = "96"
    try:
        got = _fused_scan(qd, rd, acc, qbins)
    finally:
        os.environ.pop("BURST_TPU_SCOUR_E", None)
    assert got is not None
    vis, sed = got
    _assert_visits_equal(ref_vis, vis)
    nj = len(qd.seqs)
    np.testing.assert_array_equal(
        engine.densify(ref_sed, nj, rd.tot_units),
        engine.densify(sed.materialize(), nj, rd.tot_units))


@pytest.mark.parametrize("mode", ["BEST", "ALLPATHS", "FORAGE"])
def test_device_scour_end_to_end_b6(mode):
    """Full pipeline output identical under host scour, device scour,
    and the fused device scan."""
    import io
    from burst_tpu import modes
    from burst_tpu.alphabet import score_matrix

    smat = score_matrix()

    def run(path):
        qd, rd2, acc2, qbins = _workload(seed=5)
        if path == "fused":
            vis, sed = _fused_scan(qd, rd2, acc2, qbins)
        else:
            vis = _visits_with(qd, rd2, acc2, qbins, path == "dev")
            sed = engine.compute_ed_matrix_accel(qd, rd2, vis, smat)
        juni, refpos, eds = engine.select_pods(qd, rd2, sed, mode)
        order = engine.accel_pod_order(qd, rd2, vis, juni, refpos, eds)
        cols = sed.lookup_cols(juni, refpos, rd2.tot_units)
        pods = engine.rescore_winners(qd, rd2, juni, refpos, eds,
                                      mode, smat, order, win_cols=cols)
        buf = io.StringIO()
        if mode == "BEST":
            modes.report_best(pods, qd, rd2, modes.B6Writer(buf))
        else:
            modes.report_allpaths_or_forage(
                pods, qd, rd2, modes.B6Writer(buf), None,
                forage=(mode == "FORAGE"))
        return buf.getvalue()

    host = run("host")
    assert host == run("dev")
    assert host == run("fused")


def test_align_stream_matches_batches():
    """Pipelined streaming yields the same bytes, in order."""
    from burst_tpu.serving import Aligner

    qd, rd, acc, _ = _workload(seed=29)
    del qd
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    batches = []
    for b in range(3):
        seqs = [rng.choice(bases, size=100) for _ in range(60)]
        heads = [f"b{b}q{i}".encode() for i in range(60)]
        batches.append((heads, seqs))
    al = Aligner(rd, acc, thres=0.98, mode="BEST", do_rc=False)
    seq_out = [al.align_batch(h, s) for h, s in batches]
    stream_out = list(al.align_stream(batches))
    assert stream_out == seq_out


def test_align_stream_alternate_matches():
    """Alternating host/device scour across the stream: same bytes."""
    from burst_tpu.serving import Aligner

    _, rd, acc, _ = _workload(seed=31)
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    batches = []
    for b in range(4):
        seqs = [rng.choice(bases, size=100) for _ in range(50)]
        heads = [f"b{b}q{i}".encode() for i in range(50)]
        batches.append((heads, seqs))
    al = Aligner(rd, acc, thres=0.98, mode="BEST", do_rc=False)
    os.environ["BURST_TPU_DEV_SCOUR"] = "1"   # device available on CPU
    try:
        seq_out = [al.align_batch(h, s) for h, s in batches]
        alt_out = list(al.align_stream(batches, alternate=True))
    finally:
        os.environ.pop("BURST_TPU_DEV_SCOUR", None)
    assert alt_out == seq_out


def test_cap_escalation(monkeypatch):
    """Winner-buffer overflow escalates caps once and sticks."""
    from burst_tpu.accel import build_accelerator, build_unit_index
    from burst_tpu.kernels import scour_device as sd

    # chimeric reads built from four references each: with mm=0 every
    # hit clump wins, flooding tiny winner caps
    rng = np.random.default_rng(43)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = [rng.choice(bases, size=600) for _ in range(40)]
    rheads = [f"r{i:03d}".encode() for i in range(40)]
    reads, qheads = [], []
    for i in range(256):
        parts = []
        for p in range(2):       # ~3 winner clumps per read: between
            src_r = refs[int(rng.integers(0, 40))]   # the x2 and x4 caps
            st = int(rng.integers(0, 575))
            parts.append(src_r[st:st + 25])
        parts.append(rng.choice(bases, size=50))
        reads.append(np.concatenate(parts))
        qheads.append(f"q{i:05d}".encode())
    rd = process_references(rheads, [r.copy() for r in refs],
                            max_len_q=100, thres=0.98, rebase=True,
                            rebase_amt=320, curate=2)
    acc = build_accelerator(rd, k=12, z=1)
    build_unit_index(rd, acc)
    qd = process_queries(qheads, reads, 0.98, do_rc=False)
    qbins = bin_queries_for_accel(qd, acc.k, 1)
    tabs = sd.get_tables(acc)
    b0, b1 = int(qbins[0]), int(qbins[1])
    qmat, qlens, _ = engine._query_matrix(qd)
    zeros = np.zeros(b1 - b0, np.int64)
    monkeypatch.setattr(sd, "CHUNK_ROWS", 64)   # tiny winner caps
    res = sd.scour_rows(np.ascontiguousarray(qmat[b0:b1]),
                        qlens[b0:b1], acc.k, zeros, zeros, tabs,
                        rd.tot_units // 16 + 1, rd.tot_units)
    assert getattr(tabs, "cap_factor", 2) == 4   # escalated + sticky
    assert len(res["cj"]) > 2 * 64               # overflowed factor 2
    # fresh tables pre-set to 4 give identical results
    tabs2 = sd.ScourTables(acc.u_csr, 1 << (2 * acc.k), dense=True)
    tabs2.cap_factor = 4
    res2 = sd.scour_rows(np.ascontiguousarray(qmat[b0:b1]),
                         qlens[b0:b1], acc.k, zeros, zeros, tabs2,
                         rd.tot_units // 16 + 1, rd.tot_units)
    for key in ("cj", "ccl", "chits", "cminw", "ukeys"):
        np.testing.assert_array_equal(res[key], res2[key])


def test_fused_scan_device_peq_injection():
    """No-ambig batches rescore against device-built Peq planes;
    output must stay byte-identical to the host path."""
    import io
    from burst_tpu import modes
    from burst_tpu.alphabet import score_matrix

    smat = score_matrix()

    def run(path):
        qd, rd2, acc2, qbins = _workload(seed=47, with_ambig=False)
        assert int(qbins[0]) == 0
        if path == "fused":
            vis, sed = _fused_scan(qd, rd2, acc2, qbins)
            assert (1 * 4, smat.tobytes()) not in \
                getattr(qd, "_peqcache", {})   # no host peq built
            assert (4, smat.tobytes()) in qd._peqdev   # device-injected
        else:
            vis = _visits_with(qd, rd2, acc2, qbins, False)
            sed = engine.compute_ed_matrix_accel(qd, rd2, vis, smat)
        juni, refpos, eds = engine.select_pods(qd, rd2, sed, "BEST")
        cols = sed.lookup_cols(juni, refpos, rd2.tot_units)
        pods = engine.rescore_winners(qd, rd2, juni, refpos, eds,
                                      "BEST", smat, win_cols=cols)
        buf = io.StringIO()
        modes.report_best(pods, qd, rd2, modes.B6Writer(buf))
        return buf.getvalue()

    assert run("host") == run("fused")


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_device_scour_fuzz(seed):
    """Randomized workloads: device and native scour always agree."""
    rng = np.random.default_rng(seed)
    qd, rd, acc, qbins = _workload(
        seed=seed, n_refs=int(rng.integers(10, 50)),
        ref_len=int(rng.integers(400, 1200)),
        n_reads=int(rng.integers(100, 500)),
        with_ambig=bool(rng.integers(0, 2)))
    ref = _visits_with(qd, rd, acc, qbins, dev=False)
    got = _visits_with(qd, rd, acc, qbins, dev=True)
    _assert_visits_equal(ref, got)


# ------------------------------------------------ QBUNCH > 1 device path

@pytest.mark.parametrize("qbunch", [
    4, pytest.param(16, marks=pytest.mark.full)])
def test_device_scour_qbunch_matches_native(qbunch):
    """QBUNCH>1 (reference-default CLI regime, burst.c:4019-4021): the
    two-dispatch device bunch scour reproduces the native bunch walk --
    candidate lists, member expansion, and per-member unit keys."""
    qd, rd, acc, qbins = _workload()
    # prove the device bunch branch is actually taken (not a silent
    # host fallback masking a regression)
    from burst_tpu.engine import (_ambig_word_lists, _query_matrix,
                                  bunch_thresholds)
    engine.rd_acc_unit_index(rd, acc)
    qmat, qlens_all, _ = _query_matrix(qd)
    b0, b1 = int(qbins[0]), int(qbins[1])
    n_clumps = rd.tot_units // 16 + (1 if rd.tot_units % 16 else 0)
    mm_b, mm_i, _nb = bunch_thresholds(qd, b1, acc.k, qbunch, False)
    aq_off, aqw, aqm, _ = _ambig_word_lists(qd, b0, acc.k, acc.z)
    res = engine._scour_device_bunches(
        qd, rd, acc, b0, b1, qbunch, acc.k, mm_b, mm_i, qmat,
        qlens_all, aq_off, aqw, aqm, n_clumps)
    assert res is not None, "device bunch scour branch not taken"

    ref = _visits_with(qd, rd, acc, qbins, dev=False, qbunch=qbunch)
    got = _visits_with(qd, rd, acc, qbins, dev=True, qbunch=qbunch)
    assert got.offs[-1] > 0
    _assert_visits_equal(ref, got)


@pytest.mark.parametrize("env,val", [
    ("BURST_TPU_SCOUR_EB", "64"),    # bunch slot-budget overflow
    ("BURST_TPU_SCOUR_E", "48"),     # member slot-budget overflow
])
def test_device_scour_qbunch_overflow(env, val, monkeypatch):
    """Overflowing bunch rows re-scour on the host candidates-only;
    overflowing member rows re-run the host unit prefilter -- both
    splice back bit-exactly."""
    qd, rd, acc, qbins = _workload(seed=11)
    ref = _visits_with(qd, rd, acc, qbins, dev=False, qbunch=8)
    monkeypatch.setenv(env, val)
    got = _visits_with(qd, rd, acc, qbins, dev=True, qbunch=8)
    _assert_visits_equal(ref, got)


@pytest.mark.parametrize("seed", [404, 505])
@pytest.mark.full
def test_device_scour_qbunch_fuzz(seed):
    rng = np.random.default_rng(seed)
    qbunch = int(rng.integers(2, 17))
    qd, rd, acc, qbins = _workload(
        seed=seed, n_refs=int(rng.integers(10, 50)),
        ref_len=int(rng.integers(400, 1200)),
        n_reads=int(rng.integers(100, 500)),
        with_ambig=bool(rng.integers(0, 2)))
    ref = _visits_with(qd, rd, acc, qbins, dev=False, qbunch=qbunch)
    got = _visits_with(qd, rd, acc, qbins, dev=True, qbunch=qbunch)
    _assert_visits_equal(ref, got)


@pytest.mark.parametrize("mode", [
    "BEST", pytest.param("ALLPATHS", marks=pytest.mark.full),
    pytest.param("CAPITALIST", marks=pytest.mark.full)])
def test_device_scour_qbunch_end_to_end_b6(mode):
    """Pipeline bytes identical under host and device scour at the
    reference-default bunch width."""
    import io
    from burst_tpu import modes
    from burst_tpu.alphabet import score_matrix

    smat = score_matrix()

    def run(dev):
        qd, rd2, acc2, qbins = _workload(seed=23)
        vis = _visits_with(qd, rd2, acc2, qbins, dev, qbunch=16)
        sed = engine.compute_ed_matrix_accel(qd, rd2, vis, smat)
        juni, refpos, eds = engine.select_pods(qd, rd2, sed, mode)
        order = engine.accel_pod_order(qd, rd2, vis, juni, refpos, eds)
        cols = sed.lookup_cols(juni, refpos, rd2.tot_units)
        pods = engine.rescore_winners(qd, rd2, juni, refpos, eds,
                                      mode, smat, order, win_cols=cols)
        buf = io.StringIO()
        if mode == "BEST":
            modes.report_best(pods, qd, rd2, modes.B6Writer(buf))
        elif mode == "CAPITALIST":
            modes.report_capitalist(pods, qd, rd2,
                                    modes.B6Writer(buf), None)
        else:
            modes.report_allpaths_or_forage(
                pods, qd, rd2, modes.B6Writer(buf), None, forage=False)
        return buf.getvalue()

    host = run(False)
    assert host == run(True) != ""
