"""Native two-pass accelerator build vs the numpy unique() path.

burst_tpu.accel.build_accelerator prefers native.accel_build_native
(counting-sort style, burst.c:3304-3532 analog) and falls back to the
vectorized numpy key-sort path. Both must produce the identical CSR
(same nonzero words, counts, clump ids in clump-ascending order) and
the identical BadList on any input, including IUPAC-bearing clumps.
"""
import numpy as np
import pytest

import burst_tpu.native as native_mod
from burst_tpu.accel import build_accelerator
from burst_tpu.native import load_host
from burst_tpu.process import process_references


def _mkdb(seed, n_refs, amb_every=0, lo=200, hi=800):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    amb = np.frombuffer(b"NRYKMSWBDHV", dtype=np.uint8)
    heads, seqs = [], []
    for i in range(n_refs):
        s = rng.choice(bases, size=int(rng.integers(lo, hi)))
        if amb_every and i % amb_every == 0:
            pos = rng.integers(0, len(s), int(rng.integers(1, 4)))
            s[pos] = amb[rng.integers(0, len(amb), len(pos))]
        heads.append(f"r{i:04d}".encode())
        seqs.append(s)
    return process_references(heads, seqs, max_len_q=100, thres=0.97,
                              rebase=True, rebase_amt=320, curate=2)


def _build_both(rd, k, monkeypatch, z=1, skip_ambig=False):
    a_nat = build_accelerator(rd, k=k, z=z, skip_ambig=skip_ambig)
    monkeypatch.setattr(native_mod, "accel_build_native",
                        lambda *a, **kw: None)
    a_np = build_accelerator(rd, k=k, z=z, skip_ambig=skip_ambig)
    monkeypatch.undo()
    return a_nat, a_np


def _assert_equal(a, b):
    np.testing.assert_array_equal(a.csr.nzw, b.csr.nzw)
    np.testing.assert_array_equal(a.csr.cnt, b.csr.cnt)
    np.testing.assert_array_equal(a.csr.ids, b.csr.ids)
    np.testing.assert_array_equal(a.bad, b.bad)


@pytest.mark.skipif(load_host() is None, reason="no native library")
@pytest.mark.parametrize("seed,n_refs,amb_every", [
    (1, 60, 0),       # all-pure clumps
    (2, 60, 7),       # mixed IUPAC clumps interleaved
    (3, 3, 1),        # tiny, all clumps ambiguous
])
def test_native_matches_numpy_k12(seed, n_refs, amb_every, monkeypatch):
    rd = _mkdb(seed, n_refs, amb_every)
    a_nat, a_np = _build_both(rd, 12, monkeypatch)
    _assert_equal(a_nat, a_np)


@pytest.mark.skipif(load_host() is None, reason="no native library")
def test_native_matches_numpy_k15(monkeypatch):
    rd = _mkdb(5, 40, amb_every=9)
    a_nat, a_np = _build_both(rd, 15, monkeypatch)
    _assert_equal(a_nat, a_np)


@pytest.mark.skipif(load_host() is None, reason="no native library")
def test_native_matches_numpy_skip_ambig(monkeypatch):
    rd = _mkdb(6, 50, amb_every=5)
    a_nat, a_np = _build_both(rd, 12, monkeypatch, skip_ambig=True)
    _assert_equal(a_nat, a_np)


@pytest.mark.skipif(load_host() is None, reason="no native library")
@pytest.mark.parametrize("seed,n_refs,amb_every", [
    (7, 60, 0), (8, 60, 6), (9, 4, 1),
])
def test_unit_index_native_matches_numpy(seed, n_refs, amb_every,
                                         monkeypatch):
    from burst_tpu.accel import build_unit_index
    rd = _mkdb(seed, n_refs, amb_every)
    acc_n = build_accelerator(rd, k=12, z=1)
    build_unit_index(rd, acc_n)
    monkeypatch.setattr(native_mod, "accel_build_native",
                        lambda *a, **kw: None)
    acc_p = build_accelerator(rd, k=12, z=1)
    build_unit_index(rd, acc_p)
    monkeypatch.undo()
    np.testing.assert_array_equal(acc_n.u_csr.nzw, acc_p.u_csr.nzw)
    np.testing.assert_array_equal(acc_n.u_csr.cnt, acc_p.u_csr.cnt)
    np.testing.assert_array_equal(acc_n.u_csr.ids, acc_p.u_csr.ids)


@pytest.mark.skipif(load_host() is None, reason="no native library")
def test_ids_mmap_build_identical(monkeypatch, tmp_path):
    rd = _mkdb(10, 50, amb_every=8)
    a_ram = build_accelerator(rd, k=12, z=1)
    monkeypatch.setenv("BURST_TPU_IDS_MMAP", str(tmp_path))
    a_mm = build_accelerator(rd, k=12, z=1)
    monkeypatch.delenv("BURST_TPU_IDS_MMAP")
    assert isinstance(a_mm.csr.ids, np.memmap)
    _assert_equal(a_ram, a_mm)
