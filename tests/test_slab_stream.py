"""Larger-than-HBM tile streaming: with the resident-tile budget forced
to ~100 bytes every bucket exceeds it, so phase A runs through the
double-buffered slab path (_pairs_slab_stream), rescore through the
compact winner-submatrix path, and the fused scan bails to two-step --
and the b6 bytes must not change (VERDICT round 1, missing #2)."""
import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def slabset(tmp_path_factory):
    d = tmp_path_factory.mktemp("slab")
    rng = np.random.default_rng(2468)
    refs = golden.make_refs(rng, 30, lo=250, hi=800)
    reads = golden.make_reads(rng, refs, 150, read_len=100, max_err=3,
                              rc_frac=0.3)
    rfa, qfa = str(d / "refs.fa"), str(d / "reads.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    edx, acx = str(d / "s.edx"), str(d / "s.acx")
    golden.run_ours(["-r", rfa, "-o", edx, "-d", "DNA", "320", "-s",
                     "-a", acx, "--kmer", "12"])
    return d, rfa, qfa, edx, acx


@pytest.mark.parametrize("mode", ["BEST", "ALLPATHS", "CAPITALIST"])
def test_slab_streaming_accel_bit_identical(slabset, mode,
                                            monkeypatch):
    d, rfa, qfa, edx, acx = slabset
    ref = str(d / f"resident_{mode}.b6")
    out = str(d / f"slab_{mode}.b6")
    golden.run_ours(["-r", edx, "-a", acx, "-q", qfa, "-o", ref,
                     "-m", mode])
    monkeypatch.setenv("BURST_TPU_TILE_HBM_MB", "0.0001")
    golden.run_ours(["-r", edx, "-a", acx, "-q", qfa, "-o", out,
                     "-m", mode])
    with open(ref, "rb") as f1, open(out, "rb") as f2:
        assert f1.read() == f2.read() != b""


def test_slab_streaming_direct_bit_identical(slabset, monkeypatch):
    d, rfa, qfa, edx, acx = slabset
    ref = str(d / "resident_direct.b6")
    out = str(d / "slab_direct.b6")
    golden.run_ours(["-r", rfa, "-q", qfa, "-o", ref, "-m", "BEST",
                     "-fr"])
    monkeypatch.setenv("BURST_TPU_TILE_HBM_MB", "0.0001")
    golden.run_ours(["-r", rfa, "-q", qfa, "-o", out, "-m", "BEST",
                     "-fr"])
    with open(ref, "rb") as f1, open(out, "rb") as f2:
        assert f1.read() == f2.read() != b""
