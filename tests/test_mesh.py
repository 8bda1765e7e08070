"""Sharded phase-A scan must equal the single-device matrix bit-for-bit."""
import numpy as np

import jax

from burst_tpu.alphabet import score_matrix
from burst_tpu.engine import compute_ed_matrix
from burst_tpu.io.fasta import write_fasta  # noqa: F401 (import check)
from burst_tpu.parallel.mesh import compute_ed_matrix_sharded
from burst_tpu.process import process_queries, process_references

from . import golden


def _dataset(seed=5, n_refs=30, n_reads=24):
    rng = np.random.default_rng(seed)
    refs = golden.make_refs(rng, n_refs, lo=150, hi=500)
    reads = golden.make_reads(rng, refs, n_reads, read_len=100, max_err=2)
    rh = [h.encode() for h, _ in refs]
    rs = [np.frombuffer(s.encode(), dtype=np.uint8) for _, s in refs]
    qh = [h.encode() for h, _ in reads]
    qs = [np.frombuffer(s.encode(), dtype=np.uint8) for _, s in reads]
    qd = process_queries(qh, qs, 0.95, do_rc=True)
    rd = process_references(rh, rs, max_len_q=qd.max_len, thres=0.95)
    return qd, rd


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_matches_single_device():
    qd, rd = _dataset()
    sm = score_matrix()
    single = compute_ed_matrix(qd, rd, sm)
    for shards in (2, 8):
        sharded = compute_ed_matrix_sharded(qd, rd, sm, shards)
        assert np.array_equal(single, sharded), shards


def test_sharded_accel_path_bit_identical(tmp_path):
    """Full accel pipeline with --shards N must produce the same b6
    bytes as the single-device path (db-sharded phase A + phase B)."""
    import subprocess
    import sys
    rng = np.random.default_rng(77)
    refs = golden.make_refs(rng, 30, lo=300, hi=900)
    reads = golden.make_reads(rng, refs, 200, read_len=100, max_err=2)
    rfa = str(tmp_path / "r.fa")
    qfa = str(tmp_path / "q.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # PYTHONPATH must NOT include the axon sitecustomize dir: its TPU
    # registration overrides JAX_PLATFORMS=cpu, and the virtual
    # 8-device CPU mesh is what this test shards over
    env = dict(os.environ, BURST_TPU_SCOUR_N="12",
               JAX_PLATFORMS="cpu", PYTHONPATH=repo,
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8")
    edx, acx = str(tmp_path / "d.edx"), str(tmp_path / "d.acx")
    subprocess.run([sys.executable, "-m", "burst_tpu.cli", "-r", rfa,
                    "-o", edx, "-a", acx, "-d", "DNA", "320", "-s"],
                   check=True, env=env, capture_output=True)
    for mode in ("BEST", "ALLPATHS", "CAPITALIST"):
        outs = []
        for shards in ("1", "4"):
            out = str(tmp_path / f"o_{mode}_{shards}.b6")
            subprocess.run(
                [sys.executable, "-m", "burst_tpu.cli", "-r", edx,
                 "-a", acx, "-q", qfa, "-o", out, "-m", mode,
                 "--shards", shards],
                check=True, env=env, capture_output=True)
            outs.append(out)
        assert golden.diff_files(*outs) is None, mode
