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
