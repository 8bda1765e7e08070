"""compute_ed_select (streamed running-min full path) equivalence.

The dense [numUnibins, tot_units] matrix of compute_ed_matrix +
select_pods is the oracle; the streamed path must produce the exact
same winner triples for every mode, including with a compaction
threshold small enough to force repeated candidate compaction
(VERDICT round 1, weak #4 / next-round #7; burst.c:4318-4521).
"""
import numpy as np
import pytest

from burst_tpu import engine
from burst_tpu.alphabet import score_matrix
from burst_tpu.process import process_queries, process_references

from . import golden


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(31337)
    refs = golden.make_refs(rng, 60, lo=100, hi=700)
    reads = golden.make_reads(rng, refs, 220, read_len=90, max_err=3,
                              rc_frac=0.4)
    rheads = [h.encode() for h, _ in refs]
    rseqs = [np.frombuffer(s.encode(), np.uint8).copy() for _, s in refs]
    qheads = [h.encode() for h, _ in reads]
    qseqs = [np.frombuffer(s.encode(), np.uint8).copy() for _, s in reads]
    rd = process_references(rheads, rseqs, max_len_q=90, thres=0.97,
                            rebase=True, rebase_amt=300, curate=2)
    qd = process_queries(qheads, qseqs, 0.97, True)
    return qd, rd


@pytest.mark.parametrize("mode", ["BEST", "ALLPATHS", "CAPITALIST",
                                  "FORAGE"])
def test_select_matches_dense(workload, mode):
    qd, rd = workload
    smat = score_matrix()
    ed = engine.compute_ed_matrix(qd, rd, smat)
    dj, dp, de = engine.select_pods(qd, rd, ed, mode)
    sj, sp, se = engine.compute_ed_select(qd, rd, mode, smat)
    np.testing.assert_array_equal(dj, sj)
    np.testing.assert_array_equal(dp, sp)
    np.testing.assert_array_equal(de, se)


def test_select_with_forced_compaction(workload):
    """compact_at=16 forces a compaction after nearly every block."""
    qd, rd = workload
    smat = score_matrix()
    ed = engine.compute_ed_matrix(qd, rd, smat)
    dj, dp, de = engine.select_pods(qd, rd, ed, "BEST")
    sj, sp, se = engine.compute_ed_select(qd, rd, "BEST", smat,
                                          compact_at=16)
    np.testing.assert_array_equal(dj, sj)
    np.testing.assert_array_equal(dp, sp)
    np.testing.assert_array_equal(de, se)


def test_iter_blocks_cover_matrix(workload):
    """Streamed blocks with a tiny pipeline tile the dense matrix."""
    qd, rd = workload
    smat = score_matrix()
    dense = engine.compute_ed_matrix(qd, rd, smat)
    seen = np.zeros(dense.shape, dtype=bool)
    acc = np.full(dense.shape, 255, dtype=np.uint8)
    for rws, pss, blk in engine.iter_ed_blocks(qd, rd, smat,
                                               max_pending=2):
        acc[np.ix_(rws, pss)] = blk
        seen[np.ix_(rws, pss)] = True
    assert seen.all()
    np.testing.assert_array_equal(acc, dense)
