"""Golden tests with indel-bearing reads (vs the reference binary).

Round-1 goldens planted substitutions only; these plant deletions and
insertions too, so gap counting, the dual-objective tiebreak and the
id = 1 - ED/(len+gapQ) divisor (burst.c:771-798, 844-860) are verified
end-to-end against the oracle, both strands.
"""
import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def indelset(tmp_path_factory):
    d = tmp_path_factory.mktemp("indel")
    rng = np.random.default_rng(424242)
    refs = golden.make_refs(rng, 20, lo=200, hi=500)
    reads = golden.make_reads_indel(rng, refs, 70, read_len=100, max_err=3)
    rfa, qfa = str(d / "refs.fa"), str(d / "reads.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    return d, rfa, qfa


def _compare(d, rfa, qfa, mode, extra=(), tag=""):
    ob6 = str(d / f"oracle_{mode}{tag}{len(extra)}.b6")
    mb6 = str(d / f"ours_{mode}{tag}{len(extra)}.b6")
    res = golden.run_oracle(["-r", rfa, "-q", qfa, "-o", ob6,
                             "-m", mode, *extra])
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", rfa, "-q", qfa, "-o", mb6, "-m", mode, *extra])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff


def test_indel_best(indelset):
    _compare(*indelset, "BEST")


def test_indel_allpaths(indelset):
    _compare(*indelset, "ALLPATHS")


def test_indel_capitalist(indelset):
    _compare(*indelset, "CAPITALIST")


def test_indel_forage(indelset):
    _compare(*indelset, "FORAGE", extra=("-i", "0.92"))


def test_indel_best_rc(indelset):
    d, rfa, qfa = indelset
    rng = np.random.default_rng(515151)
    refs = golden.make_refs(rng, 14, lo=200, hi=400, prefix="ircref")
    reads = golden.make_reads_indel(rng, refs, 50, read_len=90, max_err=3,
                                    rc_frac=0.5, prefix="ircread")
    rfa2, qfa2 = str(d / "irc_refs.fa"), str(d / "irc_reads.fa")
    golden.write_fasta(rfa2, refs)
    golden.write_fasta(qfa2, reads)
    _compare(d, rfa2, qfa2, "ALLPATHS", extra=("-fr", "-i", "0.93"),
             tag="rc")


def test_indel_accel_best(indelset):
    """Indel reads through the k=12 accelerator pipeline."""
    d, rfa, qfa = indelset
    oedx, oacx = str(d / "oi.edx"), str(d / "oi.acx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-d", "QUICK", "120",
                             "-s", "400", "-a", oacx], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    ob6, mb6 = str(d / "oia.b6"), str(d / "mia.b6")
    res = golden.run_oracle(["-r", oedx, "-a", oacx, "-q", qfa, "-o", ob6,
                             "-m", "BEST", "-i", "0.94"], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", oedx, "-a", oacx, "-q", qfa, "-o", mb6,
                     "-m", "BEST", "-i", "0.94"])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff
