"""Golden tests for prepass mode (-p, burst.c:3697-3992) vs the DB12
oracle: inline heuristic printing, both strands, fake identity, literal
-1 column, exit code 101."""
import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def ppset(tmp_path_factory):
    d = tmp_path_factory.mktemp("prepass")
    rng = np.random.default_rng(777)
    refs = golden.make_refs(rng, 30, lo=300, hi=900)
    reads = golden.make_reads(rng, refs, 60, read_len=100, max_err=4)
    # ambiguous reads exercise the scour's run-reset (no expansion in -p)
    reads.append(("ambread1", reads[0][1][:40] + "N" + reads[0][1][41:]))
    rfa, qfa = str(d / "refs.fa"), str(d / "reads.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    oedx, oacx = str(d / "o.edx"), str(d / "o.acx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-d", "QUICK", "120",
                             "-s", "400", "-a", oacx], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    return d, qfa, oedx, oacx


def _cmp(d, qfa, oedx, oacx, mode, extra=()):
    ob6 = str(d / f"op_{mode}{len(extra)}.b6")
    mb6 = str(d / f"mp_{mode}{len(extra)}.b6")
    res = golden.run_oracle(["-r", oedx, "-a", oacx, "-q", qfa, "-o", ob6,
                             "-m", mode, "-p", "-t", "1", *extra],
                            db12=True)
    assert res.returncode == 101, res.stderr + res.stdout
    rc = golden.run_ours(["-r", oedx, "-a", oacx, "-q", qfa, "-o", mb6,
                          "-m", mode, "-p", *extra], expect=101)
    assert rc == 101
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff


def test_prepass_best_fr(ppset):
    d, qfa, oedx, oacx = ppset
    _cmp(d, qfa, oedx, oacx, "BEST", extra=("-fr",))


def test_prepass_allpaths(ppset):
    d, qfa, oedx, oacx = ppset
    _cmp(d, qfa, oedx, oacx, "ALLPATHS")


def test_prepass_forage_id(ppset):
    d, qfa, oedx, oacx = ppset
    _cmp(d, qfa, oedx, oacx, "FORAGE", extra=("-i", "0.93", "-fr"))


def test_prepass_capitalist(ppset):
    d, qfa, oedx, oacx = ppset
    _cmp(d, qfa, oedx, oacx, "CAPITALIST", extra=("-fr",))


def test_prepass_any_effort32(ppset):
    d, qfa, oedx, oacx = ppset
    _cmp(d, qfa, oedx, oacx, "ANY", extra=("-fr",))
