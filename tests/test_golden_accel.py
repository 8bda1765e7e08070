"""Golden tests for the accelerator path (k=12, vs the DB12 oracle)."""
import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def accelset(tmp_path_factory):
    d = tmp_path_factory.mktemp("accel")
    rng = np.random.default_rng(31337)
    refs = golden.make_refs(rng, 30, lo=300, hi=900)
    refs.append(("ambig1", refs[0][1][:100] + "NRYKM" + refs[0][1][105:250]))
    reads = golden.make_reads(rng, refs, 60, read_len=100, max_err=2)
    # a few ambiguous reads exercise the ambig bin
    reads.append(("ambread1", reads[0][1][:40] + "R" + reads[0][1][41:]))
    reads.append(("ambread2", reads[1][1][:20] + "NN" + reads[1][1][22:]))
    rfa, qfa = str(d / "refs.fa"), str(d / "reads.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    oedx, oacx = str(d / "o.edx"), str(d / "o.acx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-d", "QUICK", "120",
                             "-s", "400", "-a", oacx], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    return d, rfa, qfa, oedx, oacx


def _cmp(d, qfa, oedx, oacx, mode, extra=(), exact=True):
    ob6 = str(d / f"o_{mode}{len(extra)}.b6")
    mb6 = str(d / f"m_{mode}{len(extra)}.b6")
    res = golden.run_oracle(["-r", oedx, "-a", oacx, "-q", qfa, "-o", ob6,
                             "-m", mode, *extra], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", oedx, "-a", oacx, "-q", qfa, "-o", mb6,
                     "-m", mode, *extra])
    if exact:
        diff = golden.diff_files(ob6, mb6)
        assert diff is None, diff
    else:
        assert golden.sort_lines(ob6) == golden.sort_lines(mb6)


def test_accel_best(accelset):
    d, rfa, qfa, oedx, oacx = accelset
    _cmp(d, qfa, oedx, oacx, "BEST")


def test_accel_allpaths(accelset):
    d, rfa, qfa, oedx, oacx = accelset
    _cmp(d, qfa, oedx, oacx, "ALLPATHS")


def test_accel_forage(accelset):
    d, rfa, qfa, oedx, oacx = accelset
    _cmp(d, qfa, oedx, oacx, "FORAGE", extra=("-i", "0.95"))


def test_accel_capitalist_rc(accelset):
    d, rfa, qfa, oedx, oacx = accelset
    _cmp(d, qfa, oedx, oacx, "CAPITALIST", extra=("-fr",))


def test_our_acx_searched_by_oracle(accelset):
    """Build edx+acx ourselves; oracle searches them; results identical."""
    d, rfa, qfa, oedx, oacx = accelset
    medx, macx = str(d / "m.edx"), str(d / "m.acx")
    import os
    os.environ["BURST_TPU_SCOUR_N"] = "12"
    try:
        golden.run_ours(["-r", rfa, "-o", medx, "-d", "QUICK", "120",
                         "-s", "400", "-a", macx, "--kmer", "12"])
    finally:
        del os.environ["BURST_TPU_SCOUR_N"]
    with open(oacx, "rb") as f1, open(macx, "rb") as f2:
        assert f1.read() == f2.read(), "acx bytes differ"
    ob6, mb6 = str(d / "oc.b6"), str(d / "mc.b6")
    res = golden.run_oracle(["-r", medx, "-a", macx, "-q", qfa, "-o", ob6,
                             "-m", "BEST"], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", medx, "-a", macx, "-q", qfa, "-o", mb6,
                     "-m", "BEST"])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff
