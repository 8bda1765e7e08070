"""Golden tests for the EDX database artifact: cross-compatibility.

1. oracle builds .edx -> both aligners search it -> identical b6
2. we build .edx -> oracle searches it vs our search -> identical b6
3. our QUICK-mode .edx is byte-identical to the oracle's
"""
import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def dbset(tmp_path_factory):
    d = tmp_path_factory.mktemp("edx")
    rng = np.random.default_rng(99)
    refs = golden.make_refs(rng, 20, lo=400, hi=1200)
    refs += [("dup0", refs[0][1]), ("dup5", refs[5][1])]  # exact dupes
    reads = golden.make_reads(rng, refs, 50, read_len=100, max_err=2)
    rfa, qfa = str(d / "refs.fa"), str(d / "reads.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    return d, rfa, qfa


def test_oracle_db_searched_by_both(dbset):
    d, rfa, qfa = dbset
    oedx = str(d / "oracle.edx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-d", "QUICK", "150",
                             "-s", "500"])
    assert res.returncode == 0, res.stderr + res.stdout
    ob6, mb6 = str(d / "o1.b6"), str(d / "m1.b6")
    res = golden.run_oracle(["-r", oedx, "-q", qfa, "-o", ob6, "-m", "BEST"])
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", oedx, "-q", qfa, "-o", mb6, "-m", "BEST"])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff


def test_our_db_bytes_match_oracle_db(dbset):
    d, rfa, qfa = dbset
    oedx, medx = str(d / "oracle2.edx"), str(d / "ours2.edx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-d", "QUICK", "150",
                             "-s", "500"])
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", rfa, "-o", medx, "-d", "QUICK", "150",
                     "-s", "500"])
    with open(oedx, "rb") as f1, open(medx, "rb") as f2:
        b1, b2 = f1.read(), f2.read()
    assert b1 == b2, (
        f"edx files differ: {len(b1)} vs {len(b2)} bytes; "
        f"first diff at {next((i for i in range(min(len(b1), len(b2))) if b1[i] != b2[i]), -1)}")


def test_our_db_searched_by_oracle(dbset):
    d, rfa, qfa = dbset
    medx = str(d / "ours3.edx")
    golden.run_ours(["-r", rfa, "-o", medx, "-d", "QUICK", "150",
                     "-s", "500"])
    ob6, mb6 = str(d / "o3.b6"), str(d / "m3.b6")
    res = golden.run_oracle(["-r", medx, "-q", qfa, "-o", ob6,
                             "-m", "ALLPATHS"])
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", medx, "-q", qfa, "-o", mb6, "-m", "ALLPATHS"])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff


def test_oracle_dna_db_capitalist(dbset):
    """'-d DNA' (compressive build in the oracle) searched by both."""
    d, rfa, qfa = dbset
    oedx = str(d / "oracle4.edx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-d", "DNA", "150",
                             "-s", "320"])
    assert res.returncode == 0, res.stderr + res.stdout
    ob6, mb6 = str(d / "o4.b6"), str(d / "m4.b6")
    res = golden.run_oracle(["-r", oedx, "-q", qfa, "-o", ob6,
                             "-m", "CAPITALIST"])
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", oedx, "-q", qfa, "-o", mb6, "-m", "CAPITALIST"])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff
