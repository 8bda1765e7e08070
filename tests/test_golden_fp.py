"""Golden tests for fingerprints (-f, Prince sketches + FP-guided
clustering, burst.c:1358-1692 + 2238-2686) vs the DB12 oracle."""
import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def fpset(tmp_path_factory):
    d = tmp_path_factory.mktemp("fp")
    rng = np.random.default_rng(616)
    refs = golden.make_refs(rng, 40, lo=300, hi=700)
    # some similar refs so clustering has real structure
    for i in range(5):
        base = refs[i][1]
        refs.append((f"sim{i:02d}", base[:150] + golden.rand_dna(rng, 30)
                     + base[180:]))
    # ambiguity: N-containing and IUPAC refs exercise twin prints
    refs.append(("namb1", refs[0][1][:90] + "NNN" + refs[0][1][93:300]))
    refs.append(("namb2", refs[1][1][:50] + "RYK" + refs[1][1][53:250]))
    rfa = str(d / "refs.fa")
    golden.write_fasta(rfa, refs)
    reads = golden.make_reads(rng, refs, 50, read_len=100, max_err=2)
    qfa = str(d / "reads.fa")
    golden.write_fasta(qfa, reads)
    return d, rfa, qfa


@pytest.mark.parametrize("extra", [(), ("-y",), ("-d", "DNA", "120", "-s")])
def test_fp_db_bytes(fpset, extra):
    d, rfa, qfa = fpset
    tag = len(extra)
    oedx = str(d / f"o{tag}.edx")
    medx = str(d / f"m{tag}.edx")
    args = ["-r", rfa, "-o", oedx, "-f"]
    if "-d" not in extra:
        args += ["-d", "QUICK"]
    res = golden.run_oracle(args + list(extra), db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    margs = ["-r", rfa, "-o", medx, "-f"]
    if "-d" not in extra:
        margs += ["-d", "QUICK"]
    golden.run_ours(margs + list(extra))
    with open(oedx, "rb") as a, open(medx, "rb") as b:
        assert a.read() == b.read(), "fp edx bytes differ"


def test_fp_search(fpset):
    """Searching an -f database: the reference's FP screens are pure
    lower-bound skips, so results stay byte-identical."""
    d, rfa, qfa = fpset
    oedx = str(d / "o0.edx")
    ob6, mb6 = str(d / "o.b6"), str(d / "m.b6")
    res = golden.run_oracle(["-r", oedx, "-q", qfa, "-o", ob6,
                             "-m", "CAPITALIST", "-fr"], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", oedx, "-q", qfa, "-o", mb6,
                     "-m", "CAPITALIST", "-fr"])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff
