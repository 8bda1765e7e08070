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


@pytest.fixture(scope="module")
def crset(tmp_path_factory):
    """Shapes where the reference's -cr survives its uninitialised
    Cache read (see test_cr_reference_crash): plain random refs plus
    an N-bearing variant, at two sizes straddling the two junk
    regimes modelled in fingerprint.em_refine."""
    d = tmp_path_factory.mktemp("crset")
    rng = np.random.default_rng(77)
    small = golden.make_refs(rng, 120, lo=150, hi=300)
    smallf = str(d / "small.fa")
    golden.write_fasta(smallf, small)
    rng2 = np.random.default_rng(123)
    ambig = golden.make_refs(rng2, 55, lo=120, hi=260)
    ambig = [(h, s[:40] + "N" + s[41:]) if i % 9 == 0 else (h, s)
             for i, (h, s) in enumerate(ambig)]
    ambigf = str(d / "ambig.fa")
    golden.write_fasta(ambigf, ambig)
    big = golden.make_refs(rng2, 300, lo=100, hi=200)
    bigf = str(d / "big.fa")
    golden.write_fasta(bigf, big)
    reads = golden.make_reads(rng, small, 60, read_len=100, max_err=2)
    qfa = str(d / "reads.fa")
    golden.write_fasta(qfa, reads)
    return d, smallf, ambigf, bigf, qfa


def _cr_db_cmp(d, rfa, cr, tag):
    oedx = str(d / f"o_{tag}.edx")
    medx = str(d / f"m_{tag}.edx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-f", "-d",
                             "QUICK", "-cr", str(cr)], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", rfa, "-o", medx, "-f", "-d", "QUICK",
                     "-cr", str(cr)])
    with open(oedx, "rb") as a, open(medx, "rb") as b:
        assert a.read() == b.read(), f"-cr {cr} {tag} edx differs"


def test_cr_em_refinement_db_bytes(crset):
    """-cr N runs the EM cluster-refinement loop (burst.c:2515-2602);
    single-threaded its rand()-seeded shuffle stream is deterministic
    and we replicate it, so the .edx is byte-identical. Small DBs hit
    the zero-junk regime of the reference's uninitialised Cache read
    (see fingerprint.em_refine); N-bearing refs exercise the EM over
    twin prints."""
    d, smallf, ambigf, bigf, qfa = crset
    _cr_db_cmp(d, smallf, 5, "small5")
    _cr_db_cmp(d, smallf, 33, "small33")
    _cr_db_cmp(d, ambigf, 17, "ambig17")


def test_cr_em_large_db_nonzero_junk(crset, monkeypatch):
    """300-ref DBs land in the nonzero-junk regime of the reference's
    uninitialised read (recycled fingerprint bytes); any junk value
    >= the cluster count behaves identically (parked-slot dynamics,
    see fingerprint.em_refine). BURST_TPU_EM_TAIL selects that model."""
    d, smallf, ambigf, bigf, qfa = crset
    monkeypatch.setenv("BURST_TPU_EM_TAIL", "1000000")
    _cr_db_cmp(d, bigf, 4, "big4")
    _cr_db_cmp(d, bigf, 25, "big25")


def test_cr_search(crset):
    """Aligning against a -cr-refined database stays byte-identical."""
    d, smallf, ambigf, bigf, qfa = crset
    oedx = str(d / "o_small5.edx")
    ob6, mb6 = str(d / "ocr.b6"), str(d / "mcr.b6")
    res = golden.run_oracle(["-r", oedx, "-q", qfa, "-o", ob6,
                             "-m", "ALLPATHS", "-fr"], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", oedx, "-q", qfa, "-o", mb6,
                     "-m", "ALLPATHS", "-fr"])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff


def test_cr_reference_crash(fpset):
    """On some heap layouts the reference's -cr segfaults outright: the
    round shuffle reads an uninitialised Cache slot and uses it as an
    UNBOUNDED ShfIx index (burst.c:2562-2563), so wild junk writes far
    out of bounds. Pin that crash on a shape that exhibits it (47 refs
    with twin prints, both oracle binaries die at any -cr level); our
    implementation must survive and produce a loadable DB holding the
    same reference set."""
    d, rfa, qfa = fpset
    res = golden.run_oracle(["-r", rfa, "-o", str(d / "crash.edx"),
                             "-f", "-d", "QUICK", "-cr", "3"],
                            db12=True)
    assert res.returncode != 0, \
        "reference survived: promote this shape to a byte comparison"
    medx = str(d / "mcrash.edx")
    golden.run_ours(["-r", rfa, "-o", medx, "-f", "-d", "QUICK",
                     "-cr", "3"])
    m0 = str(d / "m0.edx")
    golden.run_ours(["-r", rfa, "-o", m0, "-f", "-d", "QUICK"])
    import burst_tpu.db.edx as edxm
    rd_cr = edxm.read_edx(medx)[0]
    rd_0 = edxm.read_edx(m0)[0]
    assert sorted(rd_cr.heads) == sorted(rd_0.heads)
    assert rd_cr.tot_units == rd_0.tot_units
