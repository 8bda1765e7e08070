"""Golden tests for duplicate-guided compressive shearing (-d DNA,
burst.c:1859-2107) and bunch-scour semantics on duplicate-heavy
references, vs the DB12 oracle."""
import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def dupset(tmp_path_factory):
    d = tmp_path_factory.mktemp("compressive")
    rng = np.random.default_rng(5150)
    core = golden.rand_dna(rng, 2000)
    refs = []
    for i in range(12):
        mid = golden.rand_dna(rng, 400)
        s = core[:800] + mid + core[800:1600]
        if i % 3 == 0:
            s += core[:500]
        refs.append((f"dref{i:02d}", s))
    rfa = str(d / "refs.fa")
    golden.write_fasta(rfa, refs)
    # reads spanning duplicated and unique regions, enough for QBUNCH>1
    reads = []
    seqs = [s for _, s in refs]
    bases = "ACGT"
    for i in range(250):
        r = seqs[int(rng.integers(0, len(seqs)))]
        st = int(rng.integers(0, len(r) - 100))
        s = list(r[st:st + 100])
        for _ in range(int(rng.integers(0, 3))):
            s[int(rng.integers(0, 100))] = bases[int(rng.integers(0, 4))]
        reads.append((f"dq{i:04d}", "".join(s)))
    qfa = str(d / "reads.fa")
    golden.write_fasta(qfa, reads)
    oedx, oacx = str(d / "o.edx"), str(d / "o.acx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-a", oacx,
                             "-d", "DNA", "120", "-s"], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    return d, rfa, qfa, oedx, oacx


def test_compressive_db_bytes(dupset):
    """Compressive shear boundaries, tie ordering, transpose
    continuation bytes: .edx and .acx byte-identical."""
    d, rfa, qfa, oedx, oacx = dupset
    medx, macx = str(d / "m.edx"), str(d / "m.acx")
    import os
    os.environ["BURST_TPU_SCOUR_N"] = "12"
    try:
        golden.run_ours(["-r", rfa, "-o", medx, "-a", macx,
                         "-d", "DNA", "120", "-s", "--kmer", "12"])
    finally:
        del os.environ["BURST_TPU_SCOUR_N"]
    with open(oedx, "rb") as a, open(medx, "rb") as b:
        assert a.read() == b.read(), "edx bytes differ"
    with open(oacx, "rb") as a, open(macx, "rb") as b:
        assert a.read() == b.read(), "acx bytes differ"


@pytest.mark.parametrize("mode,extra", [
    ("BEST", ("-fr",)),
    ("ALLPATHS", ("-fr",)),
    ("CAPITALIST", ("-fr",)),
    ("FORAGE", ("-fr", "-i", "0.95")),
    ("ANY", ("-fr",)),
])
def test_compressive_search(dupset, mode, extra):
    """Accel search on the duplicate-heavy DB: QBUNCH=3 bunching, tied
    hit counts, dupe suppression -- byte-identical rows."""
    d, rfa, qfa, oedx, oacx = dupset
    ob6 = str(d / f"o_{mode}.b6")
    mb6 = str(d / f"m_{mode}.b6")
    res = golden.run_oracle(["-r", oedx, "-a", oacx, "-q", qfa, "-o", ob6,
                             "-m", mode, *extra], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", oedx, "-a", oacx, "-q", qfa, "-o", mb6,
                     "-m", mode, *extra])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff


def test_tie_pod_orders(tmp_path_factory):
    """Interior pods sort stable by strcmp (parent tails); the last pod
    sorts via tuxCmp whose never-zero ties reverse (anti-stable)."""
    d = tmp_path_factory.mktemp("ties")
    rng = np.random.default_rng(8)
    dup = golden.rand_dna(rng, 100)
    refs = [(f"d{i:02d}", dup) for i in range(8)]
    refs += [(f"u{i:02d}", golden.rand_dna(rng, 100)) for i in range(3)]
    refs += [(f"L{i:02d}", golden.rand_dna(rng, 150)) for i in range(3)]
    dup2 = golden.rand_dna(rng, 150)
    refs2 = [(f"x{i:02d}", golden.rand_dna(rng, 100)) for i in range(3)]
    refs2 += [(f"e{i:02d}", dup2) for i in range(8)]
    refs2 += [("y00", golden.rand_dna(rng, 150))]
    for name, rr in (("tieA", refs), ("tieB", refs2)):
        rfa = str(d / f"{name}.fa")
        golden.write_fasta(rfa, rr)
        oedx = str(d / f"{name}_o.edx")
        medx = str(d / f"{name}_m.edx")
        res = golden.run_oracle(["-r", rfa, "-o", oedx, "-d", "QUICK"],
                                db12=True)
        assert res.returncode == 0, res.stderr + res.stdout
        golden.run_ours(["-r", rfa, "-o", medx, "-d", "QUICK"])
        with open(oedx, "rb") as a, open(medx, "rb") as b:
            assert a.read() == b.read(), f"{name} edx bytes differ"
