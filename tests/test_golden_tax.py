"""Golden tests: taxonomy interpolation (CAPITALIST LCA), suppression."""
import numpy as np
import pytest

from . import golden

PHYLA = ["Proteo", "Firmi", "Actino"]


def make_tax(refs, rng):
    """Greengenes-style taxonomy with shared prefixes across refs."""
    rows = []
    for i, (h, _) in enumerate(refs):
        p = PHYLA[i % 3]
        g = i % 5
        s = i % 7
        tax = (f"k__Bacteria;p__{p};c__C{g};o__O{g};f__F{g};"
               f"g__G{s};s__S{i % 9}")
        rows.append((h, tax))
    return rows


@pytest.fixture(scope="module")
def taxset(tmp_path_factory):
    d = tmp_path_factory.mktemp("tax")
    rng = np.random.default_rng(555)
    # clusters of similar refs so ties across refs occur -> LCA exercised
    base_refs = golden.make_refs(rng, 8, lo=250, hi=320)
    refs = []
    for i, (h, s) in enumerate(base_refs):
        refs.append((h, s))
        for v in range(2):  # two variants with 1-2 substitutions
            sl = list(s)
            for _ in range(v + 1):
                p = int(rng.integers(0, len(sl)))
                sl[p] = "ACGT"[int(rng.integers(0, 4))]
            refs.append((f"{h}_v{v}", "".join(sl)))
    reads = golden.make_reads(rng, refs, 50, read_len=110, max_err=2)
    rfa, qfa, tx = str(d / "refs.fa"), str(d / "reads.fa"), str(d / "tax.tsv")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    with open(tx, "w") as f:
        for h, t in make_tax(refs, rng):
            f.write(f"{h}\t{t}\n")
    return d, rfa, qfa, tx


def _cmp(d, rfa, qfa, tx, mode, extra=()):
    ob6 = str(d / f"o_{mode}{len(extra)}.b6")
    mb6 = str(d / f"m_{mode}{len(extra)}.b6")
    res = golden.run_oracle(["-r", rfa, "-q", qfa, "-o", ob6, "-m", mode,
                             "-b", tx, *extra])
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", rfa, "-q", qfa, "-o", mb6, "-m", mode,
                     "-b", tx, *extra])
    diff = golden.diff_files(ob6, mb6)
    assert diff is None, diff


def test_capitalist_lca(taxset):
    _cmp(*taxset, "CAPITALIST")


def test_capitalist_lca_taxacut4(taxset):
    _cmp(*taxset, "CAPITALIST", extra=("-bc", "4"))


def test_capitalist_taxasuppress(taxset):
    _cmp(*taxset, "CAPITALIST", extra=("-bs",))


def test_best_tax(taxset):
    _cmp(*taxset, "BEST")


def test_best_taxasuppress_strict(taxset):
    _cmp(*taxset, "BEST", extra=("-bs", "STRICT"))


def test_allpaths_tax(taxset):
    _cmp(*taxset, "ALLPATHS")
