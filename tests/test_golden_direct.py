"""Golden byte-for-byte comparison vs the reference binary, direct -r/-q."""
import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def smallset(tmp_path_factory):
    d = tmp_path_factory.mktemp("direct")
    rng = np.random.default_rng(1234)
    refs = golden.make_refs(rng, 24, lo=150, hi=380)
    reads = golden.make_reads(rng, refs, 60, read_len=100, max_err=3)
    rfa = str(d / "refs.fa")
    qfa = str(d / "reads.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    return d, rfa, qfa


def _compare(d, rfa, qfa, mode, extra=(), extra_ours=None, exact=True):
    ob6 = str(d / f"oracle_{mode}{len(extra)}.b6")
    mb6 = str(d / f"ours_{mode}{len(extra)}.b6")
    res = golden.run_oracle(["-r", rfa, "-q", qfa, "-o", ob6,
                             "-m", mode, *extra])
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", rfa, "-q", qfa, "-o", mb6, "-m", mode,
                     *(extra_ours if extra_ours is not None else extra)])
    if exact:
        diff = golden.diff_files(ob6, mb6)
        assert diff is None, diff
    else:
        assert golden.sort_lines(ob6) == golden.sort_lines(mb6)


def test_best_mode(smallset):
    _compare(*smallset, "BEST")


def test_best_mode_id90(smallset):
    _compare(*smallset, "BEST", extra=("-i", "0.90"))


def test_allpaths_mode(smallset):
    _compare(*smallset, "ALLPATHS")


def test_forage_mode(smallset):
    _compare(*smallset, "FORAGE", extra=("-i", "0.93"))


def test_best_mode_rc(smallset):
    d, rfa, qfa = smallset
    rng = np.random.default_rng(77)
    refs = golden.make_refs(rng, 12, lo=200, hi=300, prefix="rcref")
    reads = golden.make_reads(rng, refs, 40, read_len=90, max_err=2,
                              rc_frac=0.5, prefix="rcread")
    rfa2 = str(d / "rc_refs.fa")
    qfa2 = str(d / "rc_reads.fa")
    golden.write_fasta(rfa2, refs)
    golden.write_fasta(qfa2, reads)
    _compare(d, rfa2, qfa2, "BEST", extra=("-fr",))


def test_capitalist_mode_notax(smallset):
    _compare(*smallset, "CAPITALIST")


def test_any_mode_rc_inline_order(smallset):
    """Direct-path ANY prints in the reference's -t 1 inline scan order
    (clump asc, lexicographic unibin rank asc -- fwd and RC rows
    interleaved by the re-sort at burst.c:3178-3181; first qualifying
    lane within the clump). A homologous-family DB makes queries
    qualify in several clumps, so the event-order rules actually bite."""
    d, _, _ = smallset
    rng = np.random.default_rng(4242)
    bases = np.frombuffer(b"ACGT", np.uint8)
    refs = []
    for f in range(5):
        anc = rng.choice(bases, 420)
        for m in range(5):
            r = anc.copy()
            pos = rng.integers(0, 420, 5)
            r[pos] = bases[rng.integers(0, 4, 5)]
            refs.append((f"fam{f}m{m}", r.tobytes().decode()))
    reads = golden.make_reads(rng, refs, 150, read_len=100, max_err=2,
                              rc_frac=0.4, prefix="aread")
    rfa = str(d / "any_refs.fa")
    qfa = str(d / "any_reads.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    _compare(d, rfa, qfa, "ANY", extra=("-fr",))
    _compare(d, rfa, qfa, "ANY")
