"""Golden tests for -x (Xalpha), -l (latency), and error behavior."""
import subprocess
import sys

import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def xset(tmp_path_factory):
    d = tmp_path_factory.mktemp("misc")
    rng = np.random.default_rng(99)
    alpha = list("ACDEFGHIKLMNPQRSTVWY")
    refs = []
    for i in range(15):
        refs.append((f"xr{i:02d}",
                     "".join(rng.choice(alpha, size=300))))
    reads = []
    for i in range(50):
        r = refs[int(rng.integers(0, 15))][1]
        st = int(rng.integers(0, 200))
        s = list(r[st:st + 80])
        for _ in range(int(rng.integers(0, 3))):
            s[int(rng.integers(0, 80))] = alpha[int(rng.integers(0, 20))]
        reads.append((f"xq{i:03d}", "".join(s)))
    rfa, qfa = str(d / "xr.fa"), str(d / "xq.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    return d, rfa, qfa


def test_xalpha_best_vs_exact_dp(xset):
    """-x raw-byte alphabet. The shipped reference binaries segfault on
    every -x invocation (even makedb), so the oracle here is the exact
    glocal DP: every BEST row's ED must equal the true minimum over all
    references, and every query within budget must be reported."""
    d, rfa, qfa = xset
    mb6 = str(d / "mx.b6")
    golden.run_ours(["-r", rfa, "-q", qfa, "-o", mb6, "-m", "BEST", "-x"])
    refs = dict(golden.read_fasta(rfa))
    reads = dict(golden.read_fasta(qfa))
    got = {}
    for line in open(mb6):
        c = line.rstrip("\n").split("\t")
        got[c[0]] = int(c[10])
    for qn, qs in reads.items():
        q = np.frombuffer(qs.encode(), dtype=np.uint8)
        best = min(_glocal_ed(q, np.frombuffer(rs.encode(), np.uint8))
                   for rs in refs.values())
        budget = int(np.float32(1.0) / np.float32(0.97) - np.float32(1.0)
                     * 1) * 0 + int((np.float32(1.0) / np.float32(0.97)
                                     - np.float32(1.0))
                                    * np.float32(len(q)))
        if best <= budget:
            assert got.get(qn) == best, (qn, got.get(qn), best)
        else:
            assert qn not in got


def _glocal_ed(q: np.ndarray, r: np.ndarray) -> int:
    m, n = len(q), len(r)
    prev = np.zeros(n + 1, np.int64)
    for y in range(1, m + 1):
        row = np.minimum(prev[:-1] + (q[y - 1] != r), prev[1:] + 1)
        acc = row.copy()
        for x in range(1, n):
            if acc[x - 1] + 1 < acc[x]:
                acc[x] = acc[x - 1] + 1
        cur = np.empty(n + 1, np.int64)
        cur[0] = y
        cur[1:] = acc
        prev = cur
    return int(prev[1:].min())


@pytest.mark.parametrize("lat", ["0", "64"])
def test_latency_db_bytes(xset, lat):
    d, rfa, qfa = xset
    rng = np.random.default_rng(7)
    refs = golden.make_refs(rng, 30, lo=200, hi=500)
    rfa2 = str(d / f"lref{lat}.fa")
    golden.write_fasta(rfa2, refs)
    oedx, medx = str(d / f"ol{lat}.edx"), str(d / f"ml{lat}.edx")
    res = golden.run_oracle(["-r", rfa2, "-o", oedx, "-d", "QUICK",
                             "-l", lat], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    golden.run_ours(["-r", rfa2, "-o", medx, "-d", "QUICK", "-l", lat])
    with open(oedx, "rb") as a, open(medx, "rb") as b:
        assert a.read() == b.read()


def test_missing_files_clean_errors(tmp_path):
    """Missing ref/tax files produce the reference's message + exit 2."""
    q = tmp_path / "q.fa"
    q.write_text(">q1\nACGTACGTACGT\n")
    res = subprocess.run(
        [sys.executable, "-m", "burst_tpu.cli", "-r", "/nonexistent.fa",
         "-q", str(q), "-o", str(tmp_path / "o.b6"), "-m", "BEST"],
        capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 2
    assert "Cannot open FASTA file" in res.stderr


def test_serving_api_matches_cli(tmp_path):
    """Aligner.align_batch must produce the CLI's exact bytes."""
    import os

    import numpy as np

    from burst_tpu.serving import Aligner

    from . import golden

    rng = np.random.default_rng(31)
    refs = golden.make_refs(rng, 15, lo=300, hi=600)
    reads = golden.make_reads(rng, refs, 80, read_len=100, max_err=2)
    rfa, qfa = str(tmp_path / "r.fa"), str(tmp_path / "q.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    os.environ["BURST_TPU_SCOUR_N"] = "12"
    try:
        edx, acx = str(tmp_path / "d.edx"), str(tmp_path / "d.acx")
        golden.run_ours(["-r", rfa, "-o", edx, "-a", acx, "-d", "DNA",
                         "320", "-s", "--noprogress"])
        out = str(tmp_path / "cli.b6")
        golden.run_ours(["-r", edx, "-a", acx, "-q", qfa, "-o", out,
                         "-m", "BEST", "--noprogress"])
        al = Aligner.from_artifacts(edx, acx, thres=0.97, mode="BEST")
        heads = [h.encode() for h, _ in reads]
        seqs = [np.frombuffer(s.encode(), dtype=np.uint8)
                for _, s in reads]
        got = al.align_batch(heads, seqs)
        # two batches must each be self-consistent too (state reuse)
        got2 = al.align_batch(heads, seqs)
        assert got == got2
        with open(out, "rb") as f:
            assert got == f.read()
    finally:
        del os.environ["BURST_TPU_SCOUR_N"]
