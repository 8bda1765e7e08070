"""End-to-end optimality property (SURVEY.md section 4): reads
simulated with EXACTLY e substitution errors (tools/bin/llsim, the
reference's de-facto correctness fixture) must report edit distance
<= e in BEST mode -- an optimal aligner can never do worse than the
planted alignment."""
import pytest
import os
import subprocess

import numpy as np

from . import golden

TOOLS_BIN = os.path.join(os.path.dirname(__file__), "..", "tools",
                         "bin")


@pytest.mark.full
def test_best_ed_bounded_by_planted_errors(tmp_path):
    res = subprocess.run(["make", "-C",
                          os.path.join(TOOLS_BIN, "..")],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    rng = np.random.default_rng(88)
    refs = golden.make_refs(rng, 10, lo=600, hi=1200)
    rfa = str(tmp_path / "r.fa")
    golden.write_fasta(rfa, refs)
    os.environ["BURST_TPU_SCOUR_N"] = "12"
    try:
        for n_err in (0, 2, 5):
            qfa = str(tmp_path / f"q{n_err}.fa")
            res = subprocess.run(
                [os.path.join(TOOLS_BIN, "llsim"), rfa, qfa, "200",
                 "100", str(n_err), "77", "RC"],
                capture_output=True, text=True)
            assert res.returncode == 0, res.stderr
            out = str(tmp_path / f"o{n_err}.b6")
            golden.run_ours(["-r", rfa, "-q", qfa, "-o", out, "-m",
                             "BEST", "-fr", "-i", "0.90",
                             "--noprogress"])
            rows = [ln.split("\t") for ln in open(out)]
            assert len(rows) == 200, (n_err, len(rows))
            for r in rows:
                ed = int(r[10])
                assert ed <= n_err, (n_err, r)
    finally:
        del os.environ["BURST_TPU_SCOUR_N"]
