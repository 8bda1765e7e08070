"""Mixed-length query parity: multiple Myers word-count buckets, long
queries past the 256-row packed-rescore boundary, direct and accel
paths (regression for the >256bp rescore crash)."""
import os

import numpy as np
import pytest

from . import golden


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("vlen")
    rng = np.random.default_rng(424)
    refs = golden.make_refs(rng, 12, lo=200, hi=700)
    reads = []
    for i in range(60):
        _, seq = refs[int(rng.integers(0, len(refs)))]
        ln = int(rng.integers(40, min(330, len(seq))))
        st = int(rng.integers(0, len(seq) - ln + 1))
        r = list(seq[st:st + ln])
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, ln))
            r[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append((f"vq{i:04d}", "".join(r)))
    rfa, qfa = str(d / "r.fa"), str(d / "q.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    return d, rfa, qfa


@pytest.mark.full
def test_vlen_direct_modes(data):
    d, rfa, qfa = data
    for mode, extra in (("BEST", []), ("ALLPATHS", [])):
        r, m = str(d / f"r_{mode}.b6"), str(d / f"m_{mode}.b6")
        golden.run_oracle(["-r", rfa, "-q", qfa, "-o", r, "-m", mode,
                           "-fr"] + extra)
        golden.run_ours(["-r", rfa, "-q", qfa, "-o", m, "-m", mode,
                         "-fr", "--noprogress"] + extra)
        assert golden.diff_files(r, m) is None, mode


@pytest.mark.full
def test_vlen_accel(data):
    d, rfa, qfa = data
    os.environ["BURST_TPU_SCOUR_N"] = "12"
    try:
        redx, racx = str(d / "r.edx"), str(d / "r.acx")
        medx, macx = str(d / "m.edx"), str(d / "m.acx")
        golden.run_oracle(["-r", rfa, "-o", redx, "-a", racx,
                           "-d", "DNA", "400", "-s"], db12=True)
        golden.run_ours(["-r", rfa, "-o", medx, "-a", macx,
                         "-d", "DNA", "400", "-s", "--noprogress"])
        with open(redx, "rb") as f1, open(medx, "rb") as f2:
            assert f1.read() == f2.read()
        with open(racx, "rb") as f1, open(macx, "rb") as f2:
            assert f1.read() == f2.read()
        r, m = str(d / "ra.b6"), str(d / "ma.b6")
        golden.run_oracle(["-r", redx, "-a", racx, "-q", qfa, "-o", r,
                           "-m", "BEST"], db12=True)
        golden.run_ours(["-r", medx, "-a", macx, "-q", qfa, "-o", m,
                         "-m", "BEST", "--noprogress"])
        assert golden.diff_files(r, m) is None
    finally:
        del os.environ["BURST_TPU_SCOUR_N"]
