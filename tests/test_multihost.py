"""Multi-HOST (multi-process) distribution: byte-identity vs a single
process (BASELINE.json config 5; burst.c:4490-4519 merge points).

Each process gets its own jax.distributed world (Gloo over localhost)
and a clump-range shard of the .edx/.acx artifacts; process 0 writes
the b6. See burst_tpu/parallel/multihost.py and
tools/launch_multihost.py.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from . import golden

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "tools", "launch_multihost.py")


@pytest.fixture(scope="module")
def mhset(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(777)
    refs = golden.make_refs(rng, 36, lo=300, hi=600)
    reads = golden.make_reads(rng, refs, 120, read_len=100, max_err=3,
                              rc_frac=0.3)
    rfa, qfa = str(d / "refs.fa"), str(d / "reads.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    with open(d / "tax.tsv", "w") as f:
        for i, (h, _) in enumerate(refs):
            f.write(f"{h}\tk__K{i % 3};p__P{i % 5};g__G{i}\n")
    edx, acx = str(d / "m.edx"), str(d / "m.acx")
    golden.run_ours(["-r", rfa, "-o", edx, "-d", "DNA", "200", "-s",
                     "-a", acx, "--kmer", "12"])
    return d, qfa, edx, acx, str(d / "tax.tsv")


def _launch(n, cli_args, expect=0):
    env = dict(os.environ)
    env.pop("BURST_TPU_MULTIHOST", None)
    res = subprocess.run(
        [sys.executable, LAUNCHER, "-n", str(n), "--"] + cli_args,
        capture_output=True, text=True, env=env, timeout=540)
    assert res.returncode == expect, res.stderr[-2000:]


@pytest.mark.parametrize("mode,use_tax", [
    ("BEST", False),
    pytest.param("ALLPATHS", False, marks=pytest.mark.full),
    pytest.param("CAPITALIST", True, marks=pytest.mark.full),
])
def test_multihost_accel_bit_identical(mhset, mode, use_tax):
    d, qfa, edx, acx, tax = mhset
    extra = ("-b", tax) if use_tax else ()
    sp = str(d / f"sp_{mode}.b6")
    mh = str(d / f"mh_{mode}.b6")
    golden.run_ours(["-r", edx, "-a", acx, "-q", qfa, "-o", sp,
                     "-m", mode, *extra])
    _launch(2, ["-r", edx, "-a", acx, "-q", qfa, "-o", mh,
                "-m", mode, *extra])
    with open(sp, "rb") as f1, open(mh, "rb") as f2:
        assert f1.read() == f2.read(), f"{mode} multihost bytes differ"


@pytest.mark.full
def test_multihost_full_path_three_procs(mhset):
    """Non-accel full scan, 3 processes (uneven last shard)."""
    d, qfa, edx, acx, tax = mhset
    sp = str(d / "sp_full.b6")
    mh = str(d / "mh_full.b6")
    golden.run_ours(["-r", edx, "-q", qfa, "-o", sp, "-m", "BEST"])
    _launch(3, ["-r", edx, "-q", qfa, "-o", mh, "-m", "BEST"])
    with open(sp, "rb") as f1, open(mh, "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.full
def test_multihost_any_accel(mhset):
    """ANY through the accel path: visit-order hits + collective
    rescore (burst.c:4239-4275), bytes equal to single-process."""
    d, qfa, edx, acx, tax = mhset
    sp = str(d / "sp_any.b6")
    mh = str(d / "mh_any.b6")
    golden.run_ours(["-r", edx, "-a", acx, "-q", qfa, "-o", sp,
                     "-m", "ANY"])
    _launch(2, ["-r", edx, "-a", acx, "-q", qfa, "-o", mh, "-m", "ANY"])
    with open(sp, "rb") as f1, open(mh, "rb") as f2:
        assert f1.read() == f2.read() != b""


@pytest.mark.full
def test_multihost_any_full(mhset):
    """ANY through the dense full scan, min-merged across hosts."""
    d, qfa, edx, acx, tax = mhset
    sp = str(d / "sp_anyf.b6")
    mh = str(d / "mh_anyf.b6")
    golden.run_ours(["-r", edx, "-q", qfa, "-o", sp, "-m", "ANY"])
    _launch(2, ["-r", edx, "-q", qfa, "-o", mh, "-m", "ANY"])
    with open(sp, "rb") as f1, open(mh, "rb") as f2:
        assert f1.read() == f2.read() != b""


@pytest.mark.full
def test_multihost_prepass(mhset):
    """-p under shards: merged scour top-lists + owner-local bounded DP
    (burst.c:3697-3992); bytes equal, exit code 101 preserved."""
    d, qfa, edx, acx, tax = mhset
    sp = str(d / "sp_pre.b6")
    mh = str(d / "mh_pre.b6")
    golden.run_ours(["-r", edx, "-a", acx, "-q", qfa, "-o", sp,
                     "-m", "CAPITALIST", "-b", tax, "-p", "-fr"],
                    expect=101)
    _launch(3, ["-r", edx, "-a", acx, "-q", qfa, "-o", mh,
                "-m", "CAPITALIST", "-b", tax, "-p", "-fr"], expect=101)
    with open(sp, "rb") as f1, open(mh, "rb") as f2:
        assert f1.read() == f2.read() != b""


@pytest.mark.full
def test_multihost_raw_fasta(mhset):
    """Raw-FASTA references: every host shears locally and works its
    clump slab (burst.c:5139-5141 treats raw FASTA and .edx alike)."""
    d, qfa, edx, acx, tax = mhset
    rfa = str(d / "refs.fa")
    sp = str(d / "sp_raw.b6")
    mh = str(d / "mh_raw.b6")
    golden.run_ours(["-r", rfa, "-q", qfa, "-o", sp, "-m", "ALLPATHS",
                     "-fr", "-s", "200"])
    _launch(2, ["-r", rfa, "-q", qfa, "-o", mh, "-m", "ALLPATHS",
                "-fr", "-s", "200"])
    with open(sp, "rb") as f1, open(mh, "rb") as f2:
        assert f1.read() == f2.read() != b""
