"""Large-scale randomized differential fuzz vs the reference oracle.

Each case draws a random flag combination (mode x strand x N-penalty x
accel/direct x identity threshold x DB shear) and a random read mix
(substitutions / indels / IUPAC codes / duplicates), then byte-compares
our b6 (and, on accel cases, the .edx/.acx artifacts) against
`bin/burst_linux_DB12` run single-threaded -- the reference's whole
flag surface is the spec (burst.c:4912-5103).

Full tier (`-m full`): BURST_TPU_FUZZ_N cases (default 1000), split
into batches so progress is visible and a failure pins its seed. A
failing case prints its config + seed; minimize by re-running with
BURST_TPU_FUZZ_SEED=<seed> BURST_TPU_FUZZ_N=1.

Known order-only gap (PARITY.md): direct-path ANY print order follows
the reference's thread-stack traversal; those cases compare sorted
rows. Cases where the oracle itself crashes (it segfaults on some
prepass+taxonomy inputs) are skipped, not failed.
"""
import os

import numpy as np
import pytest

from . import golden

pytestmark = pytest.mark.full

N = int(os.environ.get("BURST_TPU_FUZZ_N", "1000"))
SEED = int(os.environ.get("BURST_TPU_FUZZ_SEED", "20260819"))
BATCHES = min(20, N)
IUPAC = "RYSWKMBDHVN"


def _sprinkle_iupac(rng, entries, frac):
    out = []
    for h, s in entries:
        if rng.random() < frac and len(s) > 4:
            s = list(s)
            for _ in range(int(rng.integers(1, 4))):
                s[int(rng.integers(0, len(s)))] = \
                    IUPAC[int(rng.integers(0, len(IUPAC)))]
            s = "".join(s)
        out.append((h, s))
    return out


def _case(rng, d, ci):
    mode = str(rng.choice(["BEST", "ALLPATHS", "CAPITALIST", "FORAGE",
                           "ANY"]))
    accel = bool(rng.random() < 0.5)
    prepass = bool(accel and rng.random() < 0.15)
    fr = bool(rng.random() < 0.6)
    npen = rng.choice(["-y", "-n", ""])
    thres = float(rng.choice([0.90, 0.95, 0.97, 0.99]))
    use_tax = bool(rng.random() < 0.3 and not prepass)
    heur = bool(accel and not prepass and rng.random() < 0.15)
    dedupe = bool(rng.random() < 0.2)
    indel = bool(rng.random() < 0.5)
    iupac_q = 0.15 if rng.random() < 0.3 else 0.0
    iupac_r = 0.1 if rng.random() < 0.2 else 0.0
    shear = int(rng.choice([120, 200, 320]))
    nrefs = int(rng.integers(5, 22))
    nreads = int(rng.integers(20, 60))
    cfg = dict(mode=mode, accel=accel, prepass=prepass, fr=fr,
               npen=str(npen), thres=thres, tax=use_tax, heur=heur,
               dedupe=dedupe, indel=indel, iupac_q=iupac_q,
               iupac_r=iupac_r, shear=shear, nrefs=nrefs, nreads=nreads)

    refs = golden.make_refs(rng, nrefs, lo=120, hi=500)
    if rng.random() < 0.3:                 # duplicate references
        for _ in range(int(rng.integers(1, 4))):
            src = refs[int(rng.integers(0, len(refs)))]
            refs.append((f"dup{len(refs):04d}", src[1]))
    mk = golden.make_reads_indel if indel else golden.make_reads
    reads = mk(rng, refs, nreads, read_len=90, max_err=3,
               rc_frac=0.4 if fr else 0.0)
    # ref-side IUPAC goes in after sampling (make_reads' revcomp map is
    # ACGT-only, and reads-from-clean-refs is the realistic mix anyway)
    refs = _sprinkle_iupac(rng, refs, iupac_r)
    if rng.random() < 0.3:                 # duplicate reads
        for _ in range(int(rng.integers(1, 5))):
            src = reads[int(rng.integers(0, len(reads)))]
            reads.append((f"dupr{len(reads):05d}", src[1]))
    reads = _sprinkle_iupac(rng, reads, iupac_q)

    rfa, qfa = str(d / f"r{ci}.fa"), str(d / f"q{ci}.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    tax = str(d / f"t{ci}.tsv")
    if use_tax:
        with open(tax, "w") as f:
            for i, (h, _) in enumerate(refs):
                f.write(f"{h}\tk__K{i % 2};p__P{i % 3};g__G{i}\n")

    common = ["-m", mode, "-i", f"{thres}"]
    if fr:
        common.append("-fr")
    if npen:
        common.append(str(npen))
    if use_tax:
        common += ["-b", tax]
    if heur:
        common.append("-hr")
    if prepass:
        common.append("-p")

    if accel:
        oedx, oacx = str(d / f"o{ci}.edx"), str(d / f"o{ci}.acx")
        medx, macx = str(d / f"m{ci}.edx"), str(d / f"m{ci}.acx")
        # the N-penalty is baked into the artifacts and enforced at
        # load (burst.c:2859-2863, 3541-3544): build with the same flag
        extra_b = ([str(npen)] if npen else []) \
            + (["-u"] if dedupe else [])
        bargs = ["-r", rfa, "-o", oedx, "-a", oacx, "-d", "DNA",
                 str(shear), "-s"] + extra_b
        res = golden.run_oracle(bargs, db12=True)
        if res.returncode != 0:
            return cfg, "oracle-build-crash"
        golden.run_ours(["-r", rfa, "-o", medx, "-a", macx, "-d", "DNA",
                         str(shear), "-s", "--kmer", "12"] + extra_b)
        with open(oedx, "rb") as fa, open(medx, "rb") as fb:
            assert fa.read() == fb.read(), (cfg, "edx bytes differ")
        with open(oacx, "rb") as fa, open(macx, "rb") as fb:
            assert fa.read() == fb.read(), (cfg, "acx bytes differ")
        sargs = ["-r", oedx, "-a", oacx, "-q", qfa] + common
    else:
        sargs = ["-r", rfa, "-q", qfa] + common

    ob6, mb6 = str(d / f"o{ci}.b6"), str(d / f"m{ci}.b6")
    res = golden.run_oracle(sargs + ["-o", ob6], db12=True)
    if res.returncode < 0 or res.returncode > 101:
        return cfg, "oracle-search-crash"   # signal / abort
    expect = 101 if prepass else 0
    if res.returncode != expect:
        # the oracle rejected the flag combination; ours must too,
        # with the same exit code (burst.c error paths)
        golden.run_ours(sargs + ["-o", mb6], expect=res.returncode)
        return cfg, "ok"
    golden.run_ours(sargs + ["-o", mb6], expect=expect)
    with open(ob6) as fa, open(mb6) as fb:
        la, lb = fa.read(), fb.read()
    if mode == "ANY" and not accel:
        # documented order-only gap (PARITY.md): compare the hit set
        assert sorted(la.splitlines()) == sorted(lb.splitlines()), \
            (cfg, "ANY direct hit sets differ")
    else:
        assert la == lb, (cfg, "b6 bytes differ")
    return cfg, "ok"


def _run_batch(lo, hi, tmpdir):
    """Run fuzz cases [lo, hi) in THIS process; used by the subprocess
    wrapper below. Prints FUZZ_BATCH_OK <skipped> on success."""
    per = hi - lo
    skipped = 0
    import shutil
    from pathlib import Path
    for ci in range(lo, hi):
        rng = np.random.default_rng(SEED + ci)
        os.environ["BURST_TPU_SCOUR_N"] = "12"
        cd = Path(tmpdir) / f"c{ci}"
        cd.mkdir(exist_ok=True)
        try:
            cfg, status = _case(rng, cd, ci)
        finally:
            os.environ.pop("BURST_TPU_SCOUR_N", None)
            # accel cases leave two 65 MB .acx tables (the dense 4^12
            # counts) each -- 1000 cases would eat ~66 GB of /tmp
            shutil.rmtree(cd, ignore_errors=True)
        assert status in ("ok", "oracle-build-crash",
                          "oracle-search-crash"), \
            f"case {ci} seed {SEED + ci}: {status} ({cfg})"
        if status != "ok":
            skipped += 1
    assert skipped <= per // 2, "oracle crashed on too many cases"
    print(f"FUZZ_BATCH_OK {skipped}", flush=True)


@pytest.mark.parametrize("batch", range(BATCHES))
def test_fuzz_vs_oracle(batch, tmp_path):
    """Each batch runs in a FRESH subprocess: the cases drive cli.main
    in-process, and jaxlib's CPU compiler segfaults once enough
    compiles accumulate in one interpreter (round-4 bisect; the crash
    point moves as kernels evolve -- round 5 saw it at batch 3 of the
    in-process form). ~50 cases per process stays far under it, and
    the shared test compile cache keeps retraces cheap."""
    import subprocess
    import sys

    per = -(-N // BATCHES)
    lo = batch * per
    hi = min(lo + per, N)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (f"import sys; sys.path.insert(0, {repo!r}); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from tests.test_fuzz_oracle import _run_batch; "
            f"_run_batch({lo}, {hi}, {str(tmp_path)!r})")
    r = subprocess.run([sys.executable, "-c", code], timeout=2400,
                       capture_output=True, text=True,
                       cwd=repo)
    assert r.returncode == 0 and "FUZZ_BATCH_OK" in r.stdout, \
        (r.returncode, r.stdout[-2000:], r.stderr[-3000:])
