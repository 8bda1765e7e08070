#!/usr/bin/env python
"""Larger-than-HBM database demonstration (VERDICT r2 item 3).

Builds a homologous-family DNA database whose dominant length bucket
exceeds the default 8 GB HBM tile budget (BIGDB_GBP=10 Gbp of 250 kbp
parents sheared at 320 => ~31 M units of width 454 B = ~14 GB tiles;
postings on top), aligns a timed batch of 100 bp reads through the
slab-streaming accel path on the real chip (engine._pairs_slab_stream:
double-buffered slab rotation, winner-only rescore gather), and
byte-checks a subset three ways:

  a) the timed TPU run (default 8 GB budget),
  b) a TPU rerun with a 1 GB budget (different slab schedule,
     same bytes -- slab-rotation invariance),
  c) a pure-CPU jnp rerun (jax.default_device, Pallas off) -- the
     kernel-independent oracle the CPU test suite validates.

Mirrors the reference's headline: a 31.5 GB DB on hardware with less
memory than the DB (/root/reference/README.md:16); its postings at
this scale exceed comfortable RAM, so the index builds into NAMED
disk-backed memmaps (BURST_TPU_IDS_MMAP + _KEEP) and every finished
stage is checkpointed to disk: the hours-scale CPU build survives a
device-tunnel stall or a kill, and a rerun resumes at the next stage.
Stages: built (db+acx) -> indexed (+unit index) -> device run.

Writes one JSON line to stdout at the end (plus stage timers on
stderr). Env: BIGDB_GBP, BIGDB_READS, BIGDB_SUBSET, BIGDB_MMAP_DIR,
BIGDB_STAGE (stage-file dir), BIGDB_BUILD_ONLY=1 (exit after the CPU
stages -- run the device phase later when the chip is healthy).

This is an explicit, hours-scale tool -- not part of the test tiers.
"""
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

GBP = float(os.environ.get("BIGDB_GBP", "10"))
N_READS = int(os.environ.get("BIGDB_READS", "20000"))
N_SUBSET = int(os.environ.get("BIGDB_SUBSET", "100"))
STAGE_DIR = os.environ.get("BIGDB_STAGE", "/tmp/bigdb_stage")
PAR_LEN = 250_000
N_MEM = 10
DIVERGENCE = 0.01
READ_LEN = 100
THRES = 0.98
K = 12
# memmap dir is scoped by the same generation-parameter key as the
# stage pickle: pruning (fresh-build or resume-time) must only ever
# touch THIS configuration's files -- two configs sharing the machine
# would otherwise delete each other's live multi-GB postings memmaps
MMAP_DIR = os.path.join(
    os.environ.get("BIGDB_MMAP_DIR", "/tmp/bigdb_ids"),
    f"{GBP}_{K}_{N_READS}_{N_MEM}_{PAR_LEN}_{DIVERGENCE}")


def _t(msg, t0):
    print(f"[bigdb] {msg}: {time.perf_counter() - t0:.0f}s "
          f"(rss {_rss_gb():.1f} GB)", file=sys.stderr, flush=True)


def _rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / (1 << 20)
    return 0.0


def gen_db(rng):
    n_fam = int(GBP * 1e9 / (PAR_LEN * N_MEM))
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_mut = int(DIVERGENCE * PAR_LEN)
    heads, refs = [], []
    for fi in range(n_fam):
        anc = bases[rng.integers(0, 4, PAR_LEN).astype(np.uint8)]
        for m in range(N_MEM):
            r = anc.copy()
            pos = rng.integers(0, PAR_LEN, n_mut)
            r[pos] = bases[rng.integers(0, 4, n_mut)]
            refs.append(r)
            heads.append(f"f{fi:05d}m{m:02d}".encode())
    return heads, refs


def gen_reads(rng, refs, n):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    heads, reads = [], []
    n_refs = len(refs)
    for i in range(n):
        s = refs[int(rng.integers(0, n_refs))]
        st = int(rng.integers(0, len(s) - READ_LEN))
        r = s[st: st + READ_LEN].copy()
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, READ_LEN))] = \
                bases[int(rng.integers(0, 4))]
        heads.append(f"q{i:06d}".encode())
        reads.append(r)
    return heads, reads


# --- stage checkpointing ------------------------------------------
# Postings arrays live in named disk memmaps (BURST_TPU_IDS_MMAP_KEEP);
# the pickle stores (path, len) markers instead of the tens-of-GB data,
# so a checkpoint costs only the RAM-resident part of rd/acc.

def _stage_path():
    # every generation parameter is part of the key: resuming with a
    # changed BIGDB_READS/etc must rebuild, not silently reuse a stale
    # read set while reporting the new N_READS in reads/s
    return os.path.join(
        STAGE_DIR,
        f"bigdb_{GBP}_{K}_{N_READS}_{N_MEM}_{PAR_LEN}_{DIVERGENCE}.pkl")


def _save_stage(tag, rd, acc, qheads, reads):
    t0 = time.perf_counter()
    for obj, attr in ((acc, "_dev_tables"), (rd, "_tiledev"),
                      (rd, "_tilealldev"), (rd, "_smatdev")):
        if hasattr(obj, attr):          # device arrays don't pickle
            delattr(obj, attr)
    swapped = []
    for csr in (acc.csr, acc.u_csr):
        if csr is not None:
            csr._rank = None        # lazy dense table; rebuilt on use
        if csr is not None and isinstance(csr.ids, np.memmap):
            assert csr.ids.filename, "postings mmap is anonymous"
            swapped.append((csr, csr.ids))
            csr.ids = ("__mmap__", csr.ids.filename, len(csr.ids))
    try:
        path = _stage_path()
        with open(path + ".tmp", "wb") as f:
            pickle.dump((tag, rd, acc, qheads, reads), f, protocol=5)
        os.replace(path + ".tmp", path)
    finally:
        for csr, ids in swapped:
            csr.ids = ids
    _t(f"stage '{tag}' checkpointed", t0)


def _load_stage():
    path = _stage_path()
    if not os.path.exists(path):
        return None
    t0 = time.perf_counter()
    try:
        with open(path, "rb") as f:
            tag, rd, acc, qheads, reads = pickle.load(f)
        for csr in (acc.csr, acc.u_csr):
            if (csr is not None and isinstance(csr.ids, tuple)
                    and csr.ids[0] == "__mmap__"):
                _, mpath, mlen = csr.ids
                if not os.path.exists(mpath) or \
                        os.path.getsize(mpath) < 4 * mlen:
                    raise FileNotFoundError(
                        f"postings memmap gone/truncated: {mpath}")
                csr.ids = np.memmap(mpath, dtype=np.uint32,
                                    mode="r+", shape=(mlen,))
    except Exception as e:
        # /tmp cleanup or a partial write: drop the stale stage and
        # rebuild from scratch instead of crashing the resume
        print(f"[bigdb] stage load failed ({e}); rebuilding",
              file=sys.stderr)
        try:
            os.remove(path)
        except OSError:
            pass
        return None
    _t(f"stage '{tag}' loaded", t0)
    return tag, rd, acc, qheads, reads


def _prune_mmaps():
    """Fresh build: clear postings memmaps from prior generations
    (BURST_TPU_IDS_MMAP_KEEP files are tens of GB and mkstemp-named;
    without pruning, every rebuild leaks one)."""
    for fn in os.listdir(MMAP_DIR):
        try:
            os.remove(os.path.join(MMAP_DIR, fn))
        except OSError:
            pass


def main():
    os.makedirs(MMAP_DIR, exist_ok=True)
    os.makedirs(STAGE_DIR, exist_ok=True)
    os.environ["BURST_TPU_IDS_MMAP"] = MMAP_DIR
    os.environ["BURST_TPU_IDS_MMAP_KEEP"] = "1"

    from burst_tpu.accel import build_accelerator, build_unit_index
    from burst_tpu.process import process_references
    from burst_tpu.serving import Aligner

    st = _load_stage()
    if st is None:
        _prune_mmaps()
        rng = np.random.default_rng(20260819)
        t0 = time.perf_counter()
        rheads, refs = gen_db(rng)
        db_bp = sum(len(r) for r in refs)
        _t(f"generated {db_bp/1e9:.2f} Gbp ({len(refs)} refs)", t0)
        qheads, reads = gen_reads(rng, refs, N_READS)

        t0 = time.perf_counter()
        rd = process_references(rheads, refs, max_len_q=READ_LEN,
                                thres=THRES, rebase=True,
                                rebase_amt=320, curate=2)
        del refs
        _t(f"process_references ({rd.tot_units} units)", t0)

        t0 = time.perf_counter()
        acc = build_accelerator(rd, k=K, z=1)
        _t(f"accelerator ({len(acc.csr.ids)} postings, "
           f"{acc.csr.ids.nbytes/1e9:.1f} GB "
           f"{'memmap' if isinstance(acc.csr.ids, np.memmap) else 'RAM'})",
           t0)
        _save_stage("built", rd, acc, qheads, reads)
        st = ("built", rd, acc, qheads, reads)

    tag, rd, acc, qheads, reads = st
    # prune memmaps the loaded stage does not reference: a kill during
    # the unit-index build orphans a 50+ GB postings file, and a
    # resume would otherwise write a second one beside it
    keep = set()
    for csr in (acc.csr, acc.u_csr):
        if csr is not None and isinstance(csr.ids, np.memmap) \
                and csr.ids.filename:
            keep.add(os.path.basename(csr.ids.filename))
    for fn in os.listdir(MMAP_DIR):
        if fn not in keep:
            try:
                os.remove(os.path.join(MMAP_DIR, fn))
            except OSError:
                pass
    if tag == "built":
        t0 = time.perf_counter()
        build_unit_index(rd, acc)
        _t(f"unit index ({len(acc.u_csr.ids)} postings, "
           f"{acc.u_csr.ids.nbytes/1e9:.1f} GB)", t0)
        _save_stage("indexed", rd, acc, qheads, reads)

    if os.environ.get("BIGDB_BUILD_ONLY") == "1":
        print("[bigdb] BUILD_ONLY: CPU stages done; rerun without it "
              "for the device phase", file=sys.stderr)
        return 0

    # dominant bucket / budget accounting for the claim
    from burst_tpu import engine
    lbs = engine._unit_lb(rd)
    blb, bn = 0, 0
    for lb in np.unique(lbs):
        n = int((lbs == lb).sum())
        if n * (int(lb) + 32) > bn * (blb + 32):
            blb, bn = int(lb), n
    tile_gb = bn * (blb + 32) / 1e9
    budget_gb = engine._tile_budget_bytes() / 1e9
    slab = engine._slab_rows_for(bn, blb + 32)
    print(f"[bigdb] dominant bucket: {bn} x {blb+32} B = "
          f"{tile_gb:.1f} GB vs budget {budget_gb:.1f} GB -> "
          f"slab={slab}", file=sys.stderr, flush=True)
    assert slab is not None, "bucket fits the budget; nothing to demo"

    al = Aligner(rd, acc, thres=THRES, mode="BEST", do_rc=True)

    t0 = time.perf_counter()
    out1 = al.align_batch(qheads, reads)       # warm (compiles, caches)
    _t(f"warmup batch ({out1.count(chr(10).encode())} rows)", t0)

    t0 = time.perf_counter()
    out2 = al.align_batch(qheads, reads)
    dt = time.perf_counter() - t0
    _t("timed batch", t0)
    assert out1 == out2, "rerun not byte-identical"

    # --- subset byte-checks --------------------------------------
    sq, sr = qheads[:N_SUBSET], reads[:N_SUBSET]
    a = al.align_batch(sq, sr)

    os.environ["BURST_TPU_TILE_HBM_MB"] = "1024"
    al2 = Aligner(rd, acc, thres=THRES, mode="BEST", do_rc=True)
    b = al2.align_batch(sq, sr)
    del os.environ["BURST_TPU_TILE_HBM_MB"]
    assert a == b, "1 GB-budget slab schedule diverged"

    import jax
    cpu = jax.devices("cpu")[0]
    os.environ["BURST_TPU_PALLAS"] = "0"
    for attr in ("_tiledev", "_tilealldev", "_smatdev"):
        if hasattr(rd, attr):       # device arrays are per-backend
            delattr(rd, attr)
    al3 = Aligner(rd, acc, thres=THRES, mode="BEST", do_rc=True)
    with jax.default_device(cpu):
        c = al3.align_batch(sq, sr)
    del os.environ["BURST_TPU_PALLAS"]
    assert a == c, "CPU jnp oracle diverged"

    rec = {
        "metric": f"reads/s through slab-streamed accel path, "
                  f"{GBP:.0f} Gbp DB, dominant bucket "
                  f"{tile_gb:.1f} GB vs {budget_gb:.1f} GB budget",
        "value": round(N_READS / dt, 1),
        "unit": "reads/s",
        "db_gbp": GBP,
        "tile_gb": round(tile_gb, 1),
        "acx_gb": round(acc.csr.ids.nbytes / 1e9, 1),
        "subset_checks": "slab-1GB + cpu-jnp byte-identical",
    }
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
