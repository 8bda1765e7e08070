"""Multi-HOST (multi-process) distribution: DB shards over DCN.

The reference is single-node OpenMP; its cross-thread merge points
become cross-process collectives here, one per merge point in
/root/reference/burst.c:

  * per-thread pod consolidation (burst.c:4490-4519)  -> winner-stat
    gather to host 0 before reporting;
  * global best-ED tightening (burst.c:4433)          -> elementwise
    min-reduce of per-pair phase-A EDs across hosts;
  * the scour candidate lists (burst.c:4096-4130)     -> allgather of
    per-host raw candidates, reassembled identically everywhere.

Layout: each process owns a contiguous CLUMP range of the sorted unit
array -- its slice of the .edx tile data (db/edx.read_edx clump_range)
and the .acx postings filtered to those clumps (accel.read_acx
clump_range). Queries are replicated: query processing is deterministic,
so every host derives identical unibins, budgets, and bins. Because
candidate tuples, pair EDs, and the visit assembly are merged to the
same values the single process computes, every downstream stage
(select_pods, rescore, pod ordering, reporters) is reused unchanged and
the b6 output is byte-identical to a single-process run.

Launch recipe (N processes, one per host; process 0 writes the b6):

    BURST_TPU_MULTIHOST="<pid>/<nprocs>@<coordinator_host:port>" \
        python -m burst_tpu.cli -q q.fa -r db.edx -a db.acx -o out.b6 ...

On a TPU pod each process also owns its local chips (jax.distributed
wires ICI+DCN); for CPU validation set JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<n>. See
tools/launch_multihost.py for a single-machine spawner.
"""
from __future__ import annotations

import os

import numpy as np

VECSZ = 16


def parse_spec(spec: str):
    """"<pid>/<nprocs>@<host:port>" -> (pid, nprocs, coordinator)."""
    head, _, coord = spec.partition("@")
    pid_s, _, np_s = head.partition("/")
    pid, nprocs = int(pid_s), int(np_s)
    if not coord or not (0 <= pid < nprocs):
        raise ValueError(f"bad BURST_TPU_MULTIHOST spec: {spec!r}")
    return pid, nprocs, coord


def clump_bounds(n_clumps: int, nprocs: int, pid: int):
    """Contiguous clump slabs (host h owns [h*slab, (h+1)*slab))."""
    slab = -(-n_clumps // nprocs)
    return min(pid * slab, n_clumps), min((pid + 1) * slab, n_clumps)


def _gather_min(arr: np.ndarray) -> np.ndarray:
    """Elementwise min across processes (same shape everywhere).

    Local entries hold real values, non-local the 255/max sentinel, so
    the min IS the merge (burst.c:4433's budget-tightening analog)."""
    from jax.experimental import multihost_utils as mhu
    g = np.asarray(mhu.process_allgather(arr))
    return g.min(axis=0)


def _gather_concat(arrs: list[np.ndarray]):
    """Allgather variable-length per-host arrays; returns the list of
    per-host parts in process order (identical on every host)."""
    from jax.experimental import multihost_utils as mhu
    cols = len(arrs)
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    glens = np.asarray(mhu.process_allgather(lens))      # [nproc, cols]
    m = int(glens.max()) if glens.size else 0
    out = []
    for c in range(cols):
        a = arrs[c]
        pad = np.zeros(m, dtype=a.dtype)
        pad[: len(a)] = a
        g = np.asarray(mhu.process_allgather(pad))       # [nproc, m]
        out.append([g[h, : glens[h, c]] for h in range(g.shape[0])])
    return out


def align_multihost(a) -> int:
    """The cli.run align branch, DB-sharded across processes."""
    pid, nprocs, coord = parse_spec(os.environ["BURST_TPU_MULTIHOST"])
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize-style plugins may pre-register an experimental
        # platform before the env var is honored; pin it explicitly
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)

    from .. import engine, modes
    from ..alphabet import score_matrix
    from ..db import edx
    from ..io.fasta import parse_fasta_fast
    from ..io.taxonomy import Taxonomy
    from ..process import bin_queries_for_accel, process_queries

    if a["mode"] == "ANY" or a["prepass"]:
        print("ERROR: ANY/prepass not supported under multi-host yet")
        return 1
    if not edx.is_edx(a["ref"]):
        print("ERROR: multi-host runs need a prebuilt .edx database")
        return 1

    smat = score_matrix(a["z"])
    qh, qs = parse_fasta_fast(a["query"])
    qd = process_queries(qh, qs, a["thres"], a["rc"],
                         incl_whitespace=a["whitespace"],
                         xalpha=a["xalpha"])
    n_clumps, tot_units = edx.edx_dims(a["ref"])
    c_lo, c_hi = clump_bounds(n_clumps, nprocs, pid)
    u_lo, u_hi = c_lo * VECSZ, min(c_hi * VECSZ, tot_units)
    rd, dshear = edx.read_edx(a["ref"], xalpha=a["xalpha"],
                              clump_range=(c_lo, c_hi))
    if dshear and int(np.float32(qd.max_len) / np.float32(a["thres"])) \
            > dshear:
        print("ERROR: DB incompatible with selected queries/identity.")
        if not a["heur"]:
            return 1
    taxonomy = Taxonomy.parse(a["tax"], ncbi=a["taxa_ncbi"]) \
        if a["tax"] else None

    visits = None
    if a["accel"]:
        from ..accel import read_acx
        acc = read_acx(a["accel"], z_required=a["z"],
                       clump_range=(c_lo, c_hi))
        qbins = bin_queries_for_accel(qd, acc.k, a["z"], a["heur"])
        visits = _visits_multihost(qd, acc, qbins, n_clumps,
                                   a["heur"], a["skipambig"],
                                   a["threads"])
        sed = _phase_a_multihost(qd, rd, visits, smat, u_lo, u_hi)
        ed = sed
    else:
        ed_loc = engine.compute_ed_matrix(qd, rd, smat)
        ed = _gather_min(ed_loc)

    juni, refpos, eds = engine.select_pods(qd, rd, ed, a["mode"])
    pod_order = None
    if visits is not None:
        pod_order = engine.accel_pod_order(qd, rd, visits, juni,
                                           refpos, eds)
    pods = _rescore_multihost(qd, rd, juni, refpos, eds, a["mode"],
                              smat, pod_order, u_lo, u_hi, nprocs)

    if pid != 0:
        return 0
    with open(a["out"], "w") as fh:
        writer = modes.B6Writer(fh)
        if a["mode"] in ("ALLPATHS", "FORAGE"):
            modes.report_allpaths_or_forage(
                pods, qd, rd, writer, taxonomy,
                forage=(a["mode"] == "FORAGE"))
        elif a["mode"] == "BEST":
            modes.report_best(pods, qd, rd, writer, taxonomy,
                              a["taxasuppress"], a["strict"])
        elif a["mode"] == "CAPITALIST":
            modes.report_capitalist(pods, qd, rd, writer, taxonomy,
                                    a["taxacut"], a["taxasuppress"],
                                    a["strict"])
    return 0


def _visits_multihost(qd, acc, qbins, n_clumps: int, do_heur: bool,
                      skip_ambig: bool, threads: int):
    """Local scour over the host's posting shard, candidate allgather,
    identical global Visits assembly on every host."""
    from .. import engine

    n = len(qd.seqs)
    b0, b1 = int(qbins[0]), int(qbins[1])
    bad_arr = np.asarray(acc.bad, dtype=np.int64)
    full = np.ones(n, dtype=bool)
    full[:b1] = False
    if skip_ambig:
        bad_arr = bad_arr[:0]
        full[:] = False
    qbunch = engine.default_qbunch(n, threads)
    mm_bunch, mm_inner, n_bunches = engine.bunch_thresholds(
        qd, b1, acc.k, qbunch, do_heur)

    pb = pc = hits = fw = np.zeros(0, np.int64)
    bw = engine.bunch_word_multiset(qd, acc, b0, b1, qbunch, acc.k)
    if bw is not None:
        raw = engine.scour_raw(acc, bw[0], bw[1], bw[2], n_clumps)
        if raw is not None:
            pb, pc, hits, fw = raw
    parts = _gather_concat([pb, pc, hits, fw])
    pb, pc, hits, fw = (np.concatenate(p) for p in parts)
    return engine.assemble_accel_visits(
        n, b0, b1, qbunch, n_bunches, bad_arr, full, pb, pc, hits, fw,
        mm_bunch, mm_inner)


def _phase_a_multihost(qd, rd, visits, smat, u_lo: int, u_hi: int):
    """Phase A on local pairs + local slice of full-scan rows, merged
    into the global SparseED by elementwise min."""
    from .. import engine

    pj, pp = engine.expand_visit_pairs(qd, rd, visits)
    local = (pp >= u_lo) & (pp < u_hi)
    pe = np.full(len(pj), 255, dtype=np.int64)
    if local.any():
        pe[local] = engine._pairs_min_ed(qd, rd, pj[local], pp[local],
                                         smat)
    pe = _gather_min(pe)

    full_rows = np.nonzero(visits.full)[0]
    if len(full_rows):
        sub = engine._subset_qd(qd, list(full_rows))
        ed_full = _gather_min(engine.compute_ed_matrix(sub, rd, smat))
    else:
        ed_full = np.zeros((0, rd.tot_units), dtype=np.uint8)
    return engine.SparseED(pj=pj, pp=pp, pe=pe, full_rows=full_rows,
                           ed_full=ed_full)


def _rescore_multihost(qd, rd, juni, refpos, eds, mode, smat,
                       pod_order, u_lo: int, u_hi: int, nprocs: int):
    """Phase B on locally-owned winners; stats gathered and stitched by
    owner rank (the pod consolidation of burst.c:4490-4519)."""
    from jax.experimental import multihost_utils as mhu

    from .. import engine

    nw = len(juni)
    local = np.nonzero((refpos >= u_lo) & (refpos < u_hi))[0]
    ed_l = np.zeros(nw, np.int64)
    gq_l = np.zeros(nw, np.int64)
    gr_l = np.zeros(nw, np.int64)
    fp_l = np.zeros(nw, np.int64)
    sc_l = np.zeros(nw, np.float32)
    if len(local):
        sub = engine.rescore_winners(
            qd, rd, juni[local], refpos[local], eds[local], mode, smat,
            pod_order=np.arange(len(local)))
        ed_l[local] = sub.ed
        gq_l[local] = sub.gap_q
        gr_l[local] = sub.gap_r
        fp_l[local] = sub.final_pos
        sc_l[local] = sub.score
    # owner rank per winner from the clump slab size (identical math on
    # every host)
    n_clumps = rd.tot_units // VECSZ + (1 if rd.tot_units % VECSZ else 0)
    slab = -(-n_clumps // nprocs)
    owner = (refpos // VECSZ) // slab
    g = [np.asarray(mhu.process_allgather(x))
         for x in (ed_l, gq_l, gr_l, fp_l, sc_l)]
    idx = np.arange(nw)
    out_ed = g[0][owner, idx]
    gap_q = g[1][owner, idx]
    gap_r = g[2][owner, idx]
    fpos = g[3][owner, idx]
    score = g[4][owner, idx]
    if pod_order is not None:
        srt = pod_order
    else:
        clump = refpos // VECSZ
        lane = refpos % VECSZ
        srt = np.lexsort((-lane, -juni, -clump))
    return engine.Pods(
        six=qd.six[juni][srt], juni=juni[srt], refpos=refpos[srt],
        ed=out_ed[srt], rc=qd.rc[juni][srt], gap_q=gap_q[srt],
        gap_r=gap_r[srt], final_pos=fpos[srt], score=score[srt])
