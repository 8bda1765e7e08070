"""Multi-chip distribution: database-sharded alignment over a device mesh.

The reference is single-node OpenMP; its cross-thread merge points
(per-thread pod consolidation burst.c:4490-4519, global budget
tightening :4433) become mesh collectives here:

  * reference tiles are sharded across the 'db' mesh axis (each device
    owns a contiguous slab of the sorted tile array);
  * query blocks are replicated (or sharded along a 'q' data axis for
    throughput runs);
  * each device scans its slab with the Myers kernel; per-query minima
    merge via jax.lax.pmin-equivalent psum-min inside shard_map;
  * winner identification happens on the host from the gathered
    [Q, T_total] matrix (identical to single-device results).

Because the merged ED matrix is exactly the single-device matrix, all
downstream mode logic (ties, CAPITALIST set cover, reporting) is
unchanged and the sharded path stays bit-identical.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels import myers


def make_mesh(n_devices: int | None = None, axis: str = "db") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.partial(jax.jit, static_argnames=("W", "mesh"))
def _sharded_scan(peq, tiles, W: int, mesh: Mesh):
    """Scan [Q] queries against db-sharded [T, Lp] tiles -> [Q, T] ED."""
    def per_shard(peq_l, tiles_l):
        return myers.myers_min_ed_cross(peq_l, tiles_l, W)

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P("db", None)),
        out_specs=P(None, "db"),
        check_vma=False)  # scan carry is constant-initialized per shard
    return fn(peq, tiles)


def compute_ed_matrix_sharded(qd, rd, smat, n_shards: int,
                              tile_gran: int = 64) -> np.ndarray:
    """Sharded phase A producing the same [numUnibins, tot_units] matrix."""
    mesh = make_mesh(n_shards)
    nj = len(qd.seqs)
    ed = np.full((nj, rd.tot_units), 255, dtype=np.uint8)

    qbuckets: dict[int, list[int]] = {}
    for j, s in enumerate(qd.seqs):
        qbuckets.setdefault(myers.words_for(len(s)), []).append(j)
    ubuckets: dict[int, list[int]] = {}
    for p in range(rd.tot_units):
        ln = int(rd.lens[rd.ix_srt[p]])
        lb = -(-max(ln, 1) // tile_gran) * tile_gran
        ubuckets.setdefault(lb, []).append(p)

    for W, rows in sorted(qbuckets.items()):
        m_pad = W * 32
        qarr = np.zeros((len(rows), m_pad), dtype=np.uint8)
        qlens = np.zeros(len(rows), dtype=np.int64)
        for i, j in enumerate(rows):
            s = qd.seqs[j]
            qarr[i, : len(s)] = s
            qlens[i] = len(s)
        peq = myers.build_peq(qarr, qlens, W, smat)
        for lb, poss in sorted(ubuckets.items()):
            lp = lb + 32
            # pad tile count to a multiple of the shard count
            tpad = -(-len(poss) // n_shards) * n_shards
            tiles = np.zeros((tpad, lp), dtype=np.uint8)
            for i, p in enumerate(poss):
                s = rd.seqs[rd.ix_srt[p]]
                tiles[i, : len(s)] = s
            block = np.asarray(_sharded_scan(
                jnp.asarray(peq), jnp.asarray(tiles), W, mesh))
            block = np.minimum(block[:, : len(poss)], 255).astype(np.uint8)
            ed[np.ix_(rows, poss)] = block
    return ed
