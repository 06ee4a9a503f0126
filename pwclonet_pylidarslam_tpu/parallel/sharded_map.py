"""Spatially sharded local map: the voxel-hash NN map over a device mesh.

New capability vs the reference (SURVEY §2.8, BASELINE north star: "multi-host
sharded map blocks"). The reference's local maps are single-device and
capacity-bound (``slam/odometry/local_map.py``: 20-keyframe FIFO / one CPU
KdTree). Here the voxel-hash bucket table of ``slam/local_map.py`` is sharded
over a mesh axis by **contiguous hash-row ranges**: device ``i`` owns table
rows ``[i·R, (i+1)·R)``, so

- map capacity scales linearly with the mesh (per-device memory is
  ``table_size/n_dev × bucket_cap`` points),
- build is embarrassingly parallel (each device sorts/scatters only the
  points that hash into its range — no communication),
- a query does its 27-bucket gather inside each shard and combines the
  per-shard winners with ONE ``all_gather`` of ``(dist, target, normal)``
  per query batch (``n_dev × N`` small floats over ICI).

Row-range sharding makes the distributed table **bit-identical** to the
single-device ``build_voxel_table`` result (same rows, same bucket order), so
correctness is tested by exact equality, not tolerance.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pwclonet_pylidarslam_tpu.core.pointcloud import voxel_hash
from pwclonet_pylidarslam_tpu.slam.local_map import (
    VoxelTable,
    neighbor_bucket_hashes,
    scatter_buckets,
)

_SENTINEL = 1e9


def build_voxel_table_sharded(
    points: jax.Array,
    normals: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    mesh: Mesh,
    axis: str = "data",
    table_size: int = 1 << 16,
    bucket_cap: int = 8,
) -> VoxelTable:
    """Build the voxel table with rows sharded over ``mesh`` axis ``axis``.

    ``points/normals (M,3)``, ``valid (M,)`` are replicated inputs (every
    host feeds the same map points); the returned :class:`VoxelTable` leaves
    are globally ``(table_size, bucket_cap, 3)`` sharded on axis 0 —
    bit-identical to the single-device ``build_voxel_table`` output.
    """
    assert table_size & (table_size - 1) == 0, "table_size must be a power of 2"
    n_shards = mesh.shape[axis]
    if table_size % n_shards != 0:
        raise ValueError(f"table_size {table_size} not divisible by mesh axis {axis}={n_shards}")
    rows = table_size // n_shards

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=VoxelTable(points=P(axis), normals=P(axis)),
    )
    def build(pts, nrm, val):
        shard = jax.lax.axis_index(axis)
        vox = jnp.floor(pts / voxel_size).astype(jnp.int32)
        h = voxel_hash(vox) & (table_size - 1)
        local = h - shard * rows
        mine = jnp.logical_and(val > 0, jnp.logical_and(local >= 0, local < rows))
        return scatter_buckets(pts, nrm, mine, local, rows, bucket_cap)

    return build(points, normals, valid.astype(points.dtype))


def voxel_nn_sharded(
    table: VoxelTable,
    query: jax.Array,
    voxel_size: float,
    max_distance: float,
    mesh: Mesh,
    axis: str = "data",
    neighborhood: int = 27,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest stored point of each ``query (N,3)`` against a row-sharded
    table. Same contract as ``slam.local_map.voxel_nn`` (targets, normals,
    weights — all replicated outputs).

    Per shard: gather the query's neighbor buckets that fall in the local row
    range (misses hit a sentinel bucket), take the in-shard winner; combine
    shards with one ``all_gather`` of ``(best_d2, target, normal)``.
    """
    table_size = table.points.shape[0]
    n_shards = mesh.shape[axis]
    rows = table_size // n_shards
    n = query.shape[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(VoxelTable(points=P(axis), normals=P(axis)), P()),
        out_specs=(P(), P(), P()),
        # outputs ARE replicated (every device computes the same
        # all_gather + argmin combine) but the static VMA check cannot
        # prove it through the axis_index-dependent gathers
        check_vma=False,
    )
    def run(tbl, q):
        shard = jax.lax.axis_index(axis)
        bucket_cap = tbl.points.shape[1]
        h = neighbor_bucket_hashes(q, voxel_size, table_size, neighborhood)
        k = h.shape[1]  # (N, k) global rows
        local = h - shard * rows
        mine = jnp.logical_and(local >= 0, local < rows)
        hl = jnp.where(mine, local, rows)  # misses → sentinel bucket
        sent_pts = jnp.full((1, bucket_cap, 3), _SENTINEL, tbl.points.dtype)
        sent_nrm = jnp.zeros((1, bucket_cap, 3), tbl.normals.dtype)
        pts_pad = jnp.concatenate([tbl.points, sent_pts])
        nrm_pad = jnp.concatenate([tbl.normals, sent_nrm])
        cand = pts_pad[hl].reshape(n, k * bucket_cap, 3)
        d2 = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)
        best = jnp.argmin(d2, axis=-1)
        best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
        target = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0]
        best_bucket = jnp.take_along_axis(hl, (best // bucket_cap)[:, None], axis=1)[:, 0]
        normal = nrm_pad[best_bucket, best % bucket_cap]

        # one combine over the mesh: winner across shards per query
        g_d2 = jax.lax.all_gather(best_d2, axis)  # (n_dev, N)
        g_t = jax.lax.all_gather(target, axis)  # (n_dev, N, 3)
        g_n = jax.lax.all_gather(normal, axis)
        win = jnp.argmin(g_d2, axis=0)  # (N,)
        d2_w = jnp.take_along_axis(g_d2, win[None], axis=0)[0]
        t_w = jnp.take_along_axis(g_t, win[None, :, None], axis=0)[0]
        n_w = jnp.take_along_axis(g_n, win[None, :, None], axis=0)[0]
        ok = jnp.logical_and(
            d2_w < max_distance * max_distance,
            jnp.linalg.norm(n_w, axis=-1) > 0.5,
        )
        return t_w, n_w, ok.astype(q.dtype)

    return run(table, query)
