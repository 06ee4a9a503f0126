"""Projective local map: fixed-capacity ring buffer of keyframe point lists.

TPU-native redesign of the reference's ``ProjectiveLocalMap``
(``slam/odometry/local_map.py:91-240``): the map stores the last K keyframes
as **compacted point lists with per-point normals** (a scan contributes at
most its ``num_points`` real returns — far denser storage than the mostly
empty 64×720 vertex-map grid) plus absolute poses, in a static-shape ring
buffer. Given a query pose, all stored points are transformed into the query
frame and scattered through the deterministic z-buffer into ONE model map
whose channels carry geometry + normals; association is then a per-point
pixel gather (O(N)), not a tree query — there is no KdTree equivalent
because there is no tree-friendly memory model on TPU (SURVEY.md §7).

Everything here is functional: the map state is a pytree, updates return new
states, and all methods trace under jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.core.projection import (
    SphericalProjector,
    spherical_pixel_coords,
    zbuffer_scatter,
)


class LocalMapState(NamedTuple):
    """Ring buffer of K keyframes. ``points``/``normals`` are in each
    keyframe's own sensor frame; ``poses`` are absolute."""

    points: jax.Array  # (K, P, 3)
    normals: jax.Array  # (K, P, 3)
    pt_valid: jax.Array  # (K, P)
    poses: jax.Array  # (K, 4, 4)
    valid: jax.Array  # (K,) float 0/1
    next_slot: jax.Array  # () int32 — FIFO write pointer


def init_local_map(
    capacity: int, points_per_frame: int, dtype=jnp.float32
) -> LocalMapState:
    return LocalMapState(
        points=jnp.zeros((capacity, points_per_frame, 3), dtype),
        normals=jnp.zeros((capacity, points_per_frame, 3), dtype),
        pt_valid=jnp.zeros((capacity, points_per_frame), dtype),
        poses=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (capacity, 4, 4)),
        valid=jnp.zeros((capacity,), dtype),
        next_slot=jnp.zeros((), jnp.int32),
    )


def insert_keyframe(
    state: LocalMapState,
    points: jax.Array,
    normals: jax.Array,
    pt_valid: jax.Array,
    pose: jax.Array,
    do_insert: jax.Array,
) -> LocalMapState:
    """Conditionally insert a keyframe at the FIFO slot (``do_insert`` bool).

    Masked writes keep the step branch-free under jit (mirrors the FIFO
    eviction of ref ``local_map.py:167-172``).
    """
    slot = state.next_slot % state.points.shape[0]
    ins = do_insert.astype(state.points.dtype)

    def mix(buf, new):
        return buf.at[slot].set(ins * new + (1.0 - ins) * buf[slot])

    return LocalMapState(
        points=mix(state.points, points),
        normals=mix(state.normals, normals),
        pt_valid=mix(state.pt_valid, pt_valid),
        poses=mix(state.poses, pose),
        valid=state.valid.at[slot].max(ins),
        next_slot=state.next_slot + do_insert.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("projector",))
def build_model_map(
    state: LocalMapState, query_pose: jax.Array, projector: SphericalProjector
) -> jax.Array:
    """Aggregate all stored keyframes into one model map in the query frame.

    Every stored point is transformed by ``query_pose⁻¹ · pose_k``, its normal
    rotated accordingly, and everything is scattered through the z-buffer —
    nearest point wins per pixel. Returns ``(H, W, 6)``: xyz + normal.
    (Ref ``ProjectiveLocalMap.build_model``, local_map.py:177-202.)
    """
    k, p, _ = state.points.shape
    rel = se3.inverse(query_pose)[None] @ state.poses  # (K, 4, 4)
    pts_q = se3.transform(rel, state.points)  # (K, P, 3)
    nrm_q = jnp.einsum("kij,knj->kni", rel[:, :3, :3], state.normals)
    pt_ok = state.pt_valid * state.valid[:, None]
    flat_pts = pts_q.reshape(1, k * p, 3)
    flat_nrm = nrm_q.reshape(1, k * p, 3)
    flat_valid = pt_ok.reshape(1, k * p)

    rows, cols, depth = spherical_pixel_coords(
        flat_pts, projector.height, projector.width,
        projector.min_vertical_fov, projector.max_vertical_fov,
    )
    depth = jnp.where(flat_valid > 0, depth, 0.0)
    chan = jnp.concatenate([flat_pts, flat_nrm], axis=-1)
    model = zbuffer_scatter(chan, rows, cols, depth, projector.height, projector.width)
    return model[0]  # (H, W, 6)


def associate(
    model: jax.Array,
    points: jax.Array,
    projector: SphericalProjector,
    max_distance: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Projective association of ``points (N, 3)`` against a model ``(H, W, 6)``.

    Each point looks up the model pixel it projects to; matches farther than
    ``max_distance`` or hitting empty pixels are masked out. Returns
    ``(targets (N,3), normals (N,3), weights (N,))``.
    """
    rows, cols, depth = spherical_pixel_coords(
        points[None], projector.height, projector.width,
        projector.min_vertical_fov, projector.max_vertical_fov,
    )
    r_i = jnp.clip(jnp.round(rows[0]).astype(jnp.int32), 0, projector.height - 1)
    c_i = jnp.clip(jnp.round(cols[0]).astype(jnp.int32), 0, projector.width - 1)
    hit = model[r_i, c_i]  # (N, 6)
    target, normal = hit[..., :3], hit[..., 3:]
    dist = jnp.linalg.norm(points - target, axis=-1)
    ok = (
        (depth[0] > 0)
        & (jnp.linalg.norm(target, axis=-1) > 0)
        & (jnp.linalg.norm(normal, axis=-1) > 0.5)
        & (dist < max_distance)
    )
    return target, normal, ok.astype(points.dtype)


# --- voxel-hash NN local map (the KdTree-F2M alternative) -------------------
#
# The reference's most accurate config is KdTree frame-to-model ICP
# (``KdTreeLocalMap``, local_map.py:254-434: pykdtree rebuild per update +
# exact 1-NN on CPU). There is no tree-friendly memory model on TPU, so the
# equivalent structure is a fixed-capacity voxel-hash bucket table
# (SURVEY.md §7 "KdTree local map" hard part): stored points bucketed by a
# 3-prime spatial hash, queries gather the 27 neighboring voxels' buckets and
# take the closest candidate. Approximate only through bounded bucket
# capacity (collisions merely add candidates that the distance test rejects).


class VoxelTable(NamedTuple):
    """Bucketed point store, materialized per bucket: queries gather whole
    16-point buckets (few large slices) instead of individual points
    (millions of 3-float slices — 10x slower on TPU)."""

    points: jax.Array  # (table_size, bucket_cap, 3); empty slots = 1e9 sentinel
    normals: jax.Array  # (table_size, bucket_cap, 3)


def build_voxel_table(
    points: jax.Array,
    normals: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    table_size: int = 1 << 16,
    bucket_cap: int = 8,
) -> VoxelTable:
    """Bucket ``points (M, 3)`` by spatial hash; ``valid (M,)`` 0/1 rows.

    Build = one sort of M keys + one unique-index scatter; per-voxel points
    beyond ``bucket_cap`` are dropped (bounded approximation — the KdTree is
    exact; cap 8 at 0.8 m voxels loses <1% of matches on KITTI-like density).
    """
    assert table_size & (table_size - 1) == 0, "table_size must be a power of 2"
    from pwclonet_pylidarslam_tpu.core.pointcloud import voxel_hash

    vox = jnp.floor(points / voxel_size).astype(jnp.int32)
    row_id = voxel_hash(vox) & (table_size - 1)
    return scatter_buckets(points, normals, valid > 0, row_id, table_size, bucket_cap)


def scatter_buckets(
    points: jax.Array,
    normals: jax.Array,
    valid_rows: jax.Array,
    row_id: jax.Array,
    rows: int,
    bucket_cap: int,
) -> VoxelTable:
    """The build core shared with the row-sharded table
    (``parallel/sharded_map.py``): bucket ``points (M,3)`` by the precomputed
    ``row_id (M,)`` (invalid rows masked by ``valid_rows``) into a
    ``(rows, bucket_cap, 3)`` store — one stable sort + one unique scatter."""
    m = points.shape[0]
    h = jnp.where(valid_rows, row_id, rows)  # invalid rows to overflow bucket
    order = jnp.argsort(h)
    h_sorted = h[order]
    first_of_bucket = jnp.searchsorted(h_sorted, h_sorted, side="left")
    slot = jnp.arange(m, dtype=jnp.int32) - first_of_bucket.astype(jnp.int32)
    keep = jnp.logical_and(slot < bucket_cap, h_sorted < rows)
    dest = h_sorted * bucket_cap + jnp.clip(slot, 0, bucket_cap - 1)
    dest = jnp.where(keep, dest, rows * bucket_cap)  # dropped → spill row
    # scatter the VALUES directly (M rows) instead of scattering indices and
    # gathering rows·cap rows back: at cap 64 the old index-gather touched
    # 2×1M rows per build at XLA's ~12 ns/row — the dominant cost of the
    # voxel mode's 34.5 ms/frame (round-4 measurement)
    pts_sorted = points[order]
    nrm_sorted = normals[order]
    table_pts = jnp.full((rows * bucket_cap + 1, 3), 1e9, points.dtype)
    table_nrm = jnp.zeros((rows * bucket_cap + 1, 3), normals.dtype)
    table_pts = table_pts.at[dest].set(pts_sorted, mode="drop")
    table_nrm = table_nrm.at[dest].set(nrm_sorted, mode="drop")
    return VoxelTable(
        points=table_pts[:-1].reshape(rows, bucket_cap, 3),
        normals=table_nrm[:-1].reshape(rows, bucket_cap, 3),
    )


def build_voxel_table_fused(
    points: jax.Array,
    normals: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    sample_size: float,
    table_size: int = 1 << 16,
    bucket_cap: int = 8,
) -> VoxelTable:
    """One-sort build: bucket by spatial hash AND grid-sample (one point per
    ``sample_size`` sub-cell) in a single argsort over a composite
    ``(bucket_row, subcell)`` key.

    The separate path (``grid_sample_mask`` then ``build_voxel_table``) costs
    TWO ~M-element device sorts per build — the dominant cost of a per-frame
    table rebuild (VERDICT r4 item 3 apportionment). Fusing them keeps one.
    Semantics vs the pair: dedup is per ``(bucket, subcell)`` instead of per
    global subcell, so a subcell straddling a bucket boundary keeps one point
    on each side (strictly more map coverage); the subcell hash is truncated
    to ``32 - log2(table_size)`` bits (x64 is disabled, so the composite key
    must fit uint32), which merges ~0.5% of distinct subcells per 3 m bucket
    at 2^14 rows — a bounded extra dedup, same flavor as the bucket cap;
    overflow beyond ``bucket_cap`` drops the highest-index deduped points,
    matching ``grid_sample_mask``'s lowest-index-wins convention.
    Golden-tested against a numpy oracle.
    """
    assert table_size & (table_size - 1) == 0, "table_size must be a power of 2"
    from pwclonet_pylidarslam_tpu.core.pointcloud import voxel_hash

    m = points.shape[0]
    row_bits = int(table_size - 1).bit_length()
    sub_bits = 31 - row_bits  # keys stay < 2^31 so the sentinel's row
    # (0xFFFFFFFF >> sub_bits >= 2*table_size - 1) never collides with a real row
    vox = jnp.floor(points / voxel_size).astype(jnp.int32)
    row = (voxel_hash(vox) & (table_size - 1)).astype(jnp.uint32)
    sub = voxel_hash(jnp.floor(points / sample_size).astype(jnp.int32))
    sub = sub.astype(jnp.uint32) & jnp.uint32((1 << sub_bits) - 1)
    key = (row << sub_bits) | sub
    key = jnp.where(valid > 0, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    key_sorted = key[order]
    ok_sorted = key_sorted != jnp.uint32(0xFFFFFFFF)
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]]
    )
    first_keep = jnp.logical_and(new_group, ok_sorted)  # dedup winners
    row_sorted = (key_sorted >> sub_bits).astype(jnp.int32)  # sentinel -> max row
    first_of_row = jnp.searchsorted(row_sorted, row_sorted, side="left")
    kept_before = jnp.cumsum(first_keep.astype(jnp.int32)) - first_keep.astype(
        jnp.int32
    )  # exclusive prefix count of winners
    slot = kept_before - kept_before[first_of_row]
    keep = jnp.logical_and(first_keep, slot < bucket_cap)
    dest = row_sorted * bucket_cap + jnp.clip(slot, 0, bucket_cap - 1)
    dest = jnp.where(keep, dest, table_size * bucket_cap)  # dropped → spill row
    pts_sorted = points[order]
    nrm_sorted = normals[order]
    table_pts = jnp.full((table_size * bucket_cap + 1, 3), 1e9, points.dtype)
    table_nrm = jnp.zeros((table_size * bucket_cap + 1, 3), normals.dtype)
    table_pts = table_pts.at[dest].set(pts_sorted, mode="drop")
    table_nrm = table_nrm.at[dest].set(nrm_sorted, mode="drop")
    return VoxelTable(
        points=table_pts[:-1].reshape(table_size, bucket_cap, 3),
        normals=table_nrm[:-1].reshape(table_size, bucket_cap, 3),
    )


def neighbor_bucket_hashes(
    query: jax.Array, voxel_size: float, table_size: int, neighborhood: int
) -> jax.Array:
    """Global table rows of each query's neighbor buckets ``(N, k)``.

    ``neighborhood=8``: half-offset 2x2x2 cells of ``2*voxel_size`` (build
    the table with that cell size); ``27``: 3x3x3 cells of ``voxel_size``.
    The ONE implementation of the neighbor rule — shared by ``voxel_nn``,
    ``gather_voxel_candidates`` and the row-sharded query."""
    from pwclonet_pylidarslam_tpu.core.pointcloud import voxel_hash

    if neighborhood == 8:
        cell = 2.0 * voxel_size
        t = query / cell
        c = jnp.floor(t).astype(jnp.int32)
        # pick the neighbor on the side the query sits in, per axis
        shift = jnp.where(t - c >= 0.5, 0, -1).astype(jnp.int32)
        offsets = jnp.asarray(_OCTANT_OFFSETS, jnp.int32)  # (8, 3)
        neigh = (c + shift)[:, None, :] + offsets[None]
    else:
        vox_q = jnp.floor(query / voxel_size).astype(jnp.int32)
        offsets = jnp.asarray(_NEIGHBOR_OFFSETS, jnp.int32)  # (27, 3)
        neigh = vox_q[:, None, :] + offsets[None]
    return voxel_hash(neigh) & (table_size - 1)


_NEIGHBOR_OFFSETS = tuple(
    (dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
)
_OCTANT_OFFSETS = tuple(
    (dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
)


def voxel_nn(
    table: VoxelTable,
    query: jax.Array,
    voxel_size: float,
    max_distance: float,
    neighborhood: int = 27,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest stored point of each ``query (N, 3)`` within ``max_distance``.

    ``neighborhood=27``: buckets are ``voxel_size`` cells, the query gathers
    its 3×3×3 neighborhood — exact within ``voxel_size``.
    ``neighborhood=8``: the half-offset trick — buckets are ``2·voxel_size``
    cells and the query gathers only the 2×2×2 cells nearest to it, which
    still guarantees exactness within ``voxel_size`` with 3.4× fewer bucket
    gathers (build the table with ``voxel_size = 2·reach`` for this mode).

    Returns ``(targets (N,3), normals (N,3), weights (N,))`` like
    ``associate``.
    """
    table_size, bucket_cap, _ = table.points.shape
    n = query.shape[0]
    h = neighbor_bucket_hashes(query, voxel_size, table_size, neighborhood)
    k = h.shape[1]
    cand = table.points[h].reshape(n, k * bucket_cap, 3)  # bucket-rows gather
    d2 = jnp.sum((cand - query[:, None, :]) ** 2, axis=-1)
    best = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
    target = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0]
    # only the winner's normal is needed — per-point row gather, not 27 buckets
    best_bucket = jnp.take_along_axis(h, (best // bucket_cap)[:, None], axis=1)[:, 0]
    normal = table.normals[best_bucket, best % bucket_cap]
    ok = jnp.logical_and(
        best_d2 < max_distance * max_distance,
        jnp.linalg.norm(normal, axis=-1) > 0.5,
    )
    return target, normal, ok.astype(query.dtype)


def gather_voxel_candidates(
    table: VoxelTable,
    query: jax.Array,
    voxel_size: float,
    neighborhood: int = 27,
) -> Tuple[jax.Array, jax.Array]:
    """Gather each query's neighbor-bucket candidate set ONCE:
    ``(cand_points (N, K·cap, 3), cand_normals (N, K·cap, 3))``.

    The bucket gather is the expensive part of :func:`voxel_nn` (random
    table-row access). Within one ICP registration the query points move by
    at most the association gate between GN iterations, so the bucket set
    gathered at the prior-warped positions stays valid for the whole solve —
    iterations then re-associate with :func:`nn_from_candidates`, a streaming
    argmin over the cached candidates (no gathers)."""
    table_size, bucket_cap, _ = table.points.shape
    n = query.shape[0]
    h = neighbor_bucket_hashes(query, voxel_size, table_size, neighborhood)
    k = h.shape[1]
    cand_pts = table.points[h].reshape(n, k * bucket_cap, 3)
    cand_nrm = table.normals[h].reshape(n, k * bucket_cap, 3)
    return cand_pts, cand_nrm


def nn_from_candidates(
    cand_points: jax.Array,
    cand_normals: jax.Array,
    query: jax.Array,
    max_distance: float | jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest candidate per query from a cached candidate set — same
    contract as :func:`voxel_nn` (targets, normals, weights)."""
    d2 = jnp.sum((cand_points - query[:, None, :]) ** 2, axis=-1)
    best = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
    target = jnp.take_along_axis(cand_points, best[:, None, None], axis=1)[:, 0]
    normal = jnp.take_along_axis(cand_normals, best[:, None, None], axis=1)[:, 0]
    ok = jnp.logical_and(
        best_d2 < max_distance * max_distance,
        jnp.linalg.norm(normal, axis=-1) > 0.5,
    )
    return target, normal, ok.astype(query.dtype)


def flatten_map_points(
    state: LocalMapState, query_pose: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """All stored keyframe points/normals transformed into the query frame
    (the transform step of ``build_model_map`` without the z-buffer).
    Returns ``(points (K·P, 3), normals (K·P, 3), valid (K·P,))``."""
    k, p, _ = state.points.shape
    rel = se3.inverse(query_pose)[None] @ state.poses
    pts_q = se3.transform(rel, state.points)
    nrm_q = jnp.einsum("kij,knj->kni", rel[:, :3, :3], state.normals)
    pt_ok = state.pt_valid * state.valid[:, None]
    return (
        pts_q.reshape(k * p, 3),
        nrm_q.reshape(k * p, 3),
        pt_ok.reshape(k * p),
    )
