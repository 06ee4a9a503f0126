"""Voxel-grid operations: hashing, grid sampling, per-voxel statistics.

Fixed-shape JAX replacement for the reference's numba CPU kernels
(``slam/common/pointcloud.py``). The reference's dynamic-size outputs
(unique voxels, per-voxel groups) become **mask conventions**:
``grid_sample`` returns an (N,)-mask selecting one point per occupied voxel,
and ``voxel_statistics`` uses sort-based segment reductions over a fixed
number of segments.

Hash: the 3-prime spatial hash of Niessner et al. (ref ``voxel_hash:64-75``),
kept for parity; collisions are as (im)probable as the reference's.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

import numpy as np

# plain numpy scalars, NOT jnp: a module-level device array would initialize
# the XLA backend at import time, which breaks multi-host bootstrap ordering
# (jax.distributed.initialize must run before any backend-touching call)
_P1, _P2, _P3 = np.int32(73856093), np.int32(19349669), np.int32(83492791)


def voxelise(
    points: jax.Array,
    voxel_x: float,
    voxel_y: float = -1.0,
    voxel_z: float = -1.0,
) -> jax.Array:
    """Round-to-grid int voxel coordinates ``(..., N, 3)`` (ref ``voxelise:105``)."""
    if voxel_y <= 0:
        voxel_y = voxel_x
    if voxel_z <= 0:
        voxel_z = voxel_x
    scale = jnp.asarray([voxel_x, voxel_y, voxel_z], points.dtype)
    return jnp.round(points / scale).astype(jnp.int32)


def voxel_hash(voxels: jax.Array) -> jax.Array:
    """3-prime hash of int voxel coords ``(..., N, 3)`` → ``(..., N)`` int32.

    int32 with wraparound multiplication (deterministic two's-complement in
    XLA) — works identically with and without jax x64 mode.
    """
    v = voxels.astype(jnp.int32)
    return _P1 * v[..., 0] + _P2 * v[..., 1] + _P3 * v[..., 2]


def planar_hash(voxels: jax.Array) -> jax.Array:
    """2D pillar hash over (x, y) (ref ``planar_hashing:77``)."""
    v = voxels.astype(jnp.int32)
    return _P1 * v[..., 0] + _P2 * v[..., 1]


def grid_sample_mask(
    points: jax.Array,
    voxel_size: float,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """One point per voxel: boolean mask ``(N,)`` (ref ``grid_sample:239``).

    Keeps the **lowest-index** point of each voxel (the reference's
    ``np.unique(..., return_index=True)`` does the same). Sort-based:
    O(N log N) on device, fixed shapes.
    """
    h = voxel_hash(voxelise(points, voxel_size))
    if valid is not None:
        # push invalid points to a sentinel bucket that is always discarded
        h = jnp.where(valid > 0, h, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(h)
    h_sorted = h[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]]
    )
    if valid is not None:
        first = jnp.logical_and(first, h_sorted != jnp.iinfo(jnp.int32).max)
    # within equal hashes argsort is stable → first occurrence = lowest index
    mask = jnp.zeros(h.shape, bool).at[order].set(first)
    return mask


class VoxelStats(NamedTuple):
    counts: jax.Array  # (S,) points per segment
    means: jax.Array  # (S, 3)
    covs: jax.Array  # (S, 3, 3)
    segment_ids: jax.Array  # (N,) segment index per input point (S = max segments)


@functools.partial(jax.jit, static_argnames=("max_voxels",))
def voxel_statistics(
    points: jax.Array,
    voxel_size: float,
    max_voxels: int,
    valid: Optional[jax.Array] = None,
) -> VoxelStats:
    """Per-voxel count / mean / covariance by segment reduction.

    Replaces the reference's hash-sort sweep
    (``voxel_normal_distribution:134-224``). Voxels beyond ``max_voxels``
    distinct hashes alias into the last segment (callers pick ``max_voxels``
    ≥ expected occupancy; typical scans occupy ≪ N voxels).
    """
    n = points.shape[0]
    h = voxel_hash(voxelise(points, voxel_size))
    if valid is not None:
        h = jnp.where(valid > 0, h, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(h)
    h_sorted = h[order]
    new_seg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (h_sorted[1:] != h_sorted[:-1]).astype(jnp.int32)]
    )
    seg_sorted = jnp.minimum(jnp.cumsum(new_seg), max_voxels - 1)
    seg = jnp.zeros((n,), jnp.int32).at[order].set(seg_sorted)

    w = jnp.ones((n,), points.dtype)
    if valid is not None:
        w = w * (valid > 0)
    counts = jax.ops.segment_sum(w, seg, max_voxels)
    sums = jax.ops.segment_sum(points * w[:, None], seg, max_voxels)
    means = sums / jnp.maximum(counts[:, None], 1.0)
    outer = points[:, :, None] * points[:, None, :] * w[:, None, None]
    second = jax.ops.segment_sum(outer, seg, max_voxels)
    covs = second / jnp.maximum(counts[:, None, None], 1.0) - (
        means[:, :, None] * means[:, None, :]
    )
    return VoxelStats(counts=counts, means=means, covs=covs, segment_ids=seg)


def grid_sample_fixed(
    points: jax.Array,
    voxel_size: float,
    num_samples: int,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Grid sample to a **fixed** output size: the first ``num_samples``
    voxel representatives (by point index), zero-padded.

    Returns ``(sampled (num_samples, 3), mask (num_samples,))``. This is the
    shape-stable entry used by the jitted SLAM path (the reference's dynamic
    ``grid_sample`` feeds variable-size clouds to CPU consumers).
    """
    keep = grid_sample_mask(points, voxel_size, valid)
    # order kept points by index, then take the first num_samples
    idx = jnp.argsort(jnp.where(keep, jnp.arange(points.shape[0]), points.shape[0]))
    take = idx[:num_samples]
    ok = keep[take]
    sampled = jnp.where(ok[:, None], points[take], 0.0)
    return sampled, ok.astype(points.dtype)
