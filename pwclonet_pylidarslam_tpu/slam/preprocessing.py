"""Preprocessing filters: de-skew (distortion), grid sampling, voxel stats.

Functional, fixed-shape replacements for the reference's ``Filter`` chain
(``slam/preprocessing.py``): instead of a string-keyed ``data_dict`` mutated
by sorted filters, each filter is a pure function over ``(points, mask, aux)``
and :class:`Preprocessing` composes a configured list of them.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pwclonet_pylidarslam_tpu.core import rotation as rot, se3
from pwclonet_pylidarslam_tpu.core.geometry import estimate_timestamps
from pwclonet_pylidarslam_tpu.core.pointcloud import grid_sample_mask, voxel_statistics


def deskew(
    points: jax.Array,
    relative_pose: jax.Array,
    timestamps: Optional[jax.Array] = None,
) -> jax.Array:
    """Motion de-skew by per-point pose interpolation (ref ``Distortion``,
    preprocessing.py:144-191).

    ``relative_pose`` is the estimated motion over the sweep (frame t-1 → t
    prior, e.g. constant velocity). Each point is re-expressed at the scan-end
    pose: rotation slerped, translation linear over its timestamp fraction.
    Timestamps default to azimuth-estimated fractions
    (``geometry.estimate_timestamps``).
    """
    if timestamps is None:
        timestamps = estimate_timestamps(points)
    tmin = jnp.min(timestamps)
    tmax = jnp.max(timestamps)
    alpha = jnp.where(
        tmax - tmin > 0, (timestamps - tmin) / jnp.maximum(tmax - tmin, 1e-12), 0.0
    )
    q_identity = jnp.asarray([1.0, 0.0, 0.0, 0.0], points.dtype)
    q_rel = rot.mat_to_quat(relative_pose[:3, :3]).astype(points.dtype)
    q_interp = rot.quat_slerp(
        jnp.broadcast_to(q_identity, alpha.shape + (4,)),
        jnp.broadcast_to(q_rel, alpha.shape + (4,)),
        alpha,
    )
    rotated = rot.quat_rotate(q_interp, points[..., None, :])[..., 0, :]
    translated = rotated + alpha[..., None] * relative_pose[:3, 3]
    return translated


def grid_sample_filter(
    points: jax.Array, mask: jax.Array, voxel_size: float
) -> jax.Array:
    """Keep one point per voxel: returns the updated validity mask
    (ref ``GridSample``, preprocessing.py:207-229 — mask instead of indices)."""
    keep = grid_sample_mask(points, voxel_size, mask)
    return mask * keep.astype(mask.dtype)


def voxelization_stats(
    points: jax.Array, mask: jax.Array, voxel_size: float, max_voxels: int
):
    """Per-voxel statistics (ref ``Voxelization`` filter, preprocessing.py:63-110)."""
    return voxel_statistics(points, voxel_size, max_voxels, mask)


@dataclasses.dataclass(frozen=True)
class PreprocessingConfig:
    deskew: bool = False
    grid_sample_voxel: float = 0.0  # 0 disables


class Preprocessing:
    """Composes the configured filters (ref ``Preprocessing.forward:288-291``)."""

    def __init__(self, config: PreprocessingConfig = PreprocessingConfig()):
        self.config = config

    def __call__(
        self,
        points: jax.Array,
        mask: jax.Array,
        init_rpose: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        if self.config.deskew and init_rpose is not None:
            points = jnp.where(
                mask[..., None] > 0, deskew(points, init_rpose), points
            )
        if self.config.grid_sample_voxel > 0:
            mask = grid_sample_filter(points, mask, self.config.grid_sample_voxel)
        return points, mask
