"""Spherical projection: point clouds ↔ vertex maps, deterministic z-buffering.

Replaces the reference's ``slam/common/projection.py``. The reference scatters
points sorted by descending depth so the nearest point wins via last-write-wins
(``projection.py:405-433``) — a race-free but sort-heavy trick. Here the
z-buffer is two **scatter-mins** (depth, then winner index among min-depth
ties) plus one gather: deterministic, fixed-shape, and XLA lowers the
``.at[].min`` scatters to a single fused pass on TPU.

Angle conventions match ``torch__spherical_projection`` (ref ``:20-82``):
``col = W * 0.5 (−atan2(y,x)/π + 1)``, ``row = H * (1 − (asin(z/r) + |fov_down|)/fov)``,
FOV angles in degrees, up/down as (min_vertical_fov, max_vertical_fov).

Layout: vertex maps are **channel-last** ``(B, H, W, C)`` (XLA-native);
channel 0..2 = xyz. A pixel is invalid iff its depth channel is 0.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = jnp.inf


def spherical_pixel_coords(
    points: jax.Array,
    height: int,
    width: int,
    min_vertical_fov: float,
    max_vertical_fov: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Continuous (row, col) pixel coords + range for ``points (B, N, 3)``.

    Invalid points (r == 0) get row = col = −1 (matches ref ``:64-82``).
    """
    r = jnp.linalg.norm(points, axis=-1)
    valid = r > 0.0
    r_safe = jnp.where(valid, r, 1e-3)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    theta = -jnp.arctan2(y, x)
    phi = jnp.arcsin(jnp.clip(z / r_safe, -1.0, 1.0))
    fov_up = jnp.deg2rad(min_vertical_fov)
    fov_down = jnp.deg2rad(max_vertical_fov)
    fov = jnp.abs(fov_down) + jnp.abs(fov_up)
    col = 0.5 * (theta / jnp.pi + 1.0) * width
    row = (1.0 - (phi + jnp.abs(fov_down)) / fov) * height
    row = jnp.where(valid, row, -1.0)
    col = jnp.where(valid, col, -1.0)
    return row, col, jnp.where(valid, r, 0.0)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def zbuffer_scatter(
    channels: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    depth: jax.Array,
    height: int,
    width: int,
) -> jax.Array:
    """Scatter ``channels (B, N, C)`` to ``(B, H, W, C)``; nearest depth wins.

    Deterministic two-pass z-buffer:
    1. scatter-min depth per pixel;
    2. among points matching the min depth, scatter-min the point index;
    3. gather winner channels; empty pixels stay 0.
    """
    b, n, c = channels.shape
    r_i = jnp.round(rows).astype(jnp.int32)
    c_i = jnp.round(cols).astype(jnp.int32)
    valid = (
        (rows >= 0.0)
        & (r_i >= 0)
        & (r_i <= height - 1)
        & (c_i >= 0)
        & (c_i <= width - 1)
        & (depth > 0.0)
    )
    flat = jnp.where(valid, r_i * width + c_i, height * width)  # dummy slot at end
    key = jnp.where(valid, depth, _INF)

    def per_batch(flat_b, key_b, chan_b):
        min_depth = jnp.full((height * width + 1,), _INF, key_b.dtype)
        min_depth = min_depth.at[flat_b].min(key_b)
        is_winner = key_b == min_depth[flat_b]
        idx_key = jnp.where(is_winner, jnp.arange(n, dtype=jnp.int32), n)
        win_idx = jnp.full((height * width + 1,), n, jnp.int32)
        win_idx = win_idx.at[flat_b].min(idx_key)
        win_idx_img = win_idx[: height * width]
        has_point = win_idx_img < n
        gathered = chan_b[jnp.clip(win_idx_img, 0, n - 1)]
        out = jnp.where(has_point[:, None], gathered, 0.0)
        return out.reshape(height, width, c)

    return jax.vmap(per_batch)(flat, key, channels)


@dataclasses.dataclass(frozen=True)
class SphericalProjector:
    """Spherical projector (ref ``SphericalProjector``, projection.py:444-527).

    Default geometry is the KITTI HDL-64 setup used by the reference loader
    (``kitti_dataset.py:341-349``): 64 rows, 720 (or 1024) cols, vertical FOV
    +3° (up) / −24° (down).
    """

    height: int = 64
    width: int = 720
    min_vertical_fov: float = 3.0
    max_vertical_fov: float = -24.0

    def project(self, points: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Continuous (row, col, range) of ``points (B, N, 3)``."""
        return spherical_pixel_coords(
            points, self.height, self.width, self.min_vertical_fov, self.max_vertical_fov
        )

    def build_projection_map(
        self, points: jax.Array, channels: Optional[jax.Array] = None
    ) -> jax.Array:
        """Project ``points (B, N, 3)`` (+ optional extra ``channels (B,N,C)``)
        into a ``(B, H, W, 3+C)`` vertex map; nearest point wins per pixel."""
        rows, cols, depth = self.project(points)
        chan = points if channels is None else jnp.concatenate([points, channels], -1)
        return zbuffer_scatter(chan, rows, cols, depth, self.height, self.width)

    def build_vertex_map(self, points: jax.Array) -> jax.Array:
        return self.build_projection_map(points)


def vmap_depth(vertex_map: jax.Array) -> jax.Array:
    """Per-pixel range ``(B, H, W)`` of a vertex map; 0 where invalid."""
    return jnp.linalg.norm(vertex_map[..., :3], axis=-1)


def vmap_mask(vertex_map: jax.Array) -> jax.Array:
    """Validity mask ``(B, H, W)``: pixel holds a real point."""
    return (vmap_depth(vertex_map) > 0.0).astype(vertex_map.dtype)


def vmap_to_points(vertex_map: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Flatten ``(B, H, W, C)`` → (``(B, H·W, C)`` points, ``(B, H·W)`` mask).

    (Ref ``geometry.projection_map_to_points:189`` — but mask instead of
    dynamic filtering, keeping shapes static.)
    """
    b, h, w, c = vertex_map.shape
    pts = vertex_map.reshape(b, h * w, c)
    mask = (jnp.linalg.norm(pts[..., :3], axis=-1) > 0.0).astype(vertex_map.dtype)
    return pts, mask


def density_matched_projector(num_points: int) -> "SphericalProjector":
    """Vertex-map resolution matched to scan density (~8 points/pixel).

    A 64x720 map at 1024 points/scan is 2% occupied and its box-filter
    normals collapse (measured 40% drift vs 4% density-matched); the
    full-size default (8192 -> 64x720) is unchanged by this rule."""
    h = 64 if num_points >= 4096 else 32
    w = max(64, min(720, (num_points * 8 // h) // 64 * 64))
    return SphericalProjector(height=h, width=w)
