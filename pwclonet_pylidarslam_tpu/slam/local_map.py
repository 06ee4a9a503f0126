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
