"""SE(3) pose math: matrices, twists, parameterizations, interpolation.

Replaces the reference's ``slam/common/pose.py`` (Pose class with euler /
quaternion parameterizations, analytic jacobians, Slerp interpolation) with a
functional, fixed-shape JAX module.

Pose parameter layouts (matching the reference's ``Pose.build_pose_matrix``,
``pose.py:135-167``): ``params = (..., 6)`` with ``params[..., :3]`` the
translation and ``params[..., 3:]`` the rotation parameters; quaternion params
are ``(..., 7)`` = ``(tx, ty, tz, qw, qx, qy, qz)``.

The ICP / pose-graph solvers use **twist** (se(3)) parameters instead of the
reference's euler parameters — the right-invariant small-angle parameterization
is singularity-free and yields trivially fused jacobians on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pwclonet_pylidarslam_tpu.core import rotation as rot


def make_pose(rotation_mat: jax.Array, translation: jax.Array) -> jax.Array:
    """``(..., 3, 3)`` + ``(..., 3)`` → homogeneous ``(..., 4, 4)``."""
    batch = jnp.broadcast_shapes(rotation_mat.shape[:-2], translation.shape[:-1])
    out = jnp.zeros(batch + (4, 4), dtype=rotation_mat.dtype)
    out = out.at[..., :3, :3].set(rotation_mat)
    out = out.at[..., :3, 3].set(translation)
    out = out.at[..., 3, 3].set(1.0)
    return out


def identity_pose(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def inverse(pose: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (ref ``pose.py:116-133``)."""
    r_t = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    t = pose[..., :3, 3]
    return make_pose(r_t, -jnp.einsum("...ij,...j->...i", r_t, t))


def transform(pose: jax.Array, points: jax.Array) -> jax.Array:
    """Apply ``(..., 4, 4)`` to points ``(..., N, 3)`` (ref ``pose.py:184``).

    HIGHEST precision: TPU f32 einsums run bf16 passes by default, which
    puts up to 0.33 m of error on an 80 m-range coordinate (measured) —
    fatal for ICP association at a 0.5 m gate.
    """
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return (
        jnp.einsum(
            "...ij,...nj->...ni", r, points, precision=jax.lax.Precision.HIGHEST
        )
        + t[..., None, :]
    )


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """``a @ b`` — kept explicit for readability at call sites."""
    return a @ b


def relative(pose_a: jax.Array, pose_b: jax.Array) -> jax.Array:
    """``a⁻¹ b``: pose of frame b expressed in frame a."""
    return inverse(pose_a) @ pose_b


def to_relative_chain(absolute: jax.Array) -> jax.Array:
    """Absolute poses ``(T, 4, 4)`` → relative ``(T, 4, 4)``; entry 0 = I.

    Mirrors ``eval_odometry.compute_relative_poses`` (ref :247-260).
    """
    rel = inverse(absolute[:-1]) @ absolute[1:]
    return jnp.concatenate([identity_pose((1,), absolute.dtype), rel], axis=0)


def from_relative_chain(relative_poses: jax.Array) -> jax.Array:
    """Relative poses ``(T, 4, 4)`` → absolute via prefix composition.

    Uses an associative scan (log-depth on device) instead of the reference's
    python loop (``eval_odometry.compute_absolute_poses``, ref :263-276).
    """
    return jax.lax.associative_scan(jnp.matmul, relative_poses, axis=0)


# ---------------------------------------------------------------------------
# Twist (se(3)) parameterization — solver-facing
# ---------------------------------------------------------------------------


def exp(twist: jax.Array, eps: float = 1e-8) -> jax.Array:
    """se(3) exp: ``(..., 6)`` = (v, omega) → ``(..., 4, 4)``.

    Layout matches pose params: first 3 translation-ish (v), last 3 rotation
    (omega). Uses the closed-form V matrix with Taylor guards.
    """
    v, omega = twist[..., :3], twist[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, eps * eps))
    small = theta2 < eps
    k = rot.hat(omega)
    k2 = k @ k
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, eps * eps))
    b = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, eps**3),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=twist.dtype), k.shape)
    v_mat = eye + a[..., None, None] * k + b[..., None, None] * k2
    r_mat = rot.so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", v_mat, v)
    return make_pose(r_mat, t)


def log(pose: jax.Array, eps: float = 1e-7) -> jax.Array:
    """SE(3) log: ``(..., 4, 4)`` → twist ``(..., 6)`` (v, omega)."""
    omega = rot.so3_log(pose[..., :3, :3], eps)
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, eps * eps))
    small = theta2 < eps
    k = rot.hat(omega)
    k2 = k @ k
    # V^{-1} = I - K/2 + c * K^2,  c = (1 - theta cot(theta/2)/2) / theta^2
    half = theta / 2.0
    cot_term = half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot_term) / jnp.maximum(theta2, eps * eps))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pose.dtype), k.shape)
    v_inv = eye - 0.5 * k + c[..., None, None] * k2
    v = jnp.einsum("...ij,...j->...i", v_inv, pose[..., :3, 3])
    return jnp.concatenate([v, omega], axis=-1)


def apply_delta(pose: jax.Array, twist: jax.Array) -> jax.Array:
    """Left-multiplicative update ``exp(twist) @ pose`` (GN step)."""
    return exp(twist) @ pose


# ---------------------------------------------------------------------------
# Parameter layouts matching the reference Pose class
# ---------------------------------------------------------------------------


def params_to_pose_euler(params: jax.Array) -> jax.Array:
    """``(..., 6)`` = (t, euler-xyz) → ``(..., 4, 4)`` (ref pose.py:135-151)."""
    return make_pose(rot.euler_to_mat(params[..., 3:]), params[..., :3])


def pose_to_params_euler(pose: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [pose[..., :3, 3], rot.mat_to_euler(pose[..., :3, :3])], axis=-1
    )


def params_to_pose_quat(params: jax.Array) -> jax.Array:
    """``(..., 7)`` = (t, q_wxyz) → ``(..., 4, 4)`` (ref pose.py:152-167)."""
    return make_pose(rot.quat_to_mat(params[..., 3:]), params[..., :3])


def pose_to_params_quat(pose: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [pose[..., :3, 3], rot.mat_to_quat(pose[..., :3, :3])], axis=-1
    )


def normalize(pose: jax.Array) -> jax.Array:
    """Re-project the rotation block onto SO(3) (ref slam.py:142-144)."""
    return make_pose(rot.project_to_so3(pose[..., :3, :3]), pose[..., :3, 3])


# ---------------------------------------------------------------------------
# Interpolation (ref PosesInterpolator, pose.py:23-52; Distortion filter)
# ---------------------------------------------------------------------------


def interpolate_poses(
    pose0: jax.Array, pose1: jax.Array, alpha: jax.Array
) -> jax.Array:
    """Interpolate between two poses at fractions ``alpha (...,)``.

    Rotation via quaternion slerp, translation linear — same semantics as the
    reference's scipy ``Slerp`` + ``interp1d`` path used for motion de-skew
    (``preprocessing.py:150-191``).
    """
    q0 = rot.mat_to_quat(pose0[..., :3, :3])
    q1 = rot.mat_to_quat(pose1[..., :3, :3])
    q = rot.quat_slerp(q0, q1, alpha)
    a = jnp.asarray(alpha)[..., None]
    t = (1.0 - a) * pose0[..., :3, 3] + a * pose1[..., :3, 3]
    return make_pose(rot.quat_to_mat(q), t)


def interpolate_timestamps(
    poses: jax.Array, pose_times: jax.Array, query_times: jax.Array
) -> jax.Array:
    """Sample a pose trajectory at arbitrary timestamps.

    ``poses (T, 4, 4)`` at sorted ``pose_times (T,)`` → ``(Q, 4, 4)`` at
    ``query_times (Q,)``. Clamped at both ends. Replaces the reference's
    ``PosesInterpolator`` (scipy Slerp + interp1d).
    """
    idx = jnp.clip(jnp.searchsorted(pose_times, query_times, side="right") - 1, 0, poses.shape[0] - 2)
    t0 = pose_times[idx]
    t1 = pose_times[idx + 1]
    alpha = jnp.clip((query_times - t0) / jnp.maximum(t1 - t0, 1e-12), 0.0, 1.0)
    return interpolate_poses(poses[idx], poses[idx + 1], alpha)
