"""SO(3) rotation math: euler angles, quaternions, axis-angle, jacobians.

Pure-JAX, fixed-shape, batched replacement for the reference's
``slam/common/rotation.py`` and the quaternion algebra of
``slam/models/PWCLONet/PWCLO_utils.py``.

Conventions (chosen once, used framework-wide):
- Quaternions are **scalar-first** ``(w, x, y, z)`` everywhere internally; the
  reference's ``scalar_last`` flag confusion (PWCLO_utils.switch_quat) is
  handled by converting only at IO boundaries (see :func:`quat_to_scalar_last`).
- Euler convention matches the reference (``rotation.py:147-159``):
  ``R = Rz(ez) @ Ry(ey) @ Rx(ex)`` (convention "xyz", extrinsic x-then-y-then-z).
- All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Elementary rotations + analytic derivatives (reference rotation.py:20-140)
# ---------------------------------------------------------------------------


def _rot_stack(rows):
    """Stack a 3x3 matrix from 9 broadcastable scalars, batch-last-two-dims."""
    r = [jnp.broadcast_arrays(*row) for row in rows]
    flat = jnp.stack([jnp.stack(row, axis=-1) for row in r], axis=-2)
    return flat


def rot_x(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return _rot_stack([[o, z, z], [z, c, -s], [z, s, c]])


def rot_y(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return _rot_stack([[c, z, s], [z, o, z], [-s, z, c]])


def rot_z(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return _rot_stack([[c, -s, z], [s, c, z], [z, z, o]])


def euler_to_mat(euler: jax.Array) -> jax.Array:
    """Euler angles ``(..., 3)`` = (ex, ey, ez) → rotation ``(..., 3, 3)``.

    ``R = Rz(ez) @ Ry(ey) @ Rx(ex)`` (reference ``rotation.py:153-159``).
    """
    ex, ey, ez = euler[..., 0], euler[..., 1], euler[..., 2]
    return rot_z(ez) @ rot_y(ey) @ rot_x(ex)


def mat_to_euler(rot: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Rotation ``(..., 3, 3)`` → euler ``(..., 3)`` (xyz convention).

    Gimbal-lock-masked like the reference ``rotation.py:262-320``: when
    ``|r20| ≈ 1`` the x angle is set to 0 and z absorbs the remaining DOF.
    """
    r20 = jnp.clip(rot[..., 2, 0], -1.0, 1.0)
    singular = jnp.abs(jnp.abs(r20) - 1.0) < eps

    ey = -jnp.arcsin(r20)
    # regular branch
    ex_reg = jnp.arctan2(rot[..., 2, 1], rot[..., 2, 2])
    ez_reg = jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0])
    # singular branch: cos(ey) = 0 → only ez - sign*ex observable
    ex_sing = jnp.zeros_like(ey)
    ez_sing = jnp.arctan2(-rot[..., 0, 1], rot[..., 1, 1])

    ex = jnp.where(singular, ex_sing, ex_reg)
    ez = jnp.where(singular, ez_sing, ez_reg)
    return jnp.stack([ex, ey, ez], axis=-1)


def euler_jacobian(euler: jax.Array) -> jax.Array:
    """Analytic ``dR/d(euler)`` → ``(..., 3, 3, 3)`` (reference :196-221).

    Index 0 of the new axis is dR/dex etc.
    """

    def _jac_elem(angle, maker):
        return jax.jacfwd(lambda a: maker(a))(angle)

    # Closed-form: dRx = Rx(a + pi/2) with zeroed invariant row/col is messy;
    # use forward-mode per elementary rotation (still fully traced/XLA-fused).
    ex, ey, ez = euler[..., 0], euler[..., 1], euler[..., 2]
    c, s = jnp.cos, jnp.sin
    z = jnp.zeros_like(ex)
    jrx = _rot_stack([[z, z, z], [z, -s(ex), -c(ex)], [z, c(ex), -s(ex)]])
    jry = _rot_stack([[-s(ey), z, c(ey)], [z, z, z], [-c(ey), z, -s(ey)]])
    jrz = _rot_stack([[-s(ez), -c(ez), z], [c(ez), -s(ez), z], [z, z, z]])
    rx, ry, rz = rot_x(ex), rot_y(ey), rot_z(ez)
    return jnp.stack(
        [rz @ ry @ jrx, rz @ jry @ rx, jrz @ ry @ rx], axis=-3
    )


# ---------------------------------------------------------------------------
# Quaternions (scalar-first wxyz) — reference PWCLO_utils.py / pose.py
# ---------------------------------------------------------------------------


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Inverse of a (possibly non-unit) quaternion (ref PWCLO_utils.py:31-39)."""
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return quat_conjugate(q) / jnp.maximum(sq, eps)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product ``a ⊗ b`` over ``(..., 4)`` scalar-first quats."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, points: jax.Array) -> jax.Array:
    """Rotate ``points (..., N, 3)`` by unit quats ``q (..., 4)``.

    Uses the expanded Rodrigues form (no 4-component padding round trip as in
    the reference's ``warp`` at ``PWCLO_utils.py:42-63``): one fused
    cross-product chain, VPU-friendly.
    """
    qw = q[..., None, 0:1]
    qv = q[..., None, 1:4]
    t = 2.0 * jnp.cross(qv, points)
    return points + qw * t + jnp.cross(qv, t)


def quat_apply(q: jax.Array, t: jax.Array, points: jax.Array) -> jax.Array:
    """``R(q) @ p + t`` for points ``(..., N, 3)``, ``t (..., 3)``."""
    return quat_rotate(q, points) + t[..., None, :]


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion ``(..., 4)`` → rotation matrix ``(..., 3, 3)``."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return _rot_stack(
        [
            [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
        ]
    )


def mat_to_quat(rot: jax.Array) -> jax.Array:
    """Rotation matrix ``(..., 3, 3)`` → scalar-first unit quat ``(..., 4)``.

    Branch-free Shepperd method: computes all four candidate quaternions and
    selects the numerically safest by the largest diagonal combination
    (replaces the reference's single-branch ``pose.py:matrix_to_quaternion``,
    which is unstable near w≈0).
    """
    m = rot
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    # Four squared magnitudes (up to common scale)
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-20))

    # candidate from w
    cw = jnp.stack(
        [
            qw2,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    cx = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            qx2,
            m[..., 1, 0] + m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    cy = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] + m[..., 0, 1],
            qy2,
            m[..., 2, 1] + m[..., 1, 2],
        ],
        axis=-1,
    )
    cz = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 2, 1] + m[..., 1, 2],
            qz2,
        ],
        axis=-1,
    )
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # (..., 4cand, 4)
    chosen = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    denom = jnp.take_along_axis(mags, best[..., None], axis=-1)
    q = chosen / (2.0 * safe_sqrt(denom))
    # canonical sign: w >= 0
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return quat_normalize(q)


def quat_to_scalar_last(q: jax.Array) -> jax.Array:
    """wxyz → xyzw (IO boundary only; ref ``PWCLO_utils.switch_quat``)."""
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def quat_from_scalar_last(q: jax.Array) -> jax.Array:
    """xyzw → wxyz (IO boundary only)."""
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def quat_slerp(q0: jax.Array, q1: jax.Array, alpha: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quats, batched.

    ``alpha`` broadcasts against the batch dims. Replaces scipy ``Slerp``
    used by the reference's ``PosesInterpolator`` (``pose.py:23-52``).
    """
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    a = jnp.asarray(alpha)[..., None]
    w0 = jnp.where(small, 1.0 - a, jnp.sin((1.0 - a) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, a, jnp.sin(a * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# Axis-angle / so(3)
# ---------------------------------------------------------------------------


def hat(v: jax.Array) -> jax.Array:
    """``(..., 3)`` → skew-symmetric ``(..., 3, 3)`` (ref geometry.cross_op)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return _rot_stack([[zero, -z, y], [z, zero, -x], [-y, x, zero]])


def vee(m: jax.Array) -> jax.Array:
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(omega: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rodrigues: axis-angle ``(..., 3)`` → rotation ``(..., 3, 3)``.

    Taylor-safe near zero (needed because GN updates pass through here under
    jit, where angles start at exactly 0).
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, eps * eps))
    small = theta2 < eps
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, eps * eps))
    k = hat(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def so3_log(rot: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Rotation ``(..., 3, 3)`` → axis-angle ``(..., 3)`` (principal branch).

    Differentiation-safe: ``arccos`` is evaluated on an input clipped away
    from ±1 (its derivative is −∞ there, and jax ``where`` leaks NaN
    tangents from untaken branches), with series/near-π branches selected on
    the *unclipped* cosine so values stay exact.
    """
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_raw = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    cos_safe = jnp.clip(cos_raw, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_safe)
    w = vee(rot - jnp.swapaxes(rot, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_theta = jnp.sin(theta)
    small = cos_raw > 1.0 - eps  # theta ≲ 1.4e-3: use the series
    scale = jnp.where(
        small, 1.0 + theta * theta / 6.0, theta / jnp.where(small, 1.0, sin_theta)
    )
    near_pi = cos_raw < -1.0 + 1e-4
    # near pi: axis from the dominant column of (R + I)
    m = rot + jnp.eye(3, dtype=rot.dtype)
    col_norms = jnp.linalg.norm(m, axis=-2)
    best_col = jnp.argmax(col_norms, axis=-1)
    axis = jnp.take_along_axis(m, best_col[..., None, None], axis=-1)[..., 0]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    # fix sign to agree with w when w is nonzero
    sign = jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    log_near_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], log_near_pi, w * scale[..., None])


def project_to_so3(mat: jax.Array) -> jax.Array:
    """Nearest rotation matrix by SVD (ref ``slam.py:142-144`` re-projection)."""
    u, _, vt = jnp.linalg.svd(mat)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (u * d[..., None, :]) @ vt


def is_rotation_matrix(rot: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Elementwise check ``RᵀR = I`` and ``det R = 1`` (ref rotation.py:228)."""
    eye = jnp.eye(3, dtype=rot.dtype)
    ortho = jnp.max(jnp.abs(jnp.swapaxes(rot, -1, -2) @ rot - eye), axis=(-1, -2)) < eps
    det = jnp.abs(jnp.linalg.det(rot) - 1.0) < eps
    return jnp.logical_and(ortho, det)
