"""Round-trip and oracle tests for core.rotation."""

import pytest
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

from pwclonet_pylidarslam_tpu.core import rotation as rot


def random_rotations(rng, n):
    return ScipyRot.random(n, random_state=np.random.RandomState(0)).as_matrix()


def test_euler_roundtrip(rng):
    euler = rng.uniform(-1.2, 1.2, size=(64, 3))
    mats = rot.euler_to_mat(jnp.asarray(euler))
    back = rot.mat_to_euler(mats)
    np.testing.assert_allclose(np.asarray(back), euler, atol=1e-6)


def test_euler_matches_scipy(rng):
    euler = rng.uniform(-np.pi, np.pi, size=(32, 3))
    ours = np.asarray(rot.euler_to_mat(jnp.asarray(euler)))
    # reference convention: R = Rz @ Ry @ Rx == scipy extrinsic 'xyz'
    theirs = ScipyRot.from_euler("xyz", euler).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_quat_mat_roundtrip(rng):
    mats = random_rotations(rng, 128)
    q = rot.mat_to_quat(jnp.asarray(mats))
    back = np.asarray(rot.quat_to_mat(q))
    np.testing.assert_allclose(back, mats, atol=1e-6)
    # unit norm, w >= 0
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-6)
    assert np.all(np.asarray(q)[:, 0] >= 0)


def test_quat_multiply_matches_matmul(rng):
    mats = random_rotations(rng, 32)
    qa = rot.mat_to_quat(jnp.asarray(mats[:16]))
    qb = rot.mat_to_quat(jnp.asarray(mats[16:]))
    q_ab = rot.quat_multiply(qa, qb)
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_mat(q_ab)), mats[:16] @ mats[16:], atol=1e-6
    )


def test_quat_rotate_matches_mat(rng):
    mats = random_rotations(rng, 8)
    pts = rng.normal(size=(8, 100, 3))
    q = rot.mat_to_quat(jnp.asarray(mats))
    rotated = np.asarray(rot.quat_rotate(q, jnp.asarray(pts)))
    expected = np.einsum("bij,bnj->bni", mats, pts)
    np.testing.assert_allclose(rotated, expected, atol=1e-6)


def test_quat_inverse(rng):
    mats = random_rotations(rng, 16)
    q = rot.mat_to_quat(jnp.asarray(mats))
    prod = rot.quat_multiply(q, rot.quat_inverse(q))
    expected = np.tile(np.array([1.0, 0, 0, 0]), (16, 1))
    np.testing.assert_allclose(np.asarray(prod), expected, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    omega = rng.normal(size=(64, 3))
    omega = omega / np.linalg.norm(omega, axis=-1, keepdims=True)
    omega = omega * rng.uniform(0, 3.0, size=(64, 1))  # angles < pi
    mats = rot.so3_exp(jnp.asarray(omega))
    back = np.asarray(rot.so3_log(mats))
    np.testing.assert_allclose(back, omega, atol=1e-5)


def test_so3_exp_matches_scipy(rng):
    omega = rng.normal(size=(32, 3)) * 0.7
    ours = np.asarray(rot.so3_exp(jnp.asarray(omega)))
    theirs = ScipyRot.from_rotvec(omega).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-8)


@pytest.mark.slow
def test_so3_log_near_zero_and_pi(rng):
    # near zero
    omega = rng.normal(size=(8, 3)) * 1e-9
    back = np.asarray(rot.so3_log(rot.so3_exp(jnp.asarray(omega))))
    np.testing.assert_allclose(back, omega, atol=1e-12)
    # near pi
    axis = rng.normal(size=(8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    omega = axis * (np.pi - 1e-5)
    mats = ScipyRot.from_rotvec(omega).as_matrix()
    back = np.asarray(rot.so3_log(jnp.asarray(mats)))
    np.testing.assert_allclose(np.abs(back), np.abs(omega), atol=1e-3)


def test_slerp_endpoints_and_midpoint(rng):
    mats = random_rotations(rng, 8)
    q0 = rot.mat_to_quat(jnp.asarray(mats[:4]))
    q1 = rot.mat_to_quat(jnp.asarray(mats[4:]))
    np.testing.assert_allclose(
        np.asarray(rot.quat_slerp(q0, q1, jnp.zeros(4))), np.asarray(q0), atol=1e-6
    )
    np.testing.assert_allclose(
        np.abs(np.asarray(rot.quat_slerp(q0, q1, jnp.ones(4)))),
        np.abs(np.asarray(q1)),
        atol=1e-6,
    )
    # midpoint must be equidistant in angle
    mid = rot.quat_slerp(q0, q1, jnp.full(4, 0.5))
    m0 = np.asarray(rot.quat_to_mat(q0))
    m1 = np.asarray(rot.quat_to_mat(q1))
    mm = np.asarray(rot.quat_to_mat(mid))
    def angle(a, b):
        tr = np.trace(a.swapaxes(-1, -2) @ b, axis1=-2, axis2=-1)
        return np.arccos(np.clip((tr - 1) / 2, -1, 1))
    np.testing.assert_allclose(angle(m0, mm), angle(mm, m1), atol=1e-5)


def test_project_to_so3(rng):
    mats = random_rotations(rng, 16) + rng.normal(size=(16, 3, 3)) * 0.01
    proj = np.asarray(rot.project_to_so3(jnp.asarray(mats)))
    assert np.all(np.asarray(rot.is_rotation_matrix(jnp.asarray(proj))))


def test_euler_jacobian_matches_fd(rng):
    euler = rng.uniform(-1.0, 1.0, size=(4, 3))
    jac = np.asarray(rot.euler_jacobian(jnp.asarray(euler)))
    eps = 1e-6
    for k in range(3):
        de = np.zeros(3)
        de[k] = eps
        fd = (
            np.asarray(rot.euler_to_mat(jnp.asarray(euler + de)))
            - np.asarray(rot.euler_to_mat(jnp.asarray(euler - de)))
        ) / (2 * eps)
        np.testing.assert_allclose(jac[:, k], fd, atol=1e-5)
