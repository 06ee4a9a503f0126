"""Tests for core.se3: exp/log, composition, interpolation, param layouts."""

import pytest
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

from pwclonet_pylidarslam_tpu.core import se3, rotation as rot


def random_poses(rng, n, t_scale=1.0):
    r = ScipyRot.random(n, random_state=np.random.RandomState(1)).as_matrix()
    t = rng.normal(size=(n, 3)) * t_scale
    return np.asarray(se3.make_pose(jnp.asarray(r), jnp.asarray(t)))


def test_inverse(rng):
    poses = random_poses(rng, 32)
    prod = np.asarray(se3.inverse(jnp.asarray(poses))) @ poses
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (32, 1, 1)), atol=1e-8)


def test_transform(rng):
    poses = random_poses(rng, 4)
    pts = rng.normal(size=(4, 50, 3))
    out = np.asarray(se3.transform(jnp.asarray(poses), jnp.asarray(pts)))
    hom = np.concatenate([pts, np.ones((4, 50, 1))], axis=-1)
    expected = np.einsum("bij,bnj->bni", poses, hom)[..., :3]
    np.testing.assert_allclose(out, expected, atol=1e-8)


def test_exp_log_roundtrip(rng):
    twists = rng.normal(size=(64, 6))
    twists[:, 3:] *= 0.8  # keep angle < pi
    poses = se3.exp(jnp.asarray(twists))
    back = np.asarray(se3.log(poses))
    np.testing.assert_allclose(back, twists, atol=1e-6)


def test_exp_zero_is_identity():
    np.testing.assert_allclose(
        np.asarray(se3.exp(jnp.zeros(6))), np.eye(4), atol=1e-12
    )


def test_exp_small_angle_stability():
    tiny = jnp.asarray(np.full((3, 6), 1e-10))
    out = np.asarray(se3.exp(tiny))
    assert np.all(np.isfinite(out))
    back = np.asarray(se3.log(se3.exp(tiny)))
    np.testing.assert_allclose(back, np.asarray(tiny), atol=1e-12)


@pytest.mark.slow
def test_relative_chain_roundtrip(rng):
    absolute = jnp.asarray(random_poses(rng, 20, t_scale=5.0))
    rel = se3.to_relative_chain(absolute)
    # rebase: chain starts at absolute[0]
    rebuilt = absolute[0] @ se3.from_relative_chain(rel)
    np.testing.assert_allclose(np.asarray(rebuilt), np.asarray(absolute), atol=1e-5)


def test_param_layouts_roundtrip(rng):
    poses = jnp.asarray(random_poses(rng, 16))
    p6 = se3.pose_to_params_euler(poses)
    np.testing.assert_allclose(
        np.asarray(se3.params_to_pose_euler(p6)), np.asarray(poses), atol=1e-6
    )
    p7 = se3.pose_to_params_quat(poses)
    assert p7.shape == (16, 7)
    np.testing.assert_allclose(
        np.asarray(se3.params_to_pose_quat(p7)), np.asarray(poses), atol=1e-6
    )


def test_interpolate_endpoints(rng):
    poses = random_poses(rng, 2)
    p0, p1 = jnp.asarray(poses[0]), jnp.asarray(poses[1])
    np.testing.assert_allclose(
        np.asarray(se3.interpolate_poses(p0, p1, jnp.asarray(0.0))), poses[0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(se3.interpolate_poses(p0, p1, jnp.asarray(1.0))), poses[1], atol=1e-6
    )


@pytest.mark.slow
def test_interpolate_timestamps(rng):
    # constant-twist trajectory: slerp rotation is exact (shared axis);
    # translation is linear between knots by construction.
    times = np.arange(5.0)
    twist = np.array([1.0, 0.5, 0.0, 0.0, 0.0, 0.3])
    poses = jnp.stack([se3.exp(jnp.asarray(t * twist)) for t in times])
    q_times = jnp.asarray([0.5, 1.5, 3.25])
    interp = np.asarray(se3.interpolate_timestamps(poses, jnp.asarray(times), q_times))
    # rotations match exp exactly
    expected_rot = np.stack(
        [np.asarray(se3.exp(jnp.asarray(t * twist)))[:3, :3] for t in [0.5, 1.5, 3.25]]
    )
    np.testing.assert_allclose(interp[:, :3, :3], expected_rot, atol=1e-6)
    # translations are linear interpolation of the knot translations
    knots = np.asarray(poses)[:, :3, 3]
    expected_t = np.stack(
        [
            0.5 * knots[0] + 0.5 * knots[1],
            0.5 * knots[1] + 0.5 * knots[2],
            0.75 * knots[3] + 0.25 * knots[4],
        ]
    )
    np.testing.assert_allclose(interp[:, :3, 3], expected_t, atol=1e-6)
    # clamping outside the range
    out = np.asarray(
        se3.interpolate_timestamps(poses, jnp.asarray(times), jnp.asarray([-1.0, 9.0]))
    )
    np.testing.assert_allclose(out[0], np.asarray(poses)[0], atol=1e-6)
    np.testing.assert_allclose(out[1], np.asarray(poses)[-1], atol=1e-6)


def test_normalize_reprojects(rng):
    poses = np.array(random_poses(rng, 8))
    poses[:, :3, :3] += rng.normal(size=(8, 3, 3)) * 0.01
    fixed = np.asarray(se3.normalize(jnp.asarray(poses)))
    assert np.all(np.asarray(rot.is_rotation_matrix(jnp.asarray(fixed[:, :3, :3]))))
