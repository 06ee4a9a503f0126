"""Tests for the PoseResNet supervised + unsupervised losses."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector
from pwclonet_pylidarslam_tpu.train.posenet_losses import (
    PointToPlaneLossConfig,
    SupervisedLossConfig,
    init_supervised_loss_params,
    point_to_plane_loss,
    pose_supervision_loss,
)


def test_supervised_loss_zero_at_gt(rng):
    gt_pose = se3.exp(jnp.asarray(rng.normal(size=(4, 6)) * 0.1))
    pred = se3.pose_to_params_euler(gt_pose)
    lp = init_supervised_loss_params()
    loss, log = pose_supervision_loss(lp, pred, gt_pose)
    # at zero residual only the s terms remain
    np.testing.assert_allclose(float(log["loss_rot"]), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(log["loss_trans"]), 0.0, atol=1e-6)


def test_supervised_loss_orders_predictions(rng):
    gt_pose = se3.exp(jnp.asarray(rng.normal(size=(4, 6)) * 0.1))
    good = se3.pose_to_params_euler(gt_pose) + 0.01
    bad = se3.pose_to_params_euler(gt_pose) + 0.5
    lp = init_supervised_loss_params(SupervisedLossConfig(with_exp_weights=False))
    cfg = SupervisedLossConfig(with_exp_weights=False)
    l_good, _ = pose_supervision_loss(lp, good, gt_pose, cfg)
    l_bad, _ = pose_supervision_loss(lp, bad, gt_pose, cfg)
    assert float(l_good) < float(l_bad)


def _scene_pair(rng, motion):
    """Two vertex maps of a plane-rich scene separated by `motion` (6,)."""
    proj = SphericalProjector(height=32, width=180)
    n = 4000
    ground = np.stack(
        [rng.uniform(-30, 30, n), rng.uniform(-30, 30, n), np.full(n, -1.7)], -1
    )
    wall = np.stack(
        [rng.uniform(-30, 30, n // 4), np.full(n // 4, 10.0), rng.uniform(-1.7, 3, n // 4)], -1
    )
    wall2 = np.stack(
        [np.full(n // 4, 12.0), rng.uniform(-30, 30, n // 4), rng.uniform(-1.7, 3, n // 4)], -1
    )
    scene = np.concatenate([ground, wall, wall2]).astype(np.float32)
    pose = se3.exp(jnp.asarray(motion, jnp.float32))
    # reference frame sees scene; target frame sees scene from `pose`
    scene_in_target = np.asarray(
        se3.transform(se3.inverse(pose)[None], jnp.asarray(scene[None]))
    )[0]
    vm_ref = proj.build_projection_map(jnp.asarray(scene[None]))
    vm_tgt = proj.build_projection_map(jnp.asarray(scene_in_target[None]))
    return proj, vm_tgt, vm_ref, pose


@pytest.mark.slow
def test_point_to_plane_loss_minimized_at_true_motion(rng):
    motion = np.asarray([1.0, 0.3, 0.0, 0.0, 0.0, 0.05])
    proj, vm_tgt, vm_ref, pose = _scene_pair(rng, motion)
    true_params = se3.pose_to_params_euler(pose)[None]
    l_true = float(point_to_plane_loss(proj, vm_tgt, vm_ref, true_params))
    l_id = float(point_to_plane_loss(proj, vm_tgt, vm_ref, jnp.zeros((1, 6))))
    l_wrong = float(
        point_to_plane_loss(proj, vm_tgt, vm_ref, true_params + 0.5)
    )
    assert l_true < l_id
    assert l_true < l_wrong


@pytest.mark.slow
def test_point_to_plane_loss_differentiable(rng):
    motion = np.asarray([0.5, 0.0, 0.0, 0.0, 0.0, 0.02])
    proj, vm_tgt, vm_ref, pose = _scene_pair(rng, motion)

    g = jax.grad(
        lambda p: point_to_plane_loss(proj, vm_tgt, vm_ref, p)
    )(jnp.zeros((1, 6)))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0
    # gradient must point toward the true motion on the dominant axis (x)
    assert g[0, 0] < 0  # loss decreases as tx increases toward +0.5
