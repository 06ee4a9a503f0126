"""PoseResNet losses: supervised pose regression + unsupervised point-to-plane.

Ports of the remaining reference loss modules (``slam/training/loss_modules.py``):
- ``_PoseSupervisionLossModule`` (``:224-300``): l1/l2 on (t, euler-degrees)
  with optional learned exponential weighting;
- ``_PointToPlaneLossModule`` (``:51-142``): unsupervised — re-project the
  transformed target vertex map and penalize the point-to-plane residual
  against the reference vertex/normal maps. Fully differentiable through the
  deterministic z-buffer (the scatter-min winner selection is a hard argmin;
  gradients flow through the winning points' coordinates, like the
  reference's sorted-scatter).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pwclonet_pylidarslam_tpu.core import optimization as opt, se3
from pwclonet_pylidarslam_tpu.core.geometry import compute_normal_map
from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector, vmap_to_points


@dataclasses.dataclass(frozen=True)
class SupervisedLossConfig:
    loss_option: str = "l1"  # l1 | l2
    degrees: bool = True  # compare rotations in euler degrees (ref default)
    with_exp_weights: bool = True
    init_weights: Tuple[float, float] = (0.0, -3.0)
    fixed_weights: Tuple[float, float] = (1.0, 1.0)


def init_supervised_loss_params(config: SupervisedLossConfig = SupervisedLossConfig()):
    return {"s_param": jnp.asarray(config.init_weights, jnp.float32)}


def pose_supervision_loss(
    loss_params: Dict,
    pred_params: jax.Array,
    gt_pose: jax.Array,
    config: SupervisedLossConfig = SupervisedLossConfig(),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """``pred_params (B, 6)`` = (t, euler) vs GT matrices ``(B, 4, 4)``."""

    def _loss(x, y):
        if config.loss_option == "l1":
            return jnp.mean(jnp.sum(jnp.abs(x - y), axis=-1))
        return jnp.mean(jnp.sum((x - y) ** 2, axis=-1))

    gt_params = se3.pose_to_params_euler(gt_pose)
    scale = 180.0 / jnp.pi if config.degrees else 1.0
    loss_rot = _loss(pred_params[:, 3:] * scale, gt_params[:, 3:] * scale)
    loss_trans = _loss(pred_params[:, :3], gt_params[:, :3])
    log = {"loss_rot": loss_rot, "loss_trans": loss_trans}
    if config.with_exp_weights:
        s = loss_params["s_param"]
        loss = loss_trans * jnp.exp(-s[0]) + s[0] + loss_rot * jnp.exp(-s[1]) + s[1]
        log["s_param_trans"] = s[0]
        log["s_param_rot"] = s[1]
    else:
        w = config.fixed_weights
        loss = loss_trans * w[0] + loss_rot * w[1]
    log["loss"] = loss
    return loss, log


@dataclasses.dataclass(frozen=True)
class PointToPlaneLossConfig:
    scheme: str = "geman_mcclure"
    sigma: float = 0.5
    normal_kernel_size: int = 5


def point_to_plane_loss(
    projector: SphericalProjector,
    vm_target: jax.Array,
    vm_reference: jax.Array,
    pred_params: jax.Array,
    nm_reference: Optional[jax.Array] = None,
    config: PointToPlaneLossConfig = PointToPlaneLossConfig(),
) -> jax.Array:
    """Unsupervised ICP-style loss (ref ``point_to_plane_loss:63-117``).

    ``vm_target/vm_reference (B, H, W, 3)`` consecutive vertex maps,
    ``pred_params (B, 6)`` = predicted (t, euler) mapping target → reference.
    Transform the target points, re-project into the grid, and penalize the
    per-pixel point-to-plane residual against the reference map.
    """
    if nm_reference is None:
        nm_reference = compute_normal_map(vm_reference, config.normal_kernel_size)
    pose = se3.params_to_pose_euler(pred_params)
    tgt_pts, tgt_mask = vmap_to_points(vm_target)
    transformed = se3.transform(pose, tgt_pts) * tgt_mask[..., None]
    vm_transformed = jax.vmap(projector.build_projection_map)(transformed[:, None])[:, 0]

    pc_t, m_t = vmap_to_points(vm_transformed)
    pc_r, m_r = vmap_to_points(vm_reference)
    nm_r, m_n = vmap_to_points(nm_reference)
    mask = m_t * m_r * m_n
    residuals = mask * jnp.abs(jnp.sum((pc_r - pc_t) * nm_r, axis=-1))
    cost = opt.robust_cost(residuals, config.scheme, config.sigma)
    return jnp.mean(jnp.sum(cost * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1.0))
