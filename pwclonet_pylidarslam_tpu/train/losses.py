"""PWCLO-Net supervised multi-level loss with learned uncertainty weighting.

Functional port of ``_PWCLONetLossModule`` (ref ``slam/training/loss_modules.py:329-544``):

- rotation loss per level: ``mean ‖q̂/‖q̂‖ − q_gt‖₂`` (l2_norm, ref :367-370);
- translation loss per level: ``mean √((t̂−t_gt)² + 1e-10)`` element-wise
  (ref ``__trans_loss:384``);
- learned exponential weights shared across levels:
  ``L = l_t·e^{−s_t} + s_t + l_q·e^{−s_q} + s_q`` with init ``(s_t, s_q) =
  (0, −2.5)`` (ref ``ExponentialWeights:147``, init ``train.py:316``);
- total: ``1.6·L4 + 0.8·L3 + 0.4·L2 + 0.2·L1`` with level 1 = finest
  (ref ``:532``).

The two ``s`` parameters live in the train state alongside the network params
(the reference optimizes loss-module parameters jointly, ``trainer.py:311-327``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

LEVEL_WEIGHTS = (0.2, 0.4, 0.8, 1.6)  # levels 1..4 (fine → coarse)


@dataclasses.dataclass(frozen=True)
class PWCLONetLossConfig:
    with_exp_weights: bool = True
    init_weights: Tuple[float, float] = (0.0, -2.5)  # (s_trans, s_rot)
    fixed_weights: Tuple[float, float] = (1.0, 100.0)  # if not exp-weighted


def init_loss_params(config: PWCLONetLossConfig = PWCLONetLossConfig()):
    return {"s_param": jnp.asarray(config.init_weights, jnp.float32)}


def _rot_loss(q_pred: jax.Array, q_gt: jax.Array) -> jax.Array:
    qn = q_pred / (
        jnp.sqrt(jnp.sum(q_pred * q_pred, axis=-1, keepdims=True) + 1e-10) + 1e-10
    )
    return jnp.mean(jnp.sqrt(jnp.sum((qn - q_gt) ** 2, axis=-1) + 1e-10))


def _trans_loss(t_pred: jax.Array, t_gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sqrt((t_pred - t_gt) ** 2 + 1e-10))


def pwclonet_loss(
    loss_params: Dict,
    pred_params: jax.Array,
    gt_params: jax.Array,
    config: PWCLONetLossConfig = PWCLONetLossConfig(),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """``pred_params (B, 4, 7)`` (level-major, index 0 = finest),
    ``gt_params (B, 7)`` = (t, q_wxyz). Returns (scalar loss, log dict)."""
    t_gt, q_gt = gt_params[:, :3], gt_params[:, 3:]
    log = {}
    total = 0.0
    for lvl in range(4):
        t_pred = pred_params[:, lvl, :3]
        q_pred = pred_params[:, lvl, 3:]
        lt = _trans_loss(t_pred, t_gt)
        lq = _rot_loss(q_pred, q_gt)
        if config.with_exp_weights:
            s = loss_params["s_param"]
            level_loss = lt * jnp.exp(-s[0]) + s[0] + lq * jnp.exp(-s[1]) + s[1]
        else:
            w = config.fixed_weights
            level_loss = lt * w[0] + lq * w[1]
        total = total + LEVEL_WEIGHTS[lvl] * level_loss
        log[f"loss_trans_l{lvl + 1}"] = lt
        log[f"loss_rot_l{lvl + 1}"] = lq
        log[f"loss_l{lvl + 1}"] = level_loss
    log["loss"] = total
    if config.with_exp_weights:
        log["s_param_trans"] = loss_params["s_param"][0]
        log["s_param_rot"] = loss_params["s_param"][1]
    return total, log
