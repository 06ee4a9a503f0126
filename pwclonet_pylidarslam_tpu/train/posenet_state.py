"""Train state + jitted train/eval steps for PoseResNet odometry.

Port of the reference's ``PoseNetTrainer`` plumbing (``train.py:77-143``):

- supervised pose regression OR unsupervised point-to-plane loss selection
  (ref ``train.py:122-130`` choosing ``_PoseSupervisionLossModule`` vs
  ``_PointToPlaneLossModule``);
- Adam over network (+ learned loss weights when supervised with exponential
  weighting) — ref ``ATrainer._load_optimizer:311-327``;
- MultiStepLR schedule (ref ``train.py:132-137``) expressed as an optax
  ``piecewise_constant_schedule`` over steps;
- the same in-graph NaN-skip guard as the PWCLO-Net step
  (ref trainer.py:614-631).

Batch contract: ``{"vm1": (B, H, W, 3) current/target vertex map,
"vm2": (B, H, W, 3) previous/reference vertex map, "gt_pose": (B, 4, 4)}``
where ``gt_pose`` maps frame-1 (current) coordinates into frame-2 (previous)
coordinates — the network input stacking matches
``slam/deep_odometry.py::PoseNetOdometry`` (current first), and the
prediction is ``(t, euler-xyz)`` like ref ``posenet.py:60-77``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector
from pwclonet_pylidarslam_tpu.models.posenet import PoseResNet, PoseResNetConfig
from pwclonet_pylidarslam_tpu.train.posenet_losses import (
    PointToPlaneLossConfig,
    SupervisedLossConfig,
    init_supervised_loss_params,
    point_to_plane_loss,
    pose_supervision_loss,
)


@dataclasses.dataclass(frozen=True)
class PoseNetTrainConfig:
    model: PoseResNetConfig = PoseResNetConfig()
    loss: str = "supervised"  # supervised | unsupervised (ref train.py:122-130)
    supervised: SupervisedLossConfig = SupervisedLossConfig()
    unsupervised: PointToPlaneLossConfig = PointToPlaneLossConfig()
    projector: SphericalProjector = SphericalProjector()  # unsupervised re-projection
    learning_rate: float = 1e-4
    lr_milestones: Tuple[int, ...] = (20_000, 40_000)  # steps (ref MultiStepLR)
    lr_gamma: float = 0.5
    weight_decay: float = 0.0


class PoseNetTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    loss_params: Any
    opt_state: Any
    step: jax.Array


def make_lr_schedule(config: PoseNetTrainConfig):
    return optax.piecewise_constant_schedule(
        config.learning_rate,
        {int(m): config.lr_gamma for m in config.lr_milestones},
    )


def make_optimizer(config: PoseNetTrainConfig):
    lr = make_lr_schedule(config)
    if config.weight_decay > 0:
        return optax.adamw(lr, weight_decay=config.weight_decay)
    return optax.adam(lr)


def _stack_frames(batch: Dict[str, jax.Array]) -> jax.Array:
    """Frame stack ``(B, S, H, W, 3)`` — pair batches (``vm1``/``vm2``,
    current first, mirroring PoseNetOdometry's input layout) or window
    batches (``frames`` already stacked newest-first by
    ``data.vm_pairs.VertexMapWindowDataset``)."""
    if "frames" in batch:
        return batch["frames"]
    return jnp.stack([batch["vm1"], batch["vm2"]], axis=1)  # (B, 2, H, W, 3)


def _gt_poses(batch: Dict[str, jax.Array]) -> jax.Array:
    """GT relative poses ``(B, P, 4, 4)``, one per consecutive frame pair."""
    if "gt_poses" in batch:
        return batch["gt_poses"]
    return batch["gt_pose"][:, None]


def create_posenet_train_state(
    config: PoseNetTrainConfig, rng: jax.Array, vm_shape: Tuple[int, int] = (64, 720)
) -> Tuple[PoseResNet, PoseNetTrainState]:
    model = PoseResNet(config.model)
    if config.model.num_out_poses != config.model.sequence_len - 1:
        raise ValueError(
            "windowed training regresses one pose per consecutive frame pair: "
            f"num_out_poses must be sequence_len-1, got "
            f"{config.model.num_out_poses} vs sequence_len={config.model.sequence_len}"
        )
    h, w = vm_shape
    dummy = jnp.zeros((1, config.model.sequence_len, h, w, 3), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    loss_params = (
        init_supervised_loss_params(config.supervised)
        if config.loss == "supervised" and config.supervised.with_exp_weights
        else {}
    )
    trainable = {"net": variables["params"], "loss": loss_params}
    opt = make_optimizer(config)
    return model, PoseNetTrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        loss_params=loss_params,
        opt_state=opt.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def _loss_and_log(
    config: PoseNetTrainConfig,
    loss_params: Dict,
    pred_params: jax.Array,
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """``pred_params (B, P, 6)``: one (t, euler) per consecutive frame pair
    of the window (P = sequence_len − 1; P = 1 for pair batches)."""
    b, p = pred_params.shape[:2]
    if config.loss == "supervised":
        # fold the pose axis into the batch: the loss is a batch mean, so
        # this averages over the window's P relative poses
        gt = _gt_poses(batch)
        return pose_supervision_loss(
            loss_params,
            pred_params.reshape(b * p, 6),
            gt.reshape(b * p, 4, 4),
            config.supervised,
        )
    frames = _stack_frames(batch)
    # unsupervised: re-projection point-to-plane per consecutive pair
    # (frames[k] = target/current, frames[k+1] = reference/previous)
    losses = [
        point_to_plane_loss(
            config.projector,
            frames[:, k],
            frames[:, k + 1],
            pred_params[:, k],
            config=config.unsupervised,
        )
        for k in range(p)
    ]
    loss = jnp.mean(jnp.stack(losses))
    return loss, {"loss": loss}


def posenet_train_step(
    model: PoseResNet,
    config: PoseNetTrainConfig,
    state: PoseNetTrainState,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
) -> Tuple[PoseNetTrainState, Dict[str, jax.Array]]:
    """One SGD step; jit as ``jax.jit(posenet_train_step, static_argnums=(0, 1))``."""
    del rng  # PoseResNet has no dropout (ref posenet.py)
    opt = make_optimizer(config)
    frames = _stack_frames(batch)

    def loss_fn(trainable):
        pred, mutated = model.apply(
            {"params": trainable["net"], "batch_stats": state.batch_stats},
            frames,
            train=True,
            mutable=["batch_stats"],
        )
        loss, log = _loss_and_log(config, trainable["loss"], pred, batch)
        return loss, (mutated["batch_stats"], log)

    trainable = {"net": state.params, "loss": state.loss_params}
    grads, (new_bs, log) = jax.grad(loss_fn, has_aux=True)(trainable)
    updates, new_opt = opt.update(grads, state.opt_state, trainable)
    new_trainable = optax.apply_updates(trainable, updates)

    # NaN-loss guard (ref trainer.py:614-631): skip the update entirely
    finite = jnp.isfinite(log["loss"])
    new_state = PoseNetTrainState(
        params=jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_trainable["net"], state.params
        ),
        batch_stats=jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_bs, state.batch_stats
        ),
        loss_params=jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_trainable["loss"], state.loss_params,
        ),
        opt_state=jax.tree.map(
            lambda new, old: jnp.where(finite, new, old) if isinstance(new, jnp.ndarray) else new,
            new_opt, state.opt_state,
        ),
        step=state.step + 1,
    )
    log["grad_norm"] = optax.global_norm(grads)
    log["skipped_nonfinite"] = jnp.logical_not(finite)
    return new_state, log


def posenet_train_steps(
    model: PoseResNet,
    config: PoseNetTrainConfig,
    state: PoseNetTrainState,
    batch_block: Dict[str, jax.Array],
    rng: jax.Array,
) -> Tuple[PoseNetTrainState, Dict[str, jax.Array]]:
    """K train steps in one dispatch (``lax.scan`` over ``(K, B, ...)``
    batch blocks) — see ``train/state.py::train_steps`` for rationale."""
    k = jax.tree.leaves(batch_block)[0].shape[0]
    rngs = jax.random.split(rng, k)

    def body(s, inp):
        batch, step_rng = inp
        return posenet_train_step(model, config, s, batch, step_rng)

    return jax.lax.scan(body, state, (batch_block, rngs))


def posenet_eval_step(
    model: PoseResNet,
    config: PoseNetTrainConfig,
    state: PoseNetTrainState,
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Forward + loss with running BN stats (ref ``evaluate_epoch``).
    Returns ``(B, P, 6)`` predictions (P = 1 for pair batches)."""
    pred = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        _stack_frames(batch),
        train=False,
    )
    _, log = _loss_and_log(config, state.loss_params, pred, batch)
    return pred, log
