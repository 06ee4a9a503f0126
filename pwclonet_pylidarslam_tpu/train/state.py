"""Train state + jitted train/eval steps for PWCLO-Net.

Replaces the reference's ``ATrainer`` device/optimizer plumbing
(``slam/training/trainer.py:247-342``) with a functional optax/flax setup:

- one ``TrainState`` pytree: network params, batch stats, loss params
  (learned exponential weights), optimizer state, step counter;
- Adam over network + loss params jointly (ref ``_load_optimizer:311-327``);
- cosine LR 1e-3 → 1e-6 over the full run (ref ``train.py:309-317`` /
  ``config/train_pwclonet.yaml``) or the custom exponential-clip alternative;
- BN momentum schedule 0.5 → 0.01 halving every ``bn_decay_step`` epochs
  (ref ``BNMomentumScheduler`` semantics, ``train.py:320-323``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pwclonet_pylidarslam_tpu.models import PWCLONet, PWCLONetConfig
from pwclonet_pylidarslam_tpu.train.losses import (
    PWCLONetLossConfig,
    init_loss_params,
    pwclonet_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: PWCLONetConfig = PWCLONetConfig()
    loss: PWCLONetLossConfig = PWCLONetLossConfig()
    learning_rate: float = 1e-3
    lr_min: float = 1e-6
    total_steps: int = 100_000  # for the cosine schedule
    # linear warmup to learning_rate over this many steps (0 = plain cosine,
    # the reference recipe). Short-horizon runs (the bench's in-budget
    # training leg) use a warmup so a higher peak LR stays stable.
    warmup_steps: int = 0
    weight_decay: float = 0.0
    bn_momentum_init: float = 0.5
    bn_momentum_decay: float = 0.5
    bn_decay_steps: int = 10_000  # steps between BN momentum halvings
    bn_momentum_min: float = 0.01


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    loss_params: Any
    opt_state: Any
    step: jax.Array


def make_schedules(config: TrainConfig):
    if config.warmup_steps > 0:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=config.learning_rate * 0.01,
            peak_value=config.learning_rate,
            warmup_steps=config.warmup_steps,
            decay_steps=config.total_steps,
            end_value=config.lr_min,
        )
    else:
        lr = optax.cosine_decay_schedule(
            config.learning_rate, config.total_steps,
            alpha=config.lr_min / config.learning_rate,
        )

    def bn_momentum(step):
        m = config.bn_momentum_init * (
            config.bn_momentum_decay ** (step // config.bn_decay_steps)
        )
        return jnp.maximum(m, config.bn_momentum_min)

    return lr, bn_momentum


def make_optimizer(config: TrainConfig):
    lr, _ = make_schedules(config)
    if config.weight_decay > 0:
        return optax.adamw(lr, weight_decay=config.weight_decay)
    return optax.adam(lr)


def create_train_state(config: TrainConfig, rng: jax.Array) -> Tuple[PWCLONet, TrainState]:
    model = PWCLONet(config.model)
    n = config.model.num_points
    dummy = jnp.zeros((1, n, 3), jnp.float32)
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng}, dummy, dummy, train=False
    )
    loss_params = init_loss_params(config.loss)
    trainable = {"net": variables["params"], "loss": loss_params}
    opt = make_optimizer(config)
    return model, TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        loss_params=loss_params,
        opt_state=opt.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def train_step(
    model: PWCLONet,
    config: TrainConfig,
    state: TrainState,
    batch: Dict[str, jax.Array],
    dropout_rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One SGD step. ``batch``: ``{"xyz1": (B,N,3), "xyz2": (B,N,3),
    "gt_params": (B,7)}`` with gt = (t, q_wxyz) mapping frame1 → frame2.

    jit as ``jax.jit(train_step, static_argnums=(0, 1))``.
    """
    _, bn_momentum_fn = make_schedules(config)
    bn_m = bn_momentum_fn(state.step)
    opt = make_optimizer(config)

    def loss_fn(trainable):
        (pred, _aux), mutated = model.apply(
            {"params": trainable["net"], "batch_stats": state.batch_stats},
            batch["xyz1"],
            batch["xyz2"],
            train=True,
            bn_momentum=bn_m,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        loss, log = pwclonet_loss(trainable["loss"], pred, batch["gt_params"], config.loss)
        return loss, (mutated["batch_stats"], log)

    trainable = {"net": state.params, "loss": state.loss_params}
    grads, (new_bs, log) = jax.grad(loss_fn, has_aux=True)(trainable)
    updates, new_opt = opt.update(grads, state.opt_state, trainable)
    new_trainable = optax.apply_updates(trainable, updates)

    # NaN-loss guard (ref trainer.py:614-631): skip the update entirely
    finite = jnp.isfinite(log["loss"])
    new_state = TrainState(
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


def train_steps(
    model: PWCLONet,
    config: TrainConfig,
    state: TrainState,
    batch_block: Dict[str, jax.Array],
    rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """K train steps in ONE device dispatch via ``lax.scan``.

    ``batch_block`` carries ``(K, B, ...)`` arrays — K host batches stacked
    along a leading scan axis. On a network-attached TPU the per-dispatch
    host round trip (~60 ms upload + sync) dominates a single ~10 ms step;
    scanning K steps amortizes it K-fold, the same trick the SLAM path uses
    in ``icp_odometry.process_sequence``. Returns the advanced state and
    per-step logs stacked ``(K,)``. jit with ``donate_argnums`` on the state
    (the trainer and ``bench.py`` both do).

    This is the measured training hot loop (ref
    ``slam/training/trainer.py:546-676`` iterates batches host-side; here the
    iteration itself lives on device).
    """
    k = jax.tree.leaves(batch_block)[0].shape[0]
    rngs = jax.random.split(rng, k)

    def body(s, inp):
        batch, step_rng = inp
        return train_step(model, config, s, batch, step_rng)

    return jax.lax.scan(body, state, (batch_block, rngs))


def estimate_batch_stats(
    model: PWCLONet,
    state: TrainState,
    batch_block: Dict[str, jax.Array],
    rng: jax.Array,
) -> TrainState:
    """Re-estimate BN running statistics over ``batch_block`` ``(K, B, ...)``
    with frozen weights — ONE device dispatch (``lax.scan``).

    A short-horizon run never anneals its BN momentum schedule, so the
    running stats that ``train=False`` inference uses are an EMA over the
    last ~1/momentum batches — noisy and biased toward the final shuffled
    (augmented) batches. This computes the true population statistics the
    reference's 300-epoch annealed EMA converges to, directly: forward each
    batch in train mode (no gradient), folding batch k in with momentum
    ``1/(k+1)`` (arithmetic mean of per-batch statistics). jit with
    ``static_argnums=0``-style closure like ``train_steps``.
    """
    k = jax.tree.leaves(batch_block)[0].shape[0]
    rngs = jax.random.split(rng, k)

    def body(carry, inp):
        bs, i = carry
        batch, step_rng = inp
        _, mutated = model.apply(
            {"params": state.params, "batch_stats": bs},
            batch["xyz1"],
            batch["xyz2"],
            train=True,
            bn_momentum=1.0 / (i + 1.0),
            rngs={"dropout": step_rng},
            mutable=["batch_stats"],
        )
        return (mutated["batch_stats"], i + 1.0), None

    (new_bs, _), _ = jax.lax.scan(
        body, (state.batch_stats, jnp.float32(0.0)), (batch_block, rngs)
    )
    return state._replace(batch_stats=new_bs)


def eval_step(
    model: PWCLONet,
    config: TrainConfig,
    state: TrainState,
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Forward + loss with running BN stats, no dropout (ref ``evaluate_epoch``)."""
    pred, _aux = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["xyz1"],
        batch["xyz2"],
        train=False,
    )
    loss, log = pwclonet_loss(state.loss_params, pred, batch["gt_params"], config.loss)
    return pred, log
