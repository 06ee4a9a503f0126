"""Train state + jitted steps for the PointNet++ cls/semseg model family.

The training recipe of the reference's vendored upstream package
(``Pointnet2_PyTorch/pointnet2/models/pointnet2_ssg_cls.py:161-194`` and
``config/task/{cls,semseg}.yaml``): Adam with a staircase LR decay
``lr·lr_decay^⌊examples/decay_step⌋`` clipped at ``lr_clip=1e-5``, and a
matching BN-momentum staircase ``bn_momentum·bnm_decay^⌊examples/decay_step⌋``
clipped at ``bnm_clip=1e-2`` (its ``BNMomentumScheduler``). Both schedules are
keyed by *examples seen* (the upstream multiplies global_step by batch_size),
so the schedule is batch-size invariant.

TPU-native re-design: the whole step (forward, softmax CE, backward, Adam,
BN-stat update, schedule evaluation) is one jitted function; the BN momentum
is threaded to the model as a traced call argument (see ``models/layers.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

LR_CLIP = 1e-5  # ref pointnet2_ssg_cls.py:51
BNM_CLIP = 1e-2  # ref pointnet2_ssg_cls.py:52


@dataclasses.dataclass(frozen=True)
class ClsSegTrainConfig:
    # cls.yaml defaults; semseg.yaml uses lr_decay=0.5, decay_step=3e5
    learning_rate: float = 1e-3
    lr_decay: float = 0.7
    decay_step: float = 2e4  # in examples seen
    weight_decay: float = 0.0
    bn_momentum: float = 0.5
    bnm_decay: float = 0.5
    batch_size: int = 32


def lr_at(config: ClsSegTrainConfig, examples_seen) -> jax.Array:
    """Staircase LR (ref ``configure_optimizers`` lr_lbmd)."""
    k = jnp.floor(examples_seen / config.decay_step)
    return jnp.maximum(config.learning_rate * config.lr_decay**k, LR_CLIP)


def bn_momentum_at(config: ClsSegTrainConfig, examples_seen) -> jax.Array:
    """Staircase BN momentum (ref ``BNMomentumScheduler`` bn_lbmd)."""
    k = jnp.floor(examples_seen / config.decay_step)
    return jnp.maximum(config.bn_momentum * config.bnm_decay**k, BNM_CLIP)


class ClsSegTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(config: ClsSegTrainConfig):
    def schedule(step):
        return lr_at(config, step * config.batch_size)

    if config.weight_decay > 0:
        return optax.adamw(schedule, weight_decay=config.weight_decay)
    return optax.adam(schedule)


def _split_inputs(points: jax.Array) -> Tuple[jax.Array, Any]:
    """(B, N, C) → xyz (B, N, 3) + extra features (or None) — the upstream
    ``break up pc`` convention (xyz first three channels)."""
    xyz = points[..., :3]
    features = points[..., 3:] if points.shape[-1] > 3 else None
    return xyz, features


def create_cls_seg_state(
    model, config: ClsSegTrainConfig, rng: jax.Array, example_points: jax.Array
) -> ClsSegTrainState:
    xyz, features = _split_inputs(jnp.asarray(example_points))
    variables = model.init(
        {"params": rng, "dropout": rng}, xyz, features, train=False
    )
    opt = make_optimizer(config)
    return ClsSegTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _ce_and_accuracy(logits: jax.Array, labels: jax.Array):
    """Cross entropy + accuracy; works for (B, C) cls and (B, N, C) semseg."""
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = jnp.mean(jnp.argmax(logits, -1) == labels)
    return loss, acc


def cls_seg_train_step(
    model,
    config: ClsSegTrainConfig,
    state: ClsSegTrainState,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
) -> Tuple[ClsSegTrainState, Dict[str, jax.Array]]:
    """One SGD step; jit as ``jax.jit(cls_seg_train_step, static_argnums=(0, 1))``."""
    opt = make_optimizer(config)
    xyz, features = _split_inputs(batch["points"])
    bn_momentum = bn_momentum_at(config, state.step * config.batch_size)

    def loss_fn(params):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            xyz,
            features,
            train=True,
            bn_momentum=bn_momentum,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        loss, acc = _ce_and_accuracy(logits, batch["labels"])
        return loss, (mutated["batch_stats"], acc)

    (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = ClsSegTrainState(new_params, new_bs, new_opt, state.step + 1)
    log = {
        "loss": loss,
        "accuracy": acc,
        "lr": lr_at(config, state.step * config.batch_size),
        "bn_momentum": bn_momentum,
    }
    return new_state, log


def cls_seg_eval_step(
    model, state: ClsSegTrainState, batch: Dict[str, jax.Array]
) -> Dict[str, jax.Array]:
    """Forward with running BN stats (upstream validation_step)."""
    xyz, features = _split_inputs(batch["points"])
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        xyz,
        features,
        train=False,
    )
    loss, acc = _ce_and_accuracy(logits, batch["labels"])
    return {"loss": loss, "accuracy": acc}
