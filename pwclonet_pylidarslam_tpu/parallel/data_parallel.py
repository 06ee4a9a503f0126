"""Data-parallel training over a device mesh (GSPMD).

The train step itself is the single-device :func:`train.state.train_step` —
parallelism is purely sharding annotations: batch sharded over the ``data``
axis, state replicated, loss/grads psum'd by GSPMD. This is the idiomatic
TPU pattern (mesh + annotate + let XLA insert collectives) rather than a
hand-written all-reduce (the reference has no distributed layer at all,
SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pwclonet_pylidarslam_tpu.models import PWCLONet
from pwclonet_pylidarslam_tpu.train.state import TrainConfig, TrainState, train_step


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch with its leading axis split over ``data``."""
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    rep = NamedSharding(mesh, P())
    return jax.device_put(state, rep)


def make_parallel_train_step(
    model: PWCLONet, config: TrainConfig, mesh: Mesh
) -> Callable:
    """jit-compiled train step with data-parallel shardings.

    Returns ``step(state, batch, dropout_rng) -> (state, log)``; the batch's
    leading dim must be divisible by ``mesh.shape['data']``.
    """
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    return jax.jit(
        lambda state, batch, rng: train_step(model, config, state, batch, rng),
        in_shardings=(rep, {"xyz1": data, "xyz2": data, "gt_params": data}, rep),
        out_shardings=(rep, rep),
    )
