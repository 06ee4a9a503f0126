"""Shared neural building blocks (Flax linen), channel-last layout.

Replaces the reference's ``pointnet2_ops/pytorch_utils.py`` ``SharedMLP`` /
``Conv1d``/``Conv2d`` stacks. A 1×1 conv over ``(B, N, K, C)`` is just a Dense
on the trailing axis — exactly the layout XLA wants for MXU matmuls, with no
NCHW permutes anywhere.

``BatchNorm`` here takes **momentum as a call argument** so the trainer can
schedule it (the reference's ``BNMomentumScheduler``, ``pytorch_utils.py:319``,
decays BN momentum per epoch; flax's own BatchNorm bakes momentum into the
module, so we keep our own minimal implementation).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

xavier_init = nn.initializers.xavier_uniform()


class BatchNorm(nn.Module):
    """Per-channel batch norm over all leading axes, runtime momentum.

    Torch-convention momentum: ``running = (1-m)*running + m*batch`` with the
    reference's initial m = 0.5 decayed by the scheduler (torch BN default is
    0.1; the PWCLONet recipe schedules 0.5 → 0.01).
    """

    use_scale: bool = True
    use_bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                ra_mean.value = (1.0 - momentum) * ra_mean.value + momentum * mean
                ra_var.value = (1.0 - momentum) * ra_var.value + momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (c,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (c,))
        return y


class PointMLP(nn.Module):
    """Stack of (Dense → BN → ReLU) over the trailing channel axis.

    Equivalent to the reference ``SharedMLP`` (1×1 Conv2d + BN2d + ReLU with
    xavier init, ``pytorch_utils.py:52-113``), applied to ``(B, ..., C)``.

    ``dtype=bfloat16`` runs the matmuls on the MXU in bf16 (params stay
    f32; BatchNorm statistics are always computed in f32). Geometry stays in
    f32 upstream — only neighborhood-scale values reach these layers, where
    bf16's 8-bit mantissa is sufficient.
    """

    features: Sequence[int]
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (None = f32)

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=0.1):
        for f in self.features:
            x = nn.Dense(
                f, use_bias=not self.use_bn, kernel_init=xavier_init,
                dtype=self.dtype,
            )(x)
            if self.use_bn:
                x = BatchNorm()(
                    x.astype(jnp.float32), train=train, momentum=bn_momentum
                )
                if self.dtype is not None:
                    x = x.astype(self.dtype)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class LinearHead(nn.Module):
    """Plain linear layer (no activation, xavier) — the reference's
    ``Conv1d(activation=None)`` used in ``PoseCalculator``."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, kernel_init=xavier_init)(x)


def spatial_encoding(centers: jax.Array, grouped: jax.Array) -> jax.Array:
    """The 10-d point-pair encoding of the attentive cost volume
    (ref ``costvolume.py:99-110``): ``[p, q, q−p, ‖q−p‖]``.

    ``centers (B, S, 3)``, ``grouped (B, S, K, 3)`` → ``(B, S, K, 10)``.
    """
    p = jnp.broadcast_to(centers[:, :, None, :], grouped.shape)
    diff = grouped - p
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True) + 1e-20)
    return jnp.concatenate([p, grouped, diff, dist], axis=-1)
