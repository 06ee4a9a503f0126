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

    ``maxpool=True`` appends the set-conv max over the neighborhood axis
    (``-2``). In eval mode, ``fused=True`` additionally folds each BN into
    its matmul and runs the whole (MLP → max-pool) block as ONE Pallas
    kernel with all intermediates in VMEM (``ops/pallas/mlp_kernel.py``);
    the train path and the CPU oracle keep this unfused graph. Params are
    owned by this module (not child Dense/BatchNorm modules) so the fold
    can read them directly.
    """

    features: Sequence[int]
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (None = f32)
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=0.1, maxpool: bool = False,
                 fused: bool = False, fold_only: bool = False):
        layers = []
        cin = x.shape[-1]
        for i, f in enumerate(self.features):
            kernel = self.param(f"kernel_{i}", xavier_init, (cin, f))
            if self.use_bn:
                scale = self.param(f"scale_{i}", nn.initializers.ones, (f,))
                bias = self.param(f"bias_{i}", nn.initializers.zeros, (f,))
                mean = self.variable("batch_stats", f"mean_{i}", lambda f=f: jnp.zeros(f))
                var = self.variable("batch_stats", f"var_{i}", lambda f=f: jnp.ones(f))
                layers.append((kernel, scale, bias, mean, var))
            else:
                bias = self.param(f"bias_{i}", nn.initializers.zeros, (f,))
                layers.append((kernel, None, bias, None, None))
            cin = f

        if fold_only:
            # create the params (identical variable tree to a normal call) and
            # return the BN-folded (weights, biases) for an external fused
            # kernel — no compute. Only valid in eval mode with BN.
            assert self.use_bn, "fold_only requires use_bn"
            from pwclonet_pylidarslam_tpu.ops.pallas.mlp_kernel import fold_bn

            ws, bs = [], []
            for kernel, scale, bias, mean, var in layers:
                w_f, b_f = fold_bn(kernel, scale, bias, mean.value, var.value, self.eps)
                ws.append(w_f)
                bs.append(b_f)
            return tuple(ws), tuple(bs)

        if (
            fused and maxpool and not train and self.use_bn and x.ndim == 4
            and not self.is_initializing()
        ):
            from pwclonet_pylidarslam_tpu.ops.pallas.mlp_kernel import (
                fold_bn,
                mlp_maxpool_pallas,
            )

            ws, bs = [], []
            for kernel, scale, bias, mean, var in layers:
                w_f, b_f = fold_bn(kernel, scale, bias, mean.value, var.value, self.eps)
                ws.append(w_f)
                bs.append(b_f)
            return mlp_maxpool_pallas(x.astype(jnp.float32), tuple(ws), tuple(bs))

        for kernel, scale, bias, mean, var in layers:
            if self.dtype is not None:
                h = jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype))
            else:
                h = jnp.matmul(x, kernel)
            if self.use_bn:
                h = h.astype(jnp.float32)
                if train:
                    axes = tuple(range(h.ndim - 1))
                    m = jnp.mean(h, axis=axes)
                    v = jnp.var(h, axis=axes)
                    if not self.is_initializing():
                        mean.value = (1.0 - bn_momentum) * mean.value + bn_momentum * m
                        var.value = (1.0 - bn_momentum) * var.value + bn_momentum * v
                else:
                    m, v = mean.value, var.value
                h = (h - m) * jax.lax.rsqrt(v + self.eps) * scale + bias
                if self.dtype is not None:
                    h = h.astype(self.dtype)
            else:
                h = h + bias.astype(h.dtype)
            x = nn.relu(h)
        x = x.astype(jnp.float32)
        if maxpool:
            x = jnp.max(x, axis=-2)
        return x


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
