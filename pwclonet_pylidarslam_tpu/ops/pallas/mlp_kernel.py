"""Pallas TPU kernel: fused shared-MLP + neighborhood max-pool.

The set-conv feature extractors (ref ``pointnet2_modules.py:237-243``: 1x1
conv stack + max over the neighborhood axis) are, per layer, a ``(B,S,K,C)``
matmul followed by BN + ReLU and a final max over K. In eval mode the batch
norm folds into the matmul, so the whole block collapses to

    out[b,s,:] = max_k relu( ... relu(x[b,s,k,:] @ W0' + b0') ... @ WL' + bL')

This kernel runs that collapsed block in ONE Mosaic program per (batch,
center-tile): the neighborhood tensor is loaded once, every MLP intermediate
lives in VMEM (never HBM), the matmuls ride the MXU, and only the pooled
``(S, C_out)`` result is written back. The train path keeps the unfused flax
graph (batch statistics need the full pre-activation tensor).

Used by ``models.layers.PointMLP(fused=True)`` — enabled for SLAM inference
via ``PWCLONetConfig(fused_eval=True)``. Golden-tested against the unfused
path in ``tests/test_pallas_kernels.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BUDGET = 2048  # rows (= centers x neighbors) per tile; 2048xC f32 << VMEM


def _make_kernel(n_layers: int, s_tile: int, k: int):
    def kernel(*refs):
        x_ref = refs[0]
        out_ref = refs[1 + 2 * n_layers]
        h = x_ref[:]  # (s_tile*k, c_in)
        for layer in range(n_layers):
            w = refs[1 + 2 * layer][:]
            b = refs[2 + 2 * layer][:]
            # HIGHEST: full-f32 accumulation (the platform default is a
            # bf16-pass matmul; the distance/feature channels are small so
            # the extra passes are free next to the HBM savings)
            h = (
                jnp.dot(
                    h, w,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + b
            )
            h = jnp.maximum(h, 0.0)
        h = h.reshape(s_tile, k, h.shape[-1])
        out_ref[:] = jnp.max(h, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_maxpool_pallas(
    x: jax.Array,
    weights: Tuple[jax.Array, ...],
    biases: Tuple[jax.Array, ...],
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``x (B,S,K,Cin)`` -> ``max_K relu-MLP(x) (B,S,Cout)``.

    ``weights[i] (C_i, C_{i+1})``, ``biases[i] (C_{i+1},)`` — BN already
    folded (eval mode). ``interpret=None`` auto-selects the Pallas
    interpreter off-TPU (CPU tests) and compiled Mosaic on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, k, cin = x.shape
    n_layers = len(weights)
    assert len(biases) == n_layers and n_layers >= 1
    cout = weights[-1].shape[-1]

    s_tile = max(1, min(s, _ROW_BUDGET // k))
    if s_tile < s:
        # partial tiles must have sublane-aligned block shapes (multiple of
        # 8); a tile equal to the full dimension is exempt
        s_tile = max(8, s_tile // 8 * 8)
    pad_s = (-s) % s_tile
    if pad_s:
        x = jnp.pad(x, ((0, 0), (0, pad_s), (0, 0), (0, 0)))
    s_pad = s + pad_s
    n_tiles = s_pad // s_tile

    x_rows = x.reshape(b, s_pad * k, cin)
    wb = []
    in_specs = [
        pl.BlockSpec((None, s_tile * k, cin), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    ]
    for w, bia in zip(weights, biases):
        wb.append(w.astype(jnp.float32))
        wb.append(bia.astype(jnp.float32).reshape(1, -1))
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, bia.shape[-1]), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        _make_kernel(n_layers, s_tile, k),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, s_tile, cout), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, cout), jnp.float32),
        interpret=interpret,
    )(x_rows.astype(jnp.float32), *wb)
    return out[:, :s]


def fold_bn(
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Fold an eval-mode batch norm into the preceding (bias-free) matmul:
    ``BN(x@W) = x @ (W*g) + (bias - mean*g)`` with ``g = scale/sqrt(var+eps)``."""
    g = scale * jax.lax.rsqrt(var + eps)
    return kernel * g[None, :], bias - mean * g
