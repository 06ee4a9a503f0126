"""Gather / group by index — pure XLA (no custom kernels needed).

Replaces the CUDA ``gather_points`` / ``group_points`` kernels and their
handwritten atomicAdd backward passes (ref ``sampling_gpu.cu:8-57``,
``group_points_gpu.cu:8-75``): ``take_along_axis`` differentiates to a
scatter-add automatically under JAX autodiff, and XLA lowers both directions
to efficient fused gathers on TPU.

Layout note: the reference uses channel-first ``(B, C, N)``; this framework is
channel-last ``(B, N, C)`` throughout (the natural layout for XLA, whose
gathers want the indexed axis leading the contiguous feature axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """``points (B, N, C)`` gathered by ``idx (B, M)`` → ``(B, M, C)``."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """``points (B, N, C)`` grouped by ``idx (B, M, K)`` → ``(B, M, K, C)``."""
    b, m, k = idx.shape
    flat = gather_points(points, idx.reshape(b, m * k))
    return flat.reshape(b, m, k, points.shape[-1])
