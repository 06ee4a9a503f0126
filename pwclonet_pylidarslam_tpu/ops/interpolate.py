"""Three-NN inverse-distance feature interpolation.

Replaces the CUDA ``three_nn`` / ``three_interpolate`` kernels and their
atomicAdd backward (ref ``interpolate_gpu.cu:9-154``): top-3 of the tiled kNN
plus a weighted gather. The backward pass falls out of autodiff (gather ↔
scatter-add), matching the handwritten CUDA gradient.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pwclonet_pylidarslam_tpu.ops.gather import group_points
from pwclonet_pylidarslam_tpu.ops.knn import knn


def three_nn(
    unknown: jax.Array,
    known: jax.Array,
    known_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """3 nearest ``known (B,M,3)`` for each ``unknown (B,N,3)``.

    Returns ``(sqdists (B,N,3), idx (B,N,3))`` — note: *squared* distances
    (the CUDA kernel also works in squared space, ``interpolate_gpu.cu:25``).
    """
    return knn(unknown, known, 3, ref_mask=known_mask)


def three_interpolate(
    features: jax.Array,
    idx: jax.Array,
    sqdist: jax.Array,
    eps: float = 1e-8,
) -> jax.Array:
    """Inverse-distance weighted interpolation.

    ``features (B, M, C)``, ``idx (B, N, 3)``, ``sqdist (B, N, 3)`` →
    ``(B, N, C)``. Weights ``wᵢ = (1/dᵢ) / Σⱼ 1/dⱼ`` exactly as the CUDA
    kernel (``interpolate_gpu.cu:36-41``, eps 1e-8).
    """
    recip = 1.0 / (sqdist + eps)
    weights = recip / jnp.sum(recip, axis=-1, keepdims=True)  # (B, N, 3)
    grouped = group_points(features, idx)  # (B, N, 3, C)
    return jnp.sum(grouped * weights[..., None], axis=-2)
