"""Ball query: fixed-count neighborhood within a radius.

Replaces the CUDA ``query_ball_point_kernel`` (ref ``ball_query_gpu.cu:9-54``).
Reference semantics preserved: for each center, take the **first** ``nsample``
points (by index order) within ``radius``; if fewer exist, pad by repeating
the first hit; if none exist, fall back to index 0 (the CUDA kernel leaves
the row as initialized, which is the first-hit fill starting from 0).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pwclonet_pylidarslam_tpu.ops.knn import pairwise_sqdist


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(
    centers: jax.Array,
    points: jax.Array,
    radius: float,
    nsample: int,
    points_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """First ``nsample`` indices of ``points (B,N,3)`` within ``radius`` of
    each of ``centers (B,M,3)`` → ``(B, M, nsample)`` int32.

    "First" = lowest point index, exactly like the CUDA loop. Implemented as
    a top-k over a key that ranks in-radius points by index and pushes
    out-of-radius points to the end — one fused VPU pass + one top-k, no
    sequential scan.
    """
    b, m, _ = centers.shape
    n = points.shape[1]
    d = pairwise_sqdist(centers, points)  # (B, M, N)
    in_radius = d < radius * radius
    if points_mask is not None:
        in_radius = jnp.logical_and(in_radius, points_mask[:, None, :] > 0)
    point_ids = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    # rank key: in-radius points keep their index, others get n + index
    key = jnp.where(in_radius, point_ids, n + point_ids)
    _, order = jax.lax.top_k(-key, nsample)  # smallest keys = first hits
    hit = jnp.take_along_axis(in_radius, order, axis=-1)
    # pad-by-first-hit (CUDA kernel fills the row with hit 0 before scanning)
    first = order[..., :1]
    idx = jnp.where(hit, order, first)
    # no hits at all → index 0
    any_hit = jnp.any(in_radius, axis=-1, keepdims=True)
    return jnp.where(any_hit, idx, 0).astype(jnp.int32)
