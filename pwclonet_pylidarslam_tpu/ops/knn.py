"""k-nearest-neighbor search with fixed shapes and optional masks.

The reference materializes the full ``(B, S, N)`` pairwise distance tensor and
calls ``torch.topk`` (``pointnet2_ops/pytorch_utils.py:32-49``) — SURVEY.md
flags this as the #1 memory hot spot. Here the default path tiles the
reference cloud along N with a running top-k merge under ``lax.scan``, so the
live buffer is ``(B, S, TILE + k)`` instead of ``(B, S, N)``; XLA keeps the
distance tile in VMEM and the merge is one sort per tile.

The distance computation itself is a matmul (``-2 q·rᵀ`` plus squared norms),
i.e. MXU work, which is exactly where TPUs want it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e10


def pairwise_sqdist(query: jax.Array, ref: jax.Array) -> jax.Array:
    """Squared euclidean distances ``(B, S, N)`` between ``(B,S,3)``/``(B,N,3)``.

    Computed as ``‖q‖² + ‖r‖² − 2 q·rᵀ`` so the inner term rides the MXU.
    Clamped at 0 to absorb cancellation error.
    """
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)  # (B, S, 1)
    r2 = jnp.sum(ref * ref, axis=-1)[..., None, :]  # (B, 1, N)
    cross = jnp.einsum("bsc,bnc->bsn", query, ref)
    return jnp.maximum(q2 + r2 - 2.0 * cross, 0.0)


def _masked_topk_smallest(dist: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "approx"))
def knn(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    query_mask: Optional[jax.Array] = None,
    ref_mask: Optional[jax.Array] = None,
    tile_n: int = 2048,
    approx: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors of ``query (B,S,C)`` in ``ref (B,N,C)``.

    Returns ``(sqdists (B,S,k), indices (B,S,k))`` sorted ascending — and the
    distances are *real* squared distances, fixing the reference's inert
    dist-return bug (``pytorch_utils.py:47`` returns indices as distances).

    Masked-out reference points (``ref_mask == 0``) never appear as neighbors
    unless a query has fewer than ``k`` valid refs, in which case the
    remaining slots repeat the nearest valid hit (mirrors the reference ball
    query padding convention). Masked-out queries return index 0/dist 0.

    Approximate-path contract (ADVICE r4): ``approx=True`` trades recall for
    speed and the *algorithm is shape-dependent*. Unmasked TPU shapes with
    ``k >= 16 and N >= 2048`` dispatch to the fused Pallas bucket-min kernel
    (recall ~0.94-0.98 at k=32, exact for N <= 512); every other approx
    shape uses ``lax.approx_min_k`` (recall ~0.98, exact on CPU). Identical
    calls can therefore return different neighbor *quality* on different
    backends/shapes. Callers that need one pinned algorithm should pass
    ``approx=False`` (exact everywhere, slower on large N).
    """
    b, s, _ = query.shape
    n = ref.shape[1]

    if k > n:
        # fewer refs than requested neighbors: compute k=n and pad by
        # repeating the nearest hit (fixed-shape convention)
        d_n, i_n = knn(query, ref, n, query_mask, ref_mask, tile_n, approx)
        reps = k - n
        return (
            jnp.concatenate([d_n, jnp.repeat(d_n[..., :1], reps, axis=-1)], axis=-1),
            jnp.concatenate([i_n, jnp.repeat(i_n[..., :1], reps, axis=-1)], axis=-1),
        )

    if approx:
        if (
            query_mask is None
            and ref_mask is None
            and jax.devices()[0].platform in ("tpu", "axon")
        ):
            from pwclonet_pylidarslam_tpu.ops.pallas.knn_kernel import (
                knn_approx_pallas,
                knn_supported,
            )

            # the kernel wins only where the sort is expensive (measured:
            # 9.7→5.2 ms at (2048q,8192ref,k=32), 4.5→2.3 ms at L2; small
            # k/N shapes are faster on the stock path)
            if k >= 16 and n >= 2048 and knn_supported(s, n, k, query.shape[-1]):
                # fused Pallas kernel: distance tile + bucketed top-k in
                # VMEM. The axon backend lowers approx_min_k to full SORTs
                # of the (B,S,N) tensor (~35 ms of a 209 ms train step,
                # round-4 trace); the kernel replaces them outright.
                return knn_approx_pallas(query, ref, k)
        # TPU-native approximate top-k (lax.approx_min_k — PartialReduce;
        # the model layers opt in, exact consumers keep the default)
        dist = pairwise_sqdist(query, ref)
        if ref_mask is not None:
            dist = jnp.where(ref_mask[:, None, :] > 0, dist, _BIG)
        dists, idx = jax.lax.approx_min_k(dist, k)
    elif n <= max(tile_n, 2 * k):
        dist = pairwise_sqdist(query, ref)
        if ref_mask is not None:
            dist = jnp.where(ref_mask[:, None, :] > 0, dist, _BIG)
        dists, idx = _masked_topk_smallest(dist, k)
    else:
        # pad N to a multiple of tile_n with masked-out slots
        pad = (-n) % tile_n
        if pad:
            ref_p = jnp.pad(ref, ((0, 0), (0, pad), (0, 0)))
            mask_p = jnp.pad(
                ref_mask if ref_mask is not None else jnp.ones((b, n), ref.dtype),
                ((0, 0), (0, pad)),
            )
        else:
            ref_p = ref
            mask_p = ref_mask if ref_mask is not None else None
        n_tiles = ref_p.shape[1] // tile_n
        ref_tiles = ref_p.reshape(b, n_tiles, tile_n, ref.shape[-1]).transpose(1, 0, 2, 3)
        if mask_p is not None:
            mask_tiles = mask_p.reshape(b, n_tiles, tile_n).transpose(1, 0, 2)
        else:
            mask_tiles = None

        def scan_body(carry, inputs):
            best_d, best_i = carry
            if mask_tiles is not None:
                tile, tmask, t_idx = inputs
            else:
                tile, t_idx = inputs
                tmask = None
            d = pairwise_sqdist(query, tile)  # (B, S, tile_n)
            if tmask is not None:
                d = jnp.where(tmask[:, None, :] > 0, d, _BIG)
            base = t_idx * tile_n
            cand_i = jnp.broadcast_to(
                jnp.arange(tile_n, dtype=jnp.int32)[None, None, :] + base, d.shape
            )
            all_d = jnp.concatenate([best_d, d], axis=-1)
            all_i = jnp.concatenate([best_i, cand_i], axis=-1)
            new_d, merge_idx = _masked_topk_smallest(all_d, k)
            new_i = jnp.take_along_axis(all_i, merge_idx, axis=-1)
            return (new_d, new_i), None

        init = (
            jnp.full((b, s, k), _BIG, query.dtype),
            jnp.zeros((b, s, k), jnp.int32),
        )
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
        xs = (ref_tiles, mask_tiles, tile_ids) if mask_tiles is not None else (ref_tiles, tile_ids)
        (dists, idx), _ = jax.lax.scan(scan_body, init, xs)

    # replace invalid (no valid ref) slots by repeating the best hit
    invalid = dists >= _BIG * 0.5
    idx = jnp.where(invalid, idx[..., :1], idx)
    dists = jnp.where(invalid, dists[..., :1], dists)
    if query_mask is not None:
        qm = query_mask[..., None] > 0
        idx = jnp.where(qm, idx, 0)
        dists = jnp.where(qm, dists, 0.0)
    return dists, idx.astype(jnp.int32)
