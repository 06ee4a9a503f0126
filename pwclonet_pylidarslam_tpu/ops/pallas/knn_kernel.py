"""Fused kNN Pallas kernel: pairwise distances + bucketed top-k in VMEM.

Round-4 trace on the attached v5e: ``lax.approx_min_k`` does NOT lower to
the PartialReduce op on this backend — the compiler emits full ``sort``s of
the (B, S, N) distance tensor, ~35 ms of a 209 ms train step (the level-1
kNN alone sorts (32, 2048, 8192) twice). This kernel computes the distance
tile on the MXU and reduces it to k neighbors entirely in VMEM:

1. distances ``(TQ, N) = ‖q‖² − 2 q·rᵀ + ‖r‖²`` (cross term on the MXU);
2. strided bucket min: candidate ``j`` of NB is ``min`` over rows
   ``{j, j+NB, j+2·NB, …}`` — one vector-min sweep, no sort;
3. exact ascending top-k over the NB candidates by iterative min-extraction
   (k is 4–32 in this model; NB ≤ 512).

Distinct buckets give distinct indices, so the k results are unique. Two of
the true top-k collide in a bucket with probability ~C(k,2)/NB — recall
≈ 94–97 % at k=32, matching ``approx_min_k``'s default 0.95 target; for
N ≤ NB the bucket size is 1 and the result is EXACT. Neighbor consumers
(max-pool set convs, softmax attention) are order-invariant, so approximate
selection — the same contract the model already opted into with
``approx=True`` — is the only semantic.

Replaces the reference's dense ``(B,S,N)`` materialize + ``torch.topk``
(``pointnet2_ops/pytorch_utils.py:32-49``) on the training hot path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10
_BIG_I = 2**30


def _knn_kernel(q_ref, rt_ref, d_ref, i_ref, *, k: int, nb: int):
    n = rt_ref.shape[2]
    bs = n // nb
    q = q_ref[0]  # (TQ, C)
    rt = rt_ref[0]  # (C, N)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # (TQ, 1)
    r2 = jnp.sum(rt * rt, axis=0, keepdims=True)  # (1, N)
    cross = jnp.dot(q, rt, preferred_element_type=jnp.float32)  # MXU
    dist = jnp.maximum(q2 + r2 - 2.0 * cross, 0.0)  # (TQ, N)

    # strided bucket-min: candidate j over rows {j, j+nb, ...}
    best = dist[:, 0:nb]
    best_s = jnp.zeros_like(best, dtype=jnp.int32)
    for s in range(1, bs):
        row = dist[:, s * nb : (s + 1) * nb]
        take = row < best
        best = jnp.where(take, row, best)
        best_s = jnp.where(take, jnp.int32(s), best_s)
    lane = jax.lax.broadcasted_iota(jnp.int32, best.shape, 1)
    cand_idx = best_s * nb + lane  # true ref index of each candidate

    # ascending top-k by iterative extraction (unique via index encoding)
    d_cols = []
    i_cols = []
    for _ in range(k):
        m = jnp.min(best, axis=-1, keepdims=True)  # (TQ, 1)
        enc = jnp.where(best <= m, cand_idx, jnp.int32(_BIG_I))
        sel = jnp.min(enc, axis=-1, keepdims=True)
        d_cols.append(m)
        i_cols.append(sel)
        best = jnp.where(enc == sel, _BIG, best)
    d_ref[0] = jnp.concatenate(d_cols, axis=-1)
    i_ref[0] = jnp.concatenate(i_cols, axis=-1)


def _pick_tq(s: int) -> int:
    for t in (128, 64, 32, 16, 8):
        if s % t == 0:
            return t
    return 0


def _pick_nb(n: int, k: int) -> int:
    if n <= 512:
        return n  # bucket size 1 — exact
    for nb in (512, 256, 128):
        if n % nb == 0 and nb >= k:
            return nb
    return 0


def knn_supported(s: int, n: int, k: int, c: int) -> bool:
    return (
        c <= 8
        and k <= 64
        and _pick_tq(s) != 0
        and _pick_nb(n, k) != 0
        and n * 128 * 4 <= 8 * 1024 * 1024  # dist tile (128, N) must fit VMEM
    )


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_approx_pallas(
    query: jax.Array, ref: jax.Array, k: int, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Approximate kNN of ``query (B,S,C)`` in ``ref (B,N,C)`` →
    ``(sqdists (B,S,k), idx (B,S,k))`` ascending. Call only when
    ``knn_supported`` holds."""
    b, s, c = query.shape
    n = ref.shape[1]
    tq = _pick_tq(s)
    nb = _pick_nb(n, k)
    ref_t = jnp.swapaxes(ref, 1, 2)  # (B, C, N)
    grid = (b, s // tq)
    dists, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, c), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, k), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, k), jnp.float32),
            jax.ShapeDtypeStruct((b, s, k), jnp.int32),
        ),
        interpret=interpret,
    )(query.astype(jnp.float32), ref_t.astype(jnp.float32))
    return dists, idx
