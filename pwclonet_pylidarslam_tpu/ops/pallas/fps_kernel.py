"""Pallas TPU kernel: furthest point sampling with VMEM-resident state.

The ``lax.fori_loop`` FPS (``ops/fps.py``) pays per-iteration HLO while-loop
overhead — ~6 µs/step × npoint steps ≈ 13 ms for the PWCLO-Net level-1
sampling. This kernel runs the whole sequential loop **inside one Mosaic
kernel**: the coordinate rows and the running min-distance vector stay in
VMEM for all ``npoint`` iterations (the same state-residency idea as the
CUDA kernel's shared-memory reduction, ref ``sampling_gpu.cu:69-173`` — but
per-core VMEM instead of per-block shared memory).

Layout: coordinates are fed coordinate-major ``(B, 8, N)`` (xyz padded to 8
sublanes, N on the 128-wide lane axis) so every step is pure full-width VPU
work: one one-hot gather of the last point, one fused distance, one min, one
argmax.

Semantics identical to ``ops.fps.furthest_point_sample`` (same start rule,
same padding guard) — the golden test checks exact index equality.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_NORM_SQ = 1e-3
_BIG = 1e10


def _fps_kernel(coords_ref, mask_ref, out_ref, dist_ref):
    """One batch element. ``coords (8, N)`` (rows 0..2 = x,y,z), ``mask (1, N)``,
    ``out (npoint, 1)`` int32, scratch ``dist (1, N)``."""
    n = coords_ref.shape[1]
    npoint = out_ref.shape[0]
    x = coords_ref[0:1, :]
    y = coords_ref[1:2, :]
    z = coords_ref[2:3, :]
    valid = mask_ref[0:1, :] > 0.0

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def first_argmax(values):
        """Lowest index attaining the max (Mosaic's argmax tie-breaks by
        LAST index; XLA by first — make it explicit for oracle equality)."""
        m = jnp.max(values)
        return jnp.min(jnp.where(values == m, lane, n)).astype(jnp.int32)

    # start at the first valid point
    first = jnp.min(jnp.where(valid, lane, n)).astype(jnp.int32)
    dist_ref[:, :] = jnp.where(valid, _BIG, -_BIG)
    out_ref[0:1, 0:1] = first.reshape(1, 1)

    def body(i, last):
        sel = (lane == last).astype(x.dtype)  # one-hot of the last pick
        px = jnp.sum(x * sel)
        py = jnp.sum(y * sel)
        pz = jnp.sum(z * sel)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        new_dist = jnp.minimum(dist_ref[:, :], jnp.where(valid, d, -_BIG))
        dist_ref[:, :] = new_dist
        nxt = first_argmax(new_dist)
        out_ref[pl.ds(i, 1), 0:1] = nxt.reshape(1, 1)
        return nxt

    jax.lax.fori_loop(1, npoint, body, first)


def _fps_kernel_batched(x_ref, y_ref, z_ref, mask_ref, out_ref, dist_ref):
    """A whole batch CHUNK per program. The per-batch kernel above runs grid
    programs sequentially on the one TensorCore with (1, N) rows — 1 of 8
    VPU sublanes busy. Processing ``(BB, N)`` state per step uses the full
    vector unit and runs the same ``npoint`` sequential steps for all BB
    batch rows at once: measured 41 ms → ~3 ms for the PWCLO-Net level-1
    sampling (B=32, 8192→2048).

    ``x/y/z/mask (BB, N)``, ``out (npoint, BB)`` int32, scratch ``dist (BB, N)``.
    """
    bb, n = x_ref.shape
    npoint = out_ref.shape[0]
    x = x_ref[:, :]
    y = y_ref[:, :]
    z = z_ref[:, :]
    valid = mask_ref[:, :] > 0.0

    lane = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)

    def first_argmax(values):
        """Per-row lowest index attaining the row max (oracle tie-break)."""
        m = jnp.max(values, axis=1, keepdims=True)
        return jnp.min(jnp.where(values == m, lane, n), axis=1).astype(jnp.int32)

    first = jnp.min(jnp.where(valid, lane, n), axis=1).astype(jnp.int32)  # (BB,)
    dist_ref[:, :] = jnp.where(valid, _BIG, -_BIG)
    out_ref[0:1, :] = first.reshape(1, bb)

    def body(i, last):
        sel = (lane == last[:, None]).astype(x.dtype)  # (BB, N) one-hot rows
        px = jnp.sum(x * sel, axis=1, keepdims=True)
        py = jnp.sum(y * sel, axis=1, keepdims=True)
        pz = jnp.sum(z * sel, axis=1, keepdims=True)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        new_dist = jnp.minimum(dist_ref[:, :], jnp.where(valid, d, -_BIG))
        dist_ref[:, :] = new_dist
        nxt = first_argmax(new_dist)
        out_ref[pl.ds(i, 1), :] = nxt.reshape(1, bb)
        return nxt

    jax.lax.fori_loop(1, npoint, body, first)


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(
    points: jax.Array,
    npoint: int,
    mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """``points (B, N, 3)`` → FPS indices ``(B, npoint)`` int32.

    Dispatches the batch-vectorized kernel in VMEM-sized batch chunks.
    ``interpret=True`` runs the kernel in the Pallas interpreter (used by the
    CPU golden tests); compiled Mosaic otherwise.
    """
    b, n, _ = points.shape
    if mask is None:
        mask = (jnp.sum(points * points, axis=-1) > _PAD_NORM_SQ).astype(points.dtype)
    else:
        mask = mask.astype(points.dtype)

    pad_n = (-n) % 128
    n_p = n + pad_n
    # chunk the batch so 5 (BB, N) f32 buffers fit comfortably in VMEM
    bb = max(1, min(b, (8 << 20) // (5 * n_p * 4)))
    pad_b = (-b) % bb
    xs = jnp.pad(points[..., 0], ((0, pad_b), (0, pad_n)))
    ys = jnp.pad(points[..., 1], ((0, pad_b), (0, pad_n)))
    zs = jnp.pad(points[..., 2], ((0, pad_b), (0, pad_n)))
    mask_p = jnp.pad(mask, ((0, pad_b), (0, pad_n)))
    b_p = b + pad_b

    n_chunks = b_p // bb
    spec = pl.BlockSpec((bb, n_p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fps_kernel_batched,
        grid=(n_chunks,),
        in_specs=[spec, spec, spec, spec],
        out_specs=pl.BlockSpec(
            (None, npoint, bb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks, npoint, bb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bb, n_p), points.dtype)],
        interpret=interpret,
    )(xs, ys, zs, mask_p)
    return out.transpose(0, 2, 1).reshape(b_p, npoint)[:b]
