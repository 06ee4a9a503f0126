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


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(
    points: jax.Array,
    npoint: int,
    mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """``points (B, N, 3)`` → FPS indices ``(B, npoint)`` int32.

    ``interpret=True`` runs the kernel in the Pallas interpreter (used by the
    CPU golden tests); compiled Mosaic otherwise.
    """
    b, n, _ = points.shape
    if mask is None:
        mask = (jnp.sum(points * points, axis=-1) > _PAD_NORM_SQ).astype(points.dtype)
    else:
        mask = mask.astype(points.dtype)

    # coordinate-major + lane padding to a multiple of 128
    pad_n = (-n) % 128
    coords = jnp.swapaxes(points, 1, 2)  # (B, 3, N)
    coords = jnp.pad(coords, ((0, 0), (0, 5), (0, pad_n)))  # (B, 8, N')
    mask_p = jnp.pad(mask, ((0, 0), (0, pad_n)))[:, None, :]  # (B, 1, N')
    n_p = n + pad_n

    out = pl.pallas_call(
        _fps_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, 8, n_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, n_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, npoint, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npoint, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n_p), points.dtype)],
        interpret=interpret,
    )(coords, mask_p)
    return out[..., 0]
