"""Pallas TPU kernel: fused attentive neighborhood aggregation (cost volume).

Both attentive aggregates of the PWCLO-Net cost volume (ref
``slam/models/PWCLONet/costvolume.py:63-190``) share one shape:

    enc  = [p, q, q-p, |q-p|]                        (10-d spatial encoding)
    emb  = MLP1([enc, center_feat, grouped_feat])    (or = grouped_feat)
    att  = MLP2([ENC(enc), (center_feat,) emb])
    out  = sum_k softmax_k(att) * emb

In eval mode (BN folded) this kernel runs the whole block per center tile in
ONE Mosaic program: the spatial encoding is computed in VMEM from the center
and grouped coordinates, every MLP intermediate and the attention softmax
stay in VMEM, and only the aggregated ``(S, D)`` result is written back.
First-layer concats are realized as split matmuls (static row slices of the
weight), so no lane-axis concatenation is needed.

Used by ``models.costvolume.CostVolume(fused_eval=True)``; golden-tested
against the unfused flax graph in ``tests/test_pallas_kernels.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows (centers x neighbors) per tile: this kernel holds several row-wide
# live tensors at once (enc parts, two MLP stacks, attention) — 512 rows
# keeps the whole working set + double-buffered inputs under the 16M VMEM
# scoped limit
_ROW_BUDGET = 512
_HP = jax.lax.Precision.HIGHEST


def _dot(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32, precision=_HP)


def _make_kernel(
    s_tile: int,
    k: int,
    cc: int,
    n_enc: int,
    n_emb: int,
    n_att: int,
    att_includes_center: bool,
):
    use_emb = n_emb > 0

    def kernel(*refs):
        it = iter(refs)
        cxyz = next(it)[:]  # (s_tile, 3)
        cfeat = next(it)[:]  # (s_tile, cc)
        gxyz = next(it)[:]  # (s_tile*k, 3)
        gfeat = next(it)[:]  # (s_tile*k, cg)
        enc_wb = [(next(it)[:], next(it)[:]) for _ in range(n_enc)]
        emb_wb = [(next(it)[:], next(it)[:]) for _ in range(n_emb)]
        att_wb = [(next(it)[:], next(it)[:]) for _ in range(n_att)]
        out_ref = next(it)

        # broadcast the per-center rows to per-neighbor rows
        p = jnp.broadcast_to(cxyz[:, None, :], (s_tile, k, 3)).reshape(s_tile * k, 3)
        cf = jnp.broadcast_to(cfeat[:, None, :], (s_tile, k, cc)).reshape(s_tile * k, cc)

        # 10-d spatial encoding, entirely in VMEM (ref costvolume.py:99-110)
        diff = gxyz - p
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True) + 1e-20)

        def first_layer(parts, w, b):
            acc = b
            off = 0
            for arr in parts:
                size = arr.shape[-1]
                acc = acc + _dot(arr, w[off : off + size, :])
                off += size
            return jnp.maximum(acc, 0.0)

        enc_parts = (p, gxyz, diff, dist)

        # emb = MLP1([enc, center_feat, grouped_feat]) or grouped_feat
        if use_emb:
            w0, b0 = emb_wb[0]
            h = first_layer(enc_parts + (cf, gfeat), w0, b0)
            for w, b in emb_wb[1:]:
                h = jnp.maximum(_dot(h, w) + b, 0.0)
            emb = h
        else:
            emb = gfeat

        # ENC(enc): encoding projection MLP
        w0, b0 = enc_wb[0]
        e = first_layer(enc_parts, w0, b0)
        for w, b in enc_wb[1:]:
            e = jnp.maximum(_dot(e, w) + b, 0.0)

        # att = MLP2([ENC(enc), (center_feat,) emb])
        att_parts = (e, cf, emb) if att_includes_center else (e, emb)
        w0, b0 = att_wb[0]
        a = first_layer(att_parts, w0, b0)
        for w, b in att_wb[1:]:
            a = jnp.maximum(_dot(a, w) + b, 0.0)

        # softmax over the k neighbors, then weighted sum of emb
        d = a.shape[-1]
        a3 = a.reshape(s_tile, k, d)
        m = jnp.max(a3, axis=1, keepdims=True)
        w_att = jnp.exp(a3 - m)
        w_att = w_att / jnp.sum(w_att, axis=1, keepdims=True)
        out_ref[:] = jnp.sum(w_att * emb.reshape(s_tile, k, d), axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("att_includes_center", "interpret")
)
def attentive_aggregate_pallas(
    center_xyz: jax.Array,  # (B, S, 3)
    grouped_xyz: jax.Array,  # (B, S, K, 3)
    center_feat: jax.Array,  # (B, S, Cc)
    grouped_feat: jax.Array,  # (B, S, K, Cg)
    enc_wb: Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]],
    emb_wb: Optional[Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]],
    att_wb: Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]],
    att_includes_center: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused attentive aggregate → ``(B, S, D)``.

    ``*_wb`` are BN-folded ``(weights, biases)`` stacks (from
    ``PointMLP(..., fold_only=True)``). ``emb_wb=None`` uses
    ``grouped_feat`` directly as the embedding (the self-aggregation stage).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, k, _ = grouped_xyz.shape
    cc = center_feat.shape[-1]
    enc_ws, enc_bs = enc_wb
    emb_ws, emb_bs = emb_wb if emb_wb is not None else ((), ())
    att_ws, att_bs = att_wb
    d = att_ws[-1].shape[-1]

    s_tile = max(1, min(s, _ROW_BUDGET // k))
    if s_tile < s:
        # partial tiles must have sublane-aligned block shapes (multiple of
        # 8); a tile equal to the full dimension is exempt
        s_tile = max(8, s_tile // 8 * 8)
    pad_s = (-s) % s_tile
    if pad_s:
        center_xyz = jnp.pad(center_xyz, ((0, 0), (0, pad_s), (0, 0)))
        grouped_xyz = jnp.pad(grouped_xyz, ((0, 0), (0, pad_s), (0, 0), (0, 0)))
        center_feat = jnp.pad(center_feat, ((0, 0), (0, pad_s), (0, 0)))
        grouped_feat = jnp.pad(grouped_feat, ((0, 0), (0, pad_s), (0, 0), (0, 0)))
    s_pad = s + pad_s
    n_tiles = s_pad // s_tile

    gxyz_rows = grouped_xyz.reshape(b, s_pad * k, 3)
    gfeat_rows = grouped_feat.reshape(b, s_pad * k, grouped_feat.shape[-1])

    def center_spec(c):
        return pl.BlockSpec((None, s_tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    def row_spec(c):
        return pl.BlockSpec((None, s_tile * k, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    in_specs = [center_spec(3), center_spec(cc), row_spec(3),
                row_spec(grouped_feat.shape[-1])]
    args = [center_xyz.astype(jnp.float32), center_feat.astype(jnp.float32),
            gxyz_rows.astype(jnp.float32), gfeat_rows.astype(jnp.float32)]
    for ws, bs in ((enc_ws, enc_bs), (emb_ws, emb_bs), (att_ws, att_bs)):
        for w, bia in zip(ws, bs):
            args.append(w.astype(jnp.float32))
            args.append(bia.astype(jnp.float32).reshape(1, -1))
            in_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM))
            in_specs.append(
                pl.BlockSpec((1, bia.shape[-1]), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            )

    out = pl.pallas_call(
        _make_kernel(
            s_tile, k, cc, len(enc_ws), len(emb_ws), len(att_ws),
            att_includes_center,
        ),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, s_tile, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:, :s]
