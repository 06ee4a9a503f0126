"""Vertex-map geometry: normal maps, projective neighborhoods, timestamps.

Replaces the reference's ``slam/common/geometry.py``. Vertex maps are
channel-last ``(B, H, W, C)`` with xyz in channels 0..2 and zeros marking
invalid pixels (see ``core/projection.py``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def box_filter_sum(img: jax.Array, kernel_size: int) -> jax.Array:
    """Channel-wise K×K box sum of ``(B, H, W, C)`` with zero padding.

    Uses ``lax.reduce_window`` — XLA fuses this into a bandwidth-bound sweep;
    on TPU it is far cheaper than the reference's grouped conv2d with a ones
    kernel (``geometry.py:270-276``).
    """
    pad = kernel_size // 2
    return jax.lax.reduce_window(
        img,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _inverse3x3(m: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Closed-form adjugate inverse of ``(..., 3, 3)`` and determinant.

    (Ref ``geometry._adjoint/_inverse:73-122``.) Singular matrices return a
    garbage inverse and |det| ≈ 0 — callers mask on the determinant.
    """
    a = m
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        -2,
    )
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    return adj / safe_det[..., None, None], det


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def compute_normal_map(vertex_map: jax.Array, kernel_size: int = 5) -> jax.Array:
    """Per-pixel surface normals of a vertex map ``(B, H, W, 3)``.

    The reference's moment trick (``geometry.py:248-303``): with box sums
    ``S = Σ p`` and ``M = Σ p pᵀ`` over the K×K window (invalid pixels are
    zero and drop out automatically), the plane ``n·x = 1`` through the window
    solves ``M n = S``; the normal is ``normalize(M⁻¹ S)``. Pixels with
    ``|det M| ≤ 1e-6`` or invalid centers get a zero normal.
    """
    xyz = vertex_map[..., :3]
    outer = xyz[..., :, None] * xyz[..., None, :]  # (B, H, W, 3, 3)
    b, h, w = xyz.shape[:3]
    m = box_filter_sum(outer.reshape(b, h, w, 9), kernel_size).reshape(b, h, w, 3, 3)
    s = box_filter_sum(xyz, kernel_size)
    inv, det = _inverse3x3(m)
    n = jnp.einsum("bhwij,bhwj->bhwi", inv, s)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm > 0, norm, 1.0)
    valid_center = jnp.linalg.norm(xyz, axis=-1, keepdims=True) > 0
    well_posed = (jnp.abs(det) > 1e-6)[..., None] & (norm > 0)
    return jnp.where(valid_center & well_posed, n, 0.0)


def orient_normals_towards_origin(points: jax.Array, normals: jax.Array) -> jax.Array:
    """Flip normals to face the sensor (dot(n, p) ≤ 0)."""
    flip = jnp.sum(points * normals, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -normals, normals)


def compute_neighbors(
    vm_target: jax.Array,
    vm_reference: jax.Array,
    reference_fields: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Projective nearest neighbor across a stack of reference maps.

    ``vm_target (B, H, W, 3)`` vs ``vm_reference (D, H, W, 3)`` (same pixel
    grid): for each target pixel, the closest of the D candidate points at the
    same pixel location. Invalid pixels on either side are excluded; targets
    with no valid candidate get zeros. (Ref ``geometry.compute_neighbors:405-447``.)

    ``reference_fields (D, H, W, C)`` rides along through the same argmin
    (used for the model normal maps).
    """
    t_valid = jnp.linalg.norm(vm_target[..., :3], axis=-1) > 0  # (B, H, W)
    r_valid = jnp.linalg.norm(vm_reference[..., :3], axis=-1) > 0  # (D, H, W)
    # (B, D, H, W)
    diff = jnp.linalg.norm(
        vm_target[:, None, ..., :3] - vm_reference[None, ..., :3], axis=-1
    )
    diff = jnp.where(r_valid[None], diff, jnp.inf)
    best = jnp.argmin(diff, axis=1)  # (B, H, W)
    any_valid = jnp.isfinite(jnp.min(diff, axis=1)) & t_valid

    # gather the winning reference point per pixel
    d = vm_reference.shape[0]
    one_hot = jax.nn.one_hot(best, d, dtype=vm_reference.dtype)  # (B, H, W, D)
    nbrs = jnp.einsum("bhwd,dhwc->bhwc", one_hot, vm_reference)
    nbrs = jnp.where(any_valid[..., None], nbrs, 0.0)
    fields = None
    if reference_fields is not None:
        fields = jnp.einsum("bhwd,dhwc->bhwc", one_hot, reference_fields)
        fields = jnp.where(any_valid[..., None], fields, 0.0)
    return nbrs, fields


def estimate_timestamps(points: jax.Array, clockwise: bool = True) -> jax.Array:
    """Per-point acquisition fraction ∈ [0, 1] from azimuth.

    Rotating LiDARs sweep azimuth over one revolution; the reference estimates
    per-point timestamps from the scan angle (``geometry.estimate_timestamps:451-474``)
    for motion de-skew. Fraction 0 = scan start (azimuth π behind x), 1 = end.
    """
    phi = jnp.arctan2(points[..., 1], points[..., 0])  # (-pi, pi]
    frac = (jnp.pi - phi) / (2.0 * jnp.pi) if clockwise else (phi + jnp.pi) / (2.0 * jnp.pi)
    return jnp.clip(frac, 0.0, 1.0)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """``(H, W, 2)`` grid of (row, col) coordinates (ref ``geometry.pixel_grid:47``)."""
    rows = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    cols = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    return jnp.stack([rows, cols], axis=-1)
