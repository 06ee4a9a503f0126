"""Rigid registration: Kabsch/Procrustes, BEV elevation images, FFT planar
registration.

Replaces the reference's ``slam/common/registration.py``. The reference's
2D path is ORB/AKAZE features + BFMatcher + RANSAC (cv2, CPU,
``registration.py:88-274``); the TPU-native equivalent is **spectral**:
phase correlation over BEV elevation images for (x, y) and polar-spectrum
correlation for yaw — pure FFTs, fully on device, no feature detector.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def weighted_procrustes(
    source: jax.Array,
    target: jax.Array,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Optimal rigid transform ``T`` with ``T·source ≈ target`` (Kabsch/SVD).

    ``source/target (..., N, 3)``, ``weights (..., N)`` → ``(..., 4, 4)``.
    (Ref ``weighted_procrustes:15-74``.)
    """
    from pwclonet_pylidarslam_tpu.core import se3

    if weights is None:
        weights = jnp.ones(source.shape[:-1], source.dtype)
    w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    mu_s = jnp.sum(source * w[..., None], axis=-2)
    mu_t = jnp.sum(target * w[..., None], axis=-2)
    sc = source - mu_s[..., None, :]
    tc = target - mu_t[..., None, :]
    cov = jnp.einsum("...ni,...n,...nj->...ij", tc, w, sc)
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vt)
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    r = (u * d[..., None, :]) @ vt
    t = mu_t - jnp.einsum("...ij,...j->...i", r, mu_s)
    return se3.make_pose(r, t)


# ---------------------------------------------------------------------------
# BEV elevation images (ref ElevationImageRegistration.build_image:196-241)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BEVConfig:
    pixel_size: float = 0.5  # meters / pixel
    image_size: int = 256  # H = W
    z_min: float = -3.0
    z_max: float = 5.0


@functools.partial(jax.jit, static_argnames=("config",))
def build_elevation_image(
    points: jax.Array, config: BEVConfig, mask: Optional[jax.Array] = None
) -> jax.Array:
    """Scatter-max elevation image ``(S, S)`` from ``points (N, 3)``.

    Pixel value = max z (clipped to [z_min, z_max]), normalized to [0, 1];
    empty pixels are 0. Image is centered at the origin of the point frame.
    """
    s = config.image_size
    px = jnp.round(points[:, 0] / config.pixel_size + s // 2).astype(jnp.int32)
    py = jnp.round(points[:, 1] / config.pixel_size + s // 2).astype(jnp.int32)
    valid = (px >= 0) & (px < s) & (py >= 0) & (py < s)
    valid &= jnp.linalg.norm(points, axis=-1) > 1e-6
    if mask is not None:
        valid &= mask > 0
    z = jnp.clip(points[:, 2], config.z_min, config.z_max)
    z01 = (z - config.z_min) / (config.z_max - config.z_min)
    # scatter-max; invalid points write z_min (= 0 after normalize)
    flat = jnp.where(valid, px * s + py, s * s)
    img = jnp.zeros((s * s + 1,), points.dtype).at[flat].max(jnp.where(valid, z01, 0.0))
    return img[: s * s].reshape(s, s)


# ---------------------------------------------------------------------------
# Spectral planar registration
# ---------------------------------------------------------------------------


class PlanarRegistration(NamedTuple):
    yaw: jax.Array  # () rad — rotation of b's frame vs a's
    translation: jax.Array  # (2,) meters (in a's frame)
    confidence: jax.Array  # () correlation peak ratio


def _hann2d(s: int, dtype) -> jax.Array:
    w = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(s, dtype=dtype) / s)
    return w[:, None] * w[None, :]


def _phase_correlate(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Translation (da in pixels, (2,)) such that shifting ``b`` by it best
    matches ``a``, + peak sharpness confidence."""
    fa = jnp.fft.rfft2(a)
    fb = jnp.fft.rfft2(b)
    cross = fa * jnp.conj(fb)
    r = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    corr = jnp.fft.irfft2(r, s=a.shape)
    idx = jnp.argmax(corr)
    s0, s1 = a.shape
    di, dj = idx // s1, idx % s1
    # wrap to signed shifts
    di = jnp.where(di > s0 // 2, di - s0, di)
    dj = jnp.where(dj > s1 // 2, dj - s1, dj)
    peak = jnp.max(corr)
    conf = peak / jnp.maximum(jnp.mean(jnp.abs(corr)) * 10.0, 1e-12)
    return jnp.stack([di, dj]).astype(a.dtype), jnp.minimum(conf, 100.0) * (peak > 0)


def _log_polar_spectrum(img: jax.Array, n_theta: int = 180, n_r: int = 96) -> jax.Array:
    """Magnitude spectrum resampled on a (theta, log-r) grid (rotation →
    circular shift along theta)."""
    s = img.shape[0]
    spec = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(img)))
    spec = jnp.log1p(spec)
    c = s / 2.0
    theta = jnp.linspace(0.0, jnp.pi, n_theta, endpoint=False)
    # log-spaced radii emphasize mid frequencies
    r = jnp.exp(jnp.linspace(jnp.log(2.0), jnp.log(s / 2.0 - 1), n_r))
    tt, rr = jnp.meshgrid(theta, r, indexing="ij")
    xi = c + rr * jnp.cos(tt)
    yi = c + rr * jnp.sin(tt)
    return jax.scipy.ndimage.map_coordinates(spec, [xi, yi], order=1, mode="constant")


def estimate_yaw(a: jax.Array, b: jax.Array, n_theta: int = 180) -> Tuple[jax.Array, jax.Array]:
    """Yaw of ``b`` relative to ``a`` from polar spectra (± π ambiguity is
    resolved by the caller via correlation score)."""
    pa = _log_polar_spectrum(a, n_theta)
    pb = _log_polar_spectrum(b, n_theta)
    # correlate along theta (circular)
    fa = jnp.fft.rfft(pa, axis=0)
    fb = jnp.fft.rfft(pb, axis=0)
    cross = fa * jnp.conj(fb)
    corr = jnp.fft.irfft(cross, n=n_theta, axis=0).sum(axis=1)
    shift = jnp.argmax(corr)
    shift = jnp.where(shift > n_theta // 2, shift - n_theta, shift)
    yaw = shift.astype(a.dtype) * (jnp.pi / n_theta)
    conf = jnp.max(corr) / jnp.maximum(jnp.mean(jnp.abs(corr)), 1e-12)
    return yaw, conf


def rotate_points_z(points: jax.Array, yaw: jax.Array) -> jax.Array:
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x = c * points[..., 0] - s * points[..., 1]
    y = s * points[..., 0] + c * points[..., 1]
    return jnp.stack([x, y, points[..., 2]], axis=-1)


@functools.partial(jax.jit, static_argnames=("config",))
def register_bev(
    points_a: jax.Array,
    mask_a: jax.Array,
    points_b: jax.Array,
    mask_b: jax.Array,
    config: BEVConfig = BEVConfig(),
) -> PlanarRegistration:
    """Planar registration of two local point clouds via BEV spectral matching.

    Returns (yaw, txy, confidence) with ``p_a ≈ Rz(yaw)·p_b + t``. The polar
    spectrum has a π ambiguity; both hypotheses are tested by phase
    correlation and the stronger peak wins. (TPU-native replacement for
    ``ElevationImageRegistration.align_2d``.)
    """
    img_a = build_elevation_image(points_a, config, mask_a)
    win = _hann2d(config.image_size, img_a.dtype)
    img_a = img_a * win
    yaw0, _ = estimate_yaw(img_a, build_elevation_image(points_b, config, mask_b) * win)

    def score(yaw):
        img_b = build_elevation_image(rotate_points_z(points_b, yaw), config, mask_b)
        shift, conf = _phase_correlate(img_a, img_b * win)
        return shift, conf

    s0, c0 = score(yaw0)
    s1, c1 = score(yaw0 + jnp.pi)
    use1 = c1 > c0
    yaw = jnp.where(use1, yaw0 + jnp.pi, yaw0)
    shift = jnp.where(use1, s1, s0)
    conf = jnp.maximum(c0, c1)
    translation = shift * config.pixel_size  # (dx, dy) in meters
    return PlanarRegistration(yaw=yaw, translation=translation, confidence=conf)


def planar_to_pose(reg: PlanarRegistration, dtype=jnp.float32) -> jax.Array:
    """(yaw, txy) → 4×4 SE(3) with ``p_a ≈ T · p_b``."""
    from pwclonet_pylidarslam_tpu.core import se3

    c, s = jnp.cos(reg.yaw), jnp.sin(reg.yaw)
    r = jnp.asarray(
        [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], dtype
    )
    t = jnp.asarray([reg.translation[0], reg.translation[1], 0.0], dtype)
    return se3.make_pose(r, t)
