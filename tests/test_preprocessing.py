"""Preprocessing filter tests: de-skew, grid sampling, voxel statistics."""

import pytest
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.core.pointcloud import (
    grid_sample_fixed,
    grid_sample_mask,
    voxel_statistics,
)
from pwclonet_pylidarslam_tpu.slam.preprocessing import (
    Preprocessing,
    PreprocessingConfig,
    deskew,
)


@pytest.mark.slow
def test_deskew_corrects_constant_motion(rng):
    """Points acquired during a constant-velocity sweep, each at its sweep
    fraction, must land on the static scene after de-skew."""
    n = 720
    az = np.linspace(np.pi - 1e-3, -np.pi + 1e-3, n)  # clockwise sweep, frac 0→1
    static = np.stack([20 * np.cos(az), 20 * np.sin(az), np.zeros(n)], -1)
    frac = (np.pi - az) / (2 * np.pi)
    rel = np.asarray(se3.exp(jnp.asarray([2.0, 0.0, 0.0, 0.0, 0.0, 0.05])))
    # simulate skew: the sensor has moved by frac*motion when point i is taken,
    # so the measured point is inv(pose(frac)) @ static
    measured = np.zeros_like(static)
    for i in range(n):
        p = np.asarray(se3.exp(jnp.asarray(frac[i] * np.asarray([2.0, 0, 0, 0, 0, 0.05]))))
        measured[i] = (np.linalg.inv(p) @ np.append(static[i], 1.0))[:3]
    fixed = np.asarray(
        deskew(jnp.asarray(measured, jnp.float64), jnp.asarray(rel),
               timestamps=jnp.asarray(frac))
    )
    err_before = np.linalg.norm(measured - static, axis=1)
    err_after = np.linalg.norm(fixed - static, axis=1)
    assert err_before.max() > 1.0  # skew is visible
    assert err_after.max() < 0.05  # and corrected


def test_deskew_identity_motion_is_noop(rng):
    pts = jnp.asarray(rng.normal(size=(100, 3)))
    out = deskew(pts, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


def test_grid_sample_mask_one_per_voxel(rng):
    pts = jnp.asarray(rng.uniform(0, 4, size=(500, 3)))
    mask = grid_sample_mask(pts, 1.0)
    kept = np.asarray(pts)[np.asarray(mask)]
    vox = np.round(kept / 1.0).astype(int)
    uniq = np.unique(vox, axis=0)
    assert len(uniq) == len(kept)  # exactly one representative per voxel
    # all occupied voxels are represented
    all_vox = np.unique(np.round(np.asarray(pts)).astype(int), axis=0)
    assert len(uniq) == len(all_vox)


def test_grid_sample_fixed_shapes(rng):
    pts = jnp.asarray(rng.uniform(0, 3, size=(300, 3)).astype(np.float32))
    sampled, ok = grid_sample_fixed(pts, 1.0, 64)
    assert sampled.shape == (64, 3)
    n_valid = int(np.asarray(ok).sum())
    assert 0 < n_valid <= 64
    assert np.all(np.asarray(sampled)[n_valid:] == 0)


def test_voxel_statistics_means(rng):
    # two well-separated clusters -> two segments with correct means
    a = rng.normal(size=(200, 3)) * 0.05 + np.array([0, 0, 0])
    b = rng.normal(size=(100, 3)) * 0.05 + np.array([10, 0, 0])
    pts = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    stats = voxel_statistics(pts, 1.0, max_voxels=16)
    counts = np.asarray(stats.counts)
    occupied = counts > 0
    assert occupied.sum() == 2
    means = np.asarray(stats.means)[occupied]
    got = sorted(round(float(m[0])) for m in means)
    assert got == [0, 10]
    np.testing.assert_allclose(sorted(counts[occupied]), [100, 200])


@pytest.mark.slow
def test_preprocessing_compose(rng):
    pts = jnp.asarray(rng.uniform(-5, 5, size=(400, 3)).astype(np.float32))
    mask = jnp.ones(400, jnp.float32)
    pre = Preprocessing(PreprocessingConfig(deskew=True, grid_sample_voxel=1.0))
    rel = jnp.asarray(np.eye(4), jnp.float32)
    out_pts, out_mask = pre(pts, mask, init_rpose=rel)
    assert out_pts.shape == pts.shape
    assert 0 < float(out_mask.sum()) < 400  # grid sampling reduced density
