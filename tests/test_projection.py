"""Tests for spherical projection, z-buffering, normal maps, projective NN."""

import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import geometry, projection


def make_projector():
    return projection.SphericalProjector(
        height=64, width=720, min_vertical_fov=3.0, max_vertical_fov=-24.0
    )


def ring_cloud(rng, n=5000, rmin=3.0, rmax=50.0):
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.deg2rad(-23.5), np.deg2rad(2.5), n)
    r = rng.uniform(rmin, rmax, n)
    return np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)], -1
    ).astype(np.float32)


def test_pixel_coords_in_bounds(rng):
    pts = jnp.asarray(ring_cloud(rng)[None])
    proj = make_projector()
    row, col, r = proj.project(pts)
    assert np.all(np.asarray(row) >= 0)
    assert np.all(np.asarray(row) <= 64)
    assert np.all(np.asarray(col) >= 0)
    assert np.all(np.asarray(col) <= 720)
    np.testing.assert_allclose(
        np.asarray(r)[0], np.linalg.norm(np.asarray(pts)[0], axis=-1), atol=1e-5
    )


def test_invalid_points_get_negative_coords():
    pts = jnp.zeros((1, 10, 3))
    row, col, r = make_projector().project(pts)
    assert np.all(np.asarray(row) == -1.0)
    assert np.all(np.asarray(col) == -1.0)
    assert np.all(np.asarray(r) == 0.0)


def test_zbuffer_nearest_wins():
    # two points projecting to the same pixel: the nearer must win
    p_near = np.array([10.0, 0.0, -1.0])
    p_far = p_near * 3.0
    pts = jnp.asarray(np.stack([p_far, p_near])[None].astype(np.float32))
    vmap = make_projector().build_projection_map(pts)
    vm = np.asarray(vmap)[0]
    nz = vm[np.linalg.norm(vm, axis=-1) > 0]
    assert nz.shape == (1, 3)
    np.testing.assert_allclose(nz[0], p_near, atol=1e-5)


def test_zbuffer_deterministic_tiebreak():
    # identical points: lowest index wins; result must be reproducible
    p = np.array([10.0, 0.0, -1.0], np.float32)
    pts = jnp.asarray(np.stack([p, p, p])[None])
    vm1 = np.asarray(make_projector().build_projection_map(pts))
    vm2 = np.asarray(make_projector().build_projection_map(pts))
    np.testing.assert_array_equal(vm1, vm2)


def test_roundtrip_points_survive(rng):
    pts_np = ring_cloud(rng, 2000)
    vmap = make_projector().build_projection_map(jnp.asarray(pts_np[None]))
    flat, mask = projection.vmap_to_points(vmap)
    got = np.asarray(flat)[0][np.asarray(mask)[0] > 0]
    # every surviving pixel must be an actual input point
    d = np.abs(got[:, None, :] - pts_np[None, :, :]).sum(-1).min(1)
    assert d.max() < 1e-4
    # occupancy should be substantial for a dense ring cloud
    assert got.shape[0] > 1000


def test_extra_channels_ride_along(rng):
    pts_np = ring_cloud(rng, 500)
    intensities = rng.uniform(size=(500, 1)).astype(np.float32)
    vmap = make_projector().build_projection_map(
        jnp.asarray(pts_np[None]), jnp.asarray(intensities[None])
    )
    assert vmap.shape[-1] == 4
    vm = np.asarray(vmap)[0]
    occupied = np.linalg.norm(vm[..., :3], axis=-1) > 0
    # channel values at occupied pixels must come from the input set
    vals = vm[occupied][:, 3]
    assert np.all(np.isin(np.round(vals, 5), np.round(intensities[:, 0], 5)))


def test_normal_map_flat_ground():
    # synthetic ground plane at z = -1.7 sampled like a scan
    rng = np.random.default_rng(0)
    xy = rng.uniform(-20, 20, size=(4000, 2))
    keep = np.linalg.norm(xy, axis=-1) > 4.0
    pts = np.concatenate(
        [xy[keep], np.full((keep.sum(), 1), -1.7)], axis=-1
    ).astype(np.float32)
    proj = make_projector()
    vmap = proj.build_projection_map(jnp.asarray(pts[None]))
    normals = np.asarray(geometry.compute_normal_map(vmap, kernel_size=5))[0]
    valid = np.linalg.norm(normals, axis=-1) > 0.5
    assert valid.sum() > 100
    nz = np.abs(normals[valid][:, 2])
    # most valid normals on a flat ground must be near ±z
    assert np.quantile(nz, 0.25) > 0.95


def test_compute_neighbors_picks_closest():
    h, w = 4, 4
    tgt = np.zeros((1, h, w, 3), np.float32)
    tgt[0, 1, 1] = [1.0, 1.0, 1.0]
    ref = np.zeros((3, h, w, 3), np.float32)
    ref[0, 1, 1] = [5.0, 5.0, 5.0]
    ref[1, 1, 1] = [1.1, 1.0, 1.0]  # closest
    ref[2, 1, 1] = [0.0, 0.0, 0.0]  # invalid
    fields = np.zeros((3, h, w, 2), np.float32)
    fields[1, 1, 1] = [7.0, 8.0]
    nbrs, f = geometry.compute_neighbors(
        jnp.asarray(tgt), jnp.asarray(ref), jnp.asarray(fields)
    )
    np.testing.assert_allclose(np.asarray(nbrs)[0, 1, 1], [1.1, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(f)[0, 1, 1], [7.0, 8.0], atol=1e-6)
    # pixels with no valid target stay zero
    assert np.all(np.asarray(nbrs)[0, 0, 0] == 0)


def test_estimate_timestamps_monotonic_over_sweep():
    az = np.linspace(np.pi - 1e-3, -np.pi + 1e-3, 100)  # clockwise sweep
    pts = np.stack([np.cos(az), np.sin(az), np.zeros(100)], -1)
    frac = np.asarray(geometry.estimate_timestamps(jnp.asarray(pts)))
    assert np.all(np.diff(frac) > 0)
    assert frac[0] < 0.01 and frac[-1] > 0.99
