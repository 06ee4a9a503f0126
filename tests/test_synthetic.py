"""Hardened synthetic-world tests (VERDICT round-1 item 1b).

The synthetic generator is the accuracy-parity evidence base — these tests
pin down the failure modes it must simulate (dynamic objects, rough ground,
occlusions, 64-beam sensor, KITTI-like motion) and that the device-batched
raycaster agrees with the reference numpy ray-caster.
"""

import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.data import synthetic as S


def test_device_caster_matches_numpy_raycast():
    poses = S.make_trajectory("curve", 4, speed=1.0)
    rects = S.default_world(seed=1)
    dirs = S.lidar_directions(16, 180)
    caster = S.FrameRaycaster(rects)
    ranges_dev, idx_dev = caster.cast_all(poses, dirs)
    for t in range(poses.shape[0]):
        d_world = dirs @ poses[t, :3, :3].T
        r_np, i_np = S.raycast_hits(S.RectSoA(rects), poses[t, :3, 3], d_world)
        hit = np.isfinite(r_np)
        assert np.array_equal(hit, np.isfinite(ranges_dev[t]))
        np.testing.assert_allclose(ranges_dev[t][hit], r_np[hit], rtol=2e-4, atol=2e-3)
        # ties between coplanar rects may resolve differently; ranges match
        same = i_np[hit] == idx_dev[t][hit]
        assert same.mean() > 0.99


def test_kitti_drive_motion_profile():
    poses = S.make_trajectory("kitti_drive", 995, speed=1.0)
    d = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=-1)
    # stop-start: some standstill frames AND some >1.2 m/frame (12 m/s) frames
    assert (d < 1e-6).sum() >= 10
    assert (d > 1.2).sum() >= 50
    # total yaw swept includes two ~90 deg turns in opposite directions
    yaw = np.unwrap(np.arctan2(poses[:, 1, 0], poses[:, 0, 0]))
    assert yaw.min() < np.deg2rad(-80)
    assert yaw.max() - yaw.min() > np.deg2rad(120)
    # ~870 m of travel -> supports several KITTI protocol segment lengths
    assert 700 < d.sum() < 1100


def test_kitti_world_has_dynamics_and_roughness():
    poses = S.make_trajectory("kitti_drive", 300, speed=1.0)
    rects, dynamics = S.kitti_world(poses, seed=3)
    assert len(dynamics) >= 2, "moving traffic must be present"
    rough = np.array([r.roughness for r in rects])
    assert rough.max() >= 0.03 and rough.min() <= 0.01, "mixed surface roughness"
    # dynamic boxes actually move
    d = dynamics[0]
    p0 = d.rects_at(0)[0].origin
    p10 = d.rects_at(10)[0].origin
    assert np.linalg.norm(p10 - p0) > 1.0


def test_kitti_preset_generates_dense_64beam_scans():
    cfg = S.kitti_preset(n_frames=8)
    assert cfg.num_beams == 64 and cfg.fov_down_deg == -24.8
    scans, times, poses = S.generate_sequence_with_times(cfg)
    valid = np.linalg.norm(scans, axis=-1) > 1e-3
    assert valid.sum(axis=1).min() > 6000
    # dynamic traffic: consecutive static-world scans would differ only by
    # noise; just assert shape/time sanity here (dynamics tested above)
    assert times.max() < 1.0 and times.min() >= 0.0
    assert np.isfinite(poses).all()


def test_dynamic_object_points_move_between_frames():
    # a single moving box in an otherwise empty world: the scan centroid of
    # non-ground points must track the box motion
    ground = [
        S.Rect(
            np.array([-100.0, -100.0, -1.7]),
            np.array([200.0, 0, 0]),
            np.array([0, 200.0, 0]),
        )
    ]
    box = S.DynamicBox(
        center=np.array([10.0, 0.0, -0.9]),
        size=np.array([3.0, 2.0, 1.6]),
        velocity=np.array([0.0, 0.5, 0.0]),
    )
    cfg = S.SyntheticSequenceConfig(
        n_frames=5, trajectory="straight", speed=0.0, noise_std=0.0,
        dropout=0.0, num_beams=16, num_cols=360, world="corridor",
    )
    # build via the private path: static world + dynamics
    import dataclasses

    rng_world = ground
    dirs = S.lidar_directions(cfg.num_beams, cfg.num_cols)
    dyn_rects = [r for t in range(cfg.n_frames) for r in box.rects_at(t)]
    caster = S.FrameRaycaster(rng_world + dyn_rects, n_static=len(rng_world))
    poses = S.make_trajectory("straight", cfg.n_frames, speed=0.0)
    extra = [
        np.arange(len(rng_world) + t * 5, len(rng_world) + (t + 1) * 5)
        for t in range(cfg.n_frames)
    ]
    ranges, idx = caster.cast_all(poses, dirs, extra)
    ys = []
    for t in range(cfg.n_frames):
        hit = np.isfinite(ranges[t]) & (idx[t] >= len(rng_world))  # box hits
        assert hit.sum() > 10
        pts = dirs[hit] * ranges[t][hit, None]
        ys.append(pts[:, 1].mean())
    dy = np.diff(ys)
    assert (dy > 0.3).all() and (dy < 0.7).all(), f"box should drift +0.5 m/frame in y, got {dy}"
