"""PLY readers + CT-ICP-format dataset sequences (PLY_DIR / KITTI-CARLA)."""

import os

import numpy as np

from pwclonet_pylidarslam_tpu.data.other_datasets import (
    KittiCarlaSequence,
    PLYDirSequence,
    read_ply,
    read_ply_xyz,
    write_ply,
)


def _cloud(rng, n=100, with_time=True, with_label=False):
    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if with_time:
        fields.append(("timestamp", "<f8"))
    if with_label:
        fields.append(("semantic", "<u4"))
    data = np.zeros(n, dtype=np.dtype(fields))
    data["x"] = rng.normal(size=n)
    data["y"] = rng.normal(size=n)
    data["z"] = rng.normal(size=n)
    if with_time:
        data["timestamp"] = np.sort(rng.uniform(10.0, 10.1, size=n))
    if with_label:
        data["semantic"] = rng.integers(0, 20, size=n)
    return data


def test_ply_roundtrip_mixed_dtypes(tmp_path, rng):
    data = _cloud(rng, with_label=True)
    path = str(tmp_path / "c.ply")
    write_ply(path, data)
    back = read_ply(path)
    assert back.dtype.names == data.dtype.names
    np.testing.assert_allclose(back["x"], data["x"])
    np.testing.assert_allclose(back["timestamp"], data["timestamp"])
    np.testing.assert_array_equal(back["semantic"], data["semantic"])
    xyz = read_ply_xyz(path)
    np.testing.assert_allclose(xyz[:, 1], data["y"], rtol=1e-6)


def test_ply_dir_sequence(tmp_path, rng):
    scan_dir = tmp_path / "frames"
    scan_dir.mkdir()
    clouds = [_cloud(rng) for _ in range(3)]
    for i, c in enumerate(clouds):
        write_ply(str(scan_dir / f"frame_{i:04d}.ply"), c)
    # KITTI-style 12-float pose rows
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, 0, 3] = [0.0, 1.0, 2.0]
    np.savetxt(str(tmp_path / "poses.txt"), poses[:, :3, :4].reshape(3, 12))

    seq = PLYDirSequence(str(scan_dir), str(tmp_path / "poses.txt"))
    assert len(seq) == 3
    np.testing.assert_allclose(seq.scan(1)[:, 0], clouds[1]["x"], rtol=1e-6)
    pts, alphas = seq.scan_with_timestamps(2)
    assert alphas is not None and alphas.min() == 0.0 and alphas.max() == 1.0
    gt = seq.ground_truth()
    # rebased into frame 0
    np.testing.assert_allclose(gt[0], np.eye(4), atol=1e-9)
    np.testing.assert_allclose(gt[2, 0, 3], 2.0, atol=1e-9)


def test_kitti_carla_sequence_nearest_timestamp_gt(tmp_path, rng):
    town = tmp_path / "Town03"
    frames = town / "frames"
    frames.mkdir(parents=True)
    # two frames ending at t≈10.1 and t≈20.1
    for i, t0 in enumerate((10.0, 20.0)):
        c = _cloud(rng, n=50)
        c["timestamp"] = np.linspace(t0, t0 + 0.1, 50)
        write_ply(str(frames / f"frame_{i:04d}.ply"), c)
    # timestamped pose log at 5 Hz: timestamp + 12 pose floats
    times = np.arange(9.9, 20.6, 0.2)
    poses = np.tile(np.eye(4), (len(times), 1, 1))
    poses[:, 1, 3] = times  # y encodes time so we can check the selection
    rows = np.concatenate([times[:, None], poses[:, :3, :4].reshape(-1, 12)], axis=1)
    np.savetxt(str(town / "full_poses.txt"), rows)

    seq = KittiCarlaSequence(str(tmp_path), town=3)
    assert len(seq) == 2
    gt = seq.ground_truth()
    np.testing.assert_allclose(gt[0], np.eye(4), atol=1e-9)
    # frame 1 ends at 20.1 → nearest pose row y≈20.1; rebased against ≈10.1
    assert abs(gt[1, 1, 3] - 10.0) < 0.21
