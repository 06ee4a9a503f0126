"""Reader tests for KITTI-360 / NCLT / Ford / NHCD against fabricated files."""

import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from pwclonet_pylidarslam_tpu.data import other_datasets as od


def test_kitti360_sequence(tmp_path):
    drive = od.kitti360_drive_name(0)
    velo = tmp_path / "data_3d_raw" / drive / "velodyne_points" / "data"
    velo.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for t in range(4):
        np.concatenate(
            [rng.normal(size=(100, 3)), np.ones((100, 1))], -1
        ).astype(np.float32).tofile(velo / f"{t:010d}.bin")
    poses_dir = tmp_path / "data_poses" / drive
    poses_dir.mkdir(parents=True)
    rows = []
    for t in (0, 2):  # sparse GT like the real dataset
        pose = np.eye(4)
        pose[0, 3] = 2.0 * t
        rows.append(np.concatenate([[t], pose[:3, :4].reshape(-1)]))
    np.savetxt(poses_dir / "poses.txt", np.stack(rows))
    (tmp_path / "calibration").mkdir()
    np.savetxt(
        tmp_path / "calibration" / "calib_cam_to_velo.txt",
        np.eye(4)[:3].reshape(-1)[None],
    )

    seq = od.Kitti360Sequence(str(tmp_path), 0)
    assert len(seq) == 4
    assert seq.scan(1).shape == (100, 3)
    gt = seq.ground_truth()
    assert gt.shape == (4, 4, 4)
    np.testing.assert_allclose(gt[2][0, 3], 4.0, atol=1e-9)


def test_nclt_decode_roundtrip(tmp_path):
    # encode known xyz into the packed uint16 format
    xyz = np.array([[1.5, -2.0, 0.25], [10.0, 20.0, -1.0]], np.float32)
    packed = np.round((xyz + 100.0) / 0.005).astype(np.uint16)
    rec = np.concatenate([packed, np.zeros((2, 1), np.uint16)], -1)
    sess = "2012-01-08"
    vdir = tmp_path / sess / "velodyne_sync"
    vdir.mkdir(parents=True)
    rec.tofile(vdir / "1326030000000000.bin")
    rec.tofile(vdir / "1326030000100000.bin")
    gt = np.zeros((3, 7))
    gt[:, 0] = [1326029999000000, 1326030000000000, 1326030000200000]
    gt[:, 1] = [0.0, 1.0, 2.0]  # x positions
    np.savetxt(tmp_path / sess / f"groundtruth_{sess}.csv", gt, delimiter=",")

    seq = od.NCLTSequence(str(tmp_path), sess)
    assert len(seq) == 2
    np.testing.assert_allclose(seq.scan(0), xyz, atol=0.005)
    poses = seq.ground_truth()
    assert poses.shape == (2, 4, 4)
    # rebased at first frame
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)


def test_nhcd_ply_and_gt(tmp_path):
    scan_dir = tmp_path / "01_short" / "raw_format" / "ouster_scan"
    scan_dir.mkdir(parents=True)
    pts = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
    header = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 50\n"
        b"property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    for t, name in enumerate(["cloud_1000_000000000.ply", "cloud_1001_000000000.ply"]):
        with open(scan_dir / name, "wb") as f:
            f.write(header)
            f.write(pts.astype("<f4").tobytes())
    gt_dir = tmp_path / "01_short" / "ground_truth"
    gt_dir.mkdir(parents=True)
    quat = R.from_rotvec([[0, 0, 0.0], [0, 0, 0.1]]).as_quat()  # xyzw
    rows = np.zeros((2, 9))
    rows[:, 0] = [1000, 1001]
    rows[:, 2] = [0.0, 1.0]
    rows[:, 5:9] = quat
    np.savetxt(gt_dir / "registered_poses.csv", rows, delimiter=",",
               header="sec,nsec,x,y,z,qx,qy,qz,qw")

    seq = od.NHCDSequence(str(tmp_path), "01_short")
    assert len(seq) == 2
    np.testing.assert_allclose(seq.scan(0), pts, atol=1e-6)
    gt = seq.ground_truth()
    np.testing.assert_allclose(gt[0], np.eye(4), atol=1e-9)
    np.testing.assert_allclose(gt[1][0, 3], 1.0, atol=1e-9)


def test_ply_ascii_variant(tmp_path):
    path = tmp_path / "a.ply"
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\nend_header\n"
            "1.0 2.0 3.0\n4.0 5.0 6.0\n"
        )
    pts = od.read_ply_xyz(str(path))
    np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])


def test_ford_sequence(tmp_path):
    from scipy.io import savemat

    scan_dir = tmp_path / "SCANS"
    scan_dir.mkdir()
    rng = np.random.default_rng(2)
    for t in range(2):
        xyz = rng.normal(size=(3, 40))
        savemat(
            scan_dir / f"Scan{t:04d}.mat",
            {"SCAN": {"XYZ": xyz, "X_wv": np.array([t * 1.0, 0, 0, 0, 0, 0])}},
        )
    seq = od.FordCampusSequence(str(tmp_path))
    assert len(seq) == 2
    assert seq.scan(0).shape == (40, 3)
    gt = seq.ground_truth()
    np.testing.assert_allclose(gt[1][0, 3], 1.0, atol=1e-9)


def test_kitti360_pair_dataset(tmp_path):
    import jax.numpy as jnp

    from pwclonet_pylidarslam_tpu.core import se3

    drive = od.kitti360_drive_name(3)
    velo = tmp_path / "data_3d_raw" / drive / "velodyne_points" / "data"
    velo.mkdir(parents=True)
    rng = np.random.default_rng(5)
    # world points within the cam-frame near box after identity calib
    world = np.concatenate(
        [rng.uniform(-20, 20, (3000, 2)), rng.uniform(-1.0, 1.0, (3000, 1))], -1
    )
    rows = []
    for t in range(4):
        pose = np.eye(4)
        pose[0, 3] = 1.2 * t
        pts = (np.linalg.inv(pose) @ np.concatenate(
            [world, np.ones((3000, 1))], -1).T).T[:, :3]
        np.concatenate([pts, np.ones((3000, 1))], -1).astype(np.float32).tofile(
            velo / f"{t:010d}.bin")
        rows.append(np.concatenate([[t], pose[:3, :4].reshape(-1)]))
    poses_dir = tmp_path / "data_poses" / drive
    poses_dir.mkdir(parents=True)
    np.savetxt(poses_dir / "poses.txt", np.stack(rows))
    (tmp_path / "calibration").mkdir()
    np.savetxt(tmp_path / "calibration" / "calib_cam_to_velo.txt",
               np.eye(4)[:3].reshape(-1)[None])

    ds = od.Kitti360PairDataset(str(tmp_path), (3,), num_points=512, seed=0)
    assert len(ds) == 4
    item = ds[2]
    assert item["xyz1"].shape == (512, 3)
    # GT warp closes onto the previous frame's full cloud
    gt_pose = se3.params_to_pose_quat(jnp.asarray(item["gt_params"], jnp.float64))
    warped = np.asarray(se3.transform(gt_pose, jnp.asarray(item["xyz1"], jnp.float64)))
    prev_full = (np.linalg.inv(np.eye(4)) @ np.concatenate(
        [world, np.ones((3000, 1))], -1).T).T[:, :3]
    # previous frame (t=1): world seen from x=1.2
    pose1 = np.eye(4); pose1[0, 3] = 1.2
    prev_full = (np.linalg.inv(pose1) @ np.concatenate(
        [world, np.ones((3000, 1))], -1).T).T[:, :3]
    d = np.sqrt(((warped[:, None, :] - prev_full[None, :, :]) ** 2).sum(-1)).min(1)
    assert np.median(d) < 1e-3
    b = next(ds.batches(2))
    assert b["xyz1"].shape == (2, 512, 3)


def test_train_net_kitti360_wiring(tmp_path):
    """train_net make_batch_fns(dataset=kitti360) yields pwclonet batches
    (ref train.py:337-345 builds Kitti360Dataset for the same recipe)."""
    drive = od.kitti360_drive_name(3)
    velo = tmp_path / "data_3d_raw" / drive / "velodyne_points" / "data"
    velo.mkdir(parents=True)
    rng = np.random.default_rng(5)
    rows = []
    for t in range(5):
        pts = np.concatenate(
            [rng.uniform(-20, 20, (2000, 2)), rng.uniform(-1.0, 1.0, (2000, 1))], -1
        )
        np.concatenate([pts, np.ones((2000, 1))], -1).astype(np.float32).tofile(
            velo / f"{t:010d}.bin")
        pose = np.eye(4)
        pose[0, 3] = 1.2 * t
        rows.append(np.concatenate([[t], pose[:3, :4].reshape(-1)]))
    poses_dir = tmp_path / "data_poses" / drive
    poses_dir.mkdir(parents=True)
    np.savetxt(poses_dir / "poses.txt", np.stack(rows))
    (tmp_path / "calibration").mkdir()
    np.savetxt(tmp_path / "calibration" / "calib_cam_to_velo.txt",
               np.eye(4)[:3].reshape(-1)[None])

    import train_net

    cfg = train_net.Config(
        dataset="kitti360", root_dir=str(tmp_path),
        train_sequences="3", eval_sequences="3",
        num_points=256, batch_size=2,
    )
    train_fn, eval_fn = train_net.make_batch_fns(cfg, None)
    batch = next(train_fn())
    assert batch["xyz1"].shape == (2, 256, 3)
    assert batch["gt_params"].shape == (2, 7)
