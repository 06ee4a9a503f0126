"""KITTI reader tests against a fabricated mini-dataset on disk."""

import os

import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.data import kitti


@pytest.fixture(scope="module")
def fake_kitti(tmp_path_factory):
    """Build a 2-sequence fake KITTI tree with known geometry + poses."""
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(0)
    tr = np.eye(4)
    # a realistic velo->cam: swap axes (cam: x right, y down, z forward)
    tr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    tr[:3, 3] = [0.05, -0.08, 0.27]

    for seq in (0, 1):
        seq_dir = root / "sequences" / f"{seq:02d}"
        (seq_dir / "velodyne").mkdir(parents=True)
        with open(seq_dir / "calib.txt", "w") as f:
            f.write("P0: " + " ".join(["0"] * 12) + "\n")
            f.write("Tr: " + " ".join(str(v) for v in tr[:3, :4].reshape(-1)) + "\n")
        n_frames = 5
        poses = []
        world = np.concatenate(
            [
                rng.uniform(-25, 25, size=(4000, 1)),
                rng.uniform(-25, 25, size=(4000, 1)),
                rng.uniform(-1.6, 2.0, size=(4000, 1)),
            ],
            axis=-1,
        )
        for t in range(n_frames):
            # vehicle moves 1.5 m/frame along +x (lidar frame)
            lidar_pose = np.eye(4)
            lidar_pose[0, 3] = 1.5 * t
            # scan = world points in lidar frame + reflectance
            pts_lidar = (np.linalg.inv(lidar_pose) @ np.concatenate(
                [world, np.ones((4000, 1))], -1).T).T[:, :3]
            scan = np.concatenate(
                [pts_lidar, rng.uniform(size=(4000, 1))], -1
            ).astype(np.float32)
            scan.tofile(seq_dir / "velodyne" / f"{t:06d}.bin")
            poses.append(tr @ lidar_pose @ np.linalg.inv(tr))  # cam pose
        poses_dir = root / "poses"
        poses_dir.mkdir(exist_ok=True)
        np.savetxt(poses_dir / f"{seq:02d}.txt", np.stack(poses)[:, :3, :4].reshape(n_frames, 12))
    return str(root)


def test_read_scan_roundtrip(fake_kitti):
    scan = kitti.read_scan(
        os.path.join(fake_kitti, "sequences", "00", "velodyne", "000000.bin")
    )
    assert scan.shape == (4000, 4)
    assert scan.dtype == np.float32


def test_sequence_gt_in_lidar_frame(fake_kitti):
    seq = kitti.KittiSequence(fake_kitti, 0, apply_correction=False)
    assert len(seq) == 5
    gt = seq.ground_truth()
    # constructed motion: 1.5 m/frame along lidar +x
    np.testing.assert_allclose(gt[1][:3, 3], [1.5, 0, 0], atol=1e-9)
    np.testing.assert_allclose(gt[4][:3, 3], [6.0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(gt[2][:3, :3], np.eye(3), atol=1e-9)


def test_correct_scan_small_rotation(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32) * 20
    out = kitti.correct_scan(pts)
    # norms preserved (pure per-point rotation)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), np.linalg.norm(pts, axis=1), rtol=1e-5
    )
    # angle between in/out is exactly 0.205 degrees
    cos = np.sum(out * pts, axis=1) / (np.linalg.norm(out, axis=1) * np.linalg.norm(pts, axis=1))
    ang = np.rad2deg(np.arccos(np.clip(cos, -1, 1)))
    np.testing.assert_allclose(ang, 0.205, atol=5e-3)  # float32 noise at 20 m scale


def test_pair_dataset_gt_alignment(fake_kitti):
    ds = kitti.KittiPairDataset(fake_kitti, [0], num_points=1024, augment=False, seed=1)
    assert len(ds) == 5
    item = ds[3]
    assert item["xyz1"].shape == (1024, 3)
    assert item["gt_params"].shape == (7,)
    # applying the GT transform to xyz1 (current) must land on frame i1's
    # cloud: verify via known translation (1.5 m along lidar x = cam z)
    t = item["gt_params"][:3]
    np.testing.assert_allclose(np.abs(t), [0, 0, 1.5], atol=1e-6)
    q = item["gt_params"][3:]
    np.testing.assert_allclose(np.abs(q), [1, 0, 0, 0], atol=1e-6)


def test_pair_dataset_gt_warp_closes(fake_kitti):
    """The supervised contract: T(gt) · xyz1 points lie inside frame i1's cloud."""
    import jax.numpy as jnp

    from pwclonet_pylidarslam_tpu.core import se3

    ds = kitti.KittiPairDataset(fake_kitti, [0], num_points=512, augment=True, seed=2)
    item = ds[2]
    gt_pose = se3.params_to_pose_quat(jnp.asarray(item["gt_params"], jnp.float64))
    warped = np.asarray(se3.transform(gt_pose, jnp.asarray(item["xyz1"], jnp.float64)))
    # compare against the FULL previous-frame cloud (the sampled xyz2 subset
    # usually misses the exact matches)
    scan1 = kitti.read_scan(
        os.path.join(fake_kitti, "sequences", "00", "velodyne", "000001.bin")
    )[:, :3]
    tr = kitti.load_tr(fake_kitti, 0)
    prev_full = (tr @ np.concatenate([scan1, np.ones((len(scan1), 1))], -1).T).T[:, :3]
    d = np.sqrt(((warped[:, None, :] - prev_full[None, :, :]) ** 2).sum(-1)).min(1)
    # same world points in both frames -> nearest neighbor ~ 0
    assert np.median(d) < 1e-3


def test_pair_dataset_batches(fake_kitti):
    ds = kitti.KittiPairDataset(fake_kitti, [0, 1], num_points=256, seed=3)
    batches = list(ds.batches(4))
    assert len(batches) == 2  # 10 items -> 2 full batches of 4
    assert batches[0]["xyz1"].shape == (4, 256, 3)
    assert batches[0]["gt_params"].shape == (4, 7)
