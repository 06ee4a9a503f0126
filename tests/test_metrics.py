"""Tests for KITTI odometry metrics against hand-computed values."""

import numpy as np

from pwclonet_pylidarslam_tpu.evaluation import metrics


def straight_trajectory(n, step=1.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * step
    return poses


def test_relative_absolute_roundtrip(rng):
    from scipy.spatial.transform import Rotation as R

    n = 20
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = R.random(n, random_state=3).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(n, 3)) * 10
    rel = metrics.compute_relative_poses(poses)
    # compute_absolute_poses rebuilds the chain starting from rel[0] = I,
    # i.e. re-based at the first pose
    rebuilt = np.einsum("ij,tjk->tik", poses[0], metrics.compute_absolute_poses(rel))
    np.testing.assert_allclose(rebuilt, poses, atol=1e-8)


def test_perfect_trajectory_zero_error():
    gt = straight_trajectory(2500, 1.0)  # 2.5 km -> all segments available
    tr, rot, errors = metrics.compute_kitti_metrics(gt.copy(), gt)
    assert len(errors) > 0
    assert tr == 0.0
    assert rot == 0.0
    md = metrics.metrics_dict(gt.copy(), gt)
    assert md["tr_err"] == 0.0 and md["ATE"] == 0.0


def test_known_scale_error():
    gt = straight_trajectory(1200, 1.0)
    pred = straight_trajectory(1200, 1.02)  # 2% overshoot
    tr, rot, _ = metrics.compute_kitti_metrics(pred, gt)
    # segment end frames overshoot the nominal length by up to one step,
    # so the measured ratio is 0.02 * (seg+1)/seg
    np.testing.assert_allclose(tr, 0.02, rtol=0.02)
    assert rot == 0.0


def test_short_trajectory_has_no_segments():
    gt = straight_trajectory(50, 1.0)  # 50 m < smallest 100 m segment
    tr, rot, errors = metrics.compute_kitti_metrics(gt.copy(), gt)
    assert tr is None and rot is None and errors == []


def test_ate_are_values():
    gt = straight_trajectory(10, 1.0)
    pred = gt.copy()
    pred[:, 1, 3] += 0.1 * np.arange(10)  # constant 0.1 m/frame lateral drift
    rel_p = metrics.compute_relative_poses(pred)
    rel_g = metrics.compute_relative_poses(gt)
    ate, std = metrics.compute_ate(rel_p, rel_g)
    np.testing.assert_allclose(ate, 0.09, atol=1e-9)  # 9 of 10 rel poses drift
    are, _ = metrics.compute_are(rel_p, rel_g)
    assert are == 0.0


def test_rotation_error_90deg():
    err_pose = np.eye(4)
    err_pose[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    np.testing.assert_allclose(metrics.rotation_error(err_pose), np.pi / 2, atol=1e-12)


def test_rescale_simple_fixes_scale_error():
    gt = straight_trajectory(1200, 1.0)
    pred = straight_trajectory(1200, 1.05)  # pure 5% scale error
    md = metrics.metrics_dict(pred, gt, mode="rescale_simple")
    assert md["tr_err"] < 1e-9 and md["ATE"] < 1e-12
    # unscaled for comparison
    md0 = metrics.metrics_dict(pred, gt)
    assert md0["tr_err"] > 4.9


def test_eval_rotation_and_translation_modes():
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(3)
    gt = straight_trajectory(1200, 1.0)
    pred = gt.copy()
    # corrupt rotations only
    for t in range(1, len(pred)):
        noise = np.eye(4)
        noise[:3, :3] = R.from_rotvec(0.002 * rng.normal(size=3)).as_matrix()
        pred[t] = pred[t] @ noise
    # eval_translation replaces rotations by GT -> translation metrics near zero
    md_t = metrics.metrics_dict(pred, gt, mode="eval_translation")
    assert md_t["ARE"] < 1e-12
    # eval_rotation replaces translations by GT
    md_r = metrics.metrics_dict(pred, gt, mode="eval_rotation")
    assert md_r["ATE"] < 1e-12 and md_r["ARE"] > 0


def test_unknown_mode_raises():
    gt = straight_trajectory(10, 1.0)
    rel = metrics.compute_relative_poses(gt)
    try:
        metrics.apply_eval_mode(rel, rel, "bogus")
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")


def test_devkit_report_artifacts(tmp_path):
    from scipy.spatial.transform import Rotation as R
    from pwclonet_pylidarslam_tpu.evaluation import results

    rng = np.random.default_rng(5)
    n = 1300
    gt = straight_trajectory(n, 1.0)
    for t in range(n):  # gentle yaw so rpy/3d plots are non-degenerate
        gt[t, :3, :3] = R.from_euler("z", 0.0005 * t).as_matrix()
    pred = gt.copy()
    pred[:, 0, 3] *= 1.01
    stats = results.write_devkit_report(str(tmp_path), "07", pred, gt)
    assert 0.005 < stats["ave_t_err"] < 0.02
    for suffix in ("xyz.png", "rpy.png", "path_2d.png", "path_3d.png",
                   "error.txt", "errors.png"):
        assert (tmp_path / f"07_{suffix}").exists(), suffix
    assert (tmp_path / "all_stats.txt").read_text().startswith("seq07 Average_t_error")
    # error.txt rows parse back
    rows = np.loadtxt(tmp_path / "07_error.txt")
    assert rows.shape[1] == 5 and len(rows) > 100


def test_to_camera_coord_roundtrip(rng):
    from pwclonet_pylidarslam_tpu.evaluation import results
    from scipy.spatial.transform import Rotation as R

    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, :3, :3] = R.random(5, random_state=np.random.RandomState(0)).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(5, 3))
    cam = results.to_camera_coord(poses)
    # conjugation preserves composition and is invertible
    back = results.to_camera_coord(np.linalg.inv(np.linalg.inv(cam)))
    np.testing.assert_allclose(
        np.linalg.inv(results.to_camera_coord(np.linalg.inv(poses))), cam, atol=1e-12
    )
    # z_lidar (up) maps to -y_cam (KITTI camera has y down)
    fwd = results.to_camera_coord(np.eye(4)[None].repeat(1, 0) * 1.0)
    t = np.eye(4); t[:3, 3] = [0, 0, 1]
    np.testing.assert_allclose(results.to_camera_coord(t[None])[0, :3, 3], [0, -1, 0], atol=1e-12)


def test_incremental_add_frames(tmp_path):
    """Per-100m incremental metric records (ref eval_odometry.py:539-654)."""
    import json
    import os

    from pwclonet_pylidarslam_tpu.evaluation.results import OdometryResults

    r = OdometryResults(str(tmp_path))
    gt = np.tile(np.eye(4), (300, 1, 1))
    gt[:, 0, 3] = 1.5 * np.arange(300)
    pred = gt.copy()
    pred[:, 1, 3] = 0.01 * np.arange(300)
    assert r.add_frames("s", pred[:50], gt[:50]) is None  # 73 m: no milestone
    rec = r.add_frames("s", pred[:100], gt[:100])
    assert rec is not None and rec["frames"] == 100 and "tr_err" in rec
    assert r.add_frames("s", pred[:101], gt[:101]) is None  # same milestone
    assert r.add_frames("s", pred[:300], gt[:300]) is not None
    with open(os.path.join(tmp_path, "s.incremental.jsonl")) as fh:
        records = [json.loads(line) for line in fh]
    assert len(records) == 2
    assert records[1]["distance_m"] > records[0]["distance_m"]
