"""End-to-end CLI smoke tests.

The reference's integration strategy is "run the real pipeline with a small
config" (SURVEY §4.3: ``run.sh`` with short sequences, ``replay.py``,
``train.sh``/``test.sh``). These tests drive the same flows through the real
CLIs on tiny synthetic configs and assert the artifact contract (config dump,
poses, metrics.yaml, plots, checkpoints, devkit report).
"""

import os

import numpy as np
import pytest
import yaml


@pytest.mark.slow
def test_run_slam_then_replay(tmp_path):
    import replay_slam
    import run_slam

    out = tmp_path / "run"
    rc = run_slam.main(
        [f"log_dir={out}", "dataset=synthetic", "sequences=0",
         "synthetic_frames=10", "num_points=1024"]
    )
    assert rc == 0
    for f in ("config.yaml", "metrics.yaml", "synth00.poses.txt",
              "synth00_gt.poses.txt", "synth00.png"):
        assert (out / f).exists(), f
    poses = np.loadtxt(out / "synth00.poses.txt")
    assert poses.shape == (10, 12) and np.isfinite(poses).all()
    with open(out / "metrics.yaml") as fh:
        metrics = yaml.safe_load(fh)
    assert "synth00" in metrics and "ATE" in metrics["synth00"]

    # replay the saved run from its persisted config, windowed
    rc = replay_slam.main([str(out), "start=2", "length=6"])
    assert rc == 0
    rep = np.loadtxt(out / "replay" / "synth00.poses.txt")
    assert rep.shape == (6, 12)


@pytest.mark.slow
def test_train_net_train_then_test(tmp_path):
    import train_net

    out = tmp_path / "train"
    common = ["dataset=synthetic", "model=pwclonet", "batch_size=2",
              "num_points=256", "synthetic_batches=2", f"log_dir={out}"]
    rc = train_net.main(["do_train=true", "num_epochs=1"] + common)
    assert rc == 0
    assert (out / "config.yaml").exists()
    assert (out / "checkpoints").is_dir() and os.listdir(out / "checkpoints")
    with open(out / "history.jsonl") as fh:
        hist = [line for line in fh if line.strip()]
    assert len(hist) >= 1

    # test mode reloads the checkpoint (same smoke-scaled pyramid) and writes
    # the KITTI-devkit artifact set
    rc = train_net.main(["do_test=true", "test_sequences=0"] + common)
    assert rc == 0
    test_dir = out / "test"
    assert (test_dir / "metrics.yaml").exists()
    assert (test_dir / "00.poses.txt").exists()
    eval_dir = test_dir / "00_eval"
    for f in ("00_path_2d.png", "00_path_3d.png", "00_xyz.png", "00_rpy.png",
              "00_error.txt"):
        assert (eval_dir / f).exists(), f

    # full SLAM with the trained deep front-end + loop closure + backend
    # (BASELINE config #4 wiring) from the same checkpoint
    import run_slam

    slam_out = tmp_path / "slam_deep"
    rc = run_slam.main(
        ["dataset=synthetic", "sequences=0", "synthetic_frames=8",
         "num_points=256", "odometry=pwclonet", f"checkpoint_dir={out}",
         "with_loop_closure=true", "with_backend=true",
         f"log_dir={slam_out}"]
    )
    assert rc == 0
    poses = np.loadtxt(slam_out / "synth00.poses.txt")
    assert poses.shape == (8, 12) and np.isfinite(poses).all()


@pytest.mark.slow
def test_run_slam_gallery(tmp_path):
    """gallery=true writes the offline HTML gallery (headless stand-in for
    the reference's live viz windows, slam/viz/visualizer.py:22)."""
    import run_slam

    out = tmp_path / "gal"
    rc = run_slam.main(
        [f"log_dir={out}", "dataset=synthetic", "sequences=0",
         "synthetic_frames=8", "num_points=1024", "gallery=true"]
    )
    assert rc == 0
    gal = out / "synth00_gallery"
    page = (gal / "index.html").read_text()
    assert "Trajectory" in page and "frame 0" in page
    for f in ("path_2d.png", "path_3d.png", "xyz.png", "rpy.png"):
        assert (gal / f).exists(), f
    vm_imgs = list(gal.glob("frame_*_vm.png"))
    bev_imgs = list(gal.glob("frame_*_bev.png"))
    assert len(vm_imgs) == 8 and len(bev_imgs) == 8
    # interactive player: self-contained (no external JS), one embedded
    # int16 cloud per frame, linked from the gallery index
    player = (gal / "player.html").read_text()
    assert "player.html" in page
    assert "<canvas" in player and "drag" in player
    assert '"frames":' in player and player.count("worldPts") >= 2
    assert "http" not in player.split("<script>")[1]  # no CDN/network deps
    import json as _json

    data = _json.loads(player.split("const D = ", 1)[1].split(";\nconst T")[0])
    assert len(data["frames"]) == 8 and len(data["poses"]) == 8


@pytest.mark.slow
def test_run_slam_gps_priors(tmp_path):
    """CLI-level GPS-constrained SLAM (VERDICT r2 missing #3): a drifting
    synthetic run with sparse simulated fixes must show much lower ABSOLUTE
    position error than the same run without them (unary priors pin the
    low-frequency drift; the metrics.yaml "ATE" is the reference's
    relative-RMS convention, which priors barely touch — so assert on the
    absolute trajectory from the pose files; ref backend.py:275-330)."""
    import run_slam

    # 1 ICP iteration per frame + sparse scans = a visibly drifting run
    # (measured here: ~1.2 m abs RMSE over 60 frames without GPS)
    common = ["dataset=synthetic", "sequences=0", "synthetic_frames=60",
              "num_points=512", "max_num_alignments=1"]

    def abs_rmse(args, out):
        rc = run_slam.main([f"log_dir={out}"] + args)
        assert rc == 0
        p = np.loadtxt(out / "synth00.poses.txt").reshape(-1, 3, 4)
        g = np.loadtxt(out / "synth00_gt.poses.txt").reshape(-1, 3, 4)
        d = p[:, :, 3] - g[:, :, 3]
        return float(np.sqrt((d ** 2).sum(-1).mean()))

    err_plain = abs_rmse(common, tmp_path / "plain")
    err_gps = abs_rmse(common + ["gps=true", "gps_stride=5", "gps_noise=0.02"],
                       tmp_path / "gps")
    assert err_gps < 0.6 * err_plain, (err_gps, err_plain)
    assert err_gps < 0.6, err_gps


@pytest.mark.slow
def test_run_slam_failure_isolation(tmp_path):
    # a broken source must not take down the other sequences (ref
    # odometry_runner.py:113-135 failure handling)
    import run_slam
    from pwclonet_pylidarslam_tpu.slam.runner import SLAMRunner, SLAMRunnerConfig

    class _Broken:
        def __len__(self):
            return 5

        def scan(self, i):
            raise RuntimeError("boom")

        def ground_truth(self):
            return None

    cfg = run_slam.RunConfig(
        dataset="synthetic", sequences="0", synthetic_frames=8,
        num_points=1024, log_dir=str(tmp_path / "iso"),
    )
    sources = run_slam.build_sources(cfg)
    sources["broken"] = _Broken()
    runner = SLAMRunner(SLAMRunnerConfig(log_dir=cfg.log_dir))
    results = runner.run(sources)
    assert "broken" in runner.failures
    assert "synth00" in results and results["synth00"] is not None


@pytest.mark.slow
def test_run_slam_on_kitti_tree(tmp_path):
    # structured synthetic world written in the real KITTI on-disk format
    # (velodyne .bin + calib Tr + cam-frame poses), driven through the real
    # dataset=kitti CLI path
    import run_slam
    from pwclonet_pylidarslam_tpu.data.synthetic import (
        SyntheticSequenceConfig,
        generate_sequence,
    )

    rng = np.random.default_rng(1)
    root = tmp_path / "kitti"
    tr = np.eye(4)
    tr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    tr[:3, 3] = [0.05, -0.08, 0.27]
    scans, gt = generate_sequence(
        SyntheticSequenceConfig(n_frames=8, num_points=4096, seed=2)
    )
    seq_dir = root / "sequences" / "00"
    (seq_dir / "velodyne").mkdir(parents=True)
    with open(seq_dir / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in tr[:3, :4].reshape(-1)) + "\n")
    for t, scan in enumerate(scans):
        np.concatenate(
            [scan, rng.uniform(size=(len(scan), 1)).astype(np.float32)], -1
        ).astype(np.float32).tofile(seq_dir / "velodyne" / f"{t:06d}.bin")
    (root / "poses").mkdir()
    cam = np.einsum("ij,njk,kl->nil", tr, gt, np.linalg.inv(tr))
    np.savetxt(root / "poses" / "00.txt", cam[:, :3, :4].reshape(len(gt), 12))

    out = tmp_path / "out"
    rc = run_slam.main(
        [f"root_dir={root}", "dataset=kitti", "sequences=0",
         "num_points=4096", f"log_dir={out}"]
    )
    assert rc == 0
    poses = np.loadtxt(out / "00.poses.txt")
    assert poses.shape == (8, 12) and np.isfinite(poses).all()
    # ICP on the structured world must track the trajectory reasonably
    import yaml

    with open(out / "metrics.yaml") as fh:
        data = yaml.safe_load(fh)
    md = data.get("00", data.get(0))  # unquoted "00" parses as int 0
    assert md["ATE"] < 1.0, md


@pytest.mark.slow
def test_run_slam_batched_mode(tmp_path):
    # batched=true: all sequences advance in one vmapped dispatch stream
    import run_slam

    out = tmp_path / "batched"
    rc = run_slam.main(
        ["dataset=synthetic", "sequences=0,1", "synthetic_frames=8",
         "num_points=1024", "batched=true", f"log_dir={out}"]
    )
    assert rc == 0
    for name in ("synth00", "synth01"):
        poses = np.loadtxt(out / f"{name}.poses.txt")
        assert poses.shape == (8, 12) and np.isfinite(poses).all()
    with open(out / "metrics.yaml") as fh:
        md = yaml.safe_load(fh)
    assert set(md) == {"synth00", "synth01"} and md["synth00"]["ATE"] < 5.0

    # guard: incompatible options are rejected
    with pytest.raises(SystemExit):
        run_slam.main(["batched=true", "with_backend=true", f"log_dir={out}"])
