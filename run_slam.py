#!/usr/bin/env python
"""Run SLAM over dataset sequences (replacement for the reference's ``run.py``).

Usage::

    python run_slam.py dataset=kitti dataset.root_dir=/data/kitti \
        sequences=[0,1] slam.with_loop_closure=true log_dir=./out

    python run_slam.py dataset=synthetic sequences=[0] log_dir=./out

Config is plain ``key.path=value`` overrides (Hydra-CLI style) over the
dataclasses in ``slam/pipeline.py`` / ``slam/runner.py``; the resolved config
and git hash are persisted into the run directory.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import List, Optional


@dataclasses.dataclass
class RunConfig:
    dataset: str = "synthetic"  # synthetic | kitti | kitti360 | nclt | ford | nhcd | rosbag | urbanloco | ply_dir | kitti_carla
    root_dir: str = ""
    rosbag_topic: str = "/velodyne_points"
    sequences: str = "0"  # comma-separated
    log_dir: str = "./slam_output"
    max_frames: int = 0  # 0 = all
    odometry: str = "icp"  # icp | ct_icp | ct_icp_rigid | pwclonet | posenet
    checkpoint_dir: str = ""  # train_net log_dir (deep odometry front-ends)
    fused_eval: bool = False  # deep front-ends: fused Pallas eval kernels (TPU)
    vm_height: int = 64  # posenet vertex-map shape (must match training)
    vm_width: int = 720
    association: str = "projective"  # projective (fast) | voxel (accuracy, KdTree-F2M)
    bev_bootstrap: bool = False  # in-graph BEV prior for fast rotation (icp only)
    max_num_alignments: int = 15  # outer ICP iterations (icp only)
    with_loop_closure: bool = False
    with_backend: bool = False
    # GPS-constrained SLAM: feed the source's gps_poses() stream into the
    # backend as unary priors and re-optimize as fixes arrive (implies
    # with_backend; ref se3_absolute_constraint harvesting, backend.py:275-330).
    # Real producer: dataset=urbanloco (INSPVAX); dataset=synthetic simulates
    # a fix every ``gps_stride`` frames with ``gps_noise`` m of position noise.
    gps: bool = False
    gps_stride: int = 10
    gps_noise: float = 0.05
    # process ALL sequences simultaneously in one device dispatch stream
    # (BatchedICPOdometry: vmap over sequences; odometry-only — incompatible
    # with loop closure / backend / snapshots). Sequences are truncated to
    # the shortest length in the batch.
    batched: bool = False
    num_points: int = 8192
    snapshot_every_frames: int = 0  # full-pipeline snapshot cadence (0 = off)
    resume: bool = False  # continue a crashed run from its last snapshot
    # offline per-sequence HTML gallery (vertex-map/BEV strips + trajectory
    # overlays) — headless replacement for the reference's live viz windows
    gallery: bool = False
    profile_dir: str = ""  # capture a jax.profiler trace of the run (XProf)
    synthetic_frames: int = 60
    synthetic_trajectory: str = "curve"


def build_sources(config: RunConfig):
    seqs = [s for s in str(config.sequences).strip("[]").split(",") if s != ""]
    sources = {}
    if config.dataset == "synthetic":
        from pwclonet_pylidarslam_tpu.data.synthetic import (
            SyntheticSequenceConfig,
            generate_sequence,
        )

        for s in seqs:
            scans, gt = generate_sequence(
                SyntheticSequenceConfig(
                    n_frames=config.synthetic_frames,
                    trajectory=config.synthetic_trajectory,
                    seed=int(s),
                    num_points=config.num_points,
                )
            )

            class _Source:
                def __init__(self, scans, gt, gps=None):
                    self.scans, self.gt, self._gps = scans, gt, gps

                def __len__(self):
                    return len(self.scans)

                def scan(self, idx):
                    return self.scans[idx]

                def ground_truth(self):
                    return self.gt

                def gps_poses(self):
                    return self._gps

            gps = None
            if config.gps:
                # simulated GPS: GT position + noise every gps_stride frames,
                # NaN elsewhere (no fix)
                import numpy as np

                r = np.random.default_rng(int(s) + 1)
                gps = np.full_like(gt, np.nan)
                for t in range(0, len(gt), config.gps_stride):
                    fix = gt[t].copy()
                    fix[:3, 3] += r.normal(scale=config.gps_noise, size=3)
                    gps[t] = fix
            sources[f"synth{int(s):02d}"] = _Source(scans, gt, gps)
    elif config.dataset == "kitti":
        from pwclonet_pylidarslam_tpu.data.kitti import KittiSequence

        for s in seqs:
            sources[f"{int(s):02d}"] = KittiSequence(config.root_dir, int(s))
    elif config.dataset == "kitti360":
        from pwclonet_pylidarslam_tpu.data.other_datasets import Kitti360Sequence

        for s in seqs:
            sources[f"{int(s):02d}"] = Kitti360Sequence(config.root_dir, int(s))
    elif config.dataset == "nclt":
        from pwclonet_pylidarslam_tpu.data.other_datasets import NCLTSequence

        for s in seqs:
            sources[s] = NCLTSequence(config.root_dir, s)
    elif config.dataset == "ford":
        import os

        from pwclonet_pylidarslam_tpu.data.other_datasets import FordCampusSequence

        for s in seqs:
            sources[s] = FordCampusSequence(os.path.join(config.root_dir, s))
    elif config.dataset == "nhcd":
        from pwclonet_pylidarslam_tpu.data.other_datasets import NHCDSequence

        for s in seqs:
            sources[s] = NHCDSequence(config.root_dir, s)
    elif config.dataset == "rosbag":
        from pwclonet_pylidarslam_tpu.data.rosbag import RosbagSequence

        for s in seqs:  # each "sequence" is a bag path relative to root_dir
            path = f"{config.root_dir}/{s}" if config.root_dir else s
            sources[s.rsplit("/", 1)[-1].removesuffix(".bag")] = RosbagSequence(
                path, config.rosbag_topic, num_points=config.num_points
            )
    elif config.dataset == "urbanloco":
        from pwclonet_pylidarslam_tpu.data.rosbag import UrbanLocoSequence

        for s in seqs:
            path = f"{config.root_dir}/{s}" if config.root_dir else s
            acq = (
                UrbanLocoSequence.CALIFORNIA
                if s.rsplit("/", 1)[-1].startswith("CA")
                else UrbanLocoSequence.HONG_KONG
            )
            sources[s.rsplit("/", 1)[-1].removesuffix(".bag")] = UrbanLocoSequence(
                path, acq, num_points=config.num_points
            )
    elif config.dataset == "ply_dir":
        import os

        from pwclonet_pylidarslam_tpu.data.other_datasets import PLYDirSequence

        for s in seqs:  # each "sequence" is a scan dir relative to root_dir
            scan_dir = os.path.join(config.root_dir, s) if config.root_dir else s
            poses = os.path.join(os.path.dirname(scan_dir.rstrip("/")), "poses.txt")
            sources[s.rstrip("/").rsplit("/", 1)[-1]] = PLYDirSequence(
                scan_dir, poses if os.path.exists(poses) else None
            )
    elif config.dataset == "kitti_carla":
        from pwclonet_pylidarslam_tpu.data.other_datasets import KittiCarlaSequence

        for s in seqs:
            sources[f"Town{int(s):02d}"] = KittiCarlaSequence(config.root_dir, int(s))
    else:
        raise SystemExit(f"unknown dataset {config.dataset!r}")
    return sources


def main(argv: Optional[List[str]] = None):
    from pwclonet_pylidarslam_tpu.slam.pipeline import SLAMConfig
    from pwclonet_pylidarslam_tpu.slam.runner import SLAMRunner, SLAMRunnerConfig
    from pwclonet_pylidarslam_tpu.utils.config import dump_config, parse_cli

    argv = argv if argv is not None else sys.argv[1:]
    config = parse_cli(RunConfig, argv)

    slam_cfg = SLAMConfig(
        with_loop_closure=config.with_loop_closure,
        with_backend=config.with_backend or config.gps,
        optimize_on_absolute=config.gps,
    )
    runner_cfg = SLAMRunnerConfig(
        slam=slam_cfg,
        log_dir=config.log_dir,
        max_frames=config.max_frames or None,
        snapshot_every_frames=config.snapshot_every_frames,
        resume=config.resume,
        use_gps=config.gps,
        gallery=config.gallery,
    )
    if config.batched:
        if config.with_loop_closure or config.with_backend or config.resume or config.gps:
            raise SystemExit("batched=true is odometry-only (no loop closure/backend/gps/resume)")
        if config.snapshot_every_frames:
            raise SystemExit("batched=true does not support snapshots")
        if config.odometry != "icp":
            raise SystemExit("batched=true supports odometry=icp")
        return run_batched(config)

    odometry = None
    if config.odometry == "pwclonet":
        # PWCLO-Net deep odometry front-end from a train_net checkpoint
        # (BASELINE config #4: deep front-end + loop closure + backend)
        from pwclonet_pylidarslam_tpu.models import scaled_model_config
        from pwclonet_pylidarslam_tpu.slam.deep_odometry import (
            DeepOdometryConfig,
            PWCLONetOdometry,
        )
        from pwclonet_pylidarslam_tpu.train.state import TrainConfig
        from pwclonet_pylidarslam_tpu.train.trainer import (
            PWCLONetTrainer,
            TrainerConfig,
        )

        if not config.checkpoint_dir:
            raise SystemExit("odometry=pwclonet requires checkpoint_dir=<train_net log_dir>")
        model_cfg = scaled_model_config(config.num_points, fused_eval=config.fused_eval)
        trainer = PWCLONetTrainer(
            TrainerConfig(train=TrainConfig(model=model_cfg), log_dir=config.checkpoint_dir)
        )
        trainer.load_checkpoint()
        odometry = PWCLONetOdometry(
            {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
            DeepOdometryConfig(model=model_cfg, num_points=config.num_points),
        )
    elif config.odometry == "posenet":
        from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector
        from pwclonet_pylidarslam_tpu.slam.deep_odometry import (
            PoseNetOdometry,
            PoseNetOdometryConfig,
        )
        from pwclonet_pylidarslam_tpu.train.posenet_state import PoseNetTrainConfig
        from pwclonet_pylidarslam_tpu.train.posenet_trainer import (
            PoseNetTrainer,
            PoseNetTrainerConfig,
        )

        if not config.checkpoint_dir:
            raise SystemExit("odometry=posenet requires checkpoint_dir=<train_net log_dir>")
        projector = SphericalProjector(height=config.vm_height, width=config.vm_width)
        trainer = PoseNetTrainer(
            PoseNetTrainerConfig(
                train=PoseNetTrainConfig(projector=projector),
                vm_shape=(config.vm_height, config.vm_width),
                log_dir=config.checkpoint_dir,
            )
        )
        trainer.load_checkpoint()
        odometry = PoseNetOdometry(
            trainer.odometry_variables(), PoseNetOdometryConfig(projector=projector)
        )
    elif config.odometry in ("ct_icp", "ct_icp_rigid"):
        from pwclonet_pylidarslam_tpu.slam import CTICPConfig, CTICPOdometry

        odometry = CTICPOdometry(
            CTICPConfig(
                num_points=config.num_points,
                elastic=config.odometry == "ct_icp",
            )
        )
    elif config.odometry == "icp":
        from pwclonet_pylidarslam_tpu.slam import ICPConfig, ICPOdometry

        slam_cfg.odometry = ICPConfig(
            num_points=config.num_points,
            bev_bootstrap=config.bev_bootstrap,
            association=config.association,
            max_num_alignments=config.max_num_alignments,
        )
        odometry = ICPOdometry(slam_cfg.odometry)
    else:
        raise SystemExit(f"unknown odometry {config.odometry!r}")
    runner = SLAMRunner(runner_cfg, odometry=odometry)
    dump_config(config, f"{config.log_dir}/config.yaml") if _ensure_dir(config.log_dir) else None

    if config.profile_dir:
        from pwclonet_pylidarslam_tpu.utils.timer import profiler_trace

        with profiler_trace(config.profile_dir):
            results = runner.run(build_sources(config))
    else:
        results = runner.run(build_sources(config))
    for name, md in results.items():
        if md:
            print(
                f"{name}: t_rel={md.get('tr_err', float('nan')):.4f}% "
                f"ATE={md['ATE']:.4f} m"
            )
    if runner.failures:
        print(f"FAILED sequences: {list(runner.failures)}")
        return 1
    return 0


def run_batched(config: "RunConfig") -> int:
    """All sequences advance together: one BatchedICPOdometry dispatch
    stream per 32-frame chunk (vmap over the sequence axis)."""
    import numpy as np

    from pwclonet_pylidarslam_tpu.evaluation.results import OdometryResults
    from pwclonet_pylidarslam_tpu.slam import BatchedICPOdometry, ICPConfig
    from pwclonet_pylidarslam_tpu.slam.icp_odometry import fix_scan_size
    from pwclonet_pylidarslam_tpu.utils.config import dump_config

    _ensure_dir(config.log_dir)
    dump_config(config, f"{config.log_dir}/config.yaml")
    sources = build_sources(config)
    names = list(sources)
    t_total = min(len(src) for src in sources.values())
    if config.max_frames:
        t_total = min(t_total, config.max_frames)
    # same float32 transfer as the non-batched path — identical trajectories
    # modulo vmap reassociation noise (int16 transfer stays opt-in via the
    # library API, where range limits are the caller's contract)
    odo = BatchedICPOdometry(
        ICPConfig(
            num_points=config.num_points,
            association=config.association,
            bev_bootstrap=config.bev_bootstrap,
        )
    )
    odo.init(n_sequences=len(names))
    import contextlib

    if config.profile_dir:
        from pwclonet_pylidarslam_tpu.utils.timer import profiler_trace

        trace_cm = profiler_trace(config.profile_dir)
    else:
        trace_cm = contextlib.nullcontext()
    chunk = 32
    with trace_cm:
        _run_batched_chunks(config, odo, sources, t_total, chunk)
    poses = odo.absolute_poses()
    results = OdometryResults(config.log_dir)
    rc = 0
    for i, name in enumerate(names):
        gt = sources[name].ground_truth()
        md = results.add_sequence(
            name, poses[i], None if gt is None else np.asarray(gt)[:t_total]
        )
        if md:
            print(f"{name}: t_rel={md.get('tr_err', float('nan')):.4f}% ATE={md['ATE']:.4f} m")
    return rc


def _run_batched_chunks(config, odo, sources, t_total, chunk):
    import numpy as np

    from pwclonet_pylidarslam_tpu.slam.icp_odometry import fix_scan_size

    for start in range(0, t_total, chunk):
        end = min(start + chunk, t_total)
        batch = np.stack(
            [
                np.stack(
                    [fix_scan_size(np.asarray(src.scan(t))[:, :3], config.num_points, seed=t)
                     for t in range(start, end)]
                )
                for src in sources.values()
            ]
        )
        odo.process_chunk(batch)


def _ensure_dir(d):
    import os

    os.makedirs(d, exist_ok=True)
    return True


if __name__ == "__main__":
    raise SystemExit(main())
