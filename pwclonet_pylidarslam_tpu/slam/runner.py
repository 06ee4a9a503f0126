"""SLAM runner: drive the pipeline over dataset sequences, evaluate, persist.

Replacement for the reference's ``SLAMRunner``
(``slam/odometry/odometry_runner.py:74-358``): per-sequence loop, failure
isolation (a crashing sequence is recorded and the run continues — ref
``:113-135`` moves the workdir to a fail dir), incremental timing, and
``OdometryResults`` persistence (poses, metrics.yaml, plots).
"""

from __future__ import annotations

import dataclasses
import time
import traceback
from typing import Dict, Iterable, Optional, Protocol, Tuple

import numpy as np

from pwclonet_pylidarslam_tpu.evaluation.results import OdometryResults
from pwclonet_pylidarslam_tpu.slam.pipeline import SLAM, SLAMConfig


class SequenceSource(Protocol):
    """Anything that yields per-frame scans and optional GT poses.

    Sources may additionally expose ``gps_poses() -> Optional[(T, 4, 4)]`` —
    per-frame absolute pose *measurements* (GPS/INS) consumed as unary
    pose-graph priors when ``SLAMRunnerConfig.use_gps`` is set; frames
    without a fix carry NaN entries (ref harvests the equivalent
    ``se3_absolute_constraint_<i>`` keys, backend.py:83,104-106,275-330).
    """

    def __len__(self) -> int: ...

    def scan(self, idx: int) -> np.ndarray: ...

    def ground_truth(self) -> Optional[np.ndarray]: ...


@dataclasses.dataclass
class SLAMRunnerConfig:
    slam: SLAMConfig = dataclasses.field(default_factory=SLAMConfig)
    log_dir: str = "./slam_output"
    fail_on_error: bool = False
    max_frames: Optional[int] = None  # cap frames per sequence (debug)
    # incremental persistence: partial trajectories survive crashes
    # (ref odometry_runner.py:255-263 saves every ~100 m of travel)
    save_every_frames: int = 500
    # full-pipeline state snapshot cadence (0 = off) + resume-from-snapshot:
    # restart the runner with ``resume=True`` and a crashed/preempted
    # sequence continues bit-exact from its last snapshot instead of frame 0
    snapshot_every_frames: int = 0
    resume: bool = False
    # feed each source's gps_poses() into the backend as unary priors
    # (requires slam.with_backend; pair with slam.optimize_on_absolute to
    # re-optimize as fixes arrive — ref backend.py:275-330 GPS edges)
    use_gps: bool = False
    gps_information: Optional[np.ndarray] = None  # (6,6) or None = defaults
    # per-sequence offline HTML gallery (vertex-map/BEV strips + trajectory
    # overlays) — the headless stand-in for the reference's live viz windows
    gallery: bool = False


class SLAMRunner:
    def __init__(self, config: Optional[SLAMRunnerConfig] = None, odometry=None):
        self.config = config or SLAMRunnerConfig()
        self.results = OdometryResults(self.config.log_dir)
        self.failures: Dict[str, str] = {}
        # optional odometry factory/instance override (e.g. CTICPOdometry);
        # a fresh pipeline is built per sequence, so an *instance* is re-init()ed
        self._odometry = odometry

    def run(self, sequences: Dict[str, SequenceSource]) -> Dict[str, Dict[str, float]]:
        """Run SLAM over named sequences; returns per-sequence metric dicts."""
        out = {}
        for name, source in sequences.items():
            try:
                out[name] = self._run_sequence(name, source)
            except Exception as exc:  # noqa: BLE001 — runner must survive (ref :168-200)
                self.failures[name] = traceback.format_exc()
                if self.config.fail_on_error:
                    raise
                print(f"[SLAMRunner] sequence {name} FAILED: {exc}")
        return out

    def _run_sequence(self, name: str, source: SequenceSource):
        slam = SLAM(self.config.slam, odometry=self._odometry)
        slam.init()
        n = len(source)
        if self.config.max_frames is not None:
            n = min(n, self.config.max_frames)
        import os

        from pwclonet_pylidarslam_tpu.evaluation.results import write_poses_txt

        snap_dir = os.path.join(self.config.log_dir, f"{name}.snapshot")
        start = 0
        if self.config.resume and os.path.exists(
            os.path.join(snap_dir, "pipeline.npz")
        ):
            slam.restore(snap_dir)
            start = len(getattr(slam.odometry, "results", []) or [])

        gps = None
        if self.config.use_gps:
            if not self.config.slam.with_backend:
                raise ValueError("use_gps requires slam.with_backend=True")
            gps_fn = getattr(source, "gps_poses", None)
            gps = gps_fn() if gps_fn is not None else None
            if gps is None:
                print(f"[SLAMRunner] {name}: use_gps set but source has no GPS stream")

        t0 = time.perf_counter()
        for i in range(start, n):
            gps_i = None
            if gps is not None and i < len(gps) and np.all(np.isfinite(gps[i])):
                gps_i = gps[i]
            slam.process_next_frame(
                source.scan(i),
                absolute_pose_gps=gps_i,
                absolute_information=self.config.gps_information,
            )
            if (
                self.config.save_every_frames
                and (i + 1) % self.config.save_every_frames == 0
            ):
                write_poses_txt(
                    os.path.join(self.config.log_dir, f"{name}.partial.poses.txt"),
                    slam.absolute_poses(),
                )
                gt_so_far = source.ground_truth()
                if gt_so_far is not None:
                    # incremental per-100m metric record (ref
                    # odometry_runner.py:255-263 continuous regression signal)
                    self.results.add_frames(
                        name, slam.absolute_poses(), gt_so_far[: i + 1]
                    )
            if (
                self.config.snapshot_every_frames
                and (i + 1) % self.config.snapshot_every_frames == 0
            ):
                slam.snapshot(snap_dir)
        elapsed = time.perf_counter() - t0
        predicted = slam.absolute_poses()
        gt = source.ground_truth()
        if gt is not None:
            gt = gt[:n]
        md = self.results.add_sequence(
            name, predicted, gt, elapsed_seconds=elapsed
        )
        if self.config.gallery:
            from pwclonet_pylidarslam_tpu.evaluation.gallery import (
                write_run_gallery,
            )

            class _LazyScans:  # only the sampled frames are ever loaded
                def __len__(self):
                    return n

                def __getitem__(self, i):
                    return np.asarray(source.scan(i))[:, :3]

            gallery_dir = os.path.join(self.config.log_dir, f"{name}_gallery")
            write_run_gallery(
                gallery_dir,
                name,
                _LazyScans(),
                predicted,
                gt,
                metrics=md,
            )
            from pwclonet_pylidarslam_tpu.evaluation.player import (
                write_run_player,
            )

            write_run_player(gallery_dir, name, _LazyScans(), predicted, gt)
        return md
