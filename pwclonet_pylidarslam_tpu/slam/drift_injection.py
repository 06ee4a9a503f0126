"""Controlled odometry-drift injection for end-to-end backend validation.

The repo's ICP odometry is accurate enough on synthetic worlds (t_rel
~0.2 %) that a loop-closure + pose-graph run shows no *measurable* benefit —
the drift the backend exists to remove (ref optimize-on-loop policy,
``slam/backend/backend.py:376-385``) never accumulates. Degrading the scans
doesn't work either: it poisons the loop-closure refinement and the map
bootstrap equally, producing an early global offset that loop constraints
(being consistent with both legs of the trajectory) cannot observe.

``DriftingICPOdometry`` instead injects a known, internally-consistent
systematic bias — the calibration-error drift model: after every frame the
WHOLE odometry state (current pose, keyframe ring-buffer poses, cached
model frame) is warped by a world transform that equals the configured
local-frame bias at the current pose. Because the map drifts with the pose,
the ICP cannot cancel the bias, and the estimate accumulates it exactly
like real systematic drift — while the scans stay clean, so loop-closure
BEV registration + ICP refinement still produce ground-truth-accurate
constraints. The pose-graph backend then has precisely the job it has on a
real drifting platform: reconcile biased odometry edges with accurate loop
edges.

Used by ``tests/test_pipeline.py::test_loop_backend_reduces_drift`` and the
``loop_backend_ate_gain`` bench extra.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.slam.icp_odometry import ICPConfig, ICPOdometry


def yaw_bias(yaw_deg: float = 0.15, dx: float = 0.01) -> np.ndarray:
    """A small local-frame SE(3) bias: ``yaw_deg`` of heading error plus
    ``dx`` meters of longitudinal scale error per frame."""
    c, s = np.cos(np.deg2rad(yaw_deg)), np.sin(np.deg2rad(yaw_deg))
    bias = np.eye(4)
    bias[:2, :2] = [[c, -s], [s, c]]
    bias[0, 3] = dx
    return bias


class DriftingICPOdometry(ICPOdometry):
    """ICP odometry with a deliberate per-frame bias folded into its state.

    The bias is applied as ``C = pose · B · pose⁻¹`` (the local bias
    expressed as a world transform) to every absolute pose the state
    carries — the same set ``SLAM._resync_odometry`` corrects, so backend
    corrections and the injected drift compose cleanly.
    """

    def __init__(self, config: Optional[ICPConfig] = None, bias: Optional[np.ndarray] = None):
        super().__init__(config)
        self._bias = np.asarray(bias if bias is not None else yaw_bias(), np.float64)

    def process_next_frame(self, points: np.ndarray) -> np.ndarray:
        super().process_next_frame(points)
        state = self.state
        old = np.asarray(state.pose, np.float64)
        c = old @ self._bias @ np.linalg.inv(old)
        cj = jnp.asarray(c, state.pose.dtype)
        self.state = state._replace(
            pose=cj @ state.pose,
            last_kf_pose=cj @ state.last_kf_pose,
            model_pose=cj @ state.model_pose,
            map=state.map._replace(poses=cj[None] @ state.map.poses),
        )
        return np.asarray(self.state.pose, np.float64)


def run_drift_scenario(with_backend: bool, n_frames: int = 80, seed: int = 5):
    """The canonical drift-injection closed-loop scenario, shared by
    ``tests/test_pipeline.py::test_loop_backend_reduces_drift`` and the
    ``loop_backend_ate_gain`` bench extra: a there-and-back world, biased
    odometry, loop closure on; the backend toggles. Returns ``(slam,
    per-frame translation error vs ground truth)``."""
    from pwclonet_pylidarslam_tpu.core.registration import BEVConfig
    from pwclonet_pylidarslam_tpu.data.synthetic import (
        SyntheticSequenceConfig,
        generate_sequence,
    )
    from pwclonet_pylidarslam_tpu.slam.loop_closure import LoopClosureConfig
    from pwclonet_pylidarslam_tpu.slam.pipeline import SLAM, SLAMConfig

    scans, gt = generate_sequence(
        SyntheticSequenceConfig(
            n_frames=n_frames, trajectory="there_and_back", speed=1.6, seed=seed,
            num_points=2048,
        )
    )
    lc_cfg = LoopClosureConfig(
        submap_size=6, overlap=2, min_id_distance=20, max_distance=30.0,
        points_per_frame=1024, submap_points=4096,
        bev=BEVConfig(pixel_size=0.5, image_size=192),
        min_confidence=1.2, max_icp_rmse=1.0,
    )
    cfg = SLAMConfig(
        odometry=ICPConfig(num_points=2048, initial_assoc_distance=8.0),
        with_loop_closure=True, loop_closure=lc_cfg,
        with_backend=with_backend,
        backend_max_nodes=128, backend_max_edges=256,
    )
    slam = SLAM(cfg, odometry=DriftingICPOdometry(cfg.odometry, yaw_bias()))
    slam.init()
    for s in scans:
        slam.process_next_frame(s)
    pred = slam.absolute_poses()
    err = np.linalg.norm(pred[:, :3, 3] - gt[: len(pred), :3, 3], axis=1)
    return slam, err
