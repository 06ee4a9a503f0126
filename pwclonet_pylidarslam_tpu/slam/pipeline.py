"""SLAM orchestrator: odometry + loop closure + pose-graph backend.

Replacement for the reference's ``SLAM`` class (``slam/slam.py:36-223``).
The five-slot architecture is preserved — initialization / preprocessing /
odometry / loop closure / backend — but state flows through explicit objects
instead of a string-keyed dict:

- initialization: the constant-velocity prior lives inside the jitted
  odometry state (``icp_odometry.OdometryState.last_rel``);
- preprocessing: :class:`slam.preprocessing.Preprocessing`;
- odometry: any object with ``init()`` / ``process_next_frame(points) →
  pose`` (ICPOdometry or DeepOdometry);
- loop closure: :class:`slam.loop_closure.ElevationImageLoopClosure`;
- backend: incremental :class:`slam.backend.PoseGraphBuilder` optimized on
  device whenever a loop constraint arrives (ref ``backend.py:376-385``
  policy), after which odometry-facing poses are resynchronized
  (ref ``slam.py:158-168``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import numpy as np

from pwclonet_pylidarslam_tpu.slam import backend as backend_mod
from pwclonet_pylidarslam_tpu.slam.icp_odometry import ICPConfig, ICPOdometry
from pwclonet_pylidarslam_tpu.slam.loop_closure import (
    ElevationImageLoopClosure,
    LoopClosureConfig,
)


@dataclasses.dataclass
class SLAMConfig:
    odometry: ICPConfig = dataclasses.field(default_factory=ICPConfig)
    with_loop_closure: bool = False
    loop_closure: LoopClosureConfig = dataclasses.field(
        default_factory=LoopClosureConfig
    )
    with_backend: bool = False
    backend_max_nodes: int = 8192
    backend_max_edges: int = 16384
    backend_max_priors: int = 256
    # the reference only re-optimizes when a loop edge arrives
    # (backend.py:376-385); set this to also optimize whenever a GPS/absolute
    # constraint is attached
    optimize_on_absolute: bool = False
    pgo: backend_mod.PGOConfig = dataclasses.field(default_factory=backend_mod.PGOConfig)


class SLAM:
    """Online SLAM over one sequence (ref ``SLAM.init/process_next_frame``)."""

    def __init__(self, config: Optional[SLAMConfig] = None, odometry=None):
        self.config = config or SLAMConfig()
        self.odometry = odometry or ICPOdometry(self.config.odometry)
        self.loop_closure = (
            ElevationImageLoopClosure(self.config.loop_closure)
            if self.config.with_loop_closure
            else None
        )
        self.builder: Optional[backend_mod.PoseGraphBuilder] = None
        self._optimized_poses: Optional[np.ndarray] = None
        self.elapsed: List[float] = []

    def init(self):
        self.odometry.init()
        if self.loop_closure is not None:
            self.loop_closure.reset()
        if self.config.with_backend:
            self.builder = backend_mod.PoseGraphBuilder(
                self.config.backend_max_nodes,
                self.config.backend_max_edges,
                self.config.backend_max_priors,
            )
        self._optimized_poses = None
        self._prev_pose = None
        self.elapsed = []

    def process_next_frame(
        self,
        points: np.ndarray,
        absolute_pose_gps: Optional[np.ndarray] = None,
        absolute_information: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """One frame ``(N, 3)`` → current absolute pose estimate ``(4, 4)``.

        ``absolute_pose_gps``: optional GPS/absolute measurement of this
        frame's pose — harvested into a unary prior edge on the pose graph
        (ref ``se3_absolute_constraint_<i>``, backend.py:275-330).
        """
        t0 = time.perf_counter()
        pose = self.odometry.process_next_frame(points)

        has_absolute = False
        if self.builder is not None:
            node = self.builder.add_node(pose)
            if node > 0:
                rel = np.linalg.inv(self._prev_pose) @ pose
                self.builder.add_odometry_edge(node - 1, rel)
            if absolute_pose_gps is not None:
                self.builder.add_absolute_edge(
                    node, absolute_pose_gps, absolute_information
                )
                has_absolute = True
        self._prev_pose = pose

        new_constraints = []
        if self.loop_closure is not None:
            new_constraints = self.loop_closure.process_next_frame(points, pose)
            if self.builder is not None:
                for c in new_constraints:
                    self.builder.add_loop_edge(
                        c.frame_i, c.frame_j, c.relative_pose
                    )

        # optimize only when a loop constraint arrives (ref backend.py:376-385)
        # — or, if configured, when an absolute constraint is attached
        if self.builder is not None and (
            new_constraints or (has_absolute and self.config.optimize_on_absolute)
        ):
            pose = self.optimize_now()

        self.elapsed.append(time.perf_counter() - t0)
        return pose

    def optimize_now(self) -> np.ndarray:
        """Force a pose-graph optimization + full component resync; returns
        the corrected current pose."""
        graph = self.builder.to_device()
        out = backend_mod.optimize(graph, self.config.pgo)
        n = len(self.builder.poses)
        optimized = np.asarray(out.poses[:n], np.float64)
        self._optimized_poses = optimized
        # resync all components to the corrected trajectory (ref slam.py:165-167)
        self.builder.poses = [optimized[i] for i in range(n)]
        if self.loop_closure is not None:
            self.loop_closure.update_positions(optimized)
        self._prev_pose = optimized[-1]
        self._resync_odometry(optimized[-1])
        return optimized[-1]

    def _resync_odometry(self, corrected_pose: np.ndarray):
        """Push the backend-corrected pose into the odometry state so future
        frames integrate from the optimized trajectory.

        The correction is a left world-frame transform ``C = corrected·old⁻¹``
        and must be applied to EVERY absolute pose the odometry carries (the
        keyframe ring-buffer poses, the last-keyframe pose, the cached model
        frame) — correcting only ``pose`` would shear the map geometry by the
        correction amount on the next model re-projection. (The reference
        sidesteps this by storing its KdTree map relative to the latest
        frame, ``local_map.py:302-362``; our map stores absolute poses.)
        """
        state = getattr(self.odometry, "state", None)
        if state is not None and hasattr(state, "pose"):
            import jax.numpy as jnp

            old = np.asarray(state.pose, np.float64)
            c = np.asarray(corrected_pose, np.float64) @ np.linalg.inv(old)
            cj = jnp.asarray(c, state.pose.dtype)
            replacements = {"pose": cj @ state.pose}
            if hasattr(state, "last_kf_pose"):
                replacements["last_kf_pose"] = cj @ state.last_kf_pose
            if hasattr(state, "model_pose"):
                replacements["model_pose"] = cj @ state.model_pose
            if hasattr(state, "map") and hasattr(state.map, "poses"):
                replacements["map"] = state.map._replace(
                    poses=cj[None] @ state.map.poses
                )
            self.odometry.state = state._replace(**replacements)

    def absolute_poses(self) -> np.ndarray:
        if self.builder is not None and self.builder.poses:
            return np.stack(self.builder.poses)
        return self.odometry.absolute_poses()

    def relative_poses(self) -> np.ndarray:
        absolute = self.absolute_poses()
        from pwclonet_pylidarslam_tpu.evaluation.metrics import compute_relative_poses

        return compute_relative_poses(absolute)

    # --- full-pipeline snapshots (aux-subsystem parity: SURVEY §5
    # checkpoint/resume — the reference persists only poses + picklable
    # loop-closure state; here every component round-trips).

    def snapshot(self, directory: str) -> None:
        import os

        os.makedirs(directory, exist_ok=True)
        if hasattr(self.odometry, "snapshot"):
            self.odometry.snapshot(os.path.join(directory, "odometry.npz"))
        if self.loop_closure is not None:
            self.loop_closure.serialize(os.path.join(directory, "loop_closure.npz"))
        misc = {"elapsed": np.asarray(self.elapsed)}
        if self._prev_pose is not None:
            misc["prev_pose"] = np.asarray(self._prev_pose)
        if self._optimized_poses is not None:
            misc["optimized_poses"] = self._optimized_poses
        if self.builder is not None and self.builder.poses:
            misc["graph_poses"] = np.stack(self.builder.poses)
            if self.builder.edges:
                misc["edge_i"] = np.asarray([e[0] for e in self.builder.edges])
                misc["edge_j"] = np.asarray([e[1] for e in self.builder.edges])
                misc["edge_meas"] = np.stack([e[2] for e in self.builder.edges])
                misc["edge_info"] = np.stack([e[3] for e in self.builder.edges])
            if self.builder.priors:
                misc["prior_node"] = np.asarray([p[0] for p in self.builder.priors])
                misc["prior_meas"] = np.stack([p[1] for p in self.builder.priors])
                misc["prior_info"] = np.stack([p[2] for p in self.builder.priors])
        np.savez_compressed(os.path.join(directory, "pipeline.npz"), **misc)

    def restore(self, directory: str) -> None:
        import os

        self.init()
        if hasattr(self.odometry, "restore"):
            self.odometry.restore(os.path.join(directory, "odometry.npz"))
        lc_path = os.path.join(directory, "loop_closure.npz")
        if self.loop_closure is not None and os.path.exists(lc_path):
            self.loop_closure.load(lc_path)
        data = np.load(os.path.join(directory, "pipeline.npz"))
        self.elapsed = list(data["elapsed"])
        if "prev_pose" in data:
            self._prev_pose = data["prev_pose"]
        if "optimized_poses" in data:
            self._optimized_poses = data["optimized_poses"]
        if self.builder is not None and "graph_poses" in data:
            self.builder.poses = [p for p in data["graph_poses"]]
            if "edge_i" in data:
                self.builder.edges = [
                    (int(i), int(j), m, info)
                    for i, j, m, info in zip(
                        data["edge_i"], data["edge_j"],
                        data["edge_meas"], data["edge_info"],
                    )
                ]
            if "prior_node" in data:
                self.builder.priors = [
                    (int(i), m, info)
                    for i, m, info in zip(
                        data["prior_node"], data["prior_meas"], data["prior_info"]
                    )
                ]
