"""Deep odometry front-ends: PWCLO-Net and PoseResNet as SLAM odometry.

Replaces the reference's ``PoseNetOdometry`` (``slam/odometry/posenet_odometry.py``)
and the PWCLO-Net inference path of ``train.py:test_model``: load trained
parameters, run the network per frame pair, accumulate relative poses. Both
share the driver: a jitted pairwise forward with an on-host pose chain.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector
from pwclonet_pylidarslam_tpu.models import PWCLONet, PWCLONetConfig
from pwclonet_pylidarslam_tpu.models.posenet import PoseResNet, PoseResNetConfig


@dataclasses.dataclass
class DeepOdometryConfig:
    model: PWCLONetConfig = dataclasses.field(default_factory=PWCLONetConfig)
    num_points: int = 8192


class PWCLONetOdometry:
    """PWCLO-Net frame-to-frame odometry (inference).

    ``variables`` = ``{"params": ..., "batch_stats": ...}`` from training.
    The network predicts the pose of the **current** frame in the previous
    frame's coordinates (finest level, index 0 — ref train.py:867-909).
    """

    def __init__(self, variables: Any, config: Optional[DeepOdometryConfig] = None):
        self.config = config or DeepOdometryConfig()
        self.model = PWCLONet(self.config.model)
        self.variables = variables
        self._fwd = jax.jit(
            lambda v, x1, x2: self.model.apply(v, x1, x2, train=False)[0]
        )
        self.state_pose: Optional[np.ndarray] = None
        self._prev_scan: Optional[np.ndarray] = None
        self.poses: list = []

    def init(self):
        self.state_pose = np.eye(4)
        self._prev_scan = None
        self.poses = []

    def _prepare(self, points: np.ndarray) -> np.ndarray:
        n = self.config.num_points
        pts = points[np.linalg.norm(points, axis=-1) > 1e-6]
        if len(pts) >= n:
            idx = np.random.default_rng(len(pts)).choice(len(pts), n, replace=False)
            pts = pts[idx]
        else:
            extra = np.random.default_rng(0).choice(len(pts), n - len(pts), replace=True)
            pts = np.concatenate([pts, pts[extra]])
        return pts.astype(np.float32)

    def process_next_frame(self, points: np.ndarray) -> np.ndarray:
        scan = self._prepare(points)
        if self._prev_scan is None:
            self._prev_scan = scan
            self.poses.append(np.eye(4))
            return self.state_pose
        # xyz1 = current, xyz2 = previous (ref prediction_modules.py:130-166)
        params = self._fwd(
            self.variables, jnp.asarray(scan[None]), jnp.asarray(self._prev_scan[None])
        )
        rel = np.asarray(se3.params_to_pose_quat(params[0, 0]))  # finest level
        self.state_pose = self.state_pose @ rel.astype(np.float64)
        self._prev_scan = scan
        self.poses.append(self.state_pose.copy())
        return self.state_pose

    def process_sequence(self, scans: np.ndarray) -> np.ndarray:
        """All consecutive pairs of ``scans (T, N, 3)`` in ONE batched
        forward (per-frame dispatch pays a full tunnel round trip per frame
        on a network-attached chip; this pays one). Returns ``(T, 4, 4)``
        absolute poses of the newly processed frames."""
        prepared = np.stack([self._prepare(s) for s in scans])
        first_poses = []
        if self._prev_scan is None:
            prev = prepared[:-1]
            cur = prepared[1:]
            first_poses.append(np.eye(4))
        else:
            prev = np.concatenate([self._prev_scan[None], prepared[:-1]])
            cur = prepared
        if len(cur):
            if not hasattr(self, "_fwd_rel"):
                self._fwd_rel = jax.jit(
                    lambda v, x1, x2: jax.vmap(se3.params_to_pose_quat)(
                        self.model.apply(v, x1, x2, train=False)[0][:, 0]
                    )
                )
            rels = np.asarray(
                self._fwd_rel(self.variables, jnp.asarray(cur), jnp.asarray(prev)),
                np.float64,
            )
        else:
            rels = np.zeros((0, 4, 4))
        out = []
        for _ in first_poses:
            self.poses.append(self.state_pose.copy())
            out.append(self.state_pose.copy())
        for rel in rels:
            self.state_pose = self.state_pose @ rel
            self.poses.append(self.state_pose.copy())
            out.append(self.state_pose.copy())
        self._prev_scan = prepared[-1]
        return np.stack(out)

    def absolute_poses(self) -> np.ndarray:
        return np.stack(self.poses)

    def relative_poses(self) -> np.ndarray:
        from pwclonet_pylidarslam_tpu.evaluation.metrics import compute_relative_poses

        return compute_relative_poses(self.absolute_poses())


@dataclasses.dataclass
class PoseNetOdometryConfig:
    model: PoseResNetConfig = dataclasses.field(default_factory=PoseResNetConfig)
    projector: SphericalProjector = SphericalProjector()


class PoseNetOdometry:
    """PoseResNet odometry over vertex-map pairs (ref ``posenet_odometry.py:46-122``)."""

    def __init__(self, variables: Any, config: Optional[PoseNetOdometryConfig] = None):
        self.config = config or PoseNetOdometryConfig()
        self.model = PoseResNet(self.config.model)
        self.variables = variables

        def fwd(v, prev_vm, cur_vm):
            frames = jnp.stack([cur_vm, prev_vm], axis=1)  # (B, 2, H, W, 3)
            return self.model.apply(v, frames, train=False)

        self._fwd = jax.jit(fwd)
        self._project = jax.jit(
            lambda pts: self.config.projector.build_projection_map(pts)
        )
        self.state_pose = None
        self._prev_vm = None
        self.poses: list = []

    def init(self):
        self.state_pose = np.eye(4)
        self._prev_vm = None
        self.poses = []

    def process_next_frame(self, points: np.ndarray) -> np.ndarray:
        vm = self._project(jnp.asarray(points[None], jnp.float32))
        if self._prev_vm is None:
            self._prev_vm = vm
            self.poses.append(np.eye(4))
            return self.state_pose
        params = self._fwd(self.variables, self._prev_vm, vm)
        rel = np.asarray(se3.params_to_pose_euler(params[0, 0]))
        self.state_pose = self.state_pose @ rel.astype(np.float64)
        self._prev_vm = vm
        self.poses.append(self.state_pose.copy())
        return self.state_pose

    def process_sequence(self, scans: np.ndarray) -> np.ndarray:
        """Batched variant: project all scans and run all consecutive
        vertex-map pairs in one dispatch. Returns the new absolute poses."""
        vms = self._project(jnp.asarray(scans, jnp.float32))  # (T, H, W, 3)
        first = 0
        if self._prev_vm is None:
            prev = vms[:-1]
            cur = vms[1:]
            first = 1
        else:
            prev = jnp.concatenate([self._prev_vm, vms[:-1]])
            cur = vms
        if cur.shape[0]:
            if not hasattr(self, "_fwd_rel"):
                self._fwd_rel = jax.jit(
                    lambda v, p, c: jax.vmap(se3.params_to_pose_euler)(
                        self._apply_pair(v, p, c)
                    )
                )
            rels = np.asarray(self._fwd_rel(self.variables, prev, cur), np.float64)
        else:
            rels = np.zeros((0, 4, 4))
        out = []
        for _ in range(first):
            self.poses.append(self.state_pose.copy())
            out.append(self.state_pose.copy())
        for rel in rels:
            self.state_pose = self.state_pose @ rel
            self.poses.append(self.state_pose.copy())
            out.append(self.state_pose.copy())
        self._prev_vm = vms[-1:]
        return np.stack(out)

    def _apply_pair(self, v, prev_vm, cur_vm):
        frames = jnp.stack([cur_vm, prev_vm], axis=1)  # (B, 2, H, W, 3)
        return self.model.apply(v, frames, train=False)[:, 0]

    def absolute_poses(self) -> np.ndarray:
        return np.stack(self.poses)
