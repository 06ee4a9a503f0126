"""Initialization modules: motion priors for the odometry front-end.

API-parity layer for the reference's ``slam/initialization.py`` five-way
registry (``INITIALIZATION:301``). In the TPU build the constant-velocity
prior is fused into the jitted ICP state (``icp_odometry.OdometryState``);
these classes exist for the pipeline-level plug-in architecture and for the
priors that need host state (network, BEV registration).

Each implements ``init()`` / ``next_frame(points, last_absolute_pose) →
init_rpose (4,4)`` — the predicted relative motion for the incoming frame
(the reference's ``init_rpose`` key contract, ``initialization.py:46-48``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class NoInitialization:
    """Identity prior (ref ``NoInitialization:79``)."""

    def init(self):
        pass

    def next_frame(self, points, last_absolute_pose) -> np.ndarray:
        return np.eye(4)

    def feed_result(self, relative_pose: np.ndarray):
        pass


class ConstantVelocityInitialization:
    """Returns the last observed relative pose (ref ``:106-135``)."""

    def init(self):
        self._last_rel = np.eye(4)

    def next_frame(self, points, last_absolute_pose) -> np.ndarray:
        return self._last_rel

    def feed_result(self, relative_pose: np.ndarray):
        self._last_rel = np.asarray(relative_pose, np.float64)


class ElevationImageInitialization:
    """BEV spectral-registration prior between consecutive frames
    (ref ``ElevationImageInitialization:137`` — AKAZE there, FFT here)."""

    def __init__(self, bev_config=None):
        from pwclonet_pylidarslam_tpu.core.registration import BEVConfig

        self.bev = bev_config or BEVConfig(pixel_size=0.4, image_size=256)
        self._prev = None

    def init(self):
        self._prev = None

    def next_frame(self, points, last_absolute_pose) -> np.ndarray:
        import jax.numpy as jnp

        from pwclonet_pylidarslam_tpu.core.registration import (
            planar_to_pose,
            register_bev,
        )

        pts = np.asarray(points, np.float32)
        mask = (np.linalg.norm(pts, axis=-1) > 1e-6).astype(np.float32)
        if self._prev is None:
            self._prev = (pts, mask)
            return np.eye(4)
        prev_pts, prev_mask = self._prev
        reg = register_bev(
            jnp.asarray(prev_pts), jnp.asarray(prev_mask),
            jnp.asarray(pts), jnp.asarray(mask), self.bev,
        )
        self._prev = (pts, mask)
        return np.asarray(planar_to_pose(reg), np.float64)

    def feed_result(self, relative_pose: np.ndarray):
        pass


class PoseNetInitialization:
    """Network prior from a trained model (ref ``PoseNetInitialization:225``).

    Wraps any deep odometry front-end exposing ``process_next_frame``.
    """

    def __init__(self, deep_odometry):
        self.deep = deep_odometry

    def init(self):
        self.deep.init()
        self._last_abs = np.eye(4)

    def next_frame(self, points, last_absolute_pose) -> np.ndarray:
        new_abs = self.deep.process_next_frame(points)
        rel = np.linalg.inv(self._last_abs) @ new_abs
        self._last_abs = new_abs
        return rel

    def feed_result(self, relative_pose: np.ndarray):
        pass


INITIALIZATION = {
    "none": NoInitialization,
    "CV": ConstantVelocityInitialization,
    "EI": ElevationImageInitialization,
    "PoseNet": PoseNetInitialization,
}
