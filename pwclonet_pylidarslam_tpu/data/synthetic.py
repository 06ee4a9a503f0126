"""Synthetic LiDAR sequence generator: analytic trajectories over a raycast world.

The reference has no synthetic data at all — SURVEY.md §4 calls this out as a
key test-strategy gap. This module provides hermetic, deterministic sequences
(structured urban-ish scenes + exact ground-truth poses) used by the unit
tests, the end-to-end ICP checks, and `bench.py`'s correctness leg.

Pure numpy (host-side data generation, like a dataset reader would be).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Rect:
    """Finite rectangle: point ``origin``, edge vectors ``u``/``v``, outward normal."""

    origin: np.ndarray
    u: np.ndarray
    v: np.ndarray

    @property
    def normal(self) -> np.ndarray:
        n = np.cross(self.u, self.v)
        return n / np.linalg.norm(n)


def _box(center, size) -> List[Rect]:
    """Axis-aligned box as 6 rectangles."""
    cx, cy, cz = center
    sx, sy, sz = np.asarray(size) / 2.0
    ex, ey, ez = np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0, 0, 1.0])
    c = np.asarray(center, np.float64)
    return [
        Rect(c + ex * sx - ey * sy - ez * sz, 2 * sy * ey, 2 * sz * ez),
        Rect(c - ex * sx - ey * sy - ez * sz, 2 * sz * ez, 2 * sy * ey),
        Rect(c - ex * sx + ey * sy - ez * sz, 2 * sx * ex, 2 * sz * ez),
        Rect(c - ex * sx - ey * sy - ez * sz, 2 * sz * ez, 2 * sx * ex),
        Rect(c - ex * sx - ey * sy + ez * sz, 2 * sx * ex, 2 * sy * ey),
    ]


def default_world(seed: int = 0) -> List[Rect]:
    """An urban-ish corridor: ground plane plus buildings flanking a street."""
    rng = np.random.default_rng(seed)
    rects = [
        # large ground plane at z = -1.7
        Rect(np.array([-200.0, -200.0, -1.7]), np.array([400.0, 0, 0]), np.array([0, 400.0, 0])),
    ]
    # buildings along both sides of a street running along +x
    for i in range(14):
        x = -40.0 + i * 22.0 + rng.uniform(-3, 3)
        for side in (-1.0, 1.0):
            y = side * (9.0 + rng.uniform(0, 6))
            w = rng.uniform(6, 14)
            d = rng.uniform(4, 8)
            h = rng.uniform(4, 14)
            rects.extend(_box([x, y + side * d / 2, -1.7 + h / 2], [w, d, h]))
    # a few scattered obstacles on the street (parked cars / boxes)
    for _ in range(10):
        x = rng.uniform(-30, 260)
        y = rng.uniform(-6, 6)
        rects.extend(_box([x, y, -1.2], [rng.uniform(1.5, 4), rng.uniform(1.2, 2), 1.4]))
    return rects


def world_along_path(poses: np.ndarray, seed: int = 0) -> List[Rect]:
    """Urban-ish world flanking an arbitrary trajectory.

    ``default_world`` builds a straight corridor along +x; trajectories that
    turn eventually leave it and see nothing but the ground plane, which
    makes ICP unobservable in x/y. This generator places buildings along the
    *path*: every ~20 m of arc length, one box on each side of the local
    heading, plus scattered street-level obstacles.
    """
    rng = np.random.default_rng(seed)
    rects = [
        Rect(
            np.array([-400.0, -400.0, -1.7]),
            np.array([800.0, 0, 0]),
            np.array([0, 800.0, 0]),
        ),
    ]
    positions = poses[:, :3, 3]
    seg = np.linalg.norm(np.diff(positions, axis=0), axis=-1)
    arc = np.concatenate([[0.0], np.cumsum(seg)])
    next_spawn = -20.0  # also cover the stretch behind the start
    for t in range(len(poses)):
        if arc[t] < next_spawn:
            continue
        next_spawn = arc[t] + 20.0 + rng.uniform(-4, 4)
        heading = poses[t, :3, 0]  # vehicle x = forward
        lateral = poses[t, :3, 1]  # vehicle y = left
        for side in (-1.0, 1.0):
            y_off = side * (9.0 + rng.uniform(0, 6))
            center = (
                positions[t]
                + lateral * y_off
                + heading * rng.uniform(-6, 6)
            )
            w = rng.uniform(6, 14)
            d = rng.uniform(4, 8)
            h = rng.uniform(4, 14)
            rects.extend(_box([center[0], center[1], -1.7 + h / 2], [w, d, h]))
        if rng.uniform() < 0.6:
            obs = positions[t] + lateral * rng.uniform(-6, 6) + heading * rng.uniform(0, 12)
            rects.extend(
                _box([obs[0], obs[1], -1.2], [rng.uniform(1.5, 4), rng.uniform(1.2, 2), 1.4])
            )
    return rects


def raycast(rects: List[Rect], origins: np.ndarray, dirs: np.ndarray,
            t_min: float = 1.5, t_max: float = 80.0) -> np.ndarray:
    """Closest-hit ranges for rays ``origins (N,3)`` / ``dirs (N,3)``.

    Vectorized over rays, looped over rectangles (the world is small).
    Returns ranges with inf where nothing is hit.
    """
    best = np.full(dirs.shape[0], np.inf)
    for r in rects:
        n = r.normal
        denom = dirs @ n
        mask = np.abs(denom) > 1e-9
        t = np.where(mask, ((r.origin - origins) @ n) / np.where(mask, denom, 1.0), np.inf)
        hit = (t > t_min) & (t < t_max) & (t < best)
        if not hit.any():
            continue
        p = origins[hit] + dirs[hit] * t[hit, None]
        rel = p - r.origin
        uu = r.u @ r.u
        vv = r.v @ r.v
        a = (rel @ r.u) / uu
        b = (rel @ r.v) / vv
        inside = (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
        idx = np.nonzero(hit)[0][inside]
        best[idx] = t[idx]
    return best


def lidar_directions(
    num_beams: int = 32, num_cols: int = 720,
    fov_up_deg: float = 3.0, fov_down_deg: float = -24.0,
) -> np.ndarray:
    """Unit ray directions of a rotating multi-beam LiDAR, scan order (beam-major)."""
    elevations = np.deg2rad(np.linspace(fov_up_deg, fov_down_deg, num_beams))
    azimuths = np.linspace(np.pi, -np.pi, num_cols, endpoint=False)
    el, az = np.meshgrid(elevations, azimuths, indexing="ij")
    return np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], -1
    ).reshape(-1, 3)


def make_trajectory(
    kind: str, n_frames: int, speed: float = 1.0, yaw_rate_deg: float = 0.5
) -> np.ndarray:
    """Analytic GT trajectories ``(T, 4, 4)`` (vehicle frame: x forward)."""
    poses = np.tile(np.eye(4), (n_frames, 1, 1))
    if kind == "straight":
        for t in range(n_frames):
            poses[t, 0, 3] = speed * t
    elif kind == "curve":
        # left curve at ``yaw_rate_deg`` per frame (default: gentle)
        yaw = 0.0
        pos = np.zeros(3)
        for t in range(n_frames):
            c, s = np.cos(yaw), np.sin(yaw)
            poses[t, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            poses[t, :3, 3] = pos
            pos = pos + np.array([c, s, 0.0]) * speed
            yaw += np.deg2rad(yaw_rate_deg)
    elif kind == "circle":
        radius = speed * n_frames / (2 * np.pi)
        for t in range(n_frames):
            ang = 2 * np.pi * t / n_frames
            c, s = np.cos(ang), np.sin(ang)
            poses[t, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            poses[t, :3, 3] = [radius * s, radius * (1 - c), 0.0]
    elif kind == "there_and_back":
        # drive out along +x, then reverse back with a small lateral offset —
        # a rotation-free closed loop (exercises loop closure / backends
        # without stressing the odometry's per-frame rotation limits)
        half = n_frames // 2
        for t in range(n_frames):
            if t < half:
                poses[t, :3, 3] = [speed * t, 0.0, 0.0]
            else:
                poses[t, :3, 3] = [speed * (2 * half - t - 1), 0.5, 0.0]
    else:
        raise ValueError(f"unknown trajectory kind {kind!r}")
    return poses


@dataclasses.dataclass(frozen=True)
class SyntheticSequenceConfig:
    n_frames: int = 50
    trajectory: str = "curve"
    speed: float = 1.0  # meters / frame
    yaw_rate_deg: float = 0.5  # deg / frame (for "curve")
    num_beams: int = 32
    num_cols: int = 720
    noise_std: float = 0.01
    dropout: float = 0.1  # fraction of rays randomly dropped
    num_points: int = 8192  # output scan size (subsample/pad)
    seed: int = 0
    # simulate the rolling-shutter effect of a spinning LiDAR: each column is
    # measured from the pose interpolated between frame t (scan start) and
    # frame t+1, so a rigid interpretation of the scan is distorted. The GT
    # pose of frame t remains the scan-START pose.
    motion_distortion: bool = False
    # "corridor": straight street along +x (curving trajectories leave it
    # after ~70 frames and see only ground). "along_path": buildings placed
    # along the trajectory — use for long sequences.
    world: str = "corridor"


def _interp_pose(pose0: np.ndarray, pose1: np.ndarray, alpha: float) -> np.ndarray:
    """Slerp rotation + lerp translation between two 4x4 poses (host side)."""
    from scipy.spatial.transform import Rotation, Slerp

    slerp = Slerp([0.0, 1.0], Rotation.from_matrix([pose0[:3, :3], pose1[:3, :3]]))
    out = np.eye(4)
    out[:3, :3] = slerp([alpha])[0].as_matrix()
    out[:3, 3] = (1.0 - alpha) * pose0[:3, 3] + alpha * pose1[:3, 3]
    return out


def generate_sequence_with_times(
    config: SyntheticSequenceConfig = SyntheticSequenceConfig(),
    world: Optional[List[Rect]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Simulate a sequence; also return per-point intra-scan timestamps.

    Returns ``(scans (T, num_points, 3), times (T, num_points), poses (T, 4, 4))``.
    Scans are in the sensor frame (of the instant each point was measured, if
    ``motion_distortion``; of the frame pose otherwise), zero-padded; ``times``
    are the fraction of the scan period in [0, 1) at which each point was
    taken (0 for padding); poses are ground-truth scan-start sensor poses.
    """
    rng = np.random.default_rng(config.seed)
    dirs_sensor = lidar_directions(config.num_beams, config.num_cols)
    poses = make_trajectory(
        config.trajectory, config.n_frames, config.speed, config.yaw_rate_deg
    )
    if world is not None:
        rects = world
    elif config.world == "along_path":
        rects = world_along_path(poses, config.seed)
    else:
        rects = default_world(config.seed)
    # column index of each ray in beam-major scan order -> intra-scan time
    col_of_ray = np.tile(np.arange(config.num_cols), config.num_beams)
    alpha_of_ray = col_of_ray.astype(np.float64) / config.num_cols

    # discretize the sweep into pose sub-steps (full slerp per ray is slow)
    n_sub = 24

    scans = np.zeros((config.n_frames, config.num_points, 3), np.float32)
    times = np.zeros((config.n_frames, config.num_points), np.float32)
    for t in range(config.n_frames):
        if config.motion_distortion:
            if t + 1 < config.n_frames:
                pose_next = poses[t + 1]
            else:
                # constant-velocity extrapolation: the last scan must be
                # distorted like all others, not silently rigid
                pose_next = poses[t] @ (np.linalg.inv(poses[t - 1]) @ poses[t])
            sub_idx = np.minimum((alpha_of_ray * n_sub).astype(int), n_sub - 1)
            pts_list, time_list = [], []
            for s in range(n_sub):
                sel_rays = sub_idx == s
                if not np.any(sel_rays):
                    continue
                pose_s = _interp_pose(poses[t], pose_next, (s + 0.5) / n_sub)
                rot, origin = pose_s[:3, :3], pose_s[:3, 3]
                d_sensor = dirs_sensor[sel_rays]
                d_world = d_sensor @ rot.T
                ranges = raycast(rects, np.broadcast_to(origin, d_world.shape), d_world)
                ok = np.isfinite(ranges)
                if config.dropout > 0:
                    ok &= rng.uniform(size=ok.shape) > config.dropout
                pts_list.append(d_sensor[ok] * ranges[ok, None])
                time_list.append(alpha_of_ray[sel_rays][ok])
            pts = np.concatenate(pts_list)
            tstamps = np.concatenate(time_list)
        else:
            rot = poses[t, :3, :3]
            origin = poses[t, :3, 3]
            d_world = dirs_sensor @ rot.T
            origins = np.broadcast_to(origin, d_world.shape)
            ranges = raycast(rects, origins, d_world)
            ok = np.isfinite(ranges)
            if config.dropout > 0:
                ok &= rng.uniform(size=ok.shape) > config.dropout
            pts = dirs_sensor[ok] * ranges[ok, None]
            tstamps = alpha_of_ray[ok]
        if config.noise_std > 0:
            pts = pts + rng.normal(size=pts.shape) * config.noise_std
        n = min(len(pts), config.num_points)
        sel = rng.choice(len(pts), n, replace=False) if len(pts) > n else np.arange(len(pts))
        scans[t, : len(sel)] = pts[sel]
        times[t, : len(sel)] = tstamps[sel]
    return scans, times, poses.astype(np.float64)


def generate_sequence(
    config: SyntheticSequenceConfig = SyntheticSequenceConfig(),
    world: Optional[List[Rect]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Simulate a sequence. Returns ``(scans (T, num_points, 3), poses (T, 4, 4))``.

    Scans are in the sensor frame, zero-padded to ``num_points``; poses are
    ground-truth absolute sensor poses.
    """
    scans, _times, poses = generate_sequence_with_times(config, world)
    return scans, poses
