"""Continuous-time (elastic) frame-to-model ICP odometry.

The reference exposes CT-ICP only as a config wrapper around the external
native ``pyct_icp`` library (``slam/odometry/ct_icp_odometry.py:1-369``,
gated by ``_with_ct_icp``). Here the capability is a real TPU-native
implementation: each scan carries TWO poses — begin and end of the sweep —
and every point is placed at the pose interpolated at its intra-scan
timestamp, so motion de-skew is *solved for jointly with the registration*
("elastic" ICP, Dellenbach et al., ICRA 2022) instead of being a fixed
preprocessing step.

Design (TPU-first, shared with ``icp_odometry``):
- same projective frame-to-model local map (ring buffer of keyframes,
  z-buffer re-projection, per-point pixel association) — all fixed shapes;
- Gauss-Newton over a 12-dof state ``(xi_begin, xi_end)``: a point at
  timestamp ``a`` contributes the point-to-plane row split ``(1-a)·j`` /
  ``a·j`` between the two twists (linear time weighting of the screw);
- the per-point warp is the exact SE(3) geodesic ``A·exp(a·log(A⁻¹B))``,
  batched over N on the VPU (Rodrigues), no host sync;
- soft priors from CT-ICP: location consistency (begin ≈ previous end),
  orientation consistency, and constant velocity — extra quadratic rows in
  the 12×12 normal equations;
- whole per-frame step is one jitted function over a persistent state
  pytree; ``process_sequence`` scans T frames per device dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import optimization as opt, se3
from pwclonet_pylidarslam_tpu.core.geometry import (
    compute_normal_map,
    estimate_timestamps,
)
from pwclonet_pylidarslam_tpu.core.projection import (
    SphericalProjector,
    spherical_pixel_coords,
)
from pwclonet_pylidarslam_tpu.slam import local_map as lm


@dataclasses.dataclass(frozen=True)
class CTICPConfig:
    """Continuous-time ICP options (capability parity with the reference's
    ``CTICPOptionsWrapper``/``OdometryOptionsWrapper``, re-parameterized for
    this solver)."""

    # None = density-matched resolution (same rule as ICPConfig)
    projector: "SphericalProjector | None" = None
    num_points: int = 8192

    def __post_init__(self):
        if self.projector is None:
            from pwclonet_pylidarslam_tpu.core.projection import (
                density_matched_projector,
            )

            object.__setattr__(
                self, "projector", density_matched_projector(self.num_points)
            )
    local_map_size: int = 20
    max_num_alignments: int = 15
    threshold_delta_pose: float = 1e-4
    threshold_trans: float = 0.1  # keyframe gate, meters
    threshold_rot: float = 0.3  # keyframe gate, degrees
    sigma: float = 0.1
    scheme: str = "huber"
    max_assoc_distance: float = 0.5
    initial_assoc_distance: float = 4.0
    normal_kernel_size: int = 5
    # CT-ICP soft priors. Weights are ``beta * n_eff`` where ``n_eff`` is the
    # effective point evidence, so a beta of 0.003 contributes ~1% of the
    # per-direction point information: enough to regularize degenerate
    # directions (long corridors), weak enough never to fight the data —
    # the begin anchor is the *estimated* previous end, which can be off by
    # a whole frame of motion right after bootstrap.
    # begin pose anchored at the previous scan's end pose...
    beta_location_consistency: float = 0.003
    beta_orientation_consistency: float = 0.003
    # ...and the sweep screw pulled towards the previous sweep's screw
    beta_constant_velocity: float = 0.003
    # when False, points are de-skewed by the prior velocity but the solve is
    # rigid over xi_end only (the reference's MOTION_COMPENSATION choices
    # NONE/CONSTANT_VELOCITY/CONTINUOUS collapse to elastic=True/False here)
    elastic: bool = True


class CTOdometryState(NamedTuple):
    map: lm.LocalMapState
    end_pose: jax.Array  # (4, 4) world pose at the END of the last sweep
    begin_pose: jax.Array  # (4, 4) world pose at the BEGIN of the last sweep
    last_rel: jax.Array  # (4, 4) end_{t-1} -> end_t motion (velocity prior)
    last_kf_pose: jax.Array  # (4, 4)
    frame_idx: jax.Array  # () int32
    # raw bootstrap scan: frame 0 enters the map un-deskewed (no velocity
    # estimate exists yet); it is kept here so frame 1 can re-deskew it with
    # the backdated solved velocity and overwrite map slot 0 — otherwise the
    # map permanently mixes one raw keyframe with deskewed ones and the
    # association smears by a whole frame of motion.
    boot_scan: jax.Array  # (N, 3)
    boot_alphas: jax.Array  # (N,)


class CTFrameResult(NamedTuple):
    pose: jax.Array  # (4, 4) absolute END pose of this frame
    begin_pose: jax.Array  # (4, 4) absolute BEGIN pose of this frame
    rel_pose: jax.Array  # (4, 4) end-to-end relative motion
    num_matches: jax.Array
    icp_cost: jax.Array
    inserted_keyframe: jax.Array


def init_state(config: CTICPConfig, dtype=jnp.float32) -> CTOdometryState:
    # NOTE: four distinct buffers — donation rejects aliased arguments
    return CTOdometryState(
        map=lm.init_local_map(config.local_map_size, config.num_points, dtype),
        end_pose=jnp.eye(4, dtype=dtype),
        begin_pose=jnp.eye(4, dtype=dtype),
        last_rel=jnp.eye(4, dtype=dtype),
        last_kf_pose=jnp.eye(4, dtype=dtype),
        frame_idx=jnp.zeros((), jnp.int32),
        boot_scan=jnp.zeros((config.num_points, 3), dtype),
        boot_alphas=jnp.zeros((config.num_points,), dtype),
    )


def _ct_warp(a_pose: jax.Array, b_pose: jax.Array, alphas: jax.Array,
             points: jax.Array) -> jax.Array:
    """Warp each point by the SE(3) geodesic between ``a_pose`` (alpha=0) and
    ``b_pose`` (alpha=1) sampled at its own timestamp. All (N,) batched."""
    tau = se3.log((se3.inverse(a_pose) @ b_pose)[None])[0]  # (6,)
    m = a_pose[None] @ se3.exp(alphas[:, None] * tau[None, :])  # (N, 4, 4)
    return (
        jnp.einsum("nij,nj->ni", m[:, :3, :3], points) + m[:, :3, 3]
    )


def _register_ct(
    config: CTICPConfig,
    model: jax.Array,
    points: jax.Array,
    alphas: jax.Array,
    a_init: jax.Array,
    mask: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Iterated associate + continuous-time point-to-plane GN.

    ``points (N,3)`` in the raw sensor frame of each point's own instant;
    ``alphas (N,)`` intra-scan fractions; the model map lives in the
    *predicted end* frame. Solves for ``(A, B)`` mapping sensor coordinates
    at alpha=0 / alpha=1 into the model frame, starting from
    ``A = a_init`` (begin anchor = previous end) and ``B = I`` (prediction).
    Returns ``(A, B, num_matches, cost)``.
    """
    dtype = points.dtype
    hp = jax.lax.Precision.HIGHEST
    n_pts = points.shape[0]

    anchor_t = a_init[:3, 3]
    anchor_r = a_init[:3, :3]
    tau_prior = se3.log((se3.inverse(a_init))[None])[0]  # prior sweep screw

    def body(carry):
        i, a_pose, b_pose, converged, _, _ = carry
        if config.elastic:
            warped = _ct_warp(a_pose, b_pose, alphas, points)
        else:  # MOTION_COMPENSATION=NONE: scan treated as instantaneous
            warped = se3.transform(b_pose[None], points[None])[0]
        gate = jnp.maximum(
            config.initial_assoc_distance * jnp.exp2(-i.astype(dtype)),
            config.max_assoc_distance,
        )
        target, normal, w_assoc = lm.associate(model, warped, config.projector, gate)
        w = w_assoc * mask
        sigma_i = jnp.maximum(config.sigma, 0.5 * gate)

        # point-to-plane rows at the warped positions (left-mult twist in the
        # model frame): j = [n, x × n], residual r = n·(x − q)
        res = jnp.sum(normal * (warped - target), axis=-1)
        j6 = jnp.concatenate([normal, jnp.cross(warped, normal)], axis=-1)
        rw = opt.robust_weights(res[None], config.scheme, sigma_i)[0] * w
        # split the row between the begin/end twists by the time weight
        wa = (1.0 - alphas) if config.elastic else jnp.zeros_like(alphas)
        wb = alphas if config.elastic else jnp.ones_like(alphas)
        j12 = jnp.concatenate([j6 * wa[:, None], j6 * wb[:, None]], axis=-1)
        wj = j12 * rw[:, None]
        h = jnp.einsum("nd,ne->de", wj, j12, precision=hp)
        g = jnp.einsum("nd,n->d", wj, res, precision=hp)
        n_eff = jnp.maximum(jnp.sum(rw), 1.0)

        # --- CT-ICP soft priors, scaled by the effective evidence ---
        # location consistency: trans(exp(xi_a) A) stays at the anchor.
        # d trans / d xi_a = [I | -t_A x]
        w_lc = config.beta_location_consistency * n_eff
        r_lc = a_pose[:3, 3] - anchor_t
        j_lc = jnp.concatenate(
            [jnp.eye(3, dtype=dtype), -_hat(a_pose[:3, 3])], axis=-1
        )
        # orientation consistency: log(R_A R_anchorᵀ) -> d/d xi_a ≈ [0 | I]
        w_oc = config.beta_orientation_consistency * n_eff
        r_oc = _so3_log(a_pose[:3, :3] @ anchor_r.T)
        j_oc = jnp.concatenate([jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)], -1)
        # constant velocity: sweep screw log(A⁻¹B) ≈ previous screw.
        # d log(A⁻¹B)/d xi_b ≈ I, d/d xi_a ≈ -I (first order, at identity)
        w_cv = config.beta_constant_velocity * n_eff
        r_cv = se3.log((se3.inverse(a_pose) @ b_pose)[None])[0] - tau_prior

        ha = jnp.zeros((12, 12), dtype)
        ga = jnp.zeros((12,), dtype)
        if config.elastic:
            j_a = jnp.concatenate([j_lc, j_oc], axis=0)  # (6, 6) wrt xi_a
            wvec = jnp.concatenate(
                [jnp.full((3,), w_lc, dtype), jnp.full((3,), w_oc, dtype)]
            )
            r_a = jnp.concatenate([r_lc, r_oc])
            ha = ha.at[:6, :6].add(
                jnp.einsum("nd,ne->de", j_a * wvec[:, None], j_a, precision=hp)
            )
            ga = ga.at[:6].add(
                jnp.einsum("nd,n->d", j_a * wvec[:, None], r_a, precision=hp)
            )
            # constant velocity couples both blocks: J = [-I6 | I6]
            hcv = w_cv * jnp.eye(6, dtype=dtype)
            ha = ha.at[:6, :6].add(hcv)
            ha = ha.at[6:, 6:].add(hcv)
            ha = ha.at[:6, 6:].add(-hcv)
            ha = ha.at[6:, :6].add(-hcv)
            ga = ga.at[:6].add(-w_cv * r_cv)
            ga = ga.at[6:].add(w_cv * r_cv)

        h = h + ha
        g = g + ga
        if not config.elastic:
            # rigid solve: keep the begin block anchored (identity rows)
            h = h.at[:6, :6].add(n_eff * jnp.eye(6, dtype=dtype))

        lam = 1e-9 * (jnp.trace(h) / 12.0 + 1.0)
        dx = -jnp.linalg.solve(h + lam * jnp.eye(12, dtype=dtype), g)
        dx_a, dx_b = dx[:6], dx[6:]
        new_a = se3.exp(dx_a) @ a_pose
        new_b = se3.exp(dx_b) @ b_pose
        step_norm = jnp.linalg.norm(dx)
        cost = jnp.sum((res * rw) ** 2)
        gate_done = gate <= config.max_assoc_distance * 1.001
        converged = jnp.logical_and(gate_done, step_norm < config.threshold_delta_pose)
        return i + 1, new_a, new_b, converged, jnp.sum(w), cost

    def cond(carry):
        i, _, _, converged, _, _ = carry
        return jnp.logical_and(i < config.max_num_alignments, jnp.logical_not(converged))

    init = (
        jnp.zeros((), jnp.int32),
        a_init.astype(dtype),
        jnp.eye(4, dtype=dtype),
        jnp.zeros((), bool),
        jnp.zeros((), dtype),
        jnp.zeros((), dtype),
    )
    _, a_pose, b_pose, _, num_matches, cost = jax.lax.while_loop(cond, body, init)
    del n_pts
    return a_pose, b_pose, num_matches, cost


def _hat(v: jax.Array) -> jax.Array:
    return jnp.array(
        [
            [0.0, -v[2], v[1]],
            [v[2], 0.0, -v[0]],
            [-v[1], v[0], 0.0],
        ],
        v.dtype,
    )


def _so3_log(r: jax.Array) -> jax.Array:
    from pwclonet_pylidarslam_tpu.core import rotation as rot

    return rot.so3_log(r[None])[0] if r.ndim == 2 else rot.so3_log(r)


def _point_normals(
    proj: SphericalProjector, points: jax.Array, valid: jax.Array, ksize: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-point normals via the scan's own vertex/normal maps (each point
    gathers the normal at its pixel). Returns ``(normals (N,3), ok (N,))``."""
    vmap = proj.build_projection_map(points[None])[0]
    normal_map = compute_normal_map(vmap[None], ksize)[0]
    rows, cols, _depth = spherical_pixel_coords(
        points[None], proj.height, proj.width,
        proj.min_vertical_fov, proj.max_vertical_fov,
    )
    r_i = jnp.clip(jnp.round(rows[0]).astype(jnp.int32), 0, proj.height - 1)
    c_i = jnp.clip(jnp.round(cols[0]).astype(jnp.int32), 0, proj.width - 1)
    pt_normals = normal_map[r_i, c_i]
    pt_ok = valid * (jnp.linalg.norm(pt_normals, axis=-1) > 0.5)
    return pt_normals, pt_ok


def process_frame(
    config: CTICPConfig,
    state: CTOdometryState,
    points: jax.Array,
    timestamps: Optional[jax.Array] = None,
) -> Tuple[CTOdometryState, CTFrameResult]:
    """One continuous-time odometry step.

    ``points (num_points, 3)`` raw (possibly motion-distorted) scan, zero rows
    = padding; ``timestamps (num_points,)`` intra-scan fractions in [0, 1]
    (azimuth-estimated when None, like the reference's ``estimate_timestamps``
    fallback in the Distortion filter, ``slam/preprocessing.py:150-191``).
    """
    proj = config.projector
    dtype = points.dtype
    finite = jnp.all(jnp.isfinite(points), axis=-1, keepdims=True)
    points = jnp.where(finite, points, 0.0)
    valid = (jnp.linalg.norm(points, axis=-1) > 1e-3).astype(dtype)
    if timestamps is None:
        alphas = estimate_timestamps(points[None])[0]
    else:
        alphas = jnp.clip(timestamps.astype(dtype), 0.0, 1.0)
    alphas = alphas * valid

    # prediction: end pose advances by the last relative motion; begin pose
    # is the previous end (sweep continuity)
    predicted_end = state.end_pose @ state.last_rel
    a_init = se3.inverse(state.last_rel)  # prev end, in predicted-end coords

    model = lm.build_model_map(state.map, predicted_end, proj)
    a_pose, b_pose, num_matches, cost = _register_ct(
        config, model, points, alphas, a_init, valid
    )

    new_end = se3.normalize(predicted_end @ b_pose)
    new_begin = se3.normalize(predicted_end @ a_pose)

    empty_map = jnp.sum(state.map.valid) == 0
    eye = jnp.eye(4, dtype=dtype)
    new_end = jnp.where(empty_map, state.end_pose, new_end)
    new_begin = jnp.where(empty_map, state.end_pose, new_begin)
    rel = se3.inverse(state.end_pose) @ new_end
    rel = jnp.where(empty_map, eye, rel)

    # de-skew the scan into the END frame with the *kinematic* solved motion
    # log(rel): the internal sweep screw log(A⁻¹B) is weakly observable at
    # constant velocity (deskewing scan and map by the SAME wrong screw is a
    # near gauge freedom), while the end-to-end motion is what registration
    # actually pins down. Under constant velocity they coincide.
    # elastic=False (the reference's MOTION_COMPENSATION=NONE for datasets
    # that ship pre-deskewed scans, e.g. KITTI odometry) keeps scans rigid.
    if config.elastic:
        deskewed = _ct_warp(se3.inverse(rel), eye, alphas, points)
    else:
        deskewed = points
    deskewed = deskewed * valid[:, None]

    kf_rel = se3.log((se3.inverse(state.last_kf_pose) @ new_end)[None])[0]
    trans_mag = jnp.linalg.norm(kf_rel[:3])
    rot_mag_deg = jnp.linalg.norm(kf_rel[3:]) * (180.0 / jnp.pi)
    do_insert = jnp.logical_or(
        jnp.logical_or(
            trans_mag > config.threshold_trans, rot_mag_deg > config.threshold_rot
        ),
        empty_map,
    )

    pt_normals, pt_ok = _point_normals(
        proj, deskewed, valid, config.normal_kernel_size
    )
    new_map = lm.insert_keyframe(
        state.map, deskewed, pt_normals, pt_ok, new_end, do_insert
    )

    # bootstrap repair (frame 1): frame 0 was inserted raw; re-deskew it with
    # the backdated velocity and overwrite slot 0 in place. Its end-of-sweep
    # pose is exactly this frame's begin pose.
    def repair_slot0(m):
        d0 = _ct_warp(se3.inverse(rel), eye, state.boot_alphas, state.boot_scan)
        v0 = (jnp.linalg.norm(state.boot_scan, axis=-1) > 1e-3).astype(dtype)
        d0 = d0 * v0[:, None]
        n0, ok0 = _point_normals(proj, d0, v0, config.normal_kernel_size)
        return m._replace(
            points=m.points.at[0].set(d0),
            normals=m.normals.at[0].set(n0),
            pt_valid=m.pt_valid.at[0].set(ok0),
            poses=m.poses.at[0].set(new_begin),
        )

    if config.elastic:
        new_map = jax.lax.cond(
            state.frame_idx == 1, repair_slot0, lambda m: m, new_map
        )

    new_state = CTOdometryState(
        map=new_map,
        end_pose=new_end,
        begin_pose=new_begin,
        last_rel=rel,
        last_kf_pose=jnp.where(do_insert, new_end, state.last_kf_pose),
        frame_idx=state.frame_idx + 1,
        boot_scan=jnp.where(state.frame_idx == 0, points, state.boot_scan),
        boot_alphas=jnp.where(state.frame_idx == 0, alphas, state.boot_alphas),
    )
    return new_state, CTFrameResult(
        pose=new_end,
        begin_pose=new_begin,
        rel_pose=rel,
        num_matches=num_matches,
        icp_cost=cost,
        inserted_keyframe=do_insert,
    )


def process_sequence(
    config: CTICPConfig,
    state: CTOdometryState,
    scans: jax.Array,
    timestamps: Optional[jax.Array] = None,
) -> Tuple[CTOdometryState, CTFrameResult]:
    """Run ``scans (T, N, 3)`` (+ optional ``timestamps (T, N)``) in one
    device dispatch under ``lax.scan``."""

    if timestamps is None:
        def body(s, scan):
            return process_frame(config, s, scan, None)

        return jax.lax.scan(body, state, scans)

    def body_t(s, scan_ts):
        scan, ts = scan_ts
        return process_frame(config, s, scan, ts)

    return jax.lax.scan(body_t, state, (scans, timestamps))


class CTICPOdometry:
    """Host-side driver — same protocol as ``ICPOdometry`` so it plugs into
    ``SLAM``/``SLAMRunner`` unchanged (capability of the reference's
    ``CT_ICPOdometry`` wrapper, ``ct_icp_odometry.py:200-369``)."""

    def __init__(self, config: Optional[CTICPConfig] = None):
        self.config = config or CTICPConfig()
        self._step = jax.jit(
            lambda state, pts, ts: process_frame(self.config, state, pts, ts),
            donate_argnums=0,
        )
        self._step_nots = jax.jit(
            lambda state, pts: process_frame(self.config, state, pts, None),
            donate_argnums=0,
        )
        self.state: Optional[CTOdometryState] = None
        self.results: list = []

    def init(self):
        self.state = init_state(self.config)
        self.results = []

    def process_next_frame(
        self, points: np.ndarray, timestamps: Optional[np.ndarray] = None
    ) -> np.ndarray:
        pts, ts = self._fix_size(points, timestamps)
        if ts is None:
            self.state, result = self._step_nots(self.state, jnp.asarray(pts))
        else:
            self.state, result = self._step(
                self.state, jnp.asarray(pts), jnp.asarray(ts)
            )
        self.results.append(result)
        return np.asarray(result.pose)

    def process_sequence(
        self, scans: np.ndarray, timestamps: Optional[np.ndarray] = None
    ) -> np.ndarray:
        if not hasattr(self, "_seq_step"):
            self._seq_step = jax.jit(
                lambda state, s, t: process_sequence(self.config, state, s, t),
                donate_argnums=0,
            )
            self._seq_step_nots = jax.jit(
                lambda state, s: process_sequence(self.config, state, s, None),
                donate_argnums=0,
            )
        if timestamps is None:
            self.state, results = self._seq_step_nots(self.state, jnp.asarray(scans))
        else:
            self.state, results = self._seq_step(
                self.state, jnp.asarray(scans), jnp.asarray(timestamps)
            )
        # ONE batched D2H fetch (per-leaf np.asarray = one tunnel RTT each)
        results = jax.device_get(results)
        for t in range(scans.shape[0]):
            self.results.append(jax.tree.map(lambda x: x[t], results))
        return results.pose

    def _fix_size(self, points: np.ndarray, timestamps: Optional[np.ndarray]):
        n = self.config.num_points
        pts = points.astype(np.float32)
        ts = None if timestamps is None else timestamps.astype(np.float32)
        if pts.shape[0] == n:
            return pts, ts
        if pts.shape[0] > n:
            idx = np.random.default_rng(pts.shape[0]).choice(
                pts.shape[0], n, replace=False
            )
            return pts[idx], (None if ts is None else ts[idx])
        pad = n - pts.shape[0]
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        if ts is not None:
            ts = np.concatenate([ts, np.zeros((pad,), np.float32)])
        return pts, ts

    def relative_poses(self) -> np.ndarray:
        return np.stack([np.asarray(r.rel_pose) for r in self.results])

    def absolute_poses(self) -> np.ndarray:
        return np.stack([np.asarray(r.pose) for r in self.results])
