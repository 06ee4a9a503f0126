"""Frame-to-model projective ICP odometry — one jitted step per frame.

Re-design of the reference's ``ICPFrameToModel`` (``slam/odometry/icp_odometry.py``)
for TPU: the entire per-frame pipeline (constant-velocity initialization →
vertex/normal map build → model re-projection → iterated associate+GN →
motion-gated keyframe insert) is a single compiled function over a persistent
on-device state pytree. The host only reads back the 4×4 pose (SURVEY.md §7
"host/device orchestration" hard part).

Semantics preserved from the reference:
- constant-velocity motion prior (``initialization.py:106-135``);
- outer ICP loop with step-norm early stop ``threshold_delta_pose``
  (``icp_odometry.py:248-299``) — expressed as a convergence mask inside a
  fixed-trip ``lax.fori_loop``;
- motion-gated map insert: translation > ``threshold_trans`` (0.1 m) or
  rotation > ``threshold_rot`` (0.3°) since the last inserted keyframe
  (``icp_odometry.py:361-381``), forced insert on an empty map;
- robust point-to-plane GN with sigma 0.1 (config defaults ``:48-50``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import optimization as opt, se3
from pwclonet_pylidarslam_tpu.core.geometry import compute_normal_map
from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector
from pwclonet_pylidarslam_tpu.slam import local_map as lm


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Config mirroring ``ICPFrameToModelConfig`` (ref icp_odometry.py:30-65)."""

    # None = vertex-map resolution auto-matched to scan density (see
    # core.projection.density_matched_projector and __post_init__ below);
    # pass an explicit projector to override.
    projector: Optional[SphericalProjector] = None
    num_points: int = 8192  # fixed scan size (pad/subsample on the host)
    local_map_size: int = 20
    max_num_alignments: int = 15
    # minimum association support for a GN update: with fewer weighted
    # matches the 6x6 system is under-determined and the damped solve can
    # fire the pose into space (observed: 2 matches -> 1.2 m jump -> NaN
    # cascade). Below this the step is skipped and the motion prior holds.
    min_matches: int = 12
    threshold_delta_pose: float = 1e-4
    threshold_trans: float = 0.1  # meters
    threshold_rot: float = 0.3  # degrees
    sigma: float = 0.1  # robust scheme scale (floor; annealed with the gate)
    scheme: str = "huber"
    # robust sigma anneal: sigma_i = max(sigma, sigma_anneal * gate). The
    # coarse-iteration floor keeps far-off true evidence alive under fast
    # motion; the converged floor (sigma_anneal * max_assoc_distance) sets
    # how hard near-range outliers (moving vehicles: ~0.1-0.3 m coherent
    # residuals) are rejected at the end.
    sigma_anneal: float = 0.5
    # coarse-to-fine association gate: starts at ``initial_assoc_distance``
    # and halves every outer iteration down to ``max_assoc_distance``; a
    # fixed tight gate rejects all matches when the motion prior is off by
    # more than the gate (found by probing fast straight motion).
    max_assoc_distance: float = 0.5
    initial_assoc_distance: float = 4.0
    gn_iters_per_alignment: int = 1
    normal_kernel_size: int = 5
    # BEV bootstrap: when the constant-velocity prior disagrees with a BEV
    # spectral registration of the two latest scans by more than
    # ``bev_yaw_threshold_deg``, the BEV estimate replaces the prior. Rescues
    # fast-rotation frames (> a few deg/frame) where the CV prediction throws
    # the association gate off by ``range × Δyaw`` meters. Runs fully
    # in-graph (FFT phase correlation, core/registration.py); adds two
    # 256²-FFT registrations per frame when enabled.
    bev_bootstrap: bool = False
    bev_yaw_threshold_deg: float = 1.5
    # planar-translation disagreement (meters) between the CV prediction and
    # the BEV registration above which the BEV estimate replaces the prior —
    # breaks the CV feedback loop's velocity-error windup (see process_frame)
    bev_trans_threshold: float = 0.4
    bev_min_confidence: float = 2.0
    # keyframes enter the map angularly downsampled by this stride: the model
    # re-projection (z-buffer scatter of K·N points) is the dominant per-frame
    # device cost, and it scales linearly with stored points. Stride 2 halves
    # it; the aggregated multi-keyframe model stays dense enough that the
    # trajectory is unchanged on the synthetic benchmark (drift gate <1%).
    map_stride: int = 1
    # quantize scans to int16 for the host→device transfer (dequantized
    # in-graph). Halves upload bytes — the upload is the wall-clock floor on
    # a network-attached chip. 5 mm resolution, ±163 m range: below LiDAR
    # sensor noise. "float32" disables.
    transfer_dtype: str = "float32"  # float32 | int16
    transfer_scale: float = 0.005  # meters / LSB for int16 transfers
    # lazy model re-projection: keep the aggregated model map cached in the
    # frame it was last built in and only re-scatter (the dominant device
    # cost, ~60% of the step) once the sensor has moved more than
    # ``model_rebuild_trans`` meters / ``model_rebuild_rot`` degrees from
    # that frame. Registration then runs in the cached frame (the GN delta
    # is initialized at ``model_pose⁻¹·predicted`` instead of identity) —
    # projective association only needs ONE common frame, so a bounded-stale
    # vantage costs only disocclusion matches, which the distance gate
    # already rejects. 0/0 = rebuild every frame (reference behavior,
    # ``ProjectiveLocalMap.build_model`` per frame, local_map.py:177-202).
    model_rebuild_trans: float = 0.0  # meters
    model_rebuild_rot: float = 0.0  # degrees
    # association structure: "projective" = z-buffer model map + pixel gather
    # (ref ProjectiveLocalMap); "voxel" = voxel-hash bucket NN over the same
    # keyframe store (the TPU equivalent of the reference's KdTreeLocalMap,
    # its most accurate config — exact-radius NN instead of same-pixel
    # association). Voxel association reach is bounded by one voxel ring
    # (~2·voxel_size), so it leans on the motion prior instead of the
    # coarse-to-fine pixel gate.
    association: str = "projective"  # projective | voxel
    voxel_size: float = 1.5  # meters (voxel mode; also the NN search reach)
    # hash-table rows. The per-frame build scatters rows*cap slots, so the
    # table size is a direct latency lever: 2^14 measures 34 ms/frame vs
    # 51 ms at 2^16 with IDENTICAL t_rel on the bench world (the grid-sampled
    # map holds ~40k points; collisions only add distance-tested candidates).
    # Raise to 2^16 for much denser maps (voxel_sample_size=0, map_stride=1,
    # large local_map_size).
    voxel_table_size: int = 1 << 14
    voxel_bucket_cap: int = 64
    # grid-sample the aggregated map to ONE point per this sub-voxel before
    # bucketing (0 = off). Without it, dense surfaces (near ground, facades)
    # overflow the bucket cap and the drop order is arbitrary — measured on
    # the kitti_drive world, that preferentially evicts the SPARSE
    # along-track-facing features (pole/car/corner points sharing cells with
    # dominant walls), leaving the point-to-plane system blind along-track:
    # the solver then locks into a zero-motion basin for whole bursts of
    # frames (~1 m/frame error at 6k confident matches). Uniform density
    # capping keeps one point per sub-voxel, so small features survive in
    # their own cells; a 3 m bucket then holds ≤(3/0.45)²≈44 ground points,
    # within cap. (The reference's KdTree stores raw points — exact NN has
    # no drop bias to begin with; this restores that property.)
    voxel_sample_size: float = 0.45  # meters
    # exclude the most recently inserted keyframe from voxel association
    # (when the map holds more than one). A vehicle pacing the sensor is
    # near-stationary in the sensor frame: its newest map imprint sits at
    # ~zero displacement from the incoming scan and votes coherently for a
    # zero-motion pose, while its older imprints are smeared along the
    # relative track and get rejected as outliers. Associating against
    # map-minus-newest removes the coherent zero-offset cluster and keeps
    # the (well-aligned) static world. Static scenes are unaffected.
    voxel_skip_latest_keyframe: bool = True
    # 27 = 3x3x3 cells of voxel_size; 8 = half-offset 2x2x2 cells of
    # 2·voxel_size (same exactness guarantee within voxel_size, 3.4x fewer
    # bucket gathers — pair with a larger bucket cap). 8 measures both
    # faster (87 vs 110 ms/frame) and more accurate (larger cells drop
    # fewer points at equal candidate count).
    voxel_neighborhood: int = 8
    # gather each point's neighbor buckets once per frame and re-associate
    # from the cached candidates inside the GN loop (streaming argmin, no
    # per-iteration table gathers). Off = re-gather every iteration (exact
    # voxel_nn semantics even under huge per-iteration corrections).
    voxel_candidate_cache: bool = True
    # movement-gated cache refresh: re-gather when ANY point moved more
    # than this fraction of voxel_size since the cached buckets were
    # gathered. Within the margin the cached octant set still contains the
    # true NN out to (1 - margin)·voxel_size, so accuracy matches exact
    # re-gathering; early large-correction iterations refresh automatically,
    # the converged tail (sub-centimeter steps) never does.
    voxel_cache_margin: float = 0.25
    # rebuild the voxel table every R frames instead of every frame (1 =
    # per-frame rebuild, the reference's per-update kdtree cadence). The
    # table is cached in the frame it was built in (like the projective
    # model map's lazy rebuild) and queries warp through
    # ``table_pose⁻¹ · predicted``, so geometry stays exact; the only
    # staleness is that the newest (R-1) keyframes are missing from the
    # association set — on top of the already-excluded latest keyframe
    # (voxel_skip_latest_keyframe). The per-frame build (flatten + grid
    # sample + sort + scatter of ~82k map points) amortizes R-fold.
    voxel_rebuild_every: int = 1
    # fuse the grid-sample dedup into the table-build sort (ONE ~M-element
    # device sort per rebuild instead of two; local_map.build_voxel_table_fused).
    # Dedup becomes per (bucket, subcell) instead of per global subcell —
    # strictly more coverage for straddling subcells, same drop discipline.
    voxel_fused_build: bool = False
    # re-associate correspondences every k GN iterations (1 = every
    # iteration). The voxel NN's 27-bucket candidate gather dominates its
    # device time; holding correspondences fixed for a few Newton steps
    # (classic nested-ICP) cuts it ~k× with no measurable accuracy cost.
    reassociate_every: int = 1
    # constant-velocity motion-prior factor added to the GN normal equations
    # (weights = 1/sigma^2; 0 disables). Point-to-plane residuals are
    # invariant to sliding along planes, so scenes dominated by few plane
    # orientations (straight streets: ground + parallel facades) leave the
    # along-track direction in a near-null valley — GN then drifts along it
    # without converging and the CV prior compounds the slide into a
    # runaway (observed on the kitti_drive world at the first 90-deg turn).
    # Anchoring the weak subspace to the predicted motion bounds the slide
    # while leaving well-observed directions untouched. Same idea as CT-ICP's
    # location/velocity consistency regularizers. MEASURED caveat: a strong
    # prior (sigma 0.1 m) turns the estimator into a velocity-hold filter
    # that lags real accelerations (rel err ramps to >1 m during the
    # kitti_drive pull-away) — keep 0 (off) unless the scene is truly
    # degenerate.
    prior_sigma_trans: float = 0.0  # meters of allowed deviation from CV (0=off)
    prior_sigma_rot_deg: float = 0.0  # degrees (0=off)

    def __post_init__(self):
        if self.projector is None:
            from pwclonet_pylidarslam_tpu.core.projection import (
                density_matched_projector,
            )

            object.__setattr__(
                self, "projector", density_matched_projector(self.num_points)
            )


class OdometryState(NamedTuple):
    map: lm.LocalMapState
    pose: jax.Array  # (4, 4) absolute pose of the last processed frame
    last_rel: jax.Array  # (4, 4) last relative motion (constant-velocity prior)
    last_kf_pose: jax.Array  # (4, 4) pose of the last inserted keyframe
    frame_idx: jax.Array  # () int32
    prev_scan: jax.Array  # (N, 3) previous raw scan (BEV bootstrap source)
    model: jax.Array  # (H, W, 6) cached aggregated model map
    model_pose: jax.Array  # (4, 4) frame the cached model/table was built in
    model_valid: jax.Array  # () float 0/1 — cache holds a real model/table
    # cached voxel table (voxel mode with voxel_rebuild_every > 1; zero-size
    # otherwise) — the lazy-rebuild equivalent of ``model`` for bucket NN
    vox_pts: jax.Array  # (table_size, bucket_cap, 3) or (0, 0, 3)
    vox_nrm: jax.Array  # (table_size, bucket_cap, 3) or (0, 0, 3)


class FrameResult(NamedTuple):
    pose: jax.Array  # (4, 4) absolute pose of this frame
    rel_pose: jax.Array  # (4, 4) relative motion from the previous frame
    num_matches: jax.Array  # () number of valid associations in the last iter
    icp_cost: jax.Array  # () final weighted cost
    inserted_keyframe: jax.Array  # () bool


def init_state(config: ICPConfig, dtype=jnp.float32) -> OdometryState:
    return OdometryState(
        map=lm.init_local_map(
            config.local_map_size, config.num_points // config.map_stride, dtype
        ),
        pose=jnp.eye(4, dtype=dtype),
        last_rel=jnp.eye(4, dtype=dtype),
        last_kf_pose=jnp.eye(4, dtype=dtype),
        frame_idx=jnp.zeros((), jnp.int32),
        prev_scan=jnp.zeros((config.num_points, 3), dtype),
        model=jnp.zeros(
            (config.projector.height, config.projector.width, 6), dtype
        ),
        model_pose=jnp.eye(4, dtype=dtype),
        model_valid=jnp.zeros((), dtype),
        vox_pts=jnp.full(_vox_cache_shape(config), 1e9, dtype),
        vox_nrm=jnp.zeros(_vox_cache_shape(config), dtype),
    )


def _vox_cache_shape(config: ICPConfig) -> Tuple[int, int, int]:
    """Shape of the cached voxel table — zero-size unless the lazy voxel
    rebuild is on (the cache costs ~25 MB of donated state otherwise)."""
    if config.association == "voxel" and config.voxel_rebuild_every > 1:
        return (config.voxel_table_size, config.voxel_bucket_cap, 3)
    return (0, 0, 3)


def _register(
    config: ICPConfig,
    assoc_fn,
    points: jax.Array,
    mask: jax.Array,
    init_delta: Optional[jax.Array] = None,
    assoc_cache_fns=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Iterated associate + point-to-plane GN against the local map.

    ``assoc_fn(warped (N,3), gate) -> (targets, normals, weights)`` supplies
    correspondences (projective model-map gather or voxel-hash NN). Returns
    the correction ``delta (4,4)`` mapping current-scan coordinates to
    map-frame coordinates, so the refined frame pose is
    ``model_pose @ delta``. ``init_delta`` seeds the iteration (identity when
    the model was built in the predicted frame; ``model_pose⁻¹·predicted``
    under lazy rebuilds). Also returns (num_matches, cost) of the final
    iteration.
    """

    def body(carry):
        i, delta, converged, _, _, corr = carry
        warped = se3.transform(delta[None], points[None])[0]
        gate = jnp.maximum(
            config.initial_assoc_distance * jnp.exp2(-i.astype(points.dtype)),
            config.max_assoc_distance,
        )
        if assoc_cache_fns is not None:
            gather_fn, from_cache_fn = assoc_cache_fns
            *cache, anchor = corr
            margin = config.voxel_cache_margin * config.voxel_size
            moved = jnp.max(jnp.sum((warped - anchor) ** 2, axis=-1))
            refresh = jnp.logical_or(i == 0, moved > margin * margin)
            corr = jax.lax.cond(
                refresh,
                lambda: tuple(gather_fn(warped)) + (warped,),
                lambda: corr,
            )
            target, normal, w_assoc = from_cache_fn(corr[:-1], warped, gate, refresh)
        elif config.reassociate_every > 1:
            corr = jax.lax.cond(
                i % config.reassociate_every == 0,
                lambda: assoc_fn(warped, gate),
                lambda: corr,
            )
            target, normal, w_assoc = corr
        else:
            target, normal, w_assoc = assoc_fn(warped, gate)
        w = w_assoc * mask
        # anneal the robust scale with the gate: with a tight sigma at coarse
        # iterations, spurious zero-residual matches outweigh the true
        # large-residual evidence and ICP stalls under fast motion (found by
        # probing 2 m/frame straight sequences)
        sigma_i = jnp.maximum(config.sigma, config.sigma_anneal * gate)
        # one inlined GN step (no nested while_loop — loop overhead per outer
        # iteration dominates the actual 6x6 solve on TPU)
        res, jac = opt.point_to_plane_residual_jac(
            delta[None], points[None], target[None], normal[None], mask=w[None]
        )
        rw = opt.robust_weights(res, config.scheme, sigma_i)
        wres = res * rw
        wjac = jac * rw[..., None]
        # HIGHEST precision: TPU f32 einsums run bf16 passes by default,
        # which visibly degrades the GN step (drift 0.15% -> 1.0% on bench)
        hp = jax.lax.Precision.HIGHEST
        h = jnp.einsum("bnd,bne->bde", wjac, wjac, precision=hp)[0]
        g = jnp.einsum("bnd,bn->bd", wjac, wres, precision=hp)[0]
        if w_prior is not None:
            # motion-prior factor: residual log(delta·init⁻¹) with J ≈ I
            # (exact at the anchor, where it matters)
            xi = se3.log((delta @ inv_init)[None])[0]
            h = h + jnp.diag(w_prior)
            g = g + w_prior * xi
        lam = 1e-9 * (jnp.trace(h) / 6.0 + 1.0)
        dx = -jnp.linalg.solve(h + lam * jnp.eye(6, dtype=h.dtype), g)
        # support/finiteness gate: no update from a degenerate system
        good = jnp.logical_and(
            jnp.sum(w) >= config.min_matches, jnp.all(jnp.isfinite(dx))
        )
        dx = jnp.where(good, dx, 0.0)
        new_delta = se3.exp(dx) @ delta
        step_norm = jnp.linalg.norm(dx)
        cost = jnp.sum(wres[0] ** 2)
        # only declare convergence once the gate has annealed to its floor,
        # otherwise a small early step under a wide gate stops the loop
        gate_done = gate <= config.max_assoc_distance * 1.001
        converged = jnp.logical_and(gate_done, step_norm < config.threshold_delta_pose)
        return i + 1, new_delta, converged, jnp.sum(w), cost, corr

    def cond(carry):
        i, _, converged, _, _, _ = carry
        return jnp.logical_and(i < config.max_num_alignments, jnp.logical_not(converged))

    n = points.shape[0]
    w_prior = None
    inv_init = None
    if config.prior_sigma_trans > 0 or config.prior_sigma_rot_deg > 0:
        # each component enables independently (a zero sigma disables only
        # its half with weight 0 — ADVICE r2)
        wt = 1.0 / config.prior_sigma_trans**2 if config.prior_sigma_trans > 0 else 0.0
        wr = (
            1.0 / float(np.deg2rad(config.prior_sigma_rot_deg)) ** 2
            if config.prior_sigma_rot_deg > 0
            else 0.0
        )
        w_prior = jnp.asarray([wt, wt, wt, wr, wr, wr], points.dtype)
        inv_init = (
            jnp.eye(4, dtype=points.dtype)
            if init_delta is None
            else se3.inverse(init_delta)
        )
    if assoc_cache_fns is not None:
        # zero-init carry with the cache pytree structure (first body
        # iteration re-gathers at i=0 before use)
        corr0 = jax.tree.map(
            lambda a: jnp.zeros(a.shape, a.dtype),
            jax.eval_shape(assoc_cache_fns[0], points),
        )
        corr0 = tuple(corr0) + (jnp.zeros_like(points),)  # + anchor positions
    else:
        corr0 = (
            jnp.zeros((n, 3), points.dtype),
            jnp.zeros((n, 3), points.dtype),
            jnp.zeros((n,), points.dtype),
        )
    init = (
        jnp.zeros((), jnp.int32),
        jnp.eye(4, dtype=points.dtype) if init_delta is None else init_delta,
        jnp.zeros((), bool),
        jnp.zeros((), points.dtype),
        jnp.zeros((), points.dtype),
        corr0,
    )
    # while_loop: genuinely stops at convergence instead of masking the
    # remaining fixed-trip iterations (2-3x fewer iterations on average)
    _, delta, _, num_matches, cost, _ = jax.lax.while_loop(cond, body, init)
    return delta, num_matches, cost


def process_frame(
    config: ICPConfig, state: OdometryState, points: jax.Array
) -> Tuple[OdometryState, FrameResult]:
    """One odometry step. ``points (num_points, 3)``, zero rows = padding.

    Pure function of (state, scan); jit with
    ``jax.jit(process_frame, static_argnums=0)`` — ``ICPOdometry`` below does
    this once and reuses the compiled step for a whole sequence.
    """
    proj = config.projector
    dtype = points.dtype
    # scrub non-finite returns to padding (ref utils.remove_nan:171)
    finite = jnp.all(jnp.isfinite(points), axis=-1, keepdims=True)
    points = jnp.where(finite, points, 0.0)
    valid = (jnp.linalg.norm(points, axis=-1) > 1e-3).astype(dtype)

    # --- constant-velocity prediction (ref initialization.py:106-135)
    rel_prior = state.last_rel
    if config.bev_bootstrap:
        from pwclonet_pylidarslam_tpu.core.registration import (
            BEVConfig,
            planar_to_pose,
            register_bev,
        )

        prev_valid = (jnp.linalg.norm(state.prev_scan, axis=-1) > 1e-3).astype(dtype)
        reg = register_bev(
            state.prev_scan, prev_valid, points, valid,
            BEVConfig(pixel_size=0.4, image_size=256),
        )
        rel_bev = planar_to_pose(reg, dtype)
        yaw_cv = jnp.arctan2(state.last_rel[1, 0], state.last_rel[0, 0])
        dyaw = jnp.abs(
            jnp.mod(reg.yaw - yaw_cv + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        ) * (180.0 / jnp.pi)
        # translation disagreement: the CV prior is a FEEDBACK loop
        # (estimate -> next prior); a biased registration winds velocity
        # error up until the association basin captures the wrong surface
        # (measured: GT-prior run tracks the kitti_drive 90-deg turn at
        # ~1 cm/frame while the CV loop diverges to 20 m). The BEV phase
        # correlation is a prior-FREE per-frame measurement — switching to
        # it when the CV prediction drifts from it re-grounds the loop.
        dtrans = jnp.linalg.norm(rel_bev[:2, 3] - state.last_rel[:2, 3])
        use_bev = (
            (
                (dyaw > config.bev_yaw_threshold_deg)
                | (dtrans > config.bev_trans_threshold)
            )
            & (reg.confidence > config.bev_min_confidence)
            & (state.frame_idx > 0)
        )
        rel_prior = jnp.where(use_bev, rel_bev, state.last_rel)
    predicted = state.pose @ rel_prior

    empty_map = jnp.sum(state.map.valid) == 0
    if config.association == "voxel":
        # KdTree-equivalent: voxel-hash bucket NN over the keyframe store
        # (like the reference's per-update kdtree rebuild, local_map.py:365-369,
        # but one sort + one unique scatter on device instead of a CPU tree
        # build). With ``voxel_rebuild_every`` R > 1, the table is rebuilt
        # every R frames and cached in its build frame; queries warp through
        # ``table_pose⁻¹ · predicted`` exactly like the projective model
        # map's lazy rebuild.
        cell = config.voxel_size * (2.0 if config.voxel_neighborhood == 8 else 1.0)

        def _build_table():
            flat_pts, flat_nrm, flat_ok = lm.flatten_map_points(state.map, predicted)
            if config.voxel_skip_latest_keyframe:
                k, p = state.map.points.shape[:2]
                latest = (state.map.next_slot - 1) % k
                slot_ids = jnp.repeat(jnp.arange(k), p)
                multi = jnp.sum(state.map.valid) > 1.5  # 1-keyframe map usable
                flat_ok2 = jnp.where(
                    jnp.logical_and(multi, slot_ids == latest), 0.0, flat_ok
                )
            else:
                flat_ok2 = flat_ok
            if config.voxel_fused_build and config.voxel_sample_size > 0:
                return lm.build_voxel_table_fused(
                    flat_pts, flat_nrm, flat_ok2, cell,
                    config.voxel_sample_size,
                    config.voxel_table_size, config.voxel_bucket_cap,
                )
            if config.voxel_sample_size > 0:
                from pwclonet_pylidarslam_tpu.core.pointcloud import grid_sample_mask

                keep = grid_sample_mask(
                    flat_pts, config.voxel_sample_size, valid=flat_ok2
                )
                flat_ok2 = flat_ok2 * keep.astype(flat_ok2.dtype)
            return lm.build_voxel_table(
                flat_pts, flat_nrm, flat_ok2, cell,
                config.voxel_table_size, config.voxel_bucket_cap,
            )

        if config.voxel_rebuild_every <= 1:
            table = _build_table()
            table_pose = predicted
            table_valid = jnp.where(empty_map, 0.0, 1.0).astype(dtype)
        else:
            refresh = jnp.logical_or(
                state.model_valid == 0,
                state.frame_idx % config.voxel_rebuild_every == 0,
            )
            tp, tn, table_pose, table_valid = jax.lax.cond(
                refresh,
                lambda: (
                    *_build_table(),
                    predicted,
                    jnp.where(empty_map, 0.0, 1.0).astype(dtype),
                ),
                lambda: (
                    state.vox_pts, state.vox_nrm,
                    state.model_pose, state.model_valid,
                ),
            )
            table = lm.VoxelTable(points=tp, normals=tn)

        assoc_cache_fns = None
        if config.voxel_candidate_cache:
            # per-point candidate buckets gathered inside the GN loop every
            # voxel_cache_refresh_every iterations; the iterations between
            # refreshes re-associate from the cache (streaming argmin)
            # the cached octant set is only complete out to
            # (1 - margin)*voxel_size once points may have drifted the margin
            # since the gather — clamp the acceptance gate there on STALE
            # iterations so an outer-ring candidate can't beat the true NN.
            # On refresh iterations (candidates gathered at the CURRENT
            # positions, including i=0) the full voxel_size reach is valid —
            # clamping those too cuts the recovery reach below one frame of
            # motion (~1.1-1.3 m at the clamp's 1.125 m), and a failed prior
            # then locks the solver into a zero-motion basin for bursts of
            # frames (measured: 0.12% vs 31% t_rel on the 32-beam world).
            assoc_cache_fns = (
                lambda warped: lm.gather_voxel_candidates(
                    table, warped, config.voxel_size,
                    neighborhood=config.voxel_neighborhood,
                ),
                lambda cache, warped, gate, fresh: lm.nn_from_candidates(
                    cache[0], cache[1], warped,
                    jnp.minimum(
                        gate,
                        jnp.where(
                            fresh,
                            config.voxel_size,
                            (1.0 - config.voxel_cache_margin) * config.voxel_size,
                        ),
                    ),
                ),
            )

        def assoc_fn(warped, gate):
            return lm.voxel_nn(
                table, warped, config.voxel_size,
                jnp.minimum(gate, config.voxel_size),
                neighborhood=config.voxel_neighborhood,
            )

        model, model_pose, model_valid = state.model, table_pose, table_valid
        # R<=1: the table was built in the predicted frame — exact identity
        # seed (None), bit-identical to the per-frame-rebuild behavior
        init_delta = (
            None if config.voxel_rebuild_every <= 1
            else se3.inverse(table_pose) @ predicted
        )
        delta, num_matches, cost = _register(
            config, assoc_fn, points, valid, init_delta,
            assoc_cache_fns=assoc_cache_fns,
        )
        new_pose = se3.normalize(table_pose @ delta)
    else:
        # --- model map: rebuild when the cache is stale (lazy) or always
        # (reference behavior, thresholds 0). The staleness test compares the
        # predicted pose to the frame the cached model was built in.
        stale_tw = se3.log((se3.inverse(state.model_pose) @ predicted)[None])[0]
        stale = jnp.logical_or(
            jnp.linalg.norm(stale_tw[:3]) > config.model_rebuild_trans,
            jnp.linalg.norm(stale_tw[3:]) * (180.0 / jnp.pi) > config.model_rebuild_rot,
        )
        rebuild = jnp.logical_or(stale, state.model_valid == 0)

        model, model_pose = jax.lax.cond(
            rebuild,
            lambda: (lm.build_model_map(state.map, predicted, proj), predicted),
            lambda: (state.model, state.model_pose),
        )
        model_valid = jnp.where(
            rebuild, jnp.where(empty_map, 0.0, 1.0).astype(dtype), state.model_valid
        )

        init_delta = se3.inverse(model_pose) @ predicted  # identity on rebuild

        def assoc_fn(warped, gate):
            return lm.associate(model, warped, proj, gate)

        delta, num_matches, cost = _register(config, assoc_fn, points, valid, init_delta)
        # refined absolute pose: scan -> model frame via delta, then model -> world
        new_pose = se3.normalize(model_pose @ delta)

    # non-finite guard (ref trainer/odometry NaN discipline, in-graph): a
    # blown-up registration falls back to the motion prior instead of
    # poisoning the pose chain
    new_pose = jnp.where(jnp.all(jnp.isfinite(new_pose)), new_pose, predicted)

    # first frame (empty map): registration is a no-op; pose stays as-is
    new_pose = jnp.where(empty_map, state.pose, new_pose)

    rel = se3.inverse(state.pose) @ new_pose
    rel = jnp.where(empty_map, jnp.eye(4, dtype=dtype), rel)

    # --- motion-gated keyframe insert (ref icp_odometry.py:361-381)
    kf_rel = se3.log((se3.inverse(state.last_kf_pose) @ new_pose)[None])[0]
    trans_mag = jnp.linalg.norm(kf_rel[:3])
    rot_mag_deg = jnp.linalg.norm(kf_rel[3:]) * (180.0 / jnp.pi)
    do_insert = jnp.logical_or(
        jnp.logical_or(
            trans_mag > config.threshold_trans, rot_mag_deg > config.threshold_rot
        ),
        empty_map,
    )

    # per-point normals: build the scan's vertex/normal maps once, then
    # gather each point's normal at its pixel (points that lost the z-buffer
    # race inherit the winning neighbor's normal — same surface)
    vmap = proj.build_projection_map(points[None])[0]
    normal_map = compute_normal_map(vmap[None], config.normal_kernel_size)[0]
    from pwclonet_pylidarslam_tpu.core.projection import spherical_pixel_coords

    rows, cols, _depth = spherical_pixel_coords(
        points[None], proj.height, proj.width,
        proj.min_vertical_fov, proj.max_vertical_fov,
    )
    r_i = jnp.clip(jnp.round(rows[0]).astype(jnp.int32), 0, proj.height - 1)
    c_i = jnp.clip(jnp.round(cols[0]).astype(jnp.int32), 0, proj.width - 1)
    pt_normals = normal_map[r_i, c_i]
    pt_ok = valid * (jnp.linalg.norm(pt_normals, axis=-1) > 0.5)
    st = config.map_stride
    new_map = lm.insert_keyframe(
        state.map, points[::st], pt_normals[::st], pt_ok[::st], new_pose, do_insert
    )

    lazy_vox = config.association == "voxel" and config.voxel_rebuild_every > 1
    new_state = OdometryState(
        map=new_map,
        pose=new_pose,
        last_rel=rel,
        last_kf_pose=jnp.where(do_insert, new_pose, state.last_kf_pose),
        frame_idx=state.frame_idx + 1,
        prev_scan=points,
        model=model,
        model_pose=model_pose,
        model_valid=model_valid,
        vox_pts=table.points if lazy_vox else state.vox_pts,
        vox_nrm=table.normals if lazy_vox else state.vox_nrm,
    )
    return new_state, FrameResult(
        pose=new_pose,
        rel_pose=rel,
        num_matches=num_matches,
        icp_cost=cost,
        inserted_keyframe=do_insert,
    )


def process_sequence(
    config: ICPConfig, state: OdometryState, scans: jax.Array
) -> Tuple[OdometryState, FrameResult]:
    """Run a whole sequence ``scans (T, N, 3)`` on device under ``lax.scan``.

    One dispatch for T frames: no per-frame host↔device round trips (the
    per-frame API pays one upload + one sync per frame, which dominates over
    a network-attached device). Returns stacked per-frame results.
    """

    def body(s, scan):
        s2, r = process_frame(config, s, scan)
        return s2, r

    return jax.lax.scan(body, state, scans)


class ICPOdometry:
    """Host-side driver holding the compiled step and the device state.

    Replaces ``ICPFrameToModel`` + ``OdometryAlgorithm`` (ref
    ``slam/odometry/icp_odometry.py:72-382``). Usage::

        odo = ICPOdometry(ICPConfig())
        odo.init()
        for scan in scans:                # (N, 3) numpy, zero rows = padding
            pose = odo.process_next_frame(scan)
    """

    def __init__(self, config: Optional[ICPConfig] = None):
        self.config = config or ICPConfig()
        # donate the state: the ring-buffer maps (~20 MB) update in place on
        # device instead of being copied every frame
        # the WHOLE SLAM step traces under f32 matmuls: TPU's default bf16
        # passes put up to 0.33 m of error on pose chains and point
        # transforms (measured), which wrecks ICP at a 0.5 m gate. The
        # network keeps bf16 — only the geometry path pays for f32.
        def _stepfn(state, pts):
            with jax.default_matmul_precision("highest"):
                return process_frame(self.config, state, self._dequant(pts))

        self._step = jax.jit(_stepfn, donate_argnums=0)
        self.state: Optional[OdometryState] = None
        self.results: list = []

    def _dequant(self, pts: jax.Array) -> jax.Array:
        return dequantize_scans(self.config, pts)

    def _quant(self, pts: np.ndarray) -> np.ndarray:
        return quantize_scans(self.config, pts)

    def init(self):
        self.state = init_state(self.config)
        self.results = []

    def process_next_frame(self, points: np.ndarray) -> np.ndarray:
        """Feed one scan ``(N, 3)``; returns the absolute 4×4 pose (numpy)."""
        pts = self._quant(self._fix_size(points))
        self.state, result = self._step(self.state, jnp.asarray(pts))
        self.results.append(result)
        return np.asarray(result.pose)

    def _fix_size(self, points: np.ndarray) -> np.ndarray:
        # per-frame seed: equal-sized scans must not share one row subset
        return fix_scan_size(points, self.config.num_points, seed=len(self.results))

    def process_sequence(self, scans: np.ndarray) -> np.ndarray:
        """Process ``(T, N, 3)`` scans in one device dispatch (lax.scan).

        Appends all per-frame results and returns absolute poses ``(T,4,4)``.
        """
        if not hasattr(self, "_seq_step"):
            def _seqfn(state, s):
                with jax.default_matmul_precision("highest"):
                    return process_sequence(self.config, state, self._dequant(s))

            self._seq_step = jax.jit(_seqfn, donate_argnums=0)
        self.state, results = self._seq_step(
            self.state, jnp.asarray(self._quant(scans))
        )
        # ONE batched D2H fetch: per-leaf np.asarray pays a full tunnel
        # round trip per array (~25 ms each on a network-attached TPU)
        results = jax.device_get(results)
        for t in range(scans.shape[0]):
            self.results.append(jax.tree.map(lambda x: x[t], results))
        return results.pose

    def relative_poses(self) -> np.ndarray:
        return np.stack([np.asarray(r.rel_pose) for r in self.results])

    def absolute_poses(self) -> np.ndarray:
        return np.stack([np.asarray(r.pose) for r in self.results])

    # --- deterministic state snapshots (SURVEY §5 checkpoint/resume: the
    # reference only persists poses incrementally; here the full on-device
    # SLAM state round-trips, so a crashed/preempted run resumes bit-exact).

    def snapshot(self, path: str) -> None:
        """Write the device state + accumulated results to one ``.npz``."""
        assert self.state is not None, "init() first"
        leaves = jax.tree.flatten(self.state)[0]
        payload = {f"state_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        if self.results:
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *self.results)
            for field, value in zip(FrameResult._fields, stacked):
                payload[f"result_{field}"] = np.asarray(value)
        np.savez_compressed(path, **payload)

    def restore(self, path: str) -> None:
        """Load a snapshot written by :meth:`snapshot`."""
        data = np.load(path)
        template = init_state(self.config)
        treedef = jax.tree.structure(template)
        n = len(jax.tree.flatten(template)[0])
        leaves = [jnp.asarray(data[f"state_{i}"]) for i in range(n)]
        self.state = jax.tree.unflatten(treedef, leaves)
        self.results = []
        if "result_pose" in data:
            t = data["result_pose"].shape[0]
            for i in range(t):
                self.results.append(
                    FrameResult(
                        **{f: jnp.asarray(data[f"result_{f}"][i]) for f in FrameResult._fields}
                    )
                )


def fix_scan_size(points: np.ndarray, n: int, seed: int = 0) -> np.ndarray:
    """Random-sample or zero-pad a scan ``(M, 3)`` to exactly ``n`` rows.

    Deterministic in ``(M, seed)``; pass the frame index as ``seed`` so
    equal-sized scans do not all pick the SAME row subset (a fixed subset is
    systematically correlated across frames — VERDICT round-1 weak item 8)."""
    if points.shape[0] == n:
        return points.astype(np.float32)
    if points.shape[0] > n:
        idx = np.random.default_rng((points.shape[0], seed)).choice(
            points.shape[0], n, replace=False
        )
        return points[idx].astype(np.float32)
    pad = np.zeros((n - points.shape[0], 3), np.float32)
    return np.concatenate([points.astype(np.float32), pad])


def quantize_scans(config: ICPConfig, pts: np.ndarray) -> np.ndarray:
    """Host-side scan quantization for transfer (int16 @ transfer_scale).

    Out-of-range returns become padding (zeros), NOT clamped — clamping
    would teleport far points onto the range boundary."""
    if config.transfer_dtype == "int16":
        s = config.transfer_scale
        q = np.round(pts / s)
        in_range = np.all(np.abs(q) <= 32767, axis=-1, keepdims=True)
        return np.where(in_range, q, 0.0).astype(np.int16)
    return pts.astype(np.float32)


def dequantize_scans(config: ICPConfig, pts: jax.Array) -> jax.Array:
    """In-graph dequantization of int16-transferred scans."""
    if config.transfer_dtype == "int16":
        return pts.astype(jnp.float32) * config.transfer_scale
    return pts


class BatchedICPOdometry:
    """S independent sequences advance in ONE device dispatch.

    ``vmap`` over :func:`process_sequence` — a TPU-native throughput mode
    with no reference equivalent (the reference runs sequences serially,
    ``odometry_runner.py:138-221``): the whole KITTI 00-10 set progresses per
    dispatch on one chip, and with ``mesh`` given, the sequence axis shards
    over the mesh's ``data`` axis so a pod slice processes S sequences with
    S/n_devices resident per device (GSPMD inserts no collectives — the
    sequences are independent).

    Usage::

        odo = BatchedICPOdometry(ICPConfig(), mesh=None)
        odo.init(n_sequences=11)
        poses = odo.process_chunk(scans)   # (S, T, N, 3) -> (S, T, 4, 4)
    """

    def __init__(self, config: Optional[ICPConfig] = None, mesh=None):
        import dataclasses

        config = config or ICPConfig()
        if config.association == "voxel" and config.voxel_candidate_cache:
            # under vmap the movement-gated refresh lax.cond lowers to a
            # select that executes BOTH branches — the gather the cache
            # exists to avoid would run every iteration anyway, plus the
            # cache would be carried through the loop. Exact re-gathering is
            # strictly cheaper here.
            config = dataclasses.replace(config, voxel_candidate_cache=False)
        self.config = config
        self.mesh = mesh
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P("data"))

        def run(states, scans):
            with jax.default_matmul_precision("highest"):  # see ICPOdometry
                scans = dequantize_scans(self.config, scans)
                return jax.vmap(
                    lambda st, sc: process_sequence(self.config, st, sc)
                )(states, scans)

        self._run = jax.jit(run, donate_argnums=0)
        self.states = None
        self._pose_chunks: list = []

    def _place(self, tree):
        if self._sharding is None:
            return tree
        return jax.tree.map(
            lambda a: jax.device_put(a, self._sharding), tree
        )

    def init(self, n_sequences: int):
        if self.mesh is not None:
            n_dev = self.mesh.shape["data"]
            if n_sequences % n_dev != 0:
                raise ValueError(
                    f"n_sequences {n_sequences} not divisible by mesh data axis {n_dev}"
                )
        st = init_state(self.config)
        self.states = self._place(
            jax.tree.map(
                lambda a: jnp.broadcast_to(a, (n_sequences,) + a.shape), st
            )
        )
        self._pose_chunks = []

    def process_chunk(self, scans: np.ndarray) -> np.ndarray:
        """``scans (S, T, N, 3)`` → absolute poses ``(S, T, 4, 4)`` (numpy)."""
        q = self._place(jnp.asarray(quantize_scans(self.config, scans)))
        self.states, results = self._run(self.states, q)
        poses = np.asarray(jax.device_get(results.pose))
        self._pose_chunks.append(poses)
        return poses

    def absolute_poses(self) -> np.ndarray:
        """All processed frames so far: ``(S, T_total, 4, 4)``."""
        return np.concatenate(self._pose_chunks, axis=1)
