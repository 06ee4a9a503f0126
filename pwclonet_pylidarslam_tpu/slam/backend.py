"""Pose-graph backend: SE(3) graph optimization on device (g2o replacement).

The reference wraps native **g2o** (BlockSolverSE3 + Cholmod + Levenberg,
``slam/backend.py:189-423``). TPU has no sparse Cholesky; instead the normal
equations are solved **matrix-free**: per-edge autodiff jacobians, Gauss-
Newton steps via block-Jacobi-preconditioned conjugate gradient, all inside
one jit. This structure is exactly what shards across hosts later (keyframe
blocks + psum reductions — SURVEY §7 / BASELINE north star).

Semantics preserved from the reference:
- edge residual: SE(3) error ``log(Z⁻¹ · Xᵢ⁻¹ · Xⱼ)`` against measurement Z
  ("mat_j_to_i", ref ``:364-370``);
- default information: odometry (|i−j| < 10) trans 2 / rot 5; loop closure
  trans 0.1 / rot 0.5 (ref ``:348-358``);
- absolute (GPS-style) unary constraints supported (ref vertex pairs
  ``2i``/``2i+1``, ``:275-281``) as prior edges to fixed targets;
- gauge fixed by anchoring node 0;
- the runner optimizes only when a loop edge appears (``:376-385``) — that
  policy lives in the pipeline, not here.

Graphs are fixed-capacity pytrees; building happens host-side (cheap,
sequential), optimization on device.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import se3

# TPU f32 einsums default to bf16 passes; the normal equations need full f32
_HP = jax.lax.Precision.HIGHEST

# default information diagonals (trans ×3, rot ×3) — ref backend.py:348-358
ODOMETRY_INFO = (2.0, 2.0, 2.0, 5.0, 5.0, 5.0)
LOOP_INFO = (0.1, 0.1, 0.1, 0.5, 0.5, 0.5)
# GPS/absolute default: 1 m translation confidence, near-zero orientation
# confidence — ref backend.py:316-320 (info[:3,:3]=1.0, info[3:,3:]=0.001)
ABSOLUTE_INFO = (1.0, 1.0, 1.0, 0.001, 0.001, 0.001)


class PoseGraph(NamedTuple):
    poses: jax.Array  # (V, 4, 4)
    node_active: jax.Array  # (V,)
    edge_i: jax.Array  # (E,) int32
    edge_j: jax.Array  # (E,) int32
    edge_meas: jax.Array  # (E, 4, 4)  measurement Z: pose of j in i's frame
    edge_info: jax.Array  # (E, 6) diagonal information
    edge_active: jax.Array  # (E,)
    # absolute (GPS-style) unary priors: the reference models these as a
    # fixed vertex at Z joined to pose i by an identity-measurement EdgeSE3
    # (ref backend.py:275-330) — residual log(Z⁻¹·Xᵢ); here they are native
    # unary edges, no ghost vertices needed.
    prior_node: jax.Array  # (P,) int32
    prior_meas: jax.Array  # (P, 4, 4)  absolute target pose Z
    prior_info: jax.Array  # (P, 6) diagonal information
    prior_active: jax.Array  # (P,)
    num_nodes: jax.Array  # () int32
    num_edges: jax.Array  # () int32
    num_priors: jax.Array  # () int32


def empty_graph(
    max_nodes: int, max_edges: int, max_priors: int = 64, dtype=jnp.float32
) -> PoseGraph:
    return PoseGraph(
        poses=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (max_nodes, 4, 4)),
        node_active=jnp.zeros((max_nodes,), dtype),
        edge_i=jnp.zeros((max_edges,), jnp.int32),
        edge_j=jnp.zeros((max_edges,), jnp.int32),
        edge_meas=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (max_edges, 4, 4)),
        edge_info=jnp.ones((max_edges, 6), dtype),
        edge_active=jnp.zeros((max_edges,), dtype),
        prior_node=jnp.zeros((max_priors,), jnp.int32),
        prior_meas=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (max_priors, 4, 4)),
        prior_info=jnp.ones((max_priors, 6), dtype),
        prior_active=jnp.zeros((max_priors,), dtype),
        num_nodes=jnp.zeros((), jnp.int32),
        num_edges=jnp.zeros((), jnp.int32),
        num_priors=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Host-side graph building (numpy mirrors, convenient for the pipeline)
# ---------------------------------------------------------------------------


class PoseGraphBuilder:
    """Incremental host-side builder (mirrors the g2o add-vertex/add-edge flow)."""

    def __init__(
        self, max_nodes: int = 4096, max_edges: int = 8192, max_priors: int = 64
    ):
        self.max_nodes = max_nodes
        self.max_edges = max_edges
        self.max_priors = max_priors
        self.poses = []
        self.edges = []  # (i, j, meas 4x4, info diag 6)
        self.priors = []  # (i, absolute pose 4x4, info diag 6)

    def add_node(self, pose: np.ndarray) -> int:
        self.poses.append(np.asarray(pose, np.float64))
        return len(self.poses) - 1

    def add_edge(
        self,
        i: int,
        j: int,
        measurement: np.ndarray,
        information: Optional[np.ndarray] = None,
    ):
        """Relative constraint: ``measurement`` = pose of j in i's frame."""
        if information is None:
            diag = ODOMETRY_INFO if abs(i - j) < 10 else LOOP_INFO
            information = np.asarray(diag, np.float64)
        information = np.asarray(information, np.float64)
        if information.ndim == 2:
            information = np.diag(information)
        self.edges.append((i, j, np.asarray(measurement, np.float64), information))

    def add_odometry_edge(self, i: int, relative_pose: np.ndarray, information=None):
        self.add_edge(i, i + 1, relative_pose, information)

    def add_loop_edge(self, i: int, j: int, relative_pose: np.ndarray, information=None):
        self.add_edge(i, j, relative_pose, information)

    def add_absolute_edge(
        self, i: int, absolute_pose: np.ndarray, information: Optional[np.ndarray] = None
    ):
        """GPS-style unary prior pinning node ``i`` to ``absolute_pose``
        (ref ``se3_absolute_constraint_<i>``, backend.py:275-330)."""
        if information is None:
            information = np.asarray(ABSOLUTE_INFO, np.float64)
        information = np.asarray(information, np.float64)
        if information.ndim == 2:
            information = np.diag(information)
        self.priors.append((i, np.asarray(absolute_pose, np.float64), information))

    def to_device(self, dtype=jnp.float32) -> PoseGraph:
        v, e, p = len(self.poses), len(self.edges), len(self.priors)
        if v > self.max_nodes or e > self.max_edges or p > self.max_priors:
            raise ValueError(
                f"graph ({v} nodes, {e} edges, {p} priors) exceeds capacity "
                f"({self.max_nodes}, {self.max_edges}, {self.max_priors})"
            )
        g = empty_graph(self.max_nodes, self.max_edges, self.max_priors, dtype)
        poses = np.stack(self.poses) if v else np.zeros((0, 4, 4))
        g = g._replace(
            poses=g.poses.at[:v].set(jnp.asarray(poses, dtype)),
            node_active=g.node_active.at[:v].set(1.0),
            num_nodes=jnp.asarray(v, jnp.int32),
            num_edges=jnp.asarray(e, jnp.int32),
        )
        if e:
            ei = np.asarray([x[0] for x in self.edges], np.int32)
            ej = np.asarray([x[1] for x in self.edges], np.int32)
            meas = np.stack([x[2] for x in self.edges])
            info = np.stack([x[3] for x in self.edges])
            g = g._replace(
                edge_i=g.edge_i.at[:e].set(jnp.asarray(ei)),
                edge_j=g.edge_j.at[:e].set(jnp.asarray(ej)),
                edge_meas=g.edge_meas.at[:e].set(jnp.asarray(meas, dtype)),
                edge_info=g.edge_info.at[:e].set(jnp.asarray(info, dtype)),
                edge_active=g.edge_active.at[:e].set(1.0),
            )
        if p:
            pn = np.asarray([x[0] for x in self.priors], np.int32)
            pmeas = np.stack([x[1] for x in self.priors])
            pinfo = np.stack([x[2] for x in self.priors])
            g = g._replace(
                prior_node=g.prior_node.at[:p].set(jnp.asarray(pn)),
                prior_meas=g.prior_meas.at[:p].set(jnp.asarray(pmeas, dtype)),
                prior_info=g.prior_info.at[:p].set(jnp.asarray(pinfo, dtype)),
                prior_active=g.prior_active.at[:p].set(1.0),
                num_priors=jnp.asarray(p, jnp.int32),
            )
        return g


# ---------------------------------------------------------------------------
# Device-side optimization
# ---------------------------------------------------------------------------


def edge_residuals(graph: PoseGraph, poses: jax.Array) -> jax.Array:
    """SE(3) residual per edge ``(E, 6)``: ``log(Z⁻¹ Xᵢ⁻¹ Xⱼ)``."""
    xi = poses[graph.edge_i]
    xj = poses[graph.edge_j]
    err = se3.inverse(graph.edge_meas) @ se3.inverse(xi) @ xj
    return se3.log(err)


def _edge_res_of_twists(graph, poses, di, dj):
    """Residual with right-perturbed endpoint poses (for autodiff jacobians)."""
    xi = poses[graph.edge_i] @ se3.exp(di)
    xj = poses[graph.edge_j] @ se3.exp(dj)
    err = se3.inverse(graph.edge_meas) @ se3.inverse(xi) @ xj
    return se3.log(err)


def prior_residuals(graph: PoseGraph, poses: jax.Array) -> jax.Array:
    """Unary prior residual per prior ``(P, 6)``: ``log(Z⁻¹ Xᵢ)`` — the
    reference's fixed-GPS-vertex + identity-measurement edge collapses to
    exactly this (ref backend.py:316-330)."""
    xi = poses[graph.prior_node]
    return se3.log(se3.inverse(graph.prior_meas) @ xi)


def _edge_jacobians_dense(graph: PoseGraph, poses: jax.Array):
    """Exact per-edge jacobians ``(E, 6, 6)`` w.r.t. right perturbations of
    the two endpoints — forward-mode autodiff vmapped per edge (replaces
    g2o's hand-coded EdgeSE3 jacobians)."""

    def one(ei, ej, z):
        def res(d):
            di, dj = d[:6], d[6:]
            xi = poses[ei] @ se3.exp(di)
            xj = poses[ej] @ se3.exp(dj)
            return se3.log(se3.inverse(z) @ se3.inverse(xi) @ xj)

        j = jax.jacfwd(res)(jnp.zeros(12, poses.dtype))
        return j[:, :6], j[:, 6:]

    return jax.vmap(one)(graph.edge_i, graph.edge_j, graph.edge_meas)


def _prior_jacobians_dense(graph: PoseGraph, poses: jax.Array):
    """Per-prior jacobian ``(P, 6, 6)`` w.r.t. right perturbation of the
    pinned node."""

    def one(pi, z):
        def res(d):
            return se3.log(se3.inverse(z) @ (poses[pi] @ se3.exp(d)))

        return jax.jacfwd(res)(jnp.zeros(6, poses.dtype))

    return jax.vmap(one)(graph.prior_node, graph.prior_meas)


@dataclasses.dataclass(frozen=True)
class PGOConfig:
    max_iterations: int = 20  # GN outer iterations (ref max_optim_iterations)
    # CG must run ~O(graph diameter) iterations to propagate a loop-closure
    # correction along the odometry chain; it exits early on cg_tolerance, so
    # the cap is sized for the worst case rather than the average one.
    cg_iterations: int = 500
    cg_tolerance: float = 1e-10  # relative preconditioned-residual exit
    damping: float = 1e-6
    step_tolerance: float = 1e-8  # early GN exit when max |dx| drops below
    anchor_first: bool = True  # gauge-fix node 0 (ref fix_first_frame)


def optimize(graph: PoseGraph, config: PGOConfig = PGOConfig()) -> PoseGraph:
    """Gauss-Newton pose-graph optimization; returns the graph with updated
    poses. Node 0 is the gauge anchor (held fixed) unless
    ``config.anchor_first`` is False (useful when absolute priors fix the
    gauge instead). Fully jittable; exits early once the GN step norm drops
    below ``step_tolerance``."""
    w_e = graph.edge_active * 1.0
    w_p = graph.prior_active * 1.0

    # free-node mask: active nodes except the anchor
    free = graph.node_active.at[0].set(0.0) if config.anchor_first else graph.node_active

    def gn_iter(poses):
        res = edge_residuals(graph, poses)  # (E, 6)
        ji, jj = _edge_jacobians_dense(graph, poses)  # (E, 6, 6) each
        info = graph.edge_info * w_e[:, None]  # (E, 6)
        pres = prior_residuals(graph, poses)  # (P, 6)
        jp = _prior_jacobians_dense(graph, poses)  # (P, 6, 6)
        pinfo = graph.prior_info * w_p[:, None]  # (P, 6)

        def h_matvec(v):  # v: (V, 6)
            vi = v[graph.edge_i]
            vj = v[graph.edge_j]
            u = jnp.einsum("eab,eb->ea", ji, vi, precision=_HP) + jnp.einsum("eab,eb->ea", jj, vj, precision=_HP)
            u = u * info
            yi = jnp.einsum("eba,eb->ea", ji, u, precision=_HP)
            yj = jnp.einsum("eba,eb->ea", jj, u, precision=_HP)
            up = jnp.einsum("pab,pb->pa", jp, v[graph.prior_node], precision=_HP) * pinfo
            yp = jnp.einsum("pba,pb->pa", jp, up, precision=_HP)
            y = jnp.zeros_like(v)
            y = y.at[graph.edge_i].add(yi)
            y = y.at[graph.edge_j].add(yj)
            y = y.at[graph.prior_node].add(yp)
            y = y * free[:, None]
            return y + config.damping * v

        # gradient g = Jᵀ W r (binary edges + unary priors)
        wr = res * info
        gi = jnp.einsum("eba,eb->ea", ji, wr, precision=_HP)
        gj = jnp.einsum("eba,eb->ea", jj, wr, precision=_HP)
        gp = jnp.einsum("pba,pb->pa", jp, pres * pinfo, precision=_HP)
        g = jnp.zeros_like(poses[:, :3, 0], shape=(poses.shape[0], 6))
        g = g.at[graph.edge_i].add(gi)
        g = g.at[graph.edge_j].add(gj)
        g = g.at[graph.prior_node].add(gp)
        g = g * free[:, None]

        # block-Jacobi preconditioner: per-node 6x6 diagonal blocks
        hii = jnp.einsum("eba,ebc->eac", ji, ji * info[:, :, None], precision=_HP)
        hjj = jnp.einsum("eba,ebc->eac", jj, jj * info[:, :, None], precision=_HP)
        hpp = jnp.einsum("pba,pbc->pac", jp, jp * pinfo[:, :, None], precision=_HP)
        diag = jnp.zeros((poses.shape[0], 6, 6), poses.dtype)
        diag = diag.at[graph.edge_i].add(hii)
        diag = diag.at[graph.edge_j].add(hjj)
        diag = diag.at[graph.prior_node].add(hpp)
        diag = diag + jnp.eye(6, dtype=poses.dtype) * (config.damping + 1e-8)
        diag_inv = jnp.linalg.inv(diag)

        def precond(v):
            return jnp.einsum("vab,vb->va", diag_inv, v, precision=_HP) * free[:, None]

        # preconditioned CG for H dx = -g, with relative-residual early exit
        x0 = jnp.zeros_like(g)
        r0 = -g
        z0 = precond(r0)
        rz0 = jnp.sum(r0 * z0)

        def cg_cond(state):
            it, x, r, z, p = state
            return jnp.logical_and(
                it < config.cg_iterations,
                jnp.sum(r * z) > config.cg_tolerance * rz0,
            )

        def cg_body(state):
            it, x, r, z, p = state
            hp = h_matvec(p)
            alpha = jnp.sum(r * z) / jnp.maximum(jnp.sum(p * hp), 1e-20)
            x = x + alpha * p
            r_new = r - alpha * hp
            z_new = precond(r_new)
            beta = jnp.sum(r_new * z_new) / jnp.maximum(jnp.sum(r * z), 1e-20)
            p = z_new + beta * p
            return it + 1, x, r_new, z_new, p

        _, x, _, _, _ = jax.lax.while_loop(
            cg_cond, cg_body, (jnp.zeros((), jnp.int32), x0, r0, z0, z0)
        )

        # apply right-perturbation update to free nodes
        dx = x * free[:, None]
        return poses @ se3.exp(dx), jnp.max(jnp.abs(dx))

    # GN with convergence exit: stop when the step norm drops below tolerance
    # (the reference's g2o terminates on its own chi² criterion; host-side a
    # fixed 20×50 iteration product wastes 10×+ once converged)
    def cond(state):
        it, _, step = state
        return jnp.logical_and(it < config.max_iterations, step > config.step_tolerance)

    def body(state):
        it, poses, _ = state
        poses, step = gn_iter(poses)
        return it + 1, poses, step

    init = (jnp.zeros((), jnp.int32), graph.poses, jnp.asarray(jnp.inf, graph.poses.dtype))
    _, poses, _ = jax.lax.while_loop(cond, body, init)
    return graph._replace(poses=se3.normalize(poses))


def graph_cost(graph: PoseGraph, poses: Optional[jax.Array] = None) -> jax.Array:
    """Total weighted squared residual (for tests / monitoring)."""
    p = graph.poses if poses is None else poses
    res = edge_residuals(graph, p)
    cost = jnp.sum(res * res * graph.edge_info * graph.edge_active[:, None])
    pres = prior_residuals(graph, p)
    cost = cost + jnp.sum(pres * pres * graph.prior_info * graph.prior_active[:, None])
    return cost
