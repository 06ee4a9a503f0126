"""Distributed pose-graph optimization: edges sharded across the device mesh.

The matrix-free PGO of ``slam/backend.py`` is built from per-edge work
(jacobians, gradient scatter, H·v products) reduced into per-node
accumulators — exactly the shape that scales: **edges are sharded across
devices** (keyframe-block partitioning, BASELINE north star), node state is
replicated (V×6 floats — tiny), and every per-node reduction becomes a
``psum`` over the mesh. Implemented with ``shard_map`` so the collectives are
explicit and ride ICI.

Numerics are identical to the single-device ``backend.optimize`` (same GN/CG
iteration, same damping) — the distributed test asserts pose equality.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.slam.backend import PGOConfig, PoseGraph

# TPU f32 einsums default to bf16 passes; the normal equations need full f32
_HP = jax.lax.Precision.HIGHEST


def _local_edge_jacobians(poses, edge_i, edge_j, edge_meas):
    def one(ei, ej, z):
        def res(d):
            di, dj = d[:6], d[6:]
            xi = poses[ei] @ se3.exp(di)
            xj = poses[ej] @ se3.exp(dj)
            return se3.log(se3.inverse(z) @ se3.inverse(xi) @ xj)

        j = jax.jacfwd(res)(jnp.zeros(12, poses.dtype))
        return j[:, :6], j[:, 6:]

    return jax.vmap(one)(edge_i, edge_j, edge_meas)


def _local_residuals(poses, edge_i, edge_j, edge_meas):
    err = se3.inverse(edge_meas) @ se3.inverse(poses[edge_i]) @ poses[edge_j]
    return se3.log(err)


def _local_prior_jacobians(poses, prior_node, prior_meas):
    def one(pi, z):
        def res(d):
            return se3.log(se3.inverse(z) @ (poses[pi] @ se3.exp(d)))

        return jax.jacfwd(res)(jnp.zeros(6, poses.dtype))

    return jax.vmap(one)(prior_node, prior_meas)


def optimize_sharded(
    graph: PoseGraph,
    mesh: Mesh,
    config: PGOConfig = PGOConfig(),
    axis: str = "data",
) -> PoseGraph:
    """Distributed drop-in for ``backend.optimize``.

    Edge arrays are sharded over ``axis``; poses/nodes are replicated.
    Edge capacity must be divisible by the axis size (pad the builder's
    ``max_edges`` accordingly).
    """
    n_dev = mesh.shape[axis]
    e = graph.edge_i.shape[0]
    pr = graph.prior_node.shape[0]
    if e % n_dev != 0:
        raise ValueError(f"edge capacity {e} not divisible by mesh axis {n_dev}")
    if pr % n_dev != 0:
        raise ValueError(f"prior capacity {pr} not divisible by mesh axis {n_dev}")

    free = graph.node_active.at[0].set(0.0) if config.anchor_first else graph.node_active

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def run(poses, edge_i, edge_j, edge_meas, edge_info, edge_active,
            prior_node, prior_meas, prior_info, prior_active):
        w_e = edge_active * 1.0
        w_p = prior_active * 1.0

        def gn_iter(_, poses):
            res = _local_residuals(poses, edge_i, edge_j, edge_meas)
            ji, jj = _local_edge_jacobians(poses, edge_i, edge_j, edge_meas)
            info = edge_info * w_e[:, None]
            pres = se3.log(se3.inverse(prior_meas) @ poses[prior_node])
            jp = _local_prior_jacobians(poses, prior_node, prior_meas)
            pinfo = prior_info * w_p[:, None]

            def scatter_nodes(vals_i, vals_j, vals_p):
                out = jnp.zeros((poses.shape[0], 6), poses.dtype)
                out = out.at[edge_i].add(vals_i)
                out = out.at[edge_j].add(vals_j)
                out = out.at[prior_node].add(vals_p)
                return jax.lax.psum(out, axis) * free[:, None]

            def h_matvec(v):
                vi = v[edge_i]
                vj = v[edge_j]
                u = jnp.einsum("eab,eb->ea", ji, vi, precision=_HP) + jnp.einsum("eab,eb->ea", jj, vj, precision=_HP)
                u = u * info
                up = jnp.einsum("pab,pb->pa", jp, v[prior_node], precision=_HP) * pinfo
                y = scatter_nodes(
                    jnp.einsum("eba,eb->ea", ji, u, precision=_HP),
                    jnp.einsum("eba,eb->ea", jj, u, precision=_HP),
                    jnp.einsum("pba,pb->pa", jp, up, precision=_HP),
                )
                return y + config.damping * v

            wr = res * info
            g = scatter_nodes(
                jnp.einsum("eba,eb->ea", ji, wr, precision=_HP),
                jnp.einsum("eba,eb->ea", jj, wr, precision=_HP),
                jnp.einsum("pba,pb->pa", jp, pres * pinfo, precision=_HP),
            )

            hii = jnp.einsum("eba,ebc->eac", ji, ji * info[:, :, None], precision=_HP)
            hjj = jnp.einsum("eba,ebc->eac", jj, jj * info[:, :, None], precision=_HP)
            hpp = jnp.einsum("pba,pbc->pac", jp, jp * pinfo[:, :, None], precision=_HP)
            diag = jnp.zeros((poses.shape[0], 6, 6), poses.dtype)
            diag = diag.at[edge_i].add(hii)
            diag = diag.at[edge_j].add(hjj)
            diag = diag.at[prior_node].add(hpp)
            diag = jax.lax.psum(diag, axis)
            diag = diag + jnp.eye(6, dtype=poses.dtype) * (config.damping + 1e-8)
            diag_inv = jnp.linalg.inv(diag)

            def precond(v):
                return jnp.einsum("vab,vb->va", diag_inv, v, precision=_HP) * free[:, None]

            def cg_body(_, state):
                x, r, z, p = state
                hp = h_matvec(p)
                alpha = jnp.sum(r * z) / jnp.maximum(jnp.sum(p * hp), 1e-20)
                x = x + alpha * p
                r_new = r - alpha * hp
                z_new = precond(r_new)
                beta = jnp.sum(r_new * z_new) / jnp.maximum(jnp.sum(r * z), 1e-20)
                return x, r_new, z_new, z_new + beta * p

            x0 = jnp.zeros_like(g)
            r0 = -g
            z0 = precond(r0)
            rz0 = jnp.sum(r0 * z0)

            # CG scalars are replicated across shards (h_matvec psums), so
            # the early-exit predicate agrees on every device
            def cg_cond(state):
                it, x, r, z, p = state
                return jnp.logical_and(
                    it < config.cg_iterations,
                    jnp.sum(r * z) > config.cg_tolerance * rz0,
                )

            def cg_body2(state):
                it, x, r, z, p = state
                x, r, z, p = cg_body(None, (x, r, z, p))
                return it + 1, x, r, z, p

            _, x, _, _, _ = jax.lax.while_loop(
                cg_cond, cg_body2, (jnp.zeros((), jnp.int32), x0, r0, z0, z0)
            )
            dx = x * free[:, None]
            return poses @ se3.exp(dx), jnp.max(jnp.abs(dx))

        # same convergence exit as backend.optimize — dx is replicated across
        # shards (all inputs psum'd), so the predicate agrees on every device
        def cond(state):
            it, _, step = state
            return jnp.logical_and(
                it < config.max_iterations, step > config.step_tolerance
            )

        def body(state):
            it, poses, _ = state
            poses, step = gn_iter(None, poses)
            return it + 1, poses, step

        init = (
            jnp.zeros((), jnp.int32),
            graph.poses,
            jnp.asarray(jnp.inf, graph.poses.dtype),
        )
        _, poses, _ = jax.lax.while_loop(cond, body, init)
        return se3.normalize(poses)

    # place edge shards + replicated nodes
    edge_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    poses = jax.device_put(graph.poses, rep)
    args = [
        jax.device_put(a, edge_sh)
        for a in (graph.edge_i, graph.edge_j, graph.edge_meas, graph.edge_info,
                  graph.edge_active, graph.prior_node, graph.prior_meas,
                  graph.prior_info, graph.prior_active)
    ]
    new_poses = run(poses, *args)
    return graph._replace(poses=new_poses)
