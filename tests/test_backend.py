"""Pose-graph backend tests: the reference's circle scenario with REAL
assertions (its ``tests/test_backend.py`` opens a viz window and asserts
nothing — SURVEY.md §4 flags that)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.slam import backend
from pgo_fixtures import circle_poses, drifted_odometry


@pytest.fixture(scope="module")
def circle_problem():
    rng = np.random.default_rng(0)
    n = 60
    gt = circle_poses(n)
    drifted, rels = drifted_odometry(gt, rng)
    builder = backend.PoseGraphBuilder(max_nodes=64, max_edges=128)
    for p in drifted:
        builder.add_node(p)
    for i, r in enumerate(rels):
        builder.add_odometry_edge(i, r)
    # loop closure: last frame sees the first (true relative pose)
    loop_rel = np.linalg.inv(gt[n - 1]) @ gt[0]
    builder.add_loop_edge(0, n - 1, np.linalg.inv(loop_rel) @ np.eye(4) @ np.eye(4))
    # measurement = pose of j in i's frame: inv(gt[0]) @ gt[n-1]
    builder.edges[-1] = (
        0, n - 1, np.linalg.inv(gt[0]) @ gt[n - 1],
        np.asarray(backend.LOOP_INFO),
    )
    return gt, drifted, builder


@pytest.mark.slow
def test_optimization_reduces_cost_and_closes_loop(circle_problem):
    gt, drifted, builder = circle_problem
    graph = builder.to_device(jnp.float64)
    cost_before = float(backend.graph_cost(graph))
    out = backend.optimize(graph, backend.PGOConfig(max_iterations=15))
    cost_after = float(backend.graph_cost(out))
    assert cost_after < cost_before

    n = len(gt)
    opt = np.asarray(out.poses[:n])
    err_before = np.linalg.norm(drifted[:, :3, 3] - gt[:, :3, 3], axis=1)
    err_after = np.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1)
    # drift at the loop end must collapse; overall drift improves (a single
    # loop edge redistributes but cannot remove mid-chain noise)
    assert err_after[-1] < 0.2
    assert err_after[-1] < err_before[-1] * 0.25
    assert err_after.mean() < err_before.mean() * 0.8
    # rotations remain valid
    from pwclonet_pylidarslam_tpu.core import rotation as rot

    assert np.all(np.asarray(rot.is_rotation_matrix(jnp.asarray(opt[:, :3, :3]))))


def test_anchor_stays_fixed(circle_problem):
    gt, drifted, builder = circle_problem
    graph = builder.to_device(jnp.float64)
    out = backend.optimize(graph, backend.PGOConfig(max_iterations=3, cg_iterations=60))
    np.testing.assert_allclose(np.asarray(out.poses[0]), drifted[0], atol=1e-9)


def test_perfect_graph_is_stationary():
    gt = circle_poses(30)
    builder = backend.PoseGraphBuilder(max_nodes=32, max_edges=64)
    for p in gt:
        builder.add_node(p)
    for i in range(29):
        builder.add_odometry_edge(i, np.linalg.inv(gt[i]) @ gt[i + 1])
    graph = builder.to_device(jnp.float64)
    out = backend.optimize(graph, backend.PGOConfig(max_iterations=5, cg_iterations=60))
    np.testing.assert_allclose(np.asarray(out.poses[:30]), gt, atol=1e-6)


def test_absolute_constraint_pins_node():
    # odometry chain with a wrong scale + GPS-style unary prior on the far end
    gt = circle_poses(20)
    rng = np.random.default_rng(1)
    drifted, rels = drifted_odometry(gt, rng, noise_trans=0.1)
    builder = backend.PoseGraphBuilder(max_nodes=32, max_edges=64)
    for p in drifted:
        builder.add_node(p)
    for i, r in enumerate(rels):
        builder.add_odometry_edge(i, r)
    # unary prior implemented as an edge from the anchor with the GT relative
    builder.add_edge(0, 19, np.linalg.inv(gt[0]) @ gt[19], np.full(6, 100.0))
    graph = builder.to_device(jnp.float64)
    out = backend.optimize(graph, backend.PGOConfig(max_iterations=15))
    np.testing.assert_allclose(
        np.asarray(out.poses[19, :3, 3]), gt[19, :3, 3], atol=0.05
    )


@pytest.mark.slow
def test_gps_priors_pin_drifting_trajectory():
    """Drifting circle pinned by GPS unary priors: ATE must drop sharply
    (VERDICT r1 item 2; ref backend.py:262-330 GPS vertex-pair semantics)."""
    rng = np.random.default_rng(7)
    n = 60
    gt = circle_poses(n)
    drifted, rels = drifted_odometry(gt, rng, noise_trans=0.08)
    builder = backend.PoseGraphBuilder(max_nodes=64, max_edges=128, max_priors=8)
    for p in drifted:
        builder.add_node(p)
    for i, r in enumerate(rels):
        builder.add_odometry_edge(i, r)
    # GPS fixes at 3 spots along the loop (absolute measurements = GT poses);
    # tight translation, loose orientation (ref default 1.0 / 0.001)
    for i in (20, 40, 59):
        builder.add_absolute_edge(i, gt[i])
    graph = builder.to_device(jnp.float64)
    assert int(graph.num_priors) == 3

    cost_before = float(backend.graph_cost(graph))
    out = backend.optimize(graph, backend.PGOConfig(max_iterations=25))
    cost_after = float(backend.graph_cost(out))
    assert cost_after < cost_before

    opt = np.asarray(out.poses[:n])
    ate_before = np.linalg.norm(drifted[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    ate_after = np.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    assert ate_after < ate_before * 0.35
    # pinned nodes land near their GPS fixes
    for i in (20, 40, 59):
        assert np.linalg.norm(opt[i, :3, 3] - gt[i, :3, 3]) < 0.30


def test_gps_prior_default_information_matches_reference():
    # ref backend.py:316-320 — info[:3,:3]=1.0 (1 m GPS), info[3:,3:]=0.001
    builder = backend.PoseGraphBuilder(max_nodes=4, max_edges=4, max_priors=4)
    builder.add_node(np.eye(4))
    builder.add_absolute_edge(0, np.eye(4))
    np.testing.assert_allclose(builder.priors[0][2], backend.ABSOLUTE_INFO)
    graph = builder.to_device(jnp.float64)
    np.testing.assert_allclose(
        np.asarray(graph.prior_info[0]), [1.0, 1.0, 1.0, 0.001, 0.001, 0.001]
    )


def test_prior_residual_definition():
    # prior residual log(Z^-1 Xi): zero iff node matches its GPS fix
    builder = backend.PoseGraphBuilder(max_nodes=4, max_edges=4, max_priors=4)
    x = np.asarray(se3.exp(jnp.asarray([0.3, -0.2, 0.1, 0.05, 0.0, -0.04])))
    builder.add_node(x)
    builder.add_absolute_edge(0, x)
    graph = builder.to_device(jnp.float64)
    res = np.asarray(backend.prior_residuals(graph, graph.poses))[0]
    np.testing.assert_allclose(res, 0.0, atol=1e-10)


def test_prior_capacity_overflow_raises():
    builder = backend.PoseGraphBuilder(max_nodes=8, max_edges=8, max_priors=1)
    builder.add_node(np.eye(4))
    builder.add_absolute_edge(0, np.eye(4))
    builder.add_absolute_edge(0, np.eye(4))
    with pytest.raises(ValueError, match="capacity"):
        builder.to_device()


@pytest.mark.slow
def test_convergence_exit_matches_full_run():
    # GN converges quadratically with adaptive CG (~4 iterations on this
    # problem); the step-tolerance early exit must land on the same poses as
    # a 10× larger iteration budget — i.e. extra iterations are no-ops
    rng = np.random.default_rng(3)
    gt = circle_poses(30)
    drifted, rels = drifted_odometry(gt, rng)
    builder = backend.PoseGraphBuilder(max_nodes=32, max_edges=64)
    for p in drifted:
        builder.add_node(p)
    for i, r in enumerate(rels):
        builder.add_odometry_edge(i, r)
    builder.add_loop_edge(0, 29, np.linalg.inv(gt[0]) @ gt[29])
    graph = builder.to_device(jnp.float64)
    out_a = backend.optimize(graph, backend.PGOConfig(max_iterations=20))
    out_b = backend.optimize(graph, backend.PGOConfig(max_iterations=200))
    np.testing.assert_allclose(
        np.asarray(out_a.poses), np.asarray(out_b.poses), atol=1e-6
    )


def test_edge_residual_definition():
    # residual must be log(Z^-1 Xi^-1 Xj) — zero iff measurement matches
    builder = backend.PoseGraphBuilder(max_nodes=4, max_edges=4)
    a = np.eye(4)
    b = np.asarray(se3.exp(jnp.asarray([1.0, 0.5, 0.0, 0.0, 0.0, 0.3])))
    builder.add_node(a)
    builder.add_node(b)
    builder.add_edge(0, 1, np.linalg.inv(a) @ b)
    graph = builder.to_device(jnp.float64)
    res = np.asarray(backend.edge_residuals(graph, graph.poses))[0]
    np.testing.assert_allclose(res, 0.0, atol=1e-10)


def test_capacity_overflow_raises():
    builder = backend.PoseGraphBuilder(max_nodes=2, max_edges=2)
    for _ in range(3):
        builder.add_node(np.eye(4))
    with pytest.raises(ValueError, match="capacity"):
        builder.to_device()
