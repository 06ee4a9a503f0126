"""Gauss-Newton round-trip tests — the keystone correctness tests.

Mirrors the reference's most valuable test (``tests/test_optimization.py:10-33``):
a random small SE(3) perturbation applied to a random cloud must be recovered
by GN + point-to-plane / point-to-point cost to high precision.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import optimization as opt, se3


def _make_problem(rng, b=3, n=400, twist_scale=0.1):
    points = rng.normal(size=(b, n, 3)).astype(np.float64) * 10.0
    normals = rng.normal(size=(b, n, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    gt_twist = rng.normal(size=(b, 6)) * twist_scale
    gt_pose = se3.exp(jnp.asarray(gt_twist))
    target = np.asarray(se3.transform(gt_pose, jnp.asarray(points)))
    return jnp.asarray(points), jnp.asarray(target), jnp.asarray(normals), np.asarray(gt_pose)


def test_point_to_plane_recovers_perturbation(rng):
    src, tgt, normals, gt_pose = _make_problem(rng)
    result = opt.solve_point_to_plane(src, tgt, normals, max_iters=15,
                                      norm_stop_criterion=1e-10)
    np.testing.assert_allclose(np.asarray(result.pose), gt_pose, atol=1e-7)
    assert np.all(np.asarray(result.cost) < 1e-12)


def test_point_to_point_recovers_perturbation(rng):
    src, tgt, _, gt_pose = _make_problem(rng)
    result = opt.solve_point_to_point(src, tgt, max_iters=15,
                                      norm_stop_criterion=1e-10)
    np.testing.assert_allclose(np.asarray(result.pose), gt_pose, atol=1e-7)


@pytest.mark.slow
def test_analytic_jacobian_matches_autodiff(rng):
    src, tgt, normals, _ = _make_problem(rng, b=2, n=50)
    pose = se3.exp(jnp.asarray(rng.normal(size=(2, 6)) * 0.05))
    _, jac = opt.point_to_plane_residual_jac(pose, src, tgt, normals)
    # autodiff w.r.t. a left perturbation exp(delta) @ pose at delta = 0
    def res_of_delta(delta):
        return opt.point_to_plane_residual_jac(
            se3.exp(delta[None]) @ pose, src, tgt, normals
        )[0]
    auto = jax.jacfwd(res_of_delta)(jnp.zeros(6, src.dtype))  # (B, N, 6)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(auto), atol=1e-7)


def test_generic_gauss_newton_additive(rng):
    # the generic additive GN solves a nonlinear curve fit: y = a*exp(b*t)
    t = jnp.linspace(0.0, 1.0, 50)
    true = jnp.asarray([2.0, -1.3])
    y = true[0] * jnp.exp(true[1] * t)

    def residual(x):  # x (B, 2)
        pred = x[:, 0:1] * jnp.exp(x[:, 1:2] * t[None])
        return pred - y[None]

    result = opt.gauss_newton(residual, jnp.asarray([[1.0, 0.0]]), max_iters=30,
                              norm_stop_criterion=1e-12)
    np.testing.assert_allclose(np.asarray(result.x[0]), np.asarray(true), atol=1e-6)


def test_robust_schemes_reject_outliers(rng):
    src, tgt, normals, gt_pose = _make_problem(rng, b=1, n=500, twist_scale=0.05)
    # corrupt 10% of the targets with large outliers
    tgt_np = np.array(tgt)
    idx = rng.choice(500, size=50, replace=False)
    tgt_np[0, idx] += rng.normal(size=(50, 3)) * 20.0
    tgt_bad = jnp.asarray(tgt_np)

    plain = opt.solve_point_to_plane(src, tgt_bad, normals, max_iters=20)
    robust = opt.solve_point_to_plane(
        src, tgt_bad, normals, max_iters=40, scheme="geman_mcclure", sigma=0.2,
        norm_stop_criterion=1e-9,
    )
    err_plain = np.abs(np.asarray(plain.pose) - gt_pose).max()
    err_robust = np.abs(np.asarray(robust.pose) - gt_pose).max()
    assert err_robust < err_plain * 0.1
    assert err_robust < 1e-3


def test_robust_weights_match_reference_semantics(rng):
    # w(r) = sqrt(C(r)) / clamp(|r|, eps)  (reference optimization.py:53-60)
    r = jnp.asarray(rng.normal(size=(100,)))
    for scheme in ("huber", "exp", "geman_mcclure", "square_geman_mcclure", "cauchy"):
        w = np.asarray(opt.robust_weights(r, scheme=scheme, sigma=0.5))
        c = np.asarray(opt.robust_cost(r, scheme=scheme, sigma=0.5))
        expected = np.sqrt(c) / np.maximum(np.abs(np.asarray(r)), 1e-4)
        np.testing.assert_allclose(w, expected, atol=1e-10)
    # least square weights are exactly 1
    np.testing.assert_array_equal(np.asarray(opt.robust_weights(r)), 1.0)


def test_mask_excludes_points(rng):
    src, tgt, normals, gt_pose = _make_problem(rng, b=1, n=200, twist_scale=0.05)
    # poison the masked-out half; solution must be unaffected
    tgt_np = np.array(tgt)
    tgt_np[0, 100:] = 1e6
    mask = jnp.asarray(np.concatenate([np.ones(100), np.zeros(100)])[None])
    result = opt.solve_point_to_plane(
        src, jnp.asarray(tgt_np), normals, mask=mask, max_iters=15,
        norm_stop_criterion=1e-10,
    )
    np.testing.assert_allclose(np.asarray(result.pose), gt_pose, atol=1e-6)


@pytest.mark.slow
def test_warm_start_from_init_pose(rng):
    src, tgt, normals, gt_pose = _make_problem(rng, b=2, n=300, twist_scale=0.4)
    # a large perturbation converges when warm-started near the answer
    init = se3.exp(se3.log(jnp.asarray(gt_pose)) * 0.9)
    result = opt.solve_point_to_plane(
        src, tgt, normals, init_pose=init, max_iters=15, norm_stop_criterion=1e-12
    )
    np.testing.assert_allclose(np.asarray(result.pose), gt_pose, atol=1e-6)


def test_gauss_newton_jits(rng):
    src, tgt, normals, _ = _make_problem(rng, b=2, n=64)
    fn = jax.jit(
        lambda s, t, n: opt.solve_point_to_plane(s, t, n, max_iters=8).pose
    )
    out = fn(src, tgt, normals)
    assert out.shape == (2, 4, 4)
    assert np.all(np.isfinite(np.asarray(out)))
