"""Golden tests: Pallas kernels (interpret mode) vs the lax oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.ops.fps import _furthest_point_sample_lax
from pwclonet_pylidarslam_tpu.ops.pallas.fps_kernel import furthest_point_sample_pallas


class TestPallasFPS:
    @pytest.mark.parametrize("n,npoint", [(128, 16), (500, 64), (2048, 256)])
    def test_matches_oracle_exactly(self, rng, n, npoint):
        pts = rng.normal(size=(2, n, 3)).astype(np.float32) + 3.0
        a = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(pts), npoint, interpret=True)
        )
        b = np.asarray(_furthest_point_sample_lax(jnp.asarray(pts), npoint))
        np.testing.assert_array_equal(a, b)

    def test_padding_guard(self, rng):
        pts = rng.normal(size=(1, 256, 3)).astype(np.float32) + 2.0
        pts[0, 50:90] = 0.0
        a = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(pts), 64, interpret=True)
        )[0]
        assert not np.any((a >= 50) & (a < 90))

    def test_explicit_mask(self, rng):
        pts = rng.normal(size=(1, 256, 3)).astype(np.float32)
        mask = np.zeros((1, 256), np.float32)
        mask[0, 128:] = 1
        a = np.asarray(
            furthest_point_sample_pallas(
                jnp.asarray(pts), 32, mask=jnp.asarray(mask), interpret=True
            )
        )[0]
        assert np.all(a >= 128)

    def test_non_multiple_of_128(self, rng):
        # lane padding path: N = 300 pads to 384
        pts = rng.normal(size=(1, 300, 3)).astype(np.float32) + 5.0
        a = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(pts), 50, interpret=True)
        )
        b = np.asarray(_furthest_point_sample_lax(jnp.asarray(pts), 50))
        np.testing.assert_array_equal(a, b)


class TestPallasFusedMLPMaxpool:
    """Golden tests for the fused eval-mode set-conv block
    (``ops/pallas/mlp_kernel.py``) against the unfused flax path."""

    def _build(self, rng, shape=(2, 40, 8, 11), feats=(16, 8, 32)):
        import jax
        from pwclonet_pylidarslam_tpu.models.layers import PointMLP

        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        m = PointMLP(feats)
        vs = m.init({"params": jax.random.key(0)}, x, train=False)
        # perturb running stats so the BN fold is non-trivial
        bs = jax.tree.map(lambda a: a + 0.3, vs["batch_stats"])
        return m, {"params": vs["params"], "batch_stats": bs}, x

    @pytest.mark.slow
    def test_matches_unfused(self, rng):
        import jax

        m, vs, x = self._build(rng)
        with jax.default_matmul_precision("highest"):
            ref = m.apply(vs, x, train=False, maxpool=True)
            fused = m.apply(vs, x, train=False, maxpool=True, fused=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-5, rtol=1e-4)

    def test_center_tiling(self, rng):
        # s not a multiple of the tile, large k: exercises the pad/slice path
        import jax

        m, vs, x = self._build(rng, shape=(1, 333, 32, 7), feats=(8, 16))
        with jax.default_matmul_precision("highest"):
            ref = m.apply(vs, x, train=False, maxpool=True)
            fused = m.apply(vs, x, train=False, maxpool=True, fused=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_train_path_unchanged_by_flag(self, rng):
        # fused=True must be a no-op in train mode (stats need the full tensor)
        m, vs, x = self._build(rng)
        out_a, mut = m.apply(vs, x, train=True, maxpool=True, fused=True,
                             mutable=["batch_stats"])
        out_b, _ = m.apply(vs, x, train=True, maxpool=True, fused=False,
                           mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
        assert "batch_stats" in mut

    @pytest.mark.slow
    def test_pwclonet_fused_eval_close(self, rng):
        # whole-model check: fused_eval config reproduces the eval forward
        import jax
        from pwclonet_pylidarslam_tpu.models import PWCLONet, PWCLONetConfig

        kw = dict(num_points=256, sa_npoints=(64, 32, 16, 8), sa_nsamples=(8, 8, 8, 4))
        x1 = jnp.asarray(rng.standard_normal((1, 256, 3)) * 8.0, jnp.float32)
        x2 = x1 + 0.05
        base = PWCLONet(PWCLONetConfig(**kw))
        vs = base.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                       x1, x2, train=False)
        fused_model = PWCLONet(PWCLONetConfig(**kw, fused_eval=True))
        with jax.default_matmul_precision("highest"):
            ref = base.apply(vs, x1, x2, train=False)[0]
            out = fused_model.apply(vs, x1, x2, train=False)[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-3)


class TestPallasCostVolume:
    """Fused attentive cost volume (``ops/pallas/costvolume_kernel.py``) vs
    the unfused flax graph."""

    def _build(self, rng, s=64, n=80, k=8, fused=False):
        import jax
        from pwclonet_pylidarslam_tpu.models.costvolume import CostVolume

        xyz1 = jnp.asarray(rng.standard_normal((2, s, 3)) * 5, jnp.float32)
        xyz2 = jnp.asarray(rng.standard_normal((2, n, 3)) * 5, jnp.float32)
        f1 = jnp.asarray(rng.standard_normal((2, s, 16)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((2, n, 16)), jnp.float32)
        m = CostVolume(nsample=4, nsample_q=k, fused_eval=fused)
        return m, (xyz1, f1, xyz2, f2)

    @pytest.mark.slow
    def test_matches_unfused(self, rng):
        import jax
        from pwclonet_pylidarslam_tpu.models.costvolume import CostVolume

        base, args = self._build(rng)
        vs = base.init({"params": jax.random.key(0)}, *args, train=False)
        bs = jax.tree.map(lambda a: a + 0.25, vs["batch_stats"])
        vs = {"params": vs["params"], "batch_stats": bs}
        fused = CostVolume(nsample=4, nsample_q=8, fused_eval=True)
        with jax.default_matmul_precision("highest"):
            ref = base.apply(vs, *args, train=False)
            out = fused.apply(vs, *args, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_variable_tree_identical(self, rng):
        # the fused branch must create exactly the same params/batch_stats
        import jax
        from pwclonet_pylidarslam_tpu.models.costvolume import CostVolume

        base, args = self._build(rng)
        fused = CostVolume(nsample=4, nsample_q=8, fused_eval=True)
        v0 = base.init({"params": jax.random.key(0)}, *args, train=False)
        v1 = fused.init({"params": jax.random.key(0)}, *args, train=False)
        assert jax.tree.map(lambda a: a.shape, v0) == jax.tree.map(lambda a: a.shape, v1)
        chex = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), v0, v1)
        assert max(jax.tree.leaves(chex)) == 0.0

    @pytest.mark.slow
    def test_unaligned_center_tiling(self, rng):
        # K=6 with many centers: forces the sublane-aligned partial tile path
        import jax
        from pwclonet_pylidarslam_tpu.models.costvolume import CostVolume

        base, args = self._build(rng, s=340, n=120, k=6)
        vs = base.init({"params": jax.random.key(0)}, *args, train=False)
        fused = CostVolume(nsample=4, nsample_q=6, fused_eval=True)
        with jax.default_matmul_precision("highest"):
            ref = base.apply(vs, *args, train=False)
            out = fused.apply(vs, *args, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


class TestGatherKernel:
    """Golden tests: Pallas row gather / scatter-add vs jnp oracles
    (interpret mode; on TPU the same kernels were verified bit-exact
    on-chip, tools/bench_gather.py)."""

    def test_gather_rows_matches_take_along_axis(self):
        from pwclonet_pylidarslam_tpu.ops.pallas.gather_kernel import (
            _gather_fwd_impl,
        )

        rng = np.random.default_rng(0)
        for b, n, m, c in [(2, 256, 512, 3), (1, 128, 256, 16)]:
            src = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, n, size=(b, m)), jnp.int32)
            got = np.asarray(_gather_fwd_impl(src, idx, interpret=True))
            want = np.asarray(jnp.take_along_axis(src, idx[..., None], axis=1))
            np.testing.assert_array_equal(got, want)

    def test_scatter_add_matches_at_add(self):
        from pwclonet_pylidarslam_tpu.ops.pallas.gather_kernel import (
            scatter_add_rows,
        )

        rng = np.random.default_rng(1)
        b, n, m, c = 2, 128, 256, 5
        upd = jnp.asarray(rng.normal(size=(b, m, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, size=(b, m)), jnp.int32)
        got = np.asarray(scatter_add_rows(upd, idx, n, interpret=True))
        want = np.asarray(
            jnp.zeros((b, n, c)).at[jnp.arange(b)[:, None], idx].add(upd)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_gather_custom_vjp_grad_is_scatter(self):
        """d/dsrc sum(gather(src, idx)**2) == scatter_add(2*gathered)."""
        from pwclonet_pylidarslam_tpu.ops.gather import gather_points

        rng = np.random.default_rng(2)
        b, n, m, c = 2, 64, 128, 4
        src = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, size=(b, m)), jnp.int32)
        g = jax.grad(lambda p: jnp.sum(gather_points(p, idx) ** 2))(src)
        want = np.asarray(
            jnp.zeros((b, n, c)).at[jnp.arange(b)[:, None], idx].add(
                2.0 * jnp.take_along_axis(src, idx[..., None], axis=1)
            )
        )
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)


class TestKnnKernel:
    """Golden tests: fused kNN kernel vs the exact oracle."""

    def test_exact_when_refs_fit_one_bucket_block(self):
        # N <= 512 -> bucket size 1 -> exact result, ascending, unique
        from pwclonet_pylidarslam_tpu.ops.pallas.knn_kernel import (
            knn_approx_pallas,
            knn_supported,
        )
        from pwclonet_pylidarslam_tpu.ops.knn import pairwise_sqdist

        rng = np.random.default_rng(3)
        b, s, n, k = 1, 64, 256, 8
        assert knn_supported(s, n, k, 3)
        q = jnp.asarray(rng.normal(size=(b, s, 3)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        d, i = knn_approx_pallas(q, r, k, interpret=True)
        dist = np.asarray(pairwise_sqdist(q, r))
        i_true = np.sort(np.argsort(dist, axis=-1)[..., :k], axis=-1)
        np.testing.assert_array_equal(np.sort(np.asarray(i), axis=-1), i_true)
        np.testing.assert_allclose(
            np.asarray(d), np.sort(np.take_along_axis(dist, i_true, -1), -1),
            atol=1e-4,
        )

    def test_recall_on_bucketed_path(self):
        from pwclonet_pylidarslam_tpu.ops.pallas.knn_kernel import (
            knn_approx_pallas,
        )
        from pwclonet_pylidarslam_tpu.ops.knn import pairwise_sqdist

        rng = np.random.default_rng(4)
        b, s, n, k = 1, 64, 1024, 16
        q = jnp.asarray(rng.normal(size=(b, s, 3)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        d, i = knn_approx_pallas(q, r, k, interpret=True)
        i = np.asarray(i)
        dist = np.asarray(pairwise_sqdist(q, r))
        i_true = np.argsort(dist, axis=-1)[..., :k]
        recall = np.mean(
            [len(set(i[0, ss]) & set(i_true[0, ss])) / k for ss in range(s)]
        )
        assert recall > 0.9, recall
        # reported distances must be the true distances of the indices
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(dist, i, -1), atol=1e-4
        )
