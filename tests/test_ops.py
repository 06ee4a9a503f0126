"""Golden-value tests for point-cloud ops against brute-force numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwclonet_pylidarslam_tpu import ops


def brute_knn(query, ref, k, ref_mask=None):
    d = ((query[:, :, None, :] - ref[:, None, :, :]) ** 2).sum(-1)
    if ref_mask is not None:
        d = np.where(ref_mask[:, None, :] > 0, d, 1e10)
    idx = np.argsort(d, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(d, idx, axis=-1), idx


class TestKnn:
    def test_matches_bruteforce(self, rng):
        q = rng.normal(size=(2, 37, 3)).astype(np.float32)
        r = rng.normal(size=(2, 101, 3)).astype(np.float32)
        d, i = ops.knn(jnp.asarray(q), jnp.asarray(r), 5)
        bd, bi = brute_knn(q, r, 5)
        np.testing.assert_allclose(np.asarray(d), bd, atol=1e-4)
        # indices can tie; verify via distances of chosen indices
        chosen = np.take_along_axis(
            ((q[:, :, None, :] - r[:, None, :, :]) ** 2).sum(-1), np.asarray(i), axis=-1
        )
        np.testing.assert_allclose(chosen, bd, atol=1e-4)

    def test_tiled_path_matches_dense(self, rng):
        q = rng.normal(size=(2, 64, 3)).astype(np.float32)
        r = rng.normal(size=(2, 5000, 3)).astype(np.float32)
        d1, i1 = ops.knn(jnp.asarray(q), jnp.asarray(r), 8, tile_n=512)
        d2, i2 = ops.knn(jnp.asarray(q), jnp.asarray(r), 8, tile_n=8192)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_tiled_path_nondivisible(self, rng):
        q = rng.normal(size=(1, 16, 3)).astype(np.float32)
        r = rng.normal(size=(1, 1000, 3)).astype(np.float32)
        d, i = ops.knn(jnp.asarray(q), jnp.asarray(r), 4, tile_n=256)
        bd, _ = brute_knn(q, r, 4)
        np.testing.assert_allclose(np.asarray(d), bd, atol=1e-4)

    def test_ref_mask_excludes(self, rng):
        q = rng.normal(size=(1, 10, 3)).astype(np.float32)
        r = rng.normal(size=(1, 50, 3)).astype(np.float32)
        mask = np.ones((1, 50), np.float32)
        mask[0, ::2] = 0  # exclude even indices
        _, i = ops.knn(jnp.asarray(q), jnp.asarray(r), 3, ref_mask=jnp.asarray(mask))
        assert np.all(np.asarray(i) % 2 == 1)

    def test_fewer_valid_than_k_repeats_best(self, rng):
        q = rng.normal(size=(1, 4, 3)).astype(np.float32)
        r = rng.normal(size=(1, 20, 3)).astype(np.float32)
        mask = np.zeros((1, 20), np.float32)
        mask[0, 7] = 1  # single valid ref
        d, i = ops.knn(jnp.asarray(q), jnp.asarray(r), 3, ref_mask=jnp.asarray(mask))
        assert np.all(np.asarray(i) == 7)
        assert np.all(np.asarray(d) < 1e9)

    def test_grad_flows_through_distances(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))

        def loss(q):
            d, _ = ops.knn(q, r, 4)
            return jnp.sum(d)

        g = jax.grad(loss)(q)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0


class TestFps:
    def test_covers_cloud_better_than_random(self, rng):
        pts = rng.normal(size=(2, 1024, 3)).astype(np.float32)
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 64))
        assert idx.shape == (2, 64)
        for b in range(2):
            sel = pts[b, idx[b]]
            # coverage radius of FPS must beat uniform-random selection
            d_fps = ((pts[b][:, None] - sel[None]) ** 2).sum(-1).min(-1).max()
            rand_sel = pts[b, rng.choice(1024, 64, replace=False)]
            d_rand = ((pts[b][:, None] - rand_sel[None]) ** 2).sum(-1).min(-1).max()
            assert d_fps <= d_rand

    def test_matches_sequential_oracle(self, rng):
        pts = rng.normal(size=(1, 128, 3)).astype(np.float32) + 5.0  # all valid
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 16))[0]
        # numpy sequential FPS oracle (same start rule)
        p = pts[0]
        sel = [0]
        dist = np.full(128, np.inf)
        for _ in range(15):
            dist = np.minimum(dist, ((p - p[sel[-1]]) ** 2).sum(-1))
            sel.append(int(np.argmax(dist)))
        np.testing.assert_array_equal(idx, np.array(sel))

    def test_no_duplicates_when_enough_points(self, rng):
        pts = rng.normal(size=(3, 500, 3)).astype(np.float32) + 3.0
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 100))
        for b in range(3):
            assert len(np.unique(idx[b])) == 100

    def test_padding_guard_skips_origin_points(self, rng):
        pts = rng.normal(size=(1, 64, 3)).astype(np.float32) + 2.0
        pts[0, 10:30] = 0.0  # padding at origin
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 32))[0]
        assert not np.any((idx >= 10) & (idx < 30))

    def test_explicit_mask(self, rng):
        pts = rng.normal(size=(1, 64, 3)).astype(np.float32)
        mask = np.zeros((1, 64), np.float32)
        mask[0, 32:] = 1
        idx = np.asarray(
            ops.furthest_point_sample(jnp.asarray(pts), 16, mask=jnp.asarray(mask))
        )[0]
        assert np.all(idx >= 32)


class TestGatherGroup:
    def test_gather(self, rng):
        pts = rng.normal(size=(2, 50, 7)).astype(np.float32)
        idx = rng.integers(0, 50, size=(2, 13))
        out = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        expected = np.stack([pts[b, idx[b]] for b in range(2)])
        np.testing.assert_array_equal(out, expected)

    def test_group(self, rng):
        pts = rng.normal(size=(2, 50, 4)).astype(np.float32)
        idx = rng.integers(0, 50, size=(2, 10, 6))
        out = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(idx)))
        expected = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(out, expected)

    def test_group_grad_is_scatter_add(self, rng):
        # duplicate indices must accumulate gradient (CUDA backward uses atomicAdd)
        pts = jnp.asarray(rng.normal(size=(1, 5, 2)).astype(np.float32))
        idx = jnp.asarray(np.array([[[1, 1, 1]]]))  # index 1 gathered 3 times

        g = jax.grad(lambda p: jnp.sum(ops.group_points(p, idx)))(pts)
        np.testing.assert_allclose(np.asarray(g[0, 1]), [3.0, 3.0])
        np.testing.assert_allclose(np.asarray(g[0, 0]), [0.0, 0.0])


class TestThreeNN:
    def test_interpolation_recovers_linear_field(self, rng):
        # features = linear function of xyz → 3-NN IDW interpolation approximates it
        known = rng.uniform(-1, 1, size=(1, 200, 3)).astype(np.float32)
        unknown = rng.uniform(-0.9, 0.9, size=(1, 50, 3)).astype(np.float32)
        w = rng.normal(size=(3, 4)).astype(np.float32)
        feats = known @ w
        d, i = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        out = np.asarray(ops.three_interpolate(jnp.asarray(feats), i, d))
        expected = unknown @ w
        err = np.abs(out - expected).mean()
        scale = np.abs(expected).mean()
        assert err < 0.35 * scale  # IDW of 3-NN in a dense cloud tracks the field

    def test_exact_on_known_points(self, rng):
        known = rng.normal(size=(1, 64, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 64, 5)).astype(np.float32)
        d, i = ops.three_nn(jnp.asarray(known), jnp.asarray(known))
        out = np.asarray(ops.three_interpolate(jnp.asarray(feats), i, d))
        np.testing.assert_allclose(out, feats, atol=1e-5)

    def test_weights_match_cuda_formula(self, rng):
        d = jnp.asarray(np.array([[[0.1, 0.2, 0.7]]], np.float32))
        i = jnp.asarray(np.array([[[0, 1, 2]]]))
        feats = jnp.asarray(np.eye(3, dtype=np.float32)[None])
        out = np.asarray(ops.three_interpolate(feats, i, d))[0, 0]
        recip = 1.0 / (np.array([0.1, 0.2, 0.7]) + 1e-8)
        np.testing.assert_allclose(out, recip / recip.sum(), atol=1e-6)


class TestBallQuery:
    def test_matches_reference_semantics(self, rng):
        centers = rng.normal(size=(1, 20, 3)).astype(np.float32)
        pts = rng.normal(size=(1, 200, 3)).astype(np.float32)
        radius, nsample = 0.8, 8
        idx = np.asarray(
            ops.ball_query(jnp.asarray(centers), jnp.asarray(pts), radius, nsample)
        )
        d = ((centers[:, :, None] - pts[:, None]) ** 2).sum(-1)[0]
        for m in range(20):
            hits = np.nonzero(d[m] < radius**2)[0]
            if len(hits) == 0:
                np.testing.assert_array_equal(idx[0, m], 0)
            elif len(hits) >= nsample:
                np.testing.assert_array_equal(np.sort(idx[0, m]), hits[:nsample])
            else:
                np.testing.assert_array_equal(
                    np.sort(np.unique(idx[0, m])), np.sort(hits)
                )
                # padding repeats the first hit
                counts = np.bincount(idx[0, m], minlength=200)
                assert counts[hits[0]] == nsample - len(hits) + 1

    def test_all_within_radius(self, rng):
        centers = rng.normal(size=(2, 30, 3)).astype(np.float32)
        pts = rng.normal(size=(2, 300, 3)).astype(np.float32)
        idx = np.asarray(
            ops.ball_query(jnp.asarray(centers), jnp.asarray(pts), 1.0, 16)
        )
        d = ((centers[:, :, None] - pts[:, None]) ** 2).sum(-1)
        picked = np.take_along_axis(d, idx, axis=-1)
        has_hit = (d < 1.0).any(-1)
        assert np.all(picked[has_hit] < 1.0 + 1e-5)
