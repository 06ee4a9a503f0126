"""Golden tests: Pallas kernels (interpret mode) vs the lax oracles."""

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
