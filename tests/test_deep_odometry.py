"""Deep odometry front-ends: batched sequence API matches per-frame."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.models import PWCLONetConfig
from pwclonet_pylidarslam_tpu.models.posenet import PoseResNet, PoseResNetConfig
from pwclonet_pylidarslam_tpu.slam.deep_odometry import (
    DeepOdometryConfig,
    PoseNetOdometry,
    PoseNetOdometryConfig,
    PWCLONetOdometry,
)


def _scans(t=5, n=256, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(t, n, 3)) * 8.0).astype(np.float32)


@pytest.mark.slow
def test_pwclonet_odometry_sequence_matches_per_frame():
    from pwclonet_pylidarslam_tpu.models import PWCLONet

    cfg = DeepOdometryConfig(
        model=PWCLONetConfig(
            num_points=256, sa_npoints=(64, 32, 16, 8), sa_nsamples=(8, 8, 8, 4)
        ),
        num_points=256,
    )
    model = PWCLONet(cfg.model)
    rng = jax.random.key(0)
    x = jnp.zeros((1, 256, 3))
    variables = model.init({"params": rng, "dropout": rng}, x, x, train=False)

    scans = _scans()
    a = PWCLONetOdometry(variables, cfg)
    a.init()
    for t in range(scans.shape[0]):
        a.process_next_frame(scans[t])

    b = PWCLONetOdometry(variables, cfg)
    b.init()
    out = b.process_sequence(scans)
    assert out.shape == (scans.shape[0], 4, 4)
    # batched (vmapped pairs) and per-frame dispatches reduce in different
    # orders; float32 accumulation leaves ~1e-5 wiggle on the composed chain
    np.testing.assert_allclose(b.absolute_poses(), a.absolute_poses(), atol=5e-5)

    # chunked streaming also matches
    c = PWCLONetOdometry(variables, cfg)
    c.init()
    c.process_sequence(scans[:2])
    c.process_sequence(scans[2:])
    np.testing.assert_allclose(c.absolute_poses(), a.absolute_poses(), atol=5e-5)


@pytest.mark.slow
def test_posenet_odometry_sequence_matches_per_frame():
    from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector

    cfg = PoseNetOdometryConfig(
        model=PoseResNetConfig(), projector=SphericalProjector(height=16, width=64)
    )
    model = PoseResNet(cfg.model)
    frames = jnp.zeros((1, 2, 16, 64, 3))
    variables = model.init(jax.random.key(0), frames, train=False)

    scans = _scans(t=4)
    a = PoseNetOdometry(variables, cfg)
    a.init()
    for t in range(scans.shape[0]):
        a.process_next_frame(scans[t])

    b = PoseNetOdometry(variables, cfg)
    b.init()
    out = b.process_sequence(scans)
    assert out.shape == (scans.shape[0], 4, 4)
    np.testing.assert_allclose(b.absolute_poses(), a.absolute_poses(), atol=1e-5)
