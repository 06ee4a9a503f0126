"""Loop closure tests: spectral BEV registration + submap loop detection."""

import jax.numpy as jnp
import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.core import registration as reg, se3
from pwclonet_pylidarslam_tpu.slam.loop_closure import (
    ElevationImageLoopClosure,
    LoopClosureConfig,
)
from pwclonet_pylidarslam_tpu.core.registration import BEVConfig


def structured_cloud(rng, n=6000):
    """Urban-ish local cloud: ground + a few walls (distinct yaw signature)."""
    ground = np.stack(
        [rng.uniform(-40, 40, n // 2), rng.uniform(-40, 40, n // 2),
         rng.normal(scale=0.05, size=n // 2) - 1.7], -1
    )
    walls = []
    for (x0, y0, x1, y1) in [(-30, -10, 20, -10), (-30, 12, 10, 12), (15, -10, 15, 25), (-30, -10, -30, 8)]:
        m = n // 8
        t = rng.uniform(0, 1, m)
        walls.append(
            np.stack(
                [x0 + t * (x1 - x0), y0 + t * (y1 - y0), rng.uniform(-1.5, 3.0, m)], -1
            )
        )
    return np.concatenate([ground] + walls).astype(np.float32)


class TestProcrustes:
    def test_recovers_rigid_transform(self, rng):
        src = jnp.asarray(rng.normal(size=(1, 100, 3)))
        gt = se3.exp(jnp.asarray(rng.normal(size=(1, 6)) * 0.4))
        tgt = se3.transform(gt, src)
        est = reg.weighted_procrustes(src, tgt)
        np.testing.assert_allclose(np.asarray(est), np.asarray(gt), atol=1e-8)

    def test_weights_ignore_outliers(self, rng):
        src = jnp.asarray(rng.normal(size=(1, 100, 3)))
        gt = se3.exp(jnp.asarray(rng.normal(size=(1, 6)) * 0.3))
        tgt = np.array(se3.transform(gt, src))
        tgt[0, :10] += 100.0
        w = np.ones((1, 100)); w[0, :10] = 0
        est = reg.weighted_procrustes(src, jnp.asarray(tgt), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(est), np.asarray(gt), atol=1e-8)


class TestSpectralRegistration:
    @pytest.mark.parametrize("yaw_deg,txy", [(0.0, (3.0, -2.0)), (25.0, (5.0, 4.0)), (-40.0, (0.0, 0.0))])
    def test_recovers_planar_motion(self, rng, yaw_deg, txy):
        cloud_a = structured_cloud(rng)
        yaw = np.deg2rad(yaw_deg)
        # cloud_b = the same scene observed from a shifted/rotated frame:
        # p_b = Rz(-yaw) (p_a - t)
        c, s = np.cos(yaw), np.sin(yaw)
        rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        t = np.array([txy[0], txy[1], 0.0])
        cloud_b = ((cloud_a - t) @ rz).astype(np.float32)  # (p-t) @ Rz = Rz^T... rows
        mask = np.ones(len(cloud_a), np.float32)
        result = reg.register_bev(
            jnp.asarray(cloud_a), jnp.asarray(mask),
            jnp.asarray(cloud_b), jnp.asarray(mask),
        )
        est_pose = np.asarray(reg.planar_to_pose(result))
        # contract: p_a ≈ T p_b; apply and check alignment error
        warped = (est_pose[:3, :3] @ cloud_b.T).T + est_pose[:3, 3]
        err = np.linalg.norm(warped - cloud_a, axis=1)
        assert np.median(err) < 1.5  # within pixel_size resolution

    def test_unrelated_scenes_low_confidence(self, rng):
        a = structured_cloud(rng)
        b = np.roll(structured_cloud(np.random.default_rng(99)), 1)
        b = (b + np.array([200.0, 0, 0])).astype(np.float32)  # far away content
        mask_a = np.ones(len(a), np.float32)
        mask_b = np.ones(len(b), np.float32)
        result = reg.register_bev(jnp.asarray(a), jnp.asarray(mask_a), jnp.asarray(b), jnp.asarray(mask_b))
        # mostly empty image b -> weak correlation
        assert float(result.confidence) < 10.0


class TestLoopClosure:
    @pytest.mark.slow
    def test_detects_revisit(self, rng):
        # trajectory visits the same place twice, far apart in time
        cfg = LoopClosureConfig(
            submap_size=5, overlap=2, min_id_distance=8,
            points_per_frame=1024, submap_points=4096,
            bev=BEVConfig(pixel_size=0.5, image_size=192),
            min_confidence=1.2, max_icp_rmse=1.0,
        )
        lc = ElevationImageLoopClosure(cfg)
        world = structured_cloud(rng, 8000)

        def observe(pose):
            inv = np.linalg.inv(pose)
            pts = (inv[:3, :3] @ world.T).T + inv[:3, 3]
            keep = np.linalg.norm(pts[:, :2], axis=1) < 45
            out = np.zeros((6000, 3), np.float32)
            sel = pts[keep][:6000]
            out[: len(sel)] = sel
            return out

        constraints = []
        n_frames = 16
        for t in range(n_frames):
            pose = np.eye(4)
            if t < 8:
                pose[:3, 3] = [t * 2.0, 0, 0]  # drive away
            else:
                pose[:3, 3] = [(15 - t) * 2.0, 0.5, 0]  # drive back
            constraints += lc.process_next_frame(observe(pose), pose)
        assert len(lc.submaps) >= 2
        assert len(constraints) >= 1
        c = constraints[0]
        assert c.frame_j - c.frame_i >= cfg.min_id_distance
        # verify the constraint against ground truth relative pose
        gt_i = lc.frame_poses[c.frame_i]
        gt_j = lc.frame_poses[c.frame_j]
        gt_rel = np.linalg.inv(gt_i) @ gt_j
        err_t = np.linalg.norm(c.relative_pose[:3, 3] - gt_rel[:3, 3])
        assert err_t < 1.0

    def test_no_false_positive_on_straight_line(self, rng):
        cfg = LoopClosureConfig(
            submap_size=4, overlap=1, min_id_distance=6, max_distance=20.0,
            points_per_frame=512, submap_points=2048,
            bev=BEVConfig(pixel_size=0.5, image_size=128),
        )
        lc = ElevationImageLoopClosure(cfg)
        world = structured_cloud(rng, 4000)
        for t in range(12):
            pose = np.eye(4)
            pose[:3, 3] = [t * 30.0, 0, 0]  # always far from previous submaps
            inv = np.linalg.inv(pose)
            pts = ((inv[:3, :3] @ world.T).T + inv[:3, 3]).astype(np.float32)
            lc.process_next_frame(pts[:2000], pose)
        assert lc.constraints == []
