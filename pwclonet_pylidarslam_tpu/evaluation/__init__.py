"""Evaluation: KITTI odometry metrics, results aggregation, benchmark tables."""

from pwclonet_pylidarslam_tpu.evaluation.metrics import (  # noqa: F401
    compute_absolute_poses,
    compute_are,
    compute_ate,
    compute_kitti_metrics,
    compute_relative_poses,
)
