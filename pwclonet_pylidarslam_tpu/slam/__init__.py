"""SLAM pipeline: initialization, preprocessing, odometry, loop closure, backend.

The reference threads a mutable string-keyed ``data_dict`` through five
pluggable components (``slam/slam.py:118-170``). Here the per-frame state is
an explicit **pytree** (NamedTuples) and the hot path — projective
frame-to-model ICP — is a single jitted ``process_frame`` step with fixed
shapes, so the whole SLAM inner loop lives on device; the host only reads
back poses.
"""

from pwclonet_pylidarslam_tpu.slam.ct_icp_odometry import (  # noqa: F401
    CTICPConfig,
    CTICPOdometry,
)
from pwclonet_pylidarslam_tpu.slam.icp_odometry import (  # noqa: F401
    BatchedICPOdometry,
    ICPConfig,
    ICPOdometry,
)
