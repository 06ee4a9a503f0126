"""Fixed-shape point-cloud primitives (XLA + Pallas).

TPU-native replacements for the reference's CUDA PointNet++ extension
(``pointnet2_ops/_ext-src``): furthest point sampling, kNN, ball query,
gather/group, three-NN interpolation. All ops take **static shapes** with
optional validity masks instead of the reference's implicit
"skip ‖p‖²≤1e-3 padding" convention (which is still honored where noted).
"""

from pwclonet_pylidarslam_tpu.ops.knn import knn, pairwise_sqdist  # noqa: F401
from pwclonet_pylidarslam_tpu.ops.fps import furthest_point_sample  # noqa: F401
from pwclonet_pylidarslam_tpu.ops.gather import (  # noqa: F401
    gather_points,
    group_points,
    group_points_multi,
)
from pwclonet_pylidarslam_tpu.ops.interpolate import three_nn, three_interpolate  # noqa: F401
from pwclonet_pylidarslam_tpu.ops.ball_query import ball_query  # noqa: F401
