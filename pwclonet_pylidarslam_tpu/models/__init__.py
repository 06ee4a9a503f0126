"""Model zoo (Flax): PWCLO-Net deep LiDAR odometry, PoseResNet,
PointNet++ classification / segmentation heads."""

from pwclonet_pylidarslam_tpu.models.pwclonet import (  # noqa: F401
    PWCLONet,
    PWCLONetConfig,
    scaled_model_config,
)
from pwclonet_pylidarslam_tpu.models.cls_seg import (  # noqa: F401
    CLS_MSG,
    CLS_SSG,
    SEM_SSG,
    PointNet2Classification,
    PointNet2Segmentation,
    SAStage,
)
