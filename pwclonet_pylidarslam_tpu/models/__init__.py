"""Model zoo (Flax): PWCLO-Net deep LiDAR odometry, PoseResNet."""

from pwclonet_pylidarslam_tpu.models.pwclonet import PWCLONet, PWCLONetConfig  # noqa: F401
