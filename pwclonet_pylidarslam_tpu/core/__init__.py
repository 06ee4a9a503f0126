"""Core geometry & math: rotations, SE(3), projection, voxels, Gauss-Newton."""

from pwclonet_pylidarslam_tpu.core import rotation, se3  # noqa: F401
