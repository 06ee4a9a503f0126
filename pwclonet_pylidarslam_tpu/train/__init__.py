"""Training stack: losses, train state, optimizers/schedules, trainer."""

from pwclonet_pylidarslam_tpu.train.losses import (  # noqa: F401
    PWCLONetLossConfig,
    pwclonet_loss,
)
