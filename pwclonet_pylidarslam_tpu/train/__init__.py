"""Training stack: losses, train state, optimizers/schedules, trainer."""

from pwclonet_pylidarslam_tpu.train.losses import (  # noqa: F401
    PWCLONetLossConfig,
    pwclonet_loss,
)
from pwclonet_pylidarslam_tpu.train.cls_seg import (  # noqa: F401
    ClsSegTrainConfig,
    ClsSegTrainState,
    cls_seg_eval_step,
    cls_seg_train_step,
    create_cls_seg_state,
)
from pwclonet_pylidarslam_tpu.train.posenet_state import (  # noqa: F401
    PoseNetTrainConfig,
    PoseNetTrainState,
    create_posenet_train_state,
    posenet_eval_step,
    posenet_train_step,
)
