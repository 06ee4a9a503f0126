"""PoseResNet trainer (ref ``PoseNetTrainer``, ``train.py:77-143``).

Rides the shared ``BaseTrainer`` epoch/checkpoint plumbing with the
PoseResNet train state (`train/posenet_state.py`): supervised or
unsupervised (point-to-plane) loss, MultiStepLR, orbax checkpoints, and the
same in-training KITTI segment metrics as the PWCLO-Net trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.train.posenet_state import (
    PoseNetTrainConfig,
    create_posenet_train_state,
    posenet_eval_step,
    posenet_train_step,
    posenet_train_steps,
)
from pwclonet_pylidarslam_tpu.train.trainer import BaseTrainer


@dataclasses.dataclass
class PoseNetTrainerConfig:
    train: PoseNetTrainConfig = dataclasses.field(default_factory=PoseNetTrainConfig)
    vm_shape: Tuple[int, int] = (64, 720)  # KITTI HDL-64 default projector grid
    num_epochs: int = 100
    steps_per_dispatch: int = 16  # lax.scan train blocks (see TrainerConfig)
    log_dir: str = "./posenet_train_output"
    checkpoint_every_epochs: int = 10
    eval_every_epochs: int = 1
    seed: int = 0
    tensorboard: bool = False
    wandb: bool = False
    wandb_project: str = "pwclonet-pylidarslam-tpu"
    wandb_run_name: str = ""


class PoseNetTrainer(BaseTrainer):
    def __init__(self, config: Optional[PoseNetTrainerConfig] = None):
        super().__init__(config or PoseNetTrainerConfig())
        self.model, self.state = create_posenet_train_state(
            self.config.train, jax.random.key(self.config.seed), self.config.vm_shape
        )
        self._train_step = jax.jit(
            lambda s, b, r: posenet_train_step(self.model, self.config.train, s, b, r)
        )
        self._train_steps = jax.jit(
            lambda s, b, r: posenet_train_steps(self.model, self.config.train, s, b, r),
            donate_argnums=0,
        )
        self._eval_step = jax.jit(
            lambda s, b: posenet_eval_step(self.model, self.config.train, s, b)
        )

    def _relative_poses(self, pred, batch):
        if "gt_pose" not in batch and "gt_poses" not in batch:
            return None  # unsupervised eval has no GT
        # pred (B, P, 6): one relative pose per consecutive window pair
        b, p = pred.shape[:2]
        gt = batch["gt_poses"] if "gt_poses" in batch else batch["gt_pose"][:, None]
        return (
            np.asarray(se3.params_to_pose_euler(pred.reshape(b * p, 6))),
            np.asarray(gt).reshape(b * p, 4, 4),
        )

    def odometry_variables(self):
        """Parameter dict consumed by ``slam.deep_odometry.PoseNetOdometry``."""
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}
