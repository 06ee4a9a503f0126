#!/usr/bin/env python
"""Train/test the deep odometry networks (replacement for the reference's
``train.py``).

Usage::

    # train PWCLO-Net on KITTI 00-06, eval 07-10 (the reference recipe)
    python train_net.py do_train=true dataset=kitti root_dir=/data/kitti \
        train_sequences=0,1,2,3,4,5,6 eval_sequences=7,8,9,10 \
        num_epochs=120 batch_size=8 log_dir=./train_out

    # smoke-train on synthetic pairs (no dataset needed)
    python train_net.py do_train=true dataset=synthetic num_epochs=2 \
        batch_size=2 num_points=256 log_dir=./train_out

    # test: run odometry over sequences with a trained checkpoint
    python train_net.py do_test=true dataset=kitti root_dir=/data/kitti \
        test_sequences=9,10 log_dir=./train_out
"""

from __future__ import annotations

import dataclasses
import sys
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Config:
    do_train: bool = False
    do_test: bool = False
    # pwclonet | posenet (ref train.py:77-143 vs :223-…) | cls | semseg
    # (the upstream Pointnet2 demo tasks)
    model: str = "pwclonet"
    dataset: str = "synthetic"  # synthetic | kitti | kitti360 | modelnet40 | indoor3d
    root_dir: str = ""
    train_sequences: str = "0,1,2,3,4,5,6"
    eval_sequences: str = "7,8,9,10"
    test_sequences: str = "9,10"
    num_epochs: int = 120
    batch_size: int = 8
    num_points: int = 8192
    learning_rate: float = 1e-3
    log_dir: str = "./train_output"
    augment: bool = True
    seed: int = 0
    # synthetic smoke-training shape knobs
    synthetic_batches: int = 8
    # dataset=synthetic_world: frames per generated world sequence (sequence
    # ids act as world seeds; train/eval splits use disjoint seed ranges)
    synthetic_frames: int = 240
    profile_dir: str = ""  # capture a jax.profiler trace (XProf)
    fused_eval: bool = False  # test mode: fused Pallas eval kernels (TPU)
    # PoseNet-specific knobs (ref PoseNetTrainer, train.py:77-143)
    posenet_loss: str = "supervised"  # supervised | unsupervised
    # PoseNet window length (ref DatasetOfSequences sequence_len,
    # sequence_dataset.py:9-169): 2 = frame pairs; >2 = sliding windows with
    # one regressed pose per consecutive pair
    sequence_len: int = 2
    vm_height: int = 64
    vm_width: int = 720


def _seqs(s: str) -> List[int]:
    return [int(x) for x in str(s).strip("[]").split(",") if x != ""]


def make_batch_fns(config: Config, model_cfg):
    if config.dataset == "synthetic":
        from pwclonet_pylidarslam_tpu.core import se3
        import jax.numpy as jnp

        def gen(seed):
            r = np.random.default_rng(seed)
            out = []
            for _ in range(config.synthetic_batches):
                pts1 = r.normal(size=(config.batch_size, config.num_points, 3)).astype(np.float32) * 8
                tw = (r.normal(size=(config.batch_size, 6)) * 0.05).astype(np.float32)
                T = se3.exp(jnp.asarray(tw))
                pts2 = np.asarray(se3.transform(T, jnp.asarray(pts1)))
                gt = np.asarray(se3.pose_to_params_quat(T)).astype(np.float32)
                out.append({"xyz1": pts1, "xyz2": pts2, "gt_params": gt})
            return out

        train_data = gen(config.seed)
        eval_data = gen(config.seed + 1)
        return (lambda: iter(train_data)), (lambda: iter(eval_data))

    if config.dataset == "synthetic_world":
        # raycast-world frame pairs (the trained-deep-odometry evidence
        # path): sequence ids are world seeds; eval worlds use seed+1000
        from pwclonet_pylidarslam_tpu.data.synthetic import (
            SyntheticPairDataset,
            generate_sequence,
            kitti_preset,
        )

        def make_ds(seed_ids, offset, augment, seed):
            seqs = [
                generate_sequence(
                    kitti_preset(n_frames=config.synthetic_frames, seed=offset + s)
                )
                for s in seed_ids
            ]
            return SyntheticPairDataset(
                seqs, num_points=config.num_points, augment=augment, seed=seed
            )

        train_ds = make_ds(_seqs(config.train_sequences), 100, config.augment,
                           config.seed)
        eval_ds = make_ds(_seqs(config.eval_sequences), 1100, False,
                          config.seed + 1)
        epoch = [0]

        def train_fn():
            epoch[0] += 1
            return train_ds.batches(config.batch_size, shuffle=True, seed=epoch[0])

        return train_fn, (lambda: eval_ds.batches(config.batch_size, shuffle=False))

    if config.dataset == "kitti360":
        # ref train.py:337-345 constructs Kitti360Dataset directly for the
        # PWCLO-Net recipe; same contract as the KITTI pair dataset.
        from pwclonet_pylidarslam_tpu.data.other_datasets import Kitti360PairDataset

        train_ds = Kitti360PairDataset(
            config.root_dir, tuple(_seqs(config.train_sequences)),
            num_points=config.num_points, augment=config.augment, seed=config.seed,
        )
        eval_ds = Kitti360PairDataset(
            config.root_dir, tuple(_seqs(config.eval_sequences)),
            num_points=config.num_points, augment=False, seed=config.seed + 1,
        )
        return (
            lambda: train_ds.batches(config.batch_size, shuffle=True),
            lambda: eval_ds.batches(config.batch_size, shuffle=False),
        )

    from pwclonet_pylidarslam_tpu.data.kitti import KittiPairDataset

    train_ds = KittiPairDataset(
        config.root_dir, _seqs(config.train_sequences),
        num_points=config.num_points, augment=config.augment, seed=config.seed,
    )
    eval_ds = KittiPairDataset(
        config.root_dir, _seqs(config.eval_sequences),
        num_points=config.num_points, augment=False, seed=config.seed + 1,
    )
    return (
        lambda: train_ds.batches(config.batch_size, shuffle=True),
        lambda: eval_ds.batches(config.batch_size, shuffle=False),
    )


def make_posenet_batch_fns(config: Config, projector):
    """Vertex-map pair batches (sequence_len=2) or sliding-window batches
    (sequence_len>2, ref DatasetOfSequences sequence_dataset.py:9-169)."""
    from pwclonet_pylidarslam_tpu.data.vm_pairs import (
        MultiSequenceWindowDataset,
        VertexMapPairDataset,
        VertexMapWindowDataset,
        concat_pair_datasets,
    )

    windowed = config.sequence_len > 2

    def make_ds(scans, gt, num_points=65536):
        if windowed:
            return VertexMapWindowDataset.from_scans(
                scans, gt, projector, num_points=num_points,
                sequence_len=config.sequence_len,
            )
        return VertexMapPairDataset.from_scans(scans, gt, projector,
                                               num_points=num_points)

    def from_sequences(seq_ids, seed):
        datasets = []
        if config.dataset == "synthetic":
            from pwclonet_pylidarslam_tpu.data.synthetic import (
                SyntheticSequenceConfig,
                generate_sequence,
            )

            scans, gt = generate_sequence(
                SyntheticSequenceConfig(n_frames=16 + 2 * config.synthetic_batches,
                                        seed=seed)
            )
            datasets.append(make_ds(scans, gt, num_points=scans.shape[1]))
        else:
            from pwclonet_pylidarslam_tpu.data.kitti import KittiSequence

            for s in seq_ids:
                seq = KittiSequence(config.root_dir, s)
                scans = [seq.scan(i) for i in range(len(seq))]
                datasets.append(make_ds(scans, seq.ground_truth()))
        if windowed:
            return MultiSequenceWindowDataset(datasets)
        return concat_pair_datasets(datasets)

    train_ds = from_sequences(_seqs(config.train_sequences), config.seed)
    eval_ds = from_sequences(_seqs(config.eval_sequences), config.seed + 1)
    epoch = [0]

    def train_fn():
        epoch[0] += 1
        return train_ds.batches(config.batch_size, shuffle=True, seed=epoch[0])

    return train_fn, (lambda: eval_ds.batches(config.batch_size, shuffle=False))


def run_train_posenet(config: Config) -> int:
    from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector
    from pwclonet_pylidarslam_tpu.train.posenet_state import PoseNetTrainConfig
    from pwclonet_pylidarslam_tpu.train.posenet_trainer import (
        PoseNetTrainer,
        PoseNetTrainerConfig,
    )
    from pwclonet_pylidarslam_tpu.utils.config import dump_config

    from pwclonet_pylidarslam_tpu.models.posenet import PoseResNetConfig

    projector = SphericalProjector(height=config.vm_height, width=config.vm_width)
    trainer = PoseNetTrainer(
        PoseNetTrainerConfig(
            train=PoseNetTrainConfig(
                model=PoseResNetConfig(
                    sequence_len=config.sequence_len,
                    num_out_poses=config.sequence_len - 1,
                ),
                loss=config.posenet_loss,
                projector=projector,
                learning_rate=config.learning_rate,
            ),
            vm_shape=(config.vm_height, config.vm_width),
            num_epochs=config.num_epochs,
            log_dir=config.log_dir,
            seed=config.seed,
        )
    )
    dump_config(config, f"{config.log_dir}/config.yaml")
    train_fn, eval_fn = make_posenet_batch_fns(config, projector)
    history = trainer.fit(train_fn, eval_fn)
    last = history[-1]
    print(
        f"done: epoch {last['epoch']} train_loss={last['train_loss']:.4f} "
        f"eval_loss={last.get('eval_loss', float('nan')):.4f}"
    )
    return 0


def make_test_sequence(config: Config, s: int):
    """Test-mode sequence source for BOTH deep odometry test CLIs
    (pwclonet and posenet share the dataset selection)."""
    if config.dataset in ("synthetic", "synthetic_world"):
        from pwclonet_pylidarslam_tpu.data.synthetic import (
            SyntheticSequenceConfig,
            generate_sequence,
            kitti_preset,
        )

        if config.dataset == "synthetic_world":
            # held-out world: test sequence ids are world seeds (offset away
            # from the train/eval seed ranges)
            scans, gt = generate_sequence(
                kitti_preset(n_frames=config.synthetic_frames, seed=2100 + s)
            )
        else:
            scans, gt = generate_sequence(
                SyntheticSequenceConfig(n_frames=16, seed=s, num_points=config.num_points)
            )

        class _Synth:
            def __len__(self):
                return len(scans)

            def scan(self, i):
                return scans[i]

            def ground_truth(self):
                return gt

        return _Synth()
    if config.dataset == "kitti360":
        from pwclonet_pylidarslam_tpu.data.other_datasets import Kitti360Sequence

        return Kitti360Sequence(config.root_dir, s)
    from pwclonet_pylidarslam_tpu.data.kitti import KittiSequence

    return KittiSequence(config.root_dir, s)


def run_test_posenet(config: Config) -> int:
    """PoseResNet odometry over sequences with a trained checkpoint
    (ref ``posenet_odometry.py:46-122`` + eval)."""
    from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector
    from pwclonet_pylidarslam_tpu.evaluation.results import OdometryResults
    from pwclonet_pylidarslam_tpu.slam.deep_odometry import (
        PoseNetOdometry,
        PoseNetOdometryConfig,
    )
    from pwclonet_pylidarslam_tpu.train.posenet_state import PoseNetTrainConfig
    from pwclonet_pylidarslam_tpu.train.posenet_trainer import (
        PoseNetTrainer,
        PoseNetTrainerConfig,
    )

    projector = SphericalProjector(height=config.vm_height, width=config.vm_width)
    trainer = PoseNetTrainer(
        PoseNetTrainerConfig(
            train=PoseNetTrainConfig(projector=projector),
            vm_shape=(config.vm_height, config.vm_width),
            log_dir=config.log_dir,
        )
    )
    trainer.load_checkpoint()
    odo = PoseNetOdometry(
        trainer.odometry_variables(), PoseNetOdometryConfig(projector=projector)
    )
    results = OdometryResults(f"{config.log_dir}/test")

    for s in _seqs(config.test_sequences):
        seq = make_test_sequence(config, s)
        odo.init()
        for i in range(len(seq)):
            odo.process_next_frame(seq.scan(i))
        md = results.add_sequence(f"{s:02d}", odo.absolute_poses(), seq.ground_truth())
        from pwclonet_pylidarslam_tpu.evaluation.results import write_devkit_report

        write_devkit_report(
            f"{config.log_dir}/test/{s:02d}_eval", f"{s:02d}",
            odo.absolute_poses(), seq.ground_truth(),
        )  # the reference's kittiOdomEval per-sequence artifact set (train.py:973-981)
        if md:
            print(f"seq {s:02d}: t_rel={md['tr_err']:.4f}% ATE={md['ATE']:.4f}")
    return 0


def _cls_seg_setup(config: Config, train: bool):
    """Model + dataset pair for the cls/semseg tasks (upstream
    ``pointnet2/train.py`` with ``task_model=cls-ssg``/``semseg-ssg``)."""
    from pwclonet_pylidarslam_tpu.data import shapes
    from pwclonet_pylidarslam_tpu.models import (
        PointNet2Classification,
        PointNet2Segmentation,
    )

    if config.model == "cls":
        if config.dataset == "modelnet40":
            ds = shapes.ModelNet40Dataset(
                config.root_dir, num_points=config.num_points, train=train
            )
            n_classes = len(ds.classes)
        else:
            ds = shapes.SyntheticShapes(
                num_items=config.synthetic_batches * config.batch_size,
                num_points=config.num_points,
                seed=config.seed if train else config.seed + 1,
            )
            n_classes = len(shapes.SHAPE_CLASSES)
        model = PointNet2Classification(num_classes=n_classes)
    else:
        if config.dataset == "indoor3d":
            ds = shapes.Indoor3DSemSegDataset(
                config.root_dir, num_points=config.num_points, train=train
            )
            n_classes = ds.NUM_CLASSES
        else:
            ds = shapes.SyntheticRooms(
                num_items=config.synthetic_batches * config.batch_size,
                num_points=config.num_points,
                seed=config.seed if train else config.seed + 1,
            )
            n_classes = ds.num_classes
        model = PointNet2Segmentation(num_classes=n_classes)
    return model, ds


def run_train_cls_seg(config: Config) -> int:
    import jax
    import jax.numpy as jnp

    from pwclonet_pylidarslam_tpu.data import shapes
    from pwclonet_pylidarslam_tpu.train.cls_seg import (
        ClsSegTrainConfig,
        cls_seg_eval_step,
        cls_seg_train_step,
        create_cls_seg_state,
    )
    from pwclonet_pylidarslam_tpu.utils.config import dump_config

    model, train_ds = _cls_seg_setup(config, train=True)
    _, eval_ds = _cls_seg_setup(config, train=False)
    cfg = ClsSegTrainConfig(
        learning_rate=config.learning_rate,
        batch_size=config.batch_size,
        lr_decay=0.7 if config.model == "cls" else 0.5,
        decay_step=2e4 if config.model == "cls" else 3e5,
    )
    dump_config(config, f"{config.log_dir}/config.yaml")
    example = next(shapes.batches(train_ds, config.batch_size, np.random.default_rng(0)))
    state = create_cls_seg_state(
        model, cfg, jax.random.key(config.seed), jnp.asarray(example["points"][:1])
    )
    step = jax.jit(cls_seg_train_step, static_argnums=(0, 1))
    for epoch in range(config.num_epochs):
        rng = np.random.default_rng((config.seed, epoch))
        losses, accs = [], []
        for batch in shapes.batches(
            train_ds, config.batch_size, rng, augment=config.augment and config.model == "cls"
        ):
            state, log = step(model, cfg, state, batch, jax.random.key(int(state.step)))
            losses.append(float(log["loss"]))
            accs.append(float(log["accuracy"]))
        ev_losses, ev_accs = [], []
        for batch in shapes.batches(eval_ds, config.batch_size, shuffle=False):
            ev = cls_seg_eval_step(model, state, batch)
            ev_losses.append(float(ev["loss"]))
            ev_accs.append(float(ev["accuracy"]))
        print(
            f"epoch {epoch}: loss={np.mean(losses):.4f} acc={np.mean(accs):.3f} "
            f"eval_loss={np.mean(ev_losses):.4f} eval_acc={np.mean(ev_accs):.3f}"
        )
    import pickle

    with open(f"{config.log_dir}/cls_seg_state.pkl", "wb") as f:
        pickle.dump(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)}, f)
    return 0


def _pwclonet_model_cfg(config: Config, fused_eval: bool = False):
    from pwclonet_pylidarslam_tpu.models import scaled_model_config

    return scaled_model_config(config.num_points, fused_eval=fused_eval)


def run_train(config: Config) -> int:
    if config.model == "posenet":
        return run_train_posenet(config)
    if config.model in ("cls", "semseg"):
        return run_train_cls_seg(config)
    from pwclonet_pylidarslam_tpu.models import PWCLONetConfig
    from pwclonet_pylidarslam_tpu.train.state import TrainConfig
    from pwclonet_pylidarslam_tpu.train.trainer import PWCLONetTrainer, TrainerConfig
    from pwclonet_pylidarslam_tpu.utils.config import dump_config

    model_cfg = _pwclonet_model_cfg(config)
    trainer_cfg = TrainerConfig(
        train=TrainConfig(model=model_cfg, learning_rate=config.learning_rate),
        num_epochs=config.num_epochs,
        log_dir=config.log_dir,
        seed=config.seed,
    )
    trainer = PWCLONetTrainer(trainer_cfg)
    dump_config(config, f"{config.log_dir}/config.yaml")
    train_fn, eval_fn = make_batch_fns(config, model_cfg)
    if config.profile_dir:
        from pwclonet_pylidarslam_tpu.utils.timer import profiler_trace

        with profiler_trace(config.profile_dir):
            history = trainer.fit(train_fn, eval_fn)
    else:
        history = trainer.fit(train_fn, eval_fn)
    last = history[-1]
    print(
        f"done: epoch {last['epoch']} train_loss={last['train_loss']:.4f} "
        f"eval_loss={last.get('eval_loss', float('nan')):.4f}"
    )
    return 0


def run_test(config: Config) -> int:
    """Test a trained model: PWCLO-Net odometry over sequences + KITTI eval
    (ref train.py:798-1002)."""
    if config.model == "posenet":
        return run_test_posenet(config)
    import jax

    from pwclonet_pylidarslam_tpu.evaluation.results import OdometryResults
    from pwclonet_pylidarslam_tpu.slam.deep_odometry import (
        DeepOdometryConfig,
        PWCLONetOdometry,
    )
    from pwclonet_pylidarslam_tpu.train.state import TrainConfig
    from pwclonet_pylidarslam_tpu.train.trainer import PWCLONetTrainer, TrainerConfig

    trainer = PWCLONetTrainer(
        TrainerConfig(
            train=TrainConfig(model=_pwclonet_model_cfg(config, config.fused_eval)),
            log_dir=config.log_dir,
        )
    )
    trainer.load_checkpoint()
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    odo = PWCLONetOdometry(
        variables, DeepOdometryConfig(model=trainer.config.train.model,
                                      num_points=config.num_points)
    )
    results = OdometryResults(f"{config.log_dir}/test")

    for s in _seqs(config.test_sequences):
        seq = make_test_sequence(config, s)
        odo.init()
        for i in range(len(seq)):
            odo.process_next_frame(seq.scan(i))
        md = results.add_sequence(f"{s:02d}", odo.absolute_poses(), seq.ground_truth())
        from pwclonet_pylidarslam_tpu.evaluation.results import write_devkit_report

        write_devkit_report(
            f"{config.log_dir}/test/{s:02d}_eval", f"{s:02d}",
            odo.absolute_poses(), seq.ground_truth(),
        )  # the reference's kittiOdomEval per-sequence artifact set (train.py:973-981)
        if md:
            print(f"seq {s:02d}: t_rel={md['tr_err']:.4f}% ATE={md['ATE']:.4f}")
    return 0


def main(argv: Optional[List[str]] = None):
    from pwclonet_pylidarslam_tpu.utils.config import parse_cli

    argv = argv if argv is not None else sys.argv[1:]
    config = parse_cli(Config, argv)
    import os

    os.makedirs(config.log_dir, exist_ok=True)
    if config.do_train:
        return run_train(config)
    if config.do_test:
        return run_test(config)
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
