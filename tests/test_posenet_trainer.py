"""PoseResNet training stack: supervised/unsupervised steps, MultiStepLR,
vertex-map pair dataset (ref ``PoseNetTrainer``, train.py:77-143)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector
from pwclonet_pylidarslam_tpu.data.synthetic import (
    SyntheticSequenceConfig,
    generate_sequence,
)
from pwclonet_pylidarslam_tpu.data.vm_pairs import VertexMapPairDataset
from pwclonet_pylidarslam_tpu.models.posenet import PoseResNetConfig
from pwclonet_pylidarslam_tpu.train.posenet_state import (
    PoseNetTrainConfig,
    create_posenet_train_state,
    make_lr_schedule,
    posenet_eval_step,
    posenet_train_step,
)

PROJ = SphericalProjector(height=16, width=64)
H, W = 16, 64


def _synthetic_vm_batch(batch=2, seed=0):
    scans, gt = generate_sequence(
        SyntheticSequenceConfig(n_frames=batch + 1, num_points=2048, seed=seed)
    )
    ds = VertexMapPairDataset.from_scans(scans, gt, PROJ, num_points=2048)
    return next(ds.batches(batch, shuffle=False))


def test_lr_schedule_multistep():
    cfg = PoseNetTrainConfig(lr_milestones=(10, 20), lr_gamma=0.5, learning_rate=1e-3)
    lr = make_lr_schedule(cfg)
    assert np.isclose(float(lr(0)), 1e-3)
    assert np.isclose(float(lr(10)), 5e-4)
    assert np.isclose(float(lr(25)), 2.5e-4)


def test_vm_pair_dataset_gt_contract():
    scans, gt = generate_sequence(
        SyntheticSequenceConfig(n_frames=4, num_points=1024, seed=1)
    )
    ds = VertexMapPairDataset.from_scans(scans, gt, PROJ, num_points=1024)
    assert len(ds) == 3
    item = ds[1]
    assert item["vm1"].shape == (H, W, 3)
    # gt_pose maps current (i+1) frame coords into previous (i) frame coords
    expected = np.linalg.inv(gt[1]) @ gt[2]
    np.testing.assert_allclose(item["gt_pose"], expected.astype(np.float32), atol=1e-5)


def test_vm_window_dataset_contract():
    # len>2 sliding windows (ref DatasetOfSequences, sequence_dataset.py:9-169)
    from pwclonet_pylidarslam_tpu.data.vm_pairs import VertexMapWindowDataset

    scans, gt = generate_sequence(
        SyntheticSequenceConfig(n_frames=6, num_points=1024, seed=2)
    )
    ds = VertexMapWindowDataset.from_scans(
        scans, gt, PROJ, num_points=1024, sequence_len=3
    )
    # window count = T - S*stride + 1 (ref sequence_dataset.py:50)
    assert len(ds) == 6 - 3 + 1
    item = ds[1]
    assert item["frames"].shape == (3, H, W, 3)
    assert item["gt_poses"].shape == (2, 4, 4)
    # frames are newest-first: frames[0]=vm[3], frames[1]=vm[2], frames[2]=vm[1];
    # gt_poses[k] maps frames[k] coords into frames[k+1] coords
    np.testing.assert_allclose(
        item["gt_poses"][0], (np.linalg.inv(gt[2]) @ gt[3]).astype(np.float32), atol=1e-5
    )
    np.testing.assert_allclose(
        item["gt_poses"][1], (np.linalg.inv(gt[1]) @ gt[2]).astype(np.float32), atol=1e-5
    )
    # frames[0] must equal the pair dataset's vm1 for the same index
    pair = VertexMapPairDataset.from_scans(scans, gt, PROJ, num_points=1024)
    np.testing.assert_allclose(item["frames"][0], pair[2]["vm1"])


def test_vm_window_dataset_stride_and_boundaries():
    from pwclonet_pylidarslam_tpu.data.vm_pairs import (
        MultiSequenceWindowDataset,
        VertexMapWindowDataset,
    )

    vms = np.arange(8, dtype=np.float32)[:, None, None, None] * np.ones(
        (8, 4, 4, 3), np.float32
    )
    ds = VertexMapWindowDataset(vms, None, sequence_len=2, stride=2)
    assert len(ds) == 8 - 2 * 2 + 1
    item = ds[0]  # frames newest-first with stride 2: vm[2], vm[0]
    assert float(item["frames"][0, 0, 0, 0]) == 2.0
    assert float(item["frames"][1, 0, 0, 0]) == 0.0
    # pooling never windows across a sequence boundary
    multi = MultiSequenceWindowDataset([ds, ds])
    assert len(multi) == 2 * len(ds)
    np.testing.assert_allclose(multi[len(ds)]["frames"], ds[0]["frames"])


@pytest.mark.slow
def test_windowed_training_three_frames():
    """PoseNet trains on 3-frame windows (VERDICT r1 item 6): the model
    regresses sequence_len-1 poses and the supervised loss decreases."""
    from pwclonet_pylidarslam_tpu.data.vm_pairs import VertexMapWindowDataset

    scans, gt = generate_sequence(
        SyntheticSequenceConfig(n_frames=5, num_points=2048, seed=3)
    )
    ds = VertexMapWindowDataset.from_scans(
        scans, gt, PROJ, num_points=2048, sequence_len=3
    )
    batch = {k: jnp.asarray(v) for k, v in next(ds.batches(2, shuffle=False)).items()}
    cfg = PoseNetTrainConfig(
        model=PoseResNetConfig(sequence_len=3, num_out_poses=2),
        loss="supervised",
        learning_rate=1e-3,
        projector=PROJ,
    )
    model, state = create_posenet_train_state(cfg, jax.random.key(0), (H, W))
    step = jax.jit(lambda s, b: posenet_train_step(model, cfg, s, b, jax.random.key(1)))
    state, log0 = step(state, batch)
    for _ in range(20):
        state, log = step(state, batch)
    assert np.isfinite(float(log["loss"]))
    assert float(log["loss"]) < float(log0["loss"])
    # eval returns one pose per consecutive pair
    pred, _ = posenet_eval_step(model, cfg, state, batch)
    assert pred.shape == (2, 2, 6)


def test_mismatched_out_poses_raises():
    cfg = PoseNetTrainConfig(model=PoseResNetConfig(sequence_len=3, num_out_poses=1))
    with pytest.raises(ValueError, match="num_out_poses"):
        create_posenet_train_state(cfg, jax.random.key(0), (H, W))


@pytest.mark.slow
def test_supervised_train_step_decreases_loss():
    cfg = PoseNetTrainConfig(
        model=PoseResNetConfig(),
        loss="supervised",
        learning_rate=1e-3,
        projector=PROJ,
    )
    model, state = create_posenet_train_state(cfg, jax.random.key(0), (H, W))
    batch = {k: jnp.asarray(v) for k, v in _synthetic_vm_batch().items()}
    step = jax.jit(lambda s, b: posenet_train_step(model, cfg, s, b, jax.random.key(1)))
    state, log0 = step(state, batch)
    for _ in range(25):
        state, log = step(state, batch)
    assert np.isfinite(float(log["loss"]))
    assert float(log["loss"]) < float(log0["loss"])
    assert int(state.step) == 26


@pytest.mark.slow
def test_unsupervised_point_to_plane_step_runs():
    cfg = PoseNetTrainConfig(loss="unsupervised", projector=PROJ, learning_rate=1e-4)
    model, state = create_posenet_train_state(cfg, jax.random.key(0), (H, W))
    batch = _synthetic_vm_batch()
    batch.pop("gt_pose")  # unsupervised needs no GT
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step = jax.jit(lambda s, b: posenet_train_step(model, cfg, s, b, jax.random.key(1)))
    state1, log = step(state, batch)
    assert np.isfinite(float(log["loss"]))
    # parameters moved
    delta = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + float(jnp.abs(leaf).sum()),
        jax.tree.map(lambda a, b: a - b, state1.params, state.params),
        0.0,
    )
    assert delta > 0.0


@pytest.mark.slow
def test_eval_step_and_trainer_metrics():
    from pwclonet_pylidarslam_tpu.train.posenet_trainer import (
        PoseNetTrainer,
        PoseNetTrainerConfig,
    )

    cfg = PoseNetTrainerConfig(
        train=PoseNetTrainConfig(projector=PROJ),
        vm_shape=(H, W),
        num_epochs=1,
        checkpoint_every_epochs=0,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        cfg.log_dir = tmp
        trainer = PoseNetTrainer(cfg)
        batch = _synthetic_vm_batch()
        out = trainer.evaluate_epoch([batch])
        assert np.isfinite(out["eval_loss"])
        assert "ATE" in out
