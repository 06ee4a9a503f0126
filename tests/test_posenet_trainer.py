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
