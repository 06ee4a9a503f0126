"""PWCLO-Net model + loss + train-step tests (small configs for speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.models import PWCLONet, PWCLONetConfig
from pwclonet_pylidarslam_tpu.train.losses import (
    PWCLONetLossConfig,
    init_loss_params,
    pwclonet_loss,
)
from pwclonet_pylidarslam_tpu.train.state import (
    TrainConfig,
    create_train_state,
    eval_step,
    train_step,
)

SMALL = PWCLONetConfig(
    num_points=256,
    sa_npoints=(64, 32, 16, 8),
    sa_nsamples=(8, 8, 8, 4),
)


@pytest.fixture(scope="module")
def small_model_state():
    cfg = TrainConfig(model=SMALL, total_steps=100)
    model, state = create_train_state(cfg, jax.random.key(0))
    return cfg, model, state


@pytest.fixture(scope="module")
def batch(rng=None):
    r = np.random.default_rng(0)
    pts1 = r.normal(size=(2, 256, 3)).astype(np.float32) * 8
    twists = (r.normal(size=(2, 6)) * 0.05).astype(np.float32)
    T = se3.exp(jnp.asarray(twists))
    pts2 = se3.transform(T, jnp.asarray(pts1))
    gt = se3.pose_to_params_quat(T).astype(jnp.float32)
    return {"xyz1": jnp.asarray(pts1), "xyz2": pts2, "gt_params": gt}


class TestForward:
    @pytest.mark.slow
    def test_output_shape_and_unit_quats(self, small_model_state, batch):
        cfg, model, state = small_model_state
        pred, aux = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["xyz1"], batch["xyz2"], train=False,
        )
        assert pred.shape == (2, 4, 7)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pred[..., 3:]), axis=-1), 1.0, atol=1e-5
        )
        assert aux["embedding_mask"].shape == (2, SMALL.sa_npoints[0])
        assert np.all(np.isfinite(np.asarray(pred)))

    @pytest.mark.slow
    def test_eval_deterministic(self, small_model_state, batch):
        cfg, model, state = small_model_state
        kwargs = dict(train=False)
        va = {"params": state.params, "batch_stats": state.batch_stats}
        p1, _ = model.apply(va, batch["xyz1"], batch["xyz2"], **kwargs)
        p2, _ = model.apply(va, batch["xyz1"], batch["xyz2"], **kwargs)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_siamese_weight_sharing(self, small_model_state):
        cfg, model, state = small_model_state
        # pyramid params must exist once (SetConv_0..3 + flow encoding SetConv_4)
        names = [k for k in state.params if k.startswith("SetConv")]
        assert len(names) == 5


class TestLoss:
    def test_perfect_prediction_floor(self):
        lp = init_loss_params()
        gt = jnp.asarray([[0.1, 0.2, 0.3, 1.0, 0.0, 0.0, 0.0]])
        pred = jnp.tile(gt[:, None, :], (1, 4, 1))
        loss, log = pwclonet_loss(lp, pred, gt)
        # floor = sum of level weights * (s_t + s_q) plus the 1e-10 sqrt terms
        expected_floor = sum((0.2, 0.4, 0.8, 1.6)) * (0.0 + -2.5)
        np.testing.assert_allclose(float(loss), expected_floor, atol=1e-3)

    def test_level_weighting(self):
        lp = {"s_param": jnp.zeros(2)}
        gt = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])
        base = jnp.tile(gt[:, None, :], (1, 4, 1))
        # error only at the coarsest level (index 3) vs only at the finest
        bad_coarse = base.at[:, 3, 0].set(1.0)
        bad_fine = base.at[:, 0, 0].set(1.0)
        l_coarse, _ = pwclonet_loss(lp, bad_coarse, gt)
        l_fine, _ = pwclonet_loss(lp, bad_fine, gt)
        # coarse level carries 1.6 weight, fine 0.2 → ratio 8 in the deltas
        lp0, _ = pwclonet_loss(lp, base, gt)
        np.testing.assert_allclose(
            (float(l_coarse) - float(lp0)) / (float(l_fine) - float(lp0)), 8.0, rtol=1e-3
        )

    def test_fixed_weights_mode(self):
        cfg = PWCLONetLossConfig(with_exp_weights=False, fixed_weights=(1.0, 2.0))
        gt = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])
        pred = jnp.tile(gt[:, None, :], (1, 4, 1)).at[:, :, 0].set(1.0)
        loss, _ = pwclonet_loss({}, pred, gt, cfg)
        assert np.isfinite(float(loss))


class TestTraining:
    @pytest.mark.slow
    def test_overfit_single_batch(self, small_model_state, batch):
        cfg, model, state = small_model_state
        step = jax.jit(lambda s, b, r: train_step(model, cfg, s, b, r))
        losses = []
        for i in range(12):
            state, log = step(state, batch, jax.random.fold_in(jax.random.key(2), i))
            losses.append(float(log["loss"]))
        # "loss does not spike upwards" smoke (upstream Pointnet2 test pattern)
        # plus actual-progress assertion
        assert losses[-1] < losses[0] * 0.7
        assert int(state.step) == 12

    @pytest.mark.slow
    def test_nonfinite_batch_skips_update(self, small_model_state, batch):
        cfg, model, state = small_model_state
        bad = dict(batch)
        bad["gt_params"] = batch["gt_params"].at[0, 0].set(jnp.nan)
        new_state, log = train_step(model, cfg, state, bad, jax.random.key(3))
        assert bool(log["skipped_nonfinite"])
        leaves_old = jax.tree.leaves(state.params)
        leaves_new = jax.tree.leaves(new_state.params)
        for a, b in zip(leaves_old, leaves_new):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_step(self, small_model_state, batch):
        cfg, model, state = small_model_state
        pred, log = eval_step(model, cfg, state, batch)
        assert pred.shape == (2, 4, 7)
        assert np.isfinite(float(log["loss"]))
