"""PointNet++ cls/semseg heads + upstream module variants.

Mirrors the reference's model-level test strategy (SURVEY §4: the vendored
``Pointnet2_PyTorch/tests`` assert "loss does not spike upwards" over 5 Adam
steps) but hermetic on CPU with golden-value checks for the new modules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pwclonet_pylidarslam_tpu.models import (
    PointNet2Classification,
    PointNet2Segmentation,
    SAStage,
)
from pwclonet_pylidarslam_tpu.models.pointnet2 import (
    FeaturePropagation,
    LFPModuleMSG,
    SetConvMSG,
)

TINY_CLS = (
    SAStage(32, (0.5, 1.0), (8, 16), ((16, 32), (16, 32))),
    SAStage(8, (1.0,), (8,), ((32, 64),)),
    SAStage(None, (None,), (None,), ((64, 128),)),
)
TINY_SEM = (
    SAStage(32, (0.5,), (8,), ((16, 32),)),
    SAStage(8, (1.0,), (8,), ((32, 64),)),
)


def _cloud(key, b=2, n=128):
    return jax.random.normal(key, (b, n, 3)) * 2.0


@pytest.mark.slow
def test_setconv_msg_shapes_and_centering():
    xyz = _cloud(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(1), (2, 128, 5))
    module = SetConvMSG(npoint=16, radii=(0.5, 1.5), nsamples=(4, 8), mlps=((8,), (8, 16)))
    variables = module.init(jax.random.key(2), xyz, feats, train=False)
    new_xyz, new_feat = module.apply(variables, xyz, feats, train=False)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feat.shape == (2, 16, 8 + 16)  # concat over scales
    assert bool(jnp.all(jnp.isfinite(new_feat)))


def test_setconv_msg_group_all():
    xyz = _cloud(jax.random.key(0))
    module = SetConvMSG(npoint=None, radii=(None,), nsamples=(None,), mlps=((8, 16),))
    variables = module.init(jax.random.key(2), xyz, None, train=False)
    new_xyz, new_feat = module.apply(variables, xyz, None, train=False)
    assert new_xyz.shape == (2, 1, 3)
    assert new_feat.shape == (2, 1, 16)
    assert bool(jnp.all(new_xyz == 0.0))


def test_feature_propagation_broadcast_and_interp():
    unknown = _cloud(jax.random.key(0), n=64)
    known = _cloud(jax.random.key(1), n=16)
    known_feat = jax.random.normal(jax.random.key(2), (2, 16, 6))
    fp = FeaturePropagation((8,))
    variables = fp.init(jax.random.key(3), unknown, known, None, known_feat, train=False)
    out = fp.apply(variables, unknown, known, None, known_feat, train=False)
    assert out.shape == (2, 64, 8)
    # global mode: known=None broadcasts a (B,1,C) descriptor
    global_feat = known_feat[:, :1]
    variables = fp.init(jax.random.key(3), unknown, None, None, global_feat, train=False)
    out = fp.apply(variables, unknown, None, None, global_feat, train=False)
    assert out.shape == (2, 64, 8)


@pytest.mark.slow
def test_lfp_module_msg_shapes():
    xyz1 = _cloud(jax.random.key(0), n=64)
    xyz2 = _cloud(jax.random.key(1), n=32)
    feat1 = jax.random.normal(jax.random.key(2), (2, 64, 4))
    feat2 = jax.random.normal(jax.random.key(3), (2, 32, 6))
    lfp = LFPModuleMSG(radii=(0.5, 1.0), nsamples=(4, 8), mlps=((8,), (8,)), post_mlp=(16,))
    variables = lfp.init(jax.random.key(4), xyz2, xyz1, feat2, feat1, train=False)
    out = lfp.apply(variables, xyz2, xyz1, feat2, feat1, train=False)
    assert out.shape == (2, 32, 2 * 16)


def _train_steps(model, variables, batch, labels, loss_fn, steps=5):
    tx = optax.adam(1e-3)
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)
    losses = []

    @jax.jit
    def step(params, state, opt_state, key):
        def loss_of(p):
            out, mutated = model.apply(
                {"params": p, **state}, *batch, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            return loss_fn(out), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), mutated, opt_state, loss

    key = jax.random.key(7)
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = step(params, state, opt_state, sub)
        losses.append(float(loss))
    return losses


@pytest.mark.parametrize("stages", [TINY_CLS])
@pytest.mark.slow
def test_classification_trains(stages):
    xyz = _cloud(jax.random.key(0), b=4, n=128)
    labels = jnp.asarray([0, 1, 2, 3])
    model = PointNet2Classification(num_classes=4, stages=stages, head=(32, 16))
    variables = model.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)}, xyz, train=False
    )

    def loss_fn(logits):
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    losses = _train_steps(model, variables, (xyz,), labels, loss_fn)
    assert np.isfinite(losses).all()
    # upstream invariant: loss does not spike upwards
    assert losses[-1] < losses[0] * 1.5


@pytest.mark.slow
def test_segmentation_trains():
    xyz = _cloud(jax.random.key(0), b=2, n=64)
    labels = jax.random.randint(jax.random.key(1), (2, 64), 0, 3)
    model = PointNet2Segmentation(num_classes=3, stages=TINY_SEM, fp_width=16, head_width=16)
    variables = model.init(
        {"params": jax.random.key(2), "dropout": jax.random.key(3)}, xyz, train=False
    )

    def loss_fn(logits):
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    losses = _train_steps(model, variables, (xyz,), labels, loss_fn)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5
