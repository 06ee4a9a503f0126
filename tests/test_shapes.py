"""Shape datasets (ModelNet40 / Indoor3D), augmentations, cls/semseg training.

Loader fixtures are tiny on-disk trees in the exact upstream formats
(ModelNet40 CSV tree, Indoor3D hdf5 bundle); the train steps reproduce the
upstream "loss does not spike upwards over 5 Adam steps" smoke on the
procedural synthetic sets.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.data import shapes
from pwclonet_pylidarslam_tpu.models import PointNet2Classification, PointNet2Segmentation, SAStage
from pwclonet_pylidarslam_tpu.train.cls_seg import (
    ClsSegTrainConfig,
    bn_momentum_at,
    cls_seg_eval_step,
    cls_seg_train_step,
    create_cls_seg_state,
    lr_at,
)

TINY_CLS = (
    SAStage(16, (0.5,), (8,), ((16, 32),)),
    SAStage(None, (None,), (None,), ((32, 64),)),
)
TINY_SEM = (
    SAStage(32, (0.5,), (8,), ((16, 32),)),
    SAStage(8, (1.0,), (8,), ((32, 64),)),
)


# --- loaders ---------------------------------------------------------------


def _write_modelnet_fixture(root, rng, points_per_shape=64):
    classes = ["airplane", "chair"]
    with open(os.path.join(root, "modelnet40_shape_names.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")
    train_ids, test_ids = [], []
    for c in classes:
        os.makedirs(os.path.join(root, c))
        for i in range(3):
            sid = f"{c}_{i:04d}"
            pts = rng.normal(size=(points_per_shape, 6)).astype(np.float32)
            np.savetxt(os.path.join(root, c, sid + ".txt"), pts, delimiter=",")
            (train_ids if i < 2 else test_ids).append(sid)
    with open(os.path.join(root, "modelnet40_train.txt"), "w") as f:
        f.write("\n".join(train_ids) + "\n")
    with open(os.path.join(root, "modelnet40_test.txt"), "w") as f:
        f.write("\n".join(test_ids) + "\n")


def test_modelnet40_loader(tmp_path, rng):
    _write_modelnet_fixture(str(tmp_path), rng)
    train = shapes.ModelNet40Dataset(str(tmp_path), num_points=32, train=True)
    test = shapes.ModelNet40Dataset(
        str(tmp_path), num_points=128, train=False, use_normals=True
    )
    assert len(train) == 4 and len(test) == 2
    pts, label = train[0]
    assert pts.shape == (32, 3) and label in (0, 1)
    # unit-sphere normalization
    assert np.linalg.norm(pts, axis=1).max() <= 1.0 + 1e-6
    # test split pads by repetition to the requested fixed shape
    pts_t, _ = test[0]
    assert pts_t.shape == (128, 6)
    # labels follow the class-name index
    assert train.classes == ["airplane", "chair"]


def test_indoor3d_loader(tmp_path, rng):
    h5py = pytest.importorskip("h5py")
    data = rng.normal(size=(6, 64, 9)).astype(np.float32)
    label = rng.integers(0, 13, size=(6, 64)).astype(np.int32)
    with h5py.File(tmp_path / "ply_data_all_0.h5", "w") as f:
        f.create_dataset("data", data=data)
        f.create_dataset("label", data=label)
    with open(tmp_path / "all_files.txt", "w") as f:
        f.write("indoor3d_sem_seg_hdf5_data/ply_data_all_0.h5\n")
    rooms = ["Area_1_office_1"] * 4 + ["Area_5_office_1"] * 2
    with open(tmp_path / "room_filelist.txt", "w") as f:
        f.write("\n".join(rooms) + "\n")
    train = shapes.Indoor3DSemSegDataset(str(tmp_path), num_points=32, train=True)
    test = shapes.Indoor3DSemSegDataset(str(tmp_path), num_points=32, train=False)
    assert len(train) == 4 and len(test) == 2
    pts, lbl = train[0]
    assert pts.shape == (32, 9) and lbl.shape == (32,)
    assert set(np.unique(lbl)) <= set(range(13))


# --- augmentations ----------------------------------------------------------


def test_angle_axis_is_rotation():
    R = shapes.angle_axis(0.7, np.array([1.0, 2.0, -0.5]))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_augment_preserves_shape_and_norms(rng):
    pts = rng.normal(size=(100, 6)).astype(np.float32)
    rot = shapes.rotate_points_random(pts, rng)
    np.testing.assert_allclose(
        np.linalg.norm(rot[:, :3], axis=1),
        np.linalg.norm(pts[:, :3], axis=1),
        rtol=1e-5,
    )
    # normals rotate with the points
    np.testing.assert_allclose(
        np.linalg.norm(rot[:, 3:6], axis=1),
        np.linalg.norm(pts[:, 3:6], axis=1),
        rtol=1e-5,
    )
    for fn in (
        shapes.scale_points,
        shapes.rotate_perturbation,
        shapes.jitter_points,
        shapes.translate_points,
        shapes.random_input_dropout,
    ):
        out = fn(pts, rng)
        assert out.shape == pts.shape and out.dtype == pts.dtype
    assert shapes.augment_cls(pts, rng).shape == pts.shape


def test_batches_fixed_shape(rng):
    ds = shapes.SyntheticShapes(num_items=10, num_points=64)
    got = list(shapes.batches(ds, batch_size=4, rng=rng, augment=True))
    assert len(got) == 2
    for b in got:
        assert b["points"].shape == (4, 64, 3)
        assert b["labels"].shape == (4,)


# --- schedules (upstream staircase semantics) --------------------------------


def test_staircase_schedules():
    cfg = ClsSegTrainConfig(learning_rate=1e-3, lr_decay=0.7, decay_step=100.0,
                            bn_momentum=0.5, bnm_decay=0.5, batch_size=10)
    np.testing.assert_allclose(lr_at(cfg, 0.0), 1e-3)
    np.testing.assert_allclose(lr_at(cfg, 250.0), 1e-3 * 0.7**2, rtol=1e-6)
    np.testing.assert_allclose(lr_at(cfg, 1e9), 1e-5)  # lr_clip
    np.testing.assert_allclose(bn_momentum_at(cfg, 150.0), 0.25)
    np.testing.assert_allclose(bn_momentum_at(cfg, 1e9), 1e-2)  # bnm_clip


# --- trains-at-all (upstream _test_loop pattern) ------------------------------


def _loss_trajectory(model, ds, n_steps=5, semseg=False):
    cfg = ClsSegTrainConfig(batch_size=4)
    batch = next(shapes.batches(ds, 4, np.random.default_rng(0)))
    state = create_cls_seg_state(
        model, cfg, jax.random.key(0), jnp.asarray(batch["points"][:1])
    )
    step = jax.jit(cls_seg_train_step, static_argnums=(0, 1))
    losses = []
    for i, batch in enumerate(shapes.batches(ds, 4, np.random.default_rng(1))):
        if i >= n_steps:
            break
        state, log = step(model, cfg, state, batch, jax.random.key(i))
        losses.append(float(log["loss"]))
    ev = cls_seg_eval_step(model, state, batch)
    assert np.isfinite(float(ev["loss"]))
    return losses


@pytest.mark.slow
def test_cls_trains_at_all():
    ds = shapes.SyntheticShapes(num_items=24, num_points=64)
    model = PointNet2Classification(num_classes=len(shapes.SHAPE_CLASSES), stages=TINY_CLS, head=(32,))
    losses = _loss_trajectory(model, ds)
    assert losses[-1] < losses[0] * 1.5  # does not spike upwards
    assert all(np.isfinite(losses))


@pytest.mark.slow
def test_semseg_trains_at_all():
    ds = shapes.SyntheticRooms(num_items=16, num_points=128)
    model = PointNet2Segmentation(num_classes=4, stages=TINY_SEM, fp_width=32, head_width=16)
    losses = _loss_trajectory(model, ds, semseg=True)
    assert losses[-1] < losses[0] * 1.5
    assert all(np.isfinite(losses))
