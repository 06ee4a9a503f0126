"""Numeric parity against the REFERENCE torch implementation (VERDICT r1
item 4): fixed random inputs through both the reference's torch code
(`/root/reference`) and this framework's JAX code must agree to ~1e-6.

The reference modules import through a parent package name ``pyLiDAR_SLAM``
plus ``sys.path`` env hacks and depend on hydra/omegaconf/pyquaternion which
are not installed here — a small import shim (symlink + stub modules) loads
them anyway. Everything skips gracefully when torch or the reference tree is
absent.

Covered:
- ``_PWCLONetLossModule.forward`` vs ``train/losses.py::pwclonet_loss``
  (exp-weighted and fixed-weight paths, every log scalar);
- ``PWCLO_utils``: Hamilton products, quaternion inverse, quaternion warp
  vs ``core/rotation.py``;
- ``slam/common/rotation.py``: euler→mat, mat→euler, euler jacobian.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch import + reference loading are heavy

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_ref_shim():
    """Make `/root/reference` importable as both ``slam.*`` and
    ``pyLiDAR_SLAM.slam.*`` with its missing config-layer deps stubbed."""
    import dataclasses
    import tempfile
    import types

    if "omegaconf" not in sys.modules:
        try:
            import omegaconf  # noqa: F401
        except ImportError:
            omegaconf = types.ModuleType("omegaconf")

            class DictConfig(dict):
                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError:
                        raise AttributeError(k)

            omegaconf.DictConfig = DictConfig
            omegaconf.OmegaConf = types.SimpleNamespace(
                create=lambda *a, **k: DictConfig(*a) if a else DictConfig(),
                to_container=lambda c, **k: dict(c),
            )
            omegaconf.MISSING = "???"
            sys.modules["omegaconf"] = omegaconf

    if "hydra" not in sys.modules:
        try:
            import hydra  # noqa: F401
        except ImportError:
            hydra = types.ModuleType("hydra")
            hydra_conf = types.ModuleType("hydra.conf")
            hydra_conf.dataclass = dataclasses.dataclass
            hydra_conf.field = dataclasses.field
            hydra_conf.MISSING = "???"
            hydra_core = types.ModuleType("hydra.core")
            hydra_cs = types.ModuleType("hydra.core.config_store")

            class ConfigStore:
                _inst = None

                @classmethod
                def instance(cls):
                    if cls._inst is None:
                        cls._inst = cls()
                    return cls._inst

                def store(self, *a, **k):
                    pass

            hydra_cs.ConfigStore = ConfigStore
            sys.modules["hydra"] = hydra
            sys.modules["hydra.conf"] = hydra_conf
            sys.modules["hydra.core"] = hydra_core
            sys.modules["hydra.core.config_store"] = hydra_cs

    # the reference's check_tensor uses the typeguard 2.x API; newer
    # typeguard raises TypeError — stub it with a permissive check
    tg = types.ModuleType("typeguard")
    tg.check_type = lambda *a, **k: None
    sys.modules["typeguard"] = tg

    if "pyquaternion" not in sys.modules:
        try:
            import pyquaternion  # noqa: F401
        except ImportError:
            pyq = types.ModuleType("pyquaternion")

            class Quaternion:
                def __init__(self, *a, **k):
                    pass

            pyq.Quaternion = Quaternion
            sys.modules["pyquaternion"] = pyq

    shim = tempfile.mkdtemp(prefix="refshim_")
    link = os.path.join(shim, "pyLiDAR_SLAM")
    if not os.path.exists(link):
        os.symlink(REF, link)
    os.environ.setdefault("RELIDAR_SLAM_ABS_PATH", shim)
    os.environ.setdefault("PYLIDAR_SLAM_PWCLONET_ABS_PATH", REF)
    for p in (shim, REF):
        if p not in sys.path:
            sys.path.append(p)  # append, never shadow this repo's packages


if not os.path.isdir(REF):  # pragma: no cover - reference tree required
    pytest.skip("reference tree not mounted", allow_module_level=True)
_install_ref_shim()

ref_utils = pytest.importorskip("slam.models.PWCLONet.PWCLO_utils")
ref_rotation = pytest.importorskip("slam.common.rotation")
ref_losses = pytest.importorskip("slam.training.loss_modules")

import jax.numpy as jnp  # noqa: E402

from pwclonet_pylidarslam_tpu.core import rotation as rot  # noqa: E402
from pwclonet_pylidarslam_tpu.train import losses as our_losses  # noqa: E402


def _rand_quats(rng, b):
    q = rng.normal(size=(b, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternionParity:
    def test_hamilton_products(self):
        rng = np.random.default_rng(0)
        qa = _rand_quats(rng, 3)
        qb = rng.normal(size=(3, 4, 5))  # (B, 4, N) "points" quaternions
        ref_qp = ref_utils.mul_q_point(
            torch.tensor(qa), torch.tensor(qb)
        ).numpy()  # q ⊗ p per point
        ref_pq = ref_utils.mul_point_q(torch.tensor(qb), torch.tensor(qa)).numpy()
        # ours: (..., 4) layout → move N first
        ours_qp = np.asarray(
            rot.quat_multiply(jnp.asarray(qa)[:, None, :], jnp.asarray(qb).transpose(0, 2, 1))
        ).transpose(0, 2, 1)
        ours_pq = np.asarray(
            rot.quat_multiply(jnp.asarray(qb).transpose(0, 2, 1), jnp.asarray(qa)[:, None, :])
        ).transpose(0, 2, 1)
        np.testing.assert_allclose(ours_qp, ref_qp, atol=1e-12)
        np.testing.assert_allclose(ours_pq, ref_pq, atol=1e-12)

    def test_quat_inverse(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(4, 4))  # deliberately unnormalized
        ref_inv = ref_utils.inv_q(torch.tensor(q), device="cpu").numpy()
        ours = np.asarray(rot.quat_conjugate(jnp.asarray(q))) / (
            np.sum(q * q, axis=-1, keepdims=True) + 1e-10
        )
        np.testing.assert_allclose(ours, ref_inv, atol=1e-12)
        # for unit quats our quat_inverse matches too
        qu = _rand_quats(rng, 4)
        ref_u = ref_utils.inv_q(torch.tensor(qu), device="cpu").numpy()
        np.testing.assert_allclose(
            np.asarray(rot.quat_inverse(jnp.asarray(qu))), ref_u, atol=1e-9
        )

    def test_quaternion_warp(self):
        # ref warp: q·[0,xyz]·q⁻¹ + t over (B, 3, N) — ours: quat_apply
        rng = np.random.default_rng(2)
        b, n = 2, 7
        xyz = rng.normal(size=(b, 3, n)) * 5
        q = _rand_quats(rng, b)
        t = rng.normal(size=(b, 3, 1))
        ref_out = ref_utils.warp(
            torch.tensor(xyz), torch.tensor(q)[:, :, None], torch.tensor(t), device="cpu"
        ).numpy()
        ours = np.asarray(
            rot.quat_apply(
                jnp.asarray(q),
                jnp.asarray(t[:, :, 0]),
                jnp.asarray(xyz).transpose(0, 2, 1),
            )
        ).transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref_out, atol=1e-9)


class TestRotationParity:
    def test_euler_to_mat(self):
        rng = np.random.default_rng(3)
        angles = rng.uniform(-1.2, 1.2, size=(8, 3))
        ref_mat = ref_rotation.torch_euler_to_mat(torch.tensor(angles)).numpy()
        ours = np.asarray(rot.euler_to_mat(jnp.asarray(angles)))
        np.testing.assert_allclose(ours, ref_mat, atol=1e-12)

    def test_mat_to_euler_roundtrip(self):
        rng = np.random.default_rng(4)
        angles = rng.uniform(-1.2, 1.2, size=(8, 3))
        mats = ref_rotation.torch_euler_to_mat(torch.tensor(angles))
        ref_angles = ref_rotation.torch_mat_to_euler(mats).numpy()
        ours = np.asarray(rot.mat_to_euler(jnp.asarray(mats.numpy())))
        np.testing.assert_allclose(ours, ref_angles, atol=1e-7)

    def test_euler_jacobian(self):
        rng = np.random.default_rng(5)
        angles = rng.uniform(-1.0, 1.0, size=(6, 3))
        ref_jac = ref_rotation.torch_euler_jacobian(torch.tensor(angles)).numpy()
        ours = np.asarray(rot.euler_jacobian(jnp.asarray(angles)))
        np.testing.assert_allclose(ours, ref_jac, atol=1e-12)


class TestLossParity:
    def _inputs(self, seed=6):
        rng = np.random.default_rng(seed)
        pred = rng.normal(size=(4, 4, 7)).astype(np.float64)
        q_gt = _rand_quats(rng, 4)
        t_gt = rng.normal(size=(4, 3)) * 0.5
        gt = np.concatenate([t_gt, q_gt], axis=-1)
        return pred, gt

    def _ref_module(self, with_exp, weights=(1.0, 1.0)):
        from slam.common.pose import Pose

        cfg = ref_losses.PWCLONetLossConfig(
            with_exp_weights=with_exp,
            loss_option="l2_norm",
            scalar_last=False,
            loss_weights=list(weights),
        )
        return ref_losses._PWCLONetLossModule(cfg, Pose("quaternions"))

    def test_exp_weighted_loss_parity(self):
        pred, gt = self._inputs()
        module = self._ref_module(with_exp=True).double()
        ref_loss, ref_log = module(torch.tensor(pred), torch.tensor(gt))

        params = our_losses.init_loss_params()
        params = {"s_param": jnp.asarray([0.0, -2.5], jnp.float64)}
        loss, log = our_losses.pwclonet_loss(
            params, jnp.asarray(pred), jnp.asarray(gt),
            our_losses.PWCLONetLossConfig(with_exp_weights=True),
        )
        np.testing.assert_allclose(float(loss), float(ref_loss.detach()), rtol=1e-9)
        for lvl in range(1, 5):
            for key in (f"loss_rot_l{lvl}", f"loss_trans_l{lvl}", f"loss_l{lvl}"):
                np.testing.assert_allclose(
                    float(log[key]), float(ref_log[key].detach()), rtol=1e-9,
                    err_msg=key,
                )

    def test_fixed_weight_loss_parity(self):
        pred, gt = self._inputs(seed=7)
        module = self._ref_module(with_exp=False, weights=(1.0, 100.0)).double()
        ref_loss, _ = module(torch.tensor(pred), torch.tensor(gt))
        ref_loss = ref_loss.detach()
        loss, _ = our_losses.pwclonet_loss(
            {}, jnp.asarray(pred), jnp.asarray(gt),
            our_losses.PWCLONetLossConfig(
                with_exp_weights=False, fixed_weights=(1.0, 100.0)
            ),
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-9)

    def test_exp_weights_gradient_parity(self):
        # the learned s-params must receive identical gradients
        pred, gt = self._inputs(seed=8)
        module = self._ref_module(with_exp=True).double()
        ref_loss, _ = module(torch.tensor(pred), torch.tensor(gt))
        ref_loss.backward()
        ref_grad = module.exp_weighting.s_param.grad.numpy()

        import jax

        def f(s):
            loss, _ = our_losses.pwclonet_loss(
                {"s_param": s}, jnp.asarray(pred), jnp.asarray(gt),
                our_losses.PWCLONetLossConfig(with_exp_weights=True),
            )
            return loss

        ours_grad = np.asarray(jax.grad(f)(jnp.asarray([0.0, -2.5], jnp.float64)))
        np.testing.assert_allclose(ours_grad, ref_grad, rtol=1e-9)
