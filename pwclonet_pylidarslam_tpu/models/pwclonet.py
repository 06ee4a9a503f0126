"""PWCLO-Net: hierarchical deep LiDAR odometry (Flax, channel-last).

TPU-native re-design of ref ``slam/models/PWCLONet/pwclo_net.py`` with the
exact channel plan (``:66-106``):

- Siamese 4-level set-conv pyramid (shared weights), npoint 2048/1024/256/64,
  nsample 32/32/16/16, output channels 16/32/64/128;
- attentive cost volume at level 3 + flow-feature-encoding set conv → level 4
  flow embedding (64 ch);
- level-4 embedding mask (FlowPredictor) + PoseCalculator → coarse (q, t);
- 3 cascaded pose warp-refinement levels (3 → 2 → 1);
- output ``(B, 4, 7)``: per level ``(t (3), q_wxyz normalized (4))``, index 0
  = finest level (the final prediction).

Quaternions are **scalar-first** internally; convert at IO boundaries only
(the reference threads a ``scalar_last`` flag everywhere instead —
SURVEY.md §7 flags that as a bug source to avoid).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pwclonet_pylidarslam_tpu.core import rotation as rot
from pwclonet_pylidarslam_tpu.models.costvolume import CostVolume
from pwclonet_pylidarslam_tpu.models.layers import LinearHead, PointMLP
from pwclonet_pylidarslam_tpu.models.pointnet2 import SetConv, SetUpConv


class FlowPredictor(nn.Module):
    """Embedding feature/mask predictor: MLP over concatenated features
    (ref ``flowpredictor.py:15-84``)."""

    mlp: Sequence[int] = (128, 64)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, *features, train: bool, bn_momentum=0.1):
        x = jnp.concatenate([f for f in features if f is not None], axis=-1)
        return PointMLP(tuple(self.mlp), dtype=self.dtype)(
            x, train=train, bn_momentum=bn_momentum
        )


class PoseCalculator(nn.Module):
    """Masked aggregation → linear heads for (q, t) (ref ``pose_calculator.py:20-87``).

    ``features/mask (B, N, C)``; mask is softmaxed over N by the caller.
    Heads are linear (the reference passes ``activation=None``) with dual
    dropout(0.5) branches off a shared 256-wide projection.
    """

    hidden: int = 256
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, features, mask, train: bool):
        pooled = jnp.sum(features * mask, axis=1)  # (B, C)
        big = LinearHead(self.hidden)(pooled)
        drop_q = nn.Dropout(self.dropout_rate, deterministic=not train)(big)
        drop_t = nn.Dropout(self.dropout_rate, deterministic=not train)(big)
        q = LinearHead(4)(drop_q)
        q = q / (jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-10) + 1e-10)
        t = LinearHead(3)(drop_t)
        return q, t


def quat_warp(q: jax.Array, t: jax.Array, points: jax.Array) -> jax.Array:
    """``R(q)·p + t`` over ``points (B, N, 3)`` (ref ``PWCLO_utils.warp:42-63``).

    Uses the fused Rodrigues form instead of the reference's two Hamilton
    products over zero-padded 4-vectors.
    """
    return rot.quat_apply(rot.quat_normalize(q), t, points)


class PoseWarpRefinement(nn.Module):
    """One coarse-to-fine refinement level (ref ``pose_warp_refinement.py:25-159``).

    set-upconv feature & mask propagation → quaternion warp of the fine F1
    points by the coarse pose → re-embedding cost volume (k=6) → feature /
    mask flow predictors → PoseCalculator → pose composition
    ``q = q_det ⊗ q_coarse``, ``t = R(q_det)·t_coarse + t_det``.
    """

    last_level: bool = False  # finest level skips mask refinement (ref :71-76)
    dtype: Optional[jnp.dtype] = None
    fused_eval: bool = False

    @nn.compact
    def __call__(
        self,
        xyz_f1, feat_f1, xyz_f2, feat_f2,
        xyz_prev, feat_prev, mask_prev,
        q_coarse, t_coarse,
        train: bool, bn_momentum=0.1,
    ):
        up_feat = SetUpConv(nsample=8, mlp=(128, 64), post_mlp=(64,), dtype=self.dtype,
                            fused_eval=self.fused_eval)(
            xyz_f1, xyz_prev, feat_f1, feat_prev, train=train, bn_momentum=bn_momentum
        )
        up_mask = SetUpConv(nsample=8, mlp=(128, 64), post_mlp=(64,), dtype=self.dtype,
                            fused_eval=self.fused_eval)(
            xyz_f1, xyz_prev, feat_f1, mask_prev, train=train, bn_momentum=bn_momentum
        )
        warped = quat_warp(q_coarse, t_coarse, xyz_f1)
        residual_emb = CostVolume(nsample=4, nsample_q=6, dtype=self.dtype,
                                  fused_eval=self.fused_eval)(
            warped, feat_f1, xyz_f2, feat_f2, train=train, bn_momentum=bn_momentum
        )
        emb_feat = FlowPredictor(dtype=self.dtype)(
            feat_f1, residual_emb, up_feat, train=train, bn_momentum=bn_momentum
        )
        if self.last_level:
            emb_mask = up_mask
        else:
            emb_mask = FlowPredictor(dtype=self.dtype)(
                up_mask, emb_feat, feat_f1, train=train, bn_momentum=bn_momentum
            )
        w = jax.nn.softmax(emb_mask, axis=1)  # over N
        q_det, t_det = PoseCalculator()(emb_feat, w, train=train)
        q = rot.quat_multiply(q_det, q_coarse)
        t = quat_warp(q_det, t_det, t_coarse[:, None, :])[:, 0]
        return q, t, emb_feat, emb_mask


@dataclasses.dataclass(frozen=True)
class PWCLONetConfig:
    """Architecture hyperparameters (ref ``pwclo_net.py:66-106`` channel plan)."""

    num_points: int = 8192
    sa_npoints: Tuple[int, ...] = (2048, 1024, 256, 64)
    sa_nsamples: Tuple[int, ...] = (32, 32, 16, 16)
    sa_mlps: Tuple[Tuple[int, ...], ...] = (
        (8, 8, 16),
        (16, 16, 32),
        (32, 32, 64),
        (64, 64, 128),
    )
    bn_momentum_init: float = 0.5  # scheduled by the trainer
    compute_dtype: str = "float32"  # "bfloat16" puts the MLP matmuls on bf16
    fused_eval: bool = False  # eval: fused Pallas MLP+maxpool in the set convs


def scaled_model_config(num_points: int, **overrides) -> "PWCLONetConfig":
    """The ONE model-config rule shared by training, testing and SLAM
    inference: the reference channel plan at >= 2048 points
    (``pwclo_net.py:66-69``), a proportionally scaled pyramid for smoke
    runs. A checkpoint must be rebuilt with the same rule wherever it is
    loaded."""
    if num_points >= 2048:
        return PWCLONetConfig(num_points=num_points, **overrides)
    n = num_points
    return PWCLONetConfig(
        num_points=n,
        sa_npoints=(n // 4, n // 8, n // 16, n // 32),
        sa_nsamples=(8, 8, 8, 4),
        **overrides,
    )


class PWCLONet(nn.Module):
    """Full network. ``__call__(xyz1 (B,N,3), xyz2 (B,N,3))`` →
    ``(pose_params (B, 4, 7), aux)`` with params ``[t, q_wxyz]`` per level,
    level order fine→coarse (index 0 = final prediction, matching ref
    ``pwclo_net.py:195-206``)."""

    config: PWCLONetConfig = PWCLONetConfig()

    @nn.compact
    def __call__(self, xyz1, xyz2, train: bool = False, bn_momentum: float = 0.1):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        sa = [
            SetConv(cfg.sa_npoints[i], cfg.sa_nsamples[i], cfg.sa_mlps[i], dtype=dtype,
                    fused_eval=cfg.fused_eval)
            for i in range(4)
        ]

        # Siamese pyramid — same module instances applied to both frames
        # (linen shares parameters across calls of one instance)
        f1 = [(xyz1, None)]
        f2 = [(xyz2, None)]
        for level in range(4):
            f1.append(sa[level](*f1[-1], train=train, bn_momentum=bn_momentum))
            f2.append(sa[level](*f2[-1], train=train, bn_momentum=bn_momentum))
        (x1_1, p1_1), (x1_2, p1_2), (x1_3, p1_3), (x1_4, p1_4) = f1[1:]
        (x2_1, p2_1), (x2_2, p2_2), (x2_3, p2_3), (x2_4, p2_4) = f2[1:]

        # attentive cost volume at level 3 + flow feature encoding → level 4
        flow_emb = CostVolume(nsample=4, nsample_q=32, dtype=dtype,
                              fused_eval=cfg.fused_eval)(
            x1_3, p1_3, x2_3, p2_3, train=train, bn_momentum=bn_momentum
        )
        x1_4, emb4 = SetConv(cfg.sa_npoints[3], cfg.sa_nsamples[3], (128, 64, 64), dtype=dtype,
                             fused_eval=cfg.fused_eval)(
            x1_3, flow_emb, train=train, bn_momentum=bn_momentum
        )

        # level-4 embedding mask + coarse pose
        mask4 = FlowPredictor(dtype=dtype)(p1_4, emb4, train=train, bn_momentum=bn_momentum)
        w4 = jax.nn.softmax(mask4, axis=1)
        q4, t4 = PoseCalculator()(emb4, w4, train=train)

        # cascaded warp-refinement: level 3 → 2 → 1
        q3, t3, emb3, mask3 = PoseWarpRefinement(dtype=dtype, fused_eval=cfg.fused_eval)(
            x1_3, p1_3, x2_3, p2_3, x1_4, emb4, mask4, q4, t4,
            train=train, bn_momentum=bn_momentum,
        )
        q2, t2, emb2, mask2 = PoseWarpRefinement(dtype=dtype, fused_eval=cfg.fused_eval)(
            x1_2, p1_2, x2_2, p2_2, x1_3, emb3, mask3, q3, t3,
            train=train, bn_momentum=bn_momentum,
        )
        q1, t1, emb1, mask1 = PoseWarpRefinement(last_level=True, dtype=dtype,
                                                 fused_eval=cfg.fused_eval)(
            x1_1, p1_1, x2_1, p2_1, x1_2, emb2, mask2, q2, t2,
            train=train, bn_momentum=bn_momentum,
        )

        def pack(q, t):
            qn = q / (jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-10) + 1e-10)
            return jnp.concatenate([t, qn], axis=-1)

        pose_params = jnp.stack(
            [pack(q1, t1), pack(q2, t2), pack(q3, t3), pack(q4, t4)], axis=1
        )  # (B, 4, 7)
        aux = {
            "embedding_mask": jnp.linalg.norm(jax.nn.softmax(mask1, axis=1), axis=-1),
            "point_cloud": x1_1,
        }
        return pose_params, aux


def params_to_pose_matrix(params: jax.Array) -> jax.Array:
    """``(..., 7)`` = (t, q_wxyz) → ``(..., 4, 4)`` for the finest level."""
    from pwclonet_pylidarslam_tpu.core import se3

    return se3.params_to_pose_quat(params)
