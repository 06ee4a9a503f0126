"""PointNet++-style set conv / set upconv modules.

Channel-last Flax re-designs of the reference module family:

- ``SetConv`` / ``SetUpConv`` — the PWCLO-Net variants
  (``pointnet2_modules.PointnetSAModulePWCLONet``, ref
  ``pointnet2_modules.py:159-248``: FPS sampling + kNN grouping + xyz-diff
  concat + shared MLP + max-pool; ``PointnetFPModulePWCLONet`` ref
  ``:410-515``: kNN set-upconv + MLP + max-pool + skip concat + post MLP).
- ``SetConvMSG`` — the upstream multi-scale ball-query set abstraction
  (``PointnetSAModuleMSG`` ref ``:87-126`` and its single-scale / group-all
  wrapper ``PointnetSAModule`` ref ``:127-156``; grouping semantics of
  ``QueryAndGroup``/``GroupAll`` ref ``pointnet2_utils.py:279-465``).
- ``FeaturePropagation`` — upstream 3-NN inverse-distance interpolation FP
  (``PointnetFPModule`` ref ``pointnet2_modules.py:249-327``).
- ``LFPModuleMSG`` — learnable multi-scale feature propagation
  (``PointnetLFPModuleMSG`` ref ``:329-408``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pwclonet_pylidarslam_tpu import ops
from pwclonet_pylidarslam_tpu.models.layers import PointMLP


class SetConv(nn.Module):
    """Set abstraction: FPS to ``npoint`` centers, kNN group, MLP, max-pool.

    ``__call__(xyz (B,N,3), features (B,N,C) or None)`` →
    ``(new_xyz (B,npoint,3), new_features (B,npoint,mlp[-1]))``.
    """

    npoint: int
    nsample: int
    mlp: Sequence[int]
    approx_knn: bool = True  # lax.approx_min_k on TPU (≥98% recall, ~free)
    dtype: Optional[jnp.dtype] = None
    fused_eval: bool = False  # eval mode: one Pallas kernel for MLP+maxpool

    @nn.compact
    def __call__(self, xyz, features, train: bool, bn_momentum=0.1):
        idx = ops.furthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather_points(xyz, idx)  # (B, npoint, 3)
        _, nn_idx = ops.knn(new_xyz, xyz, self.nsample, approx=self.approx_knn)
        if features is not None:
            # ONE gather for xyz+features (per-row-cost op; see gather.py)
            grouped_xyz, grouped_feat = ops.group_points_multi(nn_idx, xyz, features)
            xyz_diff = grouped_xyz - new_xyz[:, :, None, :]
            x = jnp.concatenate([xyz_diff, grouped_feat], axis=-1)
        else:
            # first level: concat raw grouped xyz (ref pointnet2_modules.py:234)
            grouped_xyz = ops.group_points(xyz, nn_idx)
            xyz_diff = grouped_xyz - new_xyz[:, :, None, :]
            x = jnp.concatenate([xyz_diff, grouped_xyz], axis=-1)
        x = PointMLP(tuple(self.mlp), dtype=self.dtype)(
            x, train=train, bn_momentum=bn_momentum, maxpool=True, fused=self.fused_eval
        )
        return new_xyz, x


class SetUpConv(nn.Module):
    """Feature propagation coarse → fine by kNN set-upconv.

    ``__call__(fine_xyz (B,Nf,3), coarse_xyz (B,Nc,3), fine_feat (B,Nf,Cf),
    coarse_feat (B,Nc,Cc))`` → ``(B, Nf, post_mlp[-1])``.

    For every fine point: group its ``nsample`` nearest coarse points, concat
    xyz-diff, MLP, max-pool, concat fine skip features, post MLP.
    (Ref ``PointnetFPModulePWCLONet.forward`` with ``knn=True``.)
    """

    nsample: int
    mlp: Sequence[int]
    post_mlp: Sequence[int]
    approx_knn: bool = True
    dtype: Optional[jnp.dtype] = None
    fused_eval: bool = False

    @nn.compact
    def __call__(self, fine_xyz, coarse_xyz, fine_feat, coarse_feat, train: bool, bn_momentum=0.1):
        _, nn_idx = ops.knn(fine_xyz, coarse_xyz, self.nsample, approx=self.approx_knn)
        grouped_feat, grouped_xyz = ops.group_points_multi(
            nn_idx, coarse_feat, coarse_xyz
        )  # one gather (per-row-cost op; see gather.py)
        xyz_diff = grouped_xyz - fine_xyz[:, :, None, :]
        x = jnp.concatenate([grouped_feat, xyz_diff], axis=-1)
        x = PointMLP(tuple(self.mlp), dtype=self.dtype)(
            x, train=train, bn_momentum=bn_momentum, maxpool=True, fused=self.fused_eval
        )  # (B, Nf, mlp[-1])
        if fine_feat is not None:
            x = jnp.concatenate([x, fine_feat], axis=-1)
        x = PointMLP(tuple(self.post_mlp), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
        return x


def _ball_group(xyz, new_xyz, features, radius: float, nsample: int, use_xyz: bool):
    """``QueryAndGroup`` semantics (ref ``pointnet2_utils.py:279-334``):
    ball-query ``nsample`` neighbors of each center, center the grouped xyz,
    concat features. → ``(B, M, nsample, 3·use_xyz + C)``."""
    idx = ops.ball_query(new_xyz, xyz, radius, nsample)
    if features is not None:
        grouped_xyz, grouped_feat = ops.group_points_multi(idx, xyz, features)
        grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
        return grouped_feat
    return ops.group_points(xyz, idx) - new_xyz[:, :, None, :]


class SetConvMSG(nn.Module):
    """Multi-scale-grouping set abstraction (upstream ``PointnetSAModuleMSG``,
    ref ``pointnet2_modules.py:87-126``).

    ``npoint=None`` is the global / group-all mode of ``PointnetSAModule``
    (ref ``:127-156`` + ``GroupAll`` ref ``pointnet2_utils.py:421-465``):
    one center, all points grouped uncentered.

    ``__call__(xyz (B,N,3), features (B,N,C) or None)`` →
    ``(new_xyz (B,npoint or 1,3), new_features (B,npoint or 1,Σ mlps[i][-1]))``.
    """

    npoint: Optional[int]
    radii: Sequence[Optional[float]]
    nsamples: Sequence[Optional[int]]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, features, train: bool, bn_momentum=0.1):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if self.npoint is not None:
            idx = ops.furthest_point_sample(xyz, self.npoint)
            new_xyz = ops.gather_points(xyz, idx)
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            if self.npoint is not None:
                x = _ball_group(xyz, new_xyz, features, radius, nsample, self.use_xyz)
            else:
                # GroupAll: every point in one uncentered neighborhood
                x = xyz[:, None] if features is None or self.use_xyz else None
                if features is not None:
                    f = features[:, None]
                    x = f if x is None else jnp.concatenate([x, f], axis=-1)
            x = PointMLP(tuple(mlp), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
            outs.append(jnp.max(x, axis=-2))  # max over the sample axis
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance feature propagation (upstream
    ``PointnetFPModule``, ref ``pointnet2_modules.py:249-327``).

    ``__call__(unknown (B,n,3), known (B,m,3) or None, unknown_feat (B,n,C1)
    or None, known_feat (B,m,C2))`` → ``(B, n, mlp[-1])``. ``known=None``
    broadcasts a global feature to every unknown point.
    """

    mlp: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, unknown, known, unknown_feat, known_feat, train: bool, bn_momentum=0.1):
        if known is not None:
            sqdist, idx = ops.three_nn(unknown, known)
            interpolated = ops.three_interpolate(known_feat, idx, sqdist)
        else:
            interpolated = jnp.broadcast_to(
                known_feat, (known_feat.shape[0], unknown.shape[1], known_feat.shape[-1])
            )
        x = interpolated
        if unknown_feat is not None:
            x = jnp.concatenate([interpolated, unknown_feat], axis=-1)
        return PointMLP(tuple(self.mlp), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)


class LFPModuleMSG(nn.Module):
    """Learnable multi-scale feature propagation from set 1 to set 2
    (upstream ``PointnetLFPModuleMSG``, ref ``pointnet2_modules.py:329-408``):
    per scale, ball-group set-1 features around set-2 centers, MLP, max-pool,
    concat the set-2 skip features, shared post-MLP; concat scales.

    ``__call__(xyz2 (B,N2,3), xyz1 (B,N1,3), feat2 (B,N2,C2) or None,
    feat1 (B,N1,C1))`` → ``(B, N2, len(radii)·post_mlp[-1])``.
    """

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    post_mlp: Sequence[int]
    use_xyz: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz2, xyz1, feat2, feat1, train: bool, bn_momentum=0.1):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        post = PointMLP(tuple(self.post_mlp), dtype=self.dtype)  # shared across scales (ref :348)
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            x = _ball_group(xyz1, xyz2, feat1, radius, nsample, self.use_xyz)
            x = PointMLP(tuple(mlp), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
            x = jnp.max(x, axis=-2)  # (B, N2, mlp[-1])
            if feat2 is not None:
                x = jnp.concatenate([x, feat2], axis=-1)
            outs.append(post(x, train=train, bn_momentum=bn_momentum))
        return jnp.concatenate(outs, axis=-1)
