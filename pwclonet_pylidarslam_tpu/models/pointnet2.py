"""PointNet++-style set conv / set upconv modules (PWCLO-Net variants).

Channel-last Flax re-designs of ``pointnet2_modules.PointnetSAModulePWCLONet``
(ref ``pointnet2_modules.py:159-248``: FPS sampling + kNN grouping + xyz-diff
concat + shared MLP + max-pool) and ``PointnetFPModulePWCLONet``
(ref ``:410-515``: kNN set-upconv + MLP + max-pool + skip concat + post MLP).
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

    @nn.compact
    def __call__(self, xyz, features, train: bool, bn_momentum=0.1):
        idx = ops.furthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather_points(xyz, idx)  # (B, npoint, 3)
        _, nn_idx = ops.knn(new_xyz, xyz, self.nsample, approx=self.approx_knn)
        grouped_xyz = ops.group_points(xyz, nn_idx)  # (B, npoint, K, 3)
        xyz_diff = grouped_xyz - new_xyz[:, :, None, :]
        if features is not None:
            grouped_feat = ops.group_points(features, nn_idx)
            x = jnp.concatenate([xyz_diff, grouped_feat], axis=-1)
        else:
            # first level: concat raw grouped xyz (ref pointnet2_modules.py:234)
            x = jnp.concatenate([xyz_diff, grouped_xyz], axis=-1)
        x = PointMLP(tuple(self.mlp), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
        return new_xyz, jnp.max(x, axis=-2)


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

    @nn.compact
    def __call__(self, fine_xyz, coarse_xyz, fine_feat, coarse_feat, train: bool, bn_momentum=0.1):
        _, nn_idx = ops.knn(fine_xyz, coarse_xyz, self.nsample, approx=self.approx_knn)
        grouped_feat = ops.group_points(coarse_feat, nn_idx)  # (B, Nf, K, Cc)
        grouped_xyz = ops.group_points(coarse_xyz, nn_idx)
        xyz_diff = grouped_xyz - fine_xyz[:, :, None, :]
        x = jnp.concatenate([grouped_feat, xyz_diff], axis=-1)
        x = PointMLP(tuple(self.mlp), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
        x = jnp.max(x, axis=-2)  # (B, Nf, mlp[-1])
        if fine_feat is not None:
            x = jnp.concatenate([x, fine_feat], axis=-1)
        x = PointMLP(tuple(self.post_mlp), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
        return x
