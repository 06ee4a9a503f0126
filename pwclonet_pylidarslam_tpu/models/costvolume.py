"""Attentive cost volume ("double attentive embedding" for point mixture).

Channel-last Flax re-design of ref ``slam/models/PWCLONet/costvolume.py:19-190``:

1. **Cross-frame aggregate**: for each (warped) F1 point, kNN(``nsample_q``)
   in F2; concat the 10-d spatial encoding with both feature sets → MLP1 →
   first flow embedding; attention weights from MLP2 over [FC(spatial), emb],
   softmax over the k neighbors → weighted sum.
2. **Self aggregate**: kNN(``nsample``) of F1 in itself; second attention from
   MLP3 over [FC(spatial), F1 features, grouped embeddings] → weighted sum of
   the grouped first embeddings.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pwclonet_pylidarslam_tpu import ops
from pwclonet_pylidarslam_tpu.models.layers import PointMLP, spatial_encoding


class CostVolume(nn.Module):
    nsample: int = 4  # self-aggregation neighborhood
    nsample_q: int = 32  # cross-frame neighborhood
    mlp1: Sequence[int] = (128, 64, 64)
    mlp2: Sequence[int] = (128, 64)
    approx_knn: bool = True
    dtype: "jnp.dtype | None" = None
    # eval mode: run each attentive aggregate as ONE Pallas kernel (BN folded,
    # spatial encoding + MLPs + softmax + weighted sum all in VMEM)
    fused_eval: bool = False

    @nn.compact
    def __call__(self, xyz1, feat1, xyz2, feat2, train: bool, bn_momentum=0.1):
        """``xyz1/feat1 (B,S,3)/(B,S,C1)`` (warped F1), ``xyz2/feat2`` (F2)
        → flow embedding ``(B, S, mlp2[-1])``."""
        # module instances in a FIXED order so the fused path creates the
        # identical variable tree (names by creation order)
        m_emb = PointMLP(tuple(self.mlp1), dtype=self.dtype)
        m_enc1 = PointMLP((self.mlp1[-1],), dtype=self.dtype)
        m_att1 = PointMLP(tuple(self.mlp2), dtype=self.dtype)
        m_enc2 = PointMLP((self.mlp1[-1],), dtype=self.dtype)
        m_att2 = PointMLP(tuple(self.mlp2), dtype=self.dtype)

        use_fused = (
            self.fused_eval and not train and not self.is_initializing()
        )

        # ---- first (cross-frame) attentive aggregate
        _, idx_q = ops.knn(xyz1, xyz2, self.nsample_q, approx=self.approx_knn)
        # one fused gather for xyz+features (per-row-cost op; see gather.py)
        q_xyz, q_feat = ops.group_points_multi(idx_q, xyz2, feat2)

        if use_fused:
            from pwclonet_pylidarslam_tpu.ops.pallas.costvolume_kernel import (
                attentive_aggregate_pallas,
            )

            c1 = feat1.shape[-1]
            d_enc = jnp.zeros((1, 10), jnp.float32)
            emb_wb = m_emb(
                jnp.zeros((1, 10 + c1 + q_feat.shape[-1]), jnp.float32),
                train=False, fold_only=True,
            )
            enc1_wb = m_enc1(d_enc, train=False, fold_only=True)
            att1_wb = m_att1(
                jnp.zeros((1, self.mlp1[-1] * 2), jnp.float32),
                train=False, fold_only=True,
            )
            first = attentive_aggregate_pallas(
                xyz1, q_xyz, feat1, q_feat,
                enc1_wb, emb_wb, att1_wb, att_includes_center=False,
            )
        else:
            enc = spatial_encoding(xyz1, q_xyz)  # (B, S, Kq, 10)
            p_feat = jnp.broadcast_to(
                feat1[:, :, None, :], q_feat.shape[:3] + (feat1.shape[-1],)
            )
            emb = m_emb(
                jnp.concatenate([enc, p_feat, q_feat], axis=-1),
                train=train, bn_momentum=bn_momentum,
            )  # (B, S, Kq, mlp1[-1])
            enc1 = m_enc1(enc, train=train, bn_momentum=bn_momentum)
            wq = m_att1(
                jnp.concatenate([enc1, emb], axis=-1), train=train, bn_momentum=bn_momentum
            )
            wq = jax.nn.softmax(wq, axis=-2)  # attention over the Kq neighbors
            first = jnp.sum(wq * emb, axis=-2)  # (B, S, mlp1[-1])

        # ---- second (self) attentive aggregate
        _, idx_s = ops.knn(xyz1, xyz1, self.nsample, approx=self.approx_knn)
        s_xyz, s_emb = ops.group_points_multi(idx_s, xyz1, first)

        if use_fused:
            enc2_wb = m_enc2(d_enc, train=False, fold_only=True)
            att2_wb = m_att2(
                jnp.zeros(
                    (1, self.mlp1[-1] + feat1.shape[-1] + self.mlp1[-1]),
                    jnp.float32,
                ),
                train=False, fold_only=True,
            )
            return attentive_aggregate_pallas(
                xyz1, s_xyz, feat1, s_emb,
                enc2_wb, None, att2_wb, att_includes_center=True,
            )

        enc_s = spatial_encoding(xyz1, s_xyz)
        enc2 = m_enc2(enc_s, train=train, bn_momentum=bn_momentum)
        p_feat_s = jnp.broadcast_to(
            feat1[:, :, None, :], s_emb.shape[:3] + (feat1.shape[-1],)
        )
        wp = m_att2(
            jnp.concatenate([enc2, p_feat_s, s_emb], axis=-1),
            train=train, bn_momentum=bn_momentum,
        )
        wp = jax.nn.softmax(wp, axis=-2)
        return jnp.sum(wp * s_emb, axis=-2)  # (B, S, mlp2[-1])
