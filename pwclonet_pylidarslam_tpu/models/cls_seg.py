"""PointNet++ classification / semantic-segmentation heads.

Model family of the reference's vendored upstream package
(``Pointnet2_PyTorch/pointnet2/models/pointnet2_{ssg,msg}_{cls,sem}.py``,
inventoried in SURVEY §2.3 "upstream Pointnet2 demo pkg"), rebuilt
channel-last on the TPU-native :mod:`models.pointnet2` modules. Default
channel plans follow the upstream SSG/MSG recipes so a user of the reference
finds the same model zoo; everything is fixed-shape and jits on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pwclonet_pylidarslam_tpu.models.layers import PointMLP
from pwclonet_pylidarslam_tpu.models.pointnet2 import FeaturePropagation, SetConvMSG


@dataclass(frozen=True)
class SAStage:
    """One set-abstraction stage (single- or multi-scale)."""

    npoint: Optional[int]
    radii: Tuple[Optional[float], ...]
    nsamples: Tuple[Optional[int], ...]
    mlps: Tuple[Tuple[int, ...], ...]


# upstream SSG classification plan (pointnet2_ssg_cls.py)
CLS_SSG: Tuple[SAStage, ...] = (
    SAStage(512, (0.2,), (64,), ((64, 64, 128),)),
    SAStage(128, (0.4,), (64,), ((128, 128, 256),)),
    SAStage(None, (None,), (None,), ((256, 512, 1024),)),
)

# upstream MSG classification plan (pointnet2_msg_cls.py)
CLS_MSG: Tuple[SAStage, ...] = (
    SAStage(
        512,
        (0.1, 0.2, 0.4),
        (16, 32, 128),
        ((32, 32, 64), (64, 64, 128), (64, 96, 128)),
    ),
    SAStage(
        128,
        (0.2, 0.4, 0.8),
        (32, 64, 128),
        ((64, 64, 128), (128, 128, 256), (128, 128, 256)),
    ),
    SAStage(None, (None,), (None,), ((256, 512, 1024),)),
)

# upstream SSG semantic-segmentation plan (pointnet2_ssg_sem.py)
SEM_SSG: Tuple[SAStage, ...] = (
    SAStage(1024, (0.1,), (32,), ((32, 32, 64),)),
    SAStage(256, (0.2,), (32,), ((64, 64, 128),)),
    SAStage(64, (0.4,), (32,), ((128, 128, 256),)),
    SAStage(16, (0.8,), (32,), ((256, 256, 512),)),
)


class PointNet2Classification(nn.Module):
    """Shape classifier: SA stages → global feature → MLP head.

    ``__call__(xyz (B,N,3), features (B,N,C) or None)`` → logits
    ``(B, num_classes)``.
    """

    num_classes: int
    stages: Sequence[SAStage] = CLS_SSG
    head: Sequence[int] = (512, 256)
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, features=None, *, train: bool, bn_momentum=0.1):
        for stage in self.stages:
            xyz, features = SetConvMSG(
                npoint=stage.npoint,
                radii=stage.radii,
                nsamples=stage.nsamples,
                mlps=stage.mlps,
                dtype=self.dtype,
            )(xyz, features, train=train, bn_momentum=bn_momentum)
        x = features[:, 0]  # (B, C) global descriptor
        for width in self.head:
            x = PointMLP((width,), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


class PointNet2Segmentation(nn.Module):
    """Per-point semantic segmentation: SA encoder + FP decoder.

    ``__call__(xyz (B,N,3), features (B,N,C) or None)`` → logits
    ``(B, N, num_classes)``.
    """

    num_classes: int
    stages: Sequence[SAStage] = SEM_SSG
    fp_width: int = 256
    head_width: int = 128
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, features=None, *, train: bool, bn_momentum=0.1):
        xyzs = [xyz]
        feats = [features]
        for stage in self.stages:
            xyz, features = SetConvMSG(
                npoint=stage.npoint,
                radii=stage.radii,
                nsamples=stage.nsamples,
                mlps=stage.mlps,
                dtype=self.dtype,
            )(xyz, features, train=train, bn_momentum=bn_momentum)
            xyzs.append(xyz)
            feats.append(features)
        # decoder: propagate coarse → fine (upstream FP stack, widths 256…128)
        x = feats[-1]
        for level in range(len(self.stages) - 1, -1, -1):
            width = self.fp_width if level > 0 else self.head_width
            x = FeaturePropagation((width, width), dtype=self.dtype)(
                xyzs[level], xyzs[level + 1], feats[level], x,
                train=train, bn_momentum=bn_momentum,
            )
        x = PointMLP((self.head_width,), dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
