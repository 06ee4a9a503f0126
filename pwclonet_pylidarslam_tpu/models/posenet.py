"""PoseResNet: CNN pose regression over stacked vertex-map pairs.

Flax port of ref ``slam/models/posenet.py`` + ``_resnet.py``: a ResNet-18/34
style encoder (BasicBlock) over the channel-concatenated vertex maps of a
frame pair, global average pool, and separate linear heads — rotation scaled
by 0.1 for training stability (ref ``posenet.py:71``), both heads initialized
near zero so the initial prediction is ≈ identity.

Layout: channel-last ``(B, H, W, C)`` vertex maps; input = concat of
``sequence_len`` frames → ``C = 3·seq``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

small_init = nn.initializers.variance_scaling(0.01, "fan_avg", "uniform")


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False)(residual)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """5-stage encoder returning the last feature map (ref ``_resnet.py:49-143``)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # ResNet-18
    features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, (blocks, feats) in enumerate(zip(self.stage_sizes, self.features)):
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = BasicBlock(feats, strides)(x, train=train)
        return x


@dataclasses.dataclass(frozen=True)
class PoseResNetConfig:
    sequence_len: int = 2
    num_input_channels: int = 3
    num_out_poses: int = 1
    resnet_model: int = 18  # 18 or 34
    rotation_scale: float = 0.1  # ref posenet.py:71


class PoseResNet(nn.Module):
    """``__call__(frames (B, seq, H, W, C))`` → euler pose params
    ``(B, num_out_poses, 6)`` = (t, euler-xyz)."""

    config: PoseResNetConfig = PoseResNetConfig()

    @nn.compact
    def __call__(self, frames, train: bool = False):
        cfg = self.config
        b, seq, h, w, c = frames.shape
        assert seq == cfg.sequence_len
        x = jnp.transpose(frames, (0, 2, 3, 1, 4)).reshape(b, h, w, seq * c)
        stages = (2, 2, 2, 2) if cfg.resnet_model == 18 else (3, 4, 6, 3)
        feats = ResNetEncoder(stage_sizes=stages)(x, train=train)
        pooled = jnp.mean(feats, axis=(1, 2))  # global average pool
        rot = cfg.rotation_scale * nn.Dense(
            3 * cfg.num_out_poses, use_bias=False, kernel_init=small_init
        )(pooled)
        trans = nn.Dense(3 * cfg.num_out_poses, kernel_init=small_init)(pooled)
        params = jnp.concatenate(
            [trans.reshape(b, cfg.num_out_poses, 3), rot.reshape(b, cfg.num_out_poses, 3)],
            axis=-1,
        )
        return params
