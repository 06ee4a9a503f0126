"""PoseResNet: CNN pose regression over stacked vertex-map pairs.

Flax port of ref ``slam/models/posenet.py`` + ``_resnet.py``: a
ResNet-18/34/50 encoder (BasicBlock for 18/34, Bottleneck for 50 — ref
``_resnet.py:22-46,125-143``) over the channel-concatenated vertex maps of a
frame pair, global average pool, and separate linear heads — rotation scaled
by 0.1 for training stability (ref ``posenet.py:71``), both heads initialized
near zero so the initial prediction is ≈ identity. Block activation is
pluggable like the reference's ``ACTIVATIONS`` registry
(ref ``layers.py:17-27``).

Layout: channel-last ``(B, H, W, C)`` vertex maps; input = concat of
``sequence_len`` frames → ``C = 3·seq``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

small_init = nn.initializers.variance_scaling(0.01, "fan_avg", "uniform")

# ref slam/models/layers.py:17-27 ACTIVATIONS registry
ACTIVATIONS: dict = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "sin": jnp.sin,
    "sigmoid": nn.sigmoid,
    "softplus": nn.softplus,
}


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = self.activation(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False)(residual)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return self.activation(y + residual)


class Bottleneck(nn.Module):
    """1×1 reduce → 3×3 (strided) → 1×1 expand ×4, torchvision semantics
    (ref ``_resnet.py:30-38`` wraps ``models.Bottleneck``, expansion 4)."""

    features: int  # bottleneck width; output channels = 4 * features
    strides: int = 1
    activation: Callable = nn.relu
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = self.activation(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = self.activation(y)
        y = nn.Conv(self.expansion * self.features, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.expansion * self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False)(residual)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return self.activation(y + residual)


class ResNetEncoder(nn.Module):
    """5-stage encoder returning the last feature map (ref ``_resnet.py:49-143``)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # ResNet-18
    features: Sequence[int] = (64, 128, 256, 512)
    block: type = BasicBlock
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = self.activation(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, (blocks, feats) in enumerate(zip(self.stage_sizes, self.features)):
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = self.block(feats, strides, self.activation)(x, train=train)
        return x


@dataclasses.dataclass(frozen=True)
class PoseResNetConfig:
    sequence_len: int = 2
    num_input_channels: int = 3
    num_out_poses: int = 1
    resnet_model: int = 18  # 18 | 34 | 50 (50 = Bottleneck, ref _resnet.py:125-137)
    activation: str = "relu"  # relu | gelu | sin | sigmoid | softplus
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
        # ref _resnet.py:125-137 model_to_params
        model_to_params = {
            18: ((2, 2, 2, 2), BasicBlock),
            34: ((3, 4, 6, 3), BasicBlock),
            50: ((3, 4, 6, 3), Bottleneck),
        }
        if cfg.resnet_model not in model_to_params:
            raise ValueError(
                f"resnet_model must be one of {sorted(model_to_params)}, "
                f"got {cfg.resnet_model}"
            )
        stages, block = model_to_params[cfg.resnet_model]
        feats = ResNetEncoder(
            stage_sizes=stages, block=block, activation=ACTIVATIONS[cfg.activation]
        )(x, train=train)
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
