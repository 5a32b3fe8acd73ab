"""iResNet (improved ResNet) embedding backbones in Flax (NHWC, bf16).

Beyond-reference model family: the de-facto production trunk for margin-
softmax face recognition (the "LResNet/IR" architecture popularized by the
ArcFace paper and insightface's arcface_torch `iresnet.py`). Differences
from the torchvision ResNet the reference uses (backbones.py:11-18):

- 3x3/s1 stem at 112px (no 7x7, no maxpool) — every stage downsamples 2x,
  so 112 -> 56 -> 28 -> 14 -> 7;
- BN-first basic blocks: BN -> conv3x3 -> BN -> PReLU -> conv3x3(stride)
  -> BN, residual added WITHOUT a trailing ReLU;
- per-channel PReLU activations;
- head: BN2d -> flatten(7*7*512) -> Dense(embed) -> BatchNorm1d with the
  scale frozen at 1 (bias trainable), fp32 output.

TPU-native implementation: NHWC layout, bf16 conv compute on the MXU,
fp32 BatchNorm statistics (bn_dtype controls the normalize/affine compute
dtype, as in models/resnet.py). Weight layout is compatible with
`utils/torch_port.port_iresnet` so insightface torch checkpoints load
(flatten order is permuted CHW -> HWC inside the port).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(C) semantics; flax's PReLU is a
    single shared scalar). The slope parameter is fp32; math runs in the
    input dtype."""

    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,), jnp.float32)
        a = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class IBasicBlock(nn.Module):
    """BN -> conv3x3 -> BN -> PReLU -> conv3x3(stride) -> BN + shortcut."""

    filters: int
    stride: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.norm(name="bn1")(x).astype(self.dtype)
        y = self.conv(self.filters, (3, 3), strides=(1, 1),
                      padding=[(1, 1), (1, 1)], name="conv1")(y)
        y = self.norm(name="bn2")(y)
        y = PReLU(self.filters, name="prelu")(y).astype(self.dtype)
        y = self.conv(self.filters, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn3")(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1),
                                 strides=(self.stride, self.stride),
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)

        return (y + residual).astype(self.dtype)


class IResNet(nn.Module):
    """iResNet trunk -> BN -> flatten -> Dense(embed) -> feature BN."""

    stage_sizes: Sequence[int]
    embed_dim: int = 512
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32
    dropout_rate: float = 0.0  # arcface_torch default p=0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(
                f"Expected NHWC input [N, H, W, 3], got {x.shape}. "
                "(PyTorch-style NCHW must be transposed.)")
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.bn_dtype,
                       param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = conv(self.num_filters, (3, 3), strides=(1, 1),
                 padding=[(1, 1), (1, 1)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = PReLU(self.num_filters, name="prelu")(x).astype(self.dtype)

        for i, num_blocks in enumerate(self.stage_sizes):
            for j in range(num_blocks):
                # every stage opens with a stride-2 block (112px -> 7px)
                stride = 2 if j == 0 else 1
                x = IBasicBlock(filters=self.num_filters * 2 ** i,
                                stride=stride, conv=conv, norm=norm,
                                dtype=self.dtype,
                                name=f"layer{i + 1}_{j}")(x)

        x = norm(name="bn2")(x)
        n = x.shape[0]
        x = x.reshape(n, -1)  # NHWC flatten; the torch port permutes fc
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(x)
        # feature BatchNorm1d with scale frozen at 1 (insightface trains
        # bias only); fp32 output like every other backbone's embedding
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_scale=False, use_bias=True,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="features")(x.astype(jnp.float32))
        return x


def iresnet18(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
              bn_dtype: Any = jnp.float32) -> IResNet:
    return IResNet(stage_sizes=(2, 2, 2, 2), embed_dim=embed_dim,
                   dtype=dtype, bn_dtype=bn_dtype)


def iresnet50(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
              bn_dtype: Any = jnp.float32) -> IResNet:
    return IResNet(stage_sizes=(3, 4, 14, 3), embed_dim=embed_dim,
                   dtype=dtype, bn_dtype=bn_dtype)


def iresnet100(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
               bn_dtype: Any = jnp.float32) -> IResNet:
    return IResNet(stage_sizes=(3, 13, 30, 5), embed_dim=embed_dim,
                   dtype=dtype, bn_dtype=bn_dtype)
