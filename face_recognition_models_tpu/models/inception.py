"""Inception-v3 embedding backbone in Flax (NHWC, bf16-friendly).

The reference's FaceNet EmbeddingNet defaults to a torchvision Inception-v3
trunk with the classifier swapped for a 128-d embedding layer
(FaceNet/main.py:15-34); round 1 shipped only the ResNet-50 alternative.
This follows the torchvision v3 graph (module names match torchvision's so
state_dicts can be ported later), minus the train-time aux classifier —
the reference never uses aux logits for embeddings either. BatchNorm uses
torchvision's eps=1e-3 and runs fp32; convs run bf16 on the MXU.

Works for inputs >= 75 px (the reference feeds 112x112 crops; global
average pooling absorbs the spatial size).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3) + relu (torchvision BasicConv2d)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.bn_dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x).astype(self.dtype)


def _avg_pool_same(x):
    """3x3 stride-1 average pool, padding 1, count_include_pad=True
    (torch default) — plain mean over the padded window."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                       count_include_pad=True)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = partial(BasicConv2d, dtype=self.dtype, bn_dtype=self.bn_dtype)
        b1 = c(64, (1, 1), name="branch1x1")(x, train)
        b5 = c(48, (1, 1), name="branch5x5_1")(x, train)
        b5 = c(64, (5, 5), padding=[(2, 2), (2, 2)],
               name="branch5x5_2")(b5, train)
        b3 = c(64, (1, 1), name="branch3x3dbl_1")(x, train)
        b3 = c(96, (3, 3), padding=[(1, 1), (1, 1)],
               name="branch3x3dbl_2")(b3, train)
        b3 = c(96, (3, 3), padding=[(1, 1), (1, 1)],
               name="branch3x3dbl_3")(b3, train)
        bp = c(self.pool_features, (1, 1),
               name="branch_pool")(_avg_pool_same(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = partial(BasicConv2d, dtype=self.dtype, bn_dtype=self.bn_dtype)
        b3 = c(384, (3, 3), strides=(2, 2), name="branch3x3")(x, train)
        bd = c(64, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = c(96, (3, 3), padding=[(1, 1), (1, 1)],
               name="branch3x3dbl_2")(bd, train)
        bd = c(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = partial(BasicConv2d, dtype=self.dtype, bn_dtype=self.bn_dtype)
        c7 = self.channels_7x7
        p17, p71 = [(0, 0), (3, 3)], [(3, 3), (0, 0)]
        b1 = c(192, (1, 1), name="branch1x1")(x, train)
        b7 = c(c7, (1, 1), name="branch7x7_1")(x, train)
        b7 = c(c7, (1, 7), padding=p17, name="branch7x7_2")(b7, train)
        b7 = c(192, (7, 1), padding=p71, name="branch7x7_3")(b7, train)
        bd = c(c7, (1, 1), name="branch7x7dbl_1")(x, train)
        bd = c(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd, train)
        bd = c(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd, train)
        bd = c(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd, train)
        bd = c(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd, train)
        bp = c(192, (1, 1), name="branch_pool")(_avg_pool_same(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = partial(BasicConv2d, dtype=self.dtype, bn_dtype=self.bn_dtype)
        p17, p71 = [(0, 0), (3, 3)], [(3, 3), (0, 0)]
        b3 = c(192, (1, 1), name="branch3x3_1")(x, train)
        b3 = c(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3, train)
        b7 = c(192, (1, 1), name="branch7x7x3_1")(x, train)
        b7 = c(192, (1, 7), padding=p17, name="branch7x7x3_2")(b7, train)
        b7 = c(192, (7, 1), padding=p71, name="branch7x7x3_3")(b7, train)
        b7 = c(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = partial(BasicConv2d, dtype=self.dtype, bn_dtype=self.bn_dtype)
        p13, p31 = [(0, 0), (1, 1)], [(1, 1), (0, 0)]
        b1 = c(320, (1, 1), name="branch1x1")(x, train)
        b3 = c(384, (1, 1), name="branch3x3_1")(x, train)
        b3 = jnp.concatenate([
            c(384, (1, 3), padding=p13, name="branch3x3_2a")(b3, train),
            c(384, (3, 1), padding=p31, name="branch3x3_2b")(b3, train),
        ], axis=-1)
        bd = c(448, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = c(384, (3, 3), padding=[(1, 1), (1, 1)],
               name="branch3x3dbl_2")(bd, train)
        bd = jnp.concatenate([
            c(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd, train),
            c(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd, train),
        ], axis=-1)
        bp = c(192, (1, 1), name="branch_pool")(_avg_pool_same(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Torchvision Inception-v3 trunk -> global avg pool -> Dense(embed)."""

    embed_dim: int = 128
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(
                f"Expected NHWC input [N, H, W, 3], got {x.shape}.")
        if x.shape[1] < 75 or x.shape[2] < 75:
            raise ValueError(
                f"Inception-v3 needs inputs >= 75 px, got {x.shape}.")
        c = partial(BasicConv2d, dtype=self.dtype, bn_dtype=self.bn_dtype)
        x = x.astype(self.dtype)
        x = c(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x, train)
        x = c(32, (3, 3), name="Conv2d_2a_3x3")(x, train)
        x = c(64, (3, 3), padding=[(1, 1), (1, 1)],
              name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = c(80, (1, 1), name="Conv2d_3b_1x1")(x, train)
        x = c(192, (3, 3), name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        x = InceptionA(32, dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_5b")(x, train)
        x = InceptionA(64, dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_5c")(x, train)
        x = InceptionA(64, dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_5d")(x, train)
        x = InceptionB(dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_6a")(x, train)
        x = InceptionC(128, dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_6b")(x, train)
        x = InceptionC(160, dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_6c")(x, train)
        x = InceptionC(160, dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_6d")(x, train)
        x = InceptionC(192, dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_6e")(x, train)
        x = InceptionD(dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_7a")(x, train)
        x = InceptionE(dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_7b")(x, train)
        x = InceptionE(dtype=self.dtype, bn_dtype=self.bn_dtype, name="Mixed_7c")(x, train)

        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 2048]
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc")(x)


def inception_v3(embed_dim: int = 512,
                 dtype: Any = jnp.bfloat16,
                 bn_dtype: Any = jnp.float32) -> InceptionV3:
    return InceptionV3(embed_dim=embed_dim, dtype=dtype, bn_dtype=bn_dtype)
