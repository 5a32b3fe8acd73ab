"""EfficientNet-B0 embedding backbone in Flax (NHWC).

Capability parity with the reference's torchvision efficientnet_b0 with the
classifier swapped to a FEATURE_DIM embedding
(reference: main_code/utils/backbones.py:20-22). MBConv + squeeze-excite +
SiLU + stochastic depth, bf16 compute.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _round_channels(c: float, divisor: int = 8) -> int:
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


# (expand_ratio, out_channels, repeats, first_stride, kernel)
_B0_SETTINGS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class SqueezeExcite(nn.Module):
    se_channels: int
    conv: Any

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = self.conv(self.se_channels, (1, 1), use_bias=True, name="reduce")(s)
        s = nn.silu(s)
        s = self.conv(c, (1, 1), use_bias=True, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    kernel: int
    drop_path: float
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        hidden = in_channels * self.expand_ratio
        use_skip = self.stride == 1 and in_channels == self.out_channels
        pad = self.kernel // 2

        y = x
        if self.expand_ratio != 1:
            y = self.conv(hidden, (1, 1), name="expand")(y)
            y = self.norm(name="expand_bn")(y)
            y = nn.silu(y)
        y = self.conv(hidden, (self.kernel, self.kernel),
                      strides=(self.stride, self.stride),
                      padding=[(pad, pad), (pad, pad)],
                      feature_group_count=hidden, name="depthwise")(y)
        y = self.norm(name="depthwise_bn")(y)
        y = nn.silu(y)
        # SE squeeze ratio is 0.25 of the block *input* channels.
        y = SqueezeExcite(se_channels=max(1, in_channels // 4),
                          conv=partial(self.conv), name="se")(y)
        y = self.conv(self.out_channels, (1, 1), name="project")(y)
        y = self.norm(name="project_bn")(y)

        if use_skip:
            if train and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
                y = jnp.where(mask, y / keep, 0.0).astype(y.dtype)
            y = x + y
        return y


class EfficientNetB0(nn.Module):
    embed_dim: int = 512
    dropout_rate: float = 0.2
    stochastic_depth: float = 0.2
    dtype: Any = jnp.bfloat16
    # BN normalize/affine compute dtype; statistics reduce in fp32 either
    # way (flax force_float32_reductions). See models/resnet.py bn_dtype.
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(
                f"Expected NHWC input [N, H, W, 3], got {x.shape}. "
                "(PyTorch-style NCHW must be transposed.)")
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        # torchvision's efficientnet_b0 uses default BatchNorm2d eps=1e-5
        # (not the TF original's 1e-3); match it so ported ImageNet weights
        # (utils/torch_port.py) are numerically faithful.
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.bn_dtype,
                       param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                 name="stem")(x)
        x = norm(name="stem_bn")(x)
        x = nn.silu(x).astype(self.dtype)

        total_blocks = sum(s[2] for s in _B0_SETTINGS)
        block_idx = 0
        for i, (t, ch, n, s, k) in enumerate(_B0_SETTINGS):
            for j in range(n):
                drop_path = self.stochastic_depth * block_idx / total_blocks
                x = MBConv(out_channels=ch, stride=s if j == 0 else 1,
                           expand_ratio=t, kernel=k, drop_path=drop_path,
                           conv=conv, norm=norm,
                           name=f"block{i}_{j}")(x, train=train)
                x = x.astype(self.dtype)
                block_idx += 1

        x = conv(1280, (1, 1), name="head")(x)
        x = norm(name="head_bn")(x)
        x = nn.silu(x).astype(self.dtype)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(x)
        return x


def efficientnet_b0(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
                    bn_dtype: Any = jnp.float32) -> EfficientNetB0:
    return EfficientNetB0(embed_dim=embed_dim, dtype=dtype,
                          bn_dtype=bn_dtype)
