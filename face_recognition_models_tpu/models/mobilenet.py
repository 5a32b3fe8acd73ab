"""MobileNet-V2 embedding backbone in Flax (NHWC).

Capability parity with the reference's torchvision mobilenet_v2 with the
classifier swapped to a FEATURE_DIM embedding
(reference: main_code/utils/backbones.py:24-26).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (expand_ratio, out_channels, num_blocks, first_stride)
_MBV2_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        hidden = in_channels * self.expand_ratio
        use_skip = self.stride == 1 and in_channels == self.out_channels

        y = x
        if self.expand_ratio != 1:
            y = self.conv(hidden, (1, 1), name="expand")(y)
            y = self.norm(name="expand_bn")(y)
            y = nn.relu6(y)
        y = self.conv(hidden, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                      name="depthwise")(y)
        y = self.norm(name="depthwise_bn")(y)
        y = nn.relu6(y)
        y = self.conv(self.out_channels, (1, 1), name="project")(y)
        y = self.norm(name="project_bn")(y)
        return x + y if use_skip else y


class MobileNetV2(nn.Module):
    embed_dim: int = 512
    width_mult: float = 1.0
    dropout_rate: float = 0.2
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
        # torchvision's mobilenet_v2 uses default BatchNorm2d eps=1e-5;
        # match it so ported ImageNet weights (utils/torch_port.py) are
        # numerically faithful.
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.bn_dtype,
                       param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        c = _make_divisible(32 * self.width_mult)
        x = conv(c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                 name="stem")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu6(x).astype(self.dtype)

        for i, (t, ch, n, s) in enumerate(_MBV2_SETTINGS):
            out_c = _make_divisible(ch * self.width_mult)
            for j in range(n):
                x = InvertedResidual(out_channels=out_c,
                                     stride=s if j == 0 else 1,
                                     expand_ratio=t, conv=conv, norm=norm,
                                     name=f"block{i}_{j}")(x)
                x = x.astype(self.dtype)

        last_c = _make_divisible(1280 * max(1.0, self.width_mult))
        x = conv(last_c, (1, 1), name="head")(x)
        x = norm(name="head_bn")(x)
        x = nn.relu6(x).astype(self.dtype)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(x)
        return x


def mobilenet_v2(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
                 bn_dtype: Any = jnp.float32) -> MobileNetV2:
    return MobileNetV2(embed_dim=embed_dim, dtype=dtype, bn_dtype=bn_dtype)
