"""MobileFaceNet embedding backbone in Flax (NHWC, bf16 compute).

The standard edge/mobile face-recognition trunk (Chen et al. 2018,
arXiv:1804.07573 — retrieved in PAPERS.md): a MobileNetV2-style inverted-
residual stack specialized for 112x112 faces, with two changes that matter
for face embeddings:

- **PReLU** everywhere instead of ReLU6 (per-channel, like the insightface
  iresnets — models/iresnet.py);
- **GDConv** (global depthwise convolution over the final 7x7 map) instead
  of global average pooling: a learned per-position spatial weighting of
  the face layout, then a LINEAR 1x1 conv + BN to the embedding (no
  activation on the embedding, paper table 1).

Beyond-reference component: the reference's lightest trunk is torchvision
mobilenet_v2 (backbones.py:24-26); MobileFaceNet is ~4x smaller
(~1.0M params at 128-d) and is what production edge deployments of the
ArcFace family actually ship. Follows this repo's backbone conventions:
NHWC only, bf16 compute / fp32 params, fp32 BN statistics with
`bn_dtype`-selectable normalize/affine compute.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from face_recognition_models_tpu.models.iresnet import PReLU
from face_recognition_models_tpu.ops.depthwise import (
    depthwise_conv3x3,
    global_depthwise,
)


class _ShiftDW3x3(nn.Module):
    """Depthwise 3x3 via the ops/depthwise.py shift formulation.

    Same param name ("kernel"), shape ([3, 3, 1, C]) and initializer as
    the nn.Conv it replaces, so checkpoints swap between implementations
    freely; only the lowering differs. Kept as a measured experiment —
    on v5e it is SLOWER than the grouped conv (see dw_impl)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.features), jnp.float32)
        return depthwise_conv3x3(x.astype(self.dtype), kernel,
                                 stride=self.stride)


class _ShiftGDConv(nn.Module):
    """GDConv (full-spatial depthwise) via the einsum formulation."""

    features: int
    hw: tuple
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.hw[0], self.hw[1], 1, self.features), jnp.float32)
        return global_depthwise(x.astype(self.dtype), kernel)

# (expand t, out channels c, blocks n, first stride s) — paper table 1
_MFN_SETTINGS = (
    (2, 64, 5, 2),
    (4, 128, 1, 2),
    (2, 128, 6, 1),
    (4, 128, 1, 2),
    (2, 128, 2, 1),
)


class _Bottleneck(nn.Module):
    """MobileNetV2 inverted residual with PReLU (paper section 3.3)."""

    out_channels: int
    stride: int
    expand_ratio: int
    conv: Any
    dw: Any
    norm: Any
    dtype: Any

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        hidden = in_channels * self.expand_ratio
        use_skip = self.stride == 1 and in_channels == self.out_channels

        y = self.conv(hidden, (1, 1), name="expand")(x)
        y = self.norm(name="expand_bn")(y)
        y = PReLU(hidden, name="expand_prelu")(y.astype(self.dtype))
        y = self.dw(hidden, self.stride, name="depthwise")(y)
        y = self.norm(name="depthwise_bn")(y)
        y = PReLU(hidden, name="depthwise_prelu")(y.astype(self.dtype))
        y = self.conv(self.out_channels, (1, 1), name="project")(y)
        y = self.norm(name="project_bn")(y)
        y = y.astype(self.dtype)
        return x + y if use_skip else y


class MobileFaceNet(nn.Module):
    embed_dim: int = 512
    width_mult: float = 1.0
    dtype: Any = jnp.bfloat16
    # BN normalize/affine compute dtype; statistics reduce in fp32 either
    # way (flax force_float32_reductions). See models/resnet.py bn_dtype.
    bn_dtype: Any = jnp.float32
    # depthwise lowering: "conv" = XLA grouped conv, "shift" = 9
    # elementwise multiply-adds (ops/depthwise.py). Checkpoint-compatible
    # either way (same param names/shapes). Default picked by measurement:
    # on v5e the shift form is 1.9-3x SLOWER fwd+bwd at every hot shape
    # (XLA materializes the 9 padded slices instead of fusing them;
    # scripts/bench_depthwise.py, PERF.md "Depthwise conv").
    dw_impl: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(
                f"Expected NHWC input [N, H, W, 3], got {x.shape}. "
                "(PyTorch-style NCHW must be transposed.)")
        if x.shape[1] % 16 or x.shape[2] % 16:
            raise ValueError(
                f"MobileFaceNet needs H, W divisible by 16 (GDConv runs "
                f"over the stride-16 map); got {x.shape[1]}x{x.shape[2]}")
        if self.dw_impl not in ("shift", "conv"):
            raise ValueError(f"dw_impl must be 'shift' or 'conv', got "
                             f"{self.dw_impl!r}")
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        if self.dw_impl == "shift":
            dw = lambda ch, s, name: _ShiftDW3x3(ch, stride=s,
                                                 dtype=self.dtype, name=name)
        else:
            dw = lambda ch, s, name: conv(
                ch, (3, 3), strides=(s, s), padding=[(1, 1), (1, 1)],
                feature_group_count=ch, name=name)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.bn_dtype,
                       param_dtype=jnp.float32)
        w = lambda c: int(c * self.width_mult)

        x = x.astype(self.dtype)
        # conv3x3 s2 + depthwise conv3x3 (paper table 1 rows 1-2)
        x = conv(w(64), (3, 3), strides=(2, 2),
                 padding=[(1, 1), (1, 1)], name="stem")(x)
        x = norm(name="stem_bn")(x)
        x = PReLU(w(64), name="stem_prelu")(x.astype(self.dtype))
        x = dw(w(64), 1, name="stem_dw")(x)
        x = norm(name="stem_dw_bn")(x)
        x = PReLU(w(64), name="stem_dw_prelu")(x.astype(self.dtype))

        for i, (t, ch, n, s) in enumerate(_MFN_SETTINGS):
            for j in range(n):
                x = _Bottleneck(out_channels=w(ch),
                                stride=s if j == 0 else 1,
                                expand_ratio=t, conv=conv, dw=dw,
                                norm=norm,
                                dtype=self.dtype, name=f"block{i}_{j}")(x)

        # conv1x1 to 512 + PReLU (paper table 1 row 8)
        x = conv(w(512), (1, 1), name="head")(x)
        x = norm(name="head_bn")(x)
        x = PReLU(w(512), name="head_prelu")(x.astype(self.dtype))

        # GDConv: depthwise conv with kernel = the whole spatial map
        # (7x7 at 112px input), VALID padding -> [N, 1, 1, C]. A learned
        # spatial importance map — the paper's replacement for global
        # average pooling (section 3.2).
        hw = (x.shape[1], x.shape[2])
        if self.dw_impl == "shift":
            x = _ShiftGDConv(w(512), hw, dtype=self.dtype,
                             name="gdconv")(x)
        else:
            x = conv(w(512), hw, padding="VALID",
                     feature_group_count=w(512), name="gdconv")(x)
        x = norm(name="gdconv_bn")(x)
        # linear 1x1 to the embedding; BN on the embedding, no activation
        x = conv(self.embed_dim, (1, 1), name="fc")(x)
        x = x.reshape((x.shape[0], self.embed_dim))
        x = norm(name="feature_bn", use_scale=False)(x)
        return x


def mobilefacenet(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
                  bn_dtype: Any = jnp.float32,
                  dw_impl: str = "conv") -> MobileFaceNet:
    return MobileFaceNet(embed_dim=embed_dim, dtype=dtype,
                         bn_dtype=bn_dtype, dw_impl=dw_impl)
