"""ResNet-18 / ResNet-50 embedding backbones in Flax (NHWC, bf16-friendly).

Equivalent capability to the reference's torchvision backbones with the final
classifier swapped for a FEATURE_DIM embedding layer
(reference: main_code/utils/backbones.py:11-18). The architecture follows the
standard torchvision ResNet v1.5 graph (stride on the 3x3 conv in
bottlenecks) so that torchvision checkpoints can be ported with
`utils/torch_port.py`, but the implementation is TPU-native: NHWC layout,
XLA-fused conv+BN+ReLU, bf16 compute with fp32 batch-norm statistics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (ResNet-18/34)."""

    filters: int
    stride: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), strides=(1, 1),
                      padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn2")(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1),
                                 strides=(self.stride, self.stride),
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck (ResNet-50; torchvision v1.5)."""

    filters: int
    stride: int = 1
    expansion: int = 4
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters * self.expansion, (1, 1),
                                 strides=(self.stride, self.stride),
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class _Conv1Param(nn.Module):
    """Bare [7, 7, 3, F] kernel parameter named exactly like nn.Conv's, so
    the space-to-depth stem keeps the conv7 param tree (checkpoint- and
    torch-port-compatible). With use_bias (BN-folded inference) a bias
    param is added, matching nn.Conv's naming."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias


class _FoldedNorm(nn.Module):
    """Identity stand-in for BatchNorm in BN-folded inference models (the
    affine+stats are folded into the preceding conv's kernel/bias)."""

    def __call__(self, x):
        return x


def _space_to_depth_stem(x, kernel, dtype, bias=None):
    """The 7x7/s2 stem conv re-expressed on a 2x2 space-to-depth input.

    A 3-channel conv wastes the MXU's 128-lane input dimension (3 of 128
    lanes used); folding 2x2 pixel blocks into channels gives a 12-channel,
    4x4/s1 conv that is numerically identical:
      y[i,j] = sum_{dh,dw,c} x[2i+dh-3, 2j+dw-3, c] W[dh,dw,c]
    with u = 2p+a (a = parity) becomes a 4-tap conv over p with kernel
    W'[k,l,(a,b,c)] = W[2k+a-1, 2l+b-1, c] and padding (2, 1).
    """
    n, h, w, _ = x.shape
    f = kernel.shape[-1]
    xs = x.reshape(n, h // 2, 2, w // 2, 2, 3)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 12)
    # pad top/left so index dh = 2k+a-1 lands on a (4, 2)-factorable axis
    wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(4, 2, 4, 2, 3, f).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(4, 4, 12, f)
    out = jax.lax.conv_general_dilated(
        xs.astype(dtype), w2.astype(dtype), window_strides=(1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


class ResNet(nn.Module):
    """ResNet trunk -> global average pool -> Dense(embed_dim)."""

    stage_sizes: Sequence[int]
    block: Callable[..., nn.Module]
    embed_dim: int = 512
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    # 'space_to_depth' (default; numerically identical, ~MXU-efficient stem)
    # or 'conv7' (direct 7x7/s2). Both use the same [7,7,3,F] conv1 param.
    stem: str = "space_to_depth"
    # BN-folded inference mode: convs carry biases, norms are identity.
    # Params come from models.folding.fold_resnet_bn (serving/export).
    folded: bool = False
    # BN compute dtype for the normalize/affine elementwise math and its
    # backward. Batch STATISTICS are always reduced in fp32 regardless
    # (flax force_float32_reductions), so bf16 here only drops the fp32
    # cast chains around each norm — measured ~12 ms/step on the b512
    # ResNet-50 train step (PERF.md "Train-step decomposition") with
    # verification quality unchanged. fp32 remains the parity default.
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(
                f"Expected NHWC input [N, H, W, 3], got {x.shape}. "
                "(PyTorch-style NCHW must be transposed.)")
        if self.folded and train:
            raise ValueError("BN-folded models are inference-only")
        conv = partial(nn.Conv, use_bias=self.folded, dtype=self.dtype,
                       param_dtype=jnp.float32)
        if self.folded:
            norm = _FoldedNorm
        else:
            # BatchNorm statistics and affine math in fp32 for stability;
            # the surrounding convs run in bf16 on the MXU.
            norm = partial(nn.BatchNorm, use_running_average=not train,
                           momentum=0.9, epsilon=1e-5, dtype=self.bn_dtype,
                           param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        use_s2d = (self.stem == "space_to_depth"
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if use_s2d:
            kernel, bias = _Conv1Param(self.num_filters, self.folded,
                                       name="conv1")()
            x = _space_to_depth_stem(x, kernel, self.dtype, bias)
        else:
            x = conv(self.num_filters, (7, 7), strides=(2, 2),
                     padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for i, num_blocks in enumerate(self.stage_sizes):
            for j in range(num_blocks):
                stride = 2 if i > 0 and j == 0 else 1
                x = self.block(filters=self.num_filters * 2 ** i,
                               stride=stride, conv=conv, norm=norm,
                               dtype=self.dtype,
                               name=f"layer{i + 1}_{j}")(x)
                x = x.astype(self.dtype)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [N, C]
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(x)
        return x


def resnet18(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
             bn_dtype: Any = jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock,
                  embed_dim=embed_dim, dtype=dtype, bn_dtype=bn_dtype)


def resnet50(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
             bn_dtype: Any = jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck,
                  embed_dim=embed_dim, dtype=dtype, bn_dtype=bn_dtype)
