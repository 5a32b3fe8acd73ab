"""Vision Transformer embedding backbones in Flax (bf16 on the MXU).

Beyond-reference model family: the reference's backbone set is four CNNs
(main_code/utils/backbones.py:11-31); modern large-scale face recognition
(insightface arcface_torch, WebFace42M-era systems) trains ViT trunks with
the same margin heads. This is a TPU-first ViT, not a port:

- patch-8 embedding at 112px -> a 14x14 = 196-token sequence whose
  attention ([N*h, 196, 196]) and MLP ([N*196, D] x [D, 4D]) matmuls are
  large, static, MXU-shaped bf16 contractions — ViT MFU on TPU is far
  above the small-spatial CNN stages (see PERF.md MFU accounting);
- pre-LN blocks, qkv as ONE fused [D, 3D] projection, fp32 softmax
  (margin-head cosines downstream are sensitive to logit noise);
- embedding head matching this package's iResNet convention
  (models/iresnet.py): LayerNorm -> mean-pool tokens -> Dense(embed) ->
  feature BatchNorm1d with frozen scale, fp32 output. The feature BN
  keeps the batch_stats collection non-empty so the train step's
  mutable=["batch_stats"] plumbing (train/step.py:86) is uniform across
  backbones.

Like every backbone here: compute dtype bf16 (`dtype`), all params fp32,
`bn_dtype` sets the normalization compute dtype (LayerNorm here; fp32
default).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MHSA(nn.Module):
    """Multi-head self-attention with a fused qkv projection.

    Attention logits and softmax run in fp32 (bf16 softmax costs accuracy
    for free — the [T, T] matrices are tiny next to the MLP matmuls).
    """

    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n, t, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = nn.Dense(3 * d, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(n, t, 3, h, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [N, T, h, dh]
        scale = 1.0 / np.sqrt(dh)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, t, d)
        return nn.Dense(d, use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(out)


class Block(nn.Module):
    """Pre-LN transformer block: x + MHSA(LN(x)); x + MLP(LN(x))."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16
    ln_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.ln_dtype,
                                       param_dtype=jnp.float32, name=name)
        y = ln("ln1")(x).astype(self.dtype)
        x = x + MHSA(self.dim, self.num_heads, dtype=self.dtype,
                     name="attn")(y)
        y = ln("ln2")(x).astype(self.dtype)
        y = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=True)
        y = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc2")(y)
        return x + y


class VisionTransformer(nn.Module):
    """ViT trunk -> LN -> mean-pool -> Dense(embed) -> feature BN."""

    depth: int
    dim: int
    num_heads: int
    patch_size: int = 8
    embed_dim: int = 512
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.float32  # LayerNorm compute dtype here
    # activation rematerialization: recompute block activations in the
    # backward pass instead of storing them (jax.checkpoint / nn.remat).
    # vit_b at b512 needs ~12 x 441 MB of saved qkv activations alone and
    # OOMs a 16 GB chip without it; the recompute costs ~1/3 extra fwd
    # FLOPs for ~12x less activation memory.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(
                f"Expected NHWC input [N, H, W, 3], got {x.shape}. "
                "(PyTorch-style NCHW must be transposed.)")
        p = self.patch_size
        if x.shape[1] % p or x.shape[2] % p:
            raise ValueError(
                f"Input spatial dims {x.shape[1]}x{x.shape[2]} must be "
                f"multiples of patch_size={p}")
        x = x.astype(self.dtype)
        # patch embedding: non-overlapping pxp conv == per-patch matmul
        x = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x)
        n, gh, gw, d = x.shape
        x = x.reshape(n, gh * gw, d)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw, d), jnp.float32)
        x = x + pos.astype(self.dtype)

        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            x = block_cls(self.dim, self.num_heads, self.mlp_ratio,
                          dtype=self.dtype, ln_dtype=self.bn_dtype,
                          name=f"block{i}")(x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.bn_dtype,
                         param_dtype=jnp.float32, name="ln_final")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=1)  # token mean-pool
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(x)
        # frozen-scale feature BN, matching models/iresnet.py:126-129
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_scale=False, use_bias=True,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="features")(x.astype(jnp.float32))
        return x


def vit_t(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
          bn_dtype: Any = jnp.float32, remat: bool = False,
          ) -> VisionTransformer:
    return VisionTransformer(depth=12, dim=192, num_heads=3,
                             embed_dim=embed_dim, dtype=dtype,
                             bn_dtype=bn_dtype, remat=remat)


def vit_s(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
          bn_dtype: Any = jnp.float32, remat: bool = False,
          ) -> VisionTransformer:
    return VisionTransformer(depth=12, dim=384, num_heads=6,
                             embed_dim=embed_dim, dtype=dtype,
                             bn_dtype=bn_dtype, remat=remat)


def vit_b(embed_dim: int = 512, dtype: Any = jnp.bfloat16,
          bn_dtype: Any = jnp.float32, remat: bool = True,
          ) -> VisionTransformer:
    # remat defaults ON: b512 training OOMs a 16 GB chip without it
    return VisionTransformer(depth=12, dim=768, num_heads=12,
                             embed_dim=embed_dim, dtype=dtype,
                             bn_dtype=bn_dtype, remat=remat)
