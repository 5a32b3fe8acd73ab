"""FaceNet-style embedding network.

Equivalent of the reference's EmbeddingNet (FaceNet/main.py:15-42): CNN
trunk -> 128-d projection -> L2 normalization. Both reference trunks are
available: Inception-v3 (the reference default, main.py:15-24 —
`models/inception.py`) and ResNet-50 (main.py:25-28, the default here for
its better size/speed at 112 px).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from face_recognition_models_tpu.models.backbones import get_backbone
from face_recognition_models_tpu.ops.normalize import l2_normalize


class FaceNetEmbedding(nn.Module):
    """trunk -> Dense(embed_dim) -> L2 normalize (unit hypersphere)."""

    trunk_name: str = "resnet50"
    embed_dim: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk = get_backbone(self.trunk_name, embed_dim=self.embed_dim,
                             dtype=self.dtype)
        feats = trunk(x, train=train)
        return l2_normalize(feats.astype(jnp.float32), axis=1)


def facenet_embedding(trunk: str = "resnet50", embed_dim: int = 128,
                      dtype: Any = jnp.bfloat16) -> FaceNetEmbedding:
    return FaceNetEmbedding(trunk_name=trunk, embed_dim=embed_dim,
                            dtype=dtype)
