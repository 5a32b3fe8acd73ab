"""Backbone factory.

Reference: main_code/utils/backbones.py:11-31 — resnet18/resnet50/
efficientnet_b0/mobilenet_v2 with the final classifier replaced by a
FEATURE_DIM embedding layer. ImageNet-pretrained initialization is not
available in this environment (zero egress); `utils/torch_port.py` can import
torchvision state_dicts when the user has them on disk.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from face_recognition_models_tpu.models.efficientnet import efficientnet_b0
from face_recognition_models_tpu.models.inception import inception_v3
from face_recognition_models_tpu.models.iresnet import (
    iresnet18,
    iresnet50,
    iresnet100,
)
from face_recognition_models_tpu.models.mobilefacenet import mobilefacenet
from face_recognition_models_tpu.models.mobilenet import mobilenet_v2
from face_recognition_models_tpu.models.resnet import resnet18, resnet50
from face_recognition_models_tpu.models.vit import vit_b, vit_s, vit_t

BACKBONES = {
    "resnet18": resnet18,
    "resnet50": resnet50,
    "efficientnet_b0": efficientnet_b0,
    "mobilenet_v2": mobilenet_v2,
    # Beyond-reference: the edge/mobile face trunk (PReLU + GDConv,
    # arXiv:1804.07573) — what production edge ArcFace deployments ship.
    "mobilefacenet": mobilefacenet,
    # FaceNet's default trunk (reference FaceNet/main.py:15-24); not part
    # of the reference's margin-head backbone set but available everywhere.
    "inception_v3": inception_v3,
    # Beyond-reference: the insightface/ArcFace production trunk family
    # (models/iresnet.py); torch checkpoints load via
    # utils/torch_port.port_iresnet.
    "iresnet18": iresnet18,
    "iresnet50": iresnet50,
    "iresnet100": iresnet100,
    # Beyond-reference: TPU-first ViT trunks (models/vit.py) — 196-token
    # patch-8 sequences whose attention/MLP matmuls are MXU-shaped.
    "vit_t": vit_t,
    "vit_s": vit_s,
    "vit_b": vit_b,
}


def get_backbone(name: str = "resnet18", embed_dim: int = 512,
                 dtype: Any = jnp.bfloat16, bn_dtype: Any = jnp.float32):
    """Build a backbone module producing [N, embed_dim] embeddings.

    bn_dtype sets the BatchNorm normalize/affine compute dtype; batch
    statistics always reduce in fp32 (flax force_float32_reductions).
    bf16 saves ~12 ms on the b512 ResNet-50 train step (PERF.md).
    """
    key = name.lower()
    if key not in BACKBONES:
        raise ValueError(
            f"Unsupported backbone: {name}. Available: {sorted(BACKBONES)}")
    return BACKBONES[key](embed_dim=embed_dim, dtype=dtype,
                          bn_dtype=bn_dtype)
