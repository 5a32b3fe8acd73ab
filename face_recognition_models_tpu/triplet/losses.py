"""Standalone FaceNet-side losses.

Equivalents of FaceNet/utils/criterions.py: the explicit TripletLoss
(euclidean margins, :5-14) and the simplified CE-returning CosFace/ArcFace
losses (:16-56) the reference keeps alongside the main heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from face_recognition_models_tpu.ops.normalize import l2_normalize
from face_recognition_models_tpu.train.losses import (
    cross_entropy_with_integer_labels,
)


def triplet_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                 negative: jnp.ndarray, margin: float = 0.2) -> jnp.ndarray:
    """mean relu(||a-p|| - ||a-n|| + margin) (criterions.py:10-14)."""
    d_ap = jnp.linalg.norm(anchor - positive, axis=-1)
    d_an = jnp.linalg.norm(anchor - negative, axis=-1)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def cosface_loss(feats: jnp.ndarray, weight: jnp.ndarray,
                 labels: jnp.ndarray, m: float = 0.35,
                 s: float = 64.0) -> jnp.ndarray:
    """Simple CosFace CE (criterions.py:16-36); weight [D, C]."""
    xn = l2_normalize(feats.astype(jnp.float32), axis=1)
    wn = l2_normalize(weight.astype(jnp.float32), axis=0)
    cos = jnp.clip(jnp.dot(xn, wn, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST), -1.0, 1.0)
    one_hot = jax.nn.one_hot(labels, cos.shape[1], dtype=jnp.float32)
    logits = s * (cos - one_hot * m)
    return jnp.mean(cross_entropy_with_integer_labels(logits, labels))


def arcface_loss(feats: jnp.ndarray, weight: jnp.ndarray,
                 labels: jnp.ndarray, m: float = 0.5,
                 s: float = 64.0) -> jnp.ndarray:
    """Simple acos-based ArcFace CE (criterions.py:38-56); weight [D, C]."""
    xn = l2_normalize(feats.astype(jnp.float32), axis=1)
    wn = l2_normalize(weight.astype(jnp.float32), axis=0)
    cos = jnp.clip(jnp.dot(xn, wn, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST), -1.0, 1.0)
    theta = jnp.arccos(cos)
    cos_m = jnp.cos(theta + m)
    one_hot = jax.nn.one_hot(labels, cos.shape[1], dtype=jnp.float32)
    logits = s * (one_hot * cos_m + (1.0 - one_hot) * cos)
    return jnp.mean(cross_entropy_with_integer_labels(logits, labels))
