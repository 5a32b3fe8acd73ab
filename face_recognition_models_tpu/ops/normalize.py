"""L2 normalization and normalized cosine logits.

Every reference head L2-normalizes both the embeddings and the class weights
before the cosine matmul (e.g. criterion.py:173-176, 263-267); this module is
the single shared implementation. Math is fp32; the matmul runs on the MXU
with fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torch.nn.functional.normalize default eps
_NORM_EPS = 1e-12


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = _NORM_EPS) -> jnp.ndarray:
    """x / max(||x||_2, eps) along `axis` (torch F.normalize semantics)."""
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def feature_norms(feats: jnp.ndarray) -> jnp.ndarray:
    """Per-row L2 norms, shape [N, 1]."""
    return jnp.linalg.norm(feats, ord=2, axis=1, keepdims=True)


def cosine_logits(feats: jnp.ndarray, kernel: jnp.ndarray):
    """Normalized cosine similarity matrix.

    Args:
        feats:  [N, D] raw embeddings (any float dtype; promoted to fp32).
        kernel: [D, C] class-prototype matrix.

    Returns:
        (cos [N, C] fp32, feats_norm [N, D] fp32, norms [N, 1] fp32)
    """
    feats = feats.astype(jnp.float32)
    kernel = kernel.astype(jnp.float32)
    xn = l2_normalize(feats, axis=1)
    wn = l2_normalize(kernel, axis=0)
    # Precision.HIGHEST: TPU fp32 matmul otherwise decomposes to single-pass
    # bf16 (~7e-2 abs error) — far too coarse for the acos-based margin math
    # downstream. This matmul is ~1% of step FLOPs, so full precision is
    # cheap; the backbone stays bf16 on the MXU.
    cos = jnp.dot(xn, wn, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return cos, xn, feature_norms(feats)
