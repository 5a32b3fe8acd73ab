"""On-device image preprocessing (fused under jit).

The reference normalizes per-sample on CPU workers
(ToTensor + Normalize(mean=std=0.5), model_utils.py:539-547). Here batches
arrive as uint8 and the whole decode-side pipeline on device is one fused
affine (+ optional flip/crop), so host->device traffic is uint8 and XLA
fuses the conversion into the first conv.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def normalize_images(images: jnp.ndarray,
                     mean: Sequence[float] = (0.5, 0.5, 0.5),
                     std: Sequence[float] = (0.5, 0.5, 0.5),
                     dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [N,H,W,3] -> normalized float: ((x/255) - mean) / std, fused as
    a single multiply-add."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    scale = (1.0 / (255.0 * std)).astype(dtype)
    bias = (-mean / std).astype(dtype)
    return images.astype(dtype) * scale + bias


def random_horizontal_flip(rng: jax.Array, images: jnp.ndarray,
                           p: float = 0.5) -> jnp.ndarray:
    """Per-sample horizontal flip (the reference has this transform
    commented out, model_utils.py:540; off by default in config)."""
    flip = jax.random.bernoulli(rng, p, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def center_crop_resize(images: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Square center crop then bilinear resize to out_size (on-device
    equivalent of the offline Resize step, preprocess.py:24,38)."""
    n, h, w, c = images.shape
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    cropped = images[:, top:top + s, left:left + s, :]
    if s == out_size:
        return cropped
    return jax.image.resize(cropped.astype(jnp.float32),
                            (n, out_size, out_size, c), method="bilinear")
