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


def _reflect_index(idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """np.pad(mode='reflect') index map for idx in (-size, 2*size-1)."""
    idx = jnp.where(idx < 0, -idx, idx)
    return jnp.where(idx >= size, 2 * size - 2 - idx, idx)


def random_shift_crop(rng: jax.Array, images: jnp.ndarray,
                      pad: int) -> jnp.ndarray:
    """Per-sample random translation: equivalent to reflect-padding by
    `pad` pixels and cropping back at a keyed offset in [0, 2*pad]^2
    (torchvision's RandomCrop(padding=pad, padding_mode='reflect')),
    computed as two batched gathers over reflect-mapped row/col indices.
    A vmapped dynamic_slice formulation was measured at 66 ms/b512 on
    v5e (512 serialized slices); the take_along_axis gathers lower to
    one fused gather per axis instead (PERF.md)."""
    if pad <= 0:
        return images
    n, h, w, _ = images.shape
    ky, kx = jax.random.split(rng)
    dy = jax.random.randint(ky, (n,), -pad, pad + 1)
    dx = jax.random.randint(kx, (n,), -pad, pad + 1)
    rows = _reflect_index(jnp.arange(h)[None, :] + dy[:, None], h)  # [N,H]
    cols = _reflect_index(jnp.arange(w)[None, :] + dx[:, None], w)  # [N,W]
    out = jnp.take_along_axis(images, rows[:, :, None, None], axis=1)
    return jnp.take_along_axis(out, cols[:, None, :, None], axis=2)


def random_color_jitter(rng: jax.Array, images: jnp.ndarray,
                        strength: float) -> jnp.ndarray:
    """Per-sample brightness/contrast jitter on NORMALIZED float images
    (post normalize_images, so pixel 0.5 maps to 0 under the reference's
    mean=std=0.5): brightness adds b ~ U(-s, s) in normalized units;
    contrast scales around the per-image mean by c ~ U(1-s, 1+s)."""
    if strength <= 0.0:
        return images
    n = images.shape[0]
    kb, kc = jax.random.split(rng)
    b = jax.random.uniform(kb, (n, 1, 1, 1), images.dtype,
                           -strength, strength)
    c = jax.random.uniform(kc, (n, 1, 1, 1), images.dtype,
                           1.0 - strength, 1.0 + strength)
    mean = images.mean(axis=(1, 2, 3), keepdims=True)
    return (images - mean) * c + mean + b


def random_erasing(rng: jax.Array, images: jnp.ndarray, p: float,
                   area_range: Tuple[float, float] = (0.02, 0.2),
                   log_aspect_range: Tuple[float, float] = (-1.204, 1.204),
                   ) -> jnp.ndarray:
    """Random Erasing (Zhong et al. 2020): with probability p per sample,
    zero out a rectangle of relative area ~U(area_range) and aspect ratio
    exp(U(log_aspect_range)) (~[0.3, 3.3]). Built from broadcasted-iota
    masks — static shapes, no data-dependent control flow; 0 is the
    normalized mean under the reference transform."""
    if p <= 0.0:
        return images
    n, h, w, _ = images.shape
    karea, kaspect, ky, kx, kp = jax.random.split(rng, 5)
    area = jax.random.uniform(karea, (n,), jnp.float32,
                              area_range[0], area_range[1]) * (h * w)
    aspect = jnp.exp(jax.random.uniform(kaspect, (n,), jnp.float32,
                                        log_aspect_range[0],
                                        log_aspect_range[1]))
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w)
    y0 = (jax.random.uniform(ky, (n,)) * (h - eh + 1)).astype(jnp.int32)
    x0 = (jax.random.uniform(kx, (n,)) * (w - ew + 1)).astype(jnp.int32)
    live = jax.random.bernoulli(kp, p, (n,))

    rows = jnp.arange(h)[None, :, None]                       # [1, H, 1]
    cols = jnp.arange(w)[None, None, :]                       # [1, 1, W]
    in_box = ((rows >= y0[:, None, None]) &
              (rows < (y0 + eh.astype(jnp.int32))[:, None, None]) &
              (cols >= x0[:, None, None]) &
              (cols < (x0 + ew.astype(jnp.int32))[:, None, None]))
    erase = (in_box & live[:, None, None])[..., None]         # [N, H, W, 1]
    return jnp.where(erase, jnp.zeros((), images.dtype), images)


def apply_augmentations(rng: jax.Array, images: jnp.ndarray,
                        horizontal_flip: bool = False,
                        crop_pad: int = 0,
                        color_jitter: float = 0.0,
                        erasing: float = 0.0) -> jnp.ndarray:
    """The train-time augmentation chain, fused into the train step on
    NORMALIZED float images: flip -> shift-crop -> color jitter -> random
    erasing. All keyed from one rng; every op is a no-op at its default,
    so the reference's no-augmentation configuration (model_utils.py:540
    ships flip commented out) costs nothing."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    if horizontal_flip:
        images = random_horizontal_flip(k1, images)
    images = random_shift_crop(k2, images, crop_pad)
    images = random_color_jitter(k3, images, color_jitter)
    images = random_erasing(k4, images, erasing)
    return images
