"""Depthwise convolutions as statically-shifted elementwise multiply-adds.

XLA's grouped-conv lowering handles the depthwise *backward-filter* badly
at face-trunk channel widths (64-256 channels): MobileFaceNet measures a
6x bwd/fwd cost ratio where dense-conv trunks sit at ~2.5x (PERF.md).
A depthwise 3x3 is not MXU work at all — it is 9 fused multiply-adds per
element, pure VPU — so this module expresses it that way: pad once, take
9 static slices, multiply-accumulate in fp32. Autodiff then yields

- d/dx: 9 shifted multiply-adds of dout with the flipped taps (elementwise,
  no conv), and
- d/dw: 9 large elementwise-mul + global reductions,

none of which touch the grouped-conv path. Numerics: accumulation is fp32
regardless of input dtype (the lax.conv path also accumulates bf16 inputs
in fp32), result cast back to the input dtype; exact parity with
lax.conv_general_dilated is pinned in tests/test_depthwise.py.

Kernel layout matches flax nn.Conv's depthwise convention: [3, 3, 1, C]
(HWIO with one input channel per group), so a trunk can swap
implementations without touching its checkpoints.
"""

from __future__ import annotations

import jax.numpy as jnp


def depthwise_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                      stride: int = 1) -> jnp.ndarray:
    """Depthwise 3x3, SAME padding (pad 1), stride 1 or 2.

    x: [N, H, W, C]; kernel: [3, 3, 1, C] (flax depthwise nn.Conv layout).
    Returns [N, H/stride, W/stride, C] in x.dtype (fp32 accumulation).
    """
    if kernel.shape[:3] != (3, 3, 1):
        raise ValueError(f"kernel must be [3, 3, 1, C], got {kernel.shape}")
    if x.ndim != 4 or x.shape[-1] != kernel.shape[-1]:
        raise ValueError(
            f"x must be [N, H, W, C={kernel.shape[-1]}], got {x.shape}")
    if stride not in (1, 2):
        raise ValueError(f"stride must be 1 or 2, got {stride}")
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # round taps to the compute dtype first (nn.Conv casts its kernel to
    # x.dtype), THEN accumulate the products in fp32 — same numerics as
    # the lax.conv path's fp32 accumulation of bf16 operands
    taps = kernel.reshape(3, 3, c).astype(x.dtype).astype(jnp.float32)
    out = None
    for dy in range(3):
        for dx in range(3):
            window = padded[:, dy:dy + h:stride, dx:dx + w:stride, :]
            term = window.astype(jnp.float32) * taps[dy, dx]
            out = term if out is None else out + term
    return out.astype(x.dtype)


def global_depthwise(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """GDConv: depthwise conv whose kernel spans the whole spatial map
    (VALID padding), i.e. a learned per-channel spatial weighting.

    x: [N, H, W, C]; kernel: [H, W, 1, C]. Returns [N, 1, 1, C].
    """
    if kernel.shape[:2] != x.shape[1:3] or kernel.shape[2] != 1:
        raise ValueError(
            f"kernel {kernel.shape} must be [{x.shape[1]}, {x.shape[2]}, "
            f"1, C] for input {x.shape}")
    weights = kernel.reshape(kernel.shape[0], kernel.shape[1],
                             kernel.shape[3]).astype(x.dtype
                                                     ).astype(jnp.float32)
    pooled = jnp.einsum("nhwc,hwc->nc", x.astype(jnp.float32), weights)
    return pooled[:, None, None, :].astype(x.dtype)
