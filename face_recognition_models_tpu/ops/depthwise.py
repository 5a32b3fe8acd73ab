"""Depthwise convolutions as statically-shifted elementwise multiply-adds.

MEASURED AND REJECTED as the default lowering (kept as a tested
experiment, like ops/conv3x3.py): the hypothesis was that XLA's
grouped-conv handles the depthwise backward badly (MobileFaceNet's 6x
bwd/fwd step ratio, PERF.md), and that 9 static-shift multiply-adds —
whose autodiff is all elementwise + reductions, never a grouped conv —
would lower better. On v5e the opposite holds: XLA materializes the 9
padded slices instead of fusing them into one pass, and the shift form
is 1.9-3.0x SLOWER fwd+bwd at every MobileFaceNet shape, while the
grouped-conv path already sustains 355-460 GB/s effective traffic
(scripts/bench_depthwise.py, PERF.md "Depthwise conv"). The isolated
grouped conv is NOT the 6x culprit.

Numerics: accumulation is fp32 regardless of input dtype (the lax.conv
path also accumulates bf16 inputs in fp32), taps are rounded to the
compute dtype first (nn.Conv semantics), result cast back to the input
dtype; exact parity with lax.conv_general_dilated is pinned in
tests/test_depthwise.py for values and gradients.

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
