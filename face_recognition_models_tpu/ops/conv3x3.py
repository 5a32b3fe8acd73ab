"""Experimental Pallas 3x3 stride-1 same-padding conv (implicit GEMM).

PERF.md (round 2) leaves eval at ~24% MFU, dominated by the small-spatial
stages: XLA's conv lowering reaches only 32-37 TF/s on the 28x28/14x14/7x7
3x3 convs (bf16 peak ~197 TF/s) because the 7-wide rows tile poorly onto
the (8, 128) vregs with halo handling. This kernel reformulates the conv
as 9 shifted matmuls over the FLATTENED spatial axis:

    y[r] = sum_{a,b in {-1,0,1}} mask_{a,b}(r) * x[r + a*W + b] @ K[a, b]

with r = n*H*W + h*W + w. Rolling the flattened [bn*H*W, C] tile by
s = a*W + b and masking rows where (h+a, w+b) leaves the image is EXACT:
|s| <= W+1 < H*W, so every row the roll wraps across an image (or block)
boundary is precisely a row the boundary mask zeroes. Each tap is then a
dense [bn*H*W, C] x [C, C_out] MXU matmul with no halo exchange, no
im2col materialization, and the 3x3x C x C_out weight resident in VMEM.

Per 16-image tile at 7x7x256: 9 rolls + masks (VPU, ~1 us) + 9 matmuls
(MXU, ~5 us) on a 400 KB block — compute-bound at speed-of-light ~0.15 ms
for the full b512 conv vs XLA's measured 0.92 ms.

Status: MEASURED AND REJECTED (PERF.md "Pallas implicit-GEMM 3x3 conv").
On v5e at the real ResNet-50 stage shapes (b512 bf16) XLA's own conv
lowering reaches 47-54 TF/s and this kernel never beats it (1.06x slower
at 7x7, 1.98x at 28x28 where the 9 mask/select passes dominate).
Correctness stays pinned vs lax.conv in tests/test_conv3x3.py; the kernel
is kept as the documented experiment, not wired into the models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = tuple((a, b) for a in (-1, 0, 1) for b in (-1, 0, 1))


def _kernel(x_ref, w_ref, y_ref, *, h: int, w: int, bn: int,
            out_dtype):
    p = h * w
    rows = bn * p
    x2 = x_ref[...].reshape(rows, x_ref.shape[-1])
    # per-row (h, w) position, repeating every image
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    hh = (r % p) // w
    ww = r % w

    acc = jnp.zeros((rows, y_ref.shape[-1]), jnp.float32)
    for t, (a, b) in enumerate(_TAPS):
        s = a * w + b
        # want shifted[r] = x2[(r + s) % rows]. The shift is STATIC, so a
        # two-slice concatenate expresses the rotate without tpu.roll —
        # Mosaic's dynamic_rotate is unimplemented for non-32-bit data
        # (bf16), while static slices/concat lower for every dtype.
        k = s % rows
        shifted = (jnp.concatenate([x2[k:], x2[:k]], axis=0) if k else x2)
        valid = ((hh + a >= 0) & (hh + a < h)
                 & (ww + b >= 0) & (ww + b < w))
        masked = jnp.where(valid, shifted, jnp.zeros_like(shifted))
        acc += jnp.dot(masked, w_ref[t],
                       preferred_element_type=jnp.float32)
    y_ref[...] = acc.astype(out_dtype).reshape(y_ref.shape)


def conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray, *, block_n: int = 16,
                 interpret: bool = False) -> jnp.ndarray:
    """3x3, stride 1, SAME padding, NHWC conv via the roll+mask implicit
    GEMM above. `x` [N, H, W, C] (bf16 recommended), `kernel`
    [3, 3, C, C_out]. N must divide by block_n."""
    n, h, w, c = x.shape
    kh, kw, kc, c_out = kernel.shape
    if (kh, kw) != (3, 3) or kc != c:
        raise ValueError(f"need [3, 3, {c}, *] kernel, got {kernel.shape}")
    if n % block_n:
        raise ValueError(f"batch {n} must divide by block_n {block_n}")
    # taps in the same (a, b) order the kernel loop uses
    w9 = kernel.astype(x.dtype).reshape(9, c, c_out)

    fn = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, bn=block_n,
                          out_dtype=x.dtype),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c, c_out), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, h, w, c_out),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_out), x.dtype),
        # The unrolled 9-tap loop keeps several [rows, C] temporaries
        # (shifted/masked copies from the static-slice rotate) live at
        # once, so the default 16 MB scoped-vmem cap is too tight even for
        # modest blocks; v5e has 128 MB of VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return fn(x, w9)
