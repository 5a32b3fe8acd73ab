"""Benchmark the Pallas implicit-GEMM 3x3 conv vs XLA's conv lowering.

VERDICT round-2 item 8: eval sits at ~24% MFU with the small-spatial 3x3
convs (28x28/14x14/7x7) reaching only 32-37 TF/s under XLA. This measures
ops/conv3x3.py against lax.conv on ONE shape per process (CLAUDE.md:
multi-program processes mis-time through the tunnel):

    for s in 28,128 14,256 7,512; do
      for p in pallas xla; do
        python scripts/bench_conv3x3.py --shape $s --path $p; done; done

Timing follows bench.py's chained-scalar discipline: each iteration's
input depends on the previous output, and the scalar is fetched with
float() (block_until_ready does not reliably block through the tunnel).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

N_REPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="7,512",
                    help="H,C — spatial size and channels (C_out = C)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--path", choices=["pallas", "xla"], required=True)
    ap.add_argument("--block-n", type=int, default=0,
                    help="images per Pallas block (0 = auto by VMEM)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from face_recognition_models_tpu.ops.conv3x3 import conv3x3_same

    h, c = (int(v) for v in args.shape.split(","))
    n, co = args.batch, c
    dt = jnp.dtype(args.dtype)
    block_n = args.block_n
    if not block_n:
        # keep x-block + y-block + weights + fp32 acc under ~8 MB of VMEM
        per_img = h * h * (c * dt.itemsize * 2 + co * 4)
        block_n = max(1, min(n, (8 << 20) // per_img))
        while n % block_n:
            block_n -= 1

    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(n, h, h, c), dt)
    k = jnp.asarray(0.05 * rs.randn(3, 3, c, co), dt)

    if args.path == "pallas":
        interp = jax.default_backend() == "cpu"  # CPU smoke only
        conv = lambda x: conv3x3_same(x, k, block_n=block_n,
                                      interpret=interp)
    else:
        conv = lambda x: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def chain(x, _):
        y = conv(x)
        # renormalize so the chain neither explodes nor denormals
        return y * jax.lax.rsqrt(jnp.mean(
            y.astype(jnp.float32) ** 2) + 1e-6).astype(dt), None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(chain, x, None, length=args.iters)
        return jnp.sum(x.astype(jnp.float32))

    _ = float(run(x0))  # compile + warmup
    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        _ = float(run(x0))
        best = min(best, (time.perf_counter() - t0) / args.iters)

    flops = 2 * n * h * h * 9 * c * co
    print(json.dumps({
        "metric": "conv3x3", "path": args.path, "shape": [n, h, h, c, co],
        "dtype": args.dtype, "block_n": block_n,
        "ms": round(best * 1e3, 3),
        "tflops": round(flops / best / 1e12, 1)}))


if __name__ == "__main__":
    main()
