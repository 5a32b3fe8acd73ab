"""Does XLA lower a 1x1 conv worse than the equivalent reshaped matmul?

The train-step decomposition (PERF.md) leaves ~13 ms of backward-conv time
above the 3x-fwd ideal, and the int8 probe measured the hot 1x1 convs at
16-36 TF/s bf16 — ~2.6x their HBM speed-of-light (a 1x1 conv IS a matmul
[N*H*W, C_in] x [C_in, C_out]; at these shapes it is bandwidth-bound, not
MXU-bound). If `jnp.dot` on the reshaped activation beats
`lax.conv_general_dilated`, the bottleneck blocks' 1x1 convs (2/3 of
ResNet-50's convs) can be rewritten as dots for free step time.

One (shape, path, mode) per process (CLAUDE.md: multi-program processes
mis-time through the tunnel); chained-scalar timing as in bench.py:

    for s in "28,256,64" "28,64,256" "14,512,128" "7,1024,256"; do
      for p in conv matmul; do
        for m in fwd fwdbwd; do
          python scripts/bench_conv1x1.py --shape $s --path $p --mode $m
    done; done; done

MEASURED (v5e, 2026-08-18) and REJECTED: the reshaped matmul is
consistently SLOWER than XLA's conv lowering at every hot shape
(fwd+dgrad chains: 3.85 vs 2.50 ms at 28x28 256->64, 2.14 vs 1.40 at
28x28 64->256, 1.87 vs 1.49 at 14x14 512->128) — the NHWC->[NHW,C]
reshape forces a relayout that costs more than the conv path's internal
handling. See PERF.md "1x1 conv as matmul".
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

N_REPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="28,256,64", help="H,C_in,C_out")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--path", choices=["conv", "matmul"], required=True)
    ap.add_argument("--mode", choices=["fwd", "fwdbwd"], default="fwd")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    h, ci, co = (int(v) for v in args.shape.split(","))
    n = args.batch
    dt = jnp.dtype(args.dtype)

    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(n, h, h, ci), dt)
    k = jnp.asarray(0.05 * rs.randn(ci, co), dt)

    if args.path == "conv":
        def op(x, w):
            return jax.lax.conv_general_dilated(
                x, w[None, None], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        def op(x, w):
            y = jnp.dot(x.reshape(-1, w.shape[0]), w,
                        preferred_element_type=jnp.float32)
            return y.astype(x.dtype).reshape(x.shape[:-1] + (w.shape[1],))

    # keep the chain square so output feeds input: project back with k.T
    if args.mode == "fwd":
        def chain(x, _):
            y = op(x, k)
            y = op(y, k.T) if ci != co else y
            return y * jax.lax.rsqrt(jnp.mean(
                y.astype(jnp.float32) ** 2) + 1e-6).astype(dt), None
    else:
        def loss(x):
            y = op(x, k)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def chain(x, _):
            g = jax.grad(loss)(x)  # dgrad through the op
            return g * jax.lax.rsqrt(jnp.mean(
                g.astype(jnp.float32) ** 2) + 1e-6).astype(dt), None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(chain, x, None, length=args.iters)
        return jnp.sum(x.astype(jnp.float32))

    _ = float(run(x0))
    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        _ = float(run(x0))
        best = min(best, (time.perf_counter() - t0) / args.iters)

    ops_per_iter = (2 if (args.mode == "fwd" and ci != co) else
                    2 if args.mode == "fwdbwd" else 1)
    flops = ops_per_iter * 2 * n * h * h * ci * co
    hbm = n * h * h * (ci + co) * dt.itemsize * ops_per_iter
    print(json.dumps({
        "metric": "conv1x1", "path": args.path, "mode": args.mode,
        "shape": [n, h, h, ci, co], "dtype": args.dtype,
        "ms": round(best * 1e3, 3),
        "tflops": round(flops / best / 1e12, 1),
        "hbm_gbps": round(hbm / best / 1e9, 0)}))


if __name__ == "__main__":
    main()
