"""Depthwise 3x3 conv: XLA's grouped-conv lowering vs a pad+slice
multiply-add reformulation, fwd and fwd+bwd.

Motivation (PERF.md "All-backbone throughput"): MobileFaceNet's train
step runs at a 6x bwd/fwd ratio (vs ~2.5x for dense-conv trunks) because
XLA lowers the depthwise backward-filter poorly at 64-256 channels. A
depthwise conv is pure VPU work (9 FMAs/element, memory-bound), so the
natural fix is to express it as 9 statically-shifted elementwise
multiply-adds — then the backward is also elementwise + big reductions,
never a grouped conv.

One (shape, impl) per process (CLAUDE.md tunnel timing discipline):
  python scripts/bench_depthwise.py --shape 56,56,64 --impl conv --mode fwdbwd
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="56,56,64", help="H,W,C")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--impl", choices=["conv", "shift"], default="conv")
    ap.add_argument("--mode", choices=["fwd", "fwdbwd"], default="fwdbwd")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from face_recognition_models_tpu.ops.depthwise import depthwise_conv3x3

    h, w, c = (int(v) for v in args.shape.split(","))
    n, s = args.batch, args.stride
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, w, c), jnp.bfloat16)
    kern = jax.random.normal(key, (3, 3, 1, c), jnp.float32)

    def conv_fn(x, kern):
        return jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), (s, s), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    def shift_fn(x, kern):
        return depthwise_conv3x3(x, kern, stride=s)

    fn = conv_fn if args.impl == "conv" else shift_fn

    if args.mode == "fwd":
        def step(carry, _):
            x_c, k_c = carry
            y = fn(x_c, k_c)
            # chain: fold a scalar of y back into the kernel so every
            # iteration depends on the last (no result caching)
            return (x_c, k_c + y[0, 0, 0, 0].astype(jnp.float32) * 1e-20), None
    else:
        def loss(x_c, k_c):
            return jnp.sum(fn(x_c, k_c).astype(jnp.float32) ** 2) * 1e-12

        grad = jax.grad(loss, argnums=(0, 1))

        def step(carry, _):
            x_c, k_c = carry
            gx, gk = grad(x_c, k_c)
            return (x_c + gx.astype(x_c.dtype) * 0,
                    k_c + gk * 1e-20), None

    @jax.jit
    def run(x, kern):
        (x_f, k_f), _ = jax.lax.scan(step, (x, kern), None,
                                     length=args.steps)
        return k_f[0, 0, 0, 0]

    float(run(x, kern))  # compile + warm
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(run(x, kern))
        times.append((time.perf_counter() - t0) / args.steps * 1e3)
    ms = min(times)
    # memory speed-of-light: fwd reads x + writes y; bwd reads dout + x,
    # writes dx (+ negligible kernel traffic)
    out_elems = n * (h // s) * (w // s) * c
    bytes_fwd = (x.size + out_elems) * 2
    traffic = bytes_fwd if args.mode == "fwd" else bytes_fwd * 3
    print(f"impl={args.impl} shape={n}x{h}x{w}x{c} s{s} mode={args.mode}: "
          f"{ms:.3f} ms  ({traffic / ms * 1e-6:.0f} GB/s effective; "
          f"reps {[f'{t:.3f}' for t in times]})")


if __name__ == "__main__":
    main()
