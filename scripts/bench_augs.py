"""Per-op augmentation cost on device (one --op per process; CLAUDE.md
tunnel timing discipline: lax.scan chain + float() fetch)."""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True,
                    choices=["flip", "crop", "jitter", "erase", "chain",
                             "none"])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from face_recognition_models_tpu.ops import image_ops as io_

    def apply(rng, x):
        if args.op == "flip":
            return io_.random_horizontal_flip(rng, x)
        if args.op == "crop":
            return io_.random_shift_crop(rng, x, 4)
        if args.op == "jitter":
            return io_.random_color_jitter(rng, x, 0.4)
        if args.op == "erase":
            return io_.random_erasing(rng, x, 0.25)
        if args.op == "chain":
            return io_.apply_augmentations(rng, x, True, 4, 0.4, 0.25)
        return x

    x = jnp.asarray(np.random.RandomState(0).randn(
        args.batch, args.size, args.size, 3).astype(np.float32))

    @jax.jit
    def run(rng, x):
        def body(carry, _):
            rng, x = carry
            rng, k = jax.random.split(rng)
            y = apply(k, x)
            # keep a data dependency without accumulating magnitude
            return (rng, y * 0.999 + x * 0.001), ()
        (rng, y), _ = jax.lax.scan(body, (rng, x), None, length=args.scan)
        return y.sum()

    rng = jax.random.PRNGKey(0)
    _ = float(run(rng, x))  # compile
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        _ = float(run(rng, x))
        best = min(best, (time.perf_counter() - t0) / args.scan * 1e3)
    print(json.dumps({"metric": "aug_op", "op": args.op,
                      "batch": args.batch, "size": args.size,
                      "ms_per_batch": round(best, 3)}))


if __name__ == "__main__":
    main()
