"""Serving latency: single-image (and small-batch) embedding step time.

Throughput benches (bench.py) answer the training/offline question; online
serving cares about per-request latency at small batch. Chained-scalar
scan timing as everywhere (CLAUDE.md: naive timers lie through the
tunnel): the measured number is pure device latency per forward — the
batch-b embedding step a server would dispatch — excluding host RPC.

One (backbone, batch) per process:

    for b in 1 8 64; do
      python scripts/bench_latency.py --backbone resnet50 --batch $b; done
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

N_REPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.train.step import make_eval_step

    model = get_backbone(args.backbone)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, args.image_size, args.image_size, 3)),
                   train=False)
    eval_step = make_eval_step(model)
    params, stats = v["params"], v.get("batch_stats", {})

    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randint(
        0, 256, (args.batch, args.image_size, args.image_size, 3)), jnp.uint8)

    @jax.jit
    def run(params, stats, x):
        # chain: each iteration's input depends on the previous embedding
        def body(carry, _):
            x, acc = carry
            e = eval_step(params, stats, x).astype(jnp.float32)
            bump = (jnp.sum(e) * 0).astype(jnp.uint8)
            return (x + bump, acc + jnp.sum(e)), None
        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)), None,
                                   length=args.iters)
        return acc

    float(run(params, stats, x0))  # compile
    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        float(run(params, stats, x0))
        best = min(best, (time.perf_counter() - t0) / args.iters)

    print(json.dumps({
        "metric": "embed_latency", "backbone": args.backbone,
        "batch": args.batch, "image_size": args.image_size,
        "ms_per_forward": round(best * 1e3, 3),
        "img_per_sec": round(args.batch / best, 1)}))


if __name__ == "__main__":
    main()
