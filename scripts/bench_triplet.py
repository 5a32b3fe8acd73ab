"""Triplet train-step microbenchmark (one config per process — CLAUDE.md).

Measures the full jitted FaceNet step (fwd + mining + bwd + SGD) at the
reference's PK batch (p=16, k=4 -> b=64, FaceNet/main.py:133-139) with
chained-scalar scan timing, plus the isolated mining+loss cost (fwd-only
semi-hard selection on fixed embeddings) so PERF.md can state what share
of the step the [B,B,B] mining mask costs.

    python scripts/bench_triplet.py [--backbone resnet50] [--p 16 --k 4]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--embed-dim", type=int, default=128)
    ap.add_argument("--p", type=int, default=16)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--margin", type=float, default=0.2)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from face_recognition_models_tpu.config import FaceNetConfig
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.ops.mining import (
        semi_hard_triplet_loss)
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.triplet.train import (
        TripletTrainState,
        make_triplet_train_step,
    )

    cfg = FaceNetConfig(backbone=args.backbone, embed_dim=args.embed_dim,
                        p=args.p, k=args.k, margin=args.margin)
    b, img = args.p * args.k, args.image_size
    model = get_backbone(cfg.backbone, embed_dim=cfg.embed_dim)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, img, img, 3)), train=False)
    tx = get_optimizer("sgd", cfg.learning_rate, momentum=cfg.momentum,
                       weight_decay=cfg.weight_decay)
    state = TripletTrainState(
        step=jnp.int32(0), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(1))
    step = make_triplet_train_step(model, tx, cfg.margin)

    images = jax.random.randint(rng, (b, img, img, 3), 0, 256, jnp.uint8)
    labels = jnp.asarray(np.repeat(np.arange(args.p, dtype=np.int32),
                                   args.k))

    # chained scan: each iteration's state feeds the next; the final loss
    # scalar is fetched so the tunnel cannot hide async work
    def chain(state, _):
        new_state, metrics = step(state, images, labels)
        return new_state, metrics["loss"]

    @jax.jit
    def run(state):
        return jax.lax.scan(chain, state, None, length=args.steps)

    state, losses = run(state)            # compile + warmup
    float(losses[-1])
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        state, losses = run(state)
        float(losses[-1])
        times.append((time.time() - t0) / args.steps)
    ms = min(times) * 1e3

    # isolated mining+loss fwd at the same [b, D]
    emb = jax.random.normal(rng, (b, args.embed_dim), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    key = jax.random.PRNGKey(2)

    @jax.jit
    def mine_chain(carry):
        def body(c, _):
            l = semi_hard_triplet_loss(emb + c * 1e-9, labels, args.margin,
                                       key)
            return l, l
        return jax.lax.scan(body, carry, None, length=args.steps)

    carry, ls = mine_chain(jnp.float32(0.0))
    float(ls[-1])
    t0 = time.time()
    carry, ls = mine_chain(carry)
    float(ls[-1])
    mine_ms = (time.time() - t0) / args.steps * 1e3

    print(json.dumps({
        "metric": "triplet_train_step", "backbone": args.backbone,
        "batch": b, "p": args.p, "k": args.k, "image_size": img,
        "ms_per_step": round(ms, 3),
        "images_per_sec": round(b / (ms / 1e3), 1),
        "mining_loss_ms": round(mine_ms, 4),
        "reps_ms": [round(t * 1e3, 3) for t in times],
    }), flush=True)


if __name__ == "__main__":
    main()
