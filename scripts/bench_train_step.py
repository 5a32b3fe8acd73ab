"""Train-step throughput benchmark (one config per process — CLAUDE.md).

Measures the FULL jitted train step (fwd + bwd + SGD update, bf16
backbone, fp32 head math) on the current default device, with the tunnel-
safe timing discipline: K steps per dispatch via lax.scan with the
TrainState chained through (a real dependency), loss fetched with
float() to synchronize.

    python scripts/bench_train_step.py --backbone resnet50 --head arcface \
        --batch 512 --classes 1048576 --scan 8 --reps 3 --path auto

Prints one JSON line per repetition plus a `best` summary line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--head", default="arcface")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--classes", type=int, default=10575)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--scan", type=int, default=8,
                    help="steps per dispatch (lax.scan)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--path", choices=["auto", "fused", "jnp"],
                    default="auto")
    ap.add_argument("--partial-fc", type=float, default=0.0,
                    help="Partial-FC negative sample ratio (0 = dense)")
    ap.add_argument("--freeze", action="store_true",
                    help="freeze_backbone linear-probe step")
    ap.add_argument("--augs", action="store_true",
                    help="enable the full on-device augmentation chain "
                    "(flip + crop-pad 4 + jitter 0.4 + erasing 0.25)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import create_train_state
    from face_recognition_models_tpu.train.step import make_train_step

    cfg = cfg_lib.TrainConfig(
        backbone=args.backbone, head=args.head, num_classes=args.classes,
        batch_size=args.batch,
        data=cfg_lib.DataConfig(image_size=args.image_size))
    head_cfg = cfg_lib.make_head_config(args.head,
                                        num_classes=args.classes)
    tx = get_optimizer("sgd", 0.1, momentum=0.9, weight_decay=5e-4)
    backbone, head, state = create_train_state(cfg, head_cfg, tx)
    has_dropout = args.backbone in ("efficientnet_b0", "mobilenet_v2")
    if args.partial_fc > 0.0:
        from face_recognition_models_tpu.train.partial_fc import (
            init_partial_fc_opt_state,
            make_partial_fc_train_step,
            num_sampled_classes,
        )
        n_sampled = num_sampled_classes(args.classes, args.partial_fc,
                                        args.batch)
        print(json.dumps({"metric": "partial_fc_sampled",
                          "value": n_sampled, "unit": "classes"}))
        state = state.replace(
            opt_state=init_partial_fc_opt_state(tx, state.params))
        step_fn = make_partial_fc_train_step(
            backbone, head, head_cfg, tx, n_sampled, learning_rate=0.1,
            has_dropout=has_dropout)
    else:
        use_fused = {"auto": "auto", "fused": True, "jnp": False}[args.path]
        aug_kw = (dict(horizontal_flip=True, crop_pad=4, color_jitter=0.4,
                       random_erasing=0.25) if args.augs else {})
        step_fn = make_train_step(
            backbone, head, head_cfg, tx,
            has_dropout=has_dropout,
            use_fused_head=use_fused, freeze_backbone=args.freeze,
            **aug_kw)

    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (args.scan, args.batch, args.image_size,
                                 args.image_size, 3), np.uint8)
    labels = rs.randint(0, args.classes,
                        (args.scan, args.batch), np.int32)
    needs_minput = head.requires_minput

    def chunk(state, im_k, lb_k):
        def body(st, batch):
            im, lb = batch
            if needs_minput:
                return step_fn(st, im, lb, im)
            return step_fn(st, im, lb)
        return jax.lax.scan(body, state, (im_k, lb_k))

    jit_chunk = jax.jit(chunk, donate_argnums=(0,))
    im_d, lb_d = jax.device_put(images), jax.device_put(labels)

    # warmup (compile) — fetch to synchronize through the tunnel
    state, metrics = jit_chunk(state, im_d, lb_d)
    _ = float(np.asarray(metrics["loss"])[-1])

    best = float("inf")
    for rep in range(args.reps):
        t0 = time.perf_counter()
        state, metrics = jit_chunk(state, im_d, lb_d)
        _ = float(np.asarray(metrics["loss"])[-1])  # sync
        dt = time.perf_counter() - t0
        ms_per_step = dt / args.scan * 1e3
        best = min(best, ms_per_step)
        print(json.dumps({
            "metric": "train_step", "rep": rep,
            "backbone": args.backbone, "head": args.head,
            "path": args.path, "batch": args.batch,
            "classes": args.classes,
            "ms_per_step": round(ms_per_step, 2),
            "img_per_sec": round(args.batch / ms_per_step * 1e3, 1)}))
    print(json.dumps({
        "metric": "train_step_best", "backbone": args.backbone,
        "head": args.head, "path": args.path, "batch": args.batch,
        "classes": args.classes, "ms_per_step": round(best, 2),
        "img_per_sec": round(args.batch / best * 1e3, 1)}))


if __name__ == "__main__":
    main()
