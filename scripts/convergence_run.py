"""Synthetic end-to-end convergence run (the PERF.md protocol).

No CASIA/LFW data exists in this environment, so training quality is
evidenced on a synthetic identity problem: 500 identities, noisy copies
of per-identity prototypes (noise 35), train on most copies, verify on
HELD-OUT copies via the reference's exact 10-fold Youden protocol
(model_utils.py:416-474).

    python scripts/convergence_run.py --partial-fc 0.5   # sampled path
    python scripts/convergence_run.py                    # dense path

Prints one JSON line with the verification result.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=500)
    ap.add_argument("--train-per-class", type=int, default=16)
    ap.add_argument("--eval-per-class", type=int, default=4)
    ap.add_argument("--noise", type=float, default=35.0)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--backbone", default="resnet18")
    ap.add_argument("--head", default="arcface")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--partial-fc", type=float, default=0.0)
    ap.add_argument("--pairs-per-kind", type=int, default=1000)
    ap.add_argument("--print-freq", type=int, default=100)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.evaluation.batch_eval import (
        make_embed_fn)
    from face_recognition_models_tpu.evaluation.verification import (
        embed_unique_images,
        kfold_verification,
    )
    from face_recognition_models_tpu.train.loop import fit

    per = args.train_per_class + args.eval_per_class
    images, labels = synthetic_identities(
        args.classes, per, image_size=args.image_size, seed=args.seed,
        noise=args.noise)
    # class-major blocks: first train_per_class of each identity train,
    # the rest are held out for verification
    images = images.reshape(args.classes, per, *images.shape[1:])
    train_x = images[:, :args.train_per_class].reshape(
        -1, *images.shape[2:])
    train_y = np.repeat(np.arange(args.classes, dtype=np.int32),
                        args.train_per_class)
    held_x = images[:, args.train_per_class:].reshape(-1, *images.shape[2:])
    held_y = np.repeat(np.arange(args.classes, dtype=np.int32),
                       args.eval_per_class)

    cfg = cfg_lib.TrainConfig(
        backbone=args.backbone, head=args.head, num_classes=args.classes,
        batch_size=args.batch, epochs=args.epochs,
        print_freq=args.print_freq,
        scan_steps=args.scan_steps, partial_fc=args.partial_fc,
        optimizer=cfg_lib.OptimizerConfig(learning_rate=args.lr),
        data=cfg_lib.DataConfig(image_size=args.image_size))
    loader = ArrayLoader(train_x, train_y, batch_size=args.batch,
                         seed=args.seed)
    t0 = time.time()
    result = fit(cfg, loader, use_mesh=False)
    train_s = time.time() - t0

    embed = make_embed_fn(result.backbone,
                          result.state.params["backbone"],
                          result.state.batch_stats)
    emb = embed_unique_images(embed, held_x, batch_size=args.batch)

    rs = np.random.RandomState(args.seed + 1)
    n = len(held_y)
    pos, neg = [], []
    while len(pos) < args.pairs_per_kind:
        c = rs.randint(args.classes)
        i, j = rs.choice(args.eval_per_class, 2, replace=False)
        pos.append((c * args.eval_per_class + i,
                    c * args.eval_per_class + j, 1))
    while len(neg) < args.pairs_per_kind:
        a, b = rs.randint(n), rs.randint(n)
        if held_y[a] != held_y[b]:
            neg.append((a, b, 0))
    pairs = np.asarray(pos + neg, np.int64)
    sims = np.sum(emb[pairs[:, 0]] * emb[pairs[:, 1]], axis=1)
    res = kfold_verification(sims, pairs[:, 2])
    print(json.dumps({
        "metric": "synthetic_verification",
        "head": args.head, "backbone": args.backbone,
        "partial_fc": args.partial_fc,
        "mean_accuracy": round(res.mean_accuracy, 3),
        "std_accuracy": round(res.std_accuracy, 3),
        "mean_auc": round(res.mean_auc, 5),
        "min_train_loss": round(result.min_train_loss, 4),
        "train_seconds": round(train_s, 1)}))


if __name__ == "__main__":
    main()
