"""FaceNet triplet-path convergence on the synthetic protocol (PERF.md).

Same identity split and held-out 10-fold Youden verification as
scripts/convergence_run.py, but trained through the triplet pipeline:
PK-sampled batches -> semi-hard mining -> triplet loss (triplet/train.py;
the subproject the reference left as a stub, FaceNet/main.py:151-154).

    python scripts/facenet_convergence.py [--classes 500] [--epochs 15]

Prints one JSON line with the verification result and throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from convergence_run import _heldout_pairs, build_split  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=500)
    ap.add_argument("--train-per-class", type=int, default=16)
    ap.add_argument("--eval-per-class", type=int, default=4)
    ap.add_argument("--noise", type=float, default=35.0)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--backbone", default="resnet18")
    ap.add_argument("--embed-dim", type=int, default=128)
    ap.add_argument("--p", type=int, default=16)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--margin", type=float, default=0.2)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--pairs-per-kind", type=int, default=1000)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from face_recognition_models_tpu.config import FaceNetConfig
    from face_recognition_models_tpu.evaluation.batch_eval import (
        make_embed_fn)
    from face_recognition_models_tpu.evaluation.verification import (
        embed_unique_images,
        kfold_verification,
    )
    from face_recognition_models_tpu.triplet import train_facenet

    train_x, train_y, held_x, held_y = build_split(
        args.classes, args.train_per_class, args.eval_per_class,
        args.image_size, args.seed, args.noise)

    cfg = FaceNetConfig(backbone=args.backbone, embed_dim=args.embed_dim,
                        p=args.p, k=args.k, margin=args.margin,
                        learning_rate=args.lr)
    t0 = time.time()
    result = train_facenet(cfg, train_x, train_y, epochs=args.epochs,
                           image_size=args.image_size, seed=args.seed,
                           verbose=True, checkpoint_dir=args.checkpoint_dir)
    train_s = time.time() - t0

    embed = make_embed_fn(result.model, result.state.params,
                          result.state.batch_stats)
    emb = embed_unique_images(embed, held_x, batch_size=256)
    pairs = _heldout_pairs(held_y, args.classes, args.eval_per_class,
                           args.pairs_per_kind, args.seed)
    sims = np.sum(emb[pairs[:, 0]] * emb[pairs[:, 1]], axis=1)
    res = kfold_verification(sims, pairs[:, 2])

    print(json.dumps({
        "metric": "facenet_synthetic_verification",
        "backbone": args.backbone, "embed_dim": args.embed_dim,
        "classes": args.classes, "p": args.p, "k": args.k,
        "margin": args.margin, "epochs": args.epochs, "lr": args.lr,
        "mean_accuracy": round(res.mean_accuracy, 3),
        "std_accuracy": round(res.std_accuracy, 3),
        "mean_auc": round(res.mean_auc, 5),
        "final_loss": round(float(np.mean(result.losses[-10:])), 4),
        "images_per_sec": round(result.images_per_sec, 1),
        "train_seconds": round(train_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
