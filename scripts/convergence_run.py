"""Synthetic end-to-end convergence run (the PERF.md protocol).

No CASIA/LFW data exists in this environment, so training quality is
evidenced on a synthetic identity problem: N identities, noisy copies
of per-identity prototypes (noise 35), train on most copies, verify on
HELD-OUT copies via the reference's exact 10-fold Youden protocol
(model_utils.py:416-474).

    python scripts/convergence_run.py --partial-fc 0.5   # sampled path
    python scripts/convergence_run.py                    # dense path

Two-stage fine-tune protocol (the reference NEVER trains from scratch —
backbones.py:12-26 always starts from ImageNet weights; PERF.md shows why:
from-scratch C=8192/b512 stalls at 58%. This reproduces the practice
in-framework: pretrain on a small-C problem, then fine-tune the backbone
at large C with a fresh head):

    python scripts/convergence_run.py --classes 1000 \
        --finetune-classes 8192 [--finetune-epochs 15] [--finetune-lr 0.02]

Prints one JSON line per stage with the verification result.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_split(classes, train_per_class, eval_per_class, image_size, seed,
                noise):
    """Class-major identity blocks: first train_per_class copies of each
    identity train, the rest are held out for verification."""
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)

    per = train_per_class + eval_per_class
    images, labels = synthetic_identities(
        classes, per, image_size=image_size, seed=seed, noise=noise)
    images = images.reshape(classes, per, *images.shape[1:])
    train_x = images[:, :train_per_class].reshape(-1, *images.shape[2:])
    train_y = np.repeat(np.arange(classes, dtype=np.int32), train_per_class)
    held_x = images[:, train_per_class:].reshape(-1, *images.shape[2:])
    held_y = np.repeat(np.arange(classes, dtype=np.int32), eval_per_class)
    return train_x, train_y, held_x, held_y


def _heldout_pairs(held_y, classes, eval_per_class, pairs_per_kind, seed):
    rs = np.random.RandomState(seed + 1)
    n = len(held_y)
    pos, neg = [], []
    while len(pos) < pairs_per_kind:
        c = rs.randint(classes)
        i, j = rs.choice(eval_per_class, 2, replace=False)
        pos.append((c * eval_per_class + i, c * eval_per_class + j, 1))
    while len(neg) < pairs_per_kind:
        a, b = rs.randint(n), rs.randint(n)
        if held_y[a] != held_y[b]:
            neg.append((a, b, 0))
    return np.asarray(pos + neg, np.int64)


def verify(result, held_x, held_y, classes, eval_per_class, pairs_per_kind,
           batch, seed):
    """Held-out 10-fold Youden verification on the trained backbone."""
    from face_recognition_models_tpu.evaluation.batch_eval import (
        make_embed_fn)
    from face_recognition_models_tpu.evaluation.verification import (
        embed_unique_images,
        kfold_verification,
    )

    # with --model-ema the averaged weights are the evaluation artifact
    bb = (result.state.ema_params["backbone"]
          if result.state.ema_params is not None
          else result.state.params["backbone"])
    embed = make_embed_fn(result.backbone, bb, result.state.batch_stats)
    emb = embed_unique_images(embed, held_x, batch_size=batch)

    pairs = _heldout_pairs(held_y, classes, eval_per_class, pairs_per_kind,
                           seed)
    sims = np.sum(emb[pairs[:, 0]] * emb[pairs[:, 1]], axis=1)
    return kfold_verification(sims, pairs[:, 2])


def _write_benchmark_dir(root, held_x, held_y, classes, eval_per_class,
                         pairs_per_kind, seed):
    """Materialize the held-out pairs as a <root>/heldout/{pair.list,imgs}
    benchmark so the in-training PeriodicEvalHook (the `face train
    --eval-every` path) evaluates the SAME protocol as verify()."""
    import os

    from PIL import Image

    pairs = _heldout_pairs(held_y, classes, eval_per_class, pairs_per_kind,
                           seed)
    bench = os.path.join(root, "heldout")
    imgs = os.path.join(bench, "imgs")
    os.makedirs(imgs, exist_ok=True)
    for i in sorted({int(v) for v in pairs[:, :2].ravel()}):
        Image.fromarray(held_x[i]).save(os.path.join(imgs, f"{i}.jpg"),
                                        quality=95)
    with open(os.path.join(bench, "pair.list"), "w") as f:
        for a, b, l in pairs:
            f.write(f"{a} {b} {l}\n")
    return root


def run_stage(args, classes, epochs, lr, seed, warm_start=None,
              stage="train"):
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.train.loop import fit

    train_x, train_y, held_x, held_y = build_split(
        classes, args.train_per_class, args.eval_per_class,
        args.image_size, seed, args.noise)
    cfg = cfg_lib.TrainConfig(
        backbone=args.backbone, head=args.head, num_classes=classes,
        batch_size=args.batch, epochs=epochs,
        print_freq=args.print_freq, bn_dtype=args.bn_dtype,
        scan_steps=args.scan_steps, partial_fc=args.partial_fc,
        model_ema=args.model_ema,
        optimizer=cfg_lib.OptimizerConfig(
            name=args.optimizer, learning_rate=lr,
            weight_decay=args.weight_decay),
        schedule=cfg_lib.ScheduleConfig(
            name=args.scheduler, warmup_epochs=args.warmup_epochs),
        data=cfg_lib.DataConfig(image_size=args.image_size))
    head_cfg = None
    if getattr(args, "head_arg", None):
        head_kw = cfg_lib.parse_head_overrides(args.head, args.head_arg)
        head_cfg = cfg_lib.make_head_config(args.head, num_classes=classes,
                                            **head_kw)
    loader = ArrayLoader(train_x, train_y, batch_size=args.batch, seed=seed)
    hook = None
    if getattr(args, "eval_every", 0) > 0:
        import tempfile

        from face_recognition_models_tpu.evaluation.periodic import (
            PeriodicEvalHook)
        from face_recognition_models_tpu.models import get_backbone
        root = _write_benchmark_dir(
            tempfile.mkdtemp(prefix="convbench_"), held_x, held_y, classes,
            args.eval_per_class, args.pairs_per_kind, seed)
        import jax.numpy as jnp
        hook = PeriodicEvalHook(
            get_backbone(args.backbone,
                         bn_dtype=jnp.dtype(args.bn_dtype)),
            root, ["heldout"], every=args.eval_every,
            image_size=args.image_size, batch_size=args.batch,
            total_epochs=epochs, use_ema=args.model_ema > 0.0,
            verbose=True)
    t0 = time.time()
    result = fit(cfg, loader, use_mesh=False, warm_start=warm_start,
                 hooks=hook, head_cfg=head_cfg)
    train_s = time.time() - t0

    res = verify(result, held_x, held_y, classes, args.eval_per_class,
                 args.pairs_per_kind, args.batch, seed)
    print(json.dumps({
        "metric": "synthetic_verification", "stage": stage,
        "head": args.head, "backbone": args.backbone,
        "classes": classes, "batch": args.batch, "epochs": epochs,
        "lr": lr, "optimizer": args.optimizer,
        "scheduler": args.scheduler, "partial_fc": args.partial_fc,
        "bn_dtype": args.bn_dtype, "model_ema": args.model_ema,
        **({"head_args": list(args.head_arg)}
           if getattr(args, "head_arg", None) else {}),
        "warm_started": warm_start is not None,
        "mean_accuracy": round(res.mean_accuracy, 3),
        "std_accuracy": round(res.std_accuracy, 3),
        "mean_auc": round(res.mean_auc, 5),
        "min_train_loss": round(result.min_train_loss, 4),
        "train_seconds": round(train_s, 1),
        **({"eval_every": args.eval_every,
            "val_curve": [round(r["heldout"].mean_accuracy, 3)
                          for _, r in hook.history],
            "best_val_acc": round(hook.best_acc, 3),
            "best_val_epoch": hook.best_epoch} if hook else {}),
        }), flush=True)
    return result


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
    ap.add_argument("--optimizer", default="sgd")
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--scheduler", default="customstep")
    ap.add_argument("--warmup-epochs", type=int, default=1)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--bn-dtype", choices=["float32", "bfloat16"],
                    default="float32")
    ap.add_argument("--partial-fc", type=float, default=0.0)
    ap.add_argument("--model-ema", type=float, default=0.0)
    ap.add_argument("--pairs-per-kind", type=int, default=1000)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="run the held-out verification DURING training "
                    "every N epochs via PeriodicEvalHook (the `face train "
                    "--eval-every` machinery); reports the per-epoch curve "
                    "and best-epoch accuracy")
    ap.add_argument("--head-arg", action="append", default=[],
                    help="head hyperparameter override key=value "
                    "(repeatable; same syntax as `face train --head-arg`)")
    ap.add_argument("--print-freq", type=int, default=100)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--finetune-classes", type=int, default=0,
                    help="two-stage: fine-tune the stage-1 backbone on a "
                    "DISJOINT identity set of this size (fresh head)")
    ap.add_argument("--finetune-epochs", type=int, default=None)
    ap.add_argument("--finetune-lr", type=float, default=0.02,
                    help="fine-tune stage LR (reference fine-tunes at "
                    "lower LR than from-scratch)")
    ap.add_argument("--save-backbone", default=None,
                    help="pickle the stage-1 (backbone params, batch_stats) "
                    "here so a crashed fine-tune stage can resume")
    ap.add_argument("--load-backbone", default=None,
                    help="skip stage 1: load a --save-backbone pickle and "
                    "go straight to the fine-tune stage")
    args = ap.parse_args()

    import pickle

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.load_backbone:
        with open(args.load_backbone, "rb") as f:
            warm = pickle.load(f)
    else:
        result = run_stage(args, args.classes, args.epochs, args.lr,
                           args.seed,
                           stage="pretrain" if args.finetune_classes
                           else "train")
        warm = (jax.device_get(result.state.params["backbone"]),
                jax.device_get(result.state.batch_stats))
        if args.save_backbone:
            with open(args.save_backbone, "wb") as f:
                pickle.dump(warm, f)
        del result

    if args.finetune_classes:
        run_stage(args, args.finetune_classes,
                  args.finetune_epochs or args.epochs, args.finetune_lr,
                  args.seed + 10_000, warm_start=warm, stage="finetune")


if __name__ == "__main__":
    main()
