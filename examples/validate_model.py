"""Model validation — script equivalent of the reference's
validate_model.ipynb (which calls deleted APIs): load a trained checkpoint,
tune the verification threshold, and run the 10-fold protocol on one
benchmark.

Usage:
    python examples/validate_model.py --checkpoint-dir work/checkpoints/arcface \
        --backbone resnet18 --bench-root /data/face_evaluation_data/lfw
"""

import argparse

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--backbone", default="resnet18")
    ap.add_argument("--bench-root", required=True)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--batch-size", type=int, default=256)
    args = ap.parse_args()

    from face_recognition_models_tpu.checkpoint import CheckpointManager
    from face_recognition_models_tpu.evaluation.batch_eval import (
        evaluate_model_on_benchmark)
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.train.step import make_eval_step

    model = get_backbone(args.backbone)
    dummy = np.zeros((1, args.image_size, args.image_size, 3), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           dummy, train=False)
    import os
    finals = [d for d in os.listdir(args.checkpoint_dir)
              if d.endswith("_final")]
    if not finals:
        raise SystemExit(f"no *_final checkpoint in {args.checkpoint_dir}")
    mgr = CheckpointManager(args.checkpoint_dir,
                            finals[0][:-len("_final")])
    restored = mgr.restore_final({
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {})})

    eval_step = jax.jit(make_eval_step(model))
    embed = lambda imgs: eval_step(restored["params"],
                                   restored["batch_stats"], imgs)
    import os
    bench_parent, bench_name = os.path.split(args.bench_root.rstrip("/"))
    res = evaluate_model_on_benchmark(embed, bench_parent, bench_name,
                                      args.image_size, args.batch_size)
    print(res)
    print("fold thresholds:", [f"{t:.4f}" for t in res.fold_thresholds])


if __name__ == "__main__":
    main()
