"""Measure checkpoint-save cost: async (default) vs sync, one mode per
process (CLAUDE.md tunnel timing discipline).

The interesting number is the time `CheckpointManager.save()` steals from
the training loop at each epoch boundary. Sync mode pays device->host copy
+ serialization + disk write inline; async mode returns after enqueueing
and overlaps all of that with the next epoch's compute (the drain at the
NEXT save is ~free when the epoch is longer than the write).

Usage:
    python scripts/bench_checkpoint.py --mode async|sync [--classes 131072]
Prints one JSON line.
"""

import argparse
import json
import shutil
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["async", "sync"], required=True)
    ap.add_argument("--classes", type=int, default=131072)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.checkpoint import CheckpointManager
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import create_train_state

    cfg = cfg_lib.TrainConfig(
        backbone="resnet50", head="arcface", num_classes=args.classes,
        batch_size=8, data=cfg_lib.DataConfig(image_size=112))
    head_cfg = cfg_lib.make_head_config("arcface", num_classes=args.classes)
    _, _, state = create_train_state(cfg, head_cfg, get_optimizer("sgd", 0.1))
    nbytes = sum(x.nbytes for x in jax.tree.leaves(state)
                 if hasattr(x, "nbytes"))
    # materialize on device before timing; a value FETCH is the only
    # reliable sync through the tunnel (CLAUDE.md: block_until_ready lies)
    float(state.params["kernel_w"][0, 0])

    tmp = tempfile.mkdtemp(prefix="ckpt_bench_")
    mgr = CheckpointManager(tmp, "bench", keep=2,
                            async_save=(args.mode == "async"))
    call_times, drain_times = [], []
    try:
        for rep in range(args.reps):
            t0 = time.perf_counter()
            mgr.save(state, epoch=rep + 1, train_loss=1.0)
            t1 = time.perf_counter()
            # simulate "the next epoch trains here"; then measure what a
            # subsequent save would still have to wait for
            mgr.wait_until_finished()
            t2 = time.perf_counter()
            call_times.append(t1 - t0)
            drain_times.append(t2 - t1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # drop rep 0 (orbax warmup / first-touch)
    steal = call_times[1:] or call_times
    drain = drain_times[1:] or drain_times
    print(json.dumps({
        "mode": args.mode,
        "state_mb": round(nbytes / 1e6, 1),
        "save_call_s": round(sum(steal) / len(steal), 3),
        "drain_s": round(sum(drain) / len(drain), 3),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
