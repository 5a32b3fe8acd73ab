"""Decompose the train step's 57 ms (ResNet-50, b512, C=10,575) into parts.

PERF.md round-2 left the train step unprofiled: eval fwd is 11.4 ms/b512,
the canonical ~3x-fwd train step would be ~34-40 ms, measured is ~57 ms.
Each --mode isolates one slice of the step; run ONE mode per process
(CLAUDE.md: multi-program processes mis-time through the tunnel by up to
200x) and compare:

    for m in step fwd_eval fwd_train fwdbwd fwdbwd_nobn opt_only \
             step_nonorm step_const_lr; do
        python scripts/profile_train_step.py --mode $m; done

Modes:
  step         full train step (reference point; = bench_train_step)
  fwd_eval     inference forward (running BN stats)  [PERF.md: 11.4 ms]
  fwd_train    training forward (batch BN stats + mutable updates)
  fwdbwd       forward + backward, NO optimizer update
  fwdbwd_nobn  forward + backward with BN in inference mode (isolates the
               cost of batch-stat computation + its backward)
  opt_only     SGD update alone on the param tree (wd + momentum + apply)
  step_nonorm  full step, images pre-normalized floats (isolates the
               uint8 normalize placement)
  head_only    margin head + CE fwd+bwd at this C (isolates the head)

All timings use the scan-chained value-fetch discipline (bench.py).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

N_REPS = 3


def _timeit(jit_chunk, carry, xs, scan, sync_fn):
    carry2 = jit_chunk(carry, xs)           # compile + warmup
    sync_fn(carry2)
    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        carry2 = jit_chunk(carry2, xs)
        sync_fn(carry2)
        best = min(best, (time.perf_counter() - t0) / scan * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["step", "fwd_eval", "fwd_train", "fwdbwd",
                             "fwdbwd_nobn", "opt_only", "step_nonorm",
                             "head_only"])
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--head", default="arcface")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--classes", type=int, default=10575)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--path", choices=["auto", "fused", "jnp"],
                    default="auto")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.ops.image_ops import normalize_images
    from face_recognition_models_tpu.train.losses import mean_cross_entropy
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import create_train_state
    from face_recognition_models_tpu.train.step import make_train_step

    cfg = cfg_lib.TrainConfig(
        backbone=args.backbone, head=args.head, num_classes=args.classes,
        batch_size=args.batch,
        data=cfg_lib.DataConfig(image_size=args.image_size))
    head_cfg = cfg_lib.make_head_config(args.head, num_classes=args.classes)
    tx = get_optimizer("sgd", 0.1, momentum=0.9, weight_decay=5e-4)
    backbone, head, state = create_train_state(cfg, head_cfg, tx)

    rs = np.random.RandomState(0)
    imgs_u8 = rs.randint(0, 256, (args.scan, args.batch, args.image_size,
                                  args.image_size, 3), np.uint8)
    labels = rs.randint(0, args.classes, (args.scan, args.batch), np.int32)
    mode = args.mode

    def sync_loss(carry):
        _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[-1])

    if mode in ("step", "step_nonorm"):
        use_fused = {"auto": "auto", "fused": True, "jnp": False}[args.path]
        step_fn = make_train_step(backbone, head, head_cfg, tx,
                                  use_fused_head=use_fused)
        xs = (jnp.asarray(imgs_u8) if mode == "step"
              else normalize_images(jnp.asarray(imgs_u8)), jnp.asarray(labels))

        def chunk(carry, _):
            st = carry[1]
            def body(s, batch):
                s2, m = step_fn(s, batch[0], batch[1])
                return s2, m["loss"]
            st, losses = jax.lax.scan(body, st, xs)
            return (losses[-1] + 0 * carry[0], st)

        jit_chunk = jax.jit(chunk, donate_argnums=(0,))
        ms = _timeit(jit_chunk, (jnp.float32(0), state), None, args.scan,
                     sync_loss)

    elif mode in ("fwd_eval", "fwd_train", "fwdbwd", "fwdbwd_nobn"):
        imgs = normalize_images(jnp.asarray(imgs_u8))
        train_flag = mode in ("fwd_train", "fwdbwd")

        def fwd_loss(params, batch_stats, im):
            out = backbone.apply(
                {"params": params, "batch_stats": batch_stats}, im,
                train=train_flag,
                **({"mutable": ["batch_stats"]} if train_flag else {}))
            feats = out[0] if train_flag else out
            return jnp.sum(feats.astype(jnp.float32) ** 2)

        if mode.startswith("fwd"):
            def chunk(carry, _):
                acc, params = carry
                def body(a, im):
                    return a + fwd_loss(params, state.batch_stats, im), None
                acc, _ = jax.lax.scan(body, acc, imgs)
                return (acc, params)
        else:
            grad_fn = jax.grad(fwd_loss)

            def chunk(carry, _):
                acc, params = carry
                def body(p, im):
                    g = grad_fn(p, state.batch_stats, im)
                    # chain: tiny update keeps a real dependency
                    return jax.tree.map(lambda x, gg: x - 1e-12 * gg, p, g), None
                params, _ = jax.lax.scan(body, params, imgs)
                return (acc, params)

        jit_chunk = jax.jit(chunk, donate_argnums=(0,))

        def sync(carry):
            _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[-1])

        ms = _timeit(jit_chunk, (jnp.float32(0), state.params["backbone"]),
                     None, args.scan, sync)

    elif mode == "opt_only":
        params = state.params
        grads = jax.tree.map(jnp.ones_like, params)

        def chunk(carry, _):
            params, opt_state = carry
            def body(c, _):
                p, o = c
                updates, o2 = tx.update(jax.tree.map(
                    lambda g, pp: g + 1e-12 * pp, grads, p), o, p)
                return (optax.apply_updates(p, updates), o2), None
            (params, opt_state), _ = jax.lax.scan(
                body, (params, opt_state), None, length=args.scan)
            return (params, opt_state)

        jit_chunk = jax.jit(chunk, donate_argnums=(0,))

        def sync(carry):
            _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[0])

        ms = _timeit(jit_chunk, (params, tx.init(params)), None, args.scan,
                     sync)

    elif mode == "head_only":
        from face_recognition_models_tpu.heads.fused_adapter import (
            fused_apply, fused_wins)
        kernel = state.params["kernel_w"]
        feats0 = 10.0 * jax.random.normal(jax.random.PRNGKey(1),
                                          (args.batch, 512), jnp.float32)
        lab = jnp.asarray(labels[0])
        use_fused = fused_wins(args.head, args.classes) \
            if args.path == "auto" else args.path == "fused"

        def loss(kernel, feats):
            if use_fused:
                out = fused_apply(head_cfg, kernel, feats, lab,
                                  state.head_state,
                                  rng=jax.random.PRNGKey(0))
                return out.loss_id
            out = head.apply(head_cfg, kernel, feats, lab, state.head_state,
                             rng=jax.random.PRNGKey(0))
            return mean_cross_entropy(out.logits, lab)

        vag = jax.value_and_grad(loss, argnums=(0, 1))

        def chunk(carry, _):
            k, f = carry
            def body(c, _):
                kk, ff = c
                _, (gk, gf) = vag(kk, ff)
                return (kk - 1e-12 * gk, ff - 1e-12 * gf), None
            (k, f), _ = jax.lax.scan(body, (k, f), None, length=args.scan)
            return (k, f)

        jit_chunk = jax.jit(chunk, donate_argnums=(0,))

        def sync(carry):
            _ = float(np.asarray(carry[0]).reshape(-1)[0])

        ms = _timeit(jit_chunk, (kernel, feats0), None, args.scan, sync)

    print(json.dumps({"metric": "train_step_profile", "mode": mode,
                      "backbone": args.backbone, "head": args.head,
                      "batch": args.batch, "classes": args.classes,
                      "ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
