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
  fwdbwd_head  full LOSS (backbone + head + CE) fwd+bwd, no optimizer /
               metrics — brackets the step tail (supports --bf16-bn)
  opt_only     SGD update alone on the param tree (wd + momentum + apply)
  step_nonorm  full step, images pre-normalized floats (isolates the
               uint8 normalize placement)
  head_only    margin head + CE fwd+bwd at this C (isolates the head)

All timings use the scan-chained value-fetch discipline (bench.py).
"""

from __future__ import annotations

import argparse
from functools import partial
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
                             "fwdbwd_nobn", "fwdbwd_bf16bn", "fwdbwd_head",
                             "opt_only", "step_nonorm", "head_only",
                             "stage"])
    ap.add_argument("--stage", default="layer3",
                    choices=["layer1", "layer2", "layer3", "layer4"])
    ap.add_argument("--bf16-bn", action="store_true")
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
        bn_dtype="bfloat16" if args.bf16_bn else "float32",
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
        # xs passed as an ARGUMENT, not a closure: the tunnel serializes
        # closures into the compile request (771 MB of normalized fp32
        # images → HTTP 413 "length limit exceeded").
        xs = (jnp.asarray(imgs_u8) if mode == "step"
              else jax.jit(normalize_images)(jnp.asarray(imgs_u8)),
              jnp.asarray(labels))

        def chunk(carry, xs):
            st = carry[1]
            def body(s, batch):
                s2, m = step_fn(s, batch[0], batch[1])
                return s2, m["loss"]
            st, losses = jax.lax.scan(body, st, xs)
            return (losses[-1] + 0 * carry[0], st)

        jit_chunk = jax.jit(chunk, donate_argnums=(0,))
        ms = _timeit(jit_chunk, (jnp.float32(0), state), xs, args.scan,
                     sync_loss)

    elif mode == "fwdbwd_head":
        # The full training LOSS (normalize -> backbone train-mode ->
        # margin head -> CE), grads over backbone + kernel, NO optimizer
        # update and NO metrics: brackets the step's tail between head
        # cost (vs fwdbwd) and optimizer/plumbing (vs step).
        if args.bf16_bn:
            from face_recognition_models_tpu.models import resnet
            assert args.backbone == "resnet50"
            backbone = resnet.resnet50().clone(bn_dtype=jnp.bfloat16)
        xs_u8 = jnp.asarray(imgs_u8)
        lab0 = jnp.asarray(labels[0])

        def full_loss(params, im_u8):
            im = normalize_images(im_u8)
            feats, _ = backbone.apply(
                {"params": params["backbone"],
                 "batch_stats": state.batch_stats}, im,
                train=True, mutable=["batch_stats"])
            out = head.apply(head_cfg, params["kernel_w"],
                             feats.astype(jnp.float32), lab0,
                             state.head_state, rng=jax.random.PRNGKey(0))
            return mean_cross_entropy(out.logits, lab0)

        grad_fn = jax.grad(full_loss)

        def chunk(carry, xs):
            acc, params = carry
            def body(p, im_u8):
                g = grad_fn(p, im_u8)
                return jax.tree.map(lambda x, gg: x - 1e-12 * gg, p, g), None
            params, _ = jax.lax.scan(body, params, xs)
            return (acc, params)

        jit_chunk = jax.jit(chunk, donate_argnums=(0,))

        def sync(carry):
            _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[-1])

        ms = _timeit(jit_chunk,
                     (jnp.float32(0), {"backbone": state.params["backbone"],
                                       "kernel_w": state.params["kernel_w"]}),
                     xs_u8, args.scan, sync)

    elif mode in ("fwd_eval", "fwd_train", "fwdbwd", "fwdbwd_nobn",
                  "fwdbwd_bf16bn"):
        if mode == "fwdbwd_bf16bn":
            # same params, BN compute in bf16 — prices the fp32 cast chains
            from face_recognition_models_tpu.models import resnet
            assert args.backbone == "resnet50"
            backbone = resnet.resnet50().clone(bn_dtype=jnp.bfloat16)
        # Mirror mode=step's working structure exactly: uint8 images enter
        # the jitted chunk as scan xs and are normalized inside. (An earlier
        # version closed over a 771 MB eagerly-normalized constant — that
        # hangs >10 min through the tunnel.)
        xs_u8 = jnp.asarray(imgs_u8)
        train_flag = mode in ("fwd_train", "fwdbwd")

        def fwd_loss(params, batch_stats, im_u8):
            im = normalize_images(im_u8)
            out = backbone.apply(
                {"params": params, "batch_stats": batch_stats}, im,
                train=train_flag,
                **({"mutable": ["batch_stats"]} if train_flag else {}))
            feats = out[0] if train_flag else out
            return jnp.sum(feats.astype(jnp.float32) ** 2)

        if mode in ("fwd_eval", "fwd_train"):
            def chunk(carry, xs):
                acc, params = carry
                def body(a, im_u8):
                    return a + fwd_loss(params, state.batch_stats, im_u8), None
                acc, _ = jax.lax.scan(body, acc, xs)
                return (acc, params)
        else:
            grad_fn = jax.grad(fwd_loss)

            def chunk(carry, xs):
                acc, params = carry
                def body(p, im_u8):
                    g = grad_fn(p, state.batch_stats, im_u8)
                    # chain: tiny update keeps a real dependency
                    return jax.tree.map(lambda x, gg: x - 1e-12 * gg, p, g), None
                params, _ = jax.lax.scan(body, params, xs)
                return (acc, params)

        jit_chunk = jax.jit(chunk, donate_argnums=(0,))

        def sync(carry):
            _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[-1])

        ms = _timeit(jit_chunk, (jnp.float32(0), state.params["backbone"]),
                     xs_u8, args.scan, sync)

    elif mode == "stage":
        # fwd+bwd of ONE ResNet-50 stage at its in-network shape (112px
        # input: conv1+pool -> 28x28x64; layer1 28^2 -> layer4 4^2).
        import flax.linen as nn

        from face_recognition_models_tpu.models import resnet

        stage_shapes = {  # name: (in_hw, in_c, filters, n_blocks, stride)
            "layer1": (28, 64, 64, 3, 1),
            "layer2": (28, 256, 128, 4, 2),
            "layer3": (14, 512, 256, 6, 2),
            "layer4": (7, 1024, 512, 3, 2),
        }
        hw, c_in, filt, n_blocks, stride0 = stage_shapes[args.stage]
        bn_dtype = jnp.bfloat16 if args.bf16_bn else jnp.float32

        class Stage(nn.Module):
            @nn.compact
            def __call__(self, x):
                conv = partial(nn.Conv, use_bias=False, dtype=jnp.bfloat16,
                               param_dtype=jnp.float32)
                norm = partial(nn.BatchNorm, use_running_average=True,
                               momentum=0.9, epsilon=1e-5, dtype=bn_dtype,
                               param_dtype=jnp.float32)
                for j in range(n_blocks):
                    x = resnet.Bottleneck(
                        filters=filt, stride=stride0 if j == 0 else 1,
                        conv=conv, norm=norm, dtype=jnp.bfloat16,
                        name=f"b{j}")(x)
                    x = x.astype(jnp.bfloat16)
                return x

        stage = Stage()
        x0 = jnp.asarray(rs.randn(args.batch, hw, hw, c_in), jnp.bfloat16)
        variables = stage.init(jax.random.PRNGKey(0), x0)
        params = variables["params"]

        def loss(p, x):
            out = stage.apply({"params": p,
                               "batch_stats": variables["batch_stats"]}, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grad_fn = jax.grad(loss)

        def chunk(carry, _):
            p, x = carry
            def body(c, _):
                pp, xx = c
                g = grad_fn(pp, xx)
                return (jax.tree.map(lambda a, b: a - 1e-12 * b, pp, g),
                        xx), None
            (p, x), _ = jax.lax.scan(body, (p, x), None, length=args.scan)
            return (p, x)

        jit_chunk = jax.jit(chunk, donate_argnums=(0,))

        def sync(carry):
            _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[0])

        ms = _timeit(jit_chunk, (params, x0), None, args.scan, sync)
        print(json.dumps({"metric": "train_step_profile", "mode": "stage",
                          "stage": args.stage, "bf16_bn": args.bf16_bn,
                          "batch": args.batch, "ms": round(ms, 2)}))
        return

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
                      "bf16_bn": args.bf16_bn, "ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
