"""Re-measure the fused-kernel dispatch table on the CURRENT platform.

The `use_pallas_head="auto"` dispatch (heads/fused_adapter.py:
_FUSED_FASTER_SMALL_C / _BIG_C) is a frozen table of v5e measurements. On
any other TPU generation the "never slower than XLA" promise needs
re-verification — this script reproduces the measurement and emits the
constants for the current chip.

Child mode (one (head, C, path) per process — multi-program processes
produce timings wrong by up to 200x through the remote tunnel, CLAUDE.md):

    python scripts/bench_fused_table.py --head arcface --classes 10575 \
        --path fused

Orchestrator mode (spawns one child per config, prints the speedup table
and the suggested fused_adapter constants; ~40 child processes x one
compile each, so expect ~20-30 min on a remote-tunnel TPU):

    python scripts/bench_fused_table.py --all [--classes 10575,131072]

The measured quantity matches the PERF.md "isolated head" rows: fwd+bwd of
margin-head + CE at N=512, D=512 (grads wrt kernel AND features — exactly
the head's contribution to a train step), scan-chained with a real value
dependency and float() fetches to synchronize.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

N, D = 512, 512
DEFAULT_CLASSES = (10575, 131072)


def run_child(head_name: str, num_classes: int, path: str, scan: int,
              reps: int) -> None:
    import jax
    import jax.numpy as jnp

    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.heads import get_head
    from face_recognition_models_tpu.heads.fused_adapter import fused_apply
    from face_recognition_models_tpu.train.losses import mean_cross_entropy

    cfg = cfg_lib.make_head_config(head_name, feature_dim=D,
                                   num_classes=num_classes)
    head = get_head(head_name)
    rng = jax.random.PRNGKey(0)
    kernel = head.init_kernel(rng, cfg)
    state = head.init_state(cfg)
    feats0 = 10.0 * jax.random.normal(jax.random.PRNGKey(1), (N, D),
                                      jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, num_classes)
    needs_minput = head.requires_minput

    def loss_fused(kernel, feats, state, key):
        out = fused_apply(cfg, kernel, feats, labels, state, rng=key,
                          minput=feats if needs_minput else None)
        return out.loss_id + out.loss_g, out.state

    def loss_jnp(kernel, feats, state, key):
        out = head.apply(cfg, kernel, feats, labels, state, rng=key,
                         minput=feats if needs_minput else None)
        return mean_cross_entropy(out.logits, labels) + out.loss_g, out.state

    loss_fn = loss_fused if path == "fused" else loss_jnp
    vag = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def chunk(carry, keys):
        def body(c, key):
            kernel, feats, state = c
            (loss, new_state), (gk, gf) = vag(kernel, feats, state, key)
            # real value dependency so scan can't dead-code or overlap reps
            return ((kernel - 1e-12 * gk, feats - 1e-12 * gf, new_state),
                    loss)
        return jax.lax.scan(body, carry, keys)

    jit_chunk = jax.jit(chunk, donate_argnums=(0,))
    keys = jax.random.split(jax.random.PRNGKey(3), scan)
    carry = (kernel, feats0, state)

    carry, losses = jit_chunk(carry, keys)          # compile + warmup
    _ = float(np.asarray(losses)[-1])

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, losses = jit_chunk(carry, keys)
        _ = float(np.asarray(losses)[-1])           # sync fetch
        best = min(best, (time.perf_counter() - t0) / scan * 1e3)
    print(json.dumps({"metric": "head_step", "head": head_name,
                      "classes": num_classes, "path": path,
                      "ms_per_step": round(best, 3)}))


def run_all(classes, scan, reps) -> None:
    from face_recognition_models_tpu.heads.fused_adapter import FUSED_HEADS

    results = {}
    for head_name in FUSED_HEADS:
        for c in classes:
            for path in ("jnp", "fused"):
                cmd = [sys.executable, __file__, "--head", head_name,
                       "--classes", str(c), "--path", path,
                       "--scan", str(scan), "--reps", str(reps)]
                out = subprocess.run(cmd, capture_output=True, text=True)
                line = [l for l in out.stdout.splitlines()
                        if l.startswith("{")]
                if out.returncode != 0 or not line:
                    print(f"# FAILED {head_name} C={c} {path}: "
                          f"{out.stderr.strip().splitlines()[-1:]}")
                    continue
                rec = json.loads(line[-1])
                results[(head_name, c, path)] = rec["ms_per_step"]
                print(line[-1])

    small_c, big_c = min(classes), max(classes)
    faster_small, faster_big = [], []
    print("\n# head, C: jnp ms / fused ms -> speedup")
    for head_name in FUSED_HEADS:
        for c in classes:
            jnp_ms = results.get((head_name, c, "jnp"))
            fused_ms = results.get((head_name, c, "fused"))
            if not jnp_ms or not fused_ms:
                continue
            sp = jnp_ms / fused_ms
            print(f"# {head_name:16s} C={c:7d}: {jnp_ms:7.3f} / "
                  f"{fused_ms:7.3f} -> {sp:.2f}x")
            if sp > 1.0:
                (faster_small if c == small_c else faster_big).append(
                    head_name)
    print("\n# Suggested heads/fused_adapter.py constants for this platform:")
    print(f"_FUSED_FASTER_SMALL_C = frozenset({tuple(sorted(faster_small))})")
    if len(classes) > 1:
        not_big = set(FUSED_HEADS) - set(faster_big)
        if not_big:
            print(f"# NOTE: fused did NOT win at C={big_c} for "
                  f"{sorted(not_big)} — revisit _BIG_C={big_c} for this "
                  "platform")
        else:
            print(f"_BIG_C = 32768  # fused wins for every head at "
                  f"C={big_c} (as on v5e)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--head")
    ap.add_argument("--classes", default=None,
                    help="int (child) or comma list (--all)")
    ap.add_argument("--path", choices=["fused", "jnp"])
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.all:
        classes = (tuple(int(c) for c in args.classes.split(","))
                   if args.classes else DEFAULT_CLASSES)
        run_all(classes, args.scan, args.reps)
    else:
        if not (args.head and args.classes and args.path):
            ap.error("child mode needs --head, --classes, --path")
        run_child(args.head, int(args.classes), args.path, args.scan,
                  args.reps)


if __name__ == "__main__":
    main()
