"""Real-TPU spot-check of fused-vs-jnp training trajectories.

tests/test_fused_trajectory.py certifies all 12 FUSED_HEADS entries in
Pallas interpret mode on CPU (exact production code path, emulated
hardware). This script runs the SAME discipline on the real chip with the
kernel's production tiles for the two heads VERDICT r3 singled out —
arcface (stateless) and qaface (memory lifecycle + magnitude EMA, the
hardest state machine): 12 train steps through make_train_step with
use_fused_head=True and =False from identical state on identical batches,
comparing the loss trajectory, integer head-state leaves (exact), float
head-state leaves, and final parameters.

On hardware the two paths compile to different XLA programs around the
same bf16 backbone, so reduction orders differ; the assertions are
correspondingly looser than interpret mode's (loss rel 5e-3, float state
rtol 1e-2) and the MEASURED max deviations are printed so PERF.md can
record the actual agreement, not just the bound.

    python scripts/fused_tpu_spotcheck.py            # real TPU
    python scripts/fused_tpu_spotcheck.py --steps 12 --classes 4096
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def build(head_name, use_fused, classes, feature_dim, image):
    import jax
    import jax.numpy as jnp

    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.heads import get_head
    from face_recognition_models_tpu.models.resnet import BasicBlock, ResNet
    from face_recognition_models_tpu.train import (
        TrainState,
        get_optimizer,
        make_train_step,
    )

    cfg = cfg_lib.make_head_config(
        head_name, feature_dim=feature_dim, num_classes=classes,
        **({"delta": 3} if head_name == "qaface" else {}))
    head = get_head(head_name)
    backbone = ResNet(stage_sizes=(1, 1), block=BasicBlock,
                      embed_dim=feature_dim, num_filters=16)
    rng = jax.random.PRNGKey(42)
    variables = backbone.init(rng, jnp.zeros((1, image, image, 3)),
                              train=False)
    kernel = head.init_kernel(rng, cfg)
    params = {"backbone": variables["params"], "kernel_w": kernel}
    tx = get_optimizer("sgd", 0.05, momentum=0.9, weight_decay=5e-4)
    state = TrainState(step=jnp.int32(0),
                       params=jax.tree.map(jnp.copy, params),
                       batch_stats=variables.get("batch_stats", {}),
                       head_state=head.init_state(cfg),
                       opt_state=tx.init(params),
                       rng=jax.random.PRNGKey(7))
    return state, jax.jit(make_train_step(backbone, head, cfg, tx,
                                          use_fused_head=use_fused))


def run_head(head_name, args):
    import jax.numpy as jnp

    state_f, step_f = build(head_name, True, args.classes, args.dim,
                            args.image)
    state_j, step_j = build(head_name, False, args.classes, args.dim,
                            args.image)
    rs = np.random.RandomState(3)
    max_loss_rel = max_state_rel = 0.0
    for k in range(args.steps):
        images = rs.randint(0, 256, (args.batch, args.image, args.image, 3),
                            np.uint8)
        labels = rs.randint(0, args.classes, args.batch).astype(np.int32)
        state_f, mf = step_f(state_f, jnp.asarray(images),
                             jnp.asarray(labels))
        state_j, mj = step_j(state_j, jnp.asarray(images),
                             jnp.asarray(labels))
        lf, lj = float(mf["loss"]), float(mj["loss"])
        rel = abs(lf - lj) / max(1.0, abs(lj))
        max_loss_rel = max(max_loss_rel, rel)
        assert rel <= 5e-3, \
            f"{head_name} step {k}: fused {lf:.6f} vs jnp {lj:.6f}"

        import jax
        for lf_leaf, lj_leaf in zip(jax.tree.leaves(state_f.head_state),
                                    jax.tree.leaves(state_j.head_state)):
            a, b = np.asarray(lf_leaf), np.asarray(lj_leaf)
            if np.issubdtype(a.dtype, np.integer) or a.dtype == np.bool_:
                np.testing.assert_array_equal(
                    a, b, err_msg=f"{head_name} step {k}: integer state")
            elif a.size == 1:
                # cosine of two same-sign scalars is exactly 1.0 whatever
                # their magnitudes — scalar EMAs (QAFace muy/std,
                # CurricularFace t) need a real relative bound
                np.testing.assert_allclose(
                    a, b, rtol=1e-2, atol=1e-6,
                    err_msg=f"{head_name} step {k}: scalar head-state")
                denom = max(abs(float(a)), abs(float(b)), 1e-6)
                max_state_rel = max(max_state_rel,
                                    abs(float(a) - float(b)) / denom)
            elif a.size:
                # bf16 backbone reassociation differs per compiled program
                # on hardware, so feature-derived state (memory rows)
                # inherits that noise; cosine is the drift metric the
                # trajectory tests use for exactly this reason
                c = _cos(a, b)
                max_state_rel = max(max_state_rel, 1.0 - c)
                assert c > 0.99, \
                    f"{head_name} step {k}: float head-state cos {c:.5f}"

    # after 12 compounding steps the two paths must still be the same
    # model: per-leaf cosine (the test_trajectory_parity convention —
    # elementwise rel on near-zero BN params amplifies per-program bf16
    # noise into meaningless 10x+ 'relative' errors)
    import jax
    min_param_cos = 1.0
    for a, b in zip(jax.tree.leaves(state_f.params),
                    jax.tree.leaves(state_j.params)):
        min_param_cos = min(min_param_cos, _cos(np.asarray(a), np.asarray(b)))
    assert min_param_cos > 0.999, f"{head_name}: final params {min_param_cos}"
    return dict(max_loss_rel=float(f"{max_loss_rel:.3e}"),
                max_float_state_1m_cos=float(f"{max_state_rel:.3e}"),
                min_final_param_cos=float(f"{min_param_cos:.6f}"),
                integer_state="exact")


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0.0 and nb == 0.0:
        return 1.0
    return float(np.dot(a, b) / (na * nb + 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--classes", type=int, default=4096)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--image", type=int, default=32)
    ap.add_argument("--heads", default="arcface,qaface")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    out = {"metric": "fused_tpu_trajectory_spotcheck",
           "platform": jax.devices()[0].platform,
           "steps": args.steps, "batch": args.batch,
           "classes": args.classes, "dim": args.dim}
    for h in args.heads.split(","):
        out[h] = run_head(h, args)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
