"""Fused Pallas margin+CE kernel vs the jnp reference path: loss, metrics,
state updates, and gradients must match to fp32 tolerance (interpret mode
on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import get_head
from face_recognition_models_tpu.heads.fused_adapter import (
    FUSED_HEADS,
    fused_apply,
)
from face_recognition_models_tpu.train.losses import mean_cross_entropy
from face_recognition_models_tpu.train.metrics import topk_accuracy

N, D, C = 24, 64, 100  # C deliberately not a multiple of block_c


def _setup(name, seed=0):
    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C)
    head = get_head(name)
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    kernel = head.init_kernel(k1, cfg)
    state = head.init_state(cfg)
    feats = 10.0 * jax.random.normal(k2, (N, D), jnp.float32)
    labels = jax.random.randint(k2, (N,), 0, C)
    return cfg, head, kernel, state, feats, labels, k3


def _jnp_loss(cfg, head, kernel, feats, labels, state, rng):
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    loss_id = mean_cross_entropy(out.logits, labels)
    acc1, acc5 = topk_accuracy(out.pre_logits, labels)
    return loss_id, out.loss_g, acc1, acc5, out.state


@pytest.mark.parametrize("name", FUSED_HEADS)
def test_fused_matches_jnp_forward(name):
    cfg, head, kernel, state, feats, labels, rng = _setup(name)
    loss_ref, loss_g_ref, acc1_ref, acc5_ref, state_ref = _jnp_loss(
        cfg, head, kernel, feats, labels, state, rng)
    out = fused_apply(cfg, kernel, feats, labels, state, rng=rng,
                      block_n=16, block_c=64, interpret=True)
    np.testing.assert_allclose(float(out.loss_id), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(out.loss_g), float(loss_g_ref),
                               rtol=1e-5, atol=1e-6)
    assert float(out.acc1) == float(acc1_ref)
    assert float(out.acc5) == float(acc5_ref)
    # state equivalence
    for a, b in zip(jax.tree.leaves(out.state), jax.tree.leaves(state_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


@pytest.mark.parametrize("name", ["cosface", "arcface", "curricularface",
                                  "mv_softmax", "magface", "adaface",
                                  "sphereface", "combined_margin"])
def test_fused_matches_jnp_gradients(name):
    cfg, head, kernel, state, feats, labels, rng = _setup(name, seed=1)

    def loss_jnp(kernel, feats):
        loss_id, loss_g, *_ = _jnp_loss(cfg, head, kernel, feats, labels,
                                        state, rng)
        return loss_id + 0.1 * loss_g

    def loss_fused(kernel, feats):
        out = fused_apply(cfg, kernel, feats, labels, state, rng=rng,
                          block_n=16, block_c=64, interpret=True)
        return out.loss_id + 0.1 * out.loss_g

    gk_ref, gf_ref = jax.grad(loss_jnp, argnums=(0, 1))(kernel, feats)
    gk, gf = jax.grad(loss_fused, argnums=(0, 1))(kernel, feats)
    # atol 2e-6: acos-based margins (combined_margin) have a steep
    # d/dt cos(m1*acos(t)) near |t|->1; the two paths evaluate it in a
    # different op order and land ~1.5e-6 apart on isolated elements.
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=5e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                               rtol=5e-4, atol=2e-6)


def test_fused_elastic_same_rng_matches():
    """Elastic heads sample per-row margins; with the same key both paths
    must agree."""
    for name in ("elastic_cosface", "elastic_arcface"):
        cfg, head, kernel, state, feats, labels, rng = _setup(name, seed=2)
        loss_ref, *_ = _jnp_loss(cfg, head, kernel, feats, labels, state,
                                 rng)
        out = fused_apply(cfg, kernel, feats, labels, state, rng=rng,
                          block_n=16, block_c=64, interpret=True)
        np.testing.assert_allclose(float(out.loss_id), float(loss_ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_train_step_matches_jnp_train_step():
    """Full train-step equivalence over several steps (params drift must
    stay in fp32 noise)."""
    from face_recognition_models_tpu.models.resnet import BasicBlock, ResNet
    from face_recognition_models_tpu.train import (
        TrainState,
        get_optimizer,
        make_train_step,
    )

    cfg = cfg_lib.make_head_config("arcface", feature_dim=32, num_classes=C)
    head = get_head("arcface")
    backbone = ResNet(stage_sizes=(1, 1), block=BasicBlock, embed_dim=32,
                      num_filters=8, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = backbone.init(rng, jnp.zeros((1, 16, 16, 3)), train=False)
    kernel = head.init_kernel(rng, cfg)
    params = {"backbone": variables["params"], "kernel_w": kernel}

    def build(use_fused):
        tx = get_optimizer("sgd", 0.05, momentum=0.9, weight_decay=5e-4)
        state = TrainState(step=jnp.int32(0), params=jax.tree.map(jnp.copy, params),
                           batch_stats=variables.get("batch_stats", {}),
                           head_state=None, opt_state=tx.init(params),
                           rng=jax.random.PRNGKey(1))
        # interpret mode so the pallas path runs on CPU
        if use_fused:
            from face_recognition_models_tpu.heads import fused_adapter as fa
            from unittest import mock
            step_raw = make_train_step(backbone, head, cfg, tx,
                                       use_fused_head=True)
            return state, step_raw
        return state, make_train_step(backbone, head, cfg, tx)

    # monkeypatch fused_apply default to interpret mode on CPU
    import face_recognition_models_tpu.heads.fused_adapter as fa
    orig = fa.fused_apply
    def fused_interp(*args, **kw):
        kw.setdefault("interpret", True)
        kw.setdefault("block_n", 16)
        kw.setdefault("block_c", 64)
        return orig(*args, **kw)
    fa.fused_apply = fused_interp
    try:
        import face_recognition_models_tpu.train.step as step_mod
        state_f, step_f = build(True)
        state_j, step_j = build(False)
        images = jax.random.randint(rng, (16, 16, 16, 3), 0, 256, jnp.uint8)
        labels = jax.random.randint(rng, (16,), 0, C)
        for i in range(3):
            state_f, mf = step_f(state_f, images, labels)
            state_j, mj = step_j(state_j, images, labels)
            np.testing.assert_allclose(float(mf["loss"]), float(mj["loss"]),
                                       rtol=1e-4)
            # acc may differ by one sample: the kernel's target cosine is a
            # row-gather dot, the jnp path's is the matmul row — last-ulp
            # ties can break differently (metrics only).
            assert abs(float(mf["acc1"]) - float(mj["acc1"])) <= 100.0 / 16
            assert abs(float(mf["acc5"]) - float(mj["acc5"])) <= 100.0 / 16
        # parameters after 3 steps agree
        for a, b in zip(jax.tree.leaves(state_f.params),
                        jax.tree.leaves(state_j.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
    finally:
        fa.fused_apply = orig


def test_bf16_matmul_variant_close():
    """mm_dtype=bfloat16 trades ~1e-2 logit precision for matmul rate; the
    loss must stay close to the fp32 kernel."""
    from face_recognition_models_tpu.heads.fused_adapter import _row_params
    from face_recognition_models_tpu.ops.fused_head import fused_margin_ce
    from face_recognition_models_tpu.ops.normalize import (
        feature_norms, l2_normalize)

    cfg, head, kernel, state, feats, labels, rng = _setup("arcface")
    xn = l2_normalize(feats, axis=1)
    wn = l2_normalize(kernel, axis=0)
    norms = feature_norms(feats)
    wn_t = jnp.take(wn, labels, axis=1).T
    tcos_raw = jnp.sum(xn * wn_t, axis=1)
    rp = _row_params(cfg, tcos_raw, norms, state, rng)

    out32 = fused_margin_ce(xn, wn, labels, rp.t, rp.tcos, rp.scale, rp.ab,
                            rp.mode, rp.clamp_eps, 16, 64, True)
    out16 = fused_margin_ce(xn, wn, labels, rp.t, rp.tcos, rp.scale, rp.ab,
                            rp.mode, rp.clamp_eps, 16, 64, True,
                            jnp.bfloat16)
    loss32 = float(jnp.mean(out32.lse - out32.target_logit))
    loss16 = float(jnp.mean(out16.lse - out16.target_logit))
    assert abs(loss32 - loss16) / abs(loss32) < 0.05


def test_fused_wins_dispatch_table():
    """Auto dispatch (ADVICE r1 / VERDICT item 6): fused only on TPU, only
    for measured-winner heads at small C, every fused head at big C."""
    from face_recognition_models_tpu.heads.fused_adapter import fused_wins

    # never off-TPU
    assert not fused_wins("arcface", 10575, platform="cpu")
    assert not fused_wins("arcface", 1 << 20, platform="cpu")
    # small C: winners yes (incl. the memory-blended heads: 1.40x/1.47x
    # measured), regression heads no
    assert fused_wins("arcface", 10575, platform="tpu")
    assert fused_wins("adaface", 10575, platform="tpu")
    assert fused_wins("vpl_arcface", 10575, platform="tpu")
    assert fused_wins("qaface", 10575, platform="tpu")
    assert not fused_wins("mv_softmax", 10575, platform="tpu")
    assert not fused_wins("elastic_arcface", 10575, platform="tpu")
    # big C: every fused head
    assert fused_wins("mv_softmax", 131072, platform="tpu")
    assert fused_wins("elastic_cosface", 131072, platform="tpu")
    assert fused_wins("qaface", 131072, platform="tpu")


@pytest.mark.slow
def test_auto_train_step_resolves_to_jnp_on_cpu():
    """make_train_step(use_fused_head='auto') must pick the jnp path here
    (CPU) — building it must not require Pallas lowering."""
    from face_recognition_models_tpu.models.resnet import BasicBlock, ResNet
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import TrainState
    from face_recognition_models_tpu.train.step import make_train_step

    cfg = cfg_lib.make_head_config("arcface", feature_dim=16, num_classes=8)
    head = get_head("arcface")
    backbone = ResNet(stage_sizes=(1, 1, 1, 1), block=BasicBlock,
                      num_filters=8, embed_dim=16)
    rng = jax.random.PRNGKey(0)
    variables = backbone.init(rng, jnp.zeros((1, 32, 32, 3)), train=False)
    tx = get_optimizer("sgd", 0.1)
    params = {"backbone": variables["params"],
              "kernel_w": head.init_kernel(rng, cfg)}
    state = TrainState(step=jnp.int32(0), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       head_state=head.init_state(cfg),
                       opt_state=tx.init(params), rng=rng)
    step = jax.jit(make_train_step(backbone, head, cfg, tx,
                                   use_fused_head="auto"))
    images = jnp.zeros((4, 32, 32, 3), jnp.uint8)
    labels = jnp.zeros((4,), jnp.int32)
    new_state, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.tpu
@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="compiled-mode Pallas needs a real TPU")
@pytest.mark.parametrize("name", ["arcface", "curricularface", "mv_softmax"])
def test_fused_compiled_mode_smoke(name):
    """ADVICE r1: compiled (interpret=False) TPU lowering smoke — the grid
    semantics the kernels rely on (sequential C-major sweep, whole-N VMEM
    scratch) have no interpret-mode coverage."""
    cfg, head, kernel, state, feats, labels, rng = _setup(name, seed=2)
    loss_ref, loss_g_ref, *_ = _jnp_loss(cfg, head, kernel, feats, labels,
                                         state, rng)
    def loss_fused(kernel):
        out = fused_apply(cfg, kernel, feats, labels, state, rng=rng,
                          interpret=False)
        return out.loss_id + 0.1 * out.loss_g
    val, grad = jax.value_and_grad(loss_fused)(kernel)
    np.testing.assert_allclose(float(val),
                               float(loss_ref) + 0.1 * float(loss_g_ref),
                               rtol=1e-4, atol=1e-4)
    assert np.isfinite(np.asarray(grad)).all()


# ---------------------------------------------------------------------------
# Memory-blended heads (VPL-ArcFace / QAFace) — fused_margin_ce_mem
# ---------------------------------------------------------------------------


def _mem_setup(name, seed=0, steps=3):
    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C,
                                   delta=2)  # short TTL: expiry mid-sequence
    head = get_head(name)
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    kernel = head.init_kernel(k1, cfg)
    batches = []
    for i in range(steps):
        kf, kl, km, k2 = jax.random.split(jax.random.fold_in(k2, i), 4)
        feats = 10.0 * jax.random.normal(kf, (N, D), jnp.float32)
        labels = jax.random.randint(kl, (N,), 0, C)
        minput = feats + 2.0 * jax.random.normal(km, (N, D), jnp.float32)
        batches.append((feats, labels, minput))
    return cfg, head, kernel, batches


@pytest.mark.parametrize("name", ["vpl_arcface", "qaface"])
def test_fused_mem_head_matches_jnp_sequence(name):
    """Multi-step: memory/lifetime state sequences and losses must track the
    jnp path exactly (TTL expiry included via delta=2)."""
    cfg, head, kernel, batches = _mem_setup(name)
    state_ref = head.init_state(cfg)
    state_fused = head.init_state(cfg)
    for step, (feats, labels, minput) in enumerate(batches):
        mi = minput if name == "qaface" else None
        out_ref = head.apply(cfg, kernel, feats, labels, state_ref,
                             minput=mi)
        loss_ref = mean_cross_entropy(out_ref.logits, labels)
        acc1_ref, acc5_ref = topk_accuracy(out_ref.pre_logits, labels)
        state_ref = out_ref.state

        out = fused_apply(cfg, kernel, feats, labels, state_fused,
                          minput=mi, block_n=16, block_c=64, interpret=True)
        state_fused = out.state
        np.testing.assert_allclose(float(out.loss_id), float(loss_ref),
                                   rtol=3e-5, atol=3e-5,
                                   err_msg=f"{name} loss step {step}")
        assert float(out.acc1) == float(acc1_ref), f"{name} acc1 {step}"
        assert float(out.acc5) == float(acc5_ref), f"{name} acc5 {step}"
        for a, b in zip(jax.tree.leaves(state_fused),
                        jax.tree.leaves(state_ref)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"{name} state step {step}")


@pytest.mark.parametrize("name", ["vpl_arcface", "qaface"])
def test_fused_mem_head_matches_jnp_gradients(name):
    """Gradients through both matmuls (dx via W and memory, dw via the
    (1-lam) share, target-column path via the jnp gather)."""
    cfg, head, kernel, batches = _mem_setup(name, seed=3, steps=2)
    # step once so memories are active (lam != 0) for the grad check
    state = head.init_state(cfg)
    feats0, labels0, minput0 = batches[0]
    mi0 = minput0 if name == "qaface" else None
    state = head.apply(cfg, kernel, feats0, labels0, state, minput=mi0).state

    feats, labels, minput = batches[1]
    mi = minput if name == "qaface" else None

    def loss_jnp(kernel, feats):
        out = head.apply(cfg, kernel, feats, labels, state, minput=mi)
        return mean_cross_entropy(out.logits, labels)

    def loss_fused(kernel, feats):
        out = fused_apply(cfg, kernel, feats, labels, state, minput=mi,
                          block_n=16, block_c=64, interpret=True)
        return out.loss_id

    gk_ref, gf_ref = jax.grad(loss_jnp, argnums=(0, 1))(kernel, feats)
    gk, gf = jax.grad(loss_fused, argnums=(0, 1))(kernel, feats)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                               rtol=5e-4, atol=1e-6)
