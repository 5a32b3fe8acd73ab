"""Beyond-reference heads: combined margin and sub-center ArcFace.

The registry-wide contract/jit/saturation smoke tests in
test_heads_smoke.py cover these automatically; here we pin the math they
must reduce to (the reference's ArcFace criterion.py:281-295 and CosFace
:186-189 as special cases) and the sub-center pooling/grad-routing law.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import get_head

N, D, C = 16, 32, 40


def _inputs(seed=0, n=N, d=D):
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    feats = 8.0 * jax.random.normal(k1, (n, d), jnp.float32)
    labels = jax.random.randint(k2, (n,), 0, C)
    return feats, labels


def _apply(name, kernel, feats, labels, **cfg_kw):
    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C,
                                   **cfg_kw)
    head = get_head(name)
    return head.apply(cfg, kernel, feats, labels, head.init_state(cfg))


def test_combined_reduces_to_arcface():
    """(m1, m2, m3) = (1, m, 0) is ArcFace wherever the angular margin is
    in its monotone region (random inputs never reach the cos < cos(pi-m)
    fallback band)."""
    feats, labels = _inputs()
    kernel = jax.random.normal(jax.random.PRNGKey(3), (D, C), jnp.float32)
    arc = _apply("arcface", kernel, feats, labels, m=0.5, s=64.0)
    comb = _apply("combined_margin", kernel, feats, labels,
                  m1=1.0, m2=0.5, m3=0.0, s=64.0)
    np.testing.assert_allclose(np.asarray(comb.logits),
                               np.asarray(arc.logits), atol=2e-3)
    np.testing.assert_allclose(np.asarray(comb.pre_logits),
                               np.asarray(arc.pre_logits), atol=1e-4)


def test_combined_reduces_to_cosface():
    """(1, 0, m) applies the CosFace additive margin on the target column
    (CosFace's +-(1-1e-4) cosine clamp is a no-op on random inputs)."""
    feats, labels = _inputs(seed=1)
    kernel = jax.random.normal(jax.random.PRNGKey(4), (D, C), jnp.float32)
    cosf = _apply("cosface", kernel, feats, labels, m=0.35, s=64.0)
    comb = _apply("combined_margin", kernel, feats, labels,
                  m1=1.0, m2=0.0, m3=0.35, s=64.0)
    np.testing.assert_allclose(np.asarray(comb.logits),
                               np.asarray(cosf.logits), atol=2e-3)


def test_combined_general_formula():
    """Mixed config (m1, m2, m3) = (1.2, 0.3, 0.2): the target logit is
    exactly cos(m1*acos(t) + m2) - m3 and non-targets are untouched."""
    feats, labels = _inputs(seed=2)
    kernel = jax.random.normal(jax.random.PRNGKey(5), (D, C), jnp.float32)
    out = _apply("combined_margin", kernel, feats, labels,
                 m1=1.2, m2=0.3, m3=0.2, s=64.0)
    pre = np.asarray(out.pre_logits) / 64.0
    post = np.asarray(out.logits) / 64.0
    oh = np.asarray(out.one_hot) > 0
    np.testing.assert_allclose(post[~oh], pre[~oh], atol=1e-6)
    t = pre[oh]
    expected = np.cos(np.clip(1.2 * np.arccos(np.clip(t, -1, 1)) + 0.3,
                              0.0, np.pi)) - 0.2
    np.testing.assert_allclose(post[oh], expected, atol=1e-5)


def test_subcenter_k1_is_arcface():
    feats, labels = _inputs(seed=3)
    kernel = jax.random.normal(jax.random.PRNGKey(6), (D, C), jnp.float32)
    arc = _apply("arcface", kernel, feats, labels)
    sub = _apply("subcenter_arcface", kernel, feats, labels, k=1)
    np.testing.assert_allclose(np.asarray(sub.logits),
                               np.asarray(arc.logits), atol=1e-6)


def test_subcenter_pools_max_and_routes_grads():
    """Pooled cosine is the max over each class's K columns, and the kernel
    gradient is nonzero ONLY on winning sub-center columns."""
    k = 3
    feats, labels = _inputs(seed=4)
    kernel = jax.random.normal(jax.random.PRNGKey(7), (D, C * k), jnp.float32)
    cfg = cfg_lib.make_head_config("subcenter_arcface", feature_dim=D,
                                   num_classes=C, k=k)
    head = get_head("subcenter_arcface")
    out = head.apply(cfg, kernel, feats, labels, None)

    xn = np.asarray(feats) / np.linalg.norm(feats, axis=1, keepdims=True)
    wn = np.asarray(kernel) / np.linalg.norm(kernel, axis=0, keepdims=True)
    cos_all = (xn @ wn).reshape(N, C, k)
    np.testing.assert_allclose(np.asarray(out.pre_logits) / cfg.s,
                               cos_all.max(2), atol=1e-5)

    def loss(kernel):
        o = head.apply(cfg, kernel, feats, labels, None)
        return -jnp.mean(jax.nn.log_softmax(o.logits)[jnp.arange(N), labels])

    g = np.asarray(jax.grad(loss)(kernel))       # [D, C*K]
    col_used = (np.abs(g).sum(0) > 0).reshape(C, k)
    winners = cos_all.argmax(2)                   # [N, C]
    expected = np.zeros((C, k), bool)
    expected[np.arange(C)[None, :].repeat(N, 0).ravel(), winners.ravel()] = True
    # every nonzero-grad column must be some sample's winner for its class
    assert (col_used <= expected).all()
    assert col_used.any()


def test_subcenter_sharding_spec():
    """[D, C*K] kernels shard over the 'model' axis like [D, C] ones."""
    from jax.sharding import PartitionSpec as P
    from face_recognition_models_tpu.parallel.sharding import _spec_for

    leaf = jnp.zeros((D, C * 3))
    assert _spec_for("['params']['kernel_w']", leaf, C) == P(None, "model")
    # unrelated 2-d leaves stay replicated
    assert _spec_for("['params']['backbone']['Dense_0']['kernel']",
                     jnp.zeros((D, D)), C) == P()


def test_head_arg_cli_overrides():
    """--head-arg strings coerce to the config field types."""
    kw = cfg_lib.parse_head_overrides(
        "combined_margin", ["m1=1.2", "m2=0.3", "m3=0.2", "s=32"])
    cfg = cfg_lib.make_head_config("combined_margin", num_classes=C, **kw)
    assert (cfg.m1, cfg.m2, cfg.m3, cfg.s) == (1.2, 0.3, 0.2, 32.0)

    kw = cfg_lib.parse_head_overrides("subcenter_arcface",
                                      ["k=5", "easy_margin=true"])
    assert kw == {"k": 5, "easy_margin": True}
    assert isinstance(kw["k"], int)

    with pytest.raises(ValueError, match="key=value"):
        cfg_lib.parse_head_overrides("arcface", ["nope=1"])
    with pytest.raises(ValueError, match="key=value"):
        cfg_lib.parse_head_overrides("arcface", ["num_classes=7"])


@pytest.mark.slow
def test_subcenter_sharded_train_step_matches_single_device():
    """Class-TP with a [D, C*K] kernel: the reshape-to-[N, C, K] max-pool
    must be GSPMD-clean (whole classes per shard) and numerically match
    the single-device step."""
    import jax
    from face_recognition_models_tpu.parallel import (
        batch_sharding, make_mesh, train_state_shardings)
    from tests.test_train_step import _init, _synthetic_batch

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    from face_recognition_models_tpu.train import make_train_step
    mesh = make_mesh(cfg_lib.MeshConfig(data=4, model=2))
    backbone, head, head_cfg, tx, state = _init("subcenter_arcface", k=3)

    c = head_cfg.num_classes
    shardings = train_state_shardings(mesh, state, num_classes=c)
    assert (shardings.params["kernel_w"].spec
            == jax.sharding.PartitionSpec(None, "model"))

    data_s = batch_sharding(mesh)
    state_sh = jax.device_put(state, shardings)
    step = jax.jit(make_train_step(backbone, head, head_cfg, tx),
                   in_shardings=(shardings, data_s, data_s),
                   out_shardings=(shardings, None))
    images, labels = _synthetic_batch(jax.random.PRNGKey(2))
    losses = []
    for _ in range(3):
        state_sh, metrics = step(state_sh, jax.device_put(images, data_s),
                                 jax.device_put(labels, data_s))
        losses.append(float(metrics["loss"]))

    backbone2, head2, head_cfg2, tx2, state2 = _init("subcenter_arcface",
                                                     k=3)
    step2 = jax.jit(make_train_step(backbone2, head2, head_cfg2, tx2))
    for _ in range(3):
        state2, metrics2 = step2(state2, images, labels)
    np.testing.assert_allclose(losses[-1], float(metrics2["loss"]),
                               rtol=1e-4)


def test_partial_fc_rejects_subcenter_supports_combined():
    import optax
    from face_recognition_models_tpu.train.partial_fc import (
        make_partial_fc_train_step)

    class _Fake:
        pass

    tx = optax.sgd(0.1)
    sub = get_head("subcenter_arcface")
    sub_cfg = cfg_lib.make_head_config("subcenter_arcface", feature_dim=D,
                                       num_classes=C)
    with pytest.raises(ValueError, match="subcenter"):
        make_partial_fc_train_step(_Fake(), sub, sub_cfg, tx,
                                   num_sampled=8, learning_rate=0.1)


# ---------------------------------------------------------------------------
# AdaCos (no margin, analytic adaptive scale)
# ---------------------------------------------------------------------------


def test_adacos_init_and_fixed_mode():
    import math

    head = get_head("adacos")
    cfg = cfg_lib.make_head_config("adacos", feature_dim=D, num_classes=C,
                                   dynamic=False)
    st = head.init_state(cfg)
    s0 = math.sqrt(2.0) * math.log(C - 1)
    assert float(st.s[0]) == pytest.approx(s0, rel=1e-6)

    feats, labels = _inputs()
    kernel = head.init_kernel(jax.random.PRNGKey(3), cfg)
    out = head.apply(cfg, kernel, feats, labels, st)
    # fixed mode: scale never moves, logits = s0 * cos, no margin anywhere
    assert float(out.state.s[0]) == float(st.s[0])
    np.testing.assert_allclose(np.asarray(out.pre_logits),
                               np.asarray(out.logits))
    cos = np.asarray(out.logits) / s0
    assert np.all(np.abs(cos) <= 1.0 + 1e-5)


def test_adacos_dynamic_update_matches_numpy_oracle():
    head = get_head("adacos")
    cfg = cfg_lib.make_head_config("adacos", feature_dim=D, num_classes=C)
    st = head.init_state(cfg)
    feats, labels = _inputs(seed=7)
    kernel = head.init_kernel(jax.random.PRNGKey(4), cfg)
    out = head.apply(cfg, kernel, feats, labels, st)

    # independent numpy recomputation of the paper's update (eqs. 12-13)
    f = np.asarray(feats, np.float64)
    k = np.asarray(kernel, np.float64)
    cos = (f / np.linalg.norm(f, axis=1, keepdims=True)) @ (
        k / np.linalg.norm(k, axis=0, keepdims=True))
    cos = np.clip(cos, -1 + 1e-7, 1 - 1e-7)
    oh = np.eye(C)[np.asarray(labels)]
    s_prev = float(st.s[0])
    b_avg = float(np.mean(np.sum((1 - oh) * np.exp(s_prev * cos), axis=1)))
    theta = np.arccos(np.sum(cos * oh, axis=1))
    theta_med = min(float(np.median(theta)), np.pi / 4)
    s_want = np.log(b_avg) / np.cos(theta_med)
    assert float(out.state.s[0]) == pytest.approx(s_want, rel=1e-4)
    # the CURRENT logits already use the new scale
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(cos * float(out.state.s[0])),
                               atol=1e-3)


def test_adacos_scale_anneals_as_targets_sharpen():
    """When target cosines are high (easy batch), the clipped median angle
    makes s track ln(B_avg) — harder batches (theta near pi/2) get a much
    larger scale, easy ones a smaller one. Check the ordering."""
    head = get_head("adacos")
    cfg = cfg_lib.make_head_config("adacos", feature_dim=D, num_classes=C)
    st = head.init_state(cfg)
    kernel = head.init_kernel(jax.random.PRNGKey(5), cfg)
    labels = jnp.arange(N) % C
    # easy: features = their class prototype (theta ~ 0)
    easy = jnp.take(kernel, labels, axis=1).T * 10.0
    # hard: features orthogonal-ish to everything (random)
    hard, _ = _inputs(seed=11)
    s_easy = float(head.apply(cfg, kernel, easy, labels, st).state.s[0])
    s_hard = float(head.apply(cfg, kernel, hard, labels, st).state.s[0])
    assert s_hard > s_easy


@pytest.mark.slow
def test_adacos_trains_e2e():
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(4, 8, image_size=32, seed=0,
                                          noise=10.0)
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="adacos", num_classes=4,
        batch_size=16, epochs=4, seed=0,
        data=cfg_lib.DataConfig(image_size=32),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.05))
    loader = ArrayLoader(images, labels, batch_size=16, seed=0)
    result = fit(cfg, loader, use_mesh=False)
    assert np.isfinite(result.min_train_loss)
    # softmax CE at C=4 starts ~ln(4)=1.39; must improve markedly
    assert result.min_train_loss < 0.9
    # the adaptive scale moved off its init and stayed finite
    s = float(np.asarray(result.state.head_state.s)[0])
    assert np.isfinite(s) and s != pytest.approx(
        np.sqrt(2.0) * np.log(3.0), rel=1e-3)
