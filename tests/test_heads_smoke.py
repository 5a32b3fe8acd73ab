"""Smoke tests: every head runs, returns the uniform contract shapes, and
only modifies what its margin says it should."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import get_head
from face_recognition_models_tpu.heads.base import available_heads

N, D, C = 16, 32, 40


def _setup(name):
    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C)
    head = get_head(name)
    rng = jax.random.PRNGKey(0)
    k_kernel, k_feats, k_apply = jax.random.split(rng, 3)
    kernel = head.init_kernel(k_kernel, cfg)
    state = head.init_state(cfg)
    feats = 10.0 * jax.random.normal(k_feats, (N, D), jnp.float32)
    labels = jax.random.randint(k_feats, (N,), 0, C)
    return cfg, head, kernel, state, feats, labels, k_apply


@pytest.mark.parametrize("name", available_heads())
def test_contract_shapes(name):
    cfg, head, kernel, state, feats, labels, rng = _setup(name)
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    assert out.pre_logits.shape == (N, C)
    assert out.logits.shape == (N, C)
    assert out.norms.shape == (N, 1)
    assert out.one_hot.shape == (N, C)
    assert np.isfinite(np.asarray(out.logits)).all()
    assert np.isfinite(np.asarray(out.pre_logits)).all()
    # one-hot marks exactly the label column
    oh = np.asarray(out.one_hot)
    np.testing.assert_array_equal(oh.argmax(1), np.asarray(labels))
    np.testing.assert_allclose(oh.sum(1), 1.0)


@pytest.mark.parametrize("name", ["cosface", "arcface", "elastic_cosface",
                                  "elastic_arcface", "magface", "adaface"])
def test_margin_only_touches_target_column(name):
    """For single-column heads, non-target logits equal pre-margin logits."""
    cfg, head, kernel, state, feats, labels, rng = _setup(name)
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    pre = np.asarray(out.pre_logits)
    post = np.asarray(out.logits)
    mask = np.asarray(out.one_hot) > 0
    np.testing.assert_allclose(post[~mask], pre[~mask], rtol=1e-5, atol=1e-5)
    # target logits are reduced (margin makes the task harder)
    assert (post[mask] <= pre[mask] + 1e-5).all()


@pytest.mark.parametrize("name", available_heads())
def test_jit_and_grad(name):
    """Heads are jittable and differentiable w.r.t. feats and kernel."""
    cfg, head, kernel, state, feats, labels, rng = _setup(name)

    @jax.jit
    def loss_fn(kernel, feats):
        out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
        ce = -jnp.mean(jax.nn.log_softmax(out.logits)[jnp.arange(N), labels])
        return ce + 0.1 * out.loss_g

    g_kernel, g_feats = jax.grad(loss_fn, argnums=(0, 1))(kernel, feats)
    assert np.isfinite(np.asarray(g_kernel)).all()
    assert np.isfinite(np.asarray(g_feats)).all()
    assert float(jnp.abs(g_kernel).sum()) > 0
    assert float(jnp.abs(g_feats).sum()) > 0


def test_stateful_heads_update_state():
    # SphereFace iteration counter
    cfg, head, kernel, state, feats, labels, rng = _setup("sphereface")
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    assert int(out.state.iter) == 1
    out2 = head.apply(cfg, kernel, feats, labels, out.state, rng=rng)
    assert int(out2.state.iter) == 2

    # CurricularFace EMA t
    cfg, head, kernel, state, feats, labels, rng = _setup("curricularface")
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    assert float(jnp.abs(out.state.t).sum()) > 0

    # AdaFace EMA mean/std move toward batch stats
    cfg, head, kernel, state, feats, labels, rng = _setup("adaface")
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    assert float(out.state.batch_mean[0]) != 20.0
    assert float(out.state.batch_std[0]) != 100.0

    # VPL memory gets the batch-class means, lifetimes set then decayed
    cfg, head, kernel, state, feats, labels, rng = _setup("vpl_arcface")
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    life = np.asarray(out.state.life)
    present = np.zeros(C, bool)
    present[np.asarray(labels)] = True
    np.testing.assert_allclose(life[present], cfg.delta - 1)
    np.testing.assert_allclose(life[~present], -1)
    mem = np.asarray(out.state.mem)
    assert np.abs(mem[present]).sum() > 0
    assert np.abs(mem[~present]).sum() == 0


def test_vpl_memory_matches_class_mean():
    cfg, head, kernel, state, feats, labels, rng = _setup("vpl_arcface")
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    feats_np = np.asarray(feats)
    labels_np = np.asarray(labels)
    mem = np.asarray(out.state.mem)
    for c in np.unique(labels_np):
        expected = feats_np[labels_np == c].mean(0)
        np.testing.assert_allclose(mem[c], expected, rtol=1e-5, atol=1e-5)


def test_qaface_fallback_minput():
    cfg, head, kernel, state, feats, labels, rng = _setup("qaface")
    out1 = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    out2 = head.apply(cfg, kernel, feats, labels, state, rng=rng,
                      minput=feats)
    np.testing.assert_allclose(np.asarray(out1.logits),
                               np.asarray(out2.logits), rtol=1e-6)


def test_elastic_margins_within_band():
    cfg, head, kernel, state, feats, labels, rng = _setup("elastic_cosface")
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    pre = np.asarray(out.pre_logits) / cfg.s
    post = np.asarray(out.logits) / cfg.s
    mask = np.asarray(out.one_hot) > 0
    applied = pre[mask] - post[mask]
    assert (applied >= cfg.m - cfg.std - 1e-6).all()
    assert (applied <= cfg.m + cfg.std + 1e-6).all()


def test_ignore_label_rows_unmodified():
    """label == -1 rows keep pre-margin logits (elastic heads)."""
    for name in ["elastic_cosface", "elastic_arcface"]:
        cfg, head, kernel, state, feats, labels, rng = _setup(name)
        labels = labels.at[:4].set(-1)
        out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
        pre = np.asarray(out.pre_logits)[:4]
        post = np.asarray(out.logits)[:4]
        np.testing.assert_allclose(post, pre, rtol=1e-6)


@pytest.mark.parametrize("name", available_heads())
def test_grads_finite_at_saturated_target_cosine(name):
    """Late-training regression: once a model nails its training set, the
    target cosines saturate to EXACTLY +-1.0 in fp32 — the step where the
    reference's CurricularFace NaNs (criterion.py:555: sqrt(1 - t^2) has
    an infinite derivative at t=1; observed live on the synthetic
    convergence run at 100% train accuracy). Every head must keep finite
    gradients when each sample's feature IS its class column."""
    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C)
    head = get_head(name)
    rng = jax.random.PRNGKey(0)
    kernel = np.array(head.init_kernel(rng, cfg))
    # exact basis alignment: kernel column i = e_i (unit), feats = 5*e_label
    # -> l2_normalize is exact and the target dot product is exactly 1.0
    kernel[:, :N] = 0.0
    kernel[np.arange(N) % D, np.arange(N)] = 1.0
    kernel = jnp.asarray(kernel)
    labels = jnp.arange(N, dtype=jnp.int32)
    feats = np.zeros((N, D), np.float32)
    feats[np.arange(N), np.arange(N) % D] = 5.0
    feats = jnp.asarray(feats)
    state = head.init_state(cfg)

    def loss_fn(kernel, feats):
        out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
        ce = -jnp.mean(jax.nn.log_softmax(out.logits)[jnp.arange(N), labels])
        return ce + 0.1 * out.loss_g

    # the target cosine really is saturated
    out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
    tcos = np.asarray(out.pre_logits)[np.arange(N), np.arange(N)]
    assert tcos.max() >= np.asarray(out.pre_logits).max() - 1e-5

    g_kernel, g_feats = jax.grad(loss_fn, argnums=(0, 1))(kernel, feats)
    assert np.isfinite(np.asarray(g_kernel)).all(), f"{name}: kernel grads"
    assert np.isfinite(np.asarray(g_feats)).all(), f"{name}: feats grads"
