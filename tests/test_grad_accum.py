"""Gradient accumulation (cfg.grad_accum, optax.MultiSteps): K-boundary
apply semantics, mean-gradient equivalence at the optimizer level,
micro-step LR-schedule domain, and the partial_fc guard.

Beyond-reference production feature: effective batch K*batch_size at
batch_size activation memory (train/loop.py wraps the optimizer before
state creation so opt_state/checkpoint/sharding plumbing is unchanged).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.data.pipeline import ArrayLoader
from face_recognition_models_tpu.data.synthetic import synthetic_identities
from face_recognition_models_tpu.train.loop import fit
from face_recognition_models_tpu.train.optim import get_optimizer

C, PER, IMG, BS = 4, 8, 16, 8  # 4 steps/epoch


def _cfg(epochs, **kw):
    return cfg_lib.TrainConfig(
        backbone="resnet18", head="cosface", num_classes=C, batch_size=BS,
        epochs=epochs, seed=0,
        data=cfg_lib.DataConfig(image_size=IMG),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.01),
        **kw)


@pytest.fixture(scope="module")
def dataset():
    return synthetic_identities(C, PER, image_size=IMG, seed=0, noise=10.0)


def test_multisteps_applies_mean_gradient():
    """The wrapped optimizer over K micro-grads must equal the raw
    optimizer over their mean — pure optimizer-level property with the
    project's torch-semantics fused SGD (wd+momentum ordering included)."""
    k = 4
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(5, 3),
                               jnp.float32)}
    grads = [jax.tree.map(
        lambda p: jnp.asarray(np.random.RandomState(10 + i).randn(*p.shape),
                              jnp.float32), params) for i in range(k)]

    raw = get_optimizer("sgd", 0.1, momentum=0.9, weight_decay=5e-4,
                        nesterov=False)
    s_raw = raw.init(params)
    mean_g = jax.tree.map(lambda *gs: sum(gs) / k, *grads)
    upd, _ = raw.update(mean_g, s_raw, params)
    expect = optax.apply_updates(params, upd)

    acc = optax.MultiSteps(raw, every_k_schedule=k)
    s = acc.init(params)
    p = params
    for i, g in enumerate(grads):
        upd, s = acc.update(g, s, p)
        p2 = optax.apply_updates(p, upd)
        if i < k - 1:
            # no apply before the boundary
            jax.tree.map(lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), p2, p)
        p = p2
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), p, expect)


@pytest.mark.slow
def test_params_change_only_at_k_boundary(dataset):
    """Through the real fit(): per-epoch hook at 4 steps/epoch with K=4
    means params move exactly once per epoch; with 2 epochs the two hook
    snapshots differ (an apply happened in each)."""
    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)

    snaps = []

    def hook(epoch, state, train_loss):
        snaps.append(jax.device_get(state.params["kernel_w"]))

    r = fit(_cfg(2, grad_accum=4), loader, use_mesh=False, hooks=hook)
    assert len(snaps) == 2
    assert np.max(np.abs(snaps[0] - snaps[1])) > 0  # applied each epoch
    assert np.isfinite(r.min_train_loss)

    # K larger than the whole epoch's steps: no apply in epoch 1 -> the
    # epoch-1 snapshot still equals the init
    snaps2 = []

    def hook2(epoch, state, train_loss):
        snaps2.append(jax.device_get(state.params["kernel_w"]))

    fit(_cfg(1, grad_accum=100), loader, use_mesh=False, hooks=hook2)
    from face_recognition_models_tpu.train.state import create_train_state
    cfg0 = _cfg(1, grad_accum=100)
    head_cfg = cfg_lib.make_head_config(cfg0.head, num_classes=C)
    _, _, st0 = create_train_state(cfg0, head_cfg, optax.sgd(0.01))
    np.testing.assert_array_equal(snaps2[0],
                                  jax.device_get(st0.params["kernel_w"]))


def test_inner_schedule_rescaled_to_micro_domain():
    """The inner optimizer under MultiSteps counts APPLIES; loop.fit hands
    it schedule(c*K) so LR drops still land at the micro-step boundaries
    the loader's steps_per_epoch defines. Verify the applied step sizes:
    drop at micro step 4, K=2 -> applies at inner counts 0,1,2 see
    micro counts 0,2,4 -> lrs 0.1, 0.1, 0.01."""
    k = 2
    sched = lambda c: jnp.where(c < 4, 0.1, 0.01)
    inner = get_optimizer("sgd", lambda c: sched(c * k), momentum=0.0,
                          weight_decay=0.0, nesterov=False)
    acc = optax.MultiSteps(inner, every_k_schedule=k)
    params = {"w": jnp.zeros((3,), jnp.float32)}
    ones = {"w": jnp.ones((3,), jnp.float32)}
    s = acc.init(params)
    p, applied = params, []
    for micro in range(6):
        upd, s = acc.update(ones, s, p)
        p2 = optax.apply_updates(p, upd)
        if micro % k == k - 1:
            applied.append(float(np.asarray(p["w"][0] - p2["w"][0])))
        p = p2
    np.testing.assert_allclose(applied, [0.1, 0.1, 0.01], rtol=1e-6)


@pytest.mark.slow
def test_lr_metric_stays_in_micro_step_domain(dataset):
    """customstep drops after epoch 1; with K=2 the REPORTED per-step LR
    must drop at the same micro step as K=1 (the metrics schedule never
    leaves the micro domain)."""
    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    lrs = {}
    for k in (1, 2):
        cfg = _cfg(2, grad_accum=k, print_freq=1,
                   schedule=cfg_lib.ScheduleConfig(name="customstep",
                                                   steps=(1,), ratio=0.1))
        seen = []

        class _Logger:
            def log(self, metrics, step=None):
                seen.append(round(float(metrics["lr"]), 6))

        fit(cfg, loader, use_mesh=False, logger=_Logger())
        lrs[k] = seen
    assert lrs[1] == lrs[2]
    assert lrs[1][:4] == [0.01] * 4 and lrs[1][4:] == [0.001] * 4


def test_partial_fc_guard(dataset):
    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    with pytest.raises(ValueError, match="grad_accum"):
        fit(_cfg(1, grad_accum=2, partial_fc=0.5), loader, use_mesh=False)
