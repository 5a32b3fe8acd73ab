"""Knowledge distillation: config.DistillConfig, train/step.distill_loss,
and the fit() teacher wiring (beyond-reference edge-deployment recipe —
a small student matches a frozen teacher's embedding geometry while
training its own margin head)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.data.pipeline import ArrayLoader
from face_recognition_models_tpu.data.synthetic import synthetic_identities
from face_recognition_models_tpu.models.backbones import get_backbone
from face_recognition_models_tpu.train.loop import fit
from face_recognition_models_tpu.train.optim import get_optimizer
from face_recognition_models_tpu.train.state import create_train_state
from face_recognition_models_tpu.train.step import (
    distill_loss,
    make_eval_step,
    make_train_step,
)


def test_distill_loss_closed_form():
    s = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    # identical directions -> cosine loss 0 (scale-invariant)
    assert float(distill_loss(s, 3.0 * s, "cosine")) == pytest.approx(0.0,
                                                                      abs=1e-6)
    # opposite directions -> 1 - (-1) = 2
    assert float(distill_loss(s, -s, "cosine")) == pytest.approx(2.0,
                                                                 abs=1e-6)
    # mse: mean over batch of squared L2 distance
    t = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    assert float(distill_loss(s, t, "mse")) == pytest.approx(
        (1.0 + 4.0) / 2.0, abs=1e-6)
    with pytest.raises(ValueError, match="distill mode"):
        distill_loss(s, t, "kl")


def _tiny_cfg(**kw):
    base = dict(backbone="resnet18", head="arcface", num_classes=4,
                batch_size=8, epochs=2, seed=0,
                data=cfg_lib.DataConfig(image_size=32),
                optimizer=cfg_lib.OptimizerConfig(learning_rate=0.05))
    base.update(kw)
    return cfg_lib.TrainConfig(**base)


@pytest.mark.slow
def test_train_step_adds_weighted_kd_term():
    """With a teacher the step's loss is exactly loss(without) +
    metrics['loss_kd'] (the forward itself is unchanged), and the metric
    key only exists when distillation is on."""
    cfg = _tiny_cfg()
    head_cfg = cfg_lib.make_head_config("arcface", num_classes=4)
    tx = get_optimizer("sgd", 0.05)
    backbone, head, state = create_train_state(cfg, head_cfg, tx)

    teacher_fn = lambda im: jnp.ones((im.shape[0], head_cfg.feature_dim),
                                     jnp.float32)
    common = dict(lambda_g=0.0, use_fused_head=False)
    step_plain = jax.jit(make_train_step(backbone, head, head_cfg, tx,
                                         **common))
    step_kd = jax.jit(make_train_step(backbone, head, head_cfg, tx,
                                      teacher_fn=teacher_fn,
                                      distill_weight=3.0,
                                      distill_mode="cosine", **common))

    rng = jax.random.PRNGKey(1)
    images = jax.random.uniform(rng, (8, 32, 32, 3))
    labels = jnp.arange(8) % 4

    _, m0 = step_plain(state, images, labels)
    _, m1 = step_kd(state, images, labels)
    assert "loss_kd" not in m0
    assert float(m1["loss_kd"]) > 0.0
    # same state + same rng stream -> identical CE; total differs by the
    # weighted KD term
    np.testing.assert_allclose(float(m1["loss_id"]), float(m0["loss_id"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m0["loss"]) + float(m1["loss_kd"]),
        rtol=1e-5)


def test_fit_guards():
    images, labels = synthetic_identities(4, 4, image_size=32, seed=0)
    loader = ArrayLoader(images, labels, batch_size=8, seed=0)
    teacher = get_backbone("resnet18", embed_dim=512)
    tvars = teacher.init(jax.random.PRNGKey(7),
                         jnp.zeros((1, 32, 32, 3)), train=False)
    triple = (teacher, tvars["params"], tvars["batch_stats"])

    # teacher without a positive weight is a config error
    with pytest.raises(ValueError, match="distill.weight"):
        fit(_tiny_cfg(), loader, use_mesh=False, teacher=triple)

    # distillation composes with the dense path only
    cfg = _tiny_cfg(partial_fc=0.5,
                    distill=cfg_lib.DistillConfig(weight=1.0))
    with pytest.raises(ValueError, match="partial-fc"):
        fit(cfg, loader, use_mesh=False, teacher=triple)

    # weight > 0 with neither a teacher triple nor a checkpoint dir
    cfg = _tiny_cfg(distill=cfg_lib.DistillConfig(weight=1.0))
    with pytest.raises(ValueError, match="needs a teacher"):
        fit(cfg, loader, use_mesh=False)

    # embedding-dim mismatch is rejected before compiling anything
    small = get_backbone("resnet18", embed_dim=128)
    svars = small.init(jax.random.PRNGKey(7),
                       jnp.zeros((1, 32, 32, 3)), train=False)
    cfg = _tiny_cfg(distill=cfg_lib.DistillConfig(weight=1.0))
    with pytest.raises(ValueError, match="embedding dim"):
        fit(cfg, loader, use_mesh=False,
            teacher=(small, svars["params"], svars["batch_stats"]))


@pytest.mark.slow
def test_fit_distills_student_toward_teacher():
    """Training with a strong cosine KD term pulls the student's embedding
    directions toward a frozen randomly-initialized teacher's."""
    images, labels = synthetic_identities(4, 8, image_size=32, seed=0,
                                          noise=10.0)
    loader = ArrayLoader(images, labels, batch_size=16, seed=0)

    teacher = get_backbone("resnet18", embed_dim=512, dtype=jnp.float32)
    tvars = teacher.init(jax.random.PRNGKey(42),
                         jnp.zeros((1, 32, 32, 3)), train=False)
    t_embed = jax.jit(make_eval_step(teacher))

    cfg = _tiny_cfg(epochs=4,
                    distill=cfg_lib.DistillConfig(weight=20.0,
                                                  mode="cosine"))
    head_cfg = cfg_lib.make_head_config("arcface", num_classes=4)
    tx = get_optimizer("sgd", 0.05)
    _, _, state0 = create_train_state(cfg, head_cfg, tx)

    result = fit(cfg, loader, use_mesh=False,
                 teacher=(teacher, tvars["params"], tvars["batch_stats"]))
    assert np.isfinite(result.min_train_loss)

    s_embed = jax.jit(make_eval_step(result.backbone))
    # normalized batch as the steps saw it
    x = (images.astype(np.float32) / 255.0 - 0.5) / 0.5

    def mean_cos(params, stats):
        e = np.asarray(s_embed(params, stats, x))
        t = np.asarray(t_embed(tvars["params"], tvars["batch_stats"], x))
        e = e / np.linalg.norm(e, axis=1, keepdims=True)
        t = t / np.linalg.norm(t, axis=1, keepdims=True)
        return float(np.mean(np.sum(e * t, axis=1)))

    before = mean_cos(state0.params["backbone"], state0.batch_stats)
    after = mean_cos(result.state.params["backbone"],
                     result.state.batch_stats)
    assert after > before + 0.1, (before, after)
