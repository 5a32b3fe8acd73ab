"""Reference-style API facade: *Net constructors, train/eval forwards,
get_proxy, memory-mode toggle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import api


def _tiny(ctor, **kw):
    model = ctor(num_classes=10, backbone="resnet18", **kw)
    model.image_size = 32
    return model


@pytest.mark.slow
def test_arcface_net_train_and_eval():
    model = _tiny(api.ArcFaceNet)
    rng = jax.random.PRNGKey(0)
    variables, kernel, state = model.init(rng)
    images = jax.random.randint(rng, (4, 32, 32, 3), 0, 256, jnp.uint8)
    labels = jnp.asarray([0, 1, 2, 3])

    out, new_stats = model.train_forward(variables, kernel, images, labels,
                                         state, rng=rng)
    assert out.logits.shape == (4, 10)
    assert out.pre_logits.shape == (4, 10)
    assert np.isfinite(np.asarray(out.logits)).all()

    emb = model.embed(variables, images)
    assert emb.shape == (4, 512)

    proxies = model.get_proxy(kernel, labels)
    assert proxies.shape == (512, 4)
    np.testing.assert_array_equal(np.asarray(proxies[:, 1]),
                                  np.asarray(kernel[:, 1]))


def test_all_net_constructors_exist():
    for name in ["SphereFaceNet", "CosFaceNet", "ArcFaceNet",
                 "MV_SoftmaxNet", "CurricularFaceNet", "VPLArcFaceNet",
                 "AdaFaceNet", "ElasticArcFaceNet", "ElasticCosFaceNet",
                 "MagFaceNet", "QAFaceNet"]:
        ctor = getattr(api, name)
        model = ctor(num_classes=7)
        assert model.head_cfg.num_classes == 7
        assert model.loss_model == model.head_name


def test_head_overrides():
    model = api.MV_SoftmaxNet(num_classes=5, margin_type="arc")
    assert model.head_cfg.margin_type == "arc"


@pytest.mark.slow
def test_memory_training_toggle():
    model = _tiny(api.VPLArcFaceNet)
    _, _, state = model.init(jax.random.PRNGKey(0))
    assert bool(state.training_flag)
    off = api.set_memory_training(state, False)
    assert not bool(off.training_flag)

    arc = _tiny(api.ArcFaceNet)
    _, _, arc_state = arc.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="training flag"):
        api.set_memory_training(arc_state, False)


@pytest.mark.slow
def test_vpl_memory_frozen_when_toggled_off():
    model = _tiny(api.VPLArcFaceNet)
    rng = jax.random.PRNGKey(0)
    variables, kernel, state = model.init(rng)
    state = api.set_memory_training(state, False)
    images = jax.random.randint(rng, (4, 32, 32, 3), 0, 256, jnp.uint8)
    labels = jnp.asarray([0, 1, 2, 3])
    out, _ = model.train_forward(variables, kernel, images, labels, state,
                                 rng=rng)
    np.testing.assert_array_equal(np.asarray(out.state.mem),
                                  np.asarray(state.mem))
    np.testing.assert_array_equal(np.asarray(out.state.life),
                                  np.asarray(state.life))
