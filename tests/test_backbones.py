"""Backbones: shapes, dtypes, BN mutation, dropout determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu.models import get_backbone

IMG = 32


@pytest.mark.parametrize(
    "name",
    ["resnet18", "resnet50",
     pytest.param("efficientnet_b0", marks=pytest.mark.slow),
     pytest.param("mobilenet_v2", marks=pytest.mark.slow)])
def test_forward_shapes(name):
    model = get_backbone(name, embed_dim=64, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, IMG, IMG, 3))
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_batch_stats_update_in_train_mode():
    model = get_backbone("resnet18", embed_dim=32, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, IMG, IMG, 3)) + 3.0
    variables = model.init(rng, x, train=False)
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed


@pytest.mark.slow
def test_eval_mode_deterministic():
    model = get_backbone("efficientnet_b0", embed_dim=32, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, IMG, IMG, 3))
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out1 = model.apply(variables, x, train=False)
    out2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_bf16_compute_fp32_params():
    model = get_backbone("resnet50", embed_dim=32)  # default bf16
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, IMG, IMG, 3))
    variables = model.init(rng, x, train=False)
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    out = model.apply(variables, x, train=False)
    assert out.dtype == jnp.bfloat16


@pytest.mark.slow
def test_inception_v3_shapes_and_facenet_trunk():
    """Inception-v3 (the reference FaceNet default trunk) at 112px."""
    from face_recognition_models_tpu.models.facenet import facenet_embedding

    model = get_backbone("inception_v3", embed_dim=64, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 112, 112, 3))
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64)
    # torchvision-compatible module naming for future state-dict ports
    assert "Mixed_7c" in variables["params"]
    assert "Conv2d_1a_3x3" in variables["params"]

    # too-small inputs are rejected with a clear error
    with pytest.raises(ValueError, match=">= 75"):
        model.init(rng, jnp.zeros((1, 32, 32, 3)), train=False)

    # the FaceNet wrapper runs with the inception trunk (unit-norm output)
    fn = facenet_embedding("inception_v3", embed_dim=32)
    v = fn.init({"params": rng, "dropout": rng}, x, train=False)
    emb = fn.apply(v, x, train=False)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               rtol=1e-5)


def test_vit_shapes_and_feature_bn():
    """ViT trunks (models/vit.py, beyond-reference): fp32 embedding out,
    frozen-scale feature BN (batch_stats exists, no scale param), pos-embed
    sized to the token grid."""
    model = get_backbone("vit_t", embed_dim=64, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, IMG, IMG, 3))
    variables = model.init({"params": rng}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # frozen-scale feature BN: bias yes, scale no (iresnet convention)
    feat = variables["params"]["features"]
    assert "bias" in feat and "scale" not in feat
    # pos-embed matches the 32/8 = 4x4 token grid
    assert variables["params"]["pos_embed"].shape == (1, 16, 192)
    # train mode mutates the feature-BN running stats
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_vit_patch_mismatch_raises():
    model = get_backbone("vit_t", embed_dim=32, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="patch_size"):
        model.init(rng, jnp.zeros((1, 30, 30, 3)), train=False)


@pytest.mark.slow
def test_vit_trains_end_to_end():
    """fit() drives a ViT trunk through the standard margin-head train
    path: loss finite and decreasing trend over two epochs."""
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities,
    )
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(8, 8, image_size=IMG, seed=0,
                                          noise=10.0)
    loader = ArrayLoader(images, labels, batch_size=16, seed=0)
    cfg = cfg_lib.TrainConfig(
        backbone="vit_t", head="arcface", num_classes=8, batch_size=16,
        epochs=2, seed=0, data=cfg_lib.DataConfig(image_size=IMG),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.02))
    result = fit(cfg, loader, use_mesh=False)
    assert np.isfinite(result.min_train_loss)
    assert result.min_train_loss < 36.0  # below the from-init CE plateau


def test_vit_remat_is_numerically_identical():
    """nn.remat(Block) must change memory, not math: outputs and grads
    identical with remat on/off (vit_b defaults remat=True because b512
    training OOMs a 16 GB chip without it)."""
    from face_recognition_models_tpu.models.vit import VisionTransformer

    kw = dict(depth=2, dim=32, num_heads=2, embed_dim=16,
              dtype=jnp.float32)
    m0 = VisionTransformer(remat=False, **kw)
    m1 = VisionTransformer(remat=True, **kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    v = m0.init({"params": rng}, x, train=False)

    out0 = m0.apply(v, x, train=False)
    out1 = m1.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))

    def loss(m):
        def f(params):
            y, _ = m.apply({**v, "params": params}, x, train=True,
                           mutable=["batch_stats"])
            return jnp.sum(y ** 2)
        return jax.grad(f)(v["params"])

    g0, g1 = loss(m0), loss(m1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_mobilefacenet_shapes_params_and_guards():
    """MobileFaceNet (arXiv:1804.07573): ~1.0M params at 128-d, GDConv
    collapses the stride-16 map to [N, D], NCHW and non-/16 sizes are
    rejected, embedding is BN'd with no activation (can go negative)."""
    model = get_backbone("mobilefacenet", embed_dim=128, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 112, 112, 3))
    variables = model.init(rng, x, train=False)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree.leaves(variables["params"]))
    assert 0.9e6 < n < 1.1e6  # paper: 0.99M
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 128)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) < 0).any()  # linear embedding, no ReLU

    # GDConv kernel spans the whole final map: params are [7, 7, 1, C]
    assert variables["params"]["gdconv"]["kernel"].shape[:2] == (7, 7)

    with pytest.raises(ValueError, match="NHWC"):
        model.init(rng, jnp.zeros((1, 3, 112, 112)), train=False)
    with pytest.raises(ValueError, match="divisible by 16"):
        model.init(rng, jnp.zeros((1, 100, 100, 3)), train=False)

    # BN stats mutate in train mode (feature_bn included)
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    assert "feature_bn" in mutated["batch_stats"]


@pytest.mark.slow
def test_mobilefacenet_trains_e2e():
    """A few arcface steps on synthetic identities decrease the loss."""
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(4, 8, image_size=32, seed=0,
                                          noise=10.0)
    cfg = cfg_lib.TrainConfig(
        backbone="mobilefacenet", head="arcface", num_classes=4,
        batch_size=16, epochs=4, seed=0,
        data=cfg_lib.DataConfig(image_size=32),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.05))
    loader = ArrayLoader(images, labels, batch_size=16, seed=0)
    result = fit(cfg, loader, use_mesh=False)
    assert np.isfinite(result.min_train_loss)
    # arcface init loss is ~s-scaled (~32 here); 4 epochs reach ~19.7 with
    # top-1 at 100% (seed-0 trajectory)
    assert result.min_train_loss < 25.0
