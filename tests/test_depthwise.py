"""Shift-formulated depthwise conv (ops/depthwise.py) vs lax.conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu.ops.depthwise import (
    depthwise_conv3x3,
    global_depthwise,
)


def _conv_ref(x, kernel, stride):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("hw,c", [(8, 16), (7, 8)])
def test_matches_lax_conv(stride, hw, c):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (4, hw, hw, c), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, 1, c), jnp.float32)
    got = depthwise_conv3x3(x, kern, stride=stride)
    want = _conv_ref(x, kern, stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_matches_lax_conv_bf16():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 8, 8, 8), jnp.bfloat16)
    kern = jax.random.normal(k2, (3, 3, 1, 8), jnp.float32)
    got = np.asarray(depthwise_conv3x3(x, kern), np.float32)
    want = np.asarray(_conv_ref(x, kern, 1), np.float32)
    assert got.dtype == want.dtype
    # both accumulate fp32 over 9 bf16 products; bitwise-close
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)


def test_gradients_match_lax_conv():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (2, 8, 8, 8), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, 1, 8), jnp.float32)

    def loss(fn, x, kern):
        return jnp.sum(fn(x, kern) ** 2)

    gx1, gk1 = jax.grad(lambda x, k: loss(
        lambda a, b: depthwise_conv3x3(a, b), x, k), (0, 1))(x, kern)
    gx2, gk2 = jax.grad(lambda x, k: loss(
        lambda a, b: _conv_ref(a, b, 1), x, k), (0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               atol=1e-3, rtol=1e-4)


def test_global_depthwise_matches_valid_conv():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (3, 7, 7, 16), jnp.float32)
    kern = jax.random.normal(k2, (7, 7, 1, 16), jnp.float32)
    got = global_depthwise(x, kern)
    want = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=16)
    assert got.shape == (3, 1, 1, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_mobilefacenet_impls_checkpoint_compatible():
    """dw_impl='shift' and 'conv' build identical param trees and give the
    same embeddings on shared weights (swap without re-training)."""
    from face_recognition_models_tpu.models.mobilefacenet import (
        mobilefacenet)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                          jnp.float32)
    shift = mobilefacenet(embed_dim=64, dw_impl="shift")
    conv = mobilefacenet(embed_dim=64, dw_impl="conv")
    v = shift.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    assert (jax.tree.structure(v["params"]) ==
            jax.tree.structure(conv.init({"params": jax.random.PRNGKey(1)},
                                         x, train=False)["params"]))
    out_s = conv.apply(v, x, train=False)  # conv impl on shift-init params
    out_c = shift.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_s, np.float32),
                               np.asarray(out_c, np.float32),
                               atol=5e-2, rtol=5e-2)
    cos = np.sum(np.asarray(out_s, np.float32) *
                 np.asarray(out_c, np.float32), axis=-1) / (
        np.linalg.norm(np.asarray(out_s, np.float32), axis=-1) *
        np.linalg.norm(np.asarray(out_c, np.float32), axis=-1))
    assert np.all(cos > 0.9999), cos

    with pytest.raises(ValueError, match="dw_impl"):
        mobilefacenet(dw_impl="bogus").init(
            {"params": jax.random.PRNGKey(0)}, x, train=False)


def test_shape_guards():
    x = jnp.zeros((2, 8, 8, 8))
    with pytest.raises(ValueError, match="kernel"):
        depthwise_conv3x3(x, jnp.zeros((3, 3, 2, 8)))
    with pytest.raises(ValueError, match="stride"):
        depthwise_conv3x3(x, jnp.zeros((3, 3, 1, 8)), stride=3)
    with pytest.raises(ValueError, match="C=4"):
        depthwise_conv3x3(x, jnp.zeros((3, 3, 1, 4)))
    with pytest.raises(ValueError, match="must be"):
        global_depthwise(x, jnp.zeros((5, 5, 1, 8)))
