"""Space-to-depth conv1 stem: numerically identical to the 7x7/s2 conv.

The s2d stem reuses the SAME [7,7,3,F] conv1 param (checkpoints and the
torch port are layout-unchanged); only the compute graph differs. These
tests pin the equivalence and the odd-size fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu.models.resnet import (
    BasicBlock,
    ResNet,
    _space_to_depth_stem,
)


def _stem_only_ref(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("hw", [112, 64, 32])
def test_s2d_stem_matches_conv7(hw):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, hw, hw, 3), jnp.float32)
    w = jnp.asarray(0.1 * rs.randn(7, 7, 3, 64), jnp.float32)
    with jax.default_matmul_precision("float32"):
        ref = _stem_only_ref(x, w)
        got = _space_to_depth_stem(x, w, jnp.float32)
    assert got.shape == ref.shape == (2, hw // 2, hw // 2, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_full_model_same_params_same_output():
    """Whole ResNet: both stems consume the identical param/stats tree."""
    kwargs = dict(stage_sizes=(1, 1, 1, 1), block=BasicBlock,
                  num_filters=8, embed_dim=16, dtype=jnp.float32)
    m_s2d = ResNet(stem="space_to_depth", **kwargs)
    m_c7 = ResNet(stem="conv7", **kwargs)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3), jnp.float32)
    variables = m_c7.init(jax.random.PRNGKey(0), x, train=False)
    with jax.default_matmul_precision("float32"):
        out_c7 = m_c7.apply(variables, x, train=False)
        out_s2d = m_s2d.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_c7),
                               rtol=1e-4, atol=1e-5)


def test_odd_size_falls_back_to_conv7():
    m = ResNet(stage_sizes=(1, 1, 1, 1), block=BasicBlock, num_filters=8,
               embed_dim=16, dtype=jnp.float32, stem="space_to_depth")
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 16)
