"""Pallas implicit-GEMM 3x3 conv vs lax.conv (interpret mode on CPU).

The roll+mask formulation (ops/conv3x3.py) must be EXACT vs XLA's conv
lowering: every wrapped roll row is a masked row. Covers non-square
spatial, multi-image blocks (roll crossing image boundaries inside a
block), bf16 inputs, and the eval hot shapes' aspect ratios at reduced
size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu.ops.conv3x3 import conv3x3_same


def _ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize(
    "n,h,w,c,co,bn",
    [
        (4, 7, 7, 16, 24, 2),    # multi-image block: rolls cross images
        (4, 14, 14, 8, 8, 4),    # whole batch in one block
        (2, 5, 9, 4, 12, 1),     # non-square, single-image block
        (6, 4, 4, 8, 8, 3),      # n not a power of two
    ],
)
def test_conv3x3_matches_lax(n, h, w, c, co, bn):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, h, w, c), jnp.float32)
    k = jnp.asarray(0.1 * rs.randn(3, 3, c, co), jnp.float32)
    y = conv3x3_same(x, k, block_n=bn, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x, k)),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_bf16():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 7, 7, 32), jnp.bfloat16)
    k = jnp.asarray(0.1 * rs.randn(3, 3, 32, 16), jnp.bfloat16)
    y = conv3x3_same(x, k, block_n=2, interpret=True)
    assert y.dtype == jnp.bfloat16
    ref = _ref(x, k).astype(jnp.bfloat16)
    # both accumulate in fp32; only the output rounding differs
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_conv3x3_rejects_bad_shapes():
    x = jnp.zeros((4, 7, 7, 8))
    with pytest.raises(ValueError):
        conv3x3_same(x, jnp.zeros((5, 5, 8, 8)), interpret=True)
    with pytest.raises(ValueError):
        conv3x3_same(x, jnp.zeros((3, 3, 8, 8)), block_n=3, interpret=True)
