"""Classification losses, written to shard over a class-parallel mesh.

`cross_entropy_with_integer_labels` replaces the reference's
nn.CrossEntropyLoss (model_utils.py:556) with a one-hot formulation: the
target logit is a masked reduction (not a gather), so when the class axis is
sharded over 'model' GSPMD lowers both the logsumexp and the target term to
per-shard reductions + psum over ICI — no gather collectives. (optax's
integer-label CE uses take_along_axis, whose sharding is ambiguous under a
class-sharded logits matrix.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_with_integer_labels(logits: jnp.ndarray,
                                      labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample CE, [N]. Stable log-softmax; label -1 contributes the full
    logsumexp (callers should mask if ignore-labels are present)."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=1)
    one_hot = jax.nn.one_hot(labels, logits.shape[1], dtype=jnp.float32)
    target = jnp.sum(logits * one_hot, axis=1)
    return lse - target


def mean_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                       ignore_index: int = -1) -> jnp.ndarray:
    """Mean CE over valid (label != ignore_index) samples."""
    per = cross_entropy_with_integer_labels(logits, labels)
    valid = (labels != ignore_index).astype(jnp.float32)
    return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
