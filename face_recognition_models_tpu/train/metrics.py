"""Training metrics (device-side).

Top-k accuracy computed on the pre-margin logits, mirroring
utils/metrics.py:3-16 in the reference (returns percentages).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
                  topk=(1, 5)):
    """Top-k accuracy in percent for each k, computed without host sync.

    Uses a rank-count formulation (how many classes score strictly higher
    than the target) instead of a top-k sort — O(NC) elementwise + reduce,
    shardable over the class axis.
    """
    one_hot = jax.nn.one_hot(labels, logits.shape[1], dtype=logits.dtype)
    target_scores = jnp.sum(logits * one_hot, axis=1, keepdims=True)  # [N,1]
    higher = jnp.sum(logits > target_scores, axis=1)  # [N]
    return tuple(100.0 * jnp.mean((higher < k).astype(jnp.float32))
                 for k in topk)
