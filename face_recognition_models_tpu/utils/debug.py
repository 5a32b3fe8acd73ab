"""Debug helpers.

- `infer_and_compute_loss`: one-batch forward + loss print (the reference's
  utils/debug.py:6-26 sanity helper).
- `enable_nan_checks`: turn on jax's NaN debugging (the TPU-side analogue
  of the reference's absent sanitizers, SURVEY §5.2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def enable_nan_checks():
    jax.config.update("jax_debug_nans", True)


def infer_and_compute_loss(backbone, head, head_cfg, variables, kernel,
                           images, labels, state=None,
                           rng: Optional[jax.Array] = None):
    """Run one batch through backbone + head, print and return the CE loss."""
    from face_recognition_models_tpu.train.losses import mean_cross_entropy

    feats = backbone.apply(variables, images, train=False)
    out = head.apply(head_cfg, kernel, feats.astype(jnp.float32), labels,
                     state, rng=rng or jax.random.PRNGKey(0))
    loss = mean_cross_entropy(out.logits, labels)
    print(f"[debug] feats {feats.shape} norm_mean={float(jnp.mean(out.norms)):.3f} "
          f"loss={float(loss):.4f} loss_g={float(out.loss_g):.6f}")
    return loss
