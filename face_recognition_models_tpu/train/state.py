"""Train state: one explicit pytree for everything that must checkpoint.

The reference spreads restorable state over model/optimizer/scheduler/scaler
state_dicts plus python-side counters (model_utils.py:58-65; SphereFace's
`self.iter`); here a single TrainState pytree carries backbone params,
batch-norm stats, the head kernel + head state (EMA buffers, memories,
counters), optimizer state, the PRNG key, and the global step — so orbax
checkpoints restore training bit-exactly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from face_recognition_models_tpu.config import TrainConfig
from face_recognition_models_tpu.heads import get_head
from face_recognition_models_tpu.models import get_backbone


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # {'backbone': pytree, 'kernel_w': [D, C]}
    batch_stats: Any     # flax BatchNorm running stats
    head_state: Any      # per-head state pytree (may be None)
    opt_state: Any
    rng: jnp.ndarray
    # Exponential moving average of `params` (None when cfg.model_ema == 0).
    # Living inside the state pytree means checkpoints, preemption saves,
    # resume, and mesh shardings (parallel/sharding.py matches the same
    # kernel_w/backbone paths) all cover it with no extra plumbing. This is
    # a beyond-reference production feature — the reference has no weight
    # averaging — so it defaults OFF.
    ema_params: Any = None


def create_train_state(cfg: TrainConfig, head_cfg, tx: optax.GradientTransformation,
                       rng: Optional[jax.Array] = None):
    """Initialize (backbone module, head bundle, TrainState)."""
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed)
    k_model, k_kernel, k_state = jax.random.split(rng, 3)

    dtype = jnp.dtype(cfg.compute_dtype)
    backbone = get_backbone(cfg.backbone, embed_dim=head_cfg.feature_dim,
                            dtype=dtype, bn_dtype=jnp.dtype(cfg.bn_dtype))
    dummy = jnp.zeros((1, cfg.data.image_size, cfg.data.image_size, 3),
                      jnp.float32)
    variables = backbone.init({"params": k_model, "dropout": k_model},
                              dummy, train=False)

    if cfg.pretrained_path:
        # ImageNet-pretrained init (reference backbones.py:12-26) from a
        # torch state_dict on disk.
        from face_recognition_models_tpu.utils.torch_port import (
            load_pretrained_backbone)
        ported_params, ported_stats = load_pretrained_backbone(
            cfg.pretrained_path, cfg.backbone, variables)
        variables = {"params": jax.tree.map(jnp.asarray, ported_params),
                     "batch_stats": jax.tree.map(jnp.asarray, ported_stats)}

    head = get_head(cfg.head)
    kernel = head.init_kernel(k_kernel, head_cfg)
    head_state = head.init_state(head_cfg)

    params = {"backbone": variables["params"], "kernel_w": kernel}
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.int32(0),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        head_state=head_state,
        opt_state=opt_state,
        rng=k_state,
    )
    return backbone, head, state
