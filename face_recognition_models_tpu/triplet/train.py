"""FaceNet triplet training.

Completes the reference's FaceNet subproject (whose __main__ is a TODO stub,
FaceNet/main.py:151-154): PK-sampled batches -> embedding net -> on-device
semi-hard mining -> triplet loss -> SGD, all inside one jitted step.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from face_recognition_models_tpu.config import FaceNetConfig
from face_recognition_models_tpu.models.facenet import facenet_embedding
from face_recognition_models_tpu.ops.image_ops import normalize_images
from face_recognition_models_tpu.ops.mining import semi_hard_triplet_loss


class TripletTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


def make_triplet_train_step(model, tx: optax.GradientTransformation,
                            margin: float,
                            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)
                            ) -> Callable:
    def train_step(state: TripletTrainState, images, labels):
        rng, mine_rng, dropout_rng = jax.random.split(state.rng, 3)
        if images.dtype == jnp.uint8:
            images = normalize_images(images, mean, std)

        def loss_fn(params):
            emb, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            loss = semi_hard_triplet_loss(emb, labels, margin, mine_rng)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt,
                                  rng=rng)
        return new_state, {"loss": loss}

    return train_step


@dataclass
class TripletFitResult:
    state: TripletTrainState
    model: Any
    losses: list
    images_per_sec: float


def train_facenet(cfg: FaceNetConfig, images: np.ndarray, labels: np.ndarray,
                  epochs: int = 1, image_size: int = 112, seed: int = 0,
                  verbose: bool = True) -> TripletFitResult:
    """Train the embedding net with PK sampling over an in-memory dataset
    (the train_one_epoch flow of FaceNet/main.py:133-146, jitted)."""
    from face_recognition_models_tpu.data.sampler import PKBatchSampler
    from face_recognition_models_tpu.train.optim import get_optimizer

    model = facenet_embedding(cfg.backbone, cfg.embed_dim)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)),
                           train=False)
    tx = get_optimizer("sgd", cfg.learning_rate, momentum=cfg.momentum,
                       weight_decay=cfg.weight_decay)
    state = TripletTrainState(
        step=jnp.int32(0), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(seed + 1))
    step = jax.jit(make_triplet_train_step(model, tx, cfg.margin),
                   donate_argnums=(0,))

    sampler = PKBatchSampler(labels, cfg.p, cfg.k, seed=seed)
    losses = []
    total = 0
    t0 = time.time()
    for epoch in range(epochs):
        for batch_idx in sampler.epoch(epoch):
            state, metrics = step(state, images[batch_idx],
                                  labels[batch_idx].astype(np.int32))
            losses.append(float(metrics["loss"]))
            total += len(batch_idx)
        if verbose:
            print(f"facenet epoch {epoch + 1}/{epochs}: "
                  f"loss {np.mean(losses[-len(sampler):]):.4f}")
    wall = max(time.time() - t0, 1e-9)
    return TripletFitResult(state=state, model=model, losses=losses,
                            images_per_sec=total / wall)
