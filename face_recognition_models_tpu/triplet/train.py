"""FaceNet triplet training.

Completes the reference's FaceNet subproject (whose __main__ is a TODO stub,
FaceNet/main.py:151-154): PK-sampled batches -> embedding trunk -> on-device
semi-hard mining -> triplet loss -> SGD, all inside one jitted step.

First-class path (round 5): the model trained here is the BARE backbone
trunk (L2 normalization is applied in the step and again at every consumer
— `l2_normalize` is idempotent), so the saved artifact is the standard
`{"params", "batch_stats"}` layout every other surface reads: the result of
`face facenet` loads directly into `face embed/eval/export/serve`.
Checkpoint/resume run through the same CheckpointManager as the margin-head
loop, and `mesh=` DP-shards the step over the mesh 'data' axis with the
embeddings all-gathered before mining so semi-hard selection stays
GLOBAL-batch, exactly like the reference's host-side mining over the full
batch (FaceNet/main.py:96-128).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from face_recognition_models_tpu.config import FaceNetConfig
from face_recognition_models_tpu.ops.image_ops import normalize_images
from face_recognition_models_tpu.ops.mining import semi_hard_triplet_loss
from face_recognition_models_tpu.ops.normalize import l2_normalize


class TripletTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


def make_triplet_train_step(model, tx: optax.GradientTransformation,
                            margin: float,
                            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                            mesh=None) -> Callable:
    """One jitted triplet step over `model` (a backbone trunk; an
    already-normalizing module also works — L2 normalize is idempotent).

    With `mesh`, the embeddings are constrained to replicated before
    mining: the backbone fwd/bwd stays sharded over 'data' while the tiny
    [B, D] embedding matrix all-gathers once over ICI, keeping the [B,B,B]
    semi-hard candidate mask a GLOBAL-batch computation (the reference
    mines over the full batch on host, FaceNet/main.py:96-128)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())

    def train_step(state: TripletTrainState, images, labels):
        rng, mine_rng, dropout_rng = jax.random.split(state.rng, 3)
        if images.dtype == jnp.uint8:
            images = normalize_images(images, mean, std)

        def loss_fn(params):
            feats, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            emb = l2_normalize(feats.astype(jnp.float32), axis=1)
            if mesh is not None:
                emb = jax.lax.with_sharding_constraint(emb, rep)
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
    start_epoch: int = 1          # >1 when the run resumed
    checkpoint_dir: Optional[str] = None


class _ArrayPKBatches:
    """In-memory PK batch source with the Loader epoch API (the synthetic /
    test path); `data.pipeline.PKLoader` is the streaming twin."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 p: int, k: int, seed: int):
        from face_recognition_models_tpu.data.sampler import PKBatchSampler
        self._images = images
        self._labels = np.asarray(labels, np.int32)
        self._sampler = PKBatchSampler(labels, p, k, seed=seed)

    def steps_per_epoch(self) -> int:
        return len(self._sampler)

    def epoch(self, epoch: int = 0
              ) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
        for idx in self._sampler.epoch(epoch):
            yield self._images[idx], self._labels[idx]


def train_facenet(cfg: FaceNetConfig, images: Optional[np.ndarray] = None,
                  labels: Optional[np.ndarray] = None,
                  epochs: int = 1, image_size: int = 112, seed: int = 0,
                  verbose: bool = True, *, loader=None, mesh=None,
                  checkpoint_dir: Optional[str] = None,
                  model_name: Optional[str] = None,
                  resume: bool = False, keep: int = 3,
                  dtype: Any = jnp.bfloat16) -> TripletFitResult:
    """Train the embedding trunk with PK sampling (the train_one_epoch flow
    of FaceNet/main.py:133-146, jitted).

    Data: either in-memory `(images, labels)` arrays or a `loader` with the
    epoch API (PK-structured batches — `data.pipeline.PKLoader` streams an
    identity tree without materializing it in host RAM).
    `mesh` DP-shards each batch over the mesh 'data' axis (p*k must divide
    the axis size). `checkpoint_dir` enables rotating per-epoch
    checkpoints, best-by-train-loss, resume (`resume=True` continues from
    the latest epoch), and the end-of-training `<model>_final` artifact in
    the standard `{"params", "batch_stats"}` layout `face
    embed/eval/export` read."""
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.train.optim import get_optimizer

    if loader is None:
        if images is None or labels is None:
            raise ValueError("provide (images, labels) arrays or loader=")
        loader = _ArrayPKBatches(images, labels, cfg.p, cfg.k, seed)

    model = get_backbone(cfg.backbone, embed_dim=cfg.embed_dim, dtype=dtype)
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

    mgr = None
    start_epoch, best_loss = 1, float("inf")
    if checkpoint_dir is not None:
        from face_recognition_models_tpu.checkpoint import CheckpointManager
        mgr = CheckpointManager(checkpoint_dir,
                                model_name or f"facenet_{cfg.backbone}",
                                keep=keep)
        if resume:
            restored, start_epoch, best_loss = mgr.restore(state, "latest")
            if restored is not None:
                state = restored
                if verbose:
                    print(f"facenet resume: epoch {start_epoch} "
                          f"(best loss {best_loss:.4f})")
        else:
            mgr.reset()

    step_kwargs = {}
    if mesh is not None:
        from face_recognition_models_tpu.parallel import (
            batch_sharding,
            replicated,
        )
        n_data = mesh.shape["data"]
        if (cfg.p * cfg.k) % n_data:
            raise ValueError(
                f"PK batch {cfg.p}*{cfg.k} must divide the mesh data axis "
                f"({n_data})")
        rep, data_s = replicated(mesh), batch_sharding(mesh)
        state = jax.device_put(state, rep)
        step_kwargs = dict(in_shardings=(rep, data_s, data_s),
                           out_shardings=(rep, None))
    step = jax.jit(make_triplet_train_step(model, tx, cfg.margin, mesh=mesh),
                   donate_argnums=(0,), **step_kwargs)

    losses = []
    total = 0
    t0 = time.time()
    for epoch in range(start_epoch, epochs + 1):
        device_losses = []
        for batch_images, batch_labels in loader.epoch(epoch - 1):
            state, metrics = step(state, batch_images,
                                  np.asarray(batch_labels, np.int32))
            # keep the scalar ON DEVICE: a float() here would sync every
            # step and serialize dispatch (tunnel RTT dominates, PERF.md);
            # fetch once per epoch instead
            device_losses.append(metrics["loss"])
            total += len(batch_labels)
        epoch_losses = [float(l) for l in device_losses]
        losses.extend(epoch_losses)
        epoch_loss = float(np.mean(epoch_losses)) if epoch_losses else np.inf
        if verbose:
            print(f"facenet epoch {epoch}/{epochs}: loss {epoch_loss:.4f}")
        if mgr is not None:
            mgr.save(state, epoch, epoch_loss)
            if epoch_loss < best_loss:
                best_loss = epoch_loss
                mgr.save(state, epoch, epoch_loss, is_best=True)
    wall = max(time.time() - t0, 1e-9)
    if mgr is not None:
        mgr.save_final({"params": state.params,
                        "batch_stats": state.batch_stats})
        mgr.wait_until_finished()
    return TripletFitResult(state=state, model=model, losses=losses,
                            images_per_sec=total / wall,
                            start_epoch=start_epoch,
                            checkpoint_dir=mgr.directory if mgr else None)
