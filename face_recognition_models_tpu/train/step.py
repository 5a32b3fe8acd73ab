"""The jitted train/eval steps.

Equivalent of the reference's hot loop body (model_utils.py:168-214):
forward through backbone + margin head, CE(post-margin logits) +
lambda_g * loss_g, backward, SGD step — but as one pure function compiled by
XLA, bf16 backbone compute, with the LR schedule inside the step and
cross-replica semantics handled by GSPMD (batch means / EMA statistics are
global-batch automatically under pjit DP sharding).

No GradScaler: TPU bf16 keeps fp32 exponent range, so the reference's AMP
loss-scaling machinery (model_utils.py:21-28, 184-187) has no equivalent and
is intentionally absent.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from face_recognition_models_tpu.ops.image_ops import (
    normalize_images,
    apply_augmentations,
)
from face_recognition_models_tpu.train.losses import mean_cross_entropy
from face_recognition_models_tpu.train.metrics import topk_accuracy
from face_recognition_models_tpu.train.state import TrainState


def distill_loss(student_feats, teacher_feats, mode: str):
    """Embedding-space distillation penalty (beyond-reference).

    Hinton-style KD adapted to metric embeddings: the student matches the
    teacher's embedding GEOMETRY rather than class probabilities — the
    standard recipe for face-recognition students (e.g. a MobileFaceNet
    distilled from a ResNet ArcFace teacher), since verification consumes
    cosines, not logits.

    cosine: mean(1 - cos(s, t)) on L2-normalized embeddings.
    mse: mean squared L2 distance on RAW embeddings (also transfers
    norms, e.g. MagFace-style teachers whose norms carry quality).
    """
    if mode == "cosine":
        s = student_feats / (jnp.linalg.norm(
            student_feats, axis=1, keepdims=True) + 1e-12)
        t = teacher_feats / (jnp.linalg.norm(
            teacher_feats, axis=1, keepdims=True) + 1e-12)
        return jnp.mean(1.0 - jnp.sum(s * t, axis=1))
    if mode == "mse":
        return jnp.mean(jnp.sum(
            (student_feats - teacher_feats) ** 2, axis=1))
    raise ValueError(f"unknown distill mode '{mode}' (cosine | mse)")


def _frozen_opt_state(new_opt_state, old_opt_state):
    """Frozen trunk: keep the optimizer's backbone slots byte-identical.

    Zeroing the applied updates alone is not enough — torch-SGD folds wd
    into the gradient BEFORE momentum, so even at zero grad the trunk's
    momentum buffers would drift toward wd*p/(1-m) (garbage in
    checkpoints, a kick on unfreeze) and every step would pay a
    trunk-sized HBM read/modify/write. Restoring the old subtree makes
    that math a dead value XLA prunes entirely."""
    def is_params_dict(x):
        return isinstance(x, dict) and "backbone" in x

    return jax.tree.map(
        lambda n, o: {**n, "backbone": o["backbone"]}
        if is_params_dict(n) else n,
        new_opt_state, old_opt_state, is_leaf=is_params_dict)


def make_train_step(backbone, head, head_cfg, tx: optax.GradientTransformation,
                    lambda_g: float = 0.0,
                    lr_schedule: Optional[Callable] = None,
                    has_dropout: bool = False,
                    mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                    horizontal_flip: bool = False,
                    crop_pad: int = 0, color_jitter: float = 0.0,
                    random_erasing: float = 0.0,
                    use_fused_head="auto",
                    mesh=None,
                    teacher_fn: Optional[Callable] = None,
                    distill_weight: float = 0.0,
                    distill_mode: str = "cosine",
                    freeze_backbone: bool = False) -> Callable:
    """Build the jittable train step.

    freeze_backbone: head-only training (linear probe / adapter fit over
    a pretrained trunk): the backbone runs in EVAL mode (batch stats
    frozen) under stop_gradient — XLA then prunes the entire backbone
    backward pass — and its optimizer updates are zeroed so weight decay
    cannot creep into the frozen weights.

    use_fused_head: True forces the fused Pallas margin+CE kernel (errors
    for unsupported heads), False forces the XLA jnp path, "auto" (default)
    picks per (head, num_classes, platform) from the measured win table.

    teacher_fn: optional frozen embedding fn (normalized images -> [N, D])
    for knowledge distillation; `distill_weight * distill_loss(...)` is
    added to the loss, and the teacher runs inside the same compiled step
    on the SAME augmented batch (gradients never flow into it).

    Returns step(state, images, labels, minput_images=None)
      -> (new_state, metrics dict).

    Images may be uint8 [N,H,W,3]: the ToTensor+Normalize transform
    (model_utils.py:539-547) is fused on device so batches cross PCIe/DCN as
    uint8.
    """

    if use_fused_head == "auto":
        # Dispatch on the measured per-(head, C) win table; never slower
        # than the XLA path, and always jnp off-TPU.
        from face_recognition_models_tpu.heads.fused_adapter import fused_wins
        use_fused_head = fused_wins(head_cfg.name, head_cfg.num_classes)
    if use_fused_head:
        from face_recognition_models_tpu.heads.fused_adapter import (
            fused_supported)
        if not fused_supported(head_cfg.name):
            raise ValueError(
                f"head '{head_cfg.name}' has no fused-kernel path "
                "(memory-blended heads use the jnp path)")
        return _make_fused_train_step(backbone, head, head_cfg, tx,
                                      lambda_g, lr_schedule, has_dropout,
                                      mean, std, horizontal_flip, crop_pad,
                                      color_jitter, random_erasing, mesh,
                                      teacher_fn, distill_weight,
                                      distill_mode, freeze_backbone)

    def train_step(state: TrainState, images, labels, minput_images=None):
        rng, head_rng, dropout_rng, flip_rng = jax.random.split(state.rng, 4)

        if images.dtype == jnp.uint8:
            images = normalize_images(images, mean, std)
            if minput_images is not None and minput_images.dtype == jnp.uint8:
                minput_images = normalize_images(minput_images, mean, std)
        images = apply_augmentations(flip_rng, images, horizontal_flip,
                                     crop_pad, color_jitter, random_erasing)
        t_feats = None
        if teacher_fn is not None:
            t_feats = jax.lax.stop_gradient(
                teacher_fn(images).astype(jnp.float32))

        def loss_fn(params):
            model_vars = {"params": params["backbone"],
                          "batch_stats": state.batch_stats}
            rngs = {"dropout": dropout_rng} if has_dropout else None
            if freeze_backbone:
                feats = jax.lax.stop_gradient(backbone.apply(
                    model_vars, images, train=False))
                mutated = {"batch_stats": state.batch_stats}
            else:
                feats, mutated = backbone.apply(
                    model_vars, images, train=True,
                    mutable=["batch_stats"], rngs=rngs)
            feats = feats.astype(jnp.float32)

            minput_feats = None
            if minput_images is not None:
                if freeze_backbone:
                    minput_feats = jax.lax.stop_gradient(backbone.apply(
                        model_vars, minput_images, train=False))
                else:
                    minput_feats, _ = backbone.apply(
                        model_vars, minput_images, train=True,
                        mutable=["batch_stats"], rngs=rngs)
                minput_feats = minput_feats.astype(jnp.float32)

            out = head.apply(head_cfg, params["kernel_w"], feats, labels,
                             state.head_state, rng=head_rng,
                             minput=minput_feats)
            # CE on post-margin logits (model_utils.py:179)
            loss_id = mean_cross_entropy(out.logits, labels)
            loss_kd = (distill_loss(feats, t_feats, distill_mode)
                       if t_feats is not None else jnp.float32(0.0))
            loss = (loss_id + lambda_g * out.loss_g
                    + distill_weight * loss_kd)
            return loss, (out, mutated["batch_stats"], loss_id, loss_kd)

        (loss, (out, new_batch_stats, loss_id, loss_kd)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        if freeze_backbone:
            # grads are already zero (stop_gradient); zero the wd-driven
            # updates AND pin the optimizer's backbone slots
            updates = {**updates, "backbone": jax.tree.map(
                jnp.zeros_like, updates["backbone"])}
            new_opt_state = _frozen_opt_state(new_opt_state, state.opt_state)
        new_params = optax.apply_updates(state.params, updates)

        acc1, acc5 = topk_accuracy(out.pre_logits, labels, topk=(1, 5))
        lr = (lr_schedule(state.step) if lr_schedule is not None
              else jnp.float32(0.0))
        metrics = {
            "loss": loss,
            "loss_id": loss_id,
            "loss_mag": lambda_g * out.loss_g,
            "acc1": acc1,
            "acc5": acc5,
            "lr": lr,
            "feat_norm": jnp.mean(out.norms),
        }
        if teacher_fn is not None:
            metrics["loss_kd"] = distill_weight * loss_kd
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            head_state=out.state,
            opt_state=new_opt_state,
            rng=rng,
        )
        return new_state, metrics

    return train_step


def _make_fused_train_step(backbone, head, head_cfg, tx, lambda_g,
                           lr_schedule, has_dropout, mean, std,
                           horizontal_flip, crop_pad=0, color_jitter=0.0,
                           random_erasing=0.0, mesh=None,
                           teacher_fn: Optional[Callable] = None,
                           distill_weight: float = 0.0,
                           distill_mode: str = "cosine",
                           freeze_backbone: bool = False) -> Callable:
    """Train step backed by the fused Pallas margin+CE kernel: the [N, C]
    logit matrix is never materialized (ops/fused_head.py)."""
    from face_recognition_models_tpu.heads.fused_adapter import fused_apply

    def train_step(state: TrainState, images, labels, minput_images=None):
        rng, head_rng, dropout_rng, flip_rng = jax.random.split(state.rng, 4)
        if images.dtype == jnp.uint8:
            images = normalize_images(images, mean, std)
            if minput_images is not None and minput_images.dtype == jnp.uint8:
                minput_images = normalize_images(minput_images, mean, std)
        images = apply_augmentations(flip_rng, images, horizontal_flip,
                                     crop_pad, color_jitter, random_erasing)
        t_feats = None
        if teacher_fn is not None:
            t_feats = jax.lax.stop_gradient(
                teacher_fn(images).astype(jnp.float32))

        def loss_fn(params):
            model_vars = {"params": params["backbone"],
                          "batch_stats": state.batch_stats}
            rngs = {"dropout": dropout_rng} if has_dropout else None
            if freeze_backbone:
                feats = jax.lax.stop_gradient(backbone.apply(
                    model_vars, images, train=False))
                mutated = {"batch_stats": state.batch_stats}
            else:
                feats, mutated = backbone.apply(
                    model_vars, images, train=True,
                    mutable=["batch_stats"], rngs=rngs)
            minput_feats = None
            if minput_images is not None:
                if freeze_backbone:
                    minput_feats = jax.lax.stop_gradient(backbone.apply(
                        model_vars, minput_images, train=False))
                else:
                    minput_feats, _ = backbone.apply(
                        model_vars, minput_images, train=True,
                        mutable=["batch_stats"], rngs=rngs)
                minput_feats = minput_feats.astype(jnp.float32)
            out = fused_apply(head_cfg, params["kernel_w"],
                              feats.astype(jnp.float32), labels,
                              state.head_state, rng=head_rng,
                              minput=minput_feats, mesh=mesh)
            loss_kd = (distill_loss(feats.astype(jnp.float32), t_feats,
                                    distill_mode)
                       if t_feats is not None else jnp.float32(0.0))
            loss = (out.loss_id + lambda_g * out.loss_g
                    + distill_weight * loss_kd)
            return loss, (out, mutated["batch_stats"], loss_kd)

        (loss, (out, new_batch_stats, loss_kd)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        if freeze_backbone:
            updates = {**updates, "backbone": jax.tree.map(
                jnp.zeros_like, updates["backbone"])}
            new_opt_state = _frozen_opt_state(new_opt_state, state.opt_state)
        new_params = optax.apply_updates(state.params, updates)

        lr = (lr_schedule(state.step) if lr_schedule is not None
              else jnp.float32(0.0))
        metrics = {
            "loss": loss,
            "loss_id": out.loss_id,
            "loss_mag": lambda_g * out.loss_g,
            "acc1": out.acc1,
            "acc5": out.acc5,
            "lr": lr,
            "feat_norm": jnp.mean(out.norms),
        }
        if teacher_fn is not None:
            metrics["loss_kd"] = distill_weight * loss_kd
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_batch_stats, head_state=out.state,
            opt_state=new_opt_state, rng=rng)
        return new_state, metrics

    return train_step


def make_eval_step(backbone, mean=(0.5, 0.5, 0.5),
                   std=(0.5, 0.5, 0.5)) -> Callable:
    """Embedding extraction step: images -> [N, D] raw embeddings
    (the reference *Net wrappers' eval branch, e.g. criterion.py:229-230).
    uint8 inputs get the fused normalize on device."""

    def eval_step(params, batch_stats, images):
        if images.dtype == jnp.uint8:
            images = normalize_images(images, mean, std)
        variables = {"params": params, "batch_stats": batch_stats}
        feats = backbone.apply(variables, images, train=False)
        return feats.astype(jnp.float32)

    return eval_step
