"""Partial-FC sampled-classifier training (beyond the reference).

At production identity counts the classifier dominates the step: at
C=1,048,576 the dense [N,D]x[D,C] margin+CE costs more than the whole
ResNet-50 (PERF.md: 141 ms/step vs ~57 ms at CASIA scale). Partial FC
(An et al., "Partial FC: Training 10 Million Identities on a Single
Machine", 2021 — the standard large-C technique in insightface) runs each
step's softmax over a SAMPLED class set: the batch's positive classes
plus uniformly drawn negatives. The margin transform only ever touches
the target column, so every margin head's math is unchanged in sampled
space; the CE denominator is a (standard, accepted) biased estimate.

TPU-native formulation — everything static-shape and jit-compiled:

- sampling is `jnp.unique(size=N)` + scored `top_k` (exact uniform
  sampling WITHOUT replacement, positives excluded from the negative
  draw) — no host RNG, no dynamic shapes, PRNG-keyed and reproducible;
- the sampled kernel slice [D, C_s] is the differentiated leaf, so the
  backward never materializes a dense [D, C] gradient;
- SGD(momentum, wd) is applied manually to the SAMPLED columns only
  (grad += wd*w, then momentum, torch ordering — train/optim.py), via
  scatter-add; unsampled columns and their momentum are untouched,
  matching the torch Partial-FC semantics;
- under a data-parallel mesh the kernel stays replicated and the class
  sample is identical on every replica (same keyed PRNG), so GSPMD
  psums the sampled-column gradients like any other leaf.

Supported heads: the nine without per-class memories. VPL-ArcFace and
QAFace blend a [C, D] memory into the logits (criterion.py:702-726,
1455-1485); their memory rows are keyed by absolute class id and make no
sense over a per-step subsample, so they keep the dense path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Union

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

_NEG_INF = jnp.float32(-1e30)

# vpl/qaface: [C, D] memory state doesn't follow sampled columns;
# subcenter: assumes one kernel column per class; adacos: its adaptive
# scale is a FULL-softmax statistic (B_avg sums every non-target class,
# and the init is ln(C-1)) — both would be biased in sampled space.
UNSUPPORTED_HEADS = ("vpl_arcface", "qaface", "subcenter_arcface", "adacos")


def num_sampled_classes(num_classes: int, sample_ratio: float,
                        batch_size: int, multiple: int = 256) -> int:
    """C_s = max(2*batch, ratio*C) rounded up to a lane-friendly multiple,
    capped at C.

    The 2*batch floor guarantees at least `batch` negative slots: the
    first `batch` slots hold the batch's (unique) positives, so C_s near
    batch would leave the softmax with almost no negatives — measured to
    stall margin training entirely (PERF.md round-2 notes). Callers (fit)
    fall back to the dense path when the cap C is reached."""
    want = max(2 * batch_size, int(num_classes * sample_ratio))
    want = -(-want // multiple) * multiple
    return min(num_classes, want)


def sample_negatives(scores: jnp.ndarray, k: int, max_pos: int,
                     shift=None):
    """Distinct uniform negative indices from random `scores` [C] whose
    positive entries were set to -1.

    Large C: a full top_k sorts all C scores — measured 69 ms at C=1M on
    v5e vs 4 ms for the bucketed form below, which takes k/B winners from
    each of B equal buckets (selections stay distinct and positives stay
    excluded as long as any bucket can seat its quota even if ALL
    `max_pos` positives land in it — guaranteed by the B-selection test).
    Falls back to the exact global top_k when no valid B exists or C is
    small.

    Bucket assignment is decorrelated from class id two ways so the quota
    sampler's per-class inclusion stays ~k/C (the assumption behind the
    logQ correction) even when a batch's positives are clustered in id
    space (consecutive identities — the common layout):
    - the bucket of class i is its RESIDUE (i + shift) mod B over a
      transposed [C/B, B] view, so adjacent ids always land in different
      buckets;
    - `shift` (a caller-keyed per-step int) rotates every class through
      all B buckets uniformly across steps, so no fixed id pattern is
      persistently advantaged.
    """
    c = scores.shape[0]
    b = 64
    while b > 1 and not (k % b == 0 and c % b == 0
                         and k // b + max_pos <= c // b
                         and c // b >= 1024):
        b //= 2
    if b == 1:
        _, neg = jax.lax.top_k(scores, k)
        return neg
    if shift is None:
        shift = jnp.int32(0)
    # rolled position p holds class (p - shift) mod C; the transpose puts
    # position p in bucket p mod B, i.e. class i in bucket (i + shift) % B
    rolled = jnp.roll(scores, shift)
    _, idx = jax.lax.top_k(rolled.reshape(c // b, b).T, k // b)
    pos = idx * b + jnp.arange(b, dtype=idx.dtype)[:, None]
    return ((pos - shift) % c).reshape(-1)


def sample_classes(rng, labels: jnp.ndarray, num_classes: int,
                   num_sampled: int):
    """Draw the step's class sample. Static shapes throughout.

    Returns (classes [C_s], col_valid [C_s] bool, target [N]):
    - `classes[:N]` are the batch's unique positives (padded slots map to
      class 0 with col_valid=False);
    - `classes[N:]` are distinct uniform negatives, never positives;
    - `target[i]` is the sampled-space column of labels[i].
    """
    n = labels.shape[0]
    if not n <= num_sampled <= num_classes:
        raise ValueError(
            f"need batch {n} <= num_sampled {num_sampled} <= C {num_classes}")
    # unique positives, padded with the out-of-range sentinel C
    pos = jnp.unique(labels, size=n, fill_value=num_classes)
    pos_valid = pos < num_classes
    # uniform negatives without replacement: top-k of random scores,
    # positives pushed below the valid range (sentinel writes land in the
    # extra slot and are dropped)
    scores = jax.random.uniform(rng, (num_classes + 1,))
    scores = scores.at[pos].set(-1.0)
    shift = jax.random.randint(jax.random.fold_in(rng, 1), (), 0,
                               num_classes)
    neg = sample_negatives(scores[:num_classes], num_sampled - n, n,
                           shift=shift)
    classes = jnp.concatenate([jnp.where(pos_valid, pos, 0), neg])
    col_valid = jnp.concatenate(
        [pos_valid, jnp.ones((num_sampled - n,), bool)])
    eq = (classes[None, :] == labels[:, None]) & col_valid[None, :]
    target = jnp.argmax(eq, axis=1).astype(labels.dtype)
    return classes, col_valid, target


def make_partial_fc_train_step(
        backbone, head, head_cfg, tx: optax.GradientTransformation,
        num_sampled: int,
        learning_rate: Union[float, Callable],
        momentum: float = 0.9, weight_decay: float = 5e-4,
        nesterov: bool = False,
        lambda_g: float = 0.0,
        has_dropout: bool = False,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        horizontal_flip: bool = False,
        crop_pad: int = 0, color_jitter: float = 0.0,
        random_erasing: float = 0.0,
        logq_correction: bool = True) -> Callable:
    """Sampled-classifier train step.

    `tx` optimizes the BACKBONE subtree only; the classifier kernel and
    its momentum are updated manually on the sampled columns (torch SGD
    ordering: wd into grad, then momentum — optim.py). `opt_state` is
    `{"backbone": <tx state>, "kernel_mom": [D, C]}` (see
    init_partial_fc_opt_state).

    logq_correction: add ln((C - u)/(C_s - N)) (the log inverse inclusion
    probability of a negative; u = unique positives) to the sampled
    negative logits, the standard sampled-softmax bias correction
    (Bengio & Senecal 2008). The sampled CE then estimates the DENSE CE
    instead of a softmax over a C_s-class problem — measured to matter
    for convergence when C_s << C. Zero when the sample covers every
    class, so dense equivalence is unchanged. insightface's Partial FC
    omits this (their ratios keep C_s large); on by default here.

    Caveat: the correction assumes exact-uniform inclusion q = (C_s - N) /
    (C - u); the bucketed sampler's quota is per bucket, so a bucket with
    n of the batch's positives gives its non-positives (k/B)/((C/B) - n)
    inclusion. sample_negatives makes that deviation unbiased: class ids
    map to buckets by keyed-shifted residue mod B, so adjacent-identity
    batches can't pile positives into one bucket and every class cycles
    through all buckets across steps (uniformity tested empirically in
    tests/test_partial_fc.py). The global top_k path below C~64k is exact.
    """
    if head.name in UNSUPPORTED_HEADS:
        raise ValueError(
            f"partial_fc does not support head '{head.name}' "
            "(memory-blended heads need the full class axis for their "
            "[C, D] memories; sub-center kernels are [D, C*K], not one "
            "column per class)")
    cfg_s = dataclasses.replace(head_cfg, num_classes=num_sampled)

    def lr_at(step):
        if callable(learning_rate):
            return learning_rate(step)
        return jnp.float32(learning_rate)

    def train_step(state: TrainState, images, labels, minput_images=None):
        del minput_images  # memory heads (the minput users) are unsupported
        rng, head_rng, dropout_rng, flip_rng, sample_rng = (
            jax.random.split(state.rng, 5))
        if images.dtype == jnp.uint8:
            images = normalize_images(images, mean, std)
        images = apply_augmentations(
            flip_rng, images, horizontal_flip, crop_pad, color_jitter,
            random_erasing)

        kernel = state.params["kernel_w"]
        num_classes = kernel.shape[1]
        classes, col_valid, target = sample_classes(
            sample_rng, labels, num_classes, num_sampled)
        w_s = jnp.take(jax.lax.stop_gradient(kernel), classes, axis=1)

        n = labels.shape[0]
        if logq_correction:
            # negatives' inclusion prob q = (C_s - N)/(C - u); -ln q added
            # to their logits de-biases the sampled softmax denominator
            u = jnp.sum(col_valid[:n].astype(jnp.float32))
            log_inv_q = jnp.log((num_classes - u)
                                / jnp.float32(num_sampled - n))
            is_neg = jnp.concatenate(
                [jnp.zeros((n,), bool), jnp.ones((num_sampled - n,), bool)])
            logit_shift = jnp.where(is_neg, jnp.maximum(log_inv_q, 0.0), 0.0)
        else:
            logit_shift = jnp.zeros((num_sampled,), jnp.float32)

        def loss_fn(bb_params, w_sampled):
            model_vars = {"params": bb_params,
                          "batch_stats": state.batch_stats}
            rngs = {"dropout": dropout_rng} if has_dropout else None
            feats, mutated = backbone.apply(
                model_vars, images, train=True, mutable=["batch_stats"],
                rngs=rngs)
            feats = feats.astype(jnp.float32)
            out = head.apply(cfg_s, w_sampled, feats, target,
                             state.head_state, rng=head_rng)
            # padded-positive columns drop out of both softmaxes; the logQ
            # shift only affects the CE (not accuracy's pre-margin logits)
            logits = jnp.where(col_valid[None, :],
                               out.logits + logit_shift[None, :], _NEG_INF)
            pre = jnp.where(col_valid[None, :], out.pre_logits, _NEG_INF)
            loss_id = mean_cross_entropy(logits, target)
            loss = loss_id + lambda_g * out.loss_g
            return loss, (out, pre, mutated["batch_stats"], loss_id)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        ((loss, (out, pre, new_batch_stats, loss_id)),
         (g_bb, g_ws)) = grad_fn(state.params["backbone"], w_s)

        # backbone: the configured optax chain
        updates, new_bb_opt = tx.update(
            g_bb, state.opt_state["backbone"], state.params["backbone"])
        new_backbone = optax.apply_updates(state.params["backbone"], updates)

        # kernel: torch-SGD on the sampled columns only (optim.py ordering)
        valid = col_valid[None, :].astype(jnp.float32)
        g_ws = (g_ws + weight_decay * w_s) * valid
        mom = state.opt_state["kernel_mom"]
        mom_s = jnp.take(mom, classes, axis=1)
        new_mom_s = momentum * mom_s + g_ws
        step_dir = g_ws + momentum * new_mom_s if nesterov else new_mom_s
        lr = lr_at(state.step)
        new_kernel = kernel.at[:, classes].add(-lr * step_dir * valid)
        new_mom = mom.at[:, classes].add((new_mom_s - mom_s) * valid)

        acc1, acc5 = topk_accuracy(pre, target, topk=(1, 5))
        metrics = {
            "loss": loss,
            "loss_id": loss_id,
            "loss_mag": lambda_g * out.loss_g,
            # accuracy over the sampled class set (slightly optimistic vs
            # dense top-k — the standard Partial-FC logging caveat)
            "acc1": acc1,
            "acc5": acc5,
            "lr": lr,
            "feat_norm": jnp.mean(out.norms),
        }
        new_state = state.replace(
            step=state.step + 1,
            params={"backbone": new_backbone, "kernel_w": new_kernel},
            batch_stats=new_batch_stats,
            head_state=out.state,
            opt_state={"backbone": new_bb_opt, "kernel_mom": new_mom},
            rng=rng,
        )
        return new_state, metrics

    return train_step


def init_partial_fc_opt_state(tx: optax.GradientTransformation,
                              params) -> dict:
    """{"backbone": tx state over the backbone subtree,
        "kernel_mom": zeros like the [D, C] kernel}."""
    return {"backbone": tx.init(params["backbone"]),
            "kernel_mom": jnp.zeros_like(params["kernel_w"])}
