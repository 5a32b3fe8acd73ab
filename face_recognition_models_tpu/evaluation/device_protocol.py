"""Fully vectorized on-device 10-fold verification protocol.

Same numbers as evaluation/verification.py's sklearn-backed path (tested to
exact agreement), but all ten folds' threshold tuning, accuracy, and AUC
run as one jitted [K, P] computation — the shape the north star asks for
("the 10-fold verification protocol runs fully vectorized on-device"),
useful when the pair set is large or when evaluation runs inside a
training loop.

Protocol semantics replicated exactly:
- fold assignment: sklearn StratifiedKFold(k, shuffle=True, random_state)
  on host (index math over P integers — not device work);
- threshold per fold: roc_curve's candidate set is the distinct scores of
  the HELD-OUT fold in descending order, with Youden's argmax(tpr - fpr)
  picking the first (= highest-threshold) maximizer, exactly like
  np.argmax over sklearn's thresholds (drop_intermediate only removes
  collinear interior points, which can never be the first argmax);
- accuracy: mean over the other nine folds of (sim > threshold) == label;
- AUC on the other nine folds: rank-based Mann-Whitney with average ranks
  for ties (identical to trapezoidal roc_auc_score).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from face_recognition_models_tpu.evaluation.verification import (
    VerificationResult,
)

_BIG = jnp.inf


def fold_assignments(labels: np.ndarray, k_fold: int = 10,
                     seed: int = 42) -> np.ndarray:
    """fold id per pair via StratifiedKFold (host; exact sklearn parity)."""
    from sklearn.model_selection import StratifiedKFold

    skf = StratifiedKFold(n_splits=k_fold, shuffle=True, random_state=seed)
    fold_of = np.empty(len(labels), np.int32)
    for f, (_tr, va) in enumerate(skf.split(labels[:, None], labels)):
        fold_of[va] = f
    return fold_of


@partial(jax.jit, static_argnames=("k_fold",))
def _device_protocol(sims: jnp.ndarray, labels: jnp.ndarray,
                     fold_of: jnp.ndarray, k_fold: int):
    p = sims.shape[0]
    order = jnp.argsort(-sims)                      # descending
    s = sims[order]                                 # [P]
    y = labels[order].astype(jnp.float32)
    f = fold_of[order]

    folds = jnp.arange(k_fold)
    val = (f[None, :] == folds[:, None])            # [K, P] held-out masks
    valf = val.astype(jnp.float32)

    # --- threshold candidates: last occurrence of each distinct value
    # within the fold's descending subsequence -----------------------------
    pos = jnp.arange(p)
    # next val position strictly after i (per fold): reverse cummin of pos
    pos_or_big = jnp.where(val, pos[None, :], p)    # [K, P] int
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(pos_or_big, axis=1), axis=1),
                   axis=1)
    # nxt[k, i] = min{j >= i : val[k, j]}; we need strictly after:
    nxt_after = jnp.concatenate(
        [nxt[:, 1:], jnp.full((k_fold, 1), p)], axis=1)
    next_val_sim = jnp.take(jnp.concatenate([s, jnp.array([jnp.nan])]),
                            jnp.minimum(nxt_after, p))
    is_candidate = val & ((nxt_after >= p) | (next_val_sim != s[None, :]))

    # --- tpr/fpr at each candidate (cumulative over the fold) -------------
    cum_tp = jnp.cumsum(valf * y[None, :], axis=1)
    cum_fp = jnp.cumsum(valf * (1.0 - y)[None, :], axis=1)
    tot_tp = cum_tp[:, -1:]
    tot_fp = cum_fp[:, -1:]
    tpr = cum_tp / jnp.maximum(tot_tp, 1.0)
    fpr = cum_fp / jnp.maximum(tot_fp, 1.0)
    j_stat = jnp.where(is_candidate, tpr - fpr, -_BIG)
    best = jnp.argmax(j_stat, axis=1)               # first max = highest thr
    # sklearn's roc_curve prepends a virtual (threshold=inf, J=0) point
    # which argmax picks when no real candidate has J > 0. A one-class
    # fold makes sklearn's tpr or fpr all-NaN, so np.argmax(tpr - fpr)
    # returns index 0 = that same inf threshold — replicate it exactly
    # instead of letting max(tot, 1) invent a real threshold.
    one_class = (tot_tp[:, 0] == 0.0) | (tot_fp[:, 0] == 0.0)
    thresholds = jnp.where((jnp.max(j_stat, axis=1) > 0.0) & ~one_class,
                           s[best], jnp.inf)        # [K]

    # --- accuracy on the other nine folds ---------------------------------
    train = ~val                                    # [K, P]
    preds = (s[None, :] > thresholds[:, None]).astype(jnp.float32)
    correct = jnp.where(train, (preds == y[None, :]).astype(jnp.float32),
                        0.0)
    n_train = jnp.sum(train, axis=1)
    acc = 100.0 * jnp.sum(correct, axis=1) / jnp.maximum(n_train, 1)

    # --- AUC on the other nine folds (rank-based, average ranks) ----------
    def fold_auc(train_mask):
        sel = train_mask
        self32 = sel.astype(jnp.float32)
        # average ranks among selected elements, with ties averaged.
        # argsort ascending by similarity (array order of s is irrelevant)
        ord2 = jnp.argsort(jnp.where(sel, s, _BIG))
        s2 = s[ord2]
        y2 = y[ord2]
        n = jnp.sum(self32)
        idx = jnp.arange(p, dtype=jnp.float32) + 1.0   # 1-based rank
        # average rank per tie group: group = runs of equal s2 among first n
        in_range = idx <= n
        # boundaries of tie groups
        newgrp = jnp.concatenate([jnp.array([True]), s2[1:] != s2[:-1]])
        gid = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
        grp_sum = jnp.zeros(p).at[gid].add(jnp.where(in_range, idx, 0.0))
        grp_cnt = jnp.zeros(p).at[gid].add(in_range.astype(jnp.float32))
        avg_rank = (grp_sum / jnp.maximum(grp_cnt, 1.0))[gid]
        pos_ranks = jnp.sum(jnp.where(in_range & (y2 > 0.5), avg_rank, 0.0))
        n_pos = jnp.sum(jnp.where(in_range, y2, 0.0))
        n_neg = n - n_pos
        u = pos_ranks - n_pos * (n_pos + 1.0) / 2.0
        return jnp.where((n_pos > 0) & (n_neg > 0),
                         u / jnp.maximum(n_pos * n_neg, 1.0), 0.0)

    aucs = jax.vmap(fold_auc)(train)
    return thresholds, acc, aucs


def kfold_verification_device(similarities, labels, k_fold: int = 10,
                              seed: int = 42) -> VerificationResult:
    """Drop-in device-vectorized version of kfold_verification."""
    sims = jnp.asarray(similarities, jnp.float32)
    labs = np.asarray(labels, np.int64)
    fold_of = jnp.asarray(fold_assignments(labs, k_fold, seed))
    thresholds, acc, aucs = _device_protocol(sims,
                                             jnp.asarray(labs), fold_of,
                                             k_fold)
    acc = np.asarray(acc, np.float64)
    aucs = np.asarray(aucs, np.float64)
    return VerificationResult(
        mean_accuracy=float(acc.mean()),
        std_accuracy=float(acc.std()),
        mean_auc=float(aucs.mean()),
        std_auc=float(aucs.std()),
        fold_accuracies=list(acc),
        fold_aucs=list(aucs),
        fold_thresholds=list(np.asarray(thresholds, np.float64)),
    )
