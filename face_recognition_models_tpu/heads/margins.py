"""The eleven margin-based softmax heads, TPU-native.

Each head reproduces the reference's fp32 math exactly (file:line citations
per head) but is written as a pure function over explicit state, with
one-hot-mask column edits (GSPMD-shardable) instead of in-place scatters.

State that the reference keeps in registered buffers (CurricularFace `t`,
AdaFace `batch_mean/std`, VPL/QAFace `mem/life`, SphereFace's python-side
`iter` counter) is an explicit pytree here, carried through the train state
so it checkpoints, resumes, and shards correctly.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads.base import (
    Head,
    HeadOutput,
    register_head,
)
from face_recognition_models_tpu.ops.normalize import (
    cosine_logits,
    feature_norms,
    l2_normalize,
)

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# Kernel initializers
# ---------------------------------------------------------------------------


def _xavier_uniform_kernel(rng, cfg) -> jnp.ndarray:
    """Xavier-uniform [D, C] (reference ArcFace/SphereFace/VPL/QAFace init,
    criterion.py:243-244 etc. — the bound is symmetric in (D, C) so the
    transpose-layout init is distribution-identical)."""
    d, c = cfg.feature_dim, cfg.num_classes
    bound = math.sqrt(6.0 / (d + c))
    return jax.random.uniform(rng, (d, c), _F32, -bound, bound)


def _unit_column_kernel(rng, cfg) -> jnp.ndarray:
    """InsightFace-style init (criterion.py:150-152): uniform(-1,1) then
    renorm to unit-norm class columns. (The reference's
    `renorm_(2,1,1e-5).mul_(1e5)` scales every column to exactly norm 1, so
    only the random direction matters.)"""
    w = jax.random.uniform(rng, (cfg.feature_dim, cfg.num_classes), _F32,
                           -1.0, 1.0)
    return l2_normalize(w, axis=0, eps=1e-12)


def _normal_kernel(rng, cfg) -> jnp.ndarray:
    """normal(std=0.01) (reference CurricularFace/Elastic*, criterion.py:514)."""
    return 0.01 * jax.random.normal(rng, (cfg.feature_dim, cfg.num_classes),
                                    _F32)


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------


def _one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """[N, C] float one-hot; label -1 (ignore) produces an all-zero row."""
    return jax.nn.one_hot(labels, num_classes, dtype=_F32)


def _target_cos(cos: jnp.ndarray, one_hot: jnp.ndarray) -> jnp.ndarray:
    """Per-row target cosine, [N, 1] — a reduction instead of a gather so
    the class axis can stay sharded under GSPMD."""
    return jnp.sum(cos * one_hot, axis=1, keepdims=True)


def _arc_margin(cos: jnp.ndarray, one_hot: jnp.ndarray, m: float,
                easy_margin: bool, s: float) -> jnp.ndarray:
    """ArcFace additive-angular-margin combine (criterion.py:281-295)."""
    cos_m, sin_m = math.cos(m), math.sin(m)
    th, mm = math.cos(math.pi - m), math.sin(math.pi - m) * m
    sine = jnp.sqrt(jnp.clip(1.0 - cos ** 2, 1e-9, 1.0))
    phi = cos * cos_m - sine * sin_m
    if easy_margin:
        phi = jnp.where(cos > 0, phi, cos)
    else:
        phi = jnp.where(cos > th, phi, cos - mm)
    return (one_hot * phi + (1.0 - one_hot) * cos) * s


def _class_mean_update(values: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray, mem: jnp.ndarray,
                       life: jnp.ndarray, delta: float):
    """Set mem[c] to the batch-mean of `values` rows with label c (only for
    classes present in the batch), set their life to `delta`, then decay all
    lifetimes by 1 (reference VPL criterion.py:702-717 / QAFace :1455-1469).

    Returns (new_mem [C, D], new_life [C], any_valid scalar bool).
    """
    num_classes = mem.shape[0]
    # One-hot matmul instead of scatter-add: [C,N]x[N,D] runs on the MXU and
    # shards cleanly (batch-sharded one-hot x features -> class-sharded
    # sums via an XLA-inserted psum over 'data'). one_hot(-1) is a zero row,
    # which also implements the labels!=-1 filter.
    oh = jax.nn.one_hot(labels, num_classes, dtype=_F32)       # [N, C]
    counts = jnp.sum(oh, axis=0)                                # [C]
    sums = jnp.dot(oh.T, values, preferred_element_type=_F32,
                   precision=jax.lax.Precision.HIGHEST)         # [C, D]
    seen = counts > 0
    new_mem = jnp.where(seen[:, None],
                        sums / jnp.maximum(counts, 1.0)[:, None], mem)
    new_life = jnp.where(seen, float(delta), life) - 1.0
    return new_mem, new_life, jnp.any(valid)


# ---------------------------------------------------------------------------
# SphereFace (criterion.py:12-107)
# ---------------------------------------------------------------------------


class SphereFaceState(struct.PyTreeNode):
    iter: jnp.ndarray  # int32 step counter (criterion.py:33, :58)


def _chebyshev_cos_m_theta(cos: jnp.ndarray, m: int) -> jnp.ndarray:
    """cos(m*theta) via Chebyshev polynomials (criterion.py:40-47)."""
    polys = [
        lambda x: jnp.ones_like(x),
        lambda x: x,
        lambda x: 2.0 * x ** 2 - 1.0,
        lambda x: 4.0 * x ** 3 - 3.0 * x,
        lambda x: 8.0 * x ** 4 - 8.0 * x ** 2 + 1.0,
        lambda x: 16.0 * x ** 5 - 20.0 * x ** 3 + 5.0 * x,
    ]
    return polys[m](cos)


def _sphereface_apply(cfg: cfg_lib.SphereFaceConfig, kernel, feats, labels,
                      state: SphereFaceState, rng=None, minput=None):
    cos, _, norms = cosine_logits(feats, kernel)
    cos = jnp.clip(cos, -1.0, 1.0)

    new_iter = state.iter + 1
    # Annealing lambda (criterion.py:60)
    lamb = jnp.maximum(
        cfg.lambda_min,
        cfg.base * (1.0 + cfg.gamma * new_iter.astype(_F32)) ** (-cfg.power))

    cos_m_theta = _chebyshev_cos_m_theta(cos, cfg.m)
    theta = jnp.arccos(cos)
    k = jnp.floor(cfg.m * theta / math.pi)
    # phi(theta) = (-1)^k * cos(m theta) - 2k (criterion.py:92)
    phi = (1.0 - 2.0 * jnp.mod(k, 2.0)) * cos_m_theta - 2.0 * k

    one_hot = _one_hot(labels, cfg.num_classes)
    # Annealed blend, scaled by the FEATURE NORM, not a constant s
    # (criterion.py:104-105).
    output = (one_hot * (phi - cos) / (1.0 + lamb) + cos) * norms
    pre = cos * norms
    return HeadOutput(pre, output, norms, jnp.float32(0.0), one_hot,
                      SphereFaceState(iter=new_iter))


register_head(Head(
    name="sphereface",
    init_kernel=_xavier_uniform_kernel,
    init_state=lambda cfg: SphereFaceState(iter=jnp.int32(0)),
    apply=_sphereface_apply,
))


# ---------------------------------------------------------------------------
# CosFace (criterion.py:137-197)
# ---------------------------------------------------------------------------


def _cosface_apply(cfg: cfg_lib.CosFaceConfig, kernel, feats, labels,
                   state=None, rng=None, minput=None):
    cos, _, norms = cosine_logits(feats, kernel)
    cos = jnp.clip(cos, -1.0 + cfg.eps, 1.0 - cfg.eps)  # criterion.py:177
    one_hot = _one_hot(labels, cfg.num_classes)
    logits = (cos - one_hot * cfg.m) * cfg.s            # criterion.py:186-189
    return HeadOutput(cos * cfg.s, logits, norms, jnp.float32(0.0), one_hot,
                      state)


register_head(Head(
    name="cosface",
    init_kernel=_unit_column_kernel,
    init_state=lambda cfg: None,
    apply=_cosface_apply,
))


# ---------------------------------------------------------------------------
# ArcFace (criterion.py:232-301)
# ---------------------------------------------------------------------------


def _arcface_apply(cfg: cfg_lib.ArcFaceConfig, kernel, feats, labels,
                   state=None, rng=None, minput=None):
    cos, _, norms = cosine_logits(feats, kernel)  # no clamp (criterion.py:267)
    one_hot = _one_hot(labels, cfg.num_classes)
    logits = _arc_margin(cos, one_hot, cfg.m, cfg.easy_margin, cfg.s)
    return HeadOutput(cos * cfg.s, logits, norms, jnp.float32(0.0), one_hot,
                      state)


register_head(Head(
    name="arcface",
    init_kernel=_xavier_uniform_kernel,
    init_state=lambda cfg: None,
    apply=_arcface_apply,
))


# ---------------------------------------------------------------------------
# MV-Softmax (criterion.py:327-461)
# ---------------------------------------------------------------------------


def _mv_softmax_apply(cfg: cfg_lib.MVSoftmaxConfig, kernel, feats, labels,
                      state=None, rng=None, minput=None):
    cos, _, norms = cosine_logits(feats, kernel)
    cos = jnp.clip(cos, -1.0 + cfg.eps, 1.0 - cfg.eps)  # criterion.py:413
    pre = cos * cfg.s
    one_hot = _one_hot(labels, cfg.num_classes)
    t_cos = _target_cos(cos, one_hot)                   # [N,1]

    if cfg.margin_type == "am":                         # criterion.py:420-424
        final_target = jnp.where(t_cos > cfg.m, t_cos - cfg.m, t_cos)
        mask = cos > (t_cos - cfg.m)
    elif cfg.margin_type == "arc":                      # criterion.py:426-430
        sin_t = jnp.sqrt(1.0 - t_cos ** 2 + 1e-9)
        ctm = t_cos * math.cos(cfg.m) - sin_t * math.sin(cfg.m)
        final_target = jnp.where(t_cos > 0.0, ctm, t_cos)
        mask = cos > ctm
    else:
        raise ValueError("margin_type must be 'am' or 'arc'")

    # Mis-classified vector scaling t*cos + (t-1) on hard negatives
    # (criterion.py:432-435). The target column also satisfies the mask but
    # is overwritten right after, matching the reference's scatter order.
    cos = jnp.where(mask, cfg.mv_weight * cos + (cfg.mv_weight - 1.0), cos)
    cos = one_hot * final_target + (1.0 - one_hot) * cos
    return HeadOutput(pre, cos * cfg.s, norms, jnp.float32(0.0), one_hot,
                      state)


register_head(Head(
    name="mv_softmax",
    init_kernel=_unit_column_kernel,
    init_state=lambda cfg: None,
    apply=_mv_softmax_apply,
))


# ---------------------------------------------------------------------------
# CurricularFace (criterion.py:491-587)
# ---------------------------------------------------------------------------


class CurricularFaceState(struct.PyTreeNode):
    t: jnp.ndarray  # EMA of mean target cosine, shape [1] (criterion.py:517)


def _curricularface_apply(cfg: cfg_lib.CurricularFaceConfig, kernel, feats,
                          labels, state: CurricularFaceState, rng=None,
                          minput=None):
    cos, _, norms = cosine_logits(feats, kernel)
    cos = jnp.clip(cos, -1.0, 1.0)                      # criterion.py:546
    pre = cos * cfg.s
    one_hot = _one_hot(labels, cfg.num_classes)
    t_cos = _target_cos(cos, one_hot)

    cos_m, sin_m = math.cos(cfg.m), math.sin(cfg.m)
    threshold = math.cos(math.pi - cfg.m)
    mm = math.sin(math.pi - cfg.m) * cfg.m

    # Reference has NO eps here (:555) — and NaNs: d sqrt(u)/du = inf at
    # u=0, so the step a target cosine saturates to exactly +-1 (observed
    # on the synthetic convergence run once train accuracy hits 100%)
    # poisons every gradient. Forward-exact fix: same sqrt values, zero
    # subgradient at the saturation point (README "Differences").
    u = jnp.maximum(1.0 - t_cos ** 2, 0.0)
    sin_t = jnp.where(u > 0, jnp.sqrt(jnp.where(u > 0, u, 1.0)), 0.0)
    ctm = t_cos * cos_m - sin_t * sin_m
    mask = cos > ctm
    final_target = jnp.where(t_cos > threshold, ctm, t_cos - mm)

    # EMA difficulty updated BEFORE scaling hard negatives, and the NEW t is
    # used in the scaling (criterion.py:569-575). Under pjit-DP the batch
    # mean is automatically the global-batch mean.
    new_t = jax.lax.stop_gradient(
        jnp.mean(t_cos) * cfg.momentum + (1.0 - cfg.momentum) * state.t)

    cos = jnp.where(mask, cos * (new_t + cos), cos)
    cos = one_hot * final_target + (1.0 - one_hot) * cos
    return HeadOutput(pre, cos * cfg.s, norms, jnp.float32(0.0), one_hot,
                      CurricularFaceState(t=new_t))


register_head(Head(
    name="curricularface",
    init_kernel=_normal_kernel,
    init_state=lambda cfg: CurricularFaceState(t=jnp.zeros((1,), _F32)),
    apply=_curricularface_apply,
))


# ---------------------------------------------------------------------------
# VPL-ArcFace (criterion.py:619-762)
# ---------------------------------------------------------------------------


class VPLArcFaceState(struct.PyTreeNode):
    mem: jnp.ndarray   # [C, D] per-class feature-mean memory (:661)
    life: jnp.ndarray  # [C] memory lifetimes (:662)
    training_flag: jnp.ndarray  # bool; change_training_mode (:676-678)


def _vpl_arcface_apply(cfg: cfg_lib.VPLArcFaceConfig, kernel, feats, labels,
                       state: VPLArcFaceState, rng=None, minput=None):
    feats = feats.astype(_F32)
    cos_w, xn, norms = cosine_logits(feats, kernel)
    one_hot = _one_hot(labels, cfg.num_classes)

    valid = labels >= 0
    new_mem, new_life, any_valid = _class_mean_update(
        jax.lax.stop_gradient(feats), labels, valid, state.mem, state.life,
        cfg.delta)
    use_mem = jnp.logical_and(state.training_flag, any_valid)
    new_mem = jnp.where(use_mem, new_mem, state.mem)
    new_life = jnp.where(use_mem, new_life, state.life)

    active = (new_life > 0).astype(_F32)[None, :]       # [1, C]
    mem_n = l2_normalize(new_mem, axis=1)
    cos_mem = jnp.dot(xn, mem_n.T, preferred_element_type=_F32,
                      precision=jax.lax.Precision.HIGHEST)

    lam = cfg.lamda
    # Non-target: blend toward memory cosine; target: blend toward 1.0
    # (criterion.py:724-726).
    cosine1 = (1.0 - active * lam) * cos_w + active * lam * cos_mem
    cosine2 = (1.0 - active * lam) * cos_w + active * lam * 1.0
    blended = one_hot * cosine2 + (1.0 - one_hot) * cosine1
    cosine = jnp.where(use_mem, blended, cos_w)

    cosine = jnp.clip(cosine, -1.0 + cfg.eps, 1.0 - cfg.eps)  # :733
    pre = cosine * cfg.s
    logits = _arc_margin(cosine, one_hot, cfg.m, cfg.easy_margin, cfg.s)
    new_state = VPLArcFaceState(mem=new_mem, life=new_life,
                                training_flag=state.training_flag)
    return HeadOutput(pre, logits, norms, jnp.float32(0.0), one_hot,
                      new_state)


def _vpl_init_state(cfg: cfg_lib.VPLArcFaceConfig):
    return VPLArcFaceState(
        mem=jnp.zeros((cfg.num_classes, cfg.feature_dim), _F32),
        life=jnp.zeros((cfg.num_classes,), _F32),
        training_flag=jnp.bool_(True),
    )


register_head(Head(
    name="vpl_arcface",
    init_kernel=_xavier_uniform_kernel,
    init_state=_vpl_init_state,
    apply=_vpl_arcface_apply,
))


# ---------------------------------------------------------------------------
# AdaFace (criterion.py:795-918)
# ---------------------------------------------------------------------------


class AdaFaceState(struct.PyTreeNode):
    t: jnp.ndarray           # [1] unused legacy buffer (:836)
    batch_mean: jnp.ndarray  # [1], init 20 (:837)
    batch_std: jnp.ndarray   # [1], init 100 (:838)


def _adaface_apply(cfg: cfg_lib.AdaFaceConfig, kernel, feats, labels,
                   state: AdaFaceState, rng=None, minput=None):
    cos, _, norms = cosine_logits(feats, kernel)
    cos = jnp.clip(cos, -1.0 + cfg.eps, 1.0 - cfg.eps)  # eps=1e-3, :872
    pre = cos * cfg.s

    safe_norms = jax.lax.stop_gradient(jnp.clip(norms, 0.001, 100.0))  # :876
    mean = jnp.mean(safe_norms)
    std = jnp.std(safe_norms, ddof=1)  # torch .std() is Bessel-corrected
    # NOTE the reference weights the EMA toward the CURRENT batch
    # (batch*alpha + (1-alpha)*ema with alpha=0.99, :881-882) — replicated.
    new_mean = mean * cfg.t_alpha + (1.0 - cfg.t_alpha) * state.batch_mean
    new_std = std * cfg.t_alpha + (1.0 - cfg.t_alpha) * state.batch_std

    margin_scaler = (safe_norms - new_mean) / (new_std + cfg.eps)  # :884
    margin_scaler = jnp.clip(margin_scaler * cfg.h, -1.0, 1.0)

    one_hot = _one_hot(labels, cfg.num_classes)

    # 1) angular: cos(theta + (-m * scaler)) on the target column (:893-896)
    theta = jnp.arccos(cos)
    m_arc = one_hot * (cfg.m * margin_scaler * -1.0)
    theta_m = jnp.clip(theta + m_arc, cfg.eps, math.pi - cfg.eps)
    cos_m_arc = jnp.cos(theta_m)
    # 2) additive: -m * (1 + scaler) on the target column (:898-901)
    g_add = cfg.m + cfg.m * margin_scaler
    cosine = cos_m_arc - one_hot * g_add

    new_state = AdaFaceState(t=state.t, batch_mean=new_mean,
                             batch_std=new_std)
    return HeadOutput(pre, cosine * cfg.s, norms, jnp.float32(0.0), one_hot,
                      new_state)


def _adaface_init_state(cfg: cfg_lib.AdaFaceConfig):
    return AdaFaceState(
        t=jnp.zeros((1,), _F32),
        batch_mean=jnp.ones((1,), _F32) * 20.0,
        batch_std=jnp.ones((1,), _F32) * 100.0,
    )


register_head(Head(
    name="adaface",
    init_kernel=_unit_column_kernel,
    init_state=_adaface_init_state,
    apply=_adaface_apply,
))


# ---------------------------------------------------------------------------
# ElasticCosFace / ElasticArcFace (criterion.py:951-1030, 1054-1154)
# ---------------------------------------------------------------------------


def _elastic_margin(rng, t_cos, valid, m, std, plus):
    """Per-sample margin ~ N(m, std) clipped to m±std; in plus mode the
    largest margins go to the hardest (lowest target-cos) samples via the
    reference's sort/rank composition (criterion.py:1003-1012)."""
    n = t_cos.shape[0]
    margin = m + std * jax.random.normal(rng, (n,), _F32)
    margin = jnp.clip(margin, m - std, m + std)
    if plus:
        rank = jnp.argsort(-t_cos)          # descending target cosine
        margin = jnp.sort(margin)[rank]     # ascending margins permuted
    return jnp.where(valid, margin, 0.0)


def _elastic_cosface_apply(cfg: cfg_lib.ElasticCosFaceConfig, kernel, feats,
                           labels, state=None, rng=None, minput=None):
    cos, _, norms = cosine_logits(feats, kernel)
    cos = jnp.clip(cos, -1.0 + cfg.eps, 1.0 - cfg.eps)
    pre = cos * cfg.s
    one_hot = _one_hot(labels, cfg.num_classes)
    valid = labels >= 0

    t_cos = _target_cos(cos, one_hot)[:, 0]
    margin = _elastic_margin(rng, t_cos, valid, cfg.m, cfg.std, cfg.plus)
    new_target = (t_cos - margin)[:, None]
    cos = jnp.where((one_hot > 0) & valid[:, None], new_target, cos)
    return HeadOutput(pre, cos * cfg.s, norms, jnp.float32(0.0), one_hot,
                      state)


def _elastic_arcface_apply(cfg: cfg_lib.ElasticArcFaceConfig, kernel, feats,
                           labels, state=None, rng=None, minput=None):
    cos, _, norms = cosine_logits(feats, kernel)
    cos = jnp.clip(cos, -1.0 + cfg.eps, 1.0 - cfg.eps)
    pre = cos * cfg.s
    one_hot = _one_hot(labels, cfg.num_classes)
    valid = labels >= 0

    t_cos = _target_cos(cos, one_hot)[:, 0]
    margin = _elastic_margin(rng, t_cos, valid, cfg.m, cfg.std, cfg.plus)
    # cos(clip(acos(t) + m, 0, pi)) (criterion.py:1129-1132)
    theta_m = jnp.clip(jnp.arccos(t_cos) + margin, 0.0, math.pi)
    new_target = jnp.cos(theta_m)[:, None]
    cos = jnp.where((one_hot > 0) & valid[:, None], new_target, cos)
    return HeadOutput(pre, cos * cfg.s, norms, jnp.float32(0.0), one_hot,
                      state)


register_head(Head(
    name="elastic_cosface",
    init_kernel=_normal_kernel,
    init_state=lambda cfg: None,
    apply=_elastic_cosface_apply,
    requires_rng=True,
))

register_head(Head(
    name="elastic_arcface",
    init_kernel=_normal_kernel,
    init_state=lambda cfg: None,
    apply=_elastic_arcface_apply,
    requires_rng=True,
))


# ---------------------------------------------------------------------------
# MagFace (criterion.py:1178-1301)
# ---------------------------------------------------------------------------


def _magface_apply(cfg: cfg_lib.MagFaceConfig, kernel, feats, labels,
                   state=None, rng=None, minput=None):
    cos, _, norms = cosine_logits(feats, kernel)
    x_norm = jnp.clip(norms, cfg.l_a, cfg.u_a)          # [N,1], :1245
    # Magnitude regularizer g = a/u_a^2 + 1/a (criterion.py:1235-1238)
    loss_g = jnp.mean(x_norm / (cfg.u_a ** 2) + 1.0 / x_norm)

    cos = jnp.clip(cos, -1.0 + cfg.eps, 1.0 - cfg.eps)
    pre = cos * cfg.s

    # Linear norm->margin map (criterion.py:1229-1232)
    ada_m = ((cfg.u_margin - cfg.l_margin) / (cfg.u_a - cfg.l_a)
             * (x_norm - cfg.l_a) + cfg.l_margin)       # [N,1]
    cos_m, sin_m = jnp.cos(ada_m), jnp.sin(ada_m)
    sin_theta = jnp.sqrt(1.0 - cos ** 2 + 1e-9)
    ctm = cos * cos_m - sin_theta * sin_m
    if cfg.easy_margin:
        ctm = jnp.where(cos > 0, ctm, cos)
    else:
        mm = jnp.sin(math.pi - ada_m) * ada_m
        threshold = jnp.cos(math.pi - ada_m)
        ctm = jnp.where(cos > threshold, ctm, cos - mm)

    one_hot = _one_hot(labels, cfg.num_classes)
    logits = (one_hot * ctm + (1.0 - one_hot) * cos) * cfg.s
    # The reference returns the CLAMPED norm as `norms` (:1290).
    return HeadOutput(pre, logits, x_norm, loss_g, one_hot, state)


register_head(Head(
    name="magface",
    init_kernel=_unit_column_kernel,
    init_state=lambda cfg: None,
    apply=_magface_apply,
))


# ---------------------------------------------------------------------------
# QAFace (criterion.py:1331-1520)
# ---------------------------------------------------------------------------


class QAFaceState(struct.PyTreeNode):
    mem: jnp.ndarray   # [C, D] injection memory (:1376)
    life: jnp.ndarray  # [C] (:1377)
    muy: jnp.ndarray   # scalar EMA of minput magnitude mean (:1380)
    std: jnp.ndarray   # scalar EMA of minput magnitude std (:1381)
    training_flag: jnp.ndarray  # bool (:1390)


def _qaface_apply(cfg: cfg_lib.QAFaceConfig, kernel, feats, labels,
                  state: QAFaceState, rng=None, minput=None):
    """QAFace with a working dual-input contract: `minput` is the feature of
    a degraded/low-quality view (the reference's QAFaceNet plumbing is broken
    — criterion.py:1543-1552 receives labels in the minput slot; here the
    pipeline passes an explicit second view, falling back to `feats`)."""
    feats = feats.astype(_F32)
    if minput is None:
        minput = feats
    minput = minput.astype(_F32)

    cos_w, xn, norms = cosine_logits(feats, kernel)
    one_hot = _one_hot(labels, cfg.num_classes)

    # --- magnitude EMA over the degraded view (criterion.py:1438-1448) ---
    mag = feature_norms(minput)                     # [N,1]
    mag_mean = jnp.mean(mag)
    # torch .std() semantics (ddof=1), but with a finite subgradient at
    # zero variance: the reference's mag_minput.std() (:1440) NaNs its
    # backward when every magnitude in the batch is equal (sqrt'(0)=inf),
    # and the EMA is inside the differentiated path here. Forward-exact.
    var = jnp.var(mag, ddof=1)
    mag_std = jnp.where(var > 0, jnp.sqrt(jnp.where(var > 0, var, 1.0)),
                        0.0)
    first = state.muy == 0.0
    new_muy = jnp.where(first, mag_mean,
                        cfg.alpha * state.muy + (1 - cfg.alpha) * mag_mean)
    new_std = jnp.where(first, mag_std,
                        cfg.alpha * state.std + (1 - cfg.alpha) * mag_std)

    z = (mag - new_muy) / (new_std + 1e-6)          # [N,1], :1451
    f = jnp.where(jnp.abs(z) < cfg.tto, jnp.exp(-z), 0.0)  # :1405-1409
    injection = f * minput / (mag + 1e-6)           # [N,D], :1453

    valid = labels >= 0
    new_mem, new_life, any_valid = _class_mean_update(
        jax.lax.stop_gradient(injection), labels, valid, state.mem,
        state.life, cfg.delta)
    use_mem = jnp.logical_and(state.training_flag, any_valid)
    new_mem = jnp.where(use_mem, new_mem, state.mem)
    new_life = jnp.where(use_mem, new_life, state.life)
    new_muy = jnp.where(state.training_flag, new_muy, state.muy)
    new_std = jnp.where(state.training_flag, new_std, state.std)

    active = (new_life > 0).astype(_F32)[None, :]
    mem_n = l2_normalize(new_mem, axis=1)
    cos_mem = jnp.dot(xn, mem_n.T, preferred_element_type=_F32,
                      precision=jax.lax.Precision.HIGHEST)
    # Non-target: full memory replacement where active (:1476)
    cosine1 = (1.0 - active) * cos_w + active * cos_mem
    # Target: cosine against (class weight + injection) (:1479-1482)
    target_w = jnp.take(kernel.astype(_F32), jnp.where(valid, labels, 0),
                        axis=1).T + injection       # [N,D]
    cosine2 = jnp.sum(xn * l2_normalize(target_w, axis=1), axis=1,
                      keepdims=True)                # [N,1]
    blended = one_hot * cosine2 + (1.0 - one_hot) * cosine1
    cosine = jnp.where(use_mem, blended, cos_w)

    cosine = jnp.clip(cosine, -1.0 + cfg.eps, 1.0 - cfg.eps)
    pre = cosine * cfg.s
    logits = _arc_margin(cosine, one_hot, cfg.m, cfg.easy_margin, cfg.s)
    new_state = QAFaceState(mem=new_mem, life=new_life, muy=new_muy,
                            std=new_std, training_flag=state.training_flag)
    return HeadOutput(pre, logits, norms, jnp.float32(0.0), one_hot,
                      new_state)


def _qaface_init_state(cfg: cfg_lib.QAFaceConfig):
    return QAFaceState(
        mem=jnp.zeros((cfg.num_classes, cfg.feature_dim), _F32),
        life=jnp.zeros((cfg.num_classes,), _F32),
        muy=jnp.float32(0.0),
        std=jnp.float32(1.0),
        training_flag=jnp.bool_(True),
    )


register_head(Head(
    name="qaface",
    init_kernel=_xavier_uniform_kernel,
    init_state=_qaface_init_state,
    apply=_qaface_apply,
    requires_minput=True,
))


# ---------------------------------------------------------------------------
# Combined margin (beyond the reference: insightface's unified recipe)
# ---------------------------------------------------------------------------


def _combined_margin_apply(cfg: cfg_lib.CombinedMarginConfig, kernel, feats,
                           labels, state=None, rng=None, minput=None):
    """Unified target-column margin cos(m1*theta + m2) - m3, scaled by s.

    Subsumes the reference's fixed-margin family ((1, m, 0) = ArcFace
    criterion.py:281-295 to fp32 roundoff, (1, 0, m) = CosFace :186-189 on
    the target column) and adds the mixed production configs the reference
    cannot express. The transformed angle is clamped to [0, pi] so the
    margin stays monotone when m1*theta + m2 exceeds pi (the acos-free
    ArcFace fallback `cos - m*sin(m)` handles that region in the reference;
    insightface's combined path leaves it unguarded).
    """
    cos, _, norms = cosine_logits(feats, kernel)
    one_hot = _one_hot(labels, cfg.num_classes)
    t_cos = jnp.clip(_target_cos(cos, one_hot),
                     -1.0 + cfg.eps, 1.0 - cfg.eps)     # [N, 1]
    theta = jnp.arccos(t_cos)
    phi = jnp.cos(jnp.clip(cfg.m1 * theta + cfg.m2, 0.0, math.pi)) - cfg.m3
    logits = (one_hot * phi + (1.0 - one_hot) * cos) * cfg.s
    return HeadOutput(cos * cfg.s, logits, norms, jnp.float32(0.0), one_hot,
                      state)


register_head(Head(
    name="combined_margin",
    init_kernel=_normal_kernel,
    init_state=lambda cfg: None,
    apply=_combined_margin_apply,
))


# ---------------------------------------------------------------------------
# Sub-center ArcFace (beyond the reference: Deng et al., ECCV 2020)
# ---------------------------------------------------------------------------


def _subcenter_kernel(rng, cfg) -> jnp.ndarray:
    """Xavier-uniform [D, C*K], class-major column layout
    (columns [c*K, (c+1)*K) are class c's K sub-centers)."""
    d, ck = cfg.feature_dim, cfg.num_classes * cfg.k
    bound = math.sqrt(6.0 / (d + ck))
    return jax.random.uniform(rng, (d, ck), _F32, -bound, bound)


def _subcenter_arcface_apply(cfg: cfg_lib.SubCenterArcFaceConfig, kernel,
                             feats, labels, state=None, rng=None,
                             minput=None):
    """ArcFace margin (criterion.py:281-295 combine) over per-class cosine
    max-pooled across K sub-center prototypes.

    The [N, C*K] cosine reshapes to [N, C, K] (class-major kernel layout)
    and pools with max, so gradients flow only to each sample's winning
    sub-center — the mechanism that isolates noisy/hard faces into
    secondary sub-centers. With k=1 this IS ArcFace. Under class-TP the
    kernel shards over the 'model' mesh axis along the C*K column axis
    (whole classes per shard when C divides the axis size; the reshape is a
    GSPMD-clean split of the sharded dimension).
    """
    cos_all, _, norms = cosine_logits(feats, kernel)    # [N, C*K]
    n = cos_all.shape[0]
    cos = jnp.max(cos_all.reshape(n, cfg.num_classes, cfg.k), axis=2)
    one_hot = _one_hot(labels, cfg.num_classes)
    logits = _arc_margin(cos, one_hot, cfg.m, cfg.easy_margin, cfg.s)
    return HeadOutput(cos * cfg.s, logits, norms, jnp.float32(0.0), one_hot,
                      state)


register_head(Head(
    name="subcenter_arcface",
    init_kernel=_subcenter_kernel,
    init_state=lambda cfg: None,
    apply=_subcenter_arcface_apply,
))


# ---------------------------------------------------------------------------
# AdaCos (Zhang et al., CVPR 2019 — beyond the reference)
# ---------------------------------------------------------------------------


class AdaCosState(struct.PyTreeNode):
    s: jnp.ndarray  # [1] running adaptive scale


def _adacos_init_scale(cfg) -> float:
    """Fixed AdaCos scale sqrt(2) * ln(C - 1) (paper eq. 11)."""
    return math.sqrt(2.0) * math.log(max(cfg.num_classes - 1, 2))


def _adacos_apply(cfg: cfg_lib.AdaCosConfig, kernel, feats, labels,
                  state: AdaCosState, rng=None, minput=None):
    """Margin-free cosine logits with an analytically-set scale.

    Dynamic rule (paper eqs. 12-13): with the previous scale s,
      B_avg     = mean_i sum_{k != y_i} exp(s * cos_ik)
      theta_med = median_i arccos(cos_target_i), clipped to <= theta_clip
      s_new     = ln(B_avg) / cos(theta_med)
    and the CURRENT batch's logits use s_new. The scale chases the point
    where the median sample's target probability is ~0.5, so supervision
    anneals itself — no margin or scale hyperparameter to tune. The exp
    sum reuses the previous scale, so s is head state (like
    CurricularFace's t, criterion.py:517); under pjit-DP the batch
    mean/median are global-batch statistics automatically.
    """
    cos, _, norms = cosine_logits(feats, kernel)
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    one_hot = _one_hot(labels, cfg.num_classes)
    if cfg.dynamic:
        t_cos = _target_cos(cos, one_hot)                       # [N, 1]
        theta = jnp.arccos(t_cos[:, 0])                         # [N]
        # stop_gradient: the scale is a statistic, not a learnable path
        # (also kills arccos's infinite slope at |cos| -> 1)
        b_avg = jnp.mean(jnp.sum(
            (1.0 - one_hot) * jnp.exp(state.s * cos), axis=1))
        theta_med = jnp.clip(jnp.median(theta), 0.0, cfg.theta_clip)
        s_new = jax.lax.stop_gradient(
            jnp.log(jnp.maximum(b_avg, 1e-12)) / jnp.cos(theta_med))
        s_new = jnp.reshape(s_new, (1,))
        new_state = AdaCosState(s=s_new)
        scale = s_new[0]
    else:
        new_state = state
        scale = state.s[0]
    logits = cos * scale
    # no margin: pre-margin and CE logits coincide
    return HeadOutput(logits, logits, norms, jnp.float32(0.0), one_hot,
                      new_state)


register_head(Head(
    name="adacos",
    init_kernel=_xavier_uniform_kernel,
    init_state=lambda cfg: AdaCosState(
        s=jnp.full((1,), _adacos_init_scale(cfg), _F32)),
    apply=_adacos_apply,
))
