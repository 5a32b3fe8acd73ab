"""Adapter: margin heads -> the fused Pallas margin+CE kernel.

For each supported head this computes the per-row scalars (target logit
value t, pre-margin target cosine, scale, mode params a/b) in O(N*D) jnp —
no [N, C] intermediate — plus the head's state update, then calls
`fused_margin_ce`. Heads whose cosine matrix is itself blended with a
memory (VPL, QAFace) are not fusable this way and keep the jnp path.

Numerical contract: identical math to heads/margins.py (same clamps, same
formulas); tests assert loss/grads match the jnp path to fp32 tolerance.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import margins as m
from face_recognition_models_tpu.ops.fused_head import (
    MODE_CURRICULAR,
    MODE_IDENTITY,
    MODE_MV,
    fused_margin_ce,
)
from face_recognition_models_tpu.ops.normalize import (
    feature_norms,
    l2_normalize,
)

FUSED_HEADS = ("cosface", "arcface", "sphereface", "mv_softmax",
               "curricularface", "adaface", "elastic_cosface",
               "elastic_arcface", "magface")


def fused_supported(name: str) -> bool:
    return name in FUSED_HEADS


class FusedApplyOut(NamedTuple):
    loss_id: jnp.ndarray      # scalar mean CE
    loss_g: jnp.ndarray       # scalar aux loss (MagFace)
    acc1: jnp.ndarray         # percent
    acc5: jnp.ndarray
    norms: jnp.ndarray        # [N, 1]
    state: object


class _RowParams(NamedTuple):
    t: jnp.ndarray
    tcos: jnp.ndarray
    scale: jnp.ndarray
    ab: jnp.ndarray
    mode: int
    clamp_eps: Optional[float]
    loss_g: jnp.ndarray
    new_state: object


def _row_params(cfg, tcos_raw, norms, state, rng) -> _RowParams:
    """Per-head reduction to the kernel's row-scalar form. `tcos_raw` is the
    UNclamped target cosine [N]."""
    n = tcos_raw.shape[0]
    zeros2 = jnp.zeros((n, 2), jnp.float32)
    zero = jnp.float32(0.0)
    name = cfg.name

    if name == "cosface":
        eps = cfg.eps
        tcos = jnp.clip(tcos_raw, -1 + eps, 1 - eps)
        t = tcos - cfg.m
        return _RowParams(t, tcos, jnp.full((n,), cfg.s), zeros2,
                          MODE_IDENTITY, eps, zero, state)

    if name == "arcface":
        tcos = tcos_raw
        sine = jnp.sqrt(jnp.clip(1.0 - tcos ** 2, 1e-9, 1.0))
        phi = tcos * math.cos(cfg.m) - sine * math.sin(cfg.m)
        if cfg.easy_margin:
            t = jnp.where(tcos > 0, phi, tcos)
        else:
            th = math.cos(math.pi - cfg.m)
            mm = math.sin(math.pi - cfg.m) * cfg.m
            t = jnp.where(tcos > th, phi, tcos - mm)
        return _RowParams(t, tcos, jnp.full((n,), cfg.s), zeros2,
                          MODE_IDENTITY, None, zero, state)

    if name == "sphereface":
        tcos = jnp.clip(tcos_raw, -1.0, 1.0)
        new_iter = state.iter + 1
        lamb = jnp.maximum(
            cfg.lambda_min,
            cfg.base * (1.0 + cfg.gamma * new_iter.astype(jnp.float32))
            ** (-cfg.power))
        cos_m_theta = m._chebyshev_cos_m_theta(tcos, cfg.m)
        theta = jnp.arccos(tcos)
        k = jnp.floor(cfg.m * theta / math.pi)
        phi = (1.0 - 2.0 * jnp.mod(k, 2.0)) * cos_m_theta - 2.0 * k
        t = (phi - tcos) / (1.0 + lamb) + tcos
        return _RowParams(t, tcos, norms[:, 0], zeros2, MODE_IDENTITY, 0.0,
                          zero, m.SphereFaceState(iter=new_iter))

    if name == "mv_softmax":
        eps = cfg.eps
        tcos = jnp.clip(tcos_raw, -1 + eps, 1 - eps)
        if cfg.margin_type == "am":
            t = jnp.where(tcos > cfg.m, tcos - cfg.m, tcos)
            a = tcos - cfg.m
        else:
            sin_t = jnp.sqrt(1.0 - tcos ** 2 + 1e-9)
            ctm = tcos * math.cos(cfg.m) - sin_t * math.sin(cfg.m)
            t = jnp.where(tcos > 0.0, ctm, tcos)
            a = ctm
        ab = jnp.stack([a, jnp.full((n,), cfg.mv_weight)], axis=1)
        return _RowParams(t, tcos, jnp.full((n,), cfg.s), ab, MODE_MV, eps,
                          zero, state)

    if name == "curricularface":
        tcos = jnp.clip(tcos_raw, -1.0, 1.0)
        sin_t = jnp.sqrt(1.0 - tcos ** 2)
        ctm = tcos * math.cos(cfg.m) - sin_t * math.sin(cfg.m)
        threshold = math.cos(math.pi - cfg.m)
        mm = math.sin(math.pi - cfg.m) * cfg.m
        t = jnp.where(tcos > threshold, ctm, tcos - mm)
        new_t = jax.lax.stop_gradient(
            jnp.mean(tcos[:, None]) * cfg.momentum
            + (1.0 - cfg.momentum) * state.t)
        ab = jnp.stack([ctm, jnp.broadcast_to(new_t, (n,))], axis=1)
        return _RowParams(t, tcos, jnp.full((n,), cfg.s), ab,
                          MODE_CURRICULAR, 0.0, zero,
                          m.CurricularFaceState(t=new_t))

    if name == "adaface":
        eps = cfg.eps
        tcos = jnp.clip(tcos_raw, -1 + eps, 1 - eps)
        safe_norms = jax.lax.stop_gradient(jnp.clip(norms, 0.001, 100.0))
        mean = jnp.mean(safe_norms)
        std = jnp.std(safe_norms, ddof=1)
        new_mean = mean * cfg.t_alpha + (1 - cfg.t_alpha) * state.batch_mean
        new_std = std * cfg.t_alpha + (1 - cfg.t_alpha) * state.batch_std
        scaler = jnp.clip((safe_norms - new_mean) / (new_std + eps)
                          * cfg.h, -1.0, 1.0)[:, 0]
        theta = jnp.arccos(tcos)
        theta_m = jnp.clip(theta - cfg.m * scaler, eps, math.pi - eps)
        t = jnp.cos(theta_m) - (cfg.m + cfg.m * scaler)
        new_state = m.AdaFaceState(t=state.t, batch_mean=new_mean,
                                   batch_std=new_std)
        return _RowParams(t, tcos, jnp.full((n,), cfg.s), zeros2,
                          MODE_IDENTITY, eps, zero, new_state)

    if name in ("elastic_cosface", "elastic_arcface"):
        eps = cfg.eps
        tcos = jnp.clip(tcos_raw, -1 + eps, 1 - eps)
        valid = jnp.ones((n,), bool)
        margin = m._elastic_margin(rng, tcos, valid, cfg.m, cfg.std,
                                   cfg.plus)
        if name == "elastic_cosface":
            t = tcos - margin
        else:
            t = jnp.cos(jnp.clip(jnp.arccos(tcos) + margin, 0.0, math.pi))
        return _RowParams(t, tcos, jnp.full((n,), cfg.s), zeros2,
                          MODE_IDENTITY, eps, zero, state)

    if name == "magface":
        eps = cfg.eps
        tcos = jnp.clip(tcos_raw, -1 + eps, 1 - eps)
        x_norm = jnp.clip(norms, cfg.l_a, cfg.u_a)
        loss_g = jnp.mean(x_norm / (cfg.u_a ** 2) + 1.0 / x_norm)
        ada_m = ((cfg.u_margin - cfg.l_margin) / (cfg.u_a - cfg.l_a)
                 * (x_norm - cfg.l_a) + cfg.l_margin)[:, 0]
        sin_t = jnp.sqrt(1.0 - tcos ** 2 + 1e-9)
        ctm = tcos * jnp.cos(ada_m) - sin_t * jnp.sin(ada_m)
        if cfg.easy_margin:
            t = jnp.where(tcos > 0, ctm, tcos)
        else:
            mm = jnp.sin(math.pi - ada_m) * ada_m
            th = jnp.cos(math.pi - ada_m)
            t = jnp.where(tcos > th, ctm, tcos - mm)
        return _RowParams(t, tcos, jnp.full((n,), cfg.s), zeros2,
                          MODE_IDENTITY, eps, loss_g, state)

    raise ValueError(f"head '{name}' is not fusable")


def fused_apply(cfg, kernel, feats, labels, state, rng=None,
                block_n: int = 128, block_c: int = 512,
                interpret: bool = False, mesh=None) -> FusedApplyOut:
    """Fused-path equivalent of head.apply + CE + top-k metrics.

    All labels must be valid (>= 0). Returns the mean CE directly — the
    [N, C] logits are never materialized. With `mesh` (model axis > 1) the
    kernel runs per class shard via shard_map with cross-shard logsumexp
    (parallel/sharded_fused.py).
    """
    feats = feats.astype(jnp.float32)
    xn = l2_normalize(feats, axis=1)
    wn = l2_normalize(kernel.astype(jnp.float32), axis=0)
    norms = feature_norms(feats)

    # target cosine: row gather of W columns — O(N*D)
    wn_t = jnp.take(wn, labels, axis=1).T           # [N, D]
    tcos_raw = jnp.sum(xn * wn_t, axis=1)           # [N]

    rp = _row_params(cfg, tcos_raw, norms, state, rng)
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from face_recognition_models_tpu.parallel.sharded_fused import (
            sharded_fused_margin_ce)
        out = sharded_fused_margin_ce(mesh, xn, wn, labels, rp.t, rp.tcos,
                                      rp.scale, rp.ab, rp.mode,
                                      rp.clamp_eps, block_n, block_c,
                                      interpret)
    else:
        out = fused_margin_ce(xn, wn, labels, rp.t, rp.tcos, rp.scale,
                              rp.ab, rp.mode, rp.clamp_eps, block_n,
                              block_c, interpret)
    loss_id = jnp.mean(out.lse - out.target_logit)
    acc1 = 100.0 * jnp.mean((out.higher < 1).astype(jnp.float32))
    acc5 = 100.0 * jnp.mean((out.higher < 5).astype(jnp.float32))
    return FusedApplyOut(loss_id=loss_id, loss_g=rp.loss_g, acc1=acc1,
                         acc5=acc5, norms=norms, state=rp.new_state)
