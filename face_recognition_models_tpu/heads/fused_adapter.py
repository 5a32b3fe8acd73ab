"""Adapter: margin heads -> the fused Pallas margin+CE kernel.

For each supported head this computes the per-row scalars (target logit
value t, pre-margin target cosine, scale, mode params a/b) in O(N*D) jnp —
no [N, C] intermediate — plus the head's state update, then calls
`fused_margin_ce`. Heads whose cosine matrix is itself blended with a
memory (VPL, QAFace) fuse the second (memory) matmul into the same class
sweep via `fused_margin_ce_mem` (see MEM_FUSED_HEADS below; PERF.md
measures 1.39-1.51x vs XLA for them).

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
    fused_margin_ce_mem,
)
from face_recognition_models_tpu.ops.normalize import (
    feature_norms,
    l2_normalize,
)

# Heads whose non-target cosine blends a per-class memory matmul; they use
# fused_margin_ce_mem (second matmul fused into the class-tile sweep).
MEM_FUSED_HEADS = ("vpl_arcface", "qaface")
FUSED_HEADS = ("cosface", "arcface", "sphereface", "mv_softmax",
               "curricularface", "adaface", "elastic_cosface",
               "elastic_arcface", "magface",
               "combined_margin") + MEM_FUSED_HEADS


def fused_supported(name: str) -> bool:
    return name in FUSED_HEADS


# Heads where the fused kernel beat XLA at CASIA scale (N=512, C=10,575) in
# hardware measurements (PERF.md): arc 1.66x, sphere 1.33x, ada 1.24x,
# curricular 1.16x, cos 1.11x, mag 1.06x, vpl 1.40x, qaface 1.47x.
# mv_softmax (0.92x) and the elastic heads (~0.9-1.0x) only win at larger C.
# combined_margin measured round 3 (scripts/bench_fused_table.py, v5e):
# fused 3.20 ms vs jnp 3.59 ms at C=10,575 (1.12x); parity at C=131k
# (12.7 vs 12.6 ms) where the >= _BIG_C rule keeps fused for its O(N)
# activation memory.
_FUSED_FASTER_SMALL_C = frozenset((
    "arcface", "cosface", "curricularface", "adaface", "magface",
    "sphereface", "vpl_arcface", "qaface", "combined_margin"))
# Above this class count the fused path wins for every head — and XLA's
# multiple [N, C] fp32 buffers start to dominate memory (256 MB each at
# C=131k), so the O(N) kernel is strictly better.
_BIG_C = 32768


def fused_wins(name: str, num_classes: int, platform: str = None) -> bool:
    """Per-(head, C) dispatch heuristic from the v5e measurements: should
    the fused Pallas kernel replace the XLA jnp head? Only ever True on TPU
    (the kernel would run interpreted anywhere else)."""
    if platform is None:
        import jax
        platform = jax.devices()[0].platform
    if platform != "tpu" or not fused_supported(name):
        return False
    return num_classes >= _BIG_C or name in _FUSED_FASTER_SMALL_C


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
        # forward-exact NaN guard at |tcos| = 1 — same fix as the jnp path
        # (margins.py _curricularface_apply; reference :555 has no eps and
        # NaNs when a target cosine saturates)
        u = jnp.maximum(1.0 - tcos ** 2, 0.0)
        sin_t = jnp.where(u > 0, jnp.sqrt(jnp.where(u > 0, u, 1.0)), 0.0)
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

    if name == "combined_margin":
        eps = cfg.eps
        tcos = jnp.clip(tcos_raw, -1 + eps, 1 - eps)
        theta = jnp.arccos(tcos)
        t = jnp.cos(jnp.clip(cfg.m1 * theta + cfg.m2, 0.0, math.pi)) - cfg.m3
        # pre-margin logits stay unclamped (margins.py combined path)
        return _RowParams(t, tcos_raw, jnp.full((n,), cfg.s), zeros2,
                          MODE_IDENTITY, None, zero, state)

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


def _arc_t(tcos, m_val: float, easy_margin: bool):
    """ArcFace target-logit scalar (criterion.py:281-295) on a clipped
    target cosine [N]."""
    sine = jnp.sqrt(jnp.clip(1.0 - tcos ** 2, 1e-9, 1.0))
    phi = tcos * math.cos(m_val) - sine * math.sin(m_val)
    if easy_margin:
        return jnp.where(tcos > 0, phi, tcos)
    th = math.cos(math.pi - m_val)
    mm = math.sin(math.pi - m_val) * m_val
    return jnp.where(tcos > th, phi, tcos - mm)


class _MemRowParams(NamedTuple):
    rp: _RowParams
    memn: jnp.ndarray   # [D, C] column-normalized memory prototypes
    lam: jnp.ndarray    # [C] per-class blend weight (0 => no blend)


def _mem_row_params(cfg, kernel, xn, wn, feats, labels, tcos_raw, norms,
                    state, minput) -> _MemRowParams:
    """VPL-ArcFace / QAFace reduction: identical math to margins.py
    (_vpl_arcface_apply / _qaface_apply) with the [N, C] blend deferred to
    the kernel as (memn, lam)."""
    name = cfg.name
    n = tcos_raw.shape[0]
    valid = labels >= 0
    zeros2 = jnp.zeros((n, 2), jnp.float32)
    zero = jnp.float32(0.0)
    feats = feats.astype(jnp.float32)

    if name == "vpl_arcface":
        new_mem, new_life, any_valid = m._class_mean_update(
            jax.lax.stop_gradient(feats), labels, valid, state.mem,
            state.life, cfg.delta)
        use_mem = jnp.logical_and(state.training_flag, any_valid)
        new_mem = jnp.where(use_mem, new_mem, state.mem)
        new_life = jnp.where(use_mem, new_life, state.life)
        active = (new_life > 0).astype(jnp.float32)          # [C]
        # lam==0 reproduces the `where(use_mem, blended, cos_w)` select
        lam = jnp.where(use_mem, cfg.lamda * active, 0.0)
        memn = l2_normalize(new_mem, axis=1).T               # [D, C]
        # target column: blend toward 1.0 (criterion.py:724-726)
        lam_t = jnp.take(lam, jnp.where(valid, labels, 0))
        cosine2 = (1.0 - lam_t) * tcos_raw + lam_t * 1.0
        tcos = jnp.clip(cosine2, -1.0 + cfg.eps, 1.0 - cfg.eps)
        t = _arc_t(tcos, cfg.m, cfg.easy_margin)
        new_state = m.VPLArcFaceState(mem=new_mem, life=new_life,
                                      training_flag=state.training_flag)
        rp = _RowParams(t, tcos, jnp.full((n,), cfg.s), zeros2,
                        MODE_IDENTITY, cfg.eps, zero, new_state)
        return _MemRowParams(rp, memn, lam)

    if name == "qaface":
        if minput is None:
            minput = feats
        minput = minput.astype(jnp.float32)
        mag = feature_norms(minput)                          # [N, 1]
        mag_mean = jnp.mean(mag)
        # torch .std() semantics (ddof=1) with margins.py's finite
        # subgradient at zero variance (sqrt'(0)=inf would NaN the
        # backward when every magnitude in the batch is equal — which
        # free-running training DOES reach; the plain jnp.std here NaN'd
        # the fused path at step 11 of the interpret trajectory, round 5)
        var = jnp.var(mag, ddof=1)
        mag_std = jnp.where(var > 0,
                            jnp.sqrt(jnp.where(var > 0, var, 1.0)), 0.0)
        first = state.muy == 0.0
        new_muy = jnp.where(first, mag_mean,
                            cfg.alpha * state.muy
                            + (1 - cfg.alpha) * mag_mean)
        new_std = jnp.where(first, mag_std,
                            cfg.alpha * state.std + (1 - cfg.alpha) * mag_std)
        z = (mag - new_muy) / (new_std + 1e-6)
        f = jnp.where(jnp.abs(z) < cfg.tto, jnp.exp(-z), 0.0)
        injection = f * minput / (mag + 1e-6)                # [N, D]

        new_mem, new_life, any_valid = m._class_mean_update(
            jax.lax.stop_gradient(injection), labels, valid, state.mem,
            state.life, cfg.delta)
        use_mem = jnp.logical_and(state.training_flag, any_valid)
        new_mem = jnp.where(use_mem, new_mem, state.mem)
        new_life = jnp.where(use_mem, new_life, state.life)
        new_muy = jnp.where(state.training_flag, new_muy, state.muy)
        new_std = jnp.where(state.training_flag, new_std, state.std)

        active = (new_life > 0).astype(jnp.float32)
        lam = jnp.where(use_mem, active, 0.0)  # full replacement (:1476)
        memn = l2_normalize(new_mem, axis=1).T
        # target: cosine against (weight column + injection) (:1479-1482)
        target_w = jnp.take(kernel.astype(jnp.float32),
                            jnp.where(valid, labels, 0), axis=1).T + injection
        cosine2 = jnp.sum(xn * l2_normalize(target_w, axis=1), axis=1)
        tcos_t = jnp.where(use_mem, cosine2, tcos_raw)
        tcos = jnp.clip(tcos_t, -1.0 + cfg.eps, 1.0 - cfg.eps)
        t = _arc_t(tcos, cfg.m, cfg.easy_margin)
        new_state = m.QAFaceState(mem=new_mem, life=new_life, muy=new_muy,
                                  std=new_std,
                                  training_flag=state.training_flag)
        rp = _RowParams(t, tcos, jnp.full((n,), cfg.s), zeros2,
                        MODE_IDENTITY, cfg.eps, zero, new_state)
        return _MemRowParams(rp, memn, lam)

    raise ValueError(f"head '{name}' is not a memory-blended head")


def fused_apply(cfg, kernel, feats, labels, state, rng=None, minput=None,
                block_n: int = 128, block_c: int = 512,
                interpret: bool = False, mesh=None) -> FusedApplyOut:
    """Fused-path equivalent of head.apply + CE + top-k metrics.

    All labels must be valid (>= 0). Returns the mean CE directly — the
    [N, C] logits are never materialized. With `mesh` (model axis > 1) the
    kernel runs per class shard via shard_map with cross-shard logsumexp
    (parallel/sharded_fused.py). Memory-blended heads (VPL/QAFace) fuse
    their second matmul into the same sweep; QAFace takes the degraded view
    through `minput`.
    """
    feats = feats.astype(jnp.float32)
    xn = l2_normalize(feats, axis=1)
    wn = l2_normalize(kernel.astype(jnp.float32), axis=0)
    norms = feature_norms(feats)

    # target cosine: row gather of W columns — O(N*D)
    wn_t = jnp.take(wn, labels, axis=1).T           # [N, D]
    tcos_raw = jnp.sum(xn * wn_t, axis=1)           # [N]

    memn = lam = None
    if cfg.name in MEM_FUSED_HEADS:
        mrp = _mem_row_params(cfg, kernel, xn, wn, feats, labels, tcos_raw,
                              norms, state, minput)
        rp, memn, lam = mrp.rp, mrp.memn, mrp.lam
    else:
        rp = _row_params(cfg, tcos_raw, norms, state, rng)

    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from face_recognition_models_tpu.parallel.sharded_fused import (
            sharded_fused_margin_ce)
        out = sharded_fused_margin_ce(mesh, xn, wn, labels, rp.t, rp.tcos,
                                      rp.scale, rp.ab, rp.mode,
                                      rp.clamp_eps, block_n, block_c,
                                      interpret, memn=memn, lam=lam)
    elif memn is not None:
        out = fused_margin_ce_mem(xn, wn, memn, lam, labels, rp.t, rp.tcos,
                                  rp.scale, rp.ab, rp.mode, rp.clamp_eps,
                                  block_n, block_c, interpret)
    else:
        out = fused_margin_ce(xn, wn, labels, rp.t, rp.tcos, rp.scale,
                              rp.ab, rp.mode, rp.clamp_eps, block_n,
                              block_c, interpret)
    loss_id = jnp.mean(out.lse - out.target_logit)
    acc1 = 100.0 * jnp.mean((out.higher < 1).astype(jnp.float32))
    acc5 = 100.0 * jnp.mean((out.higher < 5).astype(jnp.float32))
    if cfg.name == "magface":
        # the reference (and margins.py) return the CLAMPED norm as
        # `norms` for magface (criterion.py:1290) — the feat_norm metric
        # must match the jnp path exactly
        norms = jnp.clip(norms, cfg.l_a, cfg.u_a)
    return FusedApplyOut(loss_id=loss_id, loss_g=rp.loss_g, acc1=acc1,
                         acc5=acc5, norms=norms, state=rp.new_state)
