"""Fused margin-head + cross-entropy Pallas kernel (TPU).

The hot path of every reference head is
    logits = s * margin(normalize(x) @ normalize(W))   # [N, C]
    loss   = CE(logits, labels)
with C = 10k-1M classes. The jnp path materializes [N, C] fp32 twice
(pre/post margin) per step and again in the CE backward. This kernel is the
TPU-native collapse of all of that (the "one fused kernel serving every
margin method" design, SURVEY §2.1/§7): an online-softmax (flash-style)
sweep over class tiles that

  - computes cos tiles on the MXU,
  - applies the margin as a per-row elementwise epilogue,
  - accumulates logsumexp + the top-k rank statistic in VMEM,
  - never writes a logit to HBM,

with a custom VJP whose backward recomputes cos tiles (2 extra matmul
passes, like flash attention) instead of saving them.

Margin generality: every supported head reduces to

    logit[i, j] = scale[i] * h(cos[i, j], a[i], b[i])   for j != label[i]
    logit[i, label[i]] = scale[i] * t[i]

where `t`, `scale`, `a`, `b` are per-row scalars computed cheaply in jnp
from the target cosine (a [N, D] row gather — no [N, C] work), and `h` is
one of three static variants:

    identity:   h = cos                     (cos/arc/elastic/ada/mag/sphere)
    mv:         h = cos > a ? w*cos+(w-1) : cos        (MV-Softmax, b = w)
    curricular: h = cos > a ? cos*(b + cos) : cos      (CurricularFace)

Memory-blended heads (VPL-ArcFace, QAFace) add one element: the non-target
cosine is a per-class blend of the weight cosine with a memory cosine,

    cos'[i, j] = (1 - lam[j]) * (xn @ wn)[i, j] + lam[j] * (xn @ memn)[i, j]

(VPL: lam[j] = lamda * active[j], criterion.py:724-726; QAFace:
lam[j] = active[j], :1471-1476). `fused_margin_ce_mem` fuses that second
matmul into the same class-tile sweep — both [N, C] cosine matrices stay in
VMEM tiles, so these largest-state heads get the same O(N) memory and class
sharding as the rest.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE_IDENTITY = 0
MODE_MV = 1
MODE_CURRICULAR = 2

_NEG_INF = -1e30


class FusedHeadOut(NamedTuple):
    lse: jnp.ndarray          # [N] logsumexp of post-margin logits
    target_logit: jnp.ndarray  # [N] scale*t
    higher: jnp.ndarray       # [N] #classes with pre-margin cos > target cos


def _h(mode: int, cos, a, b):
    if mode == MODE_IDENTITY:
        return cos
    if mode == MODE_MV:
        return jnp.where(cos > a, b * cos + (b - 1.0), cos)
    if mode == MODE_CURRICULAR:
        return jnp.where(cos > a, cos * (b + cos), cos)
    raise ValueError(mode)


def _h_grad(mode: int, cos, a, b):
    if mode == MODE_IDENTITY:
        return jnp.ones_like(cos)
    if mode == MODE_MV:
        # b broadcasts [BN,1] over columns (full_like with an array fill
        # inserts a device_put, which Mosaic can't lower)
        return jnp.where(cos > a, b + jnp.zeros_like(cos), 1.0)
    if mode == MODE_CURRICULAR:
        return jnp.where(cos > a, b + 2.0 * cos, 1.0)
    raise ValueError(mode)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, mode: int, num_classes: int, block_c: int,
                clamp_eps, mm_dtype=jnp.float32, has_mem: bool = False):
    """Grid (C tiles MAJOR, N tiles minor): the W tile stays resident across
    the row sweep; online-softmax state lives in whole-N scratch."""
    if has_mem:
        (xn_ref, wn_ref, memn_ref, lam_ref, label_ref, t_ref, tcos_ref,
         scale_ref, a_ref, b_ref, lse_ref, tlogit_ref, higher_ref,
         m_scr, l_scr, hi_scr) = refs
    else:
        (xn_ref, wn_ref, label_ref, t_ref, tcos_ref, scale_ref, a_ref,
         b_ref, lse_ref, tlogit_ref, higher_ref,
         m_scr, l_scr, hi_scr) = refs
    jc = pl.program_id(0)
    jn = pl.program_id(1)
    num_c = pl.num_programs(0)
    block_n = xn_ref.shape[0]
    rows = pl.ds(jn * block_n, block_n)

    @pl.when(jc == 0)
    def _init():
        m_scr[rows, :] = jnp.full((block_n, 1), _NEG_INF, jnp.float32)
        l_scr[rows, :] = jnp.zeros((block_n, 1), jnp.float32)
        hi_scr[rows, :] = jnp.zeros((block_n, 1), jnp.float32)

    xn = xn_ref[:].astype(mm_dtype)                    # [BN, D]
    wn = wn_ref[:].astype(mm_dtype)                    # [D, BC]
    cos = jnp.dot(xn, wn, preferred_element_type=jnp.float32)
    if has_mem:
        cos_mem = jnp.dot(xn, memn_ref[:].astype(mm_dtype),
                          preferred_element_type=jnp.float32)
        lam = lam_ref[:]                               # [1, BC]
        cos = (1.0 - lam) * cos + lam * cos_mem
    if clamp_eps is not None:
        cos = jnp.clip(cos, -1.0 + clamp_eps, 1.0 - clamp_eps)

    labels = label_ref[:]                              # [BN, 1] int32
    t = t_ref[:]                                       # [BN, 1]
    tcos = tcos_ref[:]
    scale = scale_ref[:]
    a = a_ref[:]
    b = b_ref[:]

    col0 = jc * block_c
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
    in_range = col_ids < num_classes
    is_target = col_ids == labels

    logits = scale * jnp.where(is_target, t, _h(mode, cos, a, b))
    logits = jnp.where(in_range, logits, _NEG_INF)

    # pre-margin rank statistic (top-k accuracy): #{j != label: cos_ij >
    # target_cos}. The target column equals tcos in exact arithmetic and
    # must not count itself — it can differ by an ulp when tcos was
    # computed through a different expression (memory-blended heads).
    hi_scr[rows, :] += jnp.sum(
        jnp.where(in_range & ~is_target & (cos > tcos), 1.0, 0.0),
        axis=1, keepdims=True)

    # online logsumexp
    m_prev = m_scr[rows, :]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    l_scr[rows, :] = (l_scr[rows, :] * jnp.exp(m_prev - m_new)
                      + jnp.sum(jnp.exp(logits - m_new), axis=1,
                                keepdims=True))
    m_scr[rows, :] = m_new

    @pl.when(jc == num_c - 1)
    def _finalize():
        lse_ref[:] = m_scr[rows, :] + jnp.log(l_scr[rows, :])
        tlogit_ref[:] = scale * t
        higher_ref[:] = hi_scr[rows, :]


# ---------------------------------------------------------------------------
# Backward kernels (recompute cos; flash-style)
# ---------------------------------------------------------------------------


def _bwd_dx_kernel(*refs, mode: int, num_classes: int, block_c: int,
                   clamp_eps, mm_dtype=jnp.float32, has_mem: bool = False):
    if has_mem:
        (xn_ref, wn_ref, memn_ref, lam_ref, label_ref, t_ref, scale_ref,
         a_ref, b_ref, lse_ref, g_lse_ref, g_t_ref,
         dx_ref, dt_ref, dscale_ref, dx_scr, dt_scr, dsc_scr) = refs
    else:
        (xn_ref, wn_ref, label_ref, t_ref, scale_ref, a_ref, b_ref,
         lse_ref, g_lse_ref, g_t_ref,
         dx_ref, dt_ref, dscale_ref, dx_scr, dt_scr, dsc_scr) = refs
    jc = pl.program_id(1)
    num_c = pl.num_programs(1)

    @pl.when(jc == 0)
    def _init():
        dx_scr[:] = jnp.zeros_like(dx_scr)
        dt_scr[:] = jnp.zeros_like(dt_scr)
        dsc_scr[:] = jnp.zeros_like(dsc_scr)

    xn = xn_ref[:].astype(mm_dtype)
    wn = wn_ref[:].astype(mm_dtype)                     # [D, BC]
    cos_raw = jnp.dot(xn, wn, preferred_element_type=jnp.float32)
    if has_mem:
        memn = memn_ref[:].astype(mm_dtype)
        lam = lam_ref[:]
        cos_raw = ((1.0 - lam) * cos_raw
                   + lam * jnp.dot(xn, memn,
                                   preferred_element_type=jnp.float32))
    if clamp_eps is not None:
        cos = jnp.clip(cos_raw, -1.0 + clamp_eps, 1.0 - clamp_eps)
        clamp_pass = ((cos_raw >= -1.0 + clamp_eps)
                      & (cos_raw <= 1.0 - clamp_eps)).astype(jnp.float32)
    else:
        cos = cos_raw
        clamp_pass = 1.0

    labels = label_ref[:]
    t = t_ref[:]
    scale = scale_ref[:]
    a = a_ref[:]
    b = b_ref[:]
    lse = lse_ref[:]
    g_lse = g_lse_ref[:]
    g_t = g_t_ref[:]

    col0 = jc * block_c
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
    in_range = col_ids < num_classes
    is_target = col_ids == labels

    h = _h(mode, cos, a, b)
    logits = scale * jnp.where(is_target, t, h)
    p = jnp.where(in_range, jnp.exp(logits - lse), 0.0)
    dlogits = g_lse * p                               # [BN, BC]

    # non-target: flows into cos (and scale); target: flows into t and scale
    dcos = jnp.where(is_target, 0.0,
                     dlogits * scale * _h_grad(mode, cos, a, b)) * clamp_pass
    dt_scr[:] += jnp.sum(jnp.where(is_target, dlogits * scale, 0.0),
                         axis=1, keepdims=True)
    dsc_scr[:] += jnp.sum(
        jnp.where(is_target, dlogits * t, dlogits * h), axis=1,
        keepdims=True)
    if has_mem:
        dx_scr[:] += jnp.dot((dcos * (1.0 - lam)).astype(mm_dtype), wn.T,
                             preferred_element_type=jnp.float32)
        dx_scr[:] += jnp.dot((dcos * lam).astype(mm_dtype), memn.T,
                             preferred_element_type=jnp.float32)
    else:
        dx_scr[:] += jnp.dot(dcos.astype(mm_dtype), wn.T,
                             preferred_element_type=jnp.float32)

    @pl.when(jc == num_c - 1)
    def _finalize():
        dx_ref[:] = dx_scr[:]
        # the direct d(target_logit) path: target_logit = scale * t
        dt_ref[:] = dt_scr[:] + g_t * scale
        dscale_ref[:] = dsc_scr[:] + g_t * t


def _bwd_dw_kernel(*refs, mode: int, num_classes: int, block_c: int,
                   clamp_eps, mm_dtype=jnp.float32,
                   has_mem: bool = False):
    if has_mem:
        (xn_ref, wn_ref, memn_ref, lam_ref, label_ref, t_ref, scale_ref,
         a_ref, b_ref, lse_ref, g_lse_ref, dw_ref, dw_scr) = refs
    else:
        (xn_ref, wn_ref, label_ref, t_ref, scale_ref, a_ref, b_ref,
         lse_ref, g_lse_ref, dw_ref, dw_scr) = refs
    jn = pl.program_id(1)
    num_n = pl.num_programs(1)

    @pl.when(jn == 0)
    def _init():
        dw_scr[:] = jnp.zeros_like(dw_scr)

    xn = xn_ref[:].astype(mm_dtype)                     # [BN, D]
    wn = wn_ref[:].astype(mm_dtype)                     # [D, BC]
    cos_raw = jnp.dot(xn, wn, preferred_element_type=jnp.float32)
    if has_mem:
        lam = lam_ref[:]
        cos_raw = ((1.0 - lam) * cos_raw
                   + lam * jnp.dot(xn, memn_ref[:].astype(mm_dtype),
                                   preferred_element_type=jnp.float32))
    if clamp_eps is not None:
        cos = jnp.clip(cos_raw, -1.0 + clamp_eps, 1.0 - clamp_eps)
        clamp_pass = ((cos_raw >= -1.0 + clamp_eps)
                      & (cos_raw <= 1.0 - clamp_eps)).astype(jnp.float32)
    else:
        cos = cos_raw
        clamp_pass = 1.0

    labels = label_ref[:]
    t = t_ref[:]
    scale = scale_ref[:]
    a = a_ref[:]
    b = b_ref[:]
    lse = lse_ref[:]
    g_lse = g_lse_ref[:]

    jc = pl.program_id(0)
    col0 = jc * block_c
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
    in_range = col_ids < num_classes
    is_target = col_ids == labels

    h = _h(mode, cos, a, b)
    logits = scale * jnp.where(is_target, t, h)
    p = jnp.where(in_range, jnp.exp(logits - lse), 0.0)
    dlogits = g_lse * p
    dcos = jnp.where(is_target, 0.0,
                     dlogits * scale * _h_grad(mode, cos, a, b)) * clamp_pass
    if has_mem:
        dcos = dcos * (1.0 - lam)  # only the weight-cosine share reaches W
    dw_scr[:] += jnp.dot(xn.T, dcos.astype(mm_dtype),
                         preferred_element_type=jnp.float32)

    @pl.when(jn == num_n - 1)
    def _finalize():
        dw_ref[:] = dw_scr[:]


def _bwd_fused_kernel(*refs, mode: int, num_classes: int, block_c: int,
                      clamp_eps, mm_dtype=jnp.float32, has_mem: bool = False):
    """Single-sweep backward: grid (C tiles MAJOR, N tiles minor).

    The W tile stays resident across the inner N sweep, cos/dcos are
    recomputed ONCE (the two-kernel variant recomputes them twice), dw
    accumulates per C tile, and dx/dt/dscale accumulate in whole-N scratch
    (written out on the last C tile). Halves the backward matmul + epilogue
    work at the cost of O(N*D) VMEM scratch.
    """
    if has_mem:
        (xn_ref, wn_ref, memn_ref, lam_ref, label_ref, t_ref, scale_ref,
         a_ref, b_ref, lse_ref, g_lse_ref, g_t_ref,
         dx_ref, dt_ref, dscale_ref, dw_ref,
         dx_scr, dt_scr, dsc_scr, dw_scr) = refs
    else:
        (xn_ref, wn_ref, label_ref, t_ref, scale_ref, a_ref, b_ref,
         lse_ref, g_lse_ref, g_t_ref,
         dx_ref, dt_ref, dscale_ref, dw_ref,
         dx_scr, dt_scr, dsc_scr, dw_scr) = refs
    jc = pl.program_id(0)
    jn = pl.program_id(1)
    num_c = pl.num_programs(0)
    num_n = pl.num_programs(1)
    block_n = xn_ref.shape[0]
    rows = pl.ds(jn * block_n, block_n)

    @pl.when(jc == 0)
    def _init_rows():
        dx_scr[rows, :] = jnp.zeros_like(dx_scr[rows, :])
        dt_scr[rows, :] = jnp.zeros_like(dt_scr[rows, :])
        dsc_scr[rows, :] = jnp.zeros_like(dsc_scr[rows, :])

    @pl.when(jn == 0)
    def _init_w():
        dw_scr[:] = jnp.zeros_like(dw_scr)

    xn = xn_ref[:].astype(mm_dtype)
    wn = wn_ref[:].astype(mm_dtype)
    cos_raw = jnp.dot(xn, wn, preferred_element_type=jnp.float32)
    if has_mem:
        memn = memn_ref[:].astype(mm_dtype)
        lam = lam_ref[:]
        cos_raw = ((1.0 - lam) * cos_raw
                   + lam * jnp.dot(xn, memn,
                                   preferred_element_type=jnp.float32))
    if clamp_eps is not None:
        cos = jnp.clip(cos_raw, -1.0 + clamp_eps, 1.0 - clamp_eps)
        clamp_pass = ((cos_raw >= -1.0 + clamp_eps)
                      & (cos_raw <= 1.0 - clamp_eps)).astype(jnp.float32)
    else:
        cos = cos_raw
        clamp_pass = 1.0

    labels = label_ref[:]
    t = t_ref[:]
    scale = scale_ref[:]
    a = a_ref[:]
    b = b_ref[:]
    lse = lse_ref[:]
    g_lse = g_lse_ref[:]
    g_t = g_t_ref[:]

    col0 = jc * block_c
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
    in_range = col_ids < num_classes
    is_target = col_ids == labels

    h = _h(mode, cos, a, b)
    logits = scale * jnp.where(is_target, t, h)
    p = jnp.where(in_range, jnp.exp(logits - lse), 0.0)
    dlogits = g_lse * p
    dcos = jnp.where(is_target, 0.0,
                     dlogits * scale * _h_grad(mode, cos, a, b)) * clamp_pass

    dt_scr[rows, :] += jnp.sum(jnp.where(is_target, dlogits * scale, 0.0),
                               axis=1, keepdims=True)
    dsc_scr[rows, :] += jnp.sum(
        jnp.where(is_target, dlogits * t, dlogits * h), axis=1,
        keepdims=True)
    if has_mem:
        dcos_w = (dcos * (1.0 - lam)).astype(mm_dtype)
        dx_scr[rows, :] += jnp.dot(dcos_w, wn.T,
                                   preferred_element_type=jnp.float32)
        dx_scr[rows, :] += jnp.dot((dcos * lam).astype(mm_dtype), memn.T,
                                   preferred_element_type=jnp.float32)
        dw_scr[:] += jnp.dot(xn.T, dcos_w,
                             preferred_element_type=jnp.float32)
    else:
        dcos_mm = dcos.astype(mm_dtype)
        dx_scr[rows, :] += jnp.dot(dcos_mm, wn.T,
                                   preferred_element_type=jnp.float32)
        dw_scr[:] += jnp.dot(xn.T, dcos_mm,
                             preferred_element_type=jnp.float32)

    @pl.when(jn == num_n - 1)
    def _finalize_w():
        dw_ref[:] = dw_scr[:]

    @pl.when(jc == num_c - 1)
    def _finalize_rows():
        dx_ref[:] = dx_scr[rows, :]
        dt_ref[:] = dt_scr[rows, :] + g_t * scale
        dscale_ref[:] = dsc_scr[rows, :] + g_t * t


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _row(x):
    return x.reshape(-1, 1).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_margin_ce(xn, wn, labels, t, tcos, scale, ab,
                    mode: int, clamp_eps=None, block_n: int = 128,
                    block_c: int = 512, interpret: bool = False,
                    mm_dtype=jnp.float32):
    """Fused margin + cross-entropy statistics over class tiles.

    Returns (lse [N], target_logit [N], higher [N]).

    xn [N, D] row-normalized embeddings; wn [D, C] column-normalized class
    weights; labels [N] int32 (all valid); t [N] per-row target logit value
    (pre-scale); tcos [N] pre-margin target cosine; scale [N]; ab [N, 2]
    margin-mode params.

    mm_dtype=jnp.bfloat16 runs the three matmul passes on the MXU in bf16
    (fp32 accumulate) — ~2x the matmul rate at ~1e-2 logit error; keep fp32
    (default) for reference parity.
    """
    out, _ = _fused_fwd(xn, wn, labels, t, tcos, scale, ab, mode, clamp_eps,
                        block_n, block_c, interpret, mm_dtype)
    return out


def _fused_fwd(xn, wn, labels, t, tcos, scale, ab, mode, clamp_eps, block_n,
               block_c, interpret, mm_dtype=jnp.float32, memn=None, lam=None):
    has_mem = memn is not None
    n, d = xn.shape
    c = wn.shape[1]
    n_pad = -(-n // block_n) * block_n
    c_pad = -(-c // block_c) * block_c

    xn_p = _pad_to(xn.astype(jnp.float32), n_pad, 0)
    wn_p = _pad_to(wn.astype(jnp.float32), c_pad, 1)
    # padded rows: point their label out of range so no column is "target"
    labels_p = _pad_to(labels.astype(jnp.int32).reshape(-1, 1), n_pad, 0,
                       value=c + 1)
    t_p = _pad_to(_row(t), n_pad, 0)
    tcos_p = _pad_to(_row(tcos), n_pad, 0, value=2.0)  # no cos exceeds 2
    scale_p = _pad_to(_row(scale), n_pad, 0, value=1.0)
    a_p = _pad_to(_row(ab[:, 0]), n_pad, 0, value=2.0)
    b_p = _pad_to(_row(ab[:, 1]), n_pad, 0, value=1.0)

    grid = (c_pad // block_c, n_pad // block_n)  # C major, N minor
    row_spec = pl.BlockSpec((block_n, 1), lambda jc, jn: (jn, 0),
                            memory_space=pltpu.VMEM)
    wn_spec = pl.BlockSpec((d, block_c), lambda jc, jn: (0, jc),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, mode=mode, num_classes=c,
                               block_c=block_c, clamp_eps=clamp_eps,
                               mm_dtype=mm_dtype, has_mem=has_mem)
    in_specs = [
        pl.BlockSpec((block_n, d), lambda jc, jn: (jn, 0),
                     memory_space=pltpu.VMEM),
        wn_spec,
    ]
    operands = [xn_p, wn_p]
    if has_mem:
        in_specs += [wn_spec,
                     pl.BlockSpec((1, block_c), lambda jc, jn: (0, jc),
                                  memory_space=pltpu.VMEM)]
        operands += [_pad_to(memn.astype(jnp.float32), c_pad, 1),
                     _pad_to(lam.astype(jnp.float32).reshape(1, -1),
                             c_pad, 1)]
    in_specs += [row_spec] * 6
    operands += [labels_p, t_p, tcos_p, scale_p, a_p, b_p]

    lse, tlogit, higher = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((n_pad, 1), jnp.float32)] * 3,
        interpret=interpret,
    )(*operands)

    out = FusedHeadOut(lse=lse[:n, 0], target_logit=tlogit[:n, 0],
                       higher=higher[:n, 0])
    residuals = (xn, wn, memn, lam, labels, t, tcos, scale, ab, out.lse)
    return out, residuals


_DX_SCRATCH_BUDGET = 6 * 1024 * 1024  # bytes of VMEM for the dx accumulator


def _fused_bwd_impl(mode, clamp_eps, block_n, block_c, interpret, mm_dtype,
                    residuals, grads):
    """Shared backward: returns (dx, dw, dt, dscale). memn/lam in the
    residuals are blend constants (memory update is stop-gradient in the
    heads); their grads are never needed."""
    xn, wn, memn, lam, labels, t, tcos, scale, ab, lse = residuals
    g_lse, g_t, _g_higher = grads  # higher is a statistic: no gradient
    has_mem = memn is not None
    n, d = xn.shape
    c = wn.shape[1]
    n_pad = -(-n // block_n) * block_n
    c_pad = -(-c // block_c) * block_c

    if n_pad * d * 4 <= _DX_SCRATCH_BUDGET:
        return _fused_bwd_single_sweep(
            mode, clamp_eps, block_n, block_c, interpret, mm_dtype,
            residuals, grads)

    xn_p = _pad_to(xn.astype(jnp.float32), n_pad, 0)
    wn_p = _pad_to(wn.astype(jnp.float32), c_pad, 1)
    labels_p = _pad_to(labels.astype(jnp.int32).reshape(-1, 1), n_pad, 0,
                       value=c + 1)
    t_p = _pad_to(_row(t), n_pad, 0)
    scale_p = _pad_to(_row(scale), n_pad, 0, value=1.0)
    a_p = _pad_to(_row(ab[:, 0]), n_pad, 0, value=2.0)
    b_p = _pad_to(_row(ab[:, 1]), n_pad, 0, value=1.0)
    lse_p = _pad_to(_row(lse), n_pad, 0, value=1.0)
    g_lse_p = _pad_to(_row(g_lse), n_pad, 0)
    g_t_p = _pad_to(_row(g_t), n_pad, 0)
    mem_ops = []
    if has_mem:
        mem_ops = [_pad_to(memn.astype(jnp.float32), c_pad, 1),
                   _pad_to(lam.astype(jnp.float32).reshape(1, -1), c_pad, 1)]

    row_spec_i = pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    wn_spec_i = pl.BlockSpec((d, block_c), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
    mem_specs_i = ([wn_spec_i,
                    pl.BlockSpec((1, block_c), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM)]
                   if has_mem else [])

    dx, dt, dscale = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, mode=mode, num_classes=c,
                          block_c=block_c, clamp_eps=clamp_eps,
                          mm_dtype=mm_dtype, has_mem=has_mem),
        grid=(n_pad // block_n, c_pad // block_c),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            wn_spec_i,
        ] + mem_specs_i + [
            row_spec_i, row_spec_i, row_spec_i, row_spec_i, row_spec_i,
            row_spec_i, row_spec_i, row_spec_i,
        ],
        out_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec_i, row_spec_i,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, d), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xn_p, wn_p, *mem_ops, labels_p, t_p, scale_p, a_p, b_p, lse_p,
      g_lse_p, g_t_p)

    row_spec_j = pl.BlockSpec((block_n, 1), lambda j, i: (i, 0),
                              memory_space=pltpu.VMEM)
    wn_spec_j = pl.BlockSpec((d, block_c), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM)
    mem_specs_j = ([wn_spec_j,
                    pl.BlockSpec((1, block_c), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM)]
                   if has_mem else [])
    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, mode=mode, num_classes=c,
                          block_c=block_c,
                          clamp_eps=clamp_eps, mm_dtype=mm_dtype,
                          has_mem=has_mem),
        grid=(c_pad // block_c, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            wn_spec_j,
        ] + mem_specs_j + [
            row_spec_j, row_spec_j, row_spec_j, row_spec_j, row_spec_j,
            row_spec_j, row_spec_j,
        ],
        out_specs=pl.BlockSpec((d, block_c), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, block_c), jnp.float32)],
        interpret=interpret,
    )(xn_p, wn_p, *mem_ops, labels_p, t_p, scale_p, a_p, b_p, lse_p,
      g_lse_p)

    return dx[:n], dw[:, :c], dt[:n, 0], dscale[:n, 0]


def _fused_bwd_single_sweep(mode, clamp_eps, block_n, block_c, interpret,
                            mm_dtype, residuals, grads):
    """C-major single-recompute backward (see _bwd_fused_kernel).
    Returns (dx, dw, dt, dscale)."""
    xn, wn, memn, lam, labels, t, tcos, scale, ab, lse = residuals
    g_lse, g_t, _g_higher = grads
    has_mem = memn is not None
    n, d = xn.shape
    c = wn.shape[1]
    n_pad = -(-n // block_n) * block_n
    c_pad = -(-c // block_c) * block_c

    xn_p = _pad_to(xn.astype(jnp.float32), n_pad, 0)
    wn_p = _pad_to(wn.astype(jnp.float32), c_pad, 1)
    labels_p = _pad_to(labels.astype(jnp.int32).reshape(-1, 1), n_pad, 0,
                       value=c + 1)
    t_p = _pad_to(_row(t), n_pad, 0)
    scale_p = _pad_to(_row(scale), n_pad, 0, value=1.0)
    a_p = _pad_to(_row(ab[:, 0]), n_pad, 0, value=2.0)
    b_p = _pad_to(_row(ab[:, 1]), n_pad, 0, value=1.0)
    lse_p = _pad_to(_row(lse), n_pad, 0, value=1.0)
    g_lse_p = _pad_to(_row(g_lse), n_pad, 0)
    g_t_p = _pad_to(_row(g_t), n_pad, 0)
    mem_ops = []
    if has_mem:
        mem_ops = [_pad_to(memn.astype(jnp.float32), c_pad, 1),
                   _pad_to(lam.astype(jnp.float32).reshape(1, -1), c_pad, 1)]

    row = pl.BlockSpec((block_n, 1), lambda jc, jn: (jn, 0),
                       memory_space=pltpu.VMEM)
    wn_spec = pl.BlockSpec((d, block_c), lambda jc, jn: (0, jc),
                           memory_space=pltpu.VMEM)
    mem_specs = ([wn_spec,
                  pl.BlockSpec((1, block_c), lambda jc, jn: (0, jc),
                               memory_space=pltpu.VMEM)]
                 if has_mem else [])
    dx, dt, dscale, dw = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, mode=mode, num_classes=c,
                          block_c=block_c, clamp_eps=clamp_eps,
                          mm_dtype=mm_dtype, has_mem=has_mem),
        grid=(c_pad // block_c, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda jc, jn: (jn, 0),
                         memory_space=pltpu.VMEM),
            wn_spec,
        ] + mem_specs + [
            row, row, row, row, row, row, row, row,
        ],
        out_specs=[
            pl.BlockSpec((block_n, d), lambda jc, jn: (jn, 0),
                         memory_space=pltpu.VMEM),
            row, row,
            pl.BlockSpec((d, block_c), lambda jc, jn: (0, jc),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, c_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, d), jnp.float32),
            pltpu.VMEM((n_pad, 1), jnp.float32),
            pltpu.VMEM((n_pad, 1), jnp.float32),
            pltpu.VMEM((d, block_c), jnp.float32),
        ],
        interpret=interpret,
    )(xn_p, wn_p, *mem_ops, labels_p, t_p, scale_p, a_p, b_p, lse_p,
      g_lse_p, g_t_p)

    return dx[:n], dw[:, :c], dt[:n, 0], dscale[:n, 0]


def _fused_bwd(mode, clamp_eps, block_n, block_c, interpret, mm_dtype,
               residuals, grads):
    dx, dw, dt, dscale = _fused_bwd_impl(mode, clamp_eps, block_n, block_c,
                                         interpret, mm_dtype, residuals,
                                         grads)
    return (dx, dw, None, dt, None, dscale, None)


fused_margin_ce.defvjp(
    lambda xn, wn, labels, t, tcos, scale, ab, mode, clamp_eps, block_n,
    block_c, interpret, mm_dtype=jnp.float32: _fused_fwd(
        xn, wn, labels, t, tcos, scale, ab, mode, clamp_eps, block_n,
        block_c, interpret, mm_dtype),
    _fused_bwd)


# ---------------------------------------------------------------------------
# Memory-blended variant (VPL-ArcFace / QAFace)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def fused_margin_ce_mem(xn, wn, memn, lam, labels, t, tcos, scale, ab,
                        mode: int, clamp_eps=None, block_n: int = 128,
                        block_c: int = 512, interpret: bool = False,
                        mm_dtype=jnp.float32):
    """Fused margin+CE with a per-class memory blend on non-target columns:

        cos'[i, j] = (1 - lam[j]) * (xn @ wn)[i, j] + lam[j] * (xn @ memn)[i, j]

    memn [D, C] column-normalized memory prototypes; lam [C] blend weights
    (0 disables the blend for that class). Both are treated as constants by
    the VJP (the heads update memories under stop_gradient —
    reference criterion.py:702-726, 1455-1485); dx flows through BOTH
    matmuls, dw only through the (1 - lam) share.
    Returns (lse [N], target_logit [N], higher [N]) like fused_margin_ce.
    """
    out, _ = _fused_fwd(xn, wn, labels, t, tcos, scale, ab, mode, clamp_eps,
                        block_n, block_c, interpret, mm_dtype,
                        memn=memn, lam=lam)
    return out


def _fused_fwd_mem(xn, wn, memn, lam, labels, t, tcos, scale, ab, mode,
                   clamp_eps, block_n, block_c, interpret,
                   mm_dtype=jnp.float32):
    return _fused_fwd(xn, wn, labels, t, tcos, scale, ab, mode, clamp_eps,
                      block_n, block_c, interpret, mm_dtype,
                      memn=memn, lam=lam)


def _fused_bwd_mem(mode, clamp_eps, block_n, block_c, interpret, mm_dtype,
                   residuals, grads):
    dx, dw, dt, dscale = _fused_bwd_impl(mode, clamp_eps, block_n, block_c,
                                         interpret, mm_dtype, residuals,
                                         grads)
    return (dx, dw, None, None, None, dt, None, dscale, None)


fused_margin_ce_mem.defvjp(_fused_fwd_mem, _fused_bwd_mem)
