"""Class-sharded fused margin+CE (SURVEY §7 'hard parts': stable
log-sum-exp across shards with the margin applied only on the
target-owning shard).

The fused Pallas kernel (ops/fused_head.py) runs per model-axis shard on
its local `[D, C/mp]` slice of the classifier; the shards' partial
statistics combine with XLA collectives over ICI:

- logsumexp: max-shifted psum of exp(lse_local);
- target logit: only the shard owning the label column contributes
  (non-owners see an out-of-range local label, so their kernel has no
  target column at all);
- top-k rank counts: plain psum.

Gradients flow correctly without extra code: the owner mask in the target
combine routes g_t to the owning shard only, and the logsumexp combine
weights each shard's g_lse by exp(lse_local - lse_global).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from face_recognition_models_tpu.ops.fused_head import (
    FusedHeadOut,
    fused_margin_ce,
    fused_margin_ce_mem,
)


def sharded_fused_margin_ce(mesh: Mesh, xn, wn, labels, t, tcos, scale, ab,
                            mode: int, clamp_eps=None,
                            block_n: int = 128, block_c: int = 512,
                            interpret: bool = False,
                            data_axis: str = "data",
                            model_axis: str = "model",
                            memn=None, lam=None) -> FusedHeadOut:
    """Global-semantics fused margin+CE over a (data, model) mesh.

    xn [N, D] shards over data rows; wn [D, C] shards over model columns;
    all row vectors shard over data. Memory-blended heads pass memn [D, C]
    and lam [C], sharded over the same class axis as wn. Returns global
    (lse, target, higher) sharded over data.
    """
    msize = mesh.shape[model_axis]
    c = wn.shape[1]
    if c % msize != 0:
        raise ValueError(f"num_classes {c} must divide over the model axis "
                         f"({msize})")
    c_local = c // msize
    has_mem = memn is not None

    def shard_fn(xn_l, wn_l, labels_l, t_l, tcos_l, scale_l, ab_l,
                 *mem_args):
        midx = jax.lax.axis_index(model_axis)
        offset = midx * c_local
        lab_local = labels_l - offset
        owner = (lab_local >= 0) & (lab_local < c_local)
        # non-owners get an out-of-range label: their kernel applies no
        # target column (the margin only exists on the owning shard)
        lab_local = jnp.where(owner, lab_local, c_local + 1)

        if has_mem:
            memn_l, lam_l = mem_args
            out = fused_margin_ce_mem(xn_l, wn_l, memn_l, lam_l, lab_local,
                                      t_l, tcos_l, scale_l, ab_l, mode,
                                      clamp_eps, block_n, block_c, interpret)
        else:
            out = fused_margin_ce(xn_l, wn_l, lab_local, t_l, tcos_l,
                                  scale_l, ab_l, mode, clamp_eps, block_n,
                                  block_c, interpret)

        # the shift is numerics-only (lse is shift-invariant), so it must
        # not be differentiated (pmax has no JVP rule anyway) — stop the
        # gradient BEFORE pmax so its JVP is never requested
        mx = jax.lax.pmax(jax.lax.stop_gradient(out.lse), model_axis)
        lse = jnp.log(jax.lax.psum(jnp.exp(out.lse - mx), model_axis)) + mx
        target = jax.lax.psum(
            jnp.where(owner, scale_l * t_l, 0.0), model_axis)
        higher = jax.lax.psum(out.higher, model_axis)
        return FusedHeadOut(lse=lse, target_logit=target, higher=higher)

    row = P(data_axis)
    in_specs = (P(data_axis, None), P(None, model_axis), row, row, row,
                row, P(data_axis, None))
    operands = (xn, wn, labels, t, tcos, scale, ab)
    if has_mem:
        in_specs = in_specs + (P(None, model_axis), P(model_axis))
        operands = operands + (memn, lam)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=FusedHeadOut(lse=row, target_logit=row, higher=row),
        check_vma=False,
    )(*operands)
