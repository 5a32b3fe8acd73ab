"""Class-sharded Partial-FC: sampled-classifier training over the mesh.

The replicated-kernel Partial-FC (train/partial_fc.py) holds the whole
[D, C] classifier on every chip — fine to ~1M identities, impossible at
insightface scale (10M identities = 20 GB fp32 + 20 GB momentum). This
module shards the kernel AND its momentum over the mesh's 'model' axis
(each shard owns C/mp class columns, the same layout as the dense
class-sharded head, parallel/sharding.py) and samples PER SHARD, which
is exactly the original Partial FC architecture (An et al. 2021: each
GPU holds a class shard and samples locally).

TPU-native structure — two thin shard_maps around plain GSPMD math:

1. `sample+gather` (shard_map, non-differentiated): every model shard
   draws its local sample — the batch's positives that fall in its class
   range plus exact uniform local negatives (same keyed top-k scheme as
   partial_fc.sample_classes) — and gathers those kernel columns. The
   gathered slice [D, mp*C_s_local] is SMALL and becomes the
   differentiated leaf, so no dense [D, C] gradient ever exists.
2. margin + CE in plain jnp over the sampled cosine matrix
   [N, mp*C_s_local]: GSPMD keeps it sharded (data, model) and inserts
   the cross-shard logsumexp psum itself. The per-row margin scalars
   come from the SAME `_row_params` reduction the fused Pallas path uses
   (heads/fused_adapter.py), so all nine fusable heads — including the
   EMA-stateful ones — work unchanged; non-target transforms reuse the
   kernel's `_h` rules (ops/fused_head.py).
3. `update` (shard_map): torch-SGD (wd into grad, then momentum) applied
   to the sampled columns of the LOCAL kernel/momentum shard, scatter-
   add, O(C_s) per step.

The logQ sampled-softmax correction (partial_fc.py) is applied with
per-shard inclusion probabilities.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from face_recognition_models_tpu.heads.fused_adapter import (
    MEM_FUSED_HEADS,
    _row_params,
    fused_supported,
)
from face_recognition_models_tpu.ops.fused_head import _h
from face_recognition_models_tpu.ops.normalize import (
    feature_norms,
    l2_normalize,
)
from face_recognition_models_tpu.ops.image_ops import (
    normalize_images,
    apply_augmentations,
)
from face_recognition_models_tpu.train.state import TrainState

_NEG_INF = jnp.float32(-1e30)


def _local_sample(rng, labels_full, c_local: int, n_slots: int,
                  c_s_local: int, model_axis: str):
    """One model shard's sample: local positives + exact uniform local
    negatives. Runs identically on every data block (same rng).

    n_slots = min(batch, c_local): a shard holds at most c_local distinct
    local positives, so unique(size=n_slots) never truncates a real one
    (the sentinel sorts last and is the only value ever dropped).
    """
    midx = jax.lax.axis_index(model_axis)
    offset = midx * c_local
    shard_rng = jax.random.fold_in(rng, midx)

    lab_local = labels_full - offset
    in_range = (lab_local >= 0) & (lab_local < c_local)
    # sentinel c_local sorts last; unique packs real local positives first
    masked = jnp.where(in_range, lab_local, c_local)
    pos = jnp.unique(masked, size=n_slots, fill_value=c_local)
    pos_valid = pos < c_local

    from face_recognition_models_tpu.train.partial_fc import (
        sample_negatives)
    scores = jax.random.uniform(shard_rng, (c_local + 1,))
    scores = scores.at[pos].set(-1.0)  # sentinel writes land in slot C
    shift = jax.random.randint(jax.random.fold_in(shard_rng, 1), (), 0,
                               c_local)
    neg = sample_negatives(scores[:c_local], c_s_local - n_slots, n_slots,
                           shift=shift)

    classes = jnp.concatenate([jnp.where(pos_valid, pos, 0), neg])
    col_valid = jnp.concatenate(
        [pos_valid, jnp.ones((c_s_local - n_slots,), bool)])
    u = jnp.sum(pos_valid.astype(jnp.int32))
    return classes, col_valid, u, offset


def make_sharded_partial_fc_train_step(
        backbone, head_cfg, tx: optax.GradientTransformation,
        num_sampled_local: int,
        learning_rate: Union[float, Callable],
        mesh: Mesh,
        momentum: float = 0.9, weight_decay: float = 5e-4,
        nesterov: bool = False,
        lambda_g: float = 0.0,
        has_dropout: bool = False,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        horizontal_flip: bool = False,
        crop_pad: int = 0, color_jitter: float = 0.0,
        random_erasing: float = 0.0,
        logq_correction: bool = True,
        model_axis: str = "model") -> Callable:
    """Sampled-classifier step with the kernel sharded over `model_axis`.

    num_sampled_local: sampled columns PER SHARD (>= batch positive slots
    + at least one negative). The global sample is mp * num_sampled_local.
    Supports the nine fusable margin heads (memory-blended VPL/QAFace
    keep the dense path; their [C, D] memories key on absolute class id);
    margin math is derived from head_cfg via the fused kernel's _row_params
    rules, so no head object is taken. Batch inputs shard over whatever
    axis the caller's in_shardings say (see train_state_shardings /
    batch_sharding); only the class axis is handled here.
    """
    if not fused_supported(head_cfg.name) or head_cfg.name in MEM_FUSED_HEADS:
        raise ValueError(
            f"sharded partial_fc does not support head '{head_cfg.name}'")
    mp = mesh.shape[model_axis]
    c_total = head_cfg.num_classes
    if c_total % mp:
        raise ValueError(f"num_classes {c_total} must divide over the "
                         f"model axis ({mp})")
    c_local = c_total // mp
    c_s_local = num_sampled_local
    if c_s_local > c_local:
        raise ValueError(f"num_sampled_local {c_s_local} > local classes "
                         f"{c_local}")

    def lr_at(step):
        if callable(learning_rate):
            return learning_rate(step)
        return jnp.float32(learning_rate)

    def sample_and_gather(kernel, labels_full, rng):
        def block(kernel_l, labels_f, rng_r):
            n_slots = min(labels_f.shape[0], c_local)
            classes, col_valid, u, offset = _local_sample(
                rng_r, labels_f, c_local, n_slots, c_s_local, model_axis)
            ws = jnp.take(kernel_l, classes, axis=1)   # [D, C_s_local]
            return ws, classes, classes + offset, col_valid, u[None]

        return shard_map(
            block, mesh=mesh,
            in_specs=(P(None, model_axis), P(), P()),
            out_specs=(P(None, model_axis), P(model_axis), P(model_axis),
                       P(model_axis), P(model_axis)),
            check_vma=False,
        )(kernel, labels_full, rng)

    def apply_update(kernel, mom, classes_local, g_ws, w_s, col_valid, lr):
        def block(kernel_l, mom_l, cls_l, g_l, ws_l, valid_l, lr_s):
            valid = valid_l[None, :].astype(jnp.float32)
            g = (g_l + weight_decay * ws_l) * valid
            mom_s = jnp.take(mom_l, cls_l, axis=1)
            new_mom_s = momentum * mom_s + g
            step_dir = g + momentum * new_mom_s if nesterov else new_mom_s
            new_kernel = kernel_l.at[:, cls_l].add(-lr_s * step_dir * valid)
            new_mom = mom_l.at[:, cls_l].add((new_mom_s - mom_s) * valid)
            return new_kernel, new_mom

        col = P(None, model_axis)
        return shard_map(
            block, mesh=mesh,
            in_specs=(col, col, P(model_axis), col, col, P(model_axis), P()),
            out_specs=(col, col),
            check_vma=False,
        )(kernel, mom, classes_local, g_ws, w_s, col_valid, lr)

    n_slots_err = ("per-shard positive slots {} (= min(batch, C/mp)) leave "
                   "no negative slots in num_sampled_local {}")

    def train_step(state: TrainState, images, labels, minput_images=None):
        del minput_images
        n = labels.shape[0]
        n_slots = min(n, c_local)
        n_negs = c_s_local - n_slots
        if n_negs < 0:
            raise ValueError(n_slots_err.format(n_slots, c_s_local))
        rng, head_rng, dropout_rng, flip_rng, sample_rng = (
            jax.random.split(state.rng, 5))
        if images.dtype == jnp.uint8:
            images = normalize_images(images, mean, std)
        images = apply_augmentations(
            flip_rng, images, horizontal_flip, crop_pad, color_jitter,
            random_erasing)

        kernel = state.params["kernel_w"]
        w_s, cls_local, cls_ids, col_valid, u = sample_and_gather(
            jax.lax.stop_gradient(kernel), labels, sample_rng)
        s_total = mp * c_s_local

        # per-shard logQ shift: negatives' inclusion prob on shard m is
        # n_negs/(c_local - u_m); positives (first n_slots slots) get 0
        if logq_correction and n_negs > 0:
            shift_per_shard = jnp.log(
                jnp.maximum(c_local - u.astype(jnp.float32), 1.0)
                / jnp.float32(n_negs))                 # [mp]
            slot = jnp.arange(s_total) % c_s_local
            logq_shift = jnp.where(
                slot >= n_slots, jnp.repeat(shift_per_shard, c_s_local),
                0.0)
        else:
            logq_shift = jnp.zeros((s_total,), jnp.float32)

        def loss_fn(bb_params, w_sampled):
            model_vars = {"params": bb_params,
                          "batch_stats": state.batch_stats}
            rngs = {"dropout": dropout_rng} if has_dropout else None
            feats, mutated = backbone.apply(
                model_vars, images, train=True, mutable=["batch_stats"],
                rngs=rngs)
            feats = feats.astype(jnp.float32)
            xn = l2_normalize(feats, axis=1)
            norms = feature_norms(feats)
            wsn = l2_normalize(w_sampled.astype(jnp.float32), axis=0)

            cos = xn @ wsn                              # [N, S] (dp, mp)
            one_hot = ((cls_ids[None, :] == labels[:, None])
                       & col_valid[None, :])
            tcos_raw = jnp.sum(jnp.where(one_hot, cos, 0.0), axis=1)

            rp = _row_params(head_cfg, tcos_raw, norms, state.head_state,
                             head_rng)
            cosc = cos
            if rp.clamp_eps is not None:
                cosc = jnp.clip(cos, -1.0 + rp.clamp_eps,
                                1.0 - rp.clamp_eps)
            a, b = rp.ab[:, 0:1], rp.ab[:, 1:2]
            z_nt = (rp.scale[:, None] * _h(rp.mode, cosc, a, b)
                    + logq_shift[None, :])
            nt_mask = col_valid[None, :] & ~one_hot
            z_nt = jnp.where(nt_mask, z_nt, _NEG_INF)
            lse_nt = jax.nn.logsumexp(z_nt, axis=1)     # psum over model
            target_z = rp.scale * rp.t
            loss_id = jnp.mean(jnp.logaddexp(target_z, lse_nt) - target_z)
            loss = loss_id + lambda_g * rp.loss_g

            higher = jnp.sum(
                nt_mask & (cos > jax.lax.stop_gradient(tcos_raw)[:, None]),
                axis=1)
            return loss, (rp, mutated["batch_stats"], loss_id, higher,
                          norms)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        ((loss, (rp, new_batch_stats, loss_id, higher, norms)),
         (g_bb, g_ws)) = grad_fn(state.params["backbone"], w_s)

        updates, new_bb_opt = tx.update(
            g_bb, state.opt_state["backbone"], state.params["backbone"])
        new_backbone = optax.apply_updates(state.params["backbone"], updates)

        lr = lr_at(state.step)
        new_kernel, new_mom = apply_update(
            kernel, state.opt_state["kernel_mom"], cls_local, g_ws, w_s,
            col_valid, lr)

        metrics = {
            "loss": loss,
            "loss_id": loss_id,
            "loss_mag": lambda_g * rp.loss_g,
            # sampled-space accuracy (Partial-FC logging caveat)
            "acc1": 100.0 * jnp.mean((higher < 1).astype(jnp.float32)),
            "acc5": 100.0 * jnp.mean((higher < 5).astype(jnp.float32)),
            "lr": lr,
            "feat_norm": jnp.mean(norms),
        }
        new_state = state.replace(
            step=state.step + 1,
            params={"backbone": new_backbone, "kernel_w": new_kernel},
            batch_stats=new_batch_stats,
            head_state=rp.new_state,
            opt_state={"backbone": new_bb_opt, "kernel_mom": new_mom},
            rng=rng,
        )
        return new_state, metrics

    return train_step
