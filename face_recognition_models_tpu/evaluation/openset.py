"""Open-set / at-scale recognition metrics: TPR@FAR and 1:N identification.

Beyond-reference evaluation capability. The reference's protocol reports
only 10-fold verification accuracy + AUC (model_utils.py:416-474); modern
face-recognition evaluation (IJB-B/C, MegaFace) additionally reports:

- **TPR@FAR** (1:1 verification at fixed false-accept rates, e.g. 1e-4):
  the operating-point metric production systems actually deploy at — a
  single accuracy number hides the far tail of the impostor distribution.
- **Closed-set 1:N identification** (CMC rank-k): probe against a gallery,
  correct if the true identity ranks in the top k.
- **Open-set 1:N identification** (TPIR@FPIR): probes may be absent from
  the gallery; the accept threshold is set so that only a given fraction
  of non-mated probes false-alarm.

All metrics run on cached L2-normalized embeddings (embed-once, like
evaluation/verification.py); the [P, G] probe-gallery cosine matrix is one
matmul. Scores are cosines in [-1, 1] throughout.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def tpr_at_far(scores: np.ndarray, labels: np.ndarray,
               fars: Sequence[float] = (1e-1, 1e-2, 1e-3, 1e-4),
               ) -> Dict[float, Tuple[float, float]]:
    """TPR at fixed FAR operating points for 1:1 verification.

    scores: pair cosine similarities; labels: 1 genuine / 0 impostor.
    For each target FAR, the threshold is the tightest one whose measured
    FAR does not exceed the target (the conservative convention — no
    interpolation past measured points); returns {far: (tpr, threshold)}.
    """
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels).astype(bool)
    genuine = np.sort(scores[labels])
    impostor = np.sort(scores[~labels])[::-1]  # descending
    n_imp = len(impostor)
    if n_imp == 0 or len(genuine) == 0:
        raise ValueError("need both genuine and impostor pairs")

    out: Dict[float, Tuple[float, float]] = {}
    for far in fars:
        k = int(np.floor(far * n_imp))  # impostors allowed above threshold
        if k >= n_imp:
            thresh = -1.0
        elif k == 0:
            # nothing may pass: threshold just above the top impostor
            thresh = float(np.nextafter(impostor[0], np.inf))
        else:
            # accept the k highest impostors: threshold just above the
            # (k+1)-th highest
            thresh = float(np.nextafter(impostor[k], np.inf))
        tpr = float(np.mean(genuine >= thresh))
        out[far] = (tpr, thresh)
    return out


def _best_per_identity(scores: np.ndarray, gallery_ids: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Collapse [P, G_images] scores to [P, G_identities] by max-pooling
    over each identity's gallery images; returns (pooled, unique_ids).

    Vectorized via sort + maximum.reduceat — no per-identity Python loop,
    so a 100k-identity gallery pools in one pass."""
    order = np.argsort(gallery_ids, kind="stable")
    uniq, starts = np.unique(gallery_ids[order], return_index=True)
    pooled = np.maximum.reduceat(scores[:, order], starts, axis=1)
    return pooled, uniq


def pooled_scores_device(gallery_emb: np.ndarray, gallery_ids: np.ndarray,
                         probe_emb: np.ndarray, chunk: int = 256,
                         shard: Optional[bool] = None,
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """[P, U] identity-pooled probe-gallery cosines computed ON DEVICE:
    the [chunk, G] matmul and the per-identity segment-max both run under
    one jit, so a million-image gallery never materializes host-side.

    With more than one device (shard=None auto, or shard=True), gallery
    rows shard over every device (mesh axis "data"): each shard pools its
    local rows into the GLOBAL [chunk, U] matrix (absent identities start
    at -inf) and a pmax over the axis combines them — N chips hold an
    N-times-larger gallery and split the matmul FLOPs, with one [chunk, U]
    all-reduce per chunk riding ICI.

    Probes are processed in fixed-size chunks (static shapes — one XLA
    program regardless of P; the last chunk is padded). fp32 matmul at
    HIGHEST precision: identification ranks on cosine gaps that bf16
    single-pass would blur. Returns (pooled [P, U] on host, unique_ids)."""
    import functools

    import jax
    import jax.numpy as jnp

    order = np.argsort(gallery_ids, kind="stable")
    uniq = np.unique(gallery_ids)
    n_seg = len(uniq)
    gal_np = np.ascontiguousarray(gallery_emb[order], np.float32)
    seg_np = np.searchsorted(uniq, gallery_ids[order])

    n_dev = jax.device_count()
    if shard is None:
        shard = n_dev > 1

    if shard and n_dev > 1:
        from jax import shard_map
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        pad_g = (-len(gal_np)) % n_dev
        if pad_g:  # padded rows pool into a dummy segment, dropped below
            gal_np = np.concatenate(
                [gal_np, np.zeros((pad_g, gal_np.shape[1]), np.float32)])
            seg_np = np.concatenate(
                [seg_np, np.full(pad_g, n_seg, seg_np.dtype)])
        mesh = jax.make_mesh((n_dev,), ("data",))
        # device_put ONCE as jit arguments (closure would bake a multi-GB
        # gallery into the program as constants, re-shipped per compile)
        gal = jax.device_put(gal_np, NamedSharding(mesh, P("data", None)))
        seg = jax.device_put(seg_np, NamedSharding(mesh, P("data")))

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(None, None), P("data", None), P("data")),
            out_specs=P(None, None))
        def score_chunk(probes, gal_l, seg_l):
            s = jnp.matmul(probes, gal_l.T,
                           precision=jax.lax.Precision.HIGHEST)
            # global segment ids: identities this shard lacks stay -inf
            # and the cross-shard pmax fills them in
            pooled = jax.ops.segment_max(s.T, seg_l,
                                         num_segments=n_seg + 1,
                                         indices_are_sorted=True).T
            return jax.lax.pmax(pooled[:, :n_seg], "data")
    else:
        gal = jax.device_put(gal_np)
        seg = jax.device_put(seg_np)

        @jax.jit
        def score_chunk(probes, gal, seg):
            s = jnp.matmul(probes, gal.T,
                           precision=jax.lax.Precision.HIGHEST)  # [chunk,G]
            return jax.ops.segment_max(s.T, seg, num_segments=n_seg,
                                       indices_are_sorted=True).T

    p = np.asarray(probe_emb, np.float32)
    n = p.shape[0]
    out = np.empty((n, n_seg), np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        block = p[lo:hi]
        if hi - lo < chunk:  # pad to the static chunk shape
            block = np.concatenate(
                [block, np.zeros((chunk - (hi - lo), p.shape[1]),
                                 np.float32)])
        out[lo:hi] = np.asarray(
            score_chunk(jnp.asarray(block), gal, seg))[:hi - lo]
    return out, uniq


@dataclass
class IdentificationResult:
    cmc: Dict[int, float]                    # rank -> accuracy %
    tpir_at_fpir: Dict[float, float] = field(default_factory=dict)
    thresholds: Dict[float, float] = field(default_factory=dict)

    def __str__(self):
        parts = [f"rank-{k} {v:.3f}%" for k, v in sorted(self.cmc.items())]
        parts += [f"TPIR@FPIR={f:g} {v:.3f}%"
                  for f, v in sorted(self.tpir_at_fpir.items())]
        return "  ".join(parts)


def closed_set_identification(gallery_emb: np.ndarray,
                              gallery_ids: np.ndarray,
                              probe_emb: np.ndarray,
                              probe_ids: np.ndarray,
                              ranks: Sequence[int] = (1, 5),
                              device: bool = False,
                              ) -> IdentificationResult:
    """CMC rank-k accuracy. Embeddings must be L2-normalized; every probe
    identity must appear in the gallery. device=True scores on the TPU
    (pooled_scores_device) — same numbers, million-image galleries."""
    gallery_ids = np.asarray(gallery_ids)
    probe_ids = np.asarray(probe_ids)
    missing = set(probe_ids.tolist()) - set(gallery_ids.tolist())
    if missing:
        raise ValueError(
            f"{len(missing)} probe identities missing from the gallery "
            "(use open_set_identification for non-mated probes)")
    if device:
        pooled, uniq = pooled_scores_device(gallery_emb, gallery_ids,
                                            probe_emb)
    else:
        scores = probe_emb @ gallery_emb.T                 # [P, G_images]
        pooled, uniq = _best_per_identity(scores, gallery_ids)  # [P, G_ids]
    true_col = np.searchsorted(uniq, probe_ids)
    true_score = pooled[np.arange(len(probe_ids)), true_col]
    # rank = number of identities scoring strictly higher, ties favor us
    rank = (pooled > true_score[:, None]).sum(axis=1)
    cmc = {k: float(100.0 * np.mean(rank < k)) for k in ranks}
    return IdentificationResult(cmc=cmc)


def open_set_identification(gallery_emb: np.ndarray,
                            gallery_ids: np.ndarray,
                            probe_emb: np.ndarray,
                            probe_ids: np.ndarray,
                            fpirs: Sequence[float] = (1e-1, 1e-2),
                            ranks: Sequence[int] = (1,),
                            device: bool = False,
                            ) -> IdentificationResult:
    """Open-set 1:N (IJB-C style): probes whose identity is NOT in the
    gallery are non-mated; the accept threshold at each target FPIR is set
    on the non-mated top-score distribution, and TPIR = fraction of mated
    probes identified at rank 1 with top score above the threshold.
    device=True scores on the TPU (pooled_scores_device)."""
    gallery_ids = np.asarray(gallery_ids)
    probe_ids = np.asarray(probe_ids)
    if device:
        pooled, uniq = pooled_scores_device(gallery_emb, gallery_ids,
                                            probe_emb)
    else:
        scores = probe_emb @ gallery_emb.T
        pooled, uniq = _best_per_identity(scores, gallery_ids)
    top_score = pooled.max(axis=1)

    mated = np.isin(probe_ids, uniq)
    if not mated.any() or mated.all():
        raise ValueError("open-set protocol needs both mated and "
                         "non-mated probes")
    nonmated_top = np.sort(top_score[~mated])[::-1]
    n_nm = len(nonmated_top)

    top1_correct = np.zeros(len(probe_ids), bool)
    m_idx = np.where(mated)[0]
    true_col = np.searchsorted(uniq, probe_ids[m_idx])
    # same tie convention as the CMC below (rank = count of STRICTLY
    # greater identities): an exact score tie counts as rank-1, so don't
    # let argmax's first-column preference fail the mated probe when the
    # tied impostor happens to sort earlier
    top1_correct[m_idx] = (pooled[m_idx, true_col] >= top_score[m_idx])

    cmc = {k: float(100.0 * np.mean(
        (pooled[m_idx] > pooled[m_idx, true_col][:, None]).sum(axis=1) < k))
        for k in ranks}

    tpir, thresholds = {}, {}
    for fpir in fpirs:
        k = int(np.floor(fpir * n_nm))
        if k == 0:
            thresh = float(np.nextafter(nonmated_top[0], np.inf))
        elif k >= n_nm:
            thresh = -1.0
        else:
            thresh = float(np.nextafter(nonmated_top[k], np.inf))
        accept = top_score[m_idx] >= thresh
        tpir[fpir] = float(100.0 * np.mean(top1_correct[m_idx] & accept))
        thresholds[fpir] = thresh
    return IdentificationResult(cmc=cmc, tpir_at_fpir=tpir,
                                thresholds=thresholds)


def pool_templates(emb: np.ndarray, ids: np.ndarray,
                   weights: Optional[np.ndarray] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """IJB-style template pooling: every image of an identity collapses to
    ONE L2-normalized embedding — the (weighted) sum of the per-image
    L2-normalized embeddings, renormalized. `weights` (e.g. the MagFace
    quality scores `face embed` stores, serving/embed.py:norm_quality)
    emphasize high-quality faces; the renormalization makes the sum a
    weighted mean. Vectorized via sort + add.reduceat (no per-identity
    Python loop). Returns (pooled [U, D], unique_ids [U])."""
    ids = np.asarray(ids)
    order = np.argsort(ids, kind="stable")
    uniq, starts = np.unique(ids[order], return_index=True)
    e = np.asarray(emb, np.float32)[order]
    if weights is not None:
        e = e * np.asarray(weights, np.float32)[order][:, None]
    summed = np.add.reduceat(e, starts, axis=0)
    norms = np.linalg.norm(summed, axis=1, keepdims=True)
    return summed / np.maximum(norms, 1e-12), uniq


def _ids_from_paths(paths: np.ndarray) -> np.ndarray:
    """Identity label = parent directory name (the identity-folder layout
    the reference's datasets use, dataset.py:93)."""
    import os
    return np.asarray([os.path.basename(os.path.dirname(str(p)))
                       for p in paths])


def _quality_gate(npz, min_quality: float, which: str) -> np.ndarray:
    """Keep-mask of rows whose MagFace-norm quality (`face embed`'s
    `quality` field, serving/embed.py:norm_quality) is >= min_quality."""
    if "quality" not in npz:
        raise ValueError(
            f"--min-quality given but {which} npz has no 'quality' field; "
            "re-run `face embed` (older outputs lack per-image quality)")
    keep = np.asarray(npz["quality"]) >= min_quality
    if not keep.any():
        raise ValueError(
            f"min_quality={min_quality} removes every {which} image")
    return keep


def identify_from_npz(gallery_npz: str, probes_npz: str,
                      ranks: Sequence[int] = (1, 5),
                      fpirs: Sequence[float] = (1e-1, 1e-2),
                      device: bool = False,
                      min_quality: float = 0.0,
                      pool: str = "none",
                      pool_weight: str = "none",
                      ) -> IdentificationResult:
    """1:N identification over two `face embed` outputs (.npz with
    `embeddings` [N, D] L2-normalized + `paths`). Identities come from
    each path's parent directory. Runs the closed-set protocol when every
    probe identity exists in the gallery, the open-set protocol otherwise.
    device=True runs the probe-gallery scoring on the accelerator.
    min_quality > 0 gates both sides on the stored MagFace-norm quality
    score (low-quality faces dominate the false-match tail).
    pool in {none, probes, gallery, both}: collapse each identity's images
    to one template embedding (pool_templates); pool_weight="quality"
    weights the pooled mean by the stored quality scores."""
    g = np.load(gallery_npz, allow_pickle=False)
    p = np.load(probes_npz, allow_pickle=False)
    g_emb, g_ids = g["embeddings"], _ids_from_paths(g["paths"])
    p_emb, p_ids = p["embeddings"], _ids_from_paths(p["paths"])
    g_q = g["quality"] if "quality" in g else None
    p_q = p["quality"] if "quality" in p else None
    if min_quality > 0.0:
        g_keep = _quality_gate(g, min_quality, "gallery")
        p_keep = _quality_gate(p, min_quality, "probes")
        g_emb, g_ids, g_q = g_emb[g_keep], g_ids[g_keep], g_q[g_keep]
        p_emb, p_ids, p_q = p_emb[p_keep], p_ids[p_keep], p_q[p_keep]

    if pool not in ("none", "probes", "gallery", "both"):
        raise ValueError(f"pool must be none/probes/gallery/both: {pool!r}")
    if pool_weight not in ("none", "quality"):
        raise ValueError(f"pool_weight must be none/quality: {pool_weight!r}")
    if pool != "none":
        def weights(q, which):
            if pool_weight != "quality":
                return None
            if q is None:
                raise ValueError(
                    f"pool_weight='quality' but {which} npz has no "
                    "'quality' field; re-run `face embed`")
            return q
        if pool in ("gallery", "both"):
            g_emb, g_ids = pool_templates(g_emb, g_ids,
                                          weights(g_q, "gallery"))
        if pool in ("probes", "both"):
            p_emb, p_ids = pool_templates(p_emb, p_ids,
                                          weights(p_q, "probes"))
    if set(p_ids.tolist()) <= set(g_ids.tolist()):
        return closed_set_identification(g_emb, g_ids, p_emb, p_ids, ranks,
                                         device=device)
    return open_set_identification(g_emb, g_ids, p_emb, p_ids, fpirs, ranks,
                                   device=device)
