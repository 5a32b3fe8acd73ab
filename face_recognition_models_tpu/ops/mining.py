"""On-device semi-hard triplet mining.

The reference mines on CPU with a Python double loop after syncing the
distance matrix to host (FaceNet/main.py:96-128: per anchor-positive pair,
pick a RANDOM negative with d_ap < d_an < d_ap + margin, else the HARDEST
negative beyond d_ap) — a full device->host round trip per batch. Here the
whole selection is a masked-argmax over a [B, B, B] mask computed on device
with a keyed PRNG, fused by XLA; no host sync.

Distance conventions mirror the reference exactly: mining uses SQUARED
distances of normalized embeddings (2 - 2*cos, main.py:82-89); the loss
uses EUCLIDEAN distances (F.pairwise_distance, utils/criterions.py:10-14).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def pairwise_sq_distances(embeddings: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise distances for L2-normalized embeddings:
    ||u-v||^2 = 2 - 2 u.v, clamped at 0 (FaceNet/main.py:82-89)."""
    dot = jnp.dot(embeddings, embeddings.T,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(2.0 - 2.0 * dot, 0.0)


class MiningResult(NamedTuple):
    negatives: jnp.ndarray   # [B, B] chosen negative index per (a, p) pair
    valid: jnp.ndarray       # [B, B] bool: (a, p) is a usable triplet


def semi_hard_negatives(dist_sq: jnp.ndarray, labels: jnp.ndarray,
                        margin: float, rng: jax.Array) -> MiningResult:
    """For every anchor-positive pair (i, j), choose a negative k.

    Selection rule (reference main.py:104-124):
      1. candidates: labels[k] != labels[i] and
         d_ap < d_ak < d_ap + margin  -> pick RANDOM candidate;
      2. fallback: negatives with d_ak > d_ap -> pick the HARDEST
         (smallest d_ak);
      3. neither -> pair invalid.
    """
    b = dist_sq.shape[0]
    same = labels[:, None] == labels[None, :]            # [B, B]
    eye = jnp.eye(b, dtype=bool)
    pos_pair = same & ~eye                               # anchor-positive
    neg_of = ~same                                       # [B(anchor), B(neg)]

    d_ap = dist_sq[:, :, None]                           # [B, B, 1]
    d_an = dist_sq[:, None, :]                           # [B, 1, B]
    negm = neg_of[:, None, :]                            # [B, 1, B]

    semi = negm & (d_an > d_ap) & (d_an < d_ap + margin)  # [B, B, B]
    harder = negm & (d_an > d_ap)

    # Random choice among semi-hard candidates via Gumbel-argmax (keyed,
    # deterministic — the reference uses np.random.choice, main.py:117).
    gumbel = jax.random.gumbel(rng, semi.shape)
    random_pick = jnp.argmax(jnp.where(semi, gumbel, -jnp.inf), axis=-1)

    # Hardest fallback: argmin distance among `harder` (main.py:121-124).
    hard_pick = jnp.argmin(
        jnp.where(harder, jnp.broadcast_to(d_an, harder.shape), jnp.inf),
        axis=-1)

    has_semi = jnp.any(semi, axis=-1)
    has_hard = jnp.any(harder, axis=-1)
    negatives = jnp.where(has_semi, random_pick, hard_pick)
    valid = pos_pair & (has_semi | has_hard)
    return MiningResult(negatives=negatives, valid=valid)


def semi_hard_triplet_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                           margin: float = 0.2,
                           rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Batch-all semi-hard triplet loss, fully on device.

    mean over mined (a, p, n) of relu(||a-p|| - ||a-n|| + margin)
    (TripletLoss, FaceNet/utils/criterions.py:10-14: euclidean distances).
    Returns 0 when no valid triplet exists (reference returns None and
    skips the step; a zero loss gives zero grads — same effect, jit-safe).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    emb = embeddings.astype(jnp.float32)
    dist_sq = pairwise_sq_distances(emb)
    mined = semi_hard_negatives(dist_sq, labels, margin, rng)

    d = jnp.sqrt(dist_sq + 1e-16)                        # euclidean
    d_ap = d                                             # [B(a), B(p)]
    d_an = jnp.take_along_axis(d, mined.negatives, axis=1)  # [B, B]
    per_pair = jnp.maximum(d_ap - d_an + margin, 0.0)

    v = mined.valid.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(v), 1.0)
    return jnp.sum(per_pair * v) / count
