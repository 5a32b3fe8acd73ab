"""Margin-head framework.

All eleven reference heads (criterion.py:12-1520) share one contract:

    forward(feats[, minput], labels)
      -> ([pre_margin_logits, post_margin_logits], norms, loss_g, one_hot)

Here each head is a pure function bundle over a shared normalized-cosine
logit computation:

    kernel  = init_kernel(rng)                  # [D, C] class prototypes
    state   = init_state()                      # explicit pytree (EMA,
                                                #   memories, counters)
    out     = apply(kernel, feats, labels, state, rng=..., minput=...)

`apply` is jit/pjit-safe: state lives in the train state (so it checkpoints
and shards like any other leaf), per-sample randomness is keyed PRNG, and
target-column edits are expressed with one-hot masks instead of scatters so
GSPMD can shard the class dimension.

All head math is fp32 regardless of backbone compute dtype — this mirrors
the fp32 master math under the reference's torch.amp autocast.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax.numpy as jnp


class HeadOutput(NamedTuple):
    """Mirror of the reference head tuple (model_utils.py:177-182)."""

    pre_logits: jnp.ndarray   # margin-free scaled logits [N, C] (accuracy)
    logits: jnp.ndarray       # post-margin scaled logits [N, C] (CE loss)
    norms: jnp.ndarray        # per-sample feature norms [N, 1]
    loss_g: jnp.ndarray       # scalar auxiliary loss (MagFace regularizer)
    one_hot: jnp.ndarray      # [N, C] target mask
    state: Any                # updated head state pytree


class Head(NamedTuple):
    """A margin head as a bundle of pure functions."""

    name: str
    init_kernel: Callable[..., jnp.ndarray]
    init_state: Callable[..., Any]
    apply: Callable[..., HeadOutput]
    requires_rng: bool = False   # elastic heads sample per-step margins
    requires_minput: bool = False  # QAFace needs a second (degraded) view


_REGISTRY: Dict[str, Head] = {}


def register_head(head: Head) -> Head:
    _REGISTRY[head.name] = head
    return head


def get_head(name: str) -> Head:
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"Unknown head '{name}'. Available: {sorted(_REGISTRY)}")
    return _REGISTRY[key]


def available_heads():
    return sorted(_REGISTRY)


def get_proxy(kernel: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Raw class centers for given labels, shape [D, N].

    Mirrors every head's `get_proxy` (e.g. criterion.py:157-159).
    """
    return jnp.take(kernel, labels, axis=1)
