"""Optimizer factory (optax).

Mirrors the reference's factory surface (utils/optimizers.py:3-71: sgd, adam,
adamw, rmsprop, adagrad, nadam, adamax, lion — selectable by name or 1-based
id, with kwargs overrides), built on optax.

SGD parity note: torch.optim.SGD applies weight decay additively to the
gradient BEFORE the momentum accumulation (decoupled-from-lr, coupled-to-
momentum). The optax chain below reproduces that ordering exactly:
add_decayed_weights -> trace(momentum) -> scale_by_learning_rate.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

# Default hyperparameters mirroring the reference's OPTIMIZER_CONFIGS
# (optimizers.py:3-13).
OPTIMIZER_CONFIGS = {
    "sgd": {"lr": 0.01, "momentum": 0.9, "weight_decay": 1e-4,
            "nesterov": False},
    "adam": {"lr": 0.001, "b1": 0.9, "b2": 0.999, "weight_decay": 0.0},
    "adamw": {"lr": 0.001, "b1": 0.9, "b2": 0.999, "weight_decay": 0.01},
    "rmsprop": {"lr": 0.01, "decay": 0.99, "eps": 1e-8, "weight_decay": 0.0,
                "momentum": 0.9},
    "adagrad": {"lr": 0.01, "weight_decay": 0.0},
    "nadam": {"lr": 0.001, "b1": 0.9, "b2": 0.999, "weight_decay": 0.0},
    "adamax": {"lr": 0.002, "b1": 0.9, "b2": 0.999, "weight_decay": 0.0},
    "lion": {"lr": 0.001, "b1": 0.9, "b2": 0.99, "weight_decay": 0.01},
}

OPTIMIZER_DICT = {i + 1: name for i, name in enumerate(OPTIMIZER_CONFIGS)}

ScheduleOrFloat = Union[float, Callable[[int], float]]


def _wd(decay: float) -> list:
    return [optax.add_decayed_weights(decay)] if decay else []


class FusedSGDState(NamedTuple):
    count: jnp.ndarray   # schedule step, like ScaleByScheduleState.count
    trace: Any           # momentum buffers, like TraceState.trace


def fused_sgd(lr: ScheduleOrFloat, momentum: float = 0.9,
              weight_decay: float = 0.0,
              nesterov: bool = False) -> optax.GradientTransformation:
    """torch.optim.SGD semantics in ONE pass over the parameter tree.

    Math identical to chain(add_decayed_weights, trace, scale_by_lr) —
    wd is added to the gradient BEFORE momentum accumulation, exactly
    torch's ordering (reference utils/optimizers.py:19-23) — but emitted
    as a single per-leaf elementwise fusion instead of three chained
    transforms each materializing a full updates tree. Measured on the
    b512/C=10,575 ResNet-50 step: the chained form costs 3.8 ms of the
    57 ms step (~6x its HBM speed-of-light); see PERF.md "Train-step
    decomposition".
    """

    def init(params):
        return FusedSGDState(count=jnp.zeros([], jnp.int32),
                             trace=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        if weight_decay and params is None:
            raise ValueError("fused_sgd with weight_decay needs params")
        lr_t = lr(state.count) if callable(lr) else lr

        def leaf(g, mom, p):
            g32 = g.astype(mom.dtype)
            if weight_decay:
                g32 = g32 + weight_decay * p.astype(mom.dtype)
            mom2 = momentum * mom + g32
            d = (g32 + momentum * mom2) if nesterov else mom2
            return (-lr_t * d).astype(g.dtype), mom2

        if params is None:
            params = grads  # placeholder; leaf ignores p when wd == 0
        pairs = jax.tree.map(leaf, grads, state.trace, params)
        is_pair = lambda t: isinstance(t, tuple)  # leaves are arrays
        updates = jax.tree.map(lambda t: t[0], pairs, is_leaf=is_pair)
        new_trace = jax.tree.map(lambda t: t[1], pairs, is_leaf=is_pair)
        return updates, FusedSGDState(count=state.count + 1,
                                      trace=new_trace)

    return optax.GradientTransformation(init, update)


def get_optimizer(choice: Union[int, str], learning_rate: ScheduleOrFloat,
                  **overrides) -> optax.GradientTransformation:
    """Create an optimizer by name or 1-based id with a schedule or float lr."""
    if isinstance(choice, int):
        if choice not in OPTIMIZER_DICT:
            raise ValueError(f"Invalid optimizer id: {choice}")
        name = OPTIMIZER_DICT[choice]
    else:
        name = choice.lower()
    if name not in OPTIMIZER_CONFIGS:
        raise ValueError(
            f"Unknown optimizer name: {name}. Available: {sorted(OPTIMIZER_CONFIGS)}")
    cfg = {**OPTIMIZER_CONFIGS[name], **overrides}
    cfg.pop("lr", None)
    lr = learning_rate

    # optional global-norm clipping of the RAW gradients before any
    # update rule (torch clip_grad_norm_ placement); composes with every
    # optimizer below.
    clip = float(cfg.pop("clip_grad_norm", 0.0) or 0.0)
    if clip > 0.0:
        base = get_optimizer(choice, learning_rate,
                             **{**overrides, "clip_grad_norm": 0.0})
        return optax.chain(optax.clip_by_global_norm(clip), base)

    if name == "sgd":
        return fused_sgd(lr, momentum=cfg["momentum"],
                         weight_decay=cfg["weight_decay"],
                         nesterov=cfg["nesterov"])
    if name == "adam":
        return optax.chain(
            *_wd(cfg["weight_decay"]),
            optax.scale_by_adam(b1=cfg["b1"], b2=cfg["b2"]),
            optax.scale_by_learning_rate(lr),
        )
    if name == "adamw":
        return optax.adamw(lr, b1=cfg["b1"], b2=cfg["b2"],
                           weight_decay=cfg["weight_decay"])
    if name == "rmsprop":
        return optax.chain(
            *_wd(cfg["weight_decay"]),
            optax.scale_by_rms(decay=cfg["decay"], eps=cfg["eps"]),
            optax.trace(decay=cfg["momentum"]),
            optax.scale_by_learning_rate(lr),
        )
    if name == "adagrad":
        return optax.chain(
            *_wd(cfg["weight_decay"]),
            optax.scale_by_rss(),
            optax.scale_by_learning_rate(lr),
        )
    if name == "nadam":
        return optax.chain(*_wd(cfg["weight_decay"]), optax.nadam(lr))
    if name == "adamax":
        return optax.chain(*_wd(cfg["weight_decay"]),
                           optax.adamax(lr, b1=cfg["b1"], b2=cfg["b2"]))
    if name == "lion":
        return optax.lion(lr, b1=cfg["b1"], b2=cfg["b2"],
                          weight_decay=cfg["weight_decay"])
    raise AssertionError(name)
