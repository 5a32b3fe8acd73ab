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

from typing import Callable, Union

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

    if name == "sgd":
        return optax.chain(
            *_wd(cfg["weight_decay"]),
            optax.trace(decay=cfg["momentum"], nesterov=cfg["nesterov"]),
            optax.scale_by_learning_rate(lr),
        )
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
