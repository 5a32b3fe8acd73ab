"""Learning-rate schedules (per-step optax schedules with the reference's
per-epoch semantics).

Mirrors the reference's factory surface (utils/schedulers.py): step,
multistep, customstep, cosine, exponential, warmup_cosine, none. The
reference steps its schedulers once per EPOCH; here every schedule is a pure
function of the global step, converted through `steps_per_epoch`, so the LR
lives inside the jitted update.

CustomStepLR parity (schedulers.py:3-16): torch calls scheduler.step() after
each epoch, so 1-based epoch `e` trains with
    lr(e) = lr0 * ratio^|{s in steps : s <= e-1}|
which in 0-based epochs (= step // steps_per_epoch) is a boundary at each
`s`: epochs [0, 20) at lr0, [20, 40) at lr0*0.1, etc.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Union

import jax.numpy as jnp

from face_recognition_models_tpu.config import ScheduleConfig

Schedule = Callable[[jnp.ndarray], jnp.ndarray]

SCHEDULES = ("step", "multistep", "customstep", "cosine", "exponential",
             "warmup_cosine", "none")

# Numeric ids match the reference's ACTIVE entries only (schedulers.py:17-31:
# commented-out configs don't get ids), so integer configs ported from the
# reference select the same schedule. The extra schedules (exponential,
# warmup_cosine) are addressable by name only.
SCHEDULER_DICT = {1: "step", 2: "multistep", 3: "customstep", 4: "cosine",
                  5: "none"}


def _epoch_of(count, steps_per_epoch):
    return jnp.asarray(count, jnp.float32) // steps_per_epoch


def customstep_schedule(lr0: float, steps: Sequence[int], ratio: float,
                        steps_per_epoch: int) -> Schedule:
    boundaries = jnp.asarray([s * steps_per_epoch for s in steps])

    def schedule(count):
        n = jnp.sum(jnp.asarray(count) >= boundaries)
        return lr0 * ratio ** n.astype(jnp.float32)

    return schedule


def get_schedule(cfg: ScheduleConfig, learning_rate: float,
                 steps_per_epoch: int, num_epochs: int = None
                 ) -> Union[Schedule, float]:
    if isinstance(cfg.name, int):
        if cfg.name not in SCHEDULER_DICT:
            raise ValueError(
                f"Invalid scheduler id: {cfg.name}. Numeric ids follow the "
                f"reference table {SCHEDULER_DICT}; use names for the rest.")
        name = SCHEDULER_DICT[cfg.name]
    else:
        name = cfg.name.lower()
    lr0 = learning_rate
    spe = max(1, steps_per_epoch)

    if name == "none":
        return lr0

    if name == "customstep":
        return customstep_schedule(lr0, cfg.steps, cfg.ratio, spe)

    if name == "step":
        def schedule(count):
            e = _epoch_of(count, spe)
            return lr0 * cfg.gamma ** jnp.floor(e / cfg.step_size)
        return schedule

    if name == "multistep":
        boundaries = jnp.asarray([m * spe for m in cfg.milestones])

        def schedule(count):
            n = jnp.sum(jnp.asarray(count) >= boundaries)
            return lr0 * cfg.gamma ** n.astype(jnp.float32)
        return schedule

    if name == "cosine":
        if num_epochs is None:
            raise ValueError("num_epochs must be provided for cosine schedule")

        def schedule(count):
            e = _epoch_of(count, spe)
            return cfg.eta_min + (lr0 - cfg.eta_min) * 0.5 * (
                1.0 + jnp.cos(math.pi * e / num_epochs))
        return schedule

    if name == "exponential":
        def schedule(count):
            e = _epoch_of(count, spe)
            return lr0 * cfg.gamma ** e
        return schedule

    if name == "warmup_cosine":
        if num_epochs is None:
            raise ValueError("num_epochs must be provided for warmup_cosine")
        warm = cfg.warmup_epochs

        def schedule(count):
            e = _epoch_of(count, spe)
            warm_lr = lr0 * e / warm
            cos_lr = lr0 * 0.5 * (
                1.0 + jnp.cos(math.pi * (e - warm) / (num_epochs - warm)))
            return jnp.where(e < warm, warm_lr, cos_lr)
        return schedule

    raise ValueError(f"Unknown scheduler name: {name}. Available: {SCHEDULES}")
