"""Coverage for the remaining schedule variants and on-device image ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu.config import ScheduleConfig
from face_recognition_models_tpu.ops.image_ops import (
    center_crop_resize,
    random_horizontal_flip,
)
from face_recognition_models_tpu.train.schedules import get_schedule


def test_step_schedule():
    sched = get_schedule(ScheduleConfig(name="step", step_size=10,
                                        gamma=0.5), 1.0, steps_per_epoch=5)
    assert float(sched(0)) == 1.0
    assert float(sched(9 * 5)) == 1.0
    assert float(sched(10 * 5)) == 0.5
    assert float(sched(20 * 5)) == 0.25


def test_multistep_schedule():
    sched = get_schedule(ScheduleConfig(name="multistep",
                                        milestones=(2, 4), gamma=0.1),
                         1.0, steps_per_epoch=3)
    assert float(sched(0)) == 1.0
    assert float(sched(2 * 3)) == pytest.approx(0.1)
    assert float(sched(4 * 3)) == pytest.approx(0.01)


def test_cosine_schedule():
    sched = get_schedule(ScheduleConfig(name="cosine", eta_min=0.0), 1.0,
                         steps_per_epoch=1, num_epochs=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(5)) == pytest.approx(0.5, abs=1e-6)
    assert float(sched(10)) == pytest.approx(0.0, abs=1e-6)


def test_warmup_cosine_schedule():
    sched = get_schedule(ScheduleConfig(name="warmup_cosine",
                                        warmup_epochs=5), 1.0,
                         steps_per_epoch=1, num_epochs=25)
    assert float(sched(0)) == 0.0
    assert float(sched(2)) == pytest.approx(0.4)
    assert float(sched(5)) == pytest.approx(1.0)
    assert float(sched(25)) == pytest.approx(0.0, abs=1e-6)


def test_exponential_and_none():
    sched = get_schedule(ScheduleConfig(name="exponential", gamma=0.9), 1.0,
                         steps_per_epoch=2)
    assert float(sched(2)) == pytest.approx(0.9)
    const = get_schedule(ScheduleConfig(name="none"), 0.3, steps_per_epoch=2)
    assert const == 0.3


def test_unknown_schedule_raises():
    with pytest.raises(ValueError, match="Unknown scheduler"):
        get_schedule(ScheduleConfig(name="nope"), 1.0, steps_per_epoch=1)


def test_cosine_requires_num_epochs():
    with pytest.raises(ValueError, match="num_epochs"):
        get_schedule(ScheduleConfig(name="cosine"), 1.0, steps_per_epoch=1)


def test_random_horizontal_flip():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    flipped = random_horizontal_flip(rng, imgs, p=1.0)
    np.testing.assert_array_equal(np.asarray(flipped),
                                  np.asarray(imgs[:, :, ::-1, :]))
    same = random_horizontal_flip(rng, imgs, p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(imgs))


def test_center_crop_resize():
    imgs = jnp.ones((2, 20, 30, 3))
    out = center_crop_resize(imgs, 10)
    assert out.shape == (2, 10, 10, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)
    # already-square same-size input passes through unchanged
    sq = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(center_crop_resize(sq, 8)),
                                  np.asarray(sq))


def test_numeric_scheduler_ids_match_reference():
    """Reference SCHEDULER_DICT active keys (schedulers.py:17-31):
    1=step 2=multistep 3=customstep 4=cosine 5=none."""
    from face_recognition_models_tpu.train.schedules import SCHEDULER_DICT
    assert SCHEDULER_DICT == {1: "step", 2: "multistep", 3: "customstep",
                              4: "cosine", 5: "none"}
    # id 5 selects a constant LR, not the (name-only) exponential schedule
    sched = get_schedule(ScheduleConfig(name=5), 0.1, steps_per_epoch=10)
    assert sched == 0.1
    with pytest.raises(ValueError):
        get_schedule(ScheduleConfig(name=6), 0.1, steps_per_epoch=10)


def test_degrade_images_preserves_uint8_contract():
    """ADVICE r1 (medium): the QAFace degraded view of a uint8 batch must
    come back uint8 in [0, 255] so the train step normalizes both views
    identically (step.py normalizes only uint8 inputs)."""
    from face_recognition_models_tpu.train.loop import degrade_images
    rng = np.random.RandomState(0)
    u8 = jnp.asarray(rng.randint(0, 256, (2, 16, 16, 3), dtype=np.uint8))
    out = degrade_images(u8)
    assert out.dtype == jnp.uint8
    # degraded view is a smoothed version, not constant
    assert float(jnp.std(out.astype(jnp.float32))) > 1.0
    # float (already-normalized) batches stay float and in range
    f32 = (u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    outf = degrade_images(f32)
    assert outf.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(outf))) <= 1.0 + 1e-5
