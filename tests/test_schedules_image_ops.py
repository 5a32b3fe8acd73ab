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


def test_random_shift_crop_properties():
    """Shape preserved; pad=0 is identity; every output row/col window is
    a translate of the reflect-padded source (checked vs a numpy oracle
    at forced offsets via the same key)."""
    from face_recognition_models_tpu.ops.image_ops import random_shift_crop

    rng = jax.random.PRNGKey(3)
    imgs = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 3),
                       jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(random_shift_crop(rng, imgs, 0)), np.asarray(imgs))

    pad = 2
    out = np.asarray(random_shift_crop(rng, imgs, pad))
    assert out.shape == imgs.shape
    # each sample must equal SOME (2*pad+1)^2 window of the padded source
    padded = np.pad(np.asarray(imgs), ((0, 0), (pad, pad), (pad, pad),
                                       (0, 0)), mode="reflect")
    for i in range(imgs.shape[0]):
        windows = [padded[i, y:y + 8, x:x + 8]
                   for y in range(2 * pad + 1) for x in range(2 * pad + 1)]
        assert any(np.array_equal(out[i], w) for w in windows)
    # not all samples got the same offset (keyed per sample)
    offsets = set()
    for i in range(imgs.shape[0]):
        for k, w in enumerate([padded[i, y:y + 8, x:x + 8]
                               for y in range(5) for x in range(5)]):
            if np.array_equal(out[i], w):
                offsets.add(k)
    assert len(offsets) > 1


def test_random_color_jitter_properties():
    """strength=0 is identity; jittered images stay affine in the input:
    per-sample out = (x - mean)*c + mean + b for some (c, b)."""
    from face_recognition_models_tpu.ops.image_ops import (
        random_color_jitter)

    rng = jax.random.PRNGKey(5)
    imgs = jnp.asarray(np.random.RandomState(1).randn(3, 6, 6, 3),
                       jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(random_color_jitter(rng, imgs, 0.0)), np.asarray(imgs))

    out = np.asarray(random_color_jitter(rng, imgs, 0.4))
    x = np.asarray(imgs)
    for i in range(3):
        xc = x[i] - x[i].mean()
        # least-squares fit of out = c*xc + d must be exact
        A = np.stack([xc.ravel(), np.ones(xc.size)], axis=1)
        coef, res, *_ = np.linalg.lstsq(A, out[i].ravel(), rcond=None)
        c = coef[0]
        assert 0.6 - 1e-4 <= c <= 1.4 + 1e-4
        fit = (A @ coef).reshape(out[i].shape)
        np.testing.assert_allclose(out[i], fit, rtol=1e-4, atol=1e-5)


def test_random_erasing_properties():
    """p=0 identity; p=1 erases exactly one rectangle per sample with
    area within the configured range; erased pixels are 0."""
    from face_recognition_models_tpu.ops.image_ops import random_erasing

    rng = jax.random.PRNGKey(9)
    imgs = jnp.ones((4, 16, 16, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(random_erasing(rng, imgs, 0.0)), np.asarray(imgs))

    out = np.asarray(random_erasing(rng, imgs, 1.0,
                                    area_range=(0.1, 0.25)))
    for i in range(4):
        zero = out[i, :, :, 0] == 0
        assert zero.any()
        # the zero region is a full rectangle
        rows = np.where(zero.any(axis=1))[0]
        cols = np.where(zero.any(axis=0))[0]
        rect = np.zeros_like(zero)
        rect[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1] = True
        np.testing.assert_array_equal(zero, rect)
        # all channels erased together
        np.testing.assert_array_equal(out[i, :, :, 1] == 0, zero)
        area = zero.sum() / zero.size
        assert 0.03 <= area <= 0.35  # rounding slack around (0.1, 0.25)


def test_apply_augmentations_chain():
    """All-defaults is the identity; enabling each stage changes the
    batch; the chain is deterministic under a fixed key."""
    from face_recognition_models_tpu.ops.image_ops import (
        apply_augmentations)

    rng = jax.random.PRNGKey(11)
    imgs = jnp.asarray(np.random.RandomState(2).randn(4, 12, 12, 3),
                       jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(apply_augmentations(rng, imgs)), np.asarray(imgs))

    a = np.asarray(apply_augmentations(rng, imgs, horizontal_flip=True,
                                       crop_pad=2, color_jitter=0.3,
                                       erasing=0.5))
    b = np.asarray(apply_augmentations(rng, imgs, horizontal_flip=True,
                                       crop_pad=2, color_jitter=0.3,
                                       erasing=0.5))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, np.asarray(imgs))
