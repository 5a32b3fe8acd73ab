"""Checkpoint manager: bit-exact round trip, rotation keep-3, best/min-loss
semantics, resume modes (reference model_utils.py:43-138)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu.checkpoint import CheckpointManager
from face_recognition_models_tpu.train.state import TrainState


def _state(seed=0):
    rng = jax.random.PRNGKey(seed)
    return TrainState(
        step=jnp.int32(seed * 10),
        params={"backbone": {"w": jax.random.normal(rng, (4, 4))},
                "kernel_w": jax.random.normal(rng, (4, 8))},
        batch_stats={"bn": {"mean": jnp.zeros((4,))}},
        head_state={"t": jnp.float32(seed) },
        opt_state={"momentum": jnp.ones((4, 4)) * seed},
        rng=rng,
    )


def test_round_trip_bit_exact(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "arc")
    state = _state(3)
    mgr.save(state, epoch=1, train_loss=2.5)
    restored, start_epoch, loss = mgr.restore(state, mode="latest")
    assert start_epoch == 2
    assert loss == 2.5
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotation_keeps_three(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "arc", keep=3)
    state = _state()
    for epoch in range(1, 6):
        mgr.save(state, epoch=epoch, train_loss=1.0)
    mgr.wait_until_finished()  # the manager's file contract: drain first
    names = sorted(os.listdir(tmp_path))
    epochs = [n for n in names if n.startswith("epoch_")]
    assert epochs == ["epoch_3", "epoch_4", "epoch_5"]


@pytest.mark.parametrize("async_save", [True, False])
def test_async_and_sync_modes_round_trip(tmp_path, async_save):
    """Both checkpointer modes must round-trip bit-exactly; async save
    enqueues (background d2h + write) and any in-flight work is drained
    by restore/save/wait so rotation and resume never race."""
    mgr = CheckpointManager(str(tmp_path), "arc", async_save=async_save)
    state = _state(7)
    mgr.save(state, epoch=1, train_loss=3.0)
    # immediately overwrite-save (drains the in-flight write first)
    mgr.save(state, epoch=2, train_loss=2.0)
    restored, start_epoch, loss = mgr.restore(state, mode="latest")
    assert (start_epoch, loss) == (3, 2.0)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_resume_picks_highest_epoch(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "arc")
    for epoch in (1, 2, 3):
        mgr.save(_state(epoch), epoch=epoch, train_loss=10.0 - epoch)
    restored, start_epoch, loss = mgr.restore(_state(), mode="latest")
    assert start_epoch == 4
    assert loss == 7.0
    assert int(restored.step) == 30


def test_min_loss_resume_deletes_epochs(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "arc")
    mgr.save(_state(1), epoch=1, train_loss=5.0, is_best=True)
    mgr.save(_state(2), epoch=2, train_loss=6.0)
    mgr.save(_state(3), epoch=3, train_loss=7.0)
    restored, start_epoch, loss = mgr.restore(_state(), mode="min_loss")
    assert start_epoch == 2
    assert loss == 5.0
    assert int(restored.step) == 10
    # newer epoch checkpoints were deleted (model_utils.py:112-117)
    leftover = [n for n in os.listdir(tmp_path) if n.startswith("epoch_")]
    assert leftover == []


def test_no_checkpoint_returns_fresh(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "nothing"), "arc")
    restored, start_epoch, loss = mgr.restore(_state(), mode="latest")
    assert restored is None and start_epoch == 1 and loss == float("inf")


def test_reset_wipes(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "arc")
    mgr.save(_state(), epoch=1, train_loss=1.0)
    mgr.reset()
    assert os.listdir(tmp_path) == []


def test_final_save_restore(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "arc")
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    mgr.save_final(params)
    restored = mgr.restore_final(params)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(params["w"]))


def test_min_loss_resume_without_best_preserves_epochs(tmp_path):
    """ADVICE r1: a missing min_loss snapshot must not destroy the only
    resumable state — epoch checkpoints survive and (None, 1, inf) returns."""
    mgr = CheckpointManager(str(tmp_path), "arc")
    mgr.save(_state(2), epoch=2, train_loss=6.0)
    restored, start_epoch, loss = mgr.restore(_state(), mode="min_loss")
    assert restored is None and start_epoch == 1 and loss == float("inf")
    leftover = [n for n in os.listdir(tmp_path) if n.startswith("epoch_")]
    assert leftover == ["epoch_2"]


def test_failed_async_save_keeps_rotation_victims(tmp_path):
    """Rotation is deferred behind the async save: if the background write
    fails, the would-be victim epoch must still be on disk and the error
    must name the failed save (manager.py _drain)."""
    mgr = CheckpointManager(str(tmp_path), "arc", keep=2, async_save=True)
    state = _state()
    for epoch in (1, 2, 3):
        mgr.save(state, epoch=epoch, train_loss=1.0)
    # epoch_3 is in flight; its rotation victim (epoch_1) is pending.
    assert os.path.isdir(tmp_path / "epoch_1")
    real_wait = mgr._ckptr.wait_until_finished
    real_wait()  # let the true write land before faking the failure

    calls = {"n": 0}

    def failing_wait():
        if calls["n"] == 0:
            calls["n"] += 1
            raise OSError("disk full")
        return real_wait()

    mgr._ckptr.wait_until_finished = failing_wait
    with pytest.raises(RuntimeError, match="epoch_3"):
        mgr.save(state, epoch=4, train_loss=1.0)
    # the failure surfaced BEFORE any deletion: epoch_1 survives
    assert os.path.isdir(tmp_path / "epoch_1")
    # and the manager stays usable afterwards
    mgr.save(state, epoch=4, train_loss=1.0)
    mgr.wait_until_finished()
    epochs = sorted(n for n in os.listdir(tmp_path)
                    if n.startswith("epoch_"))
    assert "epoch_4" in epochs and len(epochs) == 2


def test_async_rotation_applies_after_drain(tmp_path):
    """Happy path of deferred rotation: victims disappear once the next
    drain confirms the save landed, leaving exactly `keep` epochs."""
    mgr = CheckpointManager(str(tmp_path), "arc", keep=2, async_save=True)
    state = _state()
    for epoch in (1, 2, 3, 4):
        mgr.save(state, epoch=epoch, train_loss=1.0)
    mgr.wait_until_finished()
    epochs = sorted(n for n in os.listdir(tmp_path)
                    if n.startswith("epoch_"))
    assert epochs == ["epoch_3", "epoch_4"]
