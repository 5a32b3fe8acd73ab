"""Checkpointing with the reference's rotation/best/resume semantics, on orbax.

Reference behavior replicated (model_utils.py:43-138, 569-581):
- rotating epoch checkpoints, keep the 3 latest (`:72-78`);
- a separate best-by-min-TRAIN-loss checkpoint (`:79-81`, `:572-575`);
- resume 'latest' picks the highest epoch (`:104-109`);
- resume 'min_loss' DELETES all epoch checkpoints first (min_loss may be
  older than the newest epoch, `:112-121`) then loads the best;
- a fresh (non-resume) run wipes the checkpoint dir (`:532-534`);
- returns (start_epoch = saved epoch + 1, train_loss) (`:133-136`).

The saved payload is the full TrainState pytree (params, batch stats, head
state incl. EMA/memories/counters, optimizer state, PRNG key, step) plus
epoch and train_loss — everything needed for bit-exact resume.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_EPOCH_RE = re.compile(r"^epoch_(\d+)$")


def _abstractify(tree: Any) -> Any:
    """ShapeDtypeStructs carrying shardings — some platforms require a
    concrete sharding for deserialization."""
    default = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def to_abstract(x):
        if not hasattr(x, "shape"):
            return x
        sharding = getattr(x, "sharding", None) or default
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    return jax.tree.map(to_abstract, tree)


class CheckpointManager:
    """async_save=True (default) makes epoch/best saves non-blocking: the
    device->host copy and disk write run on orbax's background thread
    while the next epoch trains (the reference's torch.save blocks the
    loop, model_utils.py:43-60). At most ONE save is in flight — every
    save/restore first drains the previous one, which is ~free since it
    finished during the epoch — so rotation and destructive-resume stay
    race-free. fit() drains on exit; callers driving the manager directly
    should call wait_until_finished() before relying on the files."""

    def __init__(self, directory: str, model_name: str = "model",
                 keep: int = 3, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        self.model_name = model_name
        self.keep = keep
        self.async_save = async_save
        self._ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                       if async_save else ocp.StandardCheckpointer())
        # rotation victims of the most recent async save, deleted only
        # once that save is confirmed finished — a failed background save
        # must never have already destroyed the oldest good checkpoint
        self._pending_victims: list = []
        self._inflight_label: Optional[str] = None

    def _drain(self):
        """Wait for the in-flight save; on success apply its deferred
        rotation, on failure keep the victims and name the failed save."""
        try:
            self._ckptr.wait_until_finished()
        except Exception as e:
            label, self._inflight_label = self._inflight_label, None
            self._pending_victims.clear()  # keep the old checkpoints
            if label is not None:
                raise RuntimeError(
                    f"async checkpoint save of {label!r} failed") from e
            raise
        self._inflight_label = None
        victims, self._pending_victims = self._pending_victims, []
        for path in victims:
            if os.path.isdir(path):
                shutil.rmtree(path)

    # ------------------------------------------------------------------
    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch}")

    @property
    def _best_dir(self) -> str:
        return os.path.join(self.directory, "min_loss")

    def _list_epochs(self):
        if not os.path.isdir(self.directory):
            return []
        out = []
        for name in os.listdir(self.directory):
            m = _EPOCH_RE.match(name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    # ------------------------------------------------------------------
    def reset(self):
        """Fresh-run wipe (model_utils.py:532-534)."""
        self._drain()  # never rmtree under a writer
        self._pending_victims.clear()  # everything goes anyway
        if os.path.isdir(self.directory):
            shutil.rmtree(self.directory)
        os.makedirs(self.directory, exist_ok=True)

    def _payload(self, state: Any, epoch: int, train_loss: float):
        import jax.numpy as jnp
        # float32 for the loss: x64 is disabled by default and inf must
        # round-trip, which float32 handles.
        return {"state": state,
                "epoch": jnp.asarray(epoch, jnp.int32),
                "train_loss": jnp.asarray(train_loss, jnp.float32)}

    def wait_until_finished(self):
        """Drain any in-flight async save (no-op when sync or idle);
        applies any rotation deferred behind that save."""
        self._drain()

    def save(self, state: Any, epoch: int, train_loss: float,
             is_best: bool = False):
        """Save an epoch checkpoint (rotating keep-N) or the best snapshot.

        Async mode: returns as soon as the save is enqueued; the previous
        save is drained first so the rmtree/rotation below never race a
        write (orbax finalizes into the target dir by rename, so
        _list_epochs never sees a half-written epoch either). Rotation
        victims are deleted only AFTER the next drain confirms this save
        landed — a background failure never leaves keep-1 checkpoints."""
        os.makedirs(self.directory, exist_ok=True)
        self._drain()
        target = self._best_dir if is_best else self._epoch_dir(epoch)
        if os.path.isdir(target):
            shutil.rmtree(target)
        self._ckptr.save(target, self._payload(state, epoch, train_loss))
        self._inflight_label = os.path.basename(target)
        if not self.async_save:
            self._drain()
        if not is_best:
            # the in-flight save's epoch isn't on disk yet (orbax
            # finalizes by rename) — count it explicitly so rotation
            # doesn't run one epoch behind in async mode
            epochs = sorted(set(self._list_epochs()) | {epoch})
            victims = []
            while len(epochs) > self.keep:
                victim = epochs.pop(0)
                if victim != epoch:
                    victims.append(self._epoch_dir(victim))
            if self.async_save:
                self._pending_victims.extend(victims)
            else:
                for path in victims:
                    shutil.rmtree(path)

    # ------------------------------------------------------------------
    def restore(self, abstract_state: Any, mode: str = "latest"
                ) -> Tuple[Any, int, float]:
        """Load per resume semantics. Returns (state, start_epoch, loss);
        (None, 1, inf) when nothing to restore.

        abstract_state: a pytree of ShapeDtypeStruct (or a concrete state)
        matching what was saved.
        """
        if mode not in ("latest", "min_loss"):
            raise ValueError("mode must be 'latest' or 'min_loss'")
        self._drain()  # same-process resume after async
        if not os.path.isdir(self.directory):
            return None, 1, float("inf")

        if mode == "min_loss":
            # min_loss may predate newer epoch checkpoints: delete them
            # (model_utils.py:112-117) — but only once the best snapshot is
            # confirmed to exist, so a missing best never destroys the only
            # resumable state (the reference deletes unconditionally; when
            # the snapshot exists the behavior is identical).
            if not os.path.isdir(self._best_dir):
                return None, 1, float("inf")
            for e in self._list_epochs():
                shutil.rmtree(self._epoch_dir(e))
            target = self._best_dir
        else:
            epochs = self._list_epochs()
            target = self._epoch_dir(epochs[-1]) if epochs else None

        if target is None:
            return None, 1, float("inf")

        abstract = _abstractify(abstract_state)
        payload = self._ckptr.restore(
            target, self._payload(abstract, 0, 0.0))
        epoch = int(payload["epoch"])
        loss = float(payload["train_loss"])
        return payload["state"], epoch + 1, loss

    def save_final(self, state: Any, filename: Optional[str] = None):
        """Final params-only save (model_utils.py:581). Always durable on
        return — it is the artifact eval/export read next."""
        target = os.path.join(self.directory,
                              filename or f"{self.model_name}_final")
        self._drain()
        if os.path.isdir(target):
            shutil.rmtree(target)
        self._ckptr.save(target, state)
        self._inflight_label = os.path.basename(target)
        self._drain()

    def restore_final(self, abstract_state: Any,
                      filename: Optional[str] = None):
        target = os.path.join(self.directory,
                              filename or f"{self.model_name}_final")
        self._drain()
        return self._ckptr.restore(target, _abstractify(abstract_state))


def restore_backbone(checkpoint_dir: str, abstract: Any,
                     which: str = "final",
                     model_name: Optional[str] = None) -> Any:
    """Load {'params', 'batch_stats'} of the EMBEDDING model from a train
    run's checkpoint dir, selecting the artifact like `face eval --which`:

    - 'final'     — the end-of-training backbone snapshot (*_final);
    - 'final_ema' — the model-EMA backbone (*_final_ema, saved when
      training ran with --model-ema);
    - 'best_acc'  — the best-by-verification backbone (*_best_acc, saved
      when training ran with --eval-every; evaluation/periodic.py);
    - 'min_loss'  — the backbone inside the best-by-train-loss FULL train
      state (the artifact the reference evaluates, evaluate_models.py:61).

    `abstract` is a {'params', 'batch_stats'} pytree (or ShapeDtypeStructs)
    matching the backbone. model_name defaults to the dir's basename.
    Shared by `face eval`, `face embed` and `face export`."""
    name = model_name or os.path.basename(checkpoint_dir.rstrip("/"))
    if which == "min_loss":
        best_dir = os.path.abspath(os.path.join(checkpoint_dir, "min_loss"))
        full = ocp.StandardCheckpointer().restore(best_dir)
        return {"params": full["state"]["params"]["backbone"],
                "batch_stats": full["state"]["batch_stats"]}
    mgr = CheckpointManager(checkpoint_dir, name)
    if which in ("final_ema", "best_acc"):
        return mgr.restore_final(abstract, filename=f"{name}_{which}")
    if which == "final":
        return mgr.restore_final(abstract)
    raise ValueError(
        f"which must be final, final_ema, best_acc or min_loss "
        f"(got {which!r})")
