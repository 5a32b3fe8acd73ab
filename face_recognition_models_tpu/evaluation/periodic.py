"""Periodic in-training verification evaluation.

The reference's README (README.md:112) claims training "concludes with an
evaluation", but main_pipeline never runs one (SURVEY §2.5) — evaluation
lives only in evaluate_models.py, after the fact. This module provides the
capability the reference intended, the way production face-recognition
training actually uses it (insightface evaluates verification benchmarks
every N steps during training): a `fit(hooks=...)`-compatible callback that

- preloads each benchmark's pair list + images ONCE (host RAM),
- embeds with a single jitted eval step whose params are *arguments*
  (no recompilation as weights change across epochs),
- runs the 10-fold Youden protocol (evaluation/verification.py) per
  benchmark,
- logs `val/<bench>_acc` / `val/<bench>_auc` to the experiment logger, and
- tracks the best mean verification accuracy, saving the backbone as a
  `<model>_best_acc` final-style artifact (restorable via
  `restore_backbone(..., which='best_acc')` / `face eval --which best_acc`)
  — a *validation*-gated best model, complementing the reference's
  best-by-train-loss `_min_loss` checkpoint (model_utils.py:79-81).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from face_recognition_models_tpu.evaluation.verification import (
    embed_unique_images,
    kfold_verification,
    pair_cosine_similarities,
)


class PeriodicEvalHook:
    """Epoch-end hook: verification benchmarks every `every` epochs.

    Pass the instance as `fit(..., hooks=hook)`. The final training epoch
    always evaluates (even when it is not a multiple of `every`) so the
    run ends with fresh numbers, matching the reference README's stated
    intent.

    use_ema: evaluate the model-EMA weights (state.ema_params) instead of
    the raw weights — the artifact `--model-ema` runs deploy.
    """

    def __init__(self, backbone, eval_root: str,
                 benchmarks: Sequence[str], every: int = 1,
                 image_size: int = 112, batch_size: int = 256,
                 total_epochs: Optional[int] = None,
                 logger=None, checkpoint_manager=None,
                 model_name: str = "model", use_ema: bool = False,
                 verbose: bool = True, flip: bool = False):
        import jax

        from face_recognition_models_tpu.evaluation.batch_eval import (
            load_benchmark,
        )
        from face_recognition_models_tpu.train.step import make_eval_step

        if every < 1:
            raise ValueError(f"every must be >= 1 (got {every})")
        self.every = int(every)
        self.total_epochs = total_epochs
        self.logger = logger
        self.manager = checkpoint_manager
        self.model_name = model_name
        self.use_ema = use_ema
        self.verbose = verbose
        self.flip = flip  # insightface flip-sum TTA (--eval-flip)
        self.batch_size = int(batch_size)
        self._jit_step = jax.jit(make_eval_step(backbone))

        # Preload once: {bench: (pairs [P,3] int, stack [U,H,W,3] u8,
        # id_to_row)} — directory or .bin form (batch_eval.load_benchmark).
        # Missing benchmarks warn-and-skip like the reference's
        # evaluate_models.py:73-77.
        self._data = {}
        for bench in benchmarks:
            try:
                self._data[bench] = load_benchmark(eval_root, bench,
                                                   image_size)
            except FileNotFoundError as e:
                print(f"[eval-every] skip benchmark {bench}: {e}")
                continue
        if not self._data:
            raise FileNotFoundError(
                f"no benchmarks found under {eval_root!r} "
                f"(looked for {list(benchmarks)})")

        self.best_acc = -float("inf")
        self.best_epoch = -1
        self.history: list = []  # (epoch, {bench: VerificationResult})

    def _params_of(self, state):
        if self.use_ema:
            if getattr(state, "ema_params", None) is None:
                raise ValueError(
                    "use_ema=True but the train state carries no "
                    "ema_params — pass --model-ema DECAY")
            return state.ema_params["backbone"]
        return state.params["backbone"]

    def __call__(self, epoch: int, state, train_loss: float, **_):
        last = self.total_epochs is not None and epoch >= self.total_epochs
        if epoch % self.every and not last:
            return
        params = self._params_of(state)
        stats = state.batch_stats
        embed_fn = lambda imgs: self._jit_step(params, stats, imgs)

        results = {}
        logged = {}
        for bench, (pairs, stack, id_to_row) in self._data.items():
            emb = embed_unique_images(embed_fn, stack, self.batch_size,
                                      flip=self.flip)
            sims = pair_cosine_similarities(emb, pairs, id_to_row)
            res = kfold_verification(sims, pairs[:, 2], verbose=False)
            results[bench] = res
            logged[f"val/{bench}_acc"] = res.mean_accuracy
            logged[f"val/{bench}_auc"] = res.mean_auc
            if self.verbose:
                print(f"[eval-every] epoch {epoch} {bench}: {res}")
        self.history.append((epoch, results))
        if self.logger is not None:
            self.logger.log({**logged, "epoch": epoch})

        mean_acc = float(np.mean([r.mean_accuracy
                                  for r in results.values()]))
        if mean_acc > self.best_acc:
            self.best_acc = mean_acc
            self.best_epoch = epoch
            if self.manager is not None:
                self.manager.save_final(
                    {"params": params, "batch_stats": stats},
                    filename=f"{self.model_name}_best_acc")
                if self.verbose:
                    print(f"[eval-every] new best verification "
                          f"{mean_acc:.3f}% (epoch {epoch}) — saved "
                          f"{self.model_name}_best_acc")
