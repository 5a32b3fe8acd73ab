"""The epoch driver — equivalent of the reference's main_pipeline() +
train_model() (model_utils.py:147-216, 508-591), TPU-native:

- one compiled train step reused across epochs (static shapes);
- metrics are fetched lazily: device scalars are kept as async futures and
  only synced at print_freq boundaries and epoch end, so logging never
  stalls the device (the reference syncs loss.item() every step);
- epoch-end: min-train-loss best checkpoint + rotating keep-3 epoch
  checkpoint + schedule step are identical in behavior (:569-578);
- resume {latest, min_loss} with the reference's exact semantics.
"""

from __future__ import annotations

import signal
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.checkpoint import CheckpointManager
from face_recognition_models_tpu.heads import get_head
from face_recognition_models_tpu.parallel import (
    batch_sharding,
    make_mesh,
    train_state_shardings,
)
from face_recognition_models_tpu.train.optim import get_optimizer
from face_recognition_models_tpu.train.schedules import get_schedule
from face_recognition_models_tpu.train.state import create_train_state
from face_recognition_models_tpu.train.step import (
    make_eval_step,
    make_train_step,
)
from face_recognition_models_tpu.utils.logging import (
    TRAIN_COLUMNS,
    MetricTracker,
)


@dataclass
class FitResult:
    state: Any
    backbone: Any
    head: Any
    head_cfg: Any
    min_train_loss: float
    epochs_run: int
    steps_per_sec: float
    images_per_sec: float


def degrade_images(images: jnp.ndarray) -> jnp.ndarray:
    """Quality-degraded view for QAFace's `minput` (fixes the reference's
    broken dual-input plumbing, criterion.py:1543-1552): 2x down/up bilinear
    resample on device.

    Preserves the input dtype: a uint8 batch comes back uint8 (rounded, still
    in [0, 255]) so the train step applies the exact same uint8->normalized
    transform to both views; a float batch (already normalized) stays float.
    """
    n, h, w, c = images.shape
    f32 = images.astype(jnp.float32)
    small = jax.image.resize(f32, (n, h // 2, w // 2, c), "bilinear")
    out = jax.image.resize(small, (n, h, w, c), "bilinear")
    if images.dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out


def _load_teacher(distill_cfg, feature_dim: int, image_size: int):
    """Restore a frozen teacher (module, params, batch_stats) from the orbax
    artifacts a previous `face train` run saved (checkpoint/manager.py
    restore_backbone: final / final_ema / min_loss)."""
    from face_recognition_models_tpu.checkpoint import restore_backbone
    from face_recognition_models_tpu.models import get_backbone

    module = get_backbone(distill_cfg.backbone, embed_dim=feature_dim)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    abstract = module.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           dummy, train=False)
    restored = restore_backbone(
        distill_cfg.checkpoint_dir,
        {"params": abstract["params"],
         "batch_stats": abstract.get("batch_stats", {})},
        distill_cfg.which)
    return module, restored["params"], restored["batch_stats"]


def fit(cfg: cfg_lib.TrainConfig, loader, logger=None,
        mesh=None, use_mesh: Optional[bool] = None,
        checkpoint_manager: Optional[CheckpointManager] = None,
        head_cfg=None, hooks: Optional[Callable] = None,
        warm_start=None, teacher=None) -> FitResult:
    """Train for cfg.epochs over `loader` (any object with
    steps_per_epoch() and epoch(i) -> iterator of (uint8 images, labels)).

    warm_start: optional (backbone_params, batch_stats) pytrees to
    initialize the backbone from — the in-memory fine-tune path (e.g. a
    previous FitResult's state), complementing cfg.pretrained_path which
    loads a torch state_dict from disk. The head kernel and optimizer
    state start fresh, exactly like the reference's ImageNet fine-tuning
    (backbones.py:12-26 swaps the final layer and trains everything).

    teacher: optional (backbone module, params, batch_stats) triple for
    knowledge distillation (requires cfg.distill.weight > 0) — the
    in-memory alternative to cfg.distill.checkpoint_dir. See
    config.DistillConfig and train/step.py distill_loss.
    """
    if head_cfg is None:
        head_cfg = cfg_lib.make_head_config(cfg.head,
                                            num_classes=cfg.num_classes)
    steps_per_epoch = loader.steps_per_epoch()
    if steps_per_epoch <= 0:
        raise ValueError("loader yields no full batches")

    schedule = get_schedule(cfg.schedule, cfg.optimizer.learning_rate,
                            steps_per_epoch, cfg.epochs)
    lr_for_tx = schedule if callable(schedule) else cfg.optimizer.learning_rate
    grad_accum = max(1, int(getattr(cfg, "grad_accum", 1)))
    if grad_accum > 1 and float(getattr(cfg, "partial_fc", 0.0)) > 0.0:
        raise ValueError(
            "grad_accum requires --partial-fc 0: Partial-FC's manual "
            "sampled-column update applies immediately and cannot "
            "accumulate")
    if grad_accum > 1 and callable(lr_for_tx):
        # the inner optimizer steps once per K micro-steps; keep the
        # schedule in MICRO-step domain so epoch-boundary LR drops land
        # where the loader's steps_per_epoch says they do
        inner_lr, k = lr_for_tx, grad_accum
        lr_inner = lambda c: inner_lr(c * k)
    else:
        lr_inner = lr_for_tx
    tx = get_optimizer(cfg.optimizer.name, lr_inner,
                       momentum=cfg.optimizer.momentum,
                       weight_decay=cfg.optimizer.weight_decay,
                       nesterov=cfg.optimizer.nesterov,
                       clip_grad_norm=getattr(cfg.optimizer,
                                              "clip_grad_norm", 0.0))
    if grad_accum > 1:
        import optax
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    backbone, head, state = create_train_state(cfg, head_cfg, tx)
    if warm_start is not None:
        wp, ws = warm_start
        state = state.replace(
            params={**state.params, "backbone": jax.tree.map(jnp.asarray, wp)},
            batch_stats=jax.tree.map(jnp.asarray, ws))
    ema_decay = float(getattr(cfg, "model_ema", 0.0))
    if ema_decay > 0.0:
        # seed the average at the initial weights; lives in the state
        # pytree so checkpoints/resume/shardings cover it automatically.
        # Deep copy: aliasing the live params would put the same buffer
        # twice into the donated step input.
        state = state.replace(
            ema_params=jax.tree.map(jnp.copy, state.params))

    # --- mesh / sharding ---------------------------------------------------
    if use_mesh is None:
        use_mesh = jax.device_count() > 1
    if use_mesh:
        mesh = mesh or make_mesh(cfg.mesh)

    has_dropout = cfg.backbone in ("efficientnet_b0", "mobilenet_v2")
    partial_fc = float(getattr(cfg, "partial_fc", 0.0))

    # --- knowledge distillation (beyond-reference; config.DistillConfig) ---
    distill_cfg = getattr(cfg, "distill", cfg_lib.DistillConfig())
    distill_weight = float(distill_cfg.weight)
    teacher_fn = None
    if teacher is not None and distill_weight <= 0.0:
        raise ValueError(
            "teacher provided but cfg.distill.weight == 0; set a positive "
            "--distill-weight to enable distillation")
    if distill_weight > 0.0:
        if partial_fc > 0.0:
            raise ValueError(
                "distillation requires --partial-fc 0 (the sampled-"
                "classifier step does not carry the teacher forward)")
        if teacher is None:
            if not distill_cfg.checkpoint_dir:
                raise ValueError(
                    "distill.weight > 0 needs a teacher: pass teacher="
                    "(module, params, batch_stats) or set "
                    "--distill-dir <orbax checkpoint dir>")
            teacher = _load_teacher(distill_cfg, head_cfg.feature_dim,
                                    cfg.data.image_size)
        t_module, t_params, t_stats = teacher
        t_vars = {"params": jax.tree.map(jnp.asarray, t_params),
                  "batch_stats": jax.tree.map(jnp.asarray, t_stats)}
        d_t = jax.eval_shape(
            lambda im: t_module.apply(t_vars, im, train=False),
            jax.ShapeDtypeStruct(
                (1, cfg.data.image_size, cfg.data.image_size, 3),
                jnp.float32)).shape[-1]
        if d_t != head_cfg.feature_dim:
            raise ValueError(
                f"teacher embedding dim {d_t} != student feature dim "
                f"{head_cfg.feature_dim}; distill_loss needs matching "
                "embedding spaces")
        # frozen teacher in eval mode (running BN statistics); closed-over
        # constants replicate under the mesh, the batch stays DP-sharded
        teacher_fn = lambda images: t_module.apply(t_vars, images,
                                                   train=False)
    if bool(getattr(cfg, "freeze_backbone", False)):
        if partial_fc > 0.0:
            raise ValueError(
                "freeze_backbone is not supported with partial_fc (the "
                "sampled-column step has no frozen-trunk path yet); "
                "use --partial-fc 0 or --no freeze")
        if teacher_fn is not None:
            raise ValueError(
                "freeze_backbone with distillation is contradictory: "
                "the KD loss only reaches the (frozen) trunk")
    if partial_fc > 0.0:
        from face_recognition_models_tpu.train.partial_fc import (
            init_partial_fc_opt_state,
            make_partial_fc_train_step,
            num_sampled_classes,
        )
        if cfg.optimizer.name != "sgd":
            # the manual sampled-column update implements torch-SGD
            # momentum/wd semantics only; any other optimizer would
            # silently train the head with SGD while the backbone uses
            # the configured rule
            raise ValueError(
                f"partial_fc requires optimizer 'sgd' (got "
                f"'{cfg.optimizer.name}'): the sampled classifier columns "
                "are updated by a manual torch-SGD rule (train/partial_fc"
                ".py); use --partial-fc 0 or --optimizer sgd")
        if float(getattr(cfg.optimizer, "clip_grad_norm", 0.0)) > 0.0:
            # the manual sampled-column update bypasses the optax chain,
            # so the head would train unclipped while the backbone clips
            raise ValueError(
                "clip_grad_norm is not supported with partial_fc (the "
                "sampled classifier columns bypass the optax chain); "
                "use --clip-grad-norm 0 or --partial-fc 0")
        n_sampled = num_sampled_classes(head_cfg.num_classes, partial_fc,
                                        cfg.batch_size)
        # on the class-sharded path each shard samples within its LOCAL
        # class range, so the dense-fallback check must also hold per shard
        mp = mesh.shape.get("model", 1) if (use_mesh and mesh is not None) \
            else 1
        c_min = head_cfg.num_classes // max(mp, 1)
        n_sampled_min = num_sampled_classes(c_min, partial_fc,
                                            cfg.batch_size)
        if cfg.batch_size >= c_min or n_sampled_min >= c_min:
            # sampling can't beat dense when the sample must cover (almost)
            # every class; fall back rather than erroring on small C
            print(f"[partial_fc] C={head_cfg.num_classes} (per-shard "
                  f"{c_min}) too small for batch {cfg.batch_size} / ratio "
                  f"{partial_fc} — using the dense path")
            partial_fc = 0.0
    if partial_fc > 0.0:
        state = state.replace(
            opt_state=init_partial_fc_opt_state(tx, state.params))
        common = dict(
            learning_rate=lr_for_tx,
            momentum=cfg.optimizer.momentum,
            weight_decay=cfg.optimizer.weight_decay,
            nesterov=cfg.optimizer.nesterov,
            lambda_g=cfg.lambda_g, has_dropout=has_dropout,
            mean=cfg.data.mean, std=cfg.data.std,
            horizontal_flip=cfg.data.horizontal_flip,
            crop_pad=cfg.data.crop_pad,
            color_jitter=cfg.data.color_jitter,
            random_erasing=cfg.data.random_erasing,
            logq_correction=getattr(cfg, "partial_fc_logq", True))
        if use_mesh and mesh.shape.get("model", 1) > 1:
            # kernel + momentum shard over 'model'; each shard samples its
            # local class range (the original Partial FC architecture)
            from face_recognition_models_tpu.train.partial_fc_sharded \
                import make_sharded_partial_fc_train_step
            mp = mesh.shape["model"]
            n_local = num_sampled_classes(
                head_cfg.num_classes // mp, partial_fc, cfg.batch_size)
            step_fn = make_sharded_partial_fc_train_step(
                backbone, head_cfg, tx, n_local, mesh=mesh, **common)
        else:
            step_fn = make_partial_fc_train_step(
                backbone, head, head_cfg, tx, n_sampled, **common)
    else:
        step_fn = make_train_step(
            backbone, head, head_cfg, tx, lambda_g=cfg.lambda_g,
            lr_schedule=schedule if callable(schedule) else None,
            has_dropout=has_dropout, mean=cfg.data.mean, std=cfg.data.std,
            horizontal_flip=cfg.data.horizontal_flip,
            crop_pad=cfg.data.crop_pad,
            color_jitter=cfg.data.color_jitter,
            random_erasing=cfg.data.random_erasing,
            use_fused_head=cfg.use_pallas_head,
            mesh=mesh if use_mesh else None,
            teacher_fn=teacher_fn, distill_weight=distill_weight,
            distill_mode=distill_cfg.mode,
            freeze_backbone=bool(getattr(cfg, "freeze_backbone", False)))

    if ema_decay > 0.0:
        # per-step EMA fused into the step's own dispatch (the lerp is one
        # pass over the param tree — ~0.4 ms/step HBM on ResNet-50/fp32,
        # amortized further under scan_steps)
        base_step_fn = step_fn

        def step_fn(st, *a):
            st2, m = base_step_fn(st, *a)
            if grad_accum > 1:
                # Params only move on MultiSteps' k-th micro-step (both
                # counters start at 0 and checkpoint together in state);
                # lerping every micro-step would compound the decay
                # k-fold and silently shrink the averaging window.
                decay_t = jnp.where((st2.step % grad_accum) == 0,
                                    ema_decay, 1.0)
            else:
                decay_t = ema_decay
            new_ema = jax.tree.map(
                lambda e, p: (e * decay_t
                              + p.astype(e.dtype) * (1.0 - decay_t)),
                st2.ema_params, st2.params)
            return st2.replace(ema_params=new_ema), m

    scan_k = max(1, int(getattr(cfg, "scan_steps", 1)))

    def chunk_fn(state, images_k, labels_k):
        """`scan_k` train steps in ONE dispatch: lax.scan over stacked
        batches [K, N, ...]; the QAFace degraded view is built on device
        inside the scan body."""
        def body(st, batch):
            im, lb = batch
            if head.requires_minput:
                return step_fn(st, im, lb, degrade_images(im))
            return step_fn(st, im, lb)
        return jax.lax.scan(body, state, (images_k, labels_k))

    if use_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shardings = train_state_shardings(mesh, state, head_cfg.num_classes)
        data_s = batch_sharding(mesh)
        chunk_s = NamedSharding(mesh, P(None, "data"))
        state = jax.device_put(state, shardings)
        in_shardings = (shardings, data_s, data_s)
        if head.requires_minput:
            in_shardings = in_shardings + (data_s,)
            jit_step = jax.jit(
                lambda s, im, lb, mi: step_fn(s, im, lb, mi),
                in_shardings=in_shardings,
                out_shardings=(shardings, None), donate_argnums=(0,))
        else:
            jit_step = jax.jit(lambda s, im, lb: step_fn(s, im, lb),
                               in_shardings=in_shardings,
                               out_shardings=(shardings, None),
                               donate_argnums=(0,))
        jit_chunk = jax.jit(chunk_fn,
                            in_shardings=(shardings, chunk_s, chunk_s),
                            out_shardings=(shardings, None),
                            donate_argnums=(0,))
        n_proc = jax.process_count()
        if n_proc > 1:
            # Multihost: each process holds its LOCAL data shard (the
            # Loader's shard=(rank, count) slice); assemble the global
            # batch from per-process shards. cfg.batch_size is the GLOBAL
            # batch — callers feed batch_size // process_count per host.
            def put(x):
                gshape = (x.shape[0] * n_proc,) + x.shape[1:]
                return jax.make_array_from_process_local_data(
                    data_s, x, gshape)

            def put_chunk(x):
                gshape = (x.shape[0], x.shape[1] * n_proc) + x.shape[2:]
                return jax.make_array_from_process_local_data(
                    chunk_s, x, gshape)
        else:
            put = lambda x: jax.device_put(x, data_s)
            put_chunk = lambda x: jax.device_put(x, chunk_s)
    else:
        if head.requires_minput:
            jit_step = jax.jit(lambda s, im, lb, mi: step_fn(s, im, lb, mi),
                               donate_argnums=(0,))
        else:
            jit_step = jax.jit(lambda s, im, lb: step_fn(s, im, lb),
                               donate_argnums=(0,))
        jit_chunk = jax.jit(chunk_fn, donate_argnums=(0,))
        put = jax.device_put
        put_chunk = jax.device_put

    # --- resume ------------------------------------------------------------
    min_train_loss = float("inf")
    start_epoch = 1
    if checkpoint_manager is not None:
        if cfg.continue_train is None:
            checkpoint_manager.reset()
        else:
            restored, start_epoch, loss = checkpoint_manager.restore(
                state, mode=cfg.continue_train)
            if restored is not None:
                state = restored
                if use_mesh:
                    state = jax.device_put(state, shardings)
                min_train_loss = loss if np.isfinite(loss) else float("inf")
                print(f"### Resuming from epoch {start_epoch - 1} "
                      f"(train_loss={loss:.6f}) ###")

    # --- preemption-aware save (SURVEY §5.3): on SIGTERM/SIGINT finish the
    # current step, checkpoint, then exit — resume picks up from here ------
    preempted = {"flag": False}
    prev_handlers = {}

    def _on_signal(signum, frame):
        preempted["flag"] = True

    if checkpoint_manager is not None:
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # not the main thread
                break

    # --- epoch loop --------------------------------------------------------
    total_images = 0
    t_train_start = time.time()
    global_step = (start_epoch - 1) * steps_per_epoch
    for epoch in range(start_epoch, cfg.epochs + start_epoch):
        tracker = MetricTracker(
            steps_per_epoch, TRAIN_COLUMNS,
            prefix=f"Epoch: [{epoch}/{cfg.epochs + start_epoch - 1}]")

        losses = []  # per-step device scalars and [K] chunk vectors
        end = time.time()
        i = 0  # steps completed this epoch
        buf_im, buf_lb = [], []

        def handle_step(metrics, n_steps, bsz, data_t, step_t):
            nonlocal i, global_step, total_images
            first = i
            i += n_steps
            global_step += n_steps
            total_images += bsz * n_steps
            if preempted["flag"]:
                if checkpoint_manager is not None:
                    partial = float(np.mean(np.concatenate(
                        [np.atleast_1d(np.asarray(x, np.float32))
                         for x in losses])))
                    checkpoint_manager.save(state, epoch - 1, partial)
                    # drain BEFORE claiming success: the async write is
                    # still in flight and a failure only surfaces on the
                    # next wait — which would never come after SystemExit
                    checkpoint_manager.wait_until_finished()
                    print(f"### Preemption: saved checkpoint at epoch "
                          f"{epoch - 1} step {i} — resume with "
                          f"continue_train='latest' ###")
                raise SystemExit(143)
            if first % cfg.print_freq < n_steps:
                # sync point: materialize the latest step's metrics
                m = {k: float(np.asarray(v).reshape(-1)[-1])
                     for k, v in metrics.items()}
                tracker.observe({"batch_time": step_t / n_steps,
                                 "data_time": data_t / n_steps,
                                 "throughput": bsz * n_steps
                                 / max(step_t, 1e-9)})
                tracker.observe(m, weight=bsz)
                print(tracker.line(i - 1))
                if logger is not None:
                    logger.log({**m, "epoch": epoch}, step=global_step)

        def run_single(images, labels):
            nonlocal state
            batch = (put(images), put(labels))
            if head.requires_minput:
                minput = degrade_images(batch[0])
                state, metrics = jit_step(state, batch[0], batch[1], minput)
            else:
                state, metrics = jit_step(state, batch[0], batch[1])
            losses.append(metrics["loss"])  # async device scalar
            return metrics

        for images, labels in loader.epoch(epoch):
            if scan_k > 1:
                buf_im.append(images)
                buf_lb.append(labels)
                if len(buf_im) < scan_k:
                    continue
                data_t = time.time() - end
                im_k = put_chunk(np.stack(buf_im))
                lb_k = put_chunk(np.stack(buf_lb))
                buf_im.clear()
                buf_lb.clear()
                state, metrics_k = jit_chunk(state, im_k, lb_k)
                losses.append(metrics_k["loss"])  # [K] device vector
                step_t = time.time() - end
                end = time.time()
                handle_step(metrics_k, scan_k, len(images), data_t, step_t)
            else:
                data_t = time.time() - end
                metrics = run_single(images, labels)
                step_t = time.time() - end
                end = time.time()
                handle_step(metrics, 1, len(images), data_t, step_t)

        # leftover batches that didn't fill a scan chunk run singly
        for images, labels in zip(buf_im, buf_lb):
            data_t = time.time() - end
            metrics = run_single(images, labels)
            step_t = time.time() - end
            end = time.time()
            handle_step(metrics, 1, len(images), data_t, step_t)
        buf_im, buf_lb = [], []

        train_loss = float(np.mean(np.concatenate(
            [np.atleast_1d(np.asarray(x, np.float32)) for x in losses])))

        if checkpoint_manager is not None:
            if train_loss < min_train_loss:
                min_train_loss = train_loss
                checkpoint_manager.save(state, epoch, train_loss,
                                        is_best=True)
                print(f"New best model saved: {train_loss:.6f}")
            checkpoint_manager.save(state, epoch, train_loss)
        else:
            min_train_loss = min(min_train_loss, train_loss)

        if hooks is not None:
            hooks(epoch=epoch, state=state, train_loss=train_loss)

    for sig, handler in prev_handlers.items():
        signal.signal(sig, handler)
    if checkpoint_manager is not None:
        # drain the last async epoch save before callers read the files
        checkpoint_manager.wait_until_finished()

    wall = time.time() - t_train_start
    steps_run = global_step - (start_epoch - 1) * steps_per_epoch
    return FitResult(
        state=state, backbone=backbone, head=head, head_cfg=head_cfg,
        min_train_loss=min_train_loss, epochs_run=cfg.epochs,
        steps_per_sec=steps_run / max(wall, 1e-9),
        images_per_sec=total_images / max(wall, 1e-9),
    )
