"""Single CLI entry point: `face <subcommand>`.

Collapses the reference's per-model entry scripts (main_code/arcface.py,
cosface.py, ... + run.sh) into `face train --head <name>`, its
evaluate_models.py into `face eval`, and preprocess.py into
`face preprocess`. Flag names/defaults mirror the reference's argparse
(model_utils.py:476-506) where they exist.
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys
import time

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads.base import available_heads
from face_recognition_models_tpu.models.backbones import BACKBONES


def _add_train_parser(sub):
    p = sub.add_parser("train", help="train a margin-head model")
    p.add_argument("--head", default="arcface", choices=available_heads()
                   + ["mv_softmax_arc"],
                   help="margin head (mv_softmax_arc = MV with arc margin)")
    p.add_argument("--head-arg", action="append", default=[], metavar="K=V",
                   help="override one head hyperparameter (repeatable), "
                        "e.g. --head combined_margin --head-arg m2=0.3 "
                        "--head-arg m3=0.2, or --head subcenter_arcface "
                        "--head-arg k=3; values take the config field's "
                        "type (config.py HEAD_CONFIGS)")
    p.add_argument("--backbone", "-bb", default="resnet18",
                   choices=sorted(BACKBONES))
    p.add_argument("--batch_size", "-bs", type=int, default=512)
    p.add_argument("--epochs", "-e", type=int, default=30)
    p.add_argument("--learning_rate", "-lr", type=float, default=0.1)
    # the reference ships optimizer/scheduler factories (optimizers.py:3-71,
    # schedulers.py:3-104) but hardcodes SGD+customstep in the pipeline
    # (model_utils.py:556-558); here both factories are CLI-addressable.
    p.add_argument("--optimizer", default="sgd",
                   help="optimizer name (train/optim.py factory: sgd, adam, "
                        "adamw, rmsprop, adagrad, nadam, adamax, lion). "
                        "ViT trunks usually want adamw + warmup_cosine.")
    p.add_argument("--weight-decay", type=float, default=5e-4,
                   help="weight decay (reference model_utils.py:557)")
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--nesterov", action="store_true")
    p.add_argument("--clip-grad-norm", type=float, default=0.0,
                   help="clip gradients to this global norm before the "
                        "update (0 = off; beyond-reference, torch "
                        "clip_grad_norm_ placement)")
    p.add_argument("--freeze-backbone", action="store_true",
                   help="train the margin head only (linear probe): "
                        "backbone runs frozen in eval mode under "
                        "stop_gradient (XLA prunes its backward); pair "
                        "with --pretrained")
    p.add_argument("--scheduler", default="customstep",
                   help="LR schedule (train/schedules.py: customstep, step, "
                        "multistep, cosine, exponential, warmup_cosine, "
                        "none)")
    p.add_argument("--lr-steps", default="20,40,60",
                   help="customstep drop epochs (reference schedulers.py:22)")
    p.add_argument("--warmup-epochs", type=int, default=5,
                   help="warmup length for --scheduler warmup_cosine")
    p.add_argument("--flip", action="store_true",
                   help="random horizontal flip (on-device; the reference "
                        "ships this commented out, model_utils.py:540)")
    p.add_argument("--crop-pad", type=int, default=0,
                   help="on-device random shift-crop: reflect-pad by N "
                        "pixels, crop back at a random offset")
    p.add_argument("--color-jitter", type=float, default=0.0,
                   help="on-device brightness/contrast jitter strength")
    p.add_argument("--random-erasing", type=float, default=0.0,
                   help="on-device Random Erasing probability per sample")
    p.add_argument("--lambda_g", type=float, default=0.0,
                   help="Magnitude loss weight (MagFace)")
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--continue_train", choices=["min_loss", "latest"],
                   help="resume from best or latest checkpoint")
    p.add_argument("--pretrained", default=None, metavar="STATE_DICT.pth",
                   help="torch backbone state_dict to initialize from "
                        "(the reference trains from ImageNet-pretrained "
                        "torchvision weights; resnet18/resnet50/"
                        "efficientnet_b0/mobilenet_v2)")
    p.add_argument("--dataset-path", default=os.environ.get("DATASET_PATH", ""),
                   help="identity tree root, a `face pack` dir, or an "
                        "insightface RecordIO set (train.rec/.idx: pass "
                        "the .rec/.idx path, their prefix, or a dir "
                        "holding train.rec)")
    p.add_argument("--working-path", default=os.environ.get("WORKING_PATH",
                                                            "./working"))
    p.add_argument("--model-save-path", default=None,
                   help="checkpoint dir (default <working>/checkpoints/<name>)")
    p.add_argument("--wandb-project", default="face-recognition-training")
    p.add_argument("--num-classes", type=int,
                   default=cfg_lib.CASIA_NUM_CLASSES)
    p.add_argument("--mesh-data", type=int, default=-1)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--head-path", choices=["auto", "fused", "jnp"],
                   default="auto",
                   help="margin+CE implementation: 'fused' forces the "
                        "Pallas kernel (TPU; 9 heads), 'jnp' forces XLA, "
                        "'auto' (default) picks per head/class-count from "
                        "the measured win table")
    p.add_argument("--use-pallas-head", action="store_true",
                   help="deprecated alias for --head-path fused")
    p.add_argument("--bn-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="BatchNorm normalize/affine compute dtype (batch "
                   "statistics always reduce in fp32); bfloat16 is ~12 ms "
                   "faster per b512 ResNet-50 step, same quality (PERF.md)")
    p.add_argument("--scan-steps", type=int, default=1,
                   help="run K train steps per dispatch via lax.scan "
                        "(amortizes host/tunnel latency; 1 = off)")
    p.add_argument("--partial-fc", type=float, default=0.0, metavar="RATIO",
                   help="Partial-FC sampled classifier: run each step's "
                        "softmax over the batch positives + RATIO*C "
                        "sampled negatives (insightface large-C recipe; "
                        "0 = dense; unsupported for vpl_arcface/qaface)")
    p.add_argument("--grad-accum", type=int, default=1, metavar="K",
                   help="average gradients over K micro-batches per "
                        "optimizer step (effective batch K*batch_size at "
                        "batch_size memory; 1 = off)")
    p.add_argument("--model-ema", type=float, default=0.0, metavar="DECAY",
                   help="exponential moving average of the weights "
                        "(0 = off; typical 0.999-0.9999). The averaged "
                        "backbone is saved as <model>_final_ema and used "
                        "for --eval-after")
    p.add_argument("--distill-dir", default="", metavar="CKPT_DIR",
                   help="knowledge distillation: orbax checkpoint dir of a "
                        "trained teacher (a previous `face train` "
                        "working_path/model dir); requires --distill-weight")
    p.add_argument("--distill-backbone", default="resnet50",
                   help="teacher trunk name (default resnet50)")
    p.add_argument("--distill-weight", type=float, default=0.0,
                   metavar="W", help="weight on the embedding-matching "
                        "loss (0 = off)")
    p.add_argument("--distill-mode", choices=["cosine", "mse"],
                   default="cosine",
                   help="cosine: 1-cos on L2-normalized embeddings; mse: "
                        "squared L2 on raw embeddings (transfers norms)")
    p.add_argument("--distill-which",
                   choices=["final", "final_ema", "min_loss", "best_acc"],
                   default="final", help="which teacher artifact to load")
    p.add_argument("--eval-after", action="store_true",
                   help="run benchmark verification after training (the "
                        "reference README claims this but never does it)")
    p.add_argument("--eval-every", type=int, default=0, metavar="N",
                   help="run benchmark verification every N epochs DURING "
                        "training (0 = off; needs --eval-data-path); logs "
                        "val/<bench>_acc and saves the best-by-verification "
                        "backbone as <model>_best_acc")
    p.add_argument("--eval-data-path", default="",
                   help="benchmark root for --eval-after / --eval-every")
    p.add_argument("--eval-flip", action="store_true",
                   help="flip-sum TTA for --eval-after/--eval-every "
                        "embeddings (insightface published-number "
                        "convention)")
    p.add_argument("--benchmarks", default=",".join(cfg_lib.EVAL_BENCHMARKS))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--synthetic", action="store_true",
                   help="train on a synthetic identity set (smoke runs)")
    p.add_argument("--synthetic-classes", type=int, default=64)
    p.add_argument("--synthetic-per-class", type=int, default=32)
    p.add_argument("--image-size", type=int, default=cfg_lib.IMAGE_SIZE)
    return p


def cmd_train(args) -> int:
    import numpy as np

    head = args.head
    head_kw = {}
    if head == "mv_softmax_arc":
        head, head_kw = "mv_softmax", {"margin_type": "arc"}
    model_name = f"{head}{'_arc' if head_kw else ''}"
    head_kw.update(cfg_lib.parse_head_overrides(head, args.head_arg))
    cfg = cfg_lib.TrainConfig(
        backbone=args.backbone, head=head, num_classes=args.num_classes,
        batch_size=args.batch_size, epochs=args.epochs,
        lambda_g=args.lambda_g, print_freq=args.print_freq,
        seed=args.seed, working_path=args.working_path,
        model_name=model_name, continue_train=args.continue_train,
        pretrained_path=args.pretrained,
        use_pallas_head=(True if args.use_pallas_head
                         else {"auto": "auto", "fused": True,
                               "jnp": False}[args.head_path]),
        scan_steps=args.scan_steps,
        partial_fc=args.partial_fc,
        grad_accum=args.grad_accum,
        model_ema=args.model_ema,
        freeze_backbone=args.freeze_backbone,
        bn_dtype=args.bn_dtype,
        optimizer=cfg_lib.OptimizerConfig(
            name=args.optimizer, learning_rate=args.learning_rate,
            momentum=args.momentum, weight_decay=args.weight_decay,
            nesterov=args.nesterov, clip_grad_norm=args.clip_grad_norm),
        schedule=cfg_lib.ScheduleConfig(
            name=args.scheduler,
            steps=tuple(int(s) for s in args.lr_steps.split(",") if s),
            warmup_epochs=args.warmup_epochs),
        distill=cfg_lib.DistillConfig(
            backbone=args.distill_backbone,
            checkpoint_dir=args.distill_dir,
            which=args.distill_which,
            weight=args.distill_weight,
            mode=args.distill_mode),
        mesh=cfg_lib.MeshConfig(data=args.mesh_data, model=args.mesh_model),
        data=cfg_lib.DataConfig(dataset_path=args.dataset_path,
                                image_size=args.image_size,
                                num_workers=args.num_workers,
                                horizontal_flip=args.flip,
                                crop_pad=args.crop_pad,
                                color_jitter=args.color_jitter,
                                random_erasing=args.random_erasing),
    )

    # --- data ---
    if args.synthetic:
        from face_recognition_models_tpu.data.pipeline import ArrayLoader
        from face_recognition_models_tpu.data.synthetic import (
            synthetic_identities)
        cfg = cfg_lib.TrainConfig(**{
            **cfg.__dict__, "num_classes": args.synthetic_classes})
        images, labels = synthetic_identities(
            args.synthetic_classes, args.synthetic_per_class,
            image_size=args.image_size, seed=cfg.seed)
        loader = ArrayLoader(images, labels, batch_size=cfg.batch_size,
                             seed=cfg.seed)
    else:
        from face_recognition_models_tpu.data import ImageFolderIndex, Loader
        from face_recognition_models_tpu.data.packed import (
            PackedDataset, PackedLoader, is_packed_dir)
        if not args.dataset_path:
            print("error: --dataset-path required (or --synthetic)",
                  file=sys.stderr)
            return 2
        import jax
        # --multihost: cfg.batch_size is the GLOBAL batch; each host loads
        # its 1/P slice of every epoch and fit() assembles global arrays.
        n_proc = jax.process_count()
        shard = (jax.process_index(), n_proc) if n_proc > 1 else None
        if cfg.batch_size % n_proc:
            print(f"error: batch_size {cfg.batch_size} must divide across "
                  f"{n_proc} hosts", file=sys.stderr)
            return 2
        from face_recognition_models_tpu.data.recordio import (
            RecLoader, RecordIODataset, is_recordio)
        if is_recordio(args.dataset_path):
            # insightface-ecosystem train.rec/train.idx (data/recordio.py)
            rec = RecordIODataset.open(args.dataset_path)
            if rec.num_identities > args.num_classes:
                print(f"error: rec has {rec.num_identities} identities "
                      f"> --num-classes {args.num_classes}", file=sys.stderr)
                return 2
            loader = RecLoader(rec, batch_size=cfg.batch_size // n_proc,
                               image_size=cfg.data.image_size,
                               num_workers=cfg.data.num_workers,
                               seed=cfg.seed, shard=shard)
        elif is_packed_dir(args.dataset_path):
            # pre-decoded pack from `face pack`: no JPEG work on the host
            packed = PackedDataset.open(args.dataset_path)
            if packed.num_identities > args.num_classes:
                print(f"error: pack has {packed.num_identities} identities "
                      f"> --num-classes {args.num_classes}", file=sys.stderr)
                return 2
            if packed.image_size != cfg.data.image_size:
                print(f"[pack] image size {packed.image_size} overrides "
                      f"--image-size {cfg.data.image_size}")
                cfg = cfg_lib.TrainConfig(**{
                    **cfg.__dict__,
                    "data": cfg_lib.DataConfig(**{
                        **cfg.data.__dict__,
                        "image_size": packed.image_size})})
            loader = PackedLoader(packed,
                                  batch_size=cfg.batch_size // n_proc,
                                  seed=cfg.seed, shard=shard)
        else:
            root = os.path.join(args.dataset_path, "CASIA-WebFace")
            parts = []
            for split in ("train", "valid"):  # ConcatDataset (model_utils:549-551)
                try:
                    parts.append(ImageFolderIndex.build(root, split=split))
                except FileNotFoundError:
                    pass
            if not parts:
                parts = [ImageFolderIndex.build(root)]
            index = (parts[0] if len(parts) == 1
                     else ImageFolderIndex.concat(parts))
            loader = Loader(index, batch_size=cfg.batch_size // n_proc,
                            image_size=cfg.data.image_size,
                            num_workers=cfg.data.num_workers, seed=cfg.seed,
                            shard=shard)

    # --- logging: console + log/<model>.txt tee (arcface.py:14-18) ---
    from face_recognition_models_tpu.checkpoint import CheckpointManager
    from face_recognition_models_tpu.train.loop import fit
    from face_recognition_models_tpu.utils import ExperimentLogger, Tee

    os.makedirs(os.path.join(args.working_path, "log"), exist_ok=True)
    log_path = os.path.join(args.working_path, "log", f"{model_name}.txt")
    ckpt_dir = args.model_save_path or os.path.join(
        args.working_path, "checkpoints", model_name)
    head_cfg = cfg_lib.make_head_config(head, num_classes=cfg.num_classes,
                                        **head_kw)

    with open(log_path, "a") as logfile, \
            contextlib.redirect_stdout(Tee(sys.stdout, logfile)):
        print(f"Training {model_name} ({args.backbone}) — "
              f"batch {cfg.batch_size}, epochs {cfg.epochs}, "
              f"lr {args.learning_rate}")
        logger = ExperimentLogger(
            args.wandb_project, model_name,
            config=vars(args),
            log_dir=os.path.join(args.working_path, "log"))
        mgr = CheckpointManager(ckpt_dir, model_name,
                                keep=cfg.keep_checkpoints)
        eval_hook = None
        if args.eval_every > 0:
            if not args.eval_data_path:
                print("--eval-every: no --eval-data-path given, skipping")
            else:
                import jax.numpy as jnp

                from face_recognition_models_tpu.evaluation.periodic import (
                    PeriodicEvalHook)
                from face_recognition_models_tpu.models import get_backbone
                # mirror create_train_state's module config so the live
                # param pytree applies cleanly
                eval_hook = PeriodicEvalHook(
                    get_backbone(cfg.backbone,
                                 embed_dim=head_cfg.feature_dim,
                                 dtype=jnp.dtype(cfg.compute_dtype),
                                 bn_dtype=jnp.dtype(cfg.bn_dtype)),
                    args.eval_data_path, args.benchmarks.split(","),
                    every=args.eval_every, image_size=cfg.data.image_size,
                    total_epochs=cfg.epochs, logger=logger,
                    checkpoint_manager=mgr, model_name=model_name,
                    use_ema=cfg.model_ema > 0.0, flip=args.eval_flip)
        t0 = time.time()
        result = fit(cfg, loader, logger=logger, checkpoint_manager=mgr,
                     head_cfg=head_cfg, hooks=eval_hook)
        if eval_hook is not None and eval_hook.best_epoch > 0:
            print(f"Best verification {eval_hook.best_acc:.3f}% at epoch "
                  f"{eval_hook.best_epoch} (saved {model_name}_best_acc)")
        # final artifact = the embedding model (backbone params + BN stats);
        # the full train state (incl. head kernel/state) lives in the
        # epoch/min_loss checkpoints.
        mgr.save_final({"params": result.state.params["backbone"],
                        "batch_stats": result.state.batch_stats})
        eval_params = result.state.params["backbone"]
        if result.state.ema_params is not None:
            # the averaged weights are the production artifact; keep the
            # raw-final default untouched so export stays which-agnostic
            eval_params = result.state.ema_params["backbone"]
            mgr.save_final({"params": eval_params,
                            "batch_stats": result.state.batch_stats},
                           filename=f"{model_name}_final_ema")
        # upload/record the checkpoint artifacts (the reference's
        # end-of-training wandb.save, model_utils.py:581-582)
        for artifact in (f"{model_name}_final", f"{model_name}_final_ema",
                         f"{model_name}_best_acc", "min_loss"):
            apath = os.path.join(mgr.directory, artifact)
            if os.path.isdir(apath):
                logger.save_artifact(apath)
        logger.finish()
        print(f"Done in {time.time() - t0:.0f}s — min train loss "
              f"{result.min_train_loss:.6f}, "
              f"{result.images_per_sec:.0f} img/s")

        if args.eval_after:
            if not args.eval_data_path:
                print("--eval-after: no --eval-data-path given, skipping")
            else:
                import jax

                from face_recognition_models_tpu.evaluation.batch_eval import (
                    evaluate_model_on_benchmark, make_embed_fn)
                mesh = None
                if jax.device_count() > 1:
                    from face_recognition_models_tpu.parallel import make_mesh
                    mesh = make_mesh(cfg_lib.MeshConfig(
                        data=jax.device_count(), model=1))
                embed = make_embed_fn(result.backbone, eval_params,
                                      result.state.batch_stats, mesh=mesh)
                for bench in args.benchmarks.split(","):
                    try:
                        res = evaluate_model_on_benchmark(
                            embed, args.eval_data_path, bench,
                            cfg.data.image_size, verbose=False,
                            flip=args.eval_flip)
                        print(f"[eval-after] {model_name} on {bench}: {res}")
                    except FileNotFoundError as e:
                        print(f"[eval-after] skip {bench}: {e}")
    return 0


def _add_eval_parser(sub):
    p = sub.add_parser("eval", help="10-fold verification over benchmarks")
    p.add_argument("--checkpoint-dir", required=True,
                   help="dir containing <model>/min_loss orbax checkpoints, "
                        "or a single checkpoint dir with --head")
    p.add_argument("--head", default=None,
                   help="evaluate one model (else all found)")
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--embed-dim", type=int, default=512,
                   help="backbone embedding width (128 for `face facenet` "
                        "artifacts)")
    p.add_argument("--eval-data-path", required=True,
                   help="dir with <benchmark>/{pair.list,imgs} or "
                        "insightface-format <benchmark>.bin files")
    p.add_argument("--benchmarks", default=",".join(cfg_lib.EVAL_BENCHMARKS))
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--num-classes", type=int,
                   default=cfg_lib.CASIA_NUM_CLASSES)
    p.add_argument("--output-dir", default="evaluation_results")
    p.add_argument("--image-size", type=int, default=cfg_lib.IMAGE_SIZE)
    p.add_argument("--which", choices=["final", "min_loss", "final_ema", "best_acc"],
                   default="final",
                   help="which checkpoint to evaluate (the reference "
                        "evaluates min_loss)")
    p.add_argument("--standard-protocol", action="store_true",
                   help="use the CLASSIC LFW protocol (sequential folds, "
                        "accuracy-max grid threshold tuned on 9 folds, "
                        "tested on 1 — insightface semantics) instead of "
                        "the reference's inverted protocol; add "
                        "--eval-flip to match published insightface "
                        "numbers exactly (they also flip-sum embeddings)")
    p.add_argument("--device-protocol", action="store_true",
                   help="run the 10-fold protocol fully vectorized on "
                        "device instead of the sklearn host path")
    p.add_argument("--eval-flip", action="store_true",
                   help="flip-sum TTA: sum each image's and its horizontal "
                        "flip's raw embeddings before normalizing (the "
                        "insightface/facenet published-number convention; "
                        "2x embedding cost)")
    p.add_argument("--tpr-far", default="",
                   help="comma-separated FAR operating points (e.g. "
                        "'1e-2,1e-3') to additionally report TPR@FAR per "
                        "benchmark (beyond-reference; evaluation/openset.py)")
    return p


def cmd_eval(args) -> int:
    from face_recognition_models_tpu.evaluation.batch_eval import (
        run_batch_evaluation)
    return run_batch_evaluation(
        checkpoint_dir=args.checkpoint_dir,
        head=args.head,
        backbone=args.backbone,
        eval_data_path=args.eval_data_path,
        benchmarks=args.benchmarks.split(","),
        batch_size=args.batch_size,
        num_classes=args.num_classes,
        output_dir=args.output_dir,
        image_size=args.image_size,
        which=args.which,
        protocol=("standard" if args.standard_protocol
                  else "device" if args.device_protocol else "host"),
        fars=tuple(float(f) for f in args.tpr_far.split(",") if f),
        flip=args.eval_flip,
        embed_dim=args.embed_dim,
    )


def _add_preprocess_parser(sub):
    p = sub.add_parser("preprocess",
                       help="offline face alignment to 112x112 (MTCNN "
                            "cascade; WITHOUT weights it degrades to "
                            "center-crop+resize, no detection)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--image-size", type=int, default=112)
    p.add_argument("--mtcnn-weights", default=None, metavar="DIR",
                   help="directory containing facenet_pytorch's "
                        "pnet.pt/rnet.pt/onet.pt (enables real detection "
                        "via the native JAX cascade)")
    p.add_argument("--align-mode", choices=("crop", "warp"), default="crop",
                   help="'crop' = box crop+resize (reference "
                        "preprocess.py:35-41); 'warp' = 5-landmark "
                        "similarity warp onto the ArcFace template "
                        "(insightface production recipe)")
    return p


def cmd_preprocess(args) -> int:
    from face_recognition_models_tpu.data.preprocess import preprocess_dataset
    stats = preprocess_dataset(args.input, args.output,
                               image_size=args.image_size,
                               mtcnn_weights=args.mtcnn_weights,
                               align_mode=args.align_mode)
    print(f"preprocess done: {stats}")
    return 0


def _add_pack_parser(sub):
    p = sub.add_parser("pack",
                       help="decode an identity tree ONCE into a uint8 "
                            "memmap pack; `face train --dataset-path "
                            "<pack>` then trains with zero JPEG decode "
                            "on the hot path")
    p.add_argument("--dataset-path", required=True,
                   help="identity tree root (same layouts as train: "
                        "<root>/CASIA-WebFace[/{train,valid}]/<id>/*.jpg, "
                        "a bare <root>/<id>/*.jpg tree, or an insightface "
                        "RecordIO train.rec/.idx set)")
    p.add_argument("--output", required=True, metavar="DIR")
    p.add_argument("--image-size", type=int, default=cfg_lib.IMAGE_SIZE)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--backend", choices=["auto", "native", "pil"],
                   default="auto")
    return p


def cmd_pack(args) -> int:
    from face_recognition_models_tpu.data import ImageFolderIndex
    from face_recognition_models_tpu.data.packed import (
        pack_dataset, pack_from_loader)
    from face_recognition_models_tpu.data.recordio import (
        RecLoader, RecordIODataset, is_recordio)

    if is_recordio(args.dataset_path):
        rec = RecordIODataset.open(args.dataset_path)
        loader = RecLoader(rec, batch_size=min(1024, len(rec)),
                           image_size=args.image_size, shuffle=False,
                           num_workers=args.num_workers,
                           drop_remainder=False)
        t0 = time.time()
        meta = pack_from_loader(loader, rec.identities, args.output,
                                args.image_size, decode_backend="pil",
                                progress_every=50_000)
        dt = time.time() - t0
        print(f"packed {meta['num_samples']} images from RecordIO "
              f"({len(meta['identities'])} identities) in {dt:.0f}s; "
              f"{meta['skipped_images']} corrupt resampled -> "
              f"{args.output}")
        return 0

    root = os.path.join(args.dataset_path, "CASIA-WebFace")
    if not os.path.isdir(root):
        root = args.dataset_path
    parts = []
    for split in ("train", "valid"):
        try:
            parts.append(ImageFolderIndex.build(root, split=split))
        except FileNotFoundError:
            pass
    if not parts:
        parts = [ImageFolderIndex.build(root)]
    index = (parts[0] if len(parts) == 1
             else ImageFolderIndex.concat(parts))
    t0 = time.time()
    meta = pack_dataset(index, args.output, image_size=args.image_size,
                        num_workers=args.num_workers, backend=args.backend,
                        progress_every=50_000)
    dt = time.time() - t0
    print(f"packed {meta['num_samples']} images "
          f"({meta['num_samples'] * args.image_size**2 * 3 / 1e9:.2f} GB, "
          f"{len(meta['identities'])} identities) in {dt:.0f}s "
          f"via {meta['decode_backend']} decode; "
          f"{meta['skipped_images']} corrupt resampled -> {args.output}")
    return 0


def _add_facenet_parser(sub):
    p = sub.add_parser("facenet", help="FaceNet triplet training "
                                       "(PK sampling + semi-hard mining)")
    p.add_argument("--dataset-path", default="",
                   help="identity-folder tree root, streamed through the "
                        "PK loader — never materialized in host RAM "
                        "(or --synthetic)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-classes", type=int, default=32)
    p.add_argument("--synthetic-per-class", type=int, default=16)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--embed-dim", type=int, default=128)
    p.add_argument("--p", type=int, default=16, help="identities per batch")
    p.add_argument("--k", type=int, default=4, help="images per identity")
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--image-size", type=int, default=cfg_lib.IMAGE_SIZE)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--working-path", default="train_output",
                   help="checkpoints land under "
                        "<working>/checkpoints/<model-name> — the same "
                        "layout `face train` writes, so `face "
                        "embed/eval/export --checkpoint-dir` read the "
                        "result directly")
    p.add_argument("--model-name", default=None,
                   help="default facenet_<backbone>")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest epoch checkpoint")
    p.add_argument("--keep-checkpoints", type=int, default=3)
    p.add_argument("--use-mesh", action="store_true",
                   help="DP-shard each PK batch over all devices' 'data' "
                        "axis (p*k must divide the device count); mining "
                        "stays global-batch via an embedding all-gather")
    return p


def cmd_facenet(args) -> int:
    from face_recognition_models_tpu.config import FaceNetConfig
    from face_recognition_models_tpu.triplet import train_facenet

    images = labels = loader = None
    if args.synthetic:
        from face_recognition_models_tpu.data.synthetic import (
            synthetic_identities)
        images, labels = synthetic_identities(
            args.synthetic_classes, args.synthetic_per_class,
            image_size=args.image_size, seed=args.seed)
    else:
        if not args.dataset_path:
            print("error: --dataset-path required (or --synthetic)",
                  file=sys.stderr)
            return 2
        from face_recognition_models_tpu.data.recordio import is_recordio
        if is_recordio(args.dataset_path):
            from face_recognition_models_tpu.data import (
                PKRecLoader, RecordIODataset)
            rec = RecordIODataset.open(args.dataset_path)
            loader = PKRecLoader(rec, args.p, args.k,
                                 image_size=args.image_size, seed=args.seed,
                                 num_workers=args.num_workers)
        else:
            from face_recognition_models_tpu.data import (
                ImageFolderIndex, PKLoader)
            index = ImageFolderIndex.build(args.dataset_path)
            loader = PKLoader(index, args.p, args.k,
                              image_size=args.image_size, seed=args.seed,
                              num_workers=args.num_workers)

    mesh = None
    if args.use_mesh:
        import jax

        from face_recognition_models_tpu.parallel import make_mesh
        mesh = make_mesh(cfg_lib.MeshConfig(data=jax.device_count(),
                                            model=1))

    cfg = FaceNetConfig(backbone=args.backbone, embed_dim=args.embed_dim,
                        p=args.p, k=args.k, margin=args.margin,
                        learning_rate=args.learning_rate)
    model_name = args.model_name or f"facenet_{args.backbone}"
    ckpt_dir = os.path.join(args.working_path, "checkpoints", model_name)
    result = train_facenet(cfg, images, labels, epochs=args.epochs,
                           image_size=args.image_size, seed=args.seed,
                           loader=loader, mesh=mesh,
                           checkpoint_dir=ckpt_dir, model_name=model_name,
                           resume=args.resume, keep=args.keep_checkpoints)
    print(f"final loss {result.losses[-1]:.4f} — "
          f"{result.images_per_sec:.0f} img/s; saved {model_name}_final "
          f"under {ckpt_dir} (evaluate: `face eval --checkpoint-dir "
          f"{os.path.dirname(ckpt_dir)} --head {model_name} "
          f"--backbone {args.backbone} --embed-dim {args.embed_dim} ...`)")
    return 0


def _add_export_parser(sub):
    p = sub.add_parser("export", help="export a trained backbone as a "
                                      "self-contained serving artifact "
                                      "(StableHLO via jax.export; symbolic "
                                      "batch dim)")
    p.add_argument("--checkpoint-dir", required=True,
                   help="model checkpoint dir (the train run's "
                        "<working>/checkpoints/<name>)")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--embed-dim", type=int, default=512,
                   help="backbone embedding width (128 for `face facenet` "
                        "artifacts)")
    p.add_argument("--output", required=True, metavar="FILE.frte")
    p.add_argument("--image-size", type=int, default=cfg_lib.IMAGE_SIZE)
    p.add_argument("--platforms", default=None,
                   help="comma list of lowering targets (e.g. tpu,cpu); "
                        "default: current backend")
    p.add_argument("--which", default="final",
                   choices=["final", "final_ema", "min_loss", "best_acc"],
                   help="which checkpoint artifact to export "
                        "(same semantics as `face eval --which`)")
    p.add_argument("--fold-bn", action="store_true",
                   help="fold BatchNorm into conv weights (ResNet; "
                        "inference-exact — ~8%% SLOWER on v5e where XLA "
                        "already fuses the BN affine, kept for backends "
                        "without that fusion; PERF.md)")
    p.add_argument("--format", default="stablehlo",
                   choices=["stablehlo", "torch"],
                   help="stablehlo: self-contained .frte serving artifact; "
                        "torch: a torchvision/insightface-layout state_dict "
                        ".pth (the reverse of --pretrained) consumable by "
                        "the torch ecosystem")
    return p


def cmd_export(args) -> int:
    import jax
    import numpy as np

    from face_recognition_models_tpu.checkpoint import restore_backbone
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.serving import export_embedder

    model = get_backbone(args.backbone, embed_dim=args.embed_dim)
    dummy = np.zeros((1, args.image_size, args.image_size, 3), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           dummy, train=False)
    abstract = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    finals = sorted(d for d in os.listdir(args.checkpoint_dir)
                    if d.endswith("_final"))
    if not finals and args.which != "min_loss":
        print(f"error: no *_final checkpoint under {args.checkpoint_dir} "
              "(train to completion first)", file=sys.stderr)
        return 1
    name = finals[0][:-len("_final")] if finals else None
    restored = restore_backbone(args.checkpoint_dir, abstract, args.which,
                                model_name=name)
    if args.format == "torch":
        import torch

        from face_recognition_models_tpu.utils.torch_export import (
            export_torch_state_dict)

        sd = export_torch_state_dict(args.backbone, restored["params"],
                                     restored["batch_stats"])
        torch.save({k: torch.from_numpy(np.array(v))
                    for k, v in sd.items()}, args.output)
        print(f"exported {args.backbone} ({args.which}) -> {args.output} "
              f"(torch state_dict, {len(sd)} tensors)")
        return 0
    platforms = args.platforms.split(",") if args.platforms else None
    header = export_embedder(model, restored["params"],
                             restored["batch_stats"], args.output,
                             image_size=args.image_size,
                             platforms=platforms,
                             fold_bn="always" if args.fold_bn else "never",
                             meta={"backbone": args.backbone,
                                   "which": args.which})
    print(f"exported {args.backbone} ({args.which}) -> {args.output} "
          f"(platforms {header['platforms']}, {header['embed_dim']}-d"
          f"{', BN folded' if header['bn_folded'] else ''})")
    return 0


def _add_embed_parser(sub):
    p = sub.add_parser("embed", help="batch-embed an image tree to .npz "
                                     "(production inference)")
    p.add_argument("--input", required=True, help="image tree root")
    p.add_argument("--output", required=True, metavar="FILE.npz")
    p.add_argument("--model", default=None,
                   help="serving artifact from `face export`")
    p.add_argument("--checkpoint-dir", default=None,
                   help="alternatively: a training checkpoint dir")
    p.add_argument("--which", default="final",
                   choices=["final", "final_ema", "min_loss", "best_acc"],
                   help="which checkpoint artifact to embed with "
                        "(same semantics as `face eval --which`)")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--embed-dim", type=int, default=512,
                   help="backbone embedding width (128 for `face facenet` "
                        "artifacts)")
    p.add_argument("--image-size", type=int, default=cfg_lib.IMAGE_SIZE)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--bn-dtype", choices=["float32", "bfloat16"],
                   default="bfloat16",
                   help="BatchNorm compute dtype; bfloat16 is +1.9%% "
                        "throughput at unchanged accuracy (PERF.md), "
                        "float32 matches training numerics bit for bit")
    return p


def cmd_embed(args) -> int:
    from face_recognition_models_tpu.serving.embed import run_embed_cli
    return run_embed_cli(
        input_dir=args.input, output=args.output, model_path=args.model,
        checkpoint_dir=args.checkpoint_dir, backbone=args.backbone,
        which=args.which, image_size=args.image_size,
        batch_size=args.batch_size, num_workers=args.num_workers,
        bn_dtype=args.bn_dtype, embed_dim=args.embed_dim)


def _add_serve_parser(sub):
    p = sub.add_parser(
        "serve",
        help="online embedding/identification HTTP service: concurrent "
             "requests coalesce into one fixed-shape device micro-batch "
             "(b=8 costs +8%% latency for 7.4x throughput on v5e — "
             "PERF.md 'Serving latency')")
    p.add_argument("--model", default=None,
                   help="serving artifact from `face export`")
    p.add_argument("--checkpoint-dir", default=None,
                   help="alternatively: a training checkpoint dir")
    p.add_argument("--which", default="final",
                   choices=["final", "final_ema", "min_loss", "best_acc"])
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--embed-dim", type=int, default=512,
                   help="backbone embedding width (128 for `face facenet` "
                        "artifacts)")
    p.add_argument("--image-size", type=int, default=cfg_lib.IMAGE_SIZE)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--micro-batch", type=int, default=8,
                   help="fixed device batch requests coalesce into")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="max time to wait for co-arriving requests")
    p.add_argument("--gallery", default=None, metavar="GALLERY.npz",
                   help="`face embed` output enabling POST /identify")
    p.add_argument("--align", action="store_true",
                   help="detect+align full photos before embedding "
                        "(MTCNN cascade; enables POST /detect; no-face "
                        "requests fall back to center-crop with "
                        "aligned=false in the response)")
    p.add_argument("--mtcnn-weights", default=None, metavar="DIR",
                   help="facenet_pytorch pnet.pt/rnet.pt/onet.pt dir "
                        "for --align")
    p.add_argument("--align-mode", choices=("crop", "warp"), default="crop",
                   help="with --align: 'crop' = box crop+resize; 'warp' = "
                        "5-landmark similarity warp onto the ArcFace "
                        "template (detection/align.py)")
    p.add_argument("--bn-dtype", choices=["float32", "bfloat16"],
                   default="bfloat16",
                   help="BatchNorm compute dtype (see `face embed`)")
    return p


def cmd_serve(args) -> int:
    from face_recognition_models_tpu.serving.server import run_serve_cli
    return run_serve_cli(
        model_path=args.model, checkpoint_dir=args.checkpoint_dir,
        backbone=args.backbone, which=args.which,
        image_size=args.image_size, host=args.host, port=args.port,
        micro_batch=args.micro_batch, max_wait_ms=args.max_wait_ms,
        gallery=args.gallery, align=args.align,
        mtcnn_weights=args.mtcnn_weights, align_mode=args.align_mode,
        bn_dtype=args.bn_dtype, embed_dim=args.embed_dim)


def _add_identify_parser(sub):
    p = sub.add_parser(
        "identify",
        help="1:N identification between two `face embed` outputs "
             "(CMC rank-k; TPIR@FPIR when probe identities are missing "
             "from the gallery). Identity = parent directory of each "
             "image path.")
    p.add_argument("--gallery", required=True, metavar="GALLERY.npz")
    p.add_argument("--probes", required=True, metavar="PROBES.npz")
    p.add_argument("--ranks", default="1,5")
    p.add_argument("--fpir", default="1e-1,1e-2",
                   help="open-set FPIR operating points")
    p.add_argument("--device", action="store_true",
                   help="score probe-gallery cosines on the accelerator "
                        "(million-image galleries; same numbers)")
    p.add_argument("--min-quality", type=float, default=0.0,
                   help="drop gallery/probe images whose MagFace-norm "
                        "quality score (stored by `face embed`) is below "
                        "this [0, 1] threshold")
    p.add_argument("--pool", default="none",
                   choices=["none", "probes", "gallery", "both"],
                   help="IJB-style template pooling: collapse each "
                        "identity's images to one renormalized mean "
                        "embedding before scoring")
    p.add_argument("--pool-weight", default="none",
                   choices=["none", "quality"],
                   help="weight the pooled mean by the stored per-image "
                        "quality scores")
    return p


def cmd_identify(args) -> int:
    from face_recognition_models_tpu.evaluation.openset import (
        identify_from_npz)
    res = identify_from_npz(
        args.gallery, args.probes,
        ranks=tuple(int(r) for r in args.ranks.split(",") if r),
        fpirs=tuple(float(f) for f in args.fpir.split(",") if f),
        device=args.device, min_quality=args.min_quality,
        pool=args.pool, pool_weight=args.pool_weight)
    print(res)
    return 0


def cmd_list(args) -> int:
    print("heads:     ", ", ".join(available_heads()))
    print("backbones: ", ", ".join(sorted(BACKBONES)))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="face",
        description="TPU-native face-recognition framework")
    parser.add_argument("--platform", default=None,
                        help="force a JAX platform (e.g. 'cpu', 'tpu'); "
                             "useful where a site plugin overrides "
                             "JAX_PLATFORMS")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() so the mesh "
                             "spans all hosts/slices (DCN between slices)")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax NaN checking (slower)")
    parser.add_argument("--compile-cache", default=None, metavar="DIR",
                        help="persistent XLA compilation cache: programs "
                             "compiled once land in DIR and later "
                             "processes (serve restarts, eval sweeps, "
                             "resumed runs) skip the 20-300s compile")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_train_parser(sub)
    _add_eval_parser(sub)
    _add_preprocess_parser(sub)
    _add_pack_parser(sub)
    _add_facenet_parser(sub)
    _add_export_parser(sub)
    _add_embed_parser(sub)
    _add_identify_parser(sub)
    _add_serve_parser(sub)
    sub.add_parser("list", help="list available heads/backbones")

    args = parser.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache:
        from face_recognition_models_tpu.utils.compile_cache import (
            enable_compilation_cache)
        enable_compilation_cache(args.compile_cache)
    if args.multihost:
        import jax
        jax.distributed.initialize()
    if args.debug_nans:
        from face_recognition_models_tpu.utils.debug import enable_nan_checks
        enable_nan_checks()
    if args.command == "facenet":
        return cmd_facenet(args)
    if args.command == "train":
        return cmd_train(args)
    if args.command == "eval":
        return cmd_eval(args)
    if args.command == "preprocess":
        return cmd_preprocess(args)
    if args.command == "pack":
        return cmd_pack(args)
    if args.command == "export":
        return cmd_export(args)
    if args.command == "embed":
        return cmd_embed(args)
    if args.command == "serve":
        return cmd_serve(args)
    if args.command == "identify":
        return cmd_identify(args)
    if args.command == "list":
        return cmd_list(args)
    parser.error(f"unknown command {args.command}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
