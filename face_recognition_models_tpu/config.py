"""Typed configuration tree.

The reference scatters configuration over star-imported module globals
(main_code/utils/config.py), argparse flags (model_utils.py:476-506), run.sh
defaults, and hardcoded literals in the engine (model_utils.py:556-558).
Here everything is one explicit dataclass tree; the per-head defaults below
carry the reference's exact hyperparameter values (config.py:16-78) so a run
configured with the defaults reproduces the reference's training behavior.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Core constants (reference: config.py:13, arcface.py:25)
# ---------------------------------------------------------------------------

FEATURE_DIM = 512
FACENET_EMBED_DIM = 128
CASIA_NUM_CLASSES = 10575
IMAGE_SIZE = 112

# Verification benchmarks driven by evaluate_models.py:69-71 in the reference.
EVAL_BENCHMARKS = ("agedb_30", "cfp_fp", "lfw", "calfw", "cplfw")


def _field(default):
    if isinstance(default, (list, dict, set)):
        return dataclasses.field(default_factory=lambda: default)
    return default


# ---------------------------------------------------------------------------
# Head configs — one dataclass per margin method.
# Default values are parity-critical (reference config.py:16-78, SURVEY §2.4).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Base for all margin-head configs."""

    name: str = "base"
    feature_dim: int = FEATURE_DIM
    num_classes: int = CASIA_NUM_CLASSES


@dataclasses.dataclass(frozen=True)
class SphereFaceConfig(HeadConfig):
    """A-Softmax with annealing (reference criterion.py:12-107)."""

    name: str = "sphereface"
    m: int = 2              # config.py:17 (head default in reference is 4)
    base: float = 1000.0
    gamma: float = 0.12
    power: float = 1.0
    lambda_min: float = 5.0


@dataclasses.dataclass(frozen=True)
class CosFaceConfig(HeadConfig):
    """Additive cosine margin (reference criterion.py:137-197)."""

    name: str = "cosface"
    m: float = 0.35         # config.py:21
    s: float = 64.0         # config.py:22
    eps: float = 1e-4       # criterion.py:147


@dataclasses.dataclass(frozen=True)
class ArcFaceConfig(HeadConfig):
    """Additive angular margin (reference criterion.py:232-301)."""

    name: str = "arcface"
    m: float = 0.5          # config.py:25
    s: float = 64.0         # config.py:26
    easy_margin: bool = False  # criterion.py:313


@dataclasses.dataclass(frozen=True)
class MVSoftmaxConfig(HeadConfig):
    """Mis-classified Vector guided softmax (reference criterion.py:327-461)."""

    name: str = "mv_softmax"
    m: float = 0.35         # config.py:29
    mv_weight: float = 1.12  # config.py:30
    s: float = 32.0         # config.py:31
    margin_type: str = "am"  # config.py:32 ('am' or 'arc')
    eps: float = 1e-7       # criterion.py:413


@dataclasses.dataclass(frozen=True)
class CurricularFaceConfig(HeadConfig):
    """Curriculum hard-negative scaling with EMA difficulty
    (reference criterion.py:491-587)."""

    name: str = "curricularface"
    m: float = 0.5          # config.py:35
    s: float = 64.0         # config.py:36
    momentum: float = 0.01  # config.py:37


@dataclasses.dataclass(frozen=True)
class VPLArcFaceConfig(HeadConfig):
    """ArcFace over virtual-prototype memory blend (reference criterion.py:619-762)."""

    name: str = "vpl_arcface"
    s: float = 64.0         # config.py:40
    m: float = 0.5          # config.py:41
    easy_margin: bool = False  # config.py:42
    lamda: float = 0.15     # config.py:43
    delta: int = 100        # config.py:44
    eps: float = 1e-7       # criterion.py:733


@dataclasses.dataclass(frozen=True)
class AdaFaceConfig(HeadConfig):
    """Norm-adaptive margin with EMA of batch norm stats
    (reference criterion.py:795-918)."""

    name: str = "adaface"
    m: float = 0.4          # config.py:48
    h: float = 0.333        # config.py:49
    s: float = 64.0         # config.py:47
    t_alpha: float = 0.99   # config.py:50 — NOTE reference blends
    # batch_mean*t_alpha + (1-t_alpha)*ema (criterion.py:881-882), i.e. the
    # EMA is weighted toward the CURRENT batch; replicated for parity.
    eps: float = 1e-3       # criterion.py:828


@dataclasses.dataclass(frozen=True)
class ElasticArcFaceConfig(HeadConfig):
    """Per-sample Gaussian angular margin (reference criterion.py:1054-1154)."""

    name: str = "elastic_arcface"
    s: float = 64.0         # config.py:53
    m: float = 0.5          # config.py:54
    std: float = 0.0125     # config.py:55
    plus: bool = False      # config.py:56
    eps: float = 1e-7       # criterion.py:1104


@dataclasses.dataclass(frozen=True)
class ElasticCosFaceConfig(HeadConfig):
    """Per-sample Gaussian cosine margin (reference criterion.py:951-1030)."""

    name: str = "elastic_cosface"
    s: float = 64.0         # config.py:59
    m: float = 0.35         # config.py:60
    std: float = 0.0125     # config.py:61
    plus: bool = False      # config.py:62
    eps: float = 1e-7       # criterion.py:994


@dataclasses.dataclass(frozen=True)
class MagFaceConfig(HeadConfig):
    """Magnitude-adaptive margin + magnitude regularizer
    (reference criterion.py:1178-1301)."""

    name: str = "magface"
    s: float = 64.0         # config.py:65
    easy_margin: bool = False  # config.py:66
    l_margin: float = 0.45  # config.py:67
    u_margin: float = 0.8   # config.py:68
    l_a: float = 10.0       # config.py:69
    u_a: float = 110.0      # config.py:70
    eps: float = 1e-7       # criterion.py:1260


@dataclasses.dataclass(frozen=True)
class QAFaceConfig(HeadConfig):
    """Quality-aware head with injection memory (reference criterion.py:1331-1520).

    The reference's QAFaceNet has broken dual-input plumbing (its generic
    train loop passes labels into the `minput` slot, criterion.py:1543-1552);
    here the head takes an explicit (feats, minput_feats, labels) triple and
    the training pipeline provides a degraded view as minput.

    Schedule note (PERF.md "QAFace root cause"): the non-target
    memory-replacement contrast (criterion.py:1471-1476) targets LONG
    real-data schedules; on short runs it stalls verification (measured
    66.6% vs 99.3% arcface on the 15-epoch synthetic protocol, and 3x the
    epochs adds 1.3 points). For short runs use `--head-arg delta=1`
    (memory never activates, quality injection kept; 92.5%) or
    `--head-arg tto=0 --head-arg delta=1` (reduces to arcface; 99.3%).
    """

    name: str = "qaface"
    s: float = 64.0         # config.py:73
    m: float = 0.5          # config.py:74
    easy_margin: bool = False  # config.py:75
    delta: int = 1000       # config.py:76
    tto: float = 2.0        # config.py:77
    alpha: float = 0.99     # config.py:78
    eps: float = 1e-7       # criterion.py:1492


@dataclasses.dataclass(frozen=True)
class CombinedMarginConfig(HeadConfig):
    """Unified margin cos(m1*theta + m2) - m3 (insightface's combined-margin
    recipe; beyond the reference, whose heads are separate classes).

    (m1, m2, m3) = (1, 0.5, 0) reproduces ArcFace, (1, 0, 0.35) CosFace,
    and m1 > 1 gives SphereFace-style multiplicative margins without the
    annealing schedule. One production config, e.g. (1, 0.3, 0.2), blends
    angular and cosine margins.
    """

    name: str = "combined_margin"
    m1: float = 1.0
    m2: float = 0.5
    m3: float = 0.0
    s: float = 64.0
    eps: float = 1e-7


@dataclasses.dataclass(frozen=True)
class SubCenterArcFaceConfig(HeadConfig):
    """Sub-center ArcFace (Deng et al., ECCV 2020; beyond the reference):
    K prototype columns per class, cosine max-pooled over the K sub-centers
    before the standard ArcFace margin — robust to intra-class label noise
    in web-scraped training sets."""

    name: str = "subcenter_arcface"
    m: float = 0.5
    s: float = 64.0
    k: int = 3
    easy_margin: bool = False


@dataclasses.dataclass(frozen=True)
class AdaCosConfig(HeadConfig):
    """AdaCos (Zhang et al., CVPR 2019; beyond the reference): no margin,
    no tuned scale — the cosine-logit scale is set analytically.

    fixed:   s = sqrt(2) * ln(C - 1), constant.
    dynamic: s_t = ln(B_avg) / cos(min(pi/4, theta_med)), where B_avg is
    the batch mean of the non-target exp(s_{t-1} cos) mass and theta_med
    the median target angle — the scale that keeps P(target) ~ 0.5 at the
    median difficulty, annealing supervision automatically. The running
    scale is head state (checkpointed like CurricularFace's t).
    """

    name: str = "adacos"
    dynamic: bool = True
    theta_clip: float = math.pi / 4.0


HEAD_CONFIGS = {
    "sphereface": SphereFaceConfig,
    "cosface": CosFaceConfig,
    "arcface": ArcFaceConfig,
    "mv_softmax": MVSoftmaxConfig,
    "curricularface": CurricularFaceConfig,
    "vpl_arcface": VPLArcFaceConfig,
    "adaface": AdaFaceConfig,
    "elastic_arcface": ElasticArcFaceConfig,
    "elastic_cosface": ElasticCosFaceConfig,
    "magface": MagFaceConfig,
    "qaface": QAFaceConfig,
    "combined_margin": CombinedMarginConfig,
    "subcenter_arcface": SubCenterArcFaceConfig,
    "adacos": AdaCosConfig,
}


def make_head_config(name: str, **overrides) -> HeadConfig:
    key = name.lower()
    if key not in HEAD_CONFIGS:
        raise ValueError(
            f"Unknown head '{name}'. Available: {sorted(HEAD_CONFIGS)}")
    return HEAD_CONFIGS[key](**overrides)


def parse_head_overrides(name: str, items) -> dict:
    """Parse CLI 'key=value' strings into typed head-config overrides.

    Values are coerced to the type of the field's default (the head
    hyperparameters are all int/float/bool/str), so
    `--head-arg m2=0.3 --head-arg k=3` round-trips exactly into the frozen
    dataclass. Unknown keys raise with the head's available fields.
    """
    key = name.lower()
    if key not in HEAD_CONFIGS:
        raise ValueError(
            f"Unknown head '{name}'. Available: {sorted(HEAD_CONFIGS)}")
    defaults = HEAD_CONFIGS[key]()
    # name is fixed; num_classes has its own --num-classes flag
    editable = {f.name for f in dataclasses.fields(defaults)
                if f.name not in ("name", "num_classes")}
    out = {}
    for item in items:
        k, sep, v = item.partition("=")
        if not sep or k not in editable:
            raise ValueError(
                f"--head-arg '{item}': expected key=value with key in "
                f"{sorted(editable)}")
        default = getattr(defaults, k)
        if isinstance(default, bool):
            out[k] = v.lower() in ("1", "true", "yes", "on")
        else:
            out[k] = type(default)(v)
    return out


# ---------------------------------------------------------------------------
# Mesh / parallelism
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout.

    `data` is the batch (data-parallel) axis; `model` shards the classifier's
    class dimension — the TPU-native generalization of the reference's
    dormant `device_id` class-chunking (criterion.py:67-79 etc.).
    """

    data: int = -1   # -1: use all devices on the data axis
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


# ---------------------------------------------------------------------------
# Optimizer / schedule (reference model_utils.py:556-558, schedulers.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    name: str = "sgd"
    learning_rate: float = 0.1     # run.sh default; argparse default too
    momentum: float = 0.9          # model_utils.py:557
    weight_decay: float = 5e-4     # model_utils.py:557
    nesterov: bool = False
    # adam-family knobs
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # global-norm gradient clipping before the update rule (beyond the
    # reference, which never clips; torch.nn.utils.clip_grad_norm_
    # semantics). 0 = off.
    clip_grad_norm: float = 0.0


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    name: str = "customstep"       # model_utils.py:558
    # CustomStepLR semantics (schedulers.py:3-16, 22): multiply LR by `ratio`
    # at each epoch in `steps`.
    steps: Tuple[int, ...] = (20, 40, 60)
    ratio: float = 0.1
    # step / multistep / cosine knobs
    step_size: int = 30
    gamma: float = 0.1
    milestones: Tuple[int, ...] = (40, 80, 100, 150)
    eta_min: float = 0.0
    warmup_epochs: int = 5


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Embedding-space knowledge distillation (beyond-reference).

    The standard edge-deployment recipe for face recognition: a small
    student trunk (e.g. mobilefacenet) matches a trained teacher's
    embedding geometry while also training its own margin head. The
    distill loss is computed on the SAME normalized+augmented batch the
    student sees, against a frozen teacher run in eval mode (running BN
    statistics), and added to the CE as
    `loss += weight * distill(student_emb, teacher_emb)`.

    mode "cosine": mean(1 - cos(s, t)) on L2-normalized embeddings — the
    metric that verification actually uses. mode "mse": mean squared L2
    distance on raw embeddings (also matches scale/norms, e.g. for
    MagFace-style teachers whose norms carry quality).
    """

    backbone: str = "resnet50"   # teacher trunk name (any BACKBONES key)
    checkpoint_dir: str = ""     # orbax dir from a previous `face train`
    which: str = "final"         # final | final_ema | min_loss
    weight: float = 0.0          # 0 = off
    mode: str = "cosine"         # cosine | mse


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset_path: str = ""
    # Train images are pre-aligned 112x112 RGB; normalize with
    # mean=std=(0.5,0.5,0.5) and no train-time augmentation
    # (reference model_utils.py:539-547).
    image_size: int = IMAGE_SIZE
    mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    horizontal_flip: bool = False
    # Beyond-reference on-device augmentations (ops/image_ops.py
    # apply_augmentations); all no-ops at their defaults.
    crop_pad: int = 0          # random shift-crop padding, pixels
    color_jitter: float = 0.0  # brightness/contrast jitter strength
    random_erasing: float = 0.0  # per-sample erasing probability
    num_workers: int = 8
    drop_remainder: bool = True
    shuffle_seed: int = 0


# ---------------------------------------------------------------------------
# Train / eval
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    backbone: str = "resnet18"     # config.py:11
    head: str = "arcface"
    num_classes: int = CASIA_NUM_CLASSES
    batch_size: int = 512          # model_utils.py:478
    epochs: int = 30               # model_utils.py:479
    lambda_g: float = 0.0          # config.py:14 / argparse
    print_freq: int = 100
    # bf16 compute, fp32 params/head-math. TPU bf16 needs no GradScaler
    # (the reference's torch.amp GradScaler has no TPU equivalent).
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # BatchNorm normalize/affine compute dtype. Batch statistics reduce in
    # fp32 regardless (flax force_float32_reductions), so "bfloat16" only
    # drops the fp32 cast chains around each norm: measured -12.4 ms on
    # the b512 ResNet-50 train step with verification quality unchanged
    # (PERF.md "Train-step decomposition"). "float32" matches the
    # reference recipe exactly (torch.amp autocast keeps BN fp32).
    bn_dtype: str = "float32"
    seed: int = 0
    working_path: str = ""
    model_name: str = ""
    continue_train: Optional[str] = None  # None | 'latest' | 'min_loss'
    # Path to a torch backbone state_dict (.pth) to initialize from — the
    # reference always fine-tunes from ImageNet-pretrained torchvision
    # weights (backbones.py:12-26); with zero egress here the weights must
    # be provided as a file.
    pretrained_path: Optional[str] = None
    keep_checkpoints: int = 3      # rotation keep-3 (model_utils.py:72-78)
    # Fused Pallas margin+CE kernel: True forces it, False forces the XLA
    # path, "auto" dispatches per (head, num_classes) from the measured
    # win table (TPU only; always False elsewhere).
    use_pallas_head: Any = "auto"
    # Device-side step batching: run `scan_steps` train steps as one
    # lax.scan inside a single dispatch (amortizes per-step host/tunnel
    # latency, like bench.py's eval loop). 1 = one dispatch per step.
    scan_steps: int = 1
    # Partial-FC sampled classifier (insightface large-C technique; see
    # train/partial_fc.py): each step's softmax runs over the batch's
    # positive classes + this fraction of uniformly sampled negatives.
    # 0.0 = dense (off). Not supported for the memory-blended heads
    # (vpl_arcface, qaface).
    partial_fc: float = 0.0
    # Sampled-softmax logQ bias correction (see partial_fc.py); only
    # meaningful when partial_fc > 0.
    partial_fc_logq: bool = True
    # Exponential moving average of the weights (beyond-reference
    # production feature; the reference has none): ema <- d*ema + (1-d)*p
    # after every optimizer step, kept in TrainState.ema_params and used
    # for the final embedding artifact / post-train eval. 0.0 = off;
    # typical decays 0.999-0.9999.
    model_ema: float = 0.0
    # Gradient accumulation (beyond-reference): average gradients over K
    # micro-batches and apply the optimizer once — effective batch
    # K*batch_size at batch_size memory (optax.MultiSteps; the LR
    # schedule still sees micro-step counts, so epoch-boundary drops are
    # unchanged). BatchNorm statistics and head state (EMA buffers,
    # memories) update per micro-batch. 1 = off. Incompatible with
    # partial_fc (its manual sampled-column update applies immediately).
    grad_accum: int = 1
    # Head-only training over a frozen trunk (beyond-reference linear
    # probe / adapter fit): the backbone runs in eval mode (batch stats
    # frozen) under stop_gradient — XLA prunes its whole backward pass —
    # and its optimizer updates are zeroed (no wd creep). Pair with
    # --pretrained / warm_start. Incompatible with partial_fc (manual
    # column update path) and distillation (the student trunk must learn).
    freeze_backbone: bool = False
    optimizer: OptimizerConfig = OptimizerConfig()
    schedule: ScheduleConfig = ScheduleConfig()
    mesh: MeshConfig = MeshConfig()
    data: DataConfig = DataConfig()
    # Embedding-space knowledge distillation from a frozen trained teacher
    # (beyond-reference; see DistillConfig). weight 0 = off.
    distill: DistillConfig = DistillConfig()


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    batch_size: int = 64           # model_utils.py:416 default
    k_fold: int = 10               # model_utils.py:438
    kfold_seed: int = 42           # StratifiedKFold(random_state=42)
    benchmarks: Tuple[str, ...] = EVAL_BENCHMARKS
    eval_data_path: str = ""


# ---------------------------------------------------------------------------
# FaceNet triplet subproject (reference FaceNet/)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FaceNetConfig:
    embed_dim: int = FACENET_EMBED_DIM  # FaceNet/main.py:16
    backbone: str = "resnet50"
    margin: float = 0.2                  # FaceNet/utils/criterions.py:6
    p: int = 16                          # identities per batch (PK sampling)
    k: int = 4                           # images per identity
    learning_rate: float = 0.05
    momentum: float = 0.9
    weight_decay: float = 5e-4
