"""End-to-end convergence parity vs the torch reference stack.

The top rung of the parity ladder (below it: forward parity per head in
test_reference_parity.py, 12-step training-trajectory parity in
test_trajectory_parity.py, fused-vs-jnp trajectory parity in
test_fused_trajectory.py). These tests train BOTH stacks TO COMPLETION on
the identical tiny synthetic identity dataset — same initial weights
(ported via utils/torch_port), same batch order (the ArrayLoader epoch
permutation replayed on the torch side), same normalization, the
reference's exact recipe (SGD momentum 0.9, wd 5e-4 on ALL params,
CustomStepLR drops; model_utils.py:556-559, 569-578) — then evaluate both
final models under the IDENTICAL 10-fold Youden verification protocol
(model_utils.py:416-474) on the same held-out pairs, and assert the final
accuracies agree within tolerance.

Torch side: the reference's own heads + CustomStepLR (/root/reference
criterion.py, schedulers.py) with the torchvision-compatible ResNet-18
replica from test_pretrained_port; the train loop replicates the reference
recipe step for step. JAX side: the REAL production path end to end —
`loop.fit` over an ArrayLoader (the same code path `face train` drives),
then `batch_eval.make_embed_fn` + `embed_unique_images` +
`kfold_verification`.

The harness is parametrized over HEAD_SPECS (round 5): beyond arcface it
covers the STATEFUL heads whose composition over a full schedule is
exactly what 12-step trajectory parity cannot certify — CurricularFace
(EMA difficulty `t`, criterion.py:517, 570-575), AdaFace (norm
`batch_mean/std` EMAs, :836-885) — and QAFace, where the run is a
MEASUREMENT of the reference's own short-run dynamics (PERF.md "QAFace
root cause") rather than a high-accuracy bar: both stacks warm-start from
the same arcface backbone (the reference's own pretrained-init practice,
backbones.py:12-26) and must land at the SAME depressed accuracy.

What this certifies that trajectory parity cannot: the COMPOSITION over a
full schedule — BN momentum integrated over ~100 steps, LR drops at the
CustomStepLR boundaries, stateful-head EMAs evolving across epochs,
epoch/reshuffle semantics, and the final evaluation protocol — lands both
stacks at the same verification accuracy, i.e. a reference user switching
frameworks gets the same model quality.

Scale is bounded by the 1-core CPU sandbox: 32px, C=64, ResNet-18, b128,
12 epochs (96 steps/stack, ~1 min torch + ~1 min jax per stage). Measured
parity (PERF.md "End-to-end convergence parity"): arcface seed 0 98.74 vs
98.68 (diff 0.067%), seed 1 diff 1.10% — both inside the ~1% fold-stds;
tolerance 2.5% is generous against the recipe's fp-chaos (trajectories
diverge pointwise after ~20 steps; both stacks must still CONVERGE to the
same quality) yet far below the ~50% chance floor and the >40-point gap a
real recipe bug (wd-on-BN, LR timing, BN-mode) produces at this scale.

Runnable standalone for the PERF.md numbers:
    python tests/test_convergence_parity.py [--head NAME] [--seed N]
        [--epochs N]
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from test_pretrained_port import _BasicBlock, _TorchResNet  # noqa: E402

REF_PATH = "/root/reference/main_code"

# tiny-but-complete run: full ResNet-18 graph, real schedule with two drops
C, D, IMAGE = 64, 128, 32
TPC, EPC = 16, 4                       # train / held-out copies per identity
BATCH = 128
EPOCHS, LR, LR_STEPS, RATIO = 12, 0.1, (8, 10), 0.1
NOISE = 35.0
PAIRS_PER_KIND = 500
MEAN = STD = (0.5, 0.5, 0.5)           # config.py DataConfig defaults


def _load_reference():
    """Import the reference criterion/schedulers with torchvision stubbed
    (same mechanism as test_trajectory_parity)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        for name in ("resnet50", "resnet18", "ResNet18_Weights",
                     "ResNet50_Weights", "efficientnet_b0",
                     "EfficientNet_B0_Weights", "mobilenet_v2",
                     "MobileNet_V2_Weights"):
            setattr(tvm, name, None)
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import utils.criterion as crit
    import utils.schedulers as sched
    return types.SimpleNamespace(crit=crit, sched=sched)


@pytest.fixture(scope="module")
def ref():
    return _load_reference()


def _arcface_torch(ref, kernel):
    head = ref.crit.ArcFace(D, C, device_id=None, s=64.0, m=0.5,
                            easy_margin=False)
    head.weight.data = torch.from_numpy(np.asarray(kernel).T.copy())
    return head


def _curricular_torch(ref, kernel):
    head = ref.crit.CurricularFace(D, C, m=0.5, s=64.0, momentum=0.01)
    head.kernel.data = torch.from_numpy(np.asarray(kernel).copy())
    return head


def _adaface_torch(ref, kernel):
    # hyperparams = the reference wrapper's (criterion.py AdaFaceNet /
    # config.py:47-50; t_alpha=0.99 per this framework's AdaFaceConfig)
    head = ref.crit.AdaFace(D, C, m=0.4, h=0.333, s=64.0, t_alpha=0.99)
    head.kernel.data = torch.from_numpy(np.asarray(kernel).copy())
    return head


def _qaface_torch(ref, kernel):
    inner = ref.crit.QAFace(D, C, s=64.0, m=0.5, easy_margin=False,
                            delta=1000, tto=2.0, alpha=0.99)
    inner.weight.data = torch.from_numpy(np.asarray(kernel).T.copy())

    class _SelfMinput(torch.nn.Module):
        """QAFace takes (feats, minput, labels); mirror the jax step's
        minput=feats fallback, and detach the muy/std EMA buffers between
        steps (the reference assigns them from live tensors,
        criterion.py:1445-1448, so its own second backward crashes — the
        same minimal fix test_trajectory_parity documents)."""

        def __init__(self):
            super().__init__()
            self.inner = inner

        def forward(self, feats, labels):
            self.inner.muy = self.inner.muy.detach()
            self.inner.std = self.inner.std.detach()
            return self.inner(feats, feats, labels)

    return _SelfMinput()


def _elastic_torch(ref, kernel):
    head = ref.crit.ElasticArcFace(D, C, s=64.0, m=0.5, std=0.0125,
                                   plus=False)
    head.kernel.data = torch.from_numpy(np.asarray(kernel).copy())
    return head


def _vpl_torch(ref, kernel):
    head = ref.crit.VPLArcFace(D, C, s=64.0, m=0.5, easy_margin=False,
                               lamda=0.15, delta=100)
    head.weight.data = torch.from_numpy(np.asarray(kernel).T.copy())
    return head


# head -> (torch head factory, per-head recipe). `warm` heads first train
# a torch arcface stage on the same data (the reference's pretrained-init
# practice, backbones.py:12-26) and BOTH stacks then fine-tune from that
# identical backbone at the stage-2 lr. elastic_arcface samples its
# per-sample margins from each framework's OWN rng (no shared stream
# exists across torch/jax), so its parity is DISTRIBUTION-level over
# seeds, not per-seed point equality (PERF.md table).
HEAD_SPECS = {
    "arcface": dict(make_torch=_arcface_torch, lr=LR, warm=False),
    "curricularface": dict(make_torch=_curricular_torch, lr=0.02,
                           warm=True),
    "adaface": dict(make_torch=_adaface_torch, lr=LR, warm=False),
    "qaface": dict(make_torch=_qaface_torch, lr=0.02, warm=True),
    "elastic_arcface": dict(make_torch=_elastic_torch, lr=0.02, warm=True),
    "vpl_arcface": dict(make_torch=_vpl_torch, lr=LR, warm=False),
}


def _split(seed):
    """Class-major split: first TPC copies of each identity train, the
    remaining EPC are held out for verification (scripts/convergence_run.py
    protocol)."""
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)

    per = TPC + EPC
    images, labels = synthetic_identities(C, per, image_size=IMAGE,
                                          seed=seed, noise=NOISE)
    images = images.reshape(C, per, *images.shape[1:])
    train_x = images[:, :TPC].reshape(-1, *images.shape[2:])
    train_y = np.repeat(np.arange(C, dtype=np.int32), TPC)
    held_x = images[:, TPC:].reshape(-1, *images.shape[2:])
    held_y = np.repeat(np.arange(C, dtype=np.int32), EPC)
    return train_x, train_y, held_x, held_y


def _heldout_pairs(held_y, seed):
    rs = np.random.RandomState(seed + 1)
    n = len(held_y)
    pos, neg = [], []
    while len(pos) < PAIRS_PER_KIND:
        c = rs.randint(C)
        i, j = rs.choice(EPC, 2, replace=False)
        pos.append((c * EPC + i, c * EPC + j, 1))
    while len(neg) < PAIRS_PER_KIND:
        a, b = rs.randint(n), rs.randint(n)
        if held_y[a] != held_y[b]:
            neg.append((a, b, 0))
    return np.asarray(pos + neg, np.int64)


def _normalize_torch(images_u8):
    """The exact uint8 -> float transform the train step applies
    (ops/image_ops.normalize_images with the DataConfig defaults), NCHW."""
    scale = 1.0 / (255.0 * STD[0])
    bias = -MEAN[0] / STD[0]
    x = torch.from_numpy(images_u8.transpose(0, 3, 1, 2).copy()).float()
    return x * scale + bias


def _train_torch(head, tmodel, train_x, train_y, seed, epochs, lr,
                 ref=None):
    """The reference recipe to completion, replaying the EXACT batch order
    ArrayLoader(seed=seed) feeds the jax side (data/pipeline.py:251-258:
    np.random.RandomState(seed+epoch) permutation, drop_remainder)."""
    ref = ref or _load_reference()

    class _Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone, self.head = tmodel, head

        def forward(self, x, labels):
            return self.head(self.backbone(x), labels)

    net = _Net().train()
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9,
                          weight_decay=5e-4)
    scheduler = ref.sched.CustomStepLR(opt, steps=LR_STEPS, ratio=RATIO)
    n, bs = len(train_x), BATCH
    for epoch in range(epochs):
        order = np.arange(n)
        np.random.RandomState(seed + epoch).shuffle(order)
        for s in range(n // bs):
            idx = order[s * bs:(s + 1) * bs]
            x = _normalize_torch(train_x[idx])
            t = torch.from_numpy(train_y[idx].astype(np.int64))
            (pre, post), norms, loss_g, _ = net(x, t)
            loss = criterion(post, t)
            opt.zero_grad()
            loss.backward()
            opt.step()
        scheduler.step()
    return net


def _embed_torch(net, images_u8):
    """Held-out embeddings from the torch model: eval-mode BN, the same
    normalization, L2-normalized fp32 — the torch twin of
    embed_unique_images(make_embed_fn(...))."""
    net.eval()
    out = []
    with torch.no_grad():
        for s in range(0, len(images_u8), BATCH):
            x = _normalize_torch(images_u8[s:s + BATCH])
            out.append(net.backbone(x).float().numpy())
    emb = np.concatenate(out)
    return emb / np.linalg.norm(emb, axis=1, keepdims=True)


def _train_and_eval_jax(head_name, tmodel, train_x, train_y, held_x, seed,
                        epochs, lr):
    """The production path end to end: loop.fit over an ArrayLoader from
    torch-ported initial weights, then the batch_eval embedding path.
    Returns (L2-normalized held-out embeddings, initial head kernel) — the
    kernel is handed to the torch side so both stacks start identical."""
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.evaluation.batch_eval import (
        make_embed_fn)
    from face_recognition_models_tpu.evaluation.verification import (
        embed_unique_images)
    from face_recognition_models_tpu.heads import get_head
    from face_recognition_models_tpu.train.loop import fit
    from face_recognition_models_tpu.utils.torch_port import (
        port_torchvision_resnet)

    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head=head_name, num_classes=C,
        batch_size=BATCH, epochs=epochs, compute_dtype="float32",
        seed=seed, print_freq=1000,
        optimizer=cfg_lib.OptimizerConfig(name="sgd", learning_rate=lr,
                                          momentum=0.9, weight_decay=5e-4),
        schedule=cfg_lib.ScheduleConfig(name="customstep", steps=LR_STEPS,
                                        ratio=RATIO, warmup_epochs=0),
        data=cfg_lib.DataConfig(image_size=IMAGE))
    head_cfg = cfg_lib.make_head_config(head_name, feature_dim=D,
                                        num_classes=C)

    # the kernel init fit will draw internally (create_train_state:44-46 is
    # deterministic in cfg.seed) — reproduced here so the torch head can
    # start from the identical weights
    _, k_kernel, _ = jax.random.split(jax.random.PRNGKey(cfg.seed), 3)
    kernel = get_head(head_name).init_kernel(k_kernel, head_cfg)

    # port the torch model's current backbone weights + BN stats (fresh
    # init for cold starts; the stage-1-trained backbone for warm starts)
    from face_recognition_models_tpu.models import get_backbone
    template_model = get_backbone("resnet18", embed_dim=D,
                                  dtype=jnp.float32)
    template = template_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMAGE, IMAGE, 3)), train=False)
    ported, stats = port_torchvision_resnet(
        tmodel.state_dict(),
        {"params": template["params"],
         "batch_stats": template.get("batch_stats", {})},
        (2, 2, 2, 2), port_fc=True)
    warm = (ported, stats)

    loader = ArrayLoader(train_x, train_y, batch_size=BATCH, seed=seed)
    # bf16-default matmuls would drown the comparison (CLAUDE.md): fp32
    # single-pass precision for both training and the eval embeddings
    with jax.default_matmul_precision("float32"):
        result = fit(cfg, loader, use_mesh=False, warm_start=warm,
                     head_cfg=head_cfg)
        embed = make_embed_fn(result.backbone,
                              result.state.params["backbone"],
                              result.state.batch_stats)
        emb = embed_unique_images(embed, held_x, batch_size=BATCH)
    return emb, kernel


def run_parity(head="arcface", seed=0, epochs=EPOCHS):
    """Train both stacks to completion and evaluate under the identical
    protocol. Returns (jax VerificationResult, torch VerificationResult)."""
    from face_recognition_models_tpu.evaluation.verification import (
        kfold_verification)

    spec = HEAD_SPECS[head]
    ref_mod = _load_reference()
    train_x, train_y, held_x, held_y = _split(seed)
    pairs = _heldout_pairs(held_y, seed)

    torch.manual_seed(seed)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)

    if spec["warm"]:
        # stage 1 runs ONLY in torch and mutates tmodel in place — the
        # jax side below ports the stage-1-trained backbone, so both
        # stacks fine-tune from the IDENTICAL warm weights
        _train_torch(_arcface_torch(ref_mod, _stage1_kernel(seed)), tmodel,
                     train_x, train_y, seed, epochs, LR, ref=ref_mod)

    jemb, kernel = _train_and_eval_jax(head, tmodel, train_x, train_y,
                                       held_x, seed, epochs, spec["lr"])
    tnet = _train_torch(spec["make_torch"](ref_mod, kernel), tmodel,
                        train_x, train_y, seed, epochs, spec["lr"],
                        ref=ref_mod)
    temb = _embed_torch(tnet, held_x)

    jsims = np.sum(jemb[pairs[:, 0]] * jemb[pairs[:, 1]], axis=1)
    tsims = np.sum(temb[pairs[:, 0]] * temb[pairs[:, 1]], axis=1)
    return (kfold_verification(jsims, pairs[:, 2]),
            kfold_verification(tsims, pairs[:, 2]))


def _stage1_kernel(seed):
    """Deterministic stage-1 arcface kernel (torch-only stage; any shared
    draw works — the stage-1 head is discarded)."""
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.heads import get_head
    head_cfg = cfg_lib.make_head_config("arcface", feature_dim=D,
                                        num_classes=C)
    return get_head("arcface").init_kernel(
        jax.random.PRNGKey(seed + 77), head_cfg)


def _assert_parity(jres, tres, floor=90.0, tol=2.5, auc_tol=0.02):
    # parity is only meaningful if training WORKED in both stacks: at
    # chance (~50%) equal accuracies would certify nothing
    # (mean_accuracy is in PERCENT, like the reference's protocol output)
    assert tres.mean_accuracy > floor, \
        f"torch reference failed to converge ({tres.mean_accuracy:.3f}) — " \
        "the protocol is broken, not the parity"
    assert jres.mean_accuracy > floor, \
        f"jax stack failed to converge ({jres.mean_accuracy:.3f})"

    diff = abs(jres.mean_accuracy - tres.mean_accuracy)
    assert diff <= tol, \
        f"final verification diverged: jax {jres.mean_accuracy:.4f} " \
        f"(±{jres.std_accuracy:.4f}) vs torch {tres.mean_accuracy:.4f} " \
        f"(±{tres.std_accuracy:.4f})"
    assert abs(jres.mean_auc - tres.mean_auc) <= auc_tol


@pytest.mark.slow
def test_end_to_end_convergence_matches_reference():
    """Both stacks, trained to completion from identical weights on
    identical data, must reach the same held-out verification accuracy."""
    jres, tres = run_parity(head="arcface", seed=0)
    _assert_parity(jres, tres)


@pytest.mark.slow
def test_curricularface_convergence_parity():
    """CurricularFace to completion (warm-started, the reference's own
    practice): the EMA difficulty `t` composed over the full schedule must
    land both stacks at the same quality — the composition trajectory
    parity cannot certify (criterion.py:517, 570-575)."""
    jres, tres = run_parity(head="curricularface", seed=0)
    _assert_parity(jres, tres)


@pytest.mark.slow
def test_adaface_convergence_parity():
    """AdaFace to completion (cold start): the batch_mean/std norm EMAs
    composed over the full schedule (criterion.py:836-885)."""
    jres, tres = run_parity(head="adaface", seed=0)
    _assert_parity(jres, tres)


@pytest.mark.slow
def test_vpl_convergence_parity():
    """VPL-ArcFace to completion (cold start): the virtual-prototype
    memory LIFECYCLE composed over the full schedule — write, TTL decay,
    lamda=0.15 interpolation (criterion.py:702-726). Unlike QAFace's
    full-replacement dynamics, the gentle interpolation CONVERGES on the
    short protocol in both stacks: measured jax 97.73 vs torch 98.60 at
    seed 0 (0.87%) and 97.57 vs 97.49 at seed 1 (0.078%) — both inside
    fold-std (PERF.md round-5 table)."""
    jres, tres = run_parity(head="vpl_arcface", seed=0)
    _assert_parity(jres, tres)


@pytest.mark.slow
def test_elastic_convergence_parity():
    """ElasticArcFace to completion (warm, the round-4 rescue recipe):
    the sampled per-sample margins come from each framework's OWN rng —
    no shared stream exists across torch/jax — so this is
    DISTRIBUTION-level parity: the same protocol must CONVERGE to the
    same quality even though the step-level noise realizations differ.
    Measured over seeds 0-2 (PERF.md round-5 table): diffs 0.18/0.43/0.38
    — per-seed agreement tighter than several deterministic heads' seed
    spread, i.e. the margin distribution (N(m, std) clipped), not the
    realization, determines the converged model. Seed 0 pinned."""
    jres, tres = run_parity(head="elastic_arcface", seed=0)
    _assert_parity(jres, tres)


@pytest.mark.slow
def test_qaface_short_run_reference_measurement():
    """QAFace is a MEASUREMENT of the reference's own short-run dynamics,
    not a high-accuracy bar: PERF.md's root cause says the non-target
    memory replacement (criterion.py:1471-1476) depresses short warm-started
    runs. This trains the reference's own QAFace through the same
    warm-started protocol and asserts both stacks land in the same
    DEPRESSED, CHAOTIC band — per-seed point equality does not exist here:
    free-running QAFace sits on the s=64 memory-cosine cliff where a 2e-3
    perturbation swings the loss 20-65% (test_trajectory_parity docstring;
    that is why its per-step parity is re-synchronized). Measured band
    (PERF.md round 5, seeds 0-2): jax 77.8/96.1/77.4, torch 89.4/90.6/74.1
    — band means 83.8 vs 84.7, but per-seed gaps up to ~12 points with
    SIGN FLIPS between seeds (chaos, not bias; per-step math is certified
    exact by the resync test). Assertion:
    both stacks clear a 70% floor (the warm backbone learned through the
    head) and land within the measured 12.5-point chaos band of each
    other. Seed 1 is pinned (measured diff 5.5)."""
    jres, tres = run_parity(head="qaface", seed=1)
    _assert_parity(jres, tres, floor=70.0, tol=12.5, auc_tol=0.15)


if __name__ == "__main__":
    import argparse
    import json

    # standalone runs must not grab the (possibly busy) TPU tunnel; pytest
    # runs get this from conftest.py
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--head", default="arcface", choices=sorted(HEAD_SPECS))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=EPOCHS)
    args = ap.parse_args()

    jres, tres = run_parity(head=args.head, seed=args.seed,
                            epochs=args.epochs)
    print(json.dumps({
        "metric": "convergence_parity", "head": args.head,
        "seed": args.seed, "warm": HEAD_SPECS[args.head]["warm"],
        "lr": HEAD_SPECS[args.head]["lr"],
        "epochs": args.epochs, "classes": C, "image_size": IMAGE,
        "jax_accuracy": round(jres.mean_accuracy, 4),
        "jax_std": round(jres.std_accuracy, 4),
        "jax_auc": round(jres.mean_auc, 5),
        "torch_accuracy": round(tres.mean_accuracy, 4),
        "torch_std": round(tres.std_accuracy, 4),
        "torch_auc": round(tres.mean_auc, 5),
        "abs_diff": round(abs(jres.mean_accuracy - tres.mean_accuracy), 4),
    }))
