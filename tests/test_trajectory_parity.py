"""End-to-end training-trajectory parity vs the reference pipeline.

The forward-parity harness (test_reference_parity.py) checks each head under
torch.no_grad(); heads, SGD semantics, and schedules are each tested in
isolation elsewhere. This test runs the COMPOSITION the reference actually
trains (model_utils.py:147-216, 556-559): backbone -> margin head -> CE +
SGD(momentum 0.9, weight decay 5e-4 on ALL params) + CustomStepLR stepped
per epoch — in BOTH stacks, from identical initial weights (ported via
utils/torch_port.py) on identical batches, and asserts the loss / acc1 /
feature-norm trajectories and the final weight drift track within a stated
tolerance. This catches the class of bug forward parity cannot: backward
formulas through the margin, BN train-mode statistics, wd-on-BN-params,
momentum ordering, and LR-change timing.

Torch side: the reference's own heads (/root/reference criterion.py) and
CustomStepLR (schedulers.py:3-14), with the torchvision-v1.5-compatible
ResNet replica from test_pretrained_port (torchvision itself is not
installed here). JAX side: the real production path — create_train_state +
make_train_step + get_optimizer + get_schedule, fp32 compute with
HIGHEST-precision matmuls (bf16-default matmuls would drown the comparison).

Tolerances (documented in README "Testing"), set at ~4x the measured
divergence over 12 steps (max loss rel err 4.3e-4, max feat-norm rel err
4.7e-3 — fp reassociation differences compound through the recipe's own
chaotic dynamics, feature norms explode 5 -> ~600 under lr=0.1):
per-step relative loss <= 2e-3, feat-norm <= 1.5e-2, LR exact, acc1 within
one sample, final backbone/kernel drift cosine > 0.999.
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

# tiny-but-real config: full ResNet-18 graph at 32px
N, D, C = 16, 64, 12
IMAGE = 32
EPOCHS, STEPS_PER_EPOCH = 3, 4       # 12 steps; LR drops after epochs 1, 2
LR, MOMENTUM, WD = 0.1, 0.9, 5e-4    # the reference's exact hardcoded recipe
LR_STEPS, LR_RATIO = (1, 2), 0.1     # CustomStepLR boundaries inside the run


@pytest.fixture(scope="module")
def ref():
    """Reference criterion + schedulers with torchvision stubbed (only the
    *Net wrappers use torchvision; the heads and CustomStepLR do not)."""
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


def make_batches(seed, steps):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(steps):
        images = rs.uniform(-1.0, 1.0, (N, IMAGE, IMAGE, 3)).astype(np.float32)
        labels = rs.randint(0, C, N).astype(np.int32)
        out.append((images, labels))
    return out


def run_torch_reference(ref, head, tmodel, batches, lambda_g=0.0, lr=LR):
    """The reference recipe verbatim (model_utils.py:556-559, 569-578):
    CE + lambda_g * loss_g (model_utils.py:177-180) + SGD(momentum .9,
    wd 5e-4 over ALL params) + CustomStepLR stepped once per epoch;
    per-step loss/acc from the head's (pre, post) tuple."""

    class _Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = tmodel
            self.head = head

        def forward(self, x, labels):
            return self.head(self.backbone(x), labels)

    net = _Net().train()
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=MOMENTUM,
                          weight_decay=WD)
    scheduler = ref.sched.CustomStepLR(opt, steps=LR_STEPS, ratio=LR_RATIO)
    traj = []
    it = iter(batches)
    for _ in range(EPOCHS):
        for _ in range(STEPS_PER_EPOCH):
            images, labels = next(it)
            x = torch.from_numpy(images.transpose(0, 3, 1, 2))
            t = torch.from_numpy(labels.astype(np.int64))
            (pre, post), norms, loss_g, _ = net(x, t)
            loss = criterion(post, t) + lambda_g * loss_g
            acc1 = (pre.argmax(1) == t).float().mean().item() * 100.0
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj.append(dict(loss=loss.item(), acc1=acc1,
                             lr=opt.param_groups[0]["lr"],
                             feat_norm=float(norms.detach().float().mean())))
        scheduler.step()
    return net, traj


def run_jax_pipeline(head_name, tmodel, kernel_dc, batches, lambda_g=0.0,
                     lr=LR, **head_overrides):
    """The production path: create_train_state (+ ported torch weights) ->
    make_train_step with get_optimizer('sgd') and the customstep schedule."""
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.schedules import get_schedule
    from face_recognition_models_tpu.train.state import create_train_state
    from face_recognition_models_tpu.train.step import make_train_step
    from face_recognition_models_tpu.utils.torch_port import (
        port_torchvision_resnet)

    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head=head_name, num_classes=C,
        batch_size=N, epochs=EPOCHS, compute_dtype="float32",
        lambda_g=lambda_g,
        optimizer=cfg_lib.OptimizerConfig(
            name="sgd", learning_rate=lr, momentum=MOMENTUM,
            weight_decay=WD),
        schedule=cfg_lib.ScheduleConfig(name="customstep", steps=LR_STEPS,
                                        ratio=LR_RATIO),
        data=cfg_lib.DataConfig(image_size=IMAGE))
    head_cfg = cfg_lib.make_head_config(head_name, feature_dim=D,
                                        num_classes=C, **head_overrides)
    schedule = get_schedule(cfg.schedule, lr, STEPS_PER_EPOCH, EPOCHS)
    tx = get_optimizer("sgd", schedule, momentum=MOMENTUM, weight_decay=WD,
                       nesterov=False)
    backbone, head, state = create_train_state(cfg, head_cfg, tx)

    ported, stats = port_torchvision_resnet(
        tmodel.state_dict(),
        {"params": state.params["backbone"], "batch_stats": state.batch_stats},
        (2, 2, 2, 2), port_fc=True)
    params = {"backbone": jax.tree.map(jnp.asarray, ported),
              "kernel_w": jnp.asarray(kernel_dc)}
    state = state.replace(params=params,
                          batch_stats=jax.tree.map(jnp.asarray, stats),
                          opt_state=tx.init(params))

    step_fn = make_train_step(backbone, head, head_cfg, tx,
                              lambda_g=lambda_g, lr_schedule=schedule,
                              use_fused_head=False)
    with jax.default_matmul_precision("float32"):
        jit_step = jax.jit(step_fn)
        traj = []
        for images, labels in batches:
            state, metrics = jit_step(state, jnp.asarray(images),
                                      jnp.asarray(labels))
            traj.append({k: float(v) for k, v in metrics.items()})
    return state, traj


def assert_trajectories_match(jax_traj, torch_traj, loss_rtol=2e-3,
                              fn_rtol=1.5e-2):
    assert len(jax_traj) == len(torch_traj)
    for step, (j, t) in enumerate(zip(jax_traj, torch_traj)):
        assert abs(j["loss"] - t["loss"]) <= loss_rtol * max(1.0,
                                                             abs(t["loss"])), \
            f"loss diverged at step {step}: jax {j['loss']:.6f} vs torch " \
            f"{t['loss']:.6f}"
        assert j["lr"] == pytest.approx(t["lr"], rel=1e-6), \
            f"LR schedule timing mismatch at step {step}"
        assert abs(j["acc1"] - t["acc1"]) <= 100.0 / N + 1e-6, \
            f"acc1 off by more than one sample at step {step}"
        assert abs(j["feat_norm"] - t["feat_norm"]) <= \
            fn_rtol * max(1.0, t["feat_norm"]), f"feat_norm step {step}"


def assert_trajectories_track(jax_traj, torch_traj, first_steps_rtol=2e-3,
                              median_rtol=1e-1, max_rtol=3e-1, fn_rtol=1e-1,
                              acc_samples=4):
    """Chaos-tolerant variant for heads whose per-step loss is discontinuous
    in borderline elements (SphereFace's k = floor(m theta/pi), VPL's active
    mask and easy_margin=False branch): a single flipped element moves the
    mean loss by a finite amount, so a tight per-step max bound is
    seed-fragile. Instead: (1) the FIRST TWO steps — identical weights, one
    full optimizer/BN update cycle — must match tightly (this carries the
    exact-math weight); (2) the median per-step error must stay small and
    (3) the max bounded (divergence must jitter, not compound); LR timing
    stays exact. Final-state cosines are asserted by the caller."""
    assert len(jax_traj) == len(torch_traj)
    rels = []
    for step, (j, t) in enumerate(zip(jax_traj, torch_traj)):
        rel = abs(j["loss"] - t["loss"]) / max(1.0, abs(t["loss"]))
        rels.append(rel)
        if step < 2:
            assert rel <= first_steps_rtol, \
                f"exact-math divergence at step {step}: jax {j['loss']:.6f}" \
                f" vs torch {t['loss']:.6f} (rel {rel:.2e})"
        assert j["lr"] == pytest.approx(t["lr"], rel=1e-6), \
            f"LR schedule timing mismatch at step {step}"
        assert abs(j["acc1"] - t["acc1"]) <= acc_samples * 100.0 / N + 1e-6
        assert abs(j["feat_norm"] - t["feat_norm"]) <= \
            fn_rtol * max(1.0, t["feat_norm"]), f"feat_norm step {step}"
    assert float(np.median(rels)) <= median_rtol, \
        f"median loss divergence {np.median(rels):.3e} — systematic bias"
    assert max(rels) <= max_rtol, \
        f"loss divergence compounded to {max(rels):.3e}"


def _cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def make_kernel(seed):
    rs = np.random.RandomState(seed + 500)
    return (0.1 * rs.randn(D, C)).astype(np.float32)


def test_arcface_training_trajectory_matches_reference(ref):
    """ArcFace + ResNet-18 through the exact reference recipe: 12 steps,
    two CustomStepLR drops, loss/acc/lr/drift all tracked."""
    torch.manual_seed(0)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(0)
    head = ref.crit.ArcFace(D, C, device_id=None, s=64.0, m=0.5,
                            easy_margin=False)
    head.weight.data = torch.from_numpy(kernel.T.copy())
    batches = make_batches(0, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("arcface", tmodel, kernel, batches)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches)

    assert_trajectories_match(jtraj, ttraj)
    # final-weight drift: the trained tensors must still be the same weights
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.weight.detach().numpy().T) > 0.999
    assert _cos(np.asarray(jstate.params["backbone"]["conv1"]["kernel"]),
                tnet.backbone.conv1.weight.detach().numpy()
                .transpose(2, 3, 1, 0)) > 0.999
    # BN running stats follow torch's train-mode update rule (momentum 0.1,
    # unbiased var for the running update) closely enough to track
    bn = jstate.batch_stats["bn1"]
    t_bn_mean = tnet.backbone.bn1.running_mean.detach().numpy()
    np.testing.assert_allclose(np.asarray(bn["mean"]), t_bn_mean,
                               rtol=5e-2, atol=5e-3)


@pytest.mark.slow
def test_adaface_training_trajectory_matches_reference(ref):
    """AdaFace (stateful EMA head): the norm-EMA state evolves from live
    backbone features, so trajectory parity also checks the state feedback
    loop under training drift."""
    torch.manual_seed(1)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(1)
    head = ref.crit.AdaFace(D, C, m=0.4, h=0.333, s=64.0, t_alpha=0.99)
    head.kernel.data = torch.from_numpy(kernel.copy())
    batches = make_batches(1, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("adaface", tmodel, kernel, batches)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches)

    assert_trajectories_match(jtraj, ttraj)
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.kernel.detach().numpy()) > 0.999
    # the EMA buffers fed back into the margins must have tracked too
    np.testing.assert_allclose(
        float(np.asarray(jstate.head_state.batch_mean).ravel()[0]),
        float(tnet.head.batch_mean), rtol=2e-2)
    np.testing.assert_allclose(
        float(np.asarray(jstate.head_state.batch_std).ravel()[0]),
        float(tnet.head.batch_std), rtol=5e-2)


@pytest.mark.slow
def test_curricularface_training_trajectory_matches_reference(ref):
    """CurricularFace (EMA difficulty t + data-dependent hard-negative
    rescaling): the mask `cos > cos(theta+m)` depends on live training
    dynamics, so trajectory parity exercises the curriculum feedback the
    single-step parity tests cannot (criterion.py:491-587)."""
    torch.manual_seed(2)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(2)
    head = ref.crit.CurricularFace(D, C, m=0.5, s=64.0, momentum=0.01)
    head.kernel.data = torch.from_numpy(kernel.copy())
    batches = make_batches(2, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("curricularface", tmodel, kernel,
                                     batches)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches)

    # Looser per-step loss tolerance than arcface/adaface: the mask
    # `cos > cos(theta+m)` is DISCONTINUOUS, so an fp-reassociation
    # difference on one borderline cosine flips that element's curriculum
    # rescale and moves the step loss by a finite amount. Measured over 12
    # steps the divergence JITTERS in sign (max 1.0e-2, no compounding)
    # while t tracks to 0.17% — chaos, not bias; tolerance at ~4x measured.
    assert_trajectories_match(jtraj, ttraj, loss_rtol=4e-2, fn_rtol=5e-2)
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.kernel.detach().numpy()) > 0.999
    # the EMA difficulty buffer fed back into hard-negative scaling must
    # have tracked through all 12 steps
    np.testing.assert_allclose(
        float(np.asarray(jstate.head_state.t).ravel()[0]),
        float(tnet.head.t), rtol=2e-2, atol=1e-4)


@pytest.mark.slow
def test_sphereface_training_trajectory_matches_reference(ref):
    """SphereFace (python-side iteration counter): the annealing
    lambda = max(5, 1000*(1+0.12*iter)^-1) decays per STEP (criterion.py:58-60),
    and the logits are scaled by the live feature norm rather than a constant
    s (criterion.py:95,105) — so trajectory parity checks both the annealing
    clock and the norm-feedback loop as features grow under training.

    Runs at lr=0.01 rather than the recipe's 0.1: the norm-scaled logits make
    the CE loss sensitivity proportional to the LIVE feature norm, and at
    lr=0.1 the norms blow past 30 by step 3, amplifying fp-reassociation
    jitter into ~15% sign-alternating loss differences (measured; steps 0-1
    still track to 1e-6/3e-4, i.e. chaos, not bias). At lr=0.01 the same
    composition — backward through the Chebyshev margin, the annealing clock,
    CustomStepLR timing — is tested with sane dynamics."""
    lr = 0.01
    torch.manual_seed(4)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(4)
    head = ref.crit.SphereFace(D, C, device_id=None, m=2)  # config.py:17
    head.weight.data = torch.from_numpy(kernel.T.copy())
    batches = make_batches(4, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("sphereface", tmodel, kernel, batches,
                                     lr=lr)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches, lr=lr)

    # phi(theta) = (-1)^k cos(m theta) - 2k: with random weights most target
    # cosines sit near theta = pi/2, ON the k=0/1 boundary, so per-step
    # losses jitter (measured max 1.6e-1, sign-alternating, median 4.4e-2,
    # final kernel cos 0.99996 — chaos, not bias). Chaos-tolerant assertion.
    assert_trajectories_track(jtraj, ttraj)
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.weight.detach().numpy().T) > 0.999
    # the annealing clock must have ticked once per step in both stacks
    assert int(np.asarray(jstate.head_state.iter)) == tnet.head.iter \
        == EPOCHS * STEPS_PER_EPOCH


@pytest.mark.slow
def test_vpl_arcface_training_trajectory_matches_reference(ref):
    """VPL-ArcFace (class-memory lifecycle): per-class feature-mean memory
    written each step, lifetimes decayed, expired classes dropping out of
    the cosine blend (criterion.py:702-726). delta=3 (vs the production 100)
    forces activation AND expiry inside the 12-step run, so the trajectory
    exercises the full memory lifecycle against live training features.

    Runs at lr=0.01: at the recipe's 0.1 the raw-feature memory blend drives
    feature norms past 800 by step 4 (measured; losses still track to 2.4e-2
    and life/mem/kernel state to 0.996+ cosine), and the pre-margin argmax
    used for acc1 flips by 2/16 samples on borderline steps. Lower LR keeps
    the identical composition under test with stable accuracy readings."""
    delta = 3
    lr = 0.01
    torch.manual_seed(5)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(5)
    head = ref.crit.VPLArcFace(D, C, s=64.0, m=0.5, easy_margin=False,
                               lamda=0.15, delta=delta, device_id=None)
    head.weight.data = torch.from_numpy(kernel.T.copy())
    batches = make_batches(5, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("vpl_arcface", tmodel, kernel, batches,
                                     lr=lr, delta=delta)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches, lr=lr)

    # The easy_margin=False branch is discontinuous: one borderline element
    # flipping moves that logit by mm*s ~ 38, i.e. up to ~2.4 mean loss at
    # N=16 (measured: max rel 4.9e-2 sign-alternating, median 1.4e-2,
    # kernel cos 0.995). Chaos-tolerant assertion.
    assert_trajectories_track(jtraj, ttraj)
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.weight.detach().numpy().T) > 0.99
    # lifecycle timing: the life counters are integer-valued and depend only
    # on WHICH classes appeared in which batch — they must agree exactly
    np.testing.assert_array_equal(np.asarray(jstate.head_state.life),
                                  tnet.head.life.detach().numpy())
    # the memory rows (last written feature means) must be the same vectors
    # (measured 0.981 at lr=0.01 — raw-feature means inherit backbone drift)
    assert _cos(np.asarray(jstate.head_state.mem),
                tnet.head.mem.detach().numpy()) > 0.95


@pytest.mark.slow
def test_cosface_training_trajectory_matches_reference(ref):
    """CosFace (additive cosine margin, criterion.py:137-197): the margin is
    continuous in the cosines, but the 1e-4 clamp (:177) is a GRADIENT
    discontinuity — once norms saturate (5 -> ~60 by step 4 even at lr=0.01)
    borderline cosines sit on the clamp and fp noise flips their gradient
    off/on. Measured chaos probe: perturbing the torch kernel alone by 1e-6
    and rerunning torch-vs-torch gives rel loss divergence 2.9e-4 at step 2
    and up to 2e-2 later — the same envelope as jax-vs-torch — so a tight
    per-step bound is seed-fragile and the chaos-tolerant assertion is the
    honest one. Steps 0-1 (identical weights + one full update cycle) still
    carry the exact-math weight."""
    lr = 0.01
    torch.manual_seed(6)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(6)
    head = ref.crit.CosFace(embedding_size=D, classnum=C, s=64.0, m=0.35)
    head.kernel.data = torch.from_numpy(kernel.copy())
    batches = make_batches(6, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("cosface", tmodel, kernel, batches,
                                     lr=lr)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches, lr=lr)

    assert_trajectories_track(jtraj, ttraj)
    # drift cosines inherit the chaos (measured 0.9987/0.999+): 0.99 as in
    # the other chaos-tolerant heads
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.kernel.detach().numpy()) > 0.99
    assert _cos(np.asarray(jstate.params["backbone"]["conv1"]["kernel"]),
                tnet.backbone.conv1.weight.detach().numpy()
                .transpose(2, 3, 1, 0)) > 0.99


@pytest.mark.slow
def test_mv_softmax_training_trajectory_matches_reference(ref):
    """MV-Softmax 'am' (criterion.py:327-451): the hard-example mask
    `cos > target_cos - m` rescales EVERY non-target cosine above a
    per-row threshold by mv_weight, so the backward is dominated by a
    data-dependent mask that no other head exercises. The mask is
    discontinuous in ~half the [N, C] entries at init (random cosines
    straddle the threshold), hence the chaos-tolerant assertion; the first
    two steps carry the exact-math weight."""
    torch.manual_seed(7)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(7)
    head = ref.crit.MV_Softmax(D, C, margin=0.35, mv_weight=1.12, s=32.0,
                               margin_type="am")
    head.weight.data = torch.from_numpy(kernel.T.copy())
    batches = make_batches(7, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("mv_softmax", tmodel, kernel, batches,
                                     margin_type="am")
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches)

    assert_trajectories_track(jtraj, ttraj)
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.weight.detach().numpy().T) > 0.999


@pytest.mark.slow
def test_elastic_arcface_training_trajectory_matches_reference(ref):
    """ElasticArcFace at std=0 (criterion.py:1054-1154): torch RNG margins
    cannot be replayed in JAX (distributional parity is tested in
    test_reference_parity.py), but std=0 makes the sampled margin exactly m
    on both sides, so the full elastic code path — acos -> theta+m clamp to
    [0, pi] -> cos, gather/scatter on the target column — trains through the
    real recipe. Distinct from arcface's cos_m/sin_m identity: this pins the
    backward THROUGH acos/clamp, whose -1/sqrt(1-x^2) gradient amplifies
    first-update fp noise near the 1e-7 clamp (:1104).

    Step-1 tolerance is 5e-3, calibrated by a measured noise-response
    probe: a step-0 gradient diff (grad_probe) shows jax-vs-torch conv
    backward reassociation noise of ~1e-4 relative on the updated params
    (identical for arcface, whose trajectory tracks tightly — the head
    backward is exact); perturbing ALL torch params by that same 1e-4
    scale and rerunning torch-vs-torch lands step 1 at 49.613251 vs the
    jax run's 49.613449 (rel 4e-6) — the step-1 divergence is the
    recipe's own noise response, not head math."""
    lr = 0.01
    torch.manual_seed(8)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(8)
    head = ref.crit.ElasticArcFace(D, C, s=64.0, m=0.5, std=0.0, plus=False)
    head.kernel.data = torch.from_numpy(kernel.copy())
    batches = make_batches(8, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("elastic_arcface", tmodel, kernel,
                                     batches, std=0.0, plus=False, lr=lr)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches, lr=lr)

    assert_trajectories_track(jtraj, ttraj, first_steps_rtol=5e-3)
    # measured 0.9981 under the recipe's chaos — 0.99 as in vpl/sphereface
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.kernel.detach().numpy()) > 0.99


@pytest.mark.slow
def test_elastic_cosface_training_trajectory_matches_reference(ref):
    """ElasticCosFace at std=0 (criterion.py:951-1030): the additive margin
    through the reference's gather/scatter-on-target path (distinct from
    CosFace's one-hot subtraction — the backward routes the target gradient
    through an index_put instead of a mask) with the tighter 1e-7 clamp
    (:994 vs CosFace's 1e-4). Completes the 11-head trajectory matrix.
    std=0 makes the sampled margin exactly m on both sides (torch RNG is
    not replayable in JAX; distributional parity is tested separately).
    lr=0.01 + chaos-tolerant assertion for the same measured
    clamp-saturation reason as cosface."""
    lr = 0.01
    torch.manual_seed(10)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(10)
    head = ref.crit.ElasticCosFace(D, C, s=64.0, m=0.35, std=0.0,
                                   plus=False)
    head.kernel.data = torch.from_numpy(kernel.copy())
    batches = make_batches(10, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("elastic_cosface", tmodel, kernel,
                                     batches, std=0.0, plus=False, lr=lr)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches, lr=lr)

    assert_trajectories_track(jtraj, ttraj, first_steps_rtol=5e-3)
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.kernel.detach().numpy()) > 0.99


@pytest.mark.slow
def test_qaface_training_resync_parity_vs_reference(ref):
    """QAFace (quality memory + magnitude EMA, criterion.py:1331-1506):
    the injection mask exp(-z) is a LIVE function of the magnitude EMA
    (muy/std buffers), and its gradient flows into the backbone through
    both the target-injection blend and the EMA update itself — the only
    head where a buffer update is inside the differentiated path. delta=3
    forces memory activation AND expiry inside the 12 steps. minput falls
    back to the clean features on both sides (the reference QAFaceNet's
    own fallback, criterion.py:1545-1547, modulo its labels-slot bug
    documented in heads/margins.py).

    RE-SYNCHRONIZED per-step parity instead of a free-running trajectory:
    early in training all features are near-identical, so the memory
    cosines (criterion.py:1471-1476) pin at the 1e-7 clamp and the s=64
    CE sits on a cliff — a measured probe perturbing torch params by the
    2e-3 conv-backward-noise scale swings the torch-vs-torch step-1 loss
    by 20% (and 65% later), so ANY envelope wide enough to pass free-
    running is too wide to mean anything. Instead, before every one of
    the 12 steps the full torch state (backbone params + BN running
    stats + head kernel + mem/life/muy/std buffers + SGD momentum) is
    ported into the jax TrainState, ONE production step runs on the same
    batch, and the step's loss/acc/feat-norm AND every post-step state
    update are asserted tightly against torch's — chaos cannot
    accumulate, and every step is checked along the reference's own
    trajectory (isolation measured: rel loss 1e-6 at the wildest step)."""
    delta = 3
    lr = 0.01
    torch.manual_seed(9)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(9)
    inner = ref.crit.QAFace(D, C, s=64.0, m=0.5, easy_margin=False,
                            delta=delta, tto=2.0, alpha=0.99)
    inner.weight.data = torch.from_numpy(kernel.T.copy())

    class _SelfMinput(torch.nn.Module):
        """The trajectory harness feeds head(feats, labels); QAFace takes
        (feats, minput, labels) — mirror the jax step's minput=feats
        fallback.

        Also detaches the muy/std EMA buffers BETWEEN steps: the reference
        assigns them from live tensors (criterion.py:1445-1448), so its own
        second backward crashes with 'backward through the graph a second
        time' — the head is untrainable as written past step 1 (reference
        bug; README 'Differences'). Within-step gradient through the EMA
        still flows on both sides; the JAX state pytree is concrete across
        steps, which is exactly what per-step detach reproduces."""

        def __init__(self):
            super().__init__()
            self.inner = inner

        def forward(self, feats, labels):
            self.inner.muy = self.inner.muy.detach()
            self.inner.std = self.inner.std.detach()
            return self.inner(feats, feats, labels)

    batches = make_batches(9, EPOCHS * STEPS_PER_EPOCH)

    # ---- torch: the reference recipe, snapshotting state BEFORE each step
    net_head = _SelfMinput()

    class _Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone, self.head = tmodel, net_head

        def forward(self, x, labels):
            return self.head(self.backbone(x), labels)

    net = _Net().train()
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=MOMENTUM,
                          weight_decay=WD)
    scheduler = ref.sched.CustomStepLR(opt, steps=LR_STEPS, ratio=LR_RATIO)

    def snapshot():
        sd = {k: v.detach().clone()
              for k, v in net.backbone.state_dict().items()}
        # momentum buffers keyed like the state_dict so the same porter maps
        # them; zeros before the first update (torch SGD first-step buf=grad
        # == mu*0+grad, matching fused_sgd's zeros init)
        mom_sd = dict(sd)
        for name, p in net.backbone.named_parameters():
            buf = opt.state.get(p, {}).get("momentum_buffer")
            mom_sd[name] = (buf.detach().clone() if buf is not None
                            else torch.zeros_like(p))
        kbuf = opt.state.get(inner.weight, {}).get("momentum_buffer")
        return dict(
            sd=sd, mom_sd=mom_sd,
            kernel=inner.weight.detach().numpy().T.copy(),
            kmom=(kbuf.detach().numpy().T.copy() if kbuf is not None
                  else np.zeros((D, C), np.float32)),
            mem=inner.mem.detach().numpy().copy(),
            life=inner.life.detach().numpy().copy(),
            muy=float(inner.muy), std=float(inner.std))

    snaps, ttraj = [], []
    it = iter(batches)
    for _ in range(EPOCHS):
        for _ in range(STEPS_PER_EPOCH):
            images, labels = next(it)
            snaps.append(snapshot())
            x = torch.from_numpy(images.transpose(0, 3, 1, 2))
            t = torch.from_numpy(labels.astype(np.int64))
            (pre, post), norms, loss_g, _ = net(x, t)
            loss = criterion(post, t)
            acc1 = (pre.argmax(1) == t).float().mean().item() * 100.0
            opt.zero_grad()
            loss.backward()
            opt.step()
            ttraj.append(dict(loss=loss.item(), acc1=acc1,
                              lr=opt.param_groups[0]["lr"],
                              feat_norm=float(norms.detach().float().mean())))
        scheduler.step()
    snaps.append(snapshot())  # post-final state for the last step's asserts

    # ---- jax: one production step from each ported snapshot
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.heads.margins import QAFaceState
    from face_recognition_models_tpu.train.optim import (FusedSGDState,
                                                         get_optimizer)
    from face_recognition_models_tpu.train.schedules import get_schedule
    from face_recognition_models_tpu.train.state import create_train_state
    from face_recognition_models_tpu.train.step import make_train_step
    from face_recognition_models_tpu.utils.torch_port import (
        port_torchvision_resnet)

    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="qaface", num_classes=C, batch_size=N,
        epochs=EPOCHS, compute_dtype="float32",
        optimizer=cfg_lib.OptimizerConfig(name="sgd", learning_rate=lr,
                                          momentum=MOMENTUM,
                                          weight_decay=WD),
        schedule=cfg_lib.ScheduleConfig(name="customstep", steps=LR_STEPS,
                                        ratio=LR_RATIO),
        data=cfg_lib.DataConfig(image_size=IMAGE))
    head_cfg = cfg_lib.make_head_config("qaface", feature_dim=D,
                                        num_classes=C, delta=delta)
    schedule = get_schedule(cfg.schedule, lr, STEPS_PER_EPOCH, EPOCHS)
    tx = get_optimizer("sgd", schedule, momentum=MOMENTUM, weight_decay=WD,
                       nesterov=False)
    backbone, head, base_state = create_train_state(cfg, head_cfg, tx)
    template = {"params": base_state.params["backbone"],
                "batch_stats": base_state.batch_stats}
    step_fn = make_train_step(backbone, head, head_cfg, tx,
                              lr_schedule=schedule, use_fused_head=False)

    def to_state(k, snap):
        ported, stats = port_torchvision_resnet(snap["sd"], template,
                                                (2, 2, 2, 2), port_fc=True)
        mom, _ = port_torchvision_resnet(snap["mom_sd"], template,
                                         (2, 2, 2, 2), port_fc=True)
        params = {"backbone": jax.tree.map(jnp.asarray, ported),
                  "kernel_w": jnp.asarray(snap["kernel"])}
        trace = {"backbone": jax.tree.map(jnp.asarray, mom),
                 "kernel_w": jnp.asarray(snap["kmom"])}
        hs = QAFaceState(mem=jnp.asarray(snap["mem"]),
                         life=jnp.asarray(snap["life"]),
                         muy=jnp.asarray(snap["muy"], jnp.float32),
                         std=jnp.asarray(snap["std"], jnp.float32),
                         training_flag=jnp.bool_(True))
        return base_state.replace(
            step=jnp.asarray(k, jnp.int32), params=params,
            batch_stats=jax.tree.map(jnp.asarray, stats),
            opt_state=FusedSGDState(count=jnp.asarray(k, jnp.int32),
                                    trace=trace),
            head_state=hs)

    with jax.default_matmul_precision("float32"):
        jit_step = jax.jit(step_fn)
        for k, ((images, labels), t) in enumerate(zip(batches, ttraj)):
            state_k = to_state(k, snaps[k])
            new_state, m = jit_step(state_k, jnp.asarray(images),
                                    jnp.asarray(labels))
            # step metrics vs the reference's step along ITS trajectory
            assert abs(float(m["loss"]) - t["loss"]) <= \
                1e-3 * max(1.0, abs(t["loss"])), \
                f"step {k}: loss {float(m['loss']):.6f} vs {t['loss']:.6f}"
            assert float(m["lr"]) == pytest.approx(t["lr"], rel=1e-6), \
                f"step {k}: LR timing"
            assert abs(float(m["acc1"]) - t["acc1"]) <= 100.0 / N + 1e-6
            assert abs(float(m["feat_norm"]) - t["feat_norm"]) <= \
                1e-3 * max(1.0, t["feat_norm"]), f"step {k}: feat_norm"
            # post-step updates vs the torch post-step snapshot
            nxt, hs = snaps[k + 1], new_state.head_state
            np.testing.assert_allclose(
                np.asarray(new_state.params["kernel_w"]), nxt["kernel"],
                atol=1e-4, err_msg=f"step {k}: kernel update")
            np.testing.assert_array_equal(np.asarray(hs.life), nxt["life"],
                                          err_msg=f"step {k}: life")
            np.testing.assert_allclose(float(hs.muy), nxt["muy"], rtol=1e-3,
                                       err_msg=f"step {k}: muy EMA")
            np.testing.assert_allclose(float(hs.std), nxt["std"], rtol=1e-3,
                                       err_msg=f"step {k}: std EMA")
            np.testing.assert_allclose(np.asarray(hs.mem), nxt["mem"],
                                       rtol=1e-3, atol=1e-5,
                                       err_msg=f"step {k}: memory update")


@pytest.mark.slow
def test_magface_training_trajectory_matches_reference(ref):
    """MagFace with lambda_g > 0 (model_utils.py:177-180): the per-sample
    margin AND the magnitude regularizer both depend on the UNNORMALIZED
    feature norm, so the loss_g gradient flows into the backbone and feeds
    back into next step's adaptive margin — a dynamics class none of the
    other trajectory tests exercise (criterion.py:1178-1301; lambda_g wired
    per model_utils.py:180/482)."""
    lambda_g = 20.0  # the MagFace paper's operating range; default cfg is 0
    torch.manual_seed(3)
    tmodel = _TorchResNet(_BasicBlock, (2, 2, 2, 2), embed_dim=D)
    kernel = make_kernel(3)
    head = ref.crit.MagFace(D, C, s=64.0, easy_margin=False,
                            l_margin=0.45, u_margin=0.8, l_a=10.0,
                            u_a=110.0, device_id=None)
    head.kernel.data = torch.from_numpy(kernel.copy())
    batches = make_batches(3, EPOCHS * STEPS_PER_EPOCH)

    jstate, jtraj = run_jax_pipeline("magface", tmodel, kernel, batches,
                                     lambda_g=lambda_g)
    tnet, ttraj = run_torch_reference(ref, head, tmodel, batches,
                                      lambda_g=lambda_g)

    # Looser than arcface: like curricularface, magface's easy_margin=False
    # branch `cos > cos(pi - m)` is discontinuous per-element, and the
    # norm-clamp at l_a/u_a adds two more; borderline elements jitter the
    # step loss without compounding.
    assert_trajectories_match(jtraj, ttraj, loss_rtol=4e-2, fn_rtol=5e-2)
    assert _cos(np.asarray(jstate.params["kernel_w"]),
                tnet.head.kernel.detach().numpy()) > 0.999
    assert _cos(np.asarray(jstate.params["backbone"]["conv1"]["kernel"]),
                tnet.backbone.conv1.weight.detach().numpy()
                .transpose(2, 3, 1, 0)) > 0.999
