"""Direct parity harness vs the reference's OWN torch heads (SURVEY §4 item 6).

Imports the actual `/root/reference/main_code/utils/criterion.py` (torch on
CPU, fp32 — the cuda autocast contexts self-disable without CUDA), feeds the
identical inputs and initial weights to the JAX heads, and asserts that
post-margin logits, pre-margin logits, norms, loss_g, and the multi-step
EMA/memory state SEQUENCES match to fp32 tolerance. Unlike the NumPy-oracle
tests (test_margin_parity.py), this checks parity with the reference's math
quirks included (AdaFace t_alpha weighting, MagFace clamped-norm return,
VPL/QAFace memory lifecycles).

Elastic heads sample margins with torch RNG that cannot be replayed in JAX;
they are tested with std=0 (margin == m exactly, plus-mode rank composition
still exercised), which makes both sides deterministic.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_PATH = "/root/reference/main_code"

N, D, C = 8, 16, 24
TOL = dict(rtol=2e-5, atol=5e-4)  # fp32, logits scaled by s<=64


@pytest.fixture(scope="module")
def ref():
    """Import the reference criterion module with torchvision stubbed
    (torchvision is not installed here; only the *Net wrappers use it and
    those are not under test — the heads are)."""
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
    return crit


def make_batches(seed, steps, norm_lo=5.0, norm_hi=30.0):
    """Batches of raw (unnormalized) features with controlled norms so the
    norm-adaptive heads (AdaFace, MagFace, QAFace) see real variation."""
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(steps):
        dirs = rs.randn(N, D).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        norms = rs.uniform(norm_lo, norm_hi, (N, 1)).astype(np.float32)
        labels = rs.randint(0, C, N).astype(np.int32)
        out.append(((dirs * norms).astype(np.float32), labels))
    return out


def make_kernel(seed):
    """[D, C] kernel; the torch heads that use [C, D] get its transpose."""
    rs = np.random.RandomState(seed + 1000)
    return rs.randn(D, C).astype(np.float32)


def run_jax(name, kernel_dc, batches, minputs=None, **overrides):
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.heads import get_head

    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C,
                                   **overrides)
    head = get_head(name)
    state = head.init_state(cfg)
    outs = []
    for i, (feats, labels) in enumerate(batches):
        mi = None if minputs is None else jnp.asarray(minputs[i])
        out = head.apply(cfg, jnp.asarray(kernel_dc), jnp.asarray(feats),
                         jnp.asarray(labels), state,
                         rng=jax.random.PRNGKey(i), minput=mi)
        state = out.state
        outs.append(out)
    return outs


def run_torch(module, batches, minputs=None):
    outs = []
    with torch.no_grad():
        for i, (feats, labels) in enumerate(batches):
            tf = torch.from_numpy(feats)
            tl = torch.from_numpy(labels.astype(np.int64))
            if minputs is not None:
                res = module(tf, torch.from_numpy(minputs[i]), tl)
            else:
                res = module(tf, tl)
            logit_list, norms, loss_g, one_hot = res
            outs.append(dict(
                pre=logit_list[0].float().numpy(),
                post=logit_list[1].float().numpy(),
                norms=np.asarray(norms.float().numpy()).reshape(-1),
                loss_g=float(np.asarray(loss_g)),
                state={k: v.detach().clone().numpy()
                       for k, v in module.state_dict().items()
                       if k not in ("weight", "kernel", "cos_m", "sin_m",
                                    "th", "mm")},
            ))
    return outs


def assert_steps_match(jax_outs, torch_outs, check_loss_g=False,
                       state_keys=()):
    for step, (jo, to) in enumerate(zip(jax_outs, torch_outs)):
        np.testing.assert_allclose(np.asarray(jo.logits), to["post"],
                                   err_msg=f"post logits step {step}", **TOL)
        np.testing.assert_allclose(np.asarray(jo.pre_logits), to["pre"],
                                   err_msg=f"pre logits step {step}", **TOL)
        np.testing.assert_allclose(np.asarray(jo.norms).reshape(-1),
                                   to["norms"],
                                   err_msg=f"norms step {step}", **TOL)
        if check_loss_g:
            np.testing.assert_allclose(float(jo.loss_g), to["loss_g"],
                                       err_msg=f"loss_g step {step}", **TOL)
        for jkey, tkey in state_keys:
            jval = np.asarray(getattr(jo.state, jkey), np.float32).reshape(-1)
            tval = to["state"][tkey].astype(np.float32).reshape(-1)
            np.testing.assert_allclose(
                jval, tval, err_msg=f"state {jkey} step {step}", **TOL)


# ---------------------------------------------------------------------------
# Stateless / simple heads
# ---------------------------------------------------------------------------


def test_cosface_matches_reference(ref):
    kernel = make_kernel(0)
    batches = make_batches(0, 3)
    head = ref.CosFace(embedding_size=D, classnum=C, s=64.0, m=0.35)
    head.kernel.data = torch.from_numpy(kernel.copy())
    assert_steps_match(run_jax("cosface", kernel, batches),
                       run_torch(head, batches))


def test_arcface_matches_reference(ref):
    kernel = make_kernel(1)
    batches = make_batches(1, 3)
    head = ref.ArcFace(D, C, device_id=None, s=64.0, m=0.5, easy_margin=False)
    head.weight.data = torch.from_numpy(kernel.T.copy())
    assert_steps_match(run_jax("arcface", kernel, batches),
                       run_torch(head, batches))


def test_arcface_easy_margin_matches_reference(ref):
    kernel = make_kernel(2)
    batches = make_batches(2, 2)
    head = ref.ArcFace(D, C, device_id=None, s=64.0, m=0.5, easy_margin=True)
    head.weight.data = torch.from_numpy(kernel.T.copy())
    assert_steps_match(run_jax("arcface", kernel, batches, easy_margin=True),
                       run_torch(head, batches))


def test_sphereface_matches_reference(ref):
    """Sequence test: SphereFace's annealing lambda depends on the python-side
    iter counter (criterion.py:33, :58-60)."""
    kernel = make_kernel(3)
    batches = make_batches(3, 4)
    head = ref.SphereFace(D, C, m=2)
    head.weight.data = torch.from_numpy(kernel.T.copy())
    assert_steps_match(run_jax("sphereface", kernel, batches),
                       run_torch(head, batches))


@pytest.mark.parametrize("margin_type", ["am", "arc"])
def test_mv_softmax_matches_reference(ref, margin_type):
    kernel = make_kernel(4)
    batches = make_batches(4, 3)
    head = ref.MV_Softmax(D, C, margin=0.35, mv_weight=1.12, s=32.0,
                          margin_type=margin_type)
    head.weight.data = torch.from_numpy(kernel.T.copy())
    assert_steps_match(
        run_jax("mv_softmax", kernel, batches, margin_type=margin_type),
        run_torch(head, batches))


def test_magface_matches_reference(ref):
    """MagFace quirks: loss_g regularizer and the CLAMPED norm return
    (criterion.py:1235-1238, :1290)."""
    kernel = make_kernel(5)
    # norms spanning beyond [l_a, u_a] to exercise the clamp
    batches = make_batches(5, 3, norm_lo=5.0, norm_hi=130.0)
    head = ref.MagFace(D, C, s=64.0, easy_margin=False)
    head.kernel.data = torch.from_numpy(kernel.copy())
    assert_steps_match(run_jax("magface", kernel, batches),
                       run_torch(head, batches), check_loss_g=True)


# ---------------------------------------------------------------------------
# Elastic heads (std=0 -> deterministic margin == m on both sides)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("plus", [False, True])
def test_elastic_arcface_matches_reference(ref, plus):
    kernel = make_kernel(6)
    batches = make_batches(6, 2)
    head = ref.ElasticArcFace(D, C, s=64.0, m=0.5, std=0.0, plus=plus)
    head.kernel.data = torch.from_numpy(kernel.copy())
    assert_steps_match(
        run_jax("elastic_arcface", kernel, batches, std=0.0, plus=plus),
        run_torch(head, batches))


@pytest.mark.parametrize("plus", [False, True])
def test_elastic_cosface_matches_reference(ref, plus):
    kernel = make_kernel(7)
    batches = make_batches(7, 2)
    head = ref.ElasticCosFace(D, C, s=64.0, m=0.35, std=0.0, plus=plus)
    head.kernel.data = torch.from_numpy(kernel.copy())
    assert_steps_match(
        run_jax("elastic_cosface", kernel, batches, std=0.0, plus=plus),
        run_torch(head, batches))


# ---------------------------------------------------------------------------
# Elastic heads under REAL randomness: torch RNG cannot be replayed in JAX,
# but (a) the sampled-margin DISTRIBUTION must match (two-sample KS vs the
# reference's clipped-normal sampler, criterion.py:1003-1005) and (b) the
# plus-mode rank composition must be the reference's exact GATHER
# `sort(margin)[argsort(-target_cos)]` (criterion.py:1007-1012) — a
# self-consistency identity checkable per side without shared RNG.
# ---------------------------------------------------------------------------


def _extract_margins(head_name, pre, post, labels, s):
    """Recover the per-sample margin a head applied from its (pre, post)
    logits. cos-mode: m = (pre - post)[target] / s; arc-mode:
    m = acos(post_t/s) - acos(pre_t/s) (valid while acos(t)+m < pi)."""
    idx = np.arange(len(labels))
    pre_t = pre[idx, labels] / s
    post_t = post[idx, labels] / s
    if "cos" in head_name:
        return pre_t - post_t
    return np.arccos(np.clip(post_t, -1, 1)) - np.arccos(np.clip(pre_t, -1, 1))


def _jax_sampled_margins(name, kernel, batches, plus):
    outs = run_jax(name, kernel, batches, std=0.05, plus=plus)
    res = []
    for (feats, labels), out in zip(batches, outs):
        res.append((_extract_margins(name, np.asarray(out.pre_logits),
                                     np.asarray(out.logits), labels, 64.0),
                    labels, feats))
    return res


def _torch_sampled_margins(ref, name, kernel, batches, plus):
    cls = ref.ElasticCosFace if "cos" in name else ref.ElasticArcFace
    m = 0.35 if "cos" in name else 0.5
    head = cls(D, C, s=64.0, m=m, std=0.05, plus=plus)
    head.kernel.data = torch.from_numpy(kernel.copy())
    outs = run_torch(head, batches)
    res = []
    for (feats, labels), out in zip(batches, outs):
        res.append((_extract_margins(name, out["pre"], out["post"], labels,
                                     64.0), labels, feats))
    return res


@pytest.mark.parametrize("name", ["elastic_cosface", "elastic_arcface"])
def test_elastic_margin_distribution_matches_reference(ref, name):
    """KS two-sample test: margins extracted from the JAX head across many
    batches vs the torch head's. std=0.05 > the default so the clip
    boundaries at m +/- std carry real mass (P(|z|>1) ~ 32%) and the
    interior shape is resolvable. Deterministic: fixed seeds both sides."""
    scipy_stats = pytest.importorskip("scipy.stats")
    torch.manual_seed(123)
    kernel = make_kernel(20)
    batches = make_batches(20, 64)  # 512 margins per side
    m0 = 0.35 if "cos" in name else 0.5

    jm = np.concatenate([m for m, _, _ in
                         _jax_sampled_margins(name, kernel, batches, False)])
    tm = np.concatenate([m for m, _, _ in
                         _torch_sampled_margins(ref, name, kernel, batches,
                                                False)])
    # both respect the clamp to [m - std, m + std] ...
    for arr in (jm, tm):
        assert arr.min() >= m0 - 0.05 - 5e-4
        assert arr.max() <= m0 + 0.05 + 5e-4
        # ... with real probability mass AT the boundaries (clipped normal,
        # not truncated-resampled): ~16% in each tail
        assert np.mean(arr > m0 + 0.05 - 1e-4) > 0.08
        assert np.mean(arr < m0 - 0.05 + 1e-4) > 0.08
    stat, pvalue = scipy_stats.ks_2samp(jm, tm)
    assert pvalue > 0.01, \
        f"margin distributions differ: KS D={stat:.4f} p={pvalue:.2e}"


@pytest.mark.parametrize("name", ["elastic_cosface", "elastic_arcface"])
def test_elastic_plus_rank_composition(ref, name):
    """Plus mode under randomness: BOTH sides must realize the reference's
    gather composition margin_i = sort(margin)[argsort(-target_cos)][i].
    Since the applied margins are a permutation of the sampled ones, each
    side must satisfy `applied == sort(applied)[argsort(-t_cos)]` — this
    pins the gather-vs-scatter choice that std=0 parity cannot see."""
    torch.manual_seed(7)
    kernel = make_kernel(21)
    batches = make_batches(21, 8)

    wn = kernel / np.linalg.norm(kernel, axis=0, keepdims=True)

    def check(side):
        for margins, labels, feats in side:
            xn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
            t_cos = np.clip(np.sum(xn * wn[:, labels].T, axis=1),
                            -1 + 1e-7, 1 - 1e-7)
            expect = np.sort(margins)[np.argsort(-t_cos)]
            np.testing.assert_allclose(margins, expect, rtol=1e-4,
                                       atol=2e-5)
            # and the assignment is non-trivial (not already sorted)
        all_m = np.concatenate([m for m, _, _ in side])
        assert np.std(all_m) > 1e-3  # randomness actually flowed through

    check(_jax_sampled_margins(name, kernel, batches, True))
    check(_torch_sampled_margins(ref, name, kernel, batches, True))


# ---------------------------------------------------------------------------
# Stateful heads: EMA / memory sequences over multiple steps
# ---------------------------------------------------------------------------


def test_curricularface_state_sequence_matches_reference(ref):
    """The EMA difficulty buffer `t` feeds back into hard-negative scaling
    (criterion.py:569-575) — a 5-step sequence catches ordering bugs."""
    kernel = make_kernel(8)
    batches = make_batches(8, 5)
    head = ref.CurricularFace(D, C, m=0.5, s=64.0, momentum=0.01)
    head.kernel.data = torch.from_numpy(kernel.copy())
    assert_steps_match(run_jax("curricularface", kernel, batches),
                       run_torch(head, batches),
                       state_keys=[("t", "t")])


def test_adaface_state_sequence_matches_reference(ref):
    """AdaFace's batch_mean/std EMA uses the reference's inverted t_alpha
    weighting (criterion.py:881-882) — replicated bug-for-bug."""
    kernel = make_kernel(9)
    batches = make_batches(9, 5)
    head = ref.AdaFace(D, C, m=0.4, h=0.333, s=64.0, t_alpha=0.99)
    head.kernel.data = torch.from_numpy(kernel.copy())
    assert_steps_match(run_jax("adaface", kernel, batches),
                       run_torch(head, batches),
                       state_keys=[("batch_mean", "batch_mean"),
                                   ("batch_std", "batch_std")])


def test_vpl_arcface_memory_sequence_matches_reference(ref):
    """VPL's per-class memory + TTL lifecycle (criterion.py:702-726): a small
    delta makes lifetimes expire mid-sequence, exercising the active mask."""
    kernel = make_kernel(10)
    batches = make_batches(10, 6)
    head = ref.VPLArcFace(D, C, s=64.0, m=0.5, easy_margin=False,
                          lamda=0.15, delta=3)
    head.weight.data = torch.from_numpy(kernel.T.copy())
    assert_steps_match(run_jax("vpl_arcface", kernel, batches, delta=3),
                       run_torch(head, batches),
                       state_keys=[("mem", "mem"), ("life", "life")])


def test_qaface_memory_sequence_matches_reference(ref):
    """QAFace full lifecycle: magnitude EMA over the degraded view, injection
    mask, memory blend, target injection (criterion.py:1437-1506)."""
    rs = np.random.RandomState(77)
    kernel = make_kernel(11)
    batches = make_batches(11, 5)
    minputs = [feats + 0.3 * rs.randn(N, D).astype(np.float32)
               for feats, _ in batches]
    head = ref.QAFace(D, C, s=64.0, m=0.5, easy_margin=False,
                      delta=3, tto=2.0, alpha=0.99)
    head.weight.data = torch.from_numpy(kernel.T.copy())
    assert_steps_match(run_jax("qaface", kernel, batches, minputs=minputs,
                               delta=3),
                       run_torch(head, batches, minputs=minputs),
                       state_keys=[("mem", "mem"), ("life", "life"),
                                   ("muy", "muy"), ("std", "std")])
