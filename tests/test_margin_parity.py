"""Numeric parity: each head's margin math vs an independent NumPy fp64
oracle built directly from the published formulas (SURVEY §2.1 / the papers),
evaluated on identical random inputs.

These oracles are deliberately written in flat NumPy (no modules, no state
objects) so they are an independent second implementation, not a port.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import get_head

N, D, C = 24, 64, 50
RTOL, ATOL = 2e-5, 2e-5


def _inputs(seed=0, norm_scale=10.0):
    rs = np.random.RandomState(seed)
    feats = (norm_scale * rs.randn(N, D)).astype(np.float64)
    kernel = rs.randn(D, C).astype(np.float64)
    labels = rs.randint(0, C, size=N)
    return feats, kernel, labels


def _cos_oracle(feats, kernel):
    xn = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    wn = kernel / np.maximum(np.linalg.norm(kernel, axis=0, keepdims=True), 1e-12)
    return xn @ wn, xn


def _run_head(name, feats, kernel, labels, state=None, **cfg_kw):
    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C,
                                   **cfg_kw)
    head = get_head(name)
    if state is None:
        state = head.init_state(cfg)
    out = head.apply(cfg, jnp.asarray(kernel, jnp.float32),
                     jnp.asarray(feats, jnp.float32), jnp.asarray(labels),
                     state, rng=jax.random.PRNGKey(0))
    return cfg, out


def test_cosface_oracle():
    feats, kernel, labels = _inputs()
    cos, _ = _cos_oracle(feats, kernel)
    cos = np.clip(cos, -1 + 1e-4, 1 - 1e-4)
    expected = cos.copy()
    expected[np.arange(N), labels] -= 0.35
    expected *= 64.0

    _, out = _run_head("cosface", feats, kernel, labels)
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)
    np.testing.assert_allclose(np.asarray(out.pre_logits), cos * 64.0,
                               RTOL, ATOL)


def test_arcface_oracle():
    feats, kernel, labels = _inputs()
    m, s = 0.5, 64.0
    cos, _ = _cos_oracle(feats, kernel)
    sine = np.sqrt(np.clip(1 - cos ** 2, 1e-9, 1.0))
    phi = cos * math.cos(m) - sine * math.sin(m)
    th, mm = math.cos(math.pi - m), math.sin(math.pi - m) * m
    phi = np.where(cos > th, phi, cos - mm)  # easy_margin=False
    expected = cos * s
    expected[np.arange(N), labels] = phi[np.arange(N), labels] * s

    _, out = _run_head("arcface", feats, kernel, labels)
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)


def test_sphereface_oracle():
    feats, kernel, labels = _inputs()
    m = 2
    cos, _ = _cos_oracle(feats, kernel)
    cos = np.clip(cos, -1, 1)
    norms = np.linalg.norm(feats, axis=1, keepdims=True)
    # first call: iter=1 -> lamb = max(5, 1000/(1+0.12*1))
    lamb = max(5.0, 1000.0 * (1 + 0.12 * 1) ** -1)
    cos_m_theta = 2 * cos ** 2 - 1
    theta = np.arccos(cos)
    k = np.floor(m * theta / math.pi)
    phi = ((-1.0) ** k) * cos_m_theta - 2 * k
    onehot = np.zeros((N, C)); onehot[np.arange(N), labels] = 1
    expected = (onehot * (phi - cos) / (1 + lamb) + cos) * norms

    _, out = _run_head("sphereface", feats, kernel, labels)
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)
    np.testing.assert_allclose(np.asarray(out.pre_logits), cos * norms,
                               RTOL, ATOL)


def test_sphereface_annealing_schedule():
    feats, kernel, labels = _inputs()
    head = get_head("sphereface")
    cfg = cfg_lib.make_head_config("sphereface", feature_dim=D, num_classes=C)
    state = head.init_state(cfg)
    # run 3 steps; blend weight must follow 1000*(1+0.12*iter)^-1
    outs = []
    for _ in range(3):
        out = head.apply(cfg, jnp.asarray(kernel, jnp.float32),
                         jnp.asarray(feats, jnp.float32),
                         jnp.asarray(labels), state)
        state = out.state
        outs.append(np.asarray(out.logits))
    assert int(state.iter) == 3
    # logits change across iters purely due to annealing
    assert not np.allclose(outs[0], outs[1])


def test_mv_softmax_am_oracle():
    feats, kernel, labels = _inputs()
    m, t, s = 0.35, 1.12, 32.0
    cos, _ = _cos_oracle(feats, kernel)
    cos = np.clip(cos, -1 + 1e-7, 1 - 1e-7)
    pre = cos * s
    tcos = cos[np.arange(N), labels][:, None]
    final_t = np.where(tcos > m, tcos - m, tcos)
    mask = cos > (tcos - m)
    work = cos.copy()
    work[mask] = t * work[mask] + (t - 1.0)
    work[np.arange(N), labels] = final_t[:, 0]
    expected = work * s

    _, out = _run_head("mv_softmax", feats, kernel, labels)
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)
    np.testing.assert_allclose(np.asarray(out.pre_logits), pre, RTOL, ATOL)


def test_mv_softmax_arc_oracle():
    feats, kernel, labels = _inputs()
    m, t, s = 0.35, 1.12, 32.0
    cos, _ = _cos_oracle(feats, kernel)
    cos = np.clip(cos, -1 + 1e-7, 1 - 1e-7)
    tcos = cos[np.arange(N), labels][:, None]
    sin_t = np.sqrt(1 - tcos ** 2 + 1e-9)
    ctm = tcos * math.cos(m) - sin_t * math.sin(m)
    final_t = np.where(tcos > 0, ctm, tcos)
    mask = cos > ctm
    work = cos.copy()
    work[mask] = t * work[mask] + (t - 1.0)
    work[np.arange(N), labels] = final_t[:, 0]
    expected = work * s

    _, out = _run_head("mv_softmax", feats, kernel, labels,
                       margin_type="arc")
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)


def test_curricularface_oracle():
    feats, kernel, labels = _inputs()
    m, s, mom = 0.5, 64.0, 0.01
    cos, _ = _cos_oracle(feats, kernel)
    cos = np.clip(cos, -1, 1)
    tcos = cos[np.arange(N), labels][:, None]
    sin_t = np.sqrt(1 - tcos ** 2)
    ctm = tcos * math.cos(m) - sin_t * math.sin(m)
    mask = cos > ctm
    thr = math.cos(math.pi - m)
    mm = math.sin(math.pi - m) * m
    final_t = np.where(tcos > thr, ctm, tcos - mm)
    new_t = tcos.mean() * mom + (1 - mom) * 0.0  # state t starts at 0
    work = cos.copy()
    work[mask] = work[mask] * (new_t + work[mask])
    work[np.arange(N), labels] = final_t[:, 0]
    expected = work * s

    _, out = _run_head("curricularface", feats, kernel, labels)
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)
    np.testing.assert_allclose(np.asarray(out.state.t), new_t, RTOL, ATOL)


def test_adaface_oracle():
    feats, kernel, labels = _inputs()
    m, h, s, ta, eps = 0.4, 0.333, 64.0, 0.99, 1e-3
    cos, _ = _cos_oracle(feats, kernel)
    cos = np.clip(cos, -1 + eps, 1 - eps)
    norms = np.linalg.norm(feats, axis=1, keepdims=True)
    safe = np.clip(norms, 0.001, 100)
    mean, std = safe.mean(), safe.std(ddof=1)
    new_mean = mean * ta + (1 - ta) * 20.0
    new_std = std * ta + (1 - ta) * 100.0
    scaler = np.clip((safe - new_mean) / (new_std + eps) * h, -1, 1)
    onehot = np.zeros((N, C)); onehot[np.arange(N), labels] = 1
    theta = np.arccos(cos)
    theta_m = np.clip(theta + onehot * (-m * scaler), eps, math.pi - eps)
    expected = (np.cos(theta_m) - onehot * (m + m * scaler)) * s

    _, out = _run_head("adaface", feats, kernel, labels)
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)
    np.testing.assert_allclose(float(out.state.batch_mean[0]), new_mean,
                               rtol=1e-5)
    np.testing.assert_allclose(float(out.state.batch_std[0]), new_std,
                               rtol=1e-5)


def test_magface_oracle():
    feats, kernel, labels = _inputs(norm_scale=3.0)  # norms ~ 24 in [10,110]
    s, lm, um, la, ua = 64.0, 0.45, 0.8, 10.0, 110.0
    cos, _ = _cos_oracle(feats, kernel)
    norms = np.linalg.norm(feats, axis=1, keepdims=True)
    x_norm = np.clip(norms, la, ua)
    loss_g = np.mean(x_norm / ua ** 2 + 1.0 / x_norm)
    cos = np.clip(cos, -1 + 1e-7, 1 - 1e-7)
    ada_m = (um - lm) / (ua - la) * (x_norm - la) + lm
    sin_theta = np.sqrt(1 - cos ** 2 + 1e-9)
    ctm = cos * np.cos(ada_m) - sin_theta * np.sin(ada_m)
    mm = np.sin(math.pi - ada_m) * ada_m
    th = np.cos(math.pi - ada_m)
    ctm = np.where(cos > th, ctm, cos - mm)
    onehot = np.zeros((N, C)); onehot[np.arange(N), labels] = 1
    expected = (onehot * ctm + (1 - onehot) * cos) * s

    _, out = _run_head("magface", feats, kernel, labels)
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)
    np.testing.assert_allclose(float(out.loss_g), loss_g, rtol=1e-5)
    # MagFace returns the clamped norm
    np.testing.assert_allclose(np.asarray(out.norms), x_norm, RTOL, ATOL)


def test_vpl_arcface_oracle_first_step():
    feats, kernel, labels = _inputs()
    s, m, lam, delta = 64.0, 0.5, 0.15, 100
    cos_w, xn = _cos_oracle(feats, kernel)
    # memory after update: class means of raw feats for classes in batch
    mem = np.zeros((C, D))
    life = np.zeros(C)
    for c in np.unique(labels):
        mem[c] = feats[labels == c].mean(0)
        life[c] = delta
    life -= 1
    active = (life > 0).astype(np.float64)[None, :]
    mem_n = mem / np.maximum(np.linalg.norm(mem, axis=1, keepdims=True), 1e-12)
    cos_mem = xn @ mem_n.T
    onehot = np.zeros((N, C)); onehot[np.arange(N), labels] = 1
    cos1 = (1 - active * lam) * cos_w + active * lam * cos_mem
    cos2 = (1 - active * lam) * cos_w + active * lam * 1.0
    cosine = onehot * cos2 + (1 - onehot) * cos1
    cosine = np.clip(cosine, -1 + 1e-7, 1 - 1e-7)
    sine = np.sqrt(np.clip(1 - cosine ** 2, 1e-9, 1.0))
    phi = cosine * math.cos(m) - sine * math.sin(m)
    th, mm = math.cos(math.pi - m), math.sin(math.pi - m) * m
    phi = np.where(cosine > th, phi, cosine - mm)
    expected = (onehot * phi + (1 - onehot) * cosine) * s

    _, out = _run_head("vpl_arcface", feats, kernel, labels)
    np.testing.assert_allclose(np.asarray(out.logits), expected, RTOL, ATOL)
    np.testing.assert_allclose(np.asarray(out.state.mem), mem, RTOL, ATOL)
    np.testing.assert_allclose(np.asarray(out.state.life), life)


def test_qaface_oracle_first_step():
    feats, kernel, labels = _inputs()
    rs = np.random.RandomState(7)
    minput = feats + 0.5 * rs.randn(N, D)
    s, m, delta, tto, alpha = 64.0, 0.5, 1000, 2.0, 0.99
    cos_w, xn = _cos_oracle(feats, kernel)
    mag = np.linalg.norm(minput, axis=1, keepdims=True)
    muy, std = mag.mean(), mag.std(ddof=1)  # first batch: direct init
    z = (mag - muy) / (std + 1e-6)
    f = np.where(np.abs(z) < tto, np.exp(-z), 0.0)
    injection = f * minput / (mag + 1e-6)
    mem = np.zeros((C, D)); life = np.zeros(C)
    for c in np.unique(labels):
        mem[c] = injection[labels == c].mean(0)
        life[c] = delta
    life -= 1
    active = (life > 0).astype(np.float64)[None, :]
    mem_n = mem / np.maximum(np.linalg.norm(mem, axis=1, keepdims=True), 1e-12)
    cos_mem = xn @ mem_n.T
    cos1 = (1 - active) * cos_w + active * cos_mem
    target_w = kernel[:, labels].T + injection
    twn = target_w / np.maximum(np.linalg.norm(target_w, axis=1,
                                               keepdims=True), 1e-12)
    cos2 = np.sum(xn * twn, axis=1, keepdims=True)
    onehot = np.zeros((N, C)); onehot[np.arange(N), labels] = 1
    cosine = onehot * cos2 + (1 - onehot) * cos1
    cosine = np.clip(cosine, -1 + 1e-7, 1 - 1e-7)
    sine = np.sqrt(np.clip(1 - cosine ** 2, 1e-9, 1.0))
    phi = cosine * math.cos(m) - sine * math.sin(m)
    th, mm = math.cos(math.pi - m), math.sin(math.pi - m) * m
    phi = np.where(cosine > th, phi, cosine - mm)
    expected = (onehot * phi + (1 - onehot) * cosine) * s

    cfg = cfg_lib.make_head_config("qaface", feature_dim=D, num_classes=C)
    head = get_head("qaface")
    state = head.init_state(cfg)
    out = head.apply(cfg, jnp.asarray(kernel, jnp.float32),
                     jnp.asarray(feats, jnp.float32), jnp.asarray(labels),
                     state, minput=jnp.asarray(minput, jnp.float32))
    np.testing.assert_allclose(np.asarray(out.logits), expected,
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(float(out.state.muy), muy, rtol=1e-5)
    np.testing.assert_allclose(float(out.state.std), std, rtol=1e-4)


def test_elastic_plus_rank_assignment():
    """Plus mode: hardest samples (lowest target cos) get the largest
    margins (criterion.py:1007-1012 semantics)."""
    feats, kernel, labels = _inputs()
    _, out_plain = _run_head("elastic_cosface", feats, kernel, labels)
    _, out_plus = _run_head("elastic_cosface", feats, kernel, labels,
                            plus=True)
    pre = np.asarray(out_plus.pre_logits) / 64.0
    post = np.asarray(out_plus.logits) / 64.0
    tcos = pre[np.arange(N), labels]
    applied = pre[np.arange(N), labels] - post[np.arange(N), labels]
    # The reference (criterion.py:1007-1012) composes the FORWARD
    # permutation: margin_i = sort_asc(margins)[argsort_desc(target_cos)_i].
    # (This is the official ElasticFace+ op; it is NOT the intuitive
    # inverse-permutation "hardest gets largest" in general — replicated
    # exactly.)
    expected = np.sort(applied)[np.argsort(-tcos)]
    np.testing.assert_allclose(applied, expected, rtol=1e-5, atol=1e-6)
