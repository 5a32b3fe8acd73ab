"""Partial-FC sampled-classifier training (train/partial_fc.py).

Beyond-reference feature (insightface's large-C recipe). Contracts under
test: exact static-shape sampling (all positives present, negatives
uniform without replacement and never positive), dense equivalence when
the sample covers every class, torch-SGD column updates, and e2e
integration through fit()."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import get_head
from face_recognition_models_tpu.train.optim import get_optimizer
from face_recognition_models_tpu.train.partial_fc import (
    init_partial_fc_opt_state,
    make_partial_fc_train_step,
    num_sampled_classes,
    sample_classes,
)
from face_recognition_models_tpu.train.state import create_train_state
from face_recognition_models_tpu.train.step import make_train_step


def test_sample_classes_contract():
    rng = jax.random.PRNGKey(0)
    labels = jnp.array([5, 9, 5, 100, 9, 3], jnp.int32)
    C, C_s = 128, 32
    classes, col_valid, target = sample_classes(rng, labels, C, C_s)
    classes, col_valid, target = map(np.asarray,
                                     (classes, col_valid, target))
    assert classes.shape == (C_s,) and target.shape == (6,)
    # every label's class is present and target points at it
    for i, lab in enumerate([5, 9, 5, 100, 9, 3]):
        assert classes[target[i]] == lab and col_valid[target[i]]
    # valid columns are distinct
    valid_classes = classes[col_valid]
    assert len(set(valid_classes.tolist())) == len(valid_classes)
    # negatives (beyond the N positive slots) never collide with positives
    assert not set(classes[len(labels):].tolist()) & {5, 9, 100, 3}
    # padded positive slots (4 unique of 6) are masked out
    assert col_valid.sum() == C_s - (6 - 4)


def test_sample_classes_different_keys_differ():
    labels = jnp.zeros((4,), jnp.int32)
    a = np.asarray(sample_classes(jax.random.PRNGKey(1), labels, 512, 64)[0])
    b = np.asarray(sample_classes(jax.random.PRNGKey(2), labels, 512, 64)[0])
    assert not np.array_equal(a, b)


def test_num_sampled_classes():
    assert num_sampled_classes(1_048_576, 0.1, 512) == 104960  # 256-aligned
    assert num_sampled_classes(1000, 0.9, 512) == 1000  # capped at C
    # floor at 2*batch: >= batch negative slots (near-zero negatives stall
    # margin training)
    assert num_sampled_classes(10575, 0.0, 512) == 1024


def _make(head_name, C, batch, partial, image_size=24, seed=0, lr=0.1,
          compute_dtype="bfloat16"):
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head=head_name, num_classes=C,
        batch_size=batch, compute_dtype=compute_dtype,
        data=cfg_lib.DataConfig(image_size=image_size))
    head_cfg = cfg_lib.make_head_config(head_name, num_classes=C)
    tx = get_optimizer("sgd", lr, momentum=0.9, weight_decay=5e-4)
    backbone, head, state = create_train_state(cfg, head_cfg, tx,
                                               rng=jax.random.PRNGKey(seed))
    if partial is not None:
        state = state.replace(
            opt_state=init_partial_fc_opt_state(tx, state.params))
        step = make_partial_fc_train_step(backbone, head, head_cfg, tx,
                                          partial, learning_rate=lr)
    else:
        step = make_train_step(backbone, head, head_cfg, tx,
                               use_fused_head=False)
    return jax.jit(step), state


@pytest.mark.slow
def test_full_sample_matches_dense_step():
    """With C_s == C the sampled step IS the dense step (columns permuted):
    loss and the post-step kernel must match the dense path."""
    C, batch = 64, 16
    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (batch, 24, 24, 3), np.uint8)
    # distinct labels: duplicate labels leave padded (invalid) sample slots,
    # so C_s == C covers every class only when the batch has N unique labels
    labels = rs.choice(C, batch, replace=False).astype(np.int32)

    dense_step, dense_state = _make("arcface", C, batch, None)
    pfc_step, pfc_state = _make("arcface", C, batch, C)

    d_state, d_metrics = dense_step(dense_state, images, labels)
    p_state, p_metrics = pfc_step(pfc_state, images, labels)

    # identical math modulo column permutation: CE's logsumexp reassociates
    # over a permuted column order, so allow fp32 reassociation noise
    np.testing.assert_allclose(float(p_metrics["loss"]),
                               float(d_metrics["loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(p_metrics["acc1"]),
                               float(d_metrics["acc1"]))
    np.testing.assert_allclose(np.asarray(p_state.params["kernel_w"]),
                               np.asarray(d_state.params["kernel_w"]),
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(p_state.params["backbone"])[0]),
        np.asarray(jax.tree.leaves(d_state.params["backbone"])[0]),
        rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_unsampled_columns_untouched():
    C, batch, C_s = 256, 8, 32
    rs = np.random.RandomState(1)
    images = rs.randint(0, 256, (batch, 24, 24, 3), np.uint8)
    labels = rs.randint(0, C, (batch,), np.int32)
    step, state = _make("cosface", C, batch, C_s)
    k0 = np.asarray(state.params["kernel_w"])
    new_state, _ = step(state, images, labels)
    k1 = np.asarray(new_state.params["kernel_w"])
    changed = np.flatnonzero(np.any(k0 != k1, axis=0))
    assert 0 < len(changed) <= C_s
    # momentum exists only on touched columns
    mom = np.asarray(new_state.opt_state["kernel_mom"])
    assert set(np.flatnonzero(np.any(mom != 0, axis=0))) == set(changed)


@pytest.mark.parametrize("head_name", [
    "arcface",
    pytest.param("adaface", marks=pytest.mark.slow),
    pytest.param("magface", marks=pytest.mark.slow),
    pytest.param("elastic_arcface", marks=pytest.mark.slow),
])
@pytest.mark.slow
def test_partial_fc_loss_decreases(head_name):
    C, batch, C_s = 512, 16, 64
    rs = np.random.RandomState(2)
    # tiny separable problem: per-class constant images
    labels = np.tile(np.arange(8, dtype=np.int32), 2)
    images = (labels[:, None, None, None] * 29 % 255).astype(np.uint8) \
        * np.ones((1, 24, 24, 3), np.uint8)
    step, state = _make(head_name, C, batch, C_s, seed=3, lr=0.02)
    losses = []
    for _ in range(12):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert np.isfinite(losses).all()


def test_memory_heads_rejected():
    head_cfg = cfg_lib.make_head_config("vpl_arcface", num_classes=64)
    tx = get_optimizer("sgd", 0.1)
    with pytest.raises(ValueError, match="memory-blended"):
        make_partial_fc_train_step(None, get_head("vpl_arcface"), head_cfg,
                                   tx, 32, learning_rate=0.1)


@pytest.mark.slow
def test_fit_with_partial_fc():
    """fit() end-to-end with cfg.partial_fc > 0 (loader -> sampled steps)."""
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(24, 8, image_size=24, seed=0)
    loader = ArrayLoader(images, labels, batch_size=16, seed=0)
    # num_classes larger than the identities present so the sample is a
    # real subset (fit falls back to dense when C_s would cover C)
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=2048,
        batch_size=16, epochs=2, partial_fc=0.05, use_pallas_head=False,
        data=cfg_lib.DataConfig(image_size=24))
    result = fit(cfg, loader, use_mesh=False)
    assert np.isfinite(result.min_train_loss)
    # C_s = 256 of 2048: well under the dense width
    from face_recognition_models_tpu.train.partial_fc import (
        num_sampled_classes)
    assert num_sampled_classes(2048, 0.05, 16) == 256


@pytest.mark.slow
def test_partial_fc_on_8_device_dp_mesh():
    """Partial-FC under DP: kernel replicated, batch sharded over 'data';
    the sampled-column updates must match the single-device run exactly
    (same keyed sampling on every replica)."""
    from face_recognition_models_tpu.parallel import (
        batch_sharding,
        make_mesh,
        train_state_shardings,
    )

    assert jax.device_count() >= 8
    C, batch, C_s = 256, 16, 64
    rs = np.random.RandomState(4)
    images = rs.randint(0, 256, (batch, 24, 24, 3), np.uint8)
    labels = rs.randint(0, C, (batch,), np.int32)

    # fp32 backbone: bf16 reduction reassociation under sharding swamps the
    # per-column update comparison
    step, state = _make("arcface", C, batch, C_s, seed=5,
                        compute_dtype="float32")
    mesh = make_mesh(cfg_lib.MeshConfig(data=8, model=1))
    shardings = train_state_shardings(mesh, state, num_classes=C)
    # replicated-kernel partial-fc runs on data-only meshes: the kernel
    # and momentum 'model' specs are no-ops at model=1 (loop.py routes
    # model>1 meshes to the sharded variant)
    assert mesh.shape["model"] == 1
    data_s = batch_sharding(mesh)
    st_mesh = jax.device_put(state, shardings)
    step_mesh = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                        else step,
                        in_shardings=(shardings, data_s, data_s),
                        out_shardings=(shardings, None))
    m_state, m_metrics = step_mesh(st_mesh, jax.device_put(images, data_s),
                                   jax.device_put(labels, data_s))
    s_state, s_metrics = step(state, images, labels)
    # bf16 backbone reductions reassociate under sharding: ~1e-4 rel noise
    np.testing.assert_allclose(float(m_metrics["loss"]),
                               float(s_metrics["loss"]), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(m_state.params["kernel_w"]),
                               np.asarray(s_state.params["kernel_w"]),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_logq_correction_debiases_sampled_ce():
    """Monte-Carlo over sample draws: the logQ-corrected sampled
    logsumexp estimates the DENSE logsumexp; the uncorrected one is
    biased low. (Pure math check on fixed logits, no model; 23 s of
    Monte-Carlo — slow-marked round 5.)"""
    rs = np.random.RandomState(0)
    C, n, C_s = 2048, 16, 256
    logits = rs.randn(C).astype(np.float64) * 2.0
    labels = jnp.asarray(rs.choice(C, n, replace=False), jnp.int32)
    dense_lse = np.logaddexp.reduce(logits)

    corr_est, raw_est = [], []
    for k in range(200):
        classes, col_valid, _ = sample_classes(
            jax.random.PRNGKey(k), labels, C, C_s)
        classes, col_valid = np.asarray(classes), np.asarray(col_valid)
        sampled = logits[classes]
        u = col_valid[:n].sum()
        shift = np.log((C - u) / (C_s - n))
        corrected = sampled + np.where(np.arange(C_s) >= n, shift, 0.0)
        raw_est.append(np.logaddexp.reduce(sampled[col_valid]))
        corr_est.append(np.logaddexp.reduce(corrected[col_valid]))

    # corrected estimator lands on the dense value; raw is clearly low
    assert abs(np.mean(corr_est) - dense_lse) < 0.1
    assert dense_lse - np.mean(raw_est) > 0.5


def test_bucketed_negative_sampler_large_c():
    """At large C sample_negatives takes the bucketed top_k path; the
    sample must stay distinct, positive-free, and cover buckets evenly."""
    from face_recognition_models_tpu.train.partial_fc import (
        sample_negatives)
    C, n, k = 131072, 512, 12288       # k % 64 == 0, C/B=2048 >= 1024
    rs = np.random.RandomState(0)
    pos = rs.choice(C, n, replace=False)
    scores = jax.random.uniform(jax.random.PRNGKey(0), (C,))
    scores = scores.at[jnp.asarray(pos)].set(-1.0)
    neg = np.asarray(sample_negatives(scores, k, n))
    assert len(neg) == k
    assert len(set(neg.tolist())) == k                  # distinct
    assert not set(neg.tolist()) & set(pos.tolist())    # excludes positives
    # bucketed: exactly k/64 selections per residue-mod-64 bucket
    counts = np.bincount(neg % 64, minlength=64)
    assert (counts == k // 64).all()
    # keyed shift rotates bucket assignment but keeps the contract
    neg_s = np.asarray(sample_negatives(scores, k, n, shift=jnp.int32(17)))
    assert len(set(neg_s.tolist())) == k
    assert not set(neg_s.tolist()) & set(pos.tolist())
    assert (np.bincount((neg_s + 17) % 64, minlength=64) == k // 64).all()


def test_bucketed_sampler_unbiased_under_clustered_positives():
    """The quota sampler's documented failure mode: a batch of ADJACENT
    identities piles its positives into one contiguous bucket, giving that
    bucket's survivors ~2x inclusion probability and biasing the logQ
    correction. Residue bucketing + keyed shift must keep the empirical
    inclusion of near-cluster classes equal to far classes."""
    from face_recognition_models_tpu.train.partial_fc import sample_classes

    C, n, num_sampled = 65536, 512, 2560             # k = 2048
    labels = jnp.arange(n)                           # clustered: ids 0..511

    @jax.jit
    def draw(key):
        classes, _, _ = sample_classes(key, labels, C, num_sampled)
        return classes[n:]

    counts = np.zeros(C, np.int64)
    reps = 400
    for i in range(reps):
        counts += np.bincount(np.asarray(draw(jax.random.PRNGKey(i))),
                              minlength=C)
    assert counts[:n].sum() == 0                     # never a positive
    uniform = reps * (num_sampled - n) / (C - n)
    near = counts[n:2 * n].mean()                    # old bias: ~2x uniform
    far = counts[C // 2:C // 2 + n].mean()
    assert abs(near - uniform) / uniform < 0.08, (near, uniform)
    assert abs(far - uniform) / uniform < 0.08, (far, uniform)


def test_negative_sampler_small_c_exact():
    """Small C falls back to the exact global top_k."""
    from face_recognition_models_tpu.train.partial_fc import (
        sample_negatives)
    scores = jax.random.uniform(jax.random.PRNGKey(1), (512,))
    scores = scores.at[jnp.arange(16)].set(-1.0)
    neg = np.asarray(sample_negatives(scores, 100, 16))
    assert len(set(neg.tolist())) == 100
    assert (neg >= 16).all()
