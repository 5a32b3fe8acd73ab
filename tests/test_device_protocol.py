"""On-device vectorized 10-fold protocol must match the sklearn-backed host
path exactly: thresholds, per-fold accuracy, per-fold AUC."""

import numpy as np
import pytest

from face_recognition_models_tpu.evaluation import kfold_verification
from face_recognition_models_tpu.evaluation.device_protocol import (
    kfold_verification_device,
)


def _cases():
    rs = np.random.RandomState(0)
    # separable
    pos = 0.8 + 0.05 * rs.randn(300)
    neg = 0.2 + 0.05 * rs.randn(300)
    yield (np.concatenate([pos, neg]),
           np.concatenate([np.ones(300, int), np.zeros(300, int)]))
    # random / overlapping
    yield rs.randn(500), rs.randint(0, 2, 500)
    # heavy ties (quantized scores)
    sims = np.round(rs.rand(400) * 10) / 10
    yield sims, rs.randint(0, 2, 400)
    # adversarial: scores anti-correlated with labels (J <= 0 territory)
    labels = rs.randint(0, 2, 300)
    yield -labels + 0.01 * rs.randn(300), labels


@pytest.mark.parametrize("case", range(4))
def test_device_matches_host(case):
    sims, labels = list(_cases())[case]
    perm = np.random.RandomState(1).permutation(len(sims))
    sims, labels = sims[perm].astype(np.float32), labels[perm]

    host = kfold_verification(sims, labels)
    dev = kfold_verification_device(sims, labels)

    np.testing.assert_allclose(dev.fold_thresholds, host.fold_thresholds,
                               rtol=1e-6, atol=1e-7)
    # device math is fp32; the CORRECT counts must agree exactly, so compare
    # at fp32 resolution
    np.testing.assert_allclose(dev.fold_accuracies, host.fold_accuracies,
                               rtol=1e-5)
    np.testing.assert_allclose(dev.fold_aucs, host.fold_aucs, rtol=1e-5)
    assert dev.mean_accuracy == pytest.approx(host.mean_accuracy, rel=1e-5)
    assert dev.mean_auc == pytest.approx(host.mean_auc, rel=1e-5)


def test_one_class_folds_match_host():
    """Extreme class skew (195 pos / 5 neg over 10 folds) yields held-out
    folds with ZERO negatives: sklearn's roc_curve goes all-NaN there and
    np.argmax picks the virtual threshold=inf point. The device path must
    replicate that (threshold inf, accuracy = negative fraction), not
    invent a real threshold from a 0/0-protected fpr."""
    rs = np.random.RandomState(3)
    sims = rs.uniform(-1.0, 1.0, 200).astype(np.float32)
    labels = np.array([1] * 195 + [0] * 5)
    perm = rs.permutation(200)
    sims, labels = sims[perm], labels[perm]

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # sklearn UndefinedMetricWarning
        host = kfold_verification(sims, labels)
    dev = kfold_verification_device(sims, labels)

    assert any(np.isinf(host.fold_thresholds)), "case lost its degeneracy"
    np.testing.assert_allclose(dev.fold_thresholds, host.fold_thresholds,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(dev.fold_accuracies, host.fold_accuracies,
                               rtol=1e-5)
    assert dev.mean_accuracy == pytest.approx(host.mean_accuracy, rel=1e-5)


def test_device_protocol_deterministic():
    rs = np.random.RandomState(3)
    sims, labels = rs.randn(200).astype(np.float32), rs.randint(0, 2, 200)
    r1 = kfold_verification_device(sims, labels)
    r2 = kfold_verification_device(sims, labels)
    assert r1.fold_accuracies == r2.fold_accuracies
