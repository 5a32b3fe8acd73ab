"""Eval protocol: 10-fold Youden verification on synthetic similarities with
known structure, plus a direct parity check against a naive
re-implementation of the reference's per-fold flow."""

import numpy as np
import pytest

from face_recognition_models_tpu.evaluation import (
    kfold_verification,
    pair_cosine_similarities,
)


def _synthetic_scores(n_per_class=300, gap=0.3, noise=0.1, seed=0):
    rs = np.random.RandomState(seed)
    pos = 0.5 + gap / 2 + noise * rs.randn(n_per_class)
    neg = 0.5 - gap / 2 + noise * rs.randn(n_per_class)
    sims = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(n_per_class, int),
                             np.zeros(n_per_class, int)])
    perm = rs.permutation(len(sims))
    return sims[perm], labels[perm]


def test_separable_scores_give_near_perfect_accuracy():
    sims, labels = _synthetic_scores(gap=1.0, noise=0.01)
    res = kfold_verification(sims, labels)
    # Youden's argmax picks the HIGHEST tied threshold (= the min positive
    # score of the val fold), so ~1/(n_val_pos+1) of train-fold positives sit
    # below it — an inherent property of the reference protocol, not a bug.
    assert res.mean_accuracy > 96.0
    assert res.mean_auc == pytest.approx(1.0, abs=1e-3)
    assert len(res.fold_accuracies) == 10


def test_random_scores_give_chance_accuracy():
    rs = np.random.RandomState(0)
    sims = rs.randn(2000)
    labels = rs.randint(0, 2, 2000)
    res = kfold_verification(sims, labels)
    assert abs(res.mean_accuracy - 50.0) < 5.0
    assert abs(res.mean_auc - 0.5) < 0.05


def test_protocol_matches_reference_flow():
    """Same folds/threshold/accuracy as a literal reimplementation of
    model_utils.py:416-474 (tune on held-out fold, measure on the rest)."""
    from sklearn.metrics import roc_auc_score, roc_curve
    from sklearn.model_selection import StratifiedKFold

    sims, labels = _synthetic_scores(gap=0.25, noise=0.15, seed=3)
    res = kfold_verification(sims, labels)

    skf = StratifiedKFold(n_splits=10, shuffle=True, random_state=42)
    accs, aucs = [], []
    for train_idx, val_idx in skf.split(sims[:, None], labels):
        fpr, tpr, ths = roc_curve(labels[val_idx], sims[val_idx])
        thresh = ths[np.argmax(tpr - fpr)]
        preds = (sims[train_idx] > thresh).astype(int)
        accs.append(100.0 * (preds == labels[train_idx]).mean())
        aucs.append(roc_auc_score(labels[train_idx], sims[train_idx]))

    np.testing.assert_allclose(res.fold_accuracies, accs, rtol=1e-12)
    np.testing.assert_allclose(res.fold_aucs, aucs, rtol=1e-12)
    assert res.mean_accuracy == pytest.approx(np.mean(accs))


def test_determinism():
    sims, labels = _synthetic_scores(seed=7)
    r1 = kfold_verification(sims, labels)
    r2 = kfold_verification(sims, labels)
    assert r1.fold_accuracies == r2.fold_accuracies
    assert r1.fold_thresholds == r2.fold_thresholds


def test_pair_cosines_with_id_map():
    emb = np.eye(4, dtype=np.float32)
    pairs = np.array([[10, 10, 1], [10, 20, 0]])
    id_to_row = {10: 1, 20: 3}
    sims = pair_cosine_similarities(emb, pairs, id_to_row)
    np.testing.assert_allclose(sims, [1.0, 0.0])


def test_single_class_auc_zero():
    sims = np.linspace(0, 1, 50)
    labels = np.ones(50, int)
    # protocol needs both classes for StratifiedKFold; test _auc convention
    from face_recognition_models_tpu.evaluation.verification import _auc
    assert _auc(labels, sims) == 0.0


def test_sharded_embed_matches_single_device():
    """make_embed_fn(mesh) shards the batch over the 'data' axis and must
    produce the same embeddings as the plain single-device jit (the
    reference evaluates on one GPU; on a pod all chips share the embed
    pass)."""
    import jax
    import jax.numpy as jnp

    from face_recognition_models_tpu.config import MeshConfig
    from face_recognition_models_tpu.evaluation.batch_eval import (
        make_embed_fn)
    from face_recognition_models_tpu.evaluation.verification import (
        embed_unique_images)
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.parallel import make_mesh

    model = get_backbone("resnet18", dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    images = np.random.RandomState(0).randint(
        0, 256, (24, 32, 32, 3), np.uint8)

    single = embed_unique_images(
        make_embed_fn(model, params, stats), images, batch_size=8)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    sharded = embed_unique_images(
        make_embed_fn(model, params, stats, mesh=mesh), images,
        batch_size=8)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        make_embed_fn(model, params, stats, mesh=mesh)(images[:3])


# --- classic (insightface) protocol -----------------------------------------

def _insightface_oracle(sims, labels, k_fold=10):
    """Naive reimplementation of insightface verification.py's
    calculate_accuracy flow: squared-L2 distances of unit embeddings
    (d = 2 - 2*cos), thresholds np.arange(0, 4, 0.01), sequential KFold,
    accuracy-max threshold on the k-1 train folds, accuracy on the test
    fold. Double loops on purpose — an independent code path."""
    dists = 2.0 - 2.0 * np.asarray(sims, np.float64)
    labels = np.asarray(labels, np.int64)
    n = len(dists)
    thresholds = np.arange(0, 4, 0.01)
    fold_sizes = np.full(k_fold, n // k_fold, np.int64)
    fold_sizes[: n % k_fold] += 1
    stops = np.cumsum(fold_sizes)
    accs = []
    for f in range(k_fold):
        lo, hi = stops[f] - fold_sizes[f], stops[f]
        train = [i for i in range(n) if not (lo <= i < hi)]
        test = list(range(lo, hi))
        best_acc, best_t = -1.0, None
        for t in thresholds:
            acc = np.mean([(dists[i] < t) == bool(labels[i])
                           for i in train])
            if acc > best_acc:
                best_acc, best_t = acc, t
        accs.append(100.0 * np.mean([(dists[i] < best_t) == bool(labels[i])
                                     for i in test]))
    return accs


def test_standard_protocol_matches_insightface_oracle():
    from face_recognition_models_tpu.evaluation.verification import (
        standard_kfold_verification)
    rs = np.random.RandomState(0)
    n = 240
    labels = rs.randint(0, 2, n)
    # noisy separability so thresholds matter
    sims = np.where(labels == 1, rs.normal(0.55, 0.25, n),
                    rs.normal(0.05, 0.25, n)).clip(-1, 1)
    res = standard_kfold_verification(sims, labels)
    oracle = _insightface_oracle(sims, labels)
    np.testing.assert_allclose(res.fold_accuracies, oracle, atol=1e-9)
    assert 70.0 < res.mean_accuracy < 100.0


def test_standard_protocol_differs_from_reference_by_design():
    """Same scores, two protocols: both near-100% on separable data, but
    fold partitions differ (sequential vs stratified-shuffled)."""
    from face_recognition_models_tpu.evaluation.verification import (
        kfold_verification, standard_kfold_verification)
    rs = np.random.RandomState(1)
    n = 200
    labels = rs.randint(0, 2, n)
    sims = np.where(labels == 1, 0.8 + 0.1 * rs.rand(n),
                    -0.1 + 0.1 * rs.rand(n))
    std = standard_kfold_verification(sims, labels)
    ref = kfold_verification(sims, labels)
    assert std.mean_accuracy == 100.0
    # the reference's protocol picks fold-score thresholds with strict >,
    # so tuning-fold minima clip a few positives in the other nine folds
    assert ref.mean_accuracy > 90.0
    # thresholds live on different grids/criteria
    assert std.fold_thresholds != ref.fold_thresholds


def test_standard_protocol_cli_dispatch(tmp_path):
    """batch_eval routes protocol='standard' (and rejects unknowns)."""
    from face_recognition_models_tpu.data.pairs import save_bin
    from face_recognition_models_tpu.evaluation.batch_eval import (
        evaluate_model_on_benchmark)
    rs = np.random.RandomState(2)
    imgs = np.stack([np.full((16, 16, 3), 10 + 7 * i, np.uint8)
                     for i in range(40)])
    issame = np.asarray([1, 0] * 10)
    save_bin(str(tmp_path / "lfw.bin"), imgs, issame)
    embed = lambda x: np.asarray(x, np.float32).reshape(len(x), -1)[:, :8] + 1.0
    res = evaluate_model_on_benchmark(embed, str(tmp_path), "lfw",
                                      image_size=16, verbose=False,
                                      protocol="standard")
    assert 0.0 <= res.mean_accuracy <= 100.0
    with pytest.raises(ValueError, match="unknown protocol"):
        evaluate_model_on_benchmark(embed, str(tmp_path), "lfw",
                                    image_size=16, protocol="bogus")


# --- flip-sum TTA (--eval-flip) ----------------------------------------------

def test_flip_tta_sums_raw_embeddings_before_normalizing():
    """flip=True must compute normalize(f(x) + f(hflip(x))) — the
    insightface published-number convention — using the SAME embed_fn
    (no separate compiled program)."""
    from face_recognition_models_tpu.evaluation.verification import (
        embed_unique_images)

    rs = np.random.RandomState(3)
    proj = rs.randn(12 * 8 * 3, 4).astype(np.float32)

    def embed_fn(images):
        flat = np.asarray(images, np.float32).reshape(len(images), -1)
        return flat @ proj  # asymmetric in pixel order: flip changes it

    images = rs.randint(0, 256, (5, 12, 8, 3), np.uint8)
    got = embed_unique_images(embed_fn, images, batch_size=4, flip=True)

    raw = embed_fn(images) + embed_fn(images[:, :, ::-1])
    want = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # sanity: differs from the unflipped embedding
    plain = embed_unique_images(embed_fn, images, batch_size=4)
    assert np.abs(plain - got).max() > 1e-3


def test_flip_tta_embedding_is_mirror_invariant():
    """sum over {x, hflip(x)} is symmetric: an image and its mirror get
    identical flip-TTA embeddings."""
    from face_recognition_models_tpu.evaluation.verification import (
        embed_unique_images)

    rs = np.random.RandomState(4)
    proj = rs.randn(8 * 8 * 3, 6).astype(np.float32)

    def embed_fn(images):
        flat = np.asarray(images, np.float32).reshape(len(images), -1)
        return flat @ proj

    img = rs.randint(0, 256, (8, 8, 3), np.uint8)
    both = np.stack([img, img[:, ::-1]])
    emb = embed_unique_images(embed_fn, both, batch_size=2, flip=True)
    np.testing.assert_allclose(emb[0], emb[1], rtol=1e-5, atol=1e-6)
