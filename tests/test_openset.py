"""Open-set metrics (evaluation/openset.py): TPR@FAR, CMC, TPIR@FPIR —
checked against hand-computable constructions."""

import numpy as np
import pytest

from face_recognition_models_tpu.evaluation import (
    closed_set_identification,
    open_set_identification,
    tpr_at_far,
)


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_tpr_at_far_exact_small_case():
    # 10 impostors at scores .0,.1,...,.9 ; 10 genuines at .55,.65,...,1.45
    imp = np.arange(10) / 10.0
    gen = 0.55 + np.arange(10) / 10.0
    scores = np.concatenate([gen, imp])
    labels = np.concatenate([np.ones(10), np.zeros(10)]).astype(int)

    res = tpr_at_far(scores, labels, fars=(0.1, 0.2, 0.0))
    # FAR=0.1 -> exactly 1 impostor may pass (the 0.9): threshold just
    # above the 2nd-highest impostor 0.8 -> genuines >= thresh: 0.85..1.45
    tpr, thresh = res[0.1]
    assert thresh == pytest.approx(0.8, abs=1e-9)
    assert tpr == pytest.approx(7 / 10)
    # FAR=0.2 -> 2 impostors pass, threshold just above 0.7
    tpr2, _ = res[0.2]
    assert tpr2 == pytest.approx(8 / 10)
    # FAR=0 -> nothing passes; threshold above the top impostor 0.9
    tpr0, thresh0 = res[0.0]
    assert thresh0 > 0.9
    assert tpr0 == pytest.approx(6 / 10)  # genuines 0.95..1.45


def test_tpr_at_far_monotone_in_far():
    rng = np.random.default_rng(0)
    scores = np.concatenate([rng.normal(0.6, 0.2, 4000),
                             rng.normal(0.0, 0.2, 4000)])
    labels = np.concatenate([np.ones(4000), np.zeros(4000)]).astype(int)
    res = tpr_at_far(scores, labels, fars=(1e-1, 1e-2, 1e-3))
    tprs = [res[f][0] for f in (1e-1, 1e-2, 1e-3)]
    assert tprs[0] >= tprs[1] >= tprs[2] > 0


def test_closed_set_identification_oracle():
    # gallery: 4 identities along coordinate axes, 2 images each (slightly
    # rotated); probes: noisy copies -> rank-1 should be 100%
    rng = np.random.default_rng(1)
    gal_ids = np.repeat(np.arange(4), 2)
    gal = _unit(np.eye(4)[gal_ids] + rng.normal(0, 0.05, (8, 4)))
    probe_ids = np.array([0, 1, 2, 3] * 3)
    probes = _unit(np.eye(4)[probe_ids] + rng.normal(0, 0.05, (12, 4)))
    res = closed_set_identification(gal, gal_ids, probes, probe_ids,
                                    ranks=(1, 2))
    assert res.cmc[1] == 100.0
    assert res.cmc[2] == 100.0

    # adversarial probe: one probe pointing at the WRONG axis -> rank-1
    # drops by exactly one probe's worth
    probes_bad = probes.copy()
    probes_bad[0] = _unit(np.eye(4)[1] + rng.normal(0, 0.01, 4))
    res2 = closed_set_identification(gal, gal_ids, probes_bad, probe_ids,
                                     ranks=(1,))
    assert res2.cmc[1] == pytest.approx(100.0 * 11 / 12)


def test_closed_set_rejects_unknown_probe_ids():
    gal = _unit(np.eye(3))
    with pytest.raises(ValueError, match="missing from the gallery"):
        closed_set_identification(gal, np.arange(3), gal, np.array([5, 1, 2]))


def test_open_set_identification_oracle():
    # gallery: identities 0..3; mated probes near their axis, non-mated
    # probes orthogonal-ish (random in the remaining dims)
    rng = np.random.default_rng(2)
    d = 16
    axes = np.eye(d)
    gal_ids = np.arange(4)
    gal = _unit(axes[:4] + rng.normal(0, 0.02, (4, d)))
    mated_ids = np.array([0, 1, 2, 3] * 5)
    mated = _unit(axes[mated_ids] + rng.normal(0, 0.05, (20, d)))
    # non-mated: identities 100+ living on axes 8..15 (far from gallery)
    nm_ids = 100 + np.arange(20)
    nonmated = _unit(axes[8 + (np.arange(20) % 8)]
                     + rng.normal(0, 0.05, (20, d)))

    probes = np.concatenate([mated, nonmated])
    probe_ids = np.concatenate([mated_ids, nm_ids])
    res = open_set_identification(gal, gal_ids, probes, probe_ids,
                                  fpirs=(0.05, 0.5))
    # fpir=0.05 over 20 non-mated -> floor(1) may false-alarm; the mated
    # scores (~1.0) sit far above the non-mated (~0.1): all accepted
    assert res.tpir_at_fpir[0.05] == 100.0
    assert res.cmc[1] == 100.0
    # threshold at the stricter point is higher
    assert res.thresholds[0.05] >= res.thresholds[0.5]


def test_open_set_tie_convention_consistent():
    """An exact score tie between the true identity and a lower-indexed
    impostor must count as rank-1 for BOTH the CMC and the TPIR top-1
    check (argmax used to prefer the first column and silently fail the
    mated probe)."""
    d = 4
    gal = np.eye(d)[:2]
    gal_ids = np.array([0, 1])
    # mated probe for identity 1 sitting exactly between the two axes:
    # score ties with impostor identity 0, which sorts first
    tied = _unit(np.array([[1.0, 1.0, 0.0, 0.0]]))
    nonmated = _unit(np.array([[0.0, 0.0, 1.0, 0.0]] * 5))
    probes = np.concatenate([tied, nonmated])
    probe_ids = np.concatenate([[1], 100 + np.arange(5)])
    res = open_set_identification(gal, gal_ids, probes, probe_ids,
                                  fpirs=(1.0,), ranks=(1,))
    assert res.cmc[1] == 100.0
    assert res.tpir_at_fpir[1.0] == 100.0  # was 0.0 with argmax ties


def test_open_set_requires_both_populations():
    gal = _unit(np.eye(3))
    with pytest.raises(ValueError, match="mated and"):
        open_set_identification(gal, np.arange(3), gal, np.arange(3))


def test_tpr_far_integration_with_verification_pairs():
    """Synthetic identity embeddings through the pair machinery: genuine
    pairs same-identity, impostor cross-identity; TPR@FAR=1 must be 1.0
    when the construction is separable."""
    rng = np.random.default_rng(3)
    ids = np.repeat(np.arange(8), 4)
    emb = _unit(np.eye(8)[ids] + rng.normal(0, 0.1, (32, 8)))
    gen = [float(emb[i] @ emb[i + 1]) for i in range(0, 32, 4)]
    imp = [float(emb[i] @ emb[(i + 5) % 32]) for i in range(0, 32, 4)
           if ids[i] != ids[(i + 5) % 32]]
    scores = np.array(gen + imp)
    labels = np.array([1] * len(gen) + [0] * len(imp))
    res = tpr_at_far(scores, labels, fars=(1.0,))
    assert res[1.0][0] == 1.0


def test_identify_from_npz_and_cli(tmp_path, capsys):
    """identify_from_npz over two `face embed`-format archives; identity
    from the parent dir of each path; CLI prints the result."""
    rng = np.random.default_rng(4)
    d = 8
    gal_ids = np.repeat(np.arange(4), 2)
    gal = _unit(np.eye(d)[gal_ids] + rng.normal(0, 0.05, (8, d))
                ).astype(np.float32)
    gal_paths = np.array([f"g/id{int(i)}/{n}.jpg"
                          for n, i in enumerate(gal_ids)])
    probe_ids = np.array([0, 1, 2, 3] * 2)
    probes = _unit(np.eye(d)[probe_ids] + rng.normal(0, 0.05, (8, d))
                   ).astype(np.float32)
    probe_paths = np.array([f"p/id{int(i)}/{n}.jpg"
                            for n, i in enumerate(probe_ids)])
    g_npz, p_npz = str(tmp_path / "g.npz"), str(tmp_path / "p.npz")
    np.savez(g_npz, embeddings=gal, paths=gal_paths)
    np.savez(p_npz, embeddings=probes, paths=probe_paths)

    from face_recognition_models_tpu.evaluation.openset import (
        identify_from_npz,
    )
    res = identify_from_npz(g_npz, p_npz, ranks=(1,))
    assert res.cmc[1] == 100.0
    assert not res.tpir_at_fpir  # closed set: all probe ids in gallery

    # non-mated probes flip it to the open-set protocol
    probe_paths_open = probe_paths.copy()
    probe_paths_open[:4] = [f"p/unknown{n}/x.jpg" for n in range(4)]
    p2_npz = str(tmp_path / "p2.npz")
    np.savez(p2_npz, embeddings=probes, paths=probe_paths_open)
    res2 = identify_from_npz(g_npz, p2_npz, ranks=(1,), fpirs=(0.5,))
    assert res2.tpir_at_fpir  # open-set metrics present

    from face_recognition_models_tpu.cli.main import main
    assert main(["identify", "--gallery", g_npz, "--probes", p_npz,
                 "--ranks", "1"]) == 0
    assert "rank-1 100.000%" in capsys.readouterr().out


def test_best_per_identity_matches_bruteforce():
    """The sort+reduceat pooling equals per-identity max over unsorted,
    duplicated, non-contiguous gallery ids."""
    from face_recognition_models_tpu.evaluation.openset import (
        _best_per_identity,
    )
    rng = np.random.default_rng(5)
    gids = rng.integers(0, 7, 40) * 10  # non-contiguous, shuffled
    scores = rng.normal(size=(9, 40))
    pooled, uniq = _best_per_identity(scores, gids)
    for col, gid in enumerate(uniq):
        np.testing.assert_allclose(pooled[:, col],
                                   scores[:, gids == gid].max(axis=1))


def test_device_scoring_matches_host():
    """pooled_scores_device (jit matmul + segment_max, probe chunking with
    padding) returns the host path's pooled matrix; the identification
    results agree end to end including a non-chunk-aligned probe count."""
    from face_recognition_models_tpu.evaluation.openset import (
        _best_per_identity,
        pooled_scores_device,
    )
    rng = np.random.default_rng(6)
    d = 12
    gal_ids = np.repeat(np.arange(6), 3)
    gal = _unit(np.eye(d)[gal_ids] + rng.normal(0, 0.1, (18, d))
                ).astype(np.float32)
    probe_ids = np.array([0, 1, 2, 3, 4, 5, 0, 1, 2, 3, 4])  # 11 probes
    probes = _unit(np.eye(d)[probe_ids] + rng.normal(0, 0.1, (11, d))
                   ).astype(np.float32)

    pooled_dev, uniq_dev = pooled_scores_device(gal, gal_ids, probes,
                                                chunk=4)
    pooled_host, uniq_host = _best_per_identity(probes @ gal.T, gal_ids)
    np.testing.assert_array_equal(uniq_dev, uniq_host)
    np.testing.assert_allclose(pooled_dev, pooled_host, atol=1e-6)

    res_d = closed_set_identification(gal, gal_ids, probes, probe_ids,
                                      ranks=(1,), device=True)
    res_h = closed_set_identification(gal, gal_ids, probes, probe_ids,
                                      ranks=(1,))
    assert res_d.cmc == res_h.cmc

    # open set too
    probe_ids_o = probe_ids.copy()
    probe_ids_o[:3] = [90, 91, 92]
    res_do = open_set_identification(gal, gal_ids, probes, probe_ids_o,
                                     fpirs=(0.5,), device=True)
    res_ho = open_set_identification(gal, gal_ids, probes, probe_ids_o,
                                     fpirs=(0.5,))
    assert res_do.tpir_at_fpir == res_ho.tpir_at_fpir
    assert res_do.cmc == res_ho.cmc


def test_pool_templates_oracle():
    """Pooling matches the per-identity loop; output is L2-normalized;
    quality weights tilt the template toward high-quality images."""
    from face_recognition_models_tpu.evaluation.openset import (
        pool_templates,
    )

    rng = np.random.default_rng(7)
    ids = np.array(["b", "a", "b", "c", "a", "b"])
    emb = _unit(rng.normal(size=(6, 8))).astype(np.float32)
    w = rng.uniform(0.1, 1.0, 6).astype(np.float32)

    pooled, uniq = pool_templates(emb, ids, w)
    assert list(uniq) == ["a", "b", "c"]
    np.testing.assert_allclose(np.linalg.norm(pooled, axis=1), 1.0,
                               rtol=1e-6)
    for k, ident in enumerate(uniq):
        rows = ids == ident
        ref = (emb[rows] * w[rows][:, None]).sum(axis=0)
        ref /= np.linalg.norm(ref)
        np.testing.assert_allclose(pooled[k], ref, rtol=1e-5, atol=1e-6)

    # unweighted: same as weights of ones
    p0, _ = pool_templates(emb, ids)
    p1, _ = pool_templates(emb, ids, np.ones(6, np.float32))
    np.testing.assert_allclose(p0, p1, rtol=1e-6)


def test_identify_quality_weighted_pooling(tmp_path):
    """A junk image inside each probe template drags the unweighted mean
    off the identity axis; quality weighting recovers rank-1."""
    from face_recognition_models_tpu.evaluation.openset import (
        identify_from_npz,
    )

    rng = np.random.default_rng(11)
    d = 16
    protos = _unit(rng.normal(size=(4, d))).astype(np.float32)
    gal_paths = np.array([f"g/id{c}/0.jpg" for c in range(4)])

    # per identity: 2 clean probe images + 2 pointing at the NEXT identity
    p_emb, p_paths, p_q = [], [], []
    for c in range(4):
        for n in range(2):
            p_emb.append(_unit(protos[c] + rng.normal(0, 0.05, d)))
            p_q.append(0.9)
            p_paths.append(f"p/id{c}/clean{n}.jpg")
        for n in range(2):
            p_emb.append(_unit(protos[(c + 1) % 4] + rng.normal(0, 0.05, d)))
            p_q.append(0.01)
            p_paths.append(f"p/id{c}/junk{n}.jpg")
    g_npz, p_npz = str(tmp_path / "g.npz"), str(tmp_path / "p.npz")
    np.savez(g_npz, embeddings=protos, paths=gal_paths)
    np.savez(p_npz, embeddings=np.asarray(p_emb, np.float32),
             paths=np.asarray(p_paths),
             quality=np.asarray(p_q, np.float32))

    plain = identify_from_npz(g_npz, p_npz, ranks=(1,), pool="probes")
    weighted = identify_from_npz(g_npz, p_npz, ranks=(1,), pool="probes",
                                 pool_weight="quality")
    assert weighted.cmc[1] == 100.0 > plain.cmc[1]

    # quality weighting without stored quality fails loudly
    np.savez(p_npz, embeddings=np.asarray(p_emb, np.float32),
             paths=np.asarray(p_paths))
    with pytest.raises(ValueError, match="no 'quality' field"):
        identify_from_npz(g_npz, p_npz, ranks=(1,), pool="probes",
                          pool_weight="quality")


def test_identify_pool_gallery_and_min_quality_compose(tmp_path):
    """Gallery pooling collapses multi-image identities; composing with
    --min-quality gates rows before pooling."""
    from face_recognition_models_tpu.evaluation.openset import (
        identify_from_npz,
    )

    rng = np.random.default_rng(13)
    d = 16
    protos = _unit(rng.normal(size=(3, d))).astype(np.float32)
    g_emb, g_paths, g_q = [], [], []
    for c in range(3):
        g_emb.append(_unit(protos[c] + rng.normal(0, 0.05, d)))
        g_q.append(0.9)
        g_paths.append(f"g/id{c}/clean.jpg")
        g_emb.append(_unit(rng.normal(size=d)))  # junk gallery image
        g_q.append(0.05)
        g_paths.append(f"g/id{c}/junk.jpg")
    p_emb = np.stack([_unit(protos[c] + rng.normal(0, 0.05, d))
                      for c in range(3)]).astype(np.float32)
    p_paths = np.array([f"p/id{c}/0.jpg" for c in range(3)])

    g_npz, p_npz = str(tmp_path / "g.npz"), str(tmp_path / "p.npz")
    np.savez(g_npz, embeddings=np.asarray(g_emb, np.float32),
             paths=np.asarray(g_paths), quality=np.asarray(g_q, np.float32))
    np.savez(p_npz, embeddings=p_emb, paths=p_paths,
             quality=np.full(3, 0.9, np.float32))

    res = identify_from_npz(g_npz, p_npz, ranks=(1,), pool="gallery",
                            min_quality=0.5)
    assert res.cmc[1] == 100.0


def test_sharded_gallery_scoring_matches_single_device():
    """Gallery rows sharded over the 8-device mesh (shard=True) pool to
    exactly the single-device result — including a gallery count not
    divisible by the device count (dummy-segment padding) and identities
    whose images land on different shards."""
    from face_recognition_models_tpu.evaluation.openset import (
        _best_per_identity,
        pooled_scores_device,
    )
    rng = np.random.default_rng(17)
    d = 16
    # 27 gallery images over 5 identities, shuffled so identities span
    # shard boundaries after the stable sort
    gal_ids = np.array([f"id{i % 5}" for i in range(27)])
    gal = _unit(rng.normal(size=(27, d))).astype(np.float32)
    probes = _unit(rng.normal(size=(9, d))).astype(np.float32)

    pooled_s, uniq_s = pooled_scores_device(gal, gal_ids, probes, chunk=4,
                                            shard=True)
    pooled_1, uniq_1 = pooled_scores_device(gal, gal_ids, probes, chunk=4,
                                            shard=False)
    pooled_h, uniq_h = _best_per_identity(probes @ gal.T, gal_ids)
    np.testing.assert_array_equal(uniq_s, uniq_h)
    np.testing.assert_array_equal(uniq_1, uniq_h)
    np.testing.assert_allclose(pooled_s, pooled_h, atol=1e-6)
    np.testing.assert_allclose(pooled_1, pooled_h, atol=1e-6)
