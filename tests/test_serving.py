"""Serving path: export -> self-contained artifact -> load -> embed.

The artifact must reproduce the live model's embeddings exactly, accept
ANY batch size (symbolic batch dim), and `embed_directory` must preserve
file order and handle non-multiple-of-batch counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_recognition_models_tpu.models.resnet import BasicBlock, ResNet
from face_recognition_models_tpu.serving import (
    embed_directory,
    export_embedder,
    load_embedder,
)
from face_recognition_models_tpu.train.step import make_eval_step


@pytest.fixture(scope="module")
def tiny_model():
    model = ResNet(stage_sizes=(1, 1, 1, 1), block=BasicBlock,
                   num_filters=8, embed_dim=16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    return model, variables


def test_export_load_roundtrip(tmp_path, tiny_model):
    model, variables = tiny_model
    path = str(tmp_path / "embedder.frte")
    header = export_embedder(model, variables["params"],
                             variables.get("batch_stats", {}), path,
                             image_size=32, meta={"backbone": "tiny"})
    assert header["embed_dim"] == 16 and header["image_size"] == 32

    art = load_embedder(path)
    assert art.embed_dim == 16 and art.meta["backbone"] == "tiny"

    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (4, 32, 32, 3), np.uint8)
    got = art.fn(images)

    eval_step = jax.jit(make_eval_step(model))
    ref = np.asarray(eval_step(variables["params"],
                               variables.get("batch_stats", {}), images))
    # bf16 backbone: the exported program may fuse differently than the
    # live jit — agreement is at bf16 resolution
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)


def test_export_symbolic_batch(tmp_path, tiny_model):
    """One artifact serves every batch size."""
    model, variables = tiny_model
    path = str(tmp_path / "embedder.frte")
    export_embedder(model, variables["params"],
                    variables.get("batch_stats", {}), path, image_size=32)
    art = load_embedder(path)
    for b in (1, 3, 8):
        out = art.fn(np.zeros((b, 32, 32, 3), np.uint8))
        assert out.shape == (b, 16)


def test_load_rejects_garbage(tmp_path):
    path = tmp_path / "junk.frte"
    path.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="bad magic"):
        load_embedder(str(path))


def test_embed_directory_order_and_padding(tmp_path, tiny_model):
    from PIL import Image

    model, variables = tiny_model
    rs = np.random.RandomState(0)
    names = ["b/y.jpg", "a/x.jpg", "a/z.png", "c.jpg", "b/w.jpg"]
    for name in names:
        p = tmp_path / "imgs" / name
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rs.randint(0, 256, (32, 32, 3), np.uint8)).save(p)

    eval_step = jax.jit(make_eval_step(model))
    embed_fn = lambda im: eval_step(variables["params"],
                                    variables.get("batch_stats", {}), im)
    # batch 2 over 5 images: padding + remainder path
    emb, paths, norms = embed_directory(embed_fn, str(tmp_path / "imgs"),
                                        image_size=32, batch_size=2,
                                        num_workers=2)
    assert paths == sorted(paths) and len(paths) == 5
    assert emb.shape == (5, 16) and norms.shape == (5,)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    # order is content-correct: re-embed one file directly and compare;
    # the returned norm is that image's pre-normalization norm
    from face_recognition_models_tpu.data.pipeline import _decode_image
    i = paths.index("c.jpg")
    one = _decode_image(str(tmp_path / "imgs" / "c.jpg"), 32)[None]
    ref = np.array(embed_fn(one), np.float32)
    np.testing.assert_allclose(norms[i], np.linalg.norm(ref), rtol=1e-4)
    ref /= np.linalg.norm(ref)
    np.testing.assert_allclose(emb[i], ref[0], rtol=1e-4, atol=1e-5)


def test_embed_directory_rejects_corrupt_image(tmp_path, tiny_model):
    """Embedding is attribution: a corrupt file must raise, not silently
    receive a random other image's embedding (the training loader's
    resample policy)."""
    from PIL import Image

    model, variables = tiny_model
    rs = np.random.RandomState(0)
    root = tmp_path / "imgs"
    root.mkdir()
    for name in ("a.jpg", "b.jpg", "c.jpg"):
        Image.fromarray(rs.randint(0, 256, (32, 32, 3), np.uint8)).save(
            root / name)
    (root / "broken.jpg").write_bytes(b"\xff\xd8 not really a jpeg")

    eval_step = jax.jit(make_eval_step(model))
    embed_fn = lambda im: eval_step(variables["params"],
                                    variables.get("batch_stats", {}), im)
    with pytest.raises(ValueError, match="failed to decode"):
        embed_directory(embed_fn, str(root), image_size=32, batch_size=2,
                        num_workers=2)


def test_norm_quality_magface_map():
    """Quality is the reference's norm->margin affine map rescaled to
    [0, 1] (criterion.py:1229-1232: clamp to [l_a, u_a], then linear)."""
    from face_recognition_models_tpu.serving import norm_quality

    norms = np.array([0.0, 10.0, 60.0, 110.0, 500.0])
    q = norm_quality(norms)
    np.testing.assert_allclose(q, [0.0, 0.0, 0.5, 1.0, 1.0])
    # monotone in the norm
    rs = np.random.RandomState(0)
    n = np.sort(rs.uniform(0, 200, 64))
    assert (np.diff(norm_quality(n)) >= 0).all()


def test_identify_min_quality_gate(tmp_path):
    """--min-quality drops low-quality rows before 1:N scoring; missing
    quality fields fail loudly."""
    from face_recognition_models_tpu.evaluation.openset import (
        identify_from_npz)

    rs = np.random.RandomState(0)
    protos = rs.randn(3, 16).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)

    def noisy(c, scale):
        v = protos[c] + rs.randn(16).astype(np.float32) * scale
        return v / np.linalg.norm(v)

    # gallery: one clean image per identity
    g_emb = np.stack([noisy(c, 0.05) for c in range(3)])
    g_paths = np.array([f"id{c}/g.jpg" for c in range(3)])
    # probes: one clean (high quality) + one junk (low quality) per id;
    # junk probes are noise-dominated and would break rank-1
    p_emb = np.stack([noisy(c, 0.05) for c in range(3)]
                     + [noisy((c + 1) % 3, 0.05) for c in range(3)])
    p_paths = np.array([f"id{c}/clean.jpg" for c in range(3)]
                       + [f"id{c}/junk.jpg" for c in range(3)])
    p_quality = np.array([0.9, 0.9, 0.9, 0.1, 0.1, 0.1], np.float32)

    gal = str(tmp_path / "g.npz")
    prb = str(tmp_path / "p.npz")
    np.savez(gal, embeddings=g_emb, paths=g_paths,
             quality=np.full(3, 0.8, np.float32))
    np.savez(prb, embeddings=p_emb, paths=p_paths, quality=p_quality)

    full = identify_from_npz(gal, prb, ranks=(1,))
    gated = identify_from_npz(gal, prb, ranks=(1,), min_quality=0.5)
    assert gated.cmc[1] == 100.0 > full.cmc[1]

    # every row gated away -> loud error
    with pytest.raises(ValueError, match="removes every"):
        identify_from_npz(gal, prb, ranks=(1,), min_quality=0.95)

    # npz without a quality field -> loud error
    np.savez(gal, embeddings=g_emb, paths=g_paths)
    with pytest.raises(ValueError, match="no 'quality' field"):
        identify_from_npz(gal, prb, ranks=(1,), min_quality=0.5)


@pytest.mark.slow
def test_bn_folding_exact():
    """Folded ResNet (fp32) must reproduce the live eval model exactly:
    BN at inference is an affine, folding is mathematically exact."""
    from face_recognition_models_tpu.models.folding import fold_resnet_bn

    model = ResNet(stage_sizes=(1, 1, 1, 1), block=BasicBlock,
                   num_filters=8, embed_dim=16, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    variables = model.init(rng, jnp.zeros((1, 32, 32, 3)), train=False)
    # non-trivial BN stats: run a few train steps' worth of stats updates
    x = jax.random.normal(rng, (8, 32, 32, 3))
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    params, stats = variables["params"], mutated["batch_stats"]

    folded_params = fold_resnet_bn(params, stats)
    fmodel = model.clone(folded=True)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    with jax.default_matmul_precision("float32"):
        ref = model.apply({"params": params, "batch_stats": stats}, imgs,
                          train=False)
        got = fmodel.apply({"params": folded_params, "batch_stats": {}},
                           imgs, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # folded models refuse train mode
    with pytest.raises(ValueError, match="inference-only"):
        fmodel.apply({"params": folded_params, "batch_stats": {}}, imgs,
                     train=True)


def test_export_folds_bn_for_resnet(tmp_path, tiny_model):
    model, variables = tiny_model
    # give BN stats real values so folding actually changes the math
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 32, 32, 3))
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    params, stats = variables["params"], mutated["batch_stats"]
    path = str(tmp_path / "folded.frte")
    header = export_embedder(model, params, stats, path, image_size=32,
                             fold_bn="always")
    assert header["bn_folded"] is True
    art = load_embedder(path)
    images = np.random.RandomState(0).randint(0, 256, (2, 32, 32, 3),
                                              np.uint8)
    from face_recognition_models_tpu.train.step import make_eval_step
    ref = np.asarray(jax.jit(make_eval_step(model))(params, stats, images))
    # bf16 backbone: folding reroutes where the bf16 rounding happens
    # (scaled kernels vs post-conv affine); fp32 exactness is pinned by
    # test_bn_folding_exact above.
    np.testing.assert_allclose(art.fn(images), ref, rtol=2e-2, atol=2e-2)
