"""Batch embedding extraction: directory of images -> embeddings on disk.

`face embed` — production inference over an image tree at the device rate:
the threaded Loader (native libjpeg decode, uint8 transfer) feeds either a
serving artifact (`--model embedder.frte`) or a checkpointed backbone, and
the L2-normalized embeddings land in an .npz (embeddings [N, D] fp32 +
relative paths + per-image `norms`/`quality`). The reference has no
equivalent (its embeddings only ever exist inside the eval loop).

Per-image quality: the PRE-normalization embedding norm is a learned
quality signal for margin-trained backbones — MagFace trains the norm to
grow with face quality and maps it linearly over [l_a=10, u_a=110]
(reference criterion.py:1229-1232); AdaFace uses the same norm as its
quality proxy (criterion.py:876-885). `norm_quality` exposes that map as
a [0, 1] score so downstream 1:N identification can gate low-quality
probes/gallery images (`face identify --min-quality`).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import numpy as np


class _FlatIndex:
    """Minimal Loader-compatible index over ANY image tree, in stable
    sorted order (no identity-folder requirement, no shuffle)."""

    def __init__(self, root: str):
        self.root = root
        rels = []
        for r, _dirs, files in os.walk(root):
            for f in files:
                if f.lower().endswith((".jpg", ".jpeg", ".png")):
                    rels.append(os.path.relpath(os.path.join(r, f), root))
        if not rels:
            raise FileNotFoundError(f"no images under {root}")
        self.rels = sorted(rels)

    def absolute_paths(self):
        return [os.path.join(self.root, r) for r in self.rels]

    def labels(self):
        return [0] * len(self.rels)

    def __len__(self):
        return len(self.rels)


def norm_quality(norms: np.ndarray, l_a: float = 10.0, u_a: float = 110.0
                 ) -> np.ndarray:
    """Map pre-normalization embedding norms to a [0, 1] quality score.

    The linear norm->margin map MagFace trains against (reference
    criterion.py:1229-1232: norms clamped to [l_a=10, u_a=110] then mapped
    affinely) doubles as a quality score: 0 at/below l_a, 1 at/above u_a.
    Meaningful for margin-trained backbones (MagFace by construction,
    ArcFace/AdaFace empirically — AdaFace builds its margin on the same
    norm proxy, criterion.py:876-885)."""
    norms = np.asarray(norms, np.float32)
    return np.clip((norms - l_a) / (u_a - l_a), 0.0, 1.0)


def embed_directory(embed_fn: Callable, root: str, image_size: int,
                    batch_size: int = 256, num_workers: int = 8,
                    l2_normalize: bool = True
                    ) -> Tuple[np.ndarray, list, np.ndarray]:
    """Embed every image under `root` (any nesting). Returns
    (embeddings [N, D] fp32, relative paths, pre-normalization norms [N]).
    Order matches paths.

    Unlike training (where the Loader's static-shape policy RESAMPLES a
    corrupt image to a random other index), embedding is an attribution:
    row i must be path i's face, so any decode failure raises instead of
    silently writing some other person's embedding under that path. The
    PIL backend is forced for the same reason — the native decoder is
    JPEG-only and a mixed jpg/png tree must not fail-and-resample.

    The last batch is padded (static device shapes) by repeating the final
    image; padding rows are dropped from the result."""
    from face_recognition_models_tpu.data.pipeline import Loader

    index = _FlatIndex(root)
    n = len(index)
    pad = (-n) % batch_size
    if pad:
        index.rels = index.rels + index.rels[-1:] * pad
    loader = Loader(index, batch_size=batch_size, image_size=image_size,
                    shuffle=False, num_workers=num_workers,
                    drop_remainder=False, backend="pil")

    chunks = []
    for images, _labels in loader.epoch(0):
        if loader.skipped_images:
            raise ValueError(
                f"{loader.skipped_images} image(s) under {root} failed to "
                "decode; embeddings would be misattributed (the loader "
                "substitutes a random other image). Remove or fix the "
                "corrupt files and re-run.")
        chunks.append(np.asarray(embed_fn(images), np.float32))
    emb = np.concatenate(chunks, axis=0)[:n]
    paths = index.rels[:n]
    norms = np.linalg.norm(emb, axis=1)
    if l2_normalize:
        emb /= np.maximum(norms[:, None], 1e-12)
    return emb, list(paths), norms


def load_embed_fn(model_path: Optional[str], checkpoint_dir: Optional[str],
                  backbone: str, which: str, image_size: int,
                  bn_dtype: str = "bfloat16", embed_dim: int = 512):
    """Resolve an embedding function from either a `face export` artifact
    or a training checkpoint dir (shared by `face embed` and `face serve`).

    Returns (embed_fn, image_size) — image_size may be overridden by the
    artifact's own. bf16 BN compute is the inference default: +1.9%
    throughput at unchanged accuracy (PERF.md "Headline"); pass
    bn_dtype="float32" to match training parity numerics bit for bit.
    Raises ValueError when neither source is given.
    """
    if model_path is not None:
        from face_recognition_models_tpu.serving.export import load_embedder
        if bn_dtype != "bfloat16":
            print("WARNING: --bn-dtype has no effect on exported "
                  "artifacts (the BN compute dtype is baked in at "
                  "`face export` time)")
        art = load_embedder(model_path)
        return art.fn, art.image_size
    if checkpoint_dir is None:
        raise ValueError("provide --model or --checkpoint-dir")

    import jax
    import jax.numpy as jnp

    from face_recognition_models_tpu.checkpoint import restore_backbone
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.train.step import make_eval_step

    model = get_backbone(backbone, embed_dim=embed_dim,
                         bn_dtype=jnp.dtype(bn_dtype))
    dummy = np.zeros((1, image_size, image_size, 3), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           dummy, train=False)
    abstract = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    restored = restore_backbone(checkpoint_dir, abstract, which)
    eval_step = jax.jit(make_eval_step(model))
    return (lambda im: eval_step(restored["params"],
                                 restored["batch_stats"], im)), image_size


def run_embed_cli(input_dir: str, output: str,
                  model_path: Optional[str] = None,
                  checkpoint_dir: Optional[str] = None,
                  backbone: str = "resnet50", which: str = "final",
                  image_size: int = 112, batch_size: int = 256,
                  num_workers: int = 8,
                  bn_dtype: str = "bfloat16", embed_dim: int = 512) -> int:
    try:
        embed_fn, image_size = load_embed_fn(
            model_path, checkpoint_dir, backbone, which, image_size,
            bn_dtype, embed_dim=embed_dim)
    except ValueError as e:
        print(f"error: {e}")
        return 2

    emb, paths, norms = embed_directory(embed_fn, input_dir, image_size,
                                        batch_size, num_workers)
    quality = norm_quality(norms)
    np.savez(output, embeddings=emb, paths=np.asarray(paths),
             norms=norms, quality=quality)
    print(f"embedded {len(paths)} images -> {output} "
          f"({emb.shape[1]}-d, L2-normalized; "
          f"quality mean {quality.mean():.3f}, "
          f"min {quality.min():.3f} [MagFace norm map])")
    return 0
