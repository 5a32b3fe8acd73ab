"""AOT export of the embedding model for serving.

The reference has no deployment story (training checkpoints only); this is
the production-serving path the north star asks for: a trained backbone is
exported as a **self-contained StableHLO artifact** (`jax.export`) with the
weights baked in as constants, plus a small JSON header. The artifact:

- loads WITHOUT the model-building code (no flax, no config — only jax),
- compiles AOT for the target platform(s) recorded at export time,
- uses symbolic batch dimensions, so one artifact serves any batch size
  (padding-free dynamic batching at the serving layer),
- takes uint8 NHWC [B, S, S, 3] and returns fp32 L2-ready embeddings
  (the uint8->normalized transform is fused inside, so bytes go straight
  from the decoder to the device).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

_MAGIC = b"FRTE"  # Face Recognition Tpu Embedder
_VERSION = 1


class EmbedderArtifact(NamedTuple):
    fn: Callable[[np.ndarray], np.ndarray]  # uint8 [B,S,S,3] -> f32 [B,D]
    image_size: int
    embed_dim: int
    meta: dict


def export_embedder(backbone, params, batch_stats, path: str,
                    image_size: int = 112,
                    mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                    platforms: Optional[Sequence[str]] = None,
                    fold_bn: str = "never",
                    meta: Optional[dict] = None) -> dict:
    """Export (backbone, weights) as a serving artifact at `path`.

    platforms: lowering targets (e.g. ["tpu", "cpu"]); defaults to the
    current backend. fold_bn: "always" folds BatchNorm into conv weights
    for ResNet backbones (inference-exact). Default "never": measured on
    TPU v5e the folded graph is ~8% SLOWER (12.49 vs 11.44 ms/b512) — XLA
    already fuses the BN affine into the conv epilogue, and per-conv
    bias-adds lower worse; folding only helps backends without that fusion.
    Returns the written header dict.
    """
    from face_recognition_models_tpu.train.step import make_eval_step

    folded = False
    if fold_bn == "always":
        from face_recognition_models_tpu.models.folding import fold_resnet_bn
        from face_recognition_models_tpu.models.resnet import ResNet
        if isinstance(backbone, ResNet) and not backbone.folded:
            params = fold_resnet_bn(params, batch_stats)
            batch_stats = {}
            backbone = backbone.clone(folded=True)
            folded = True

    eval_step = make_eval_step(backbone, mean=mean, std=std)
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)

    def embed(images):
        return eval_step(params, batch_stats, images)

    # symbolic batch: one artifact serves every batch size
    (spec,) = jax_export.symbolic_args_specs(
        (jnp.zeros((1, image_size, image_size, 3), jnp.uint8),),
        "b, _, _, _")
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(embed), **kwargs)(spec)

    embed_dim = int(exported.out_avals[0].shape[-1])
    header = {
        "format": "face_recognition_models_tpu/embedder",
        "version": _VERSION,
        "image_size": image_size,
        "embed_dim": embed_dim,
        "platforms": list(exported.platforms),
        "bn_folded": folded,
        **(meta or {}),
    }
    blob = exported.serialize()
    header_bytes = json.dumps(header).encode("utf-8")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header_bytes)))
        f.write(header_bytes)
        f.write(blob)
    return header


def load_embedder(path: str) -> EmbedderArtifact:
    """Load a serving artifact; model code is NOT required."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path} is not an embedder artifact "
                             f"(bad magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode("utf-8"))
        blob = f.read()
    exported = jax_export.deserialize(blob)

    def fn(images: np.ndarray) -> np.ndarray:
        images = np.ascontiguousarray(images, dtype=np.uint8)
        return np.asarray(exported.call(images))

    return EmbedderArtifact(fn=fn, image_size=header["image_size"],
                            embed_dim=header["embed_dim"], meta=header)
