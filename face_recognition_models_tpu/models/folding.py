"""BatchNorm folding for inference (serving-path optimization).

At inference BatchNorm is a fixed per-channel affine; folding it into the
preceding conv's kernel/bias removes every BN op (and its bf16->fp32->bf16
casts) from the compiled graph:

    g      = scale / sqrt(var + eps)
    kernel' = kernel * g           (broadcast over the output channel)
    bias'   = bias_bn - mean * g

The folded params load into `ResNet(folded=True)` (convs carry biases,
norms are identity). Training checkpoints are untouched — folding happens
at export time (`face export` / serving.export_embedder).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _fold_pair(conv_p: Dict, bn_p: Dict, bn_s: Dict, eps: float) -> Dict:
    g = (np.asarray(bn_p["scale"], np.float64)
         / np.sqrt(np.asarray(bn_s["var"], np.float64) + eps))
    kernel = np.asarray(conv_p["kernel"], np.float64) * g
    bias = (np.asarray(bn_p["bias"], np.float64)
            - np.asarray(bn_s["mean"], np.float64) * g)
    return {"kernel": kernel.astype(np.float32),
            "bias": bias.astype(np.float32)}


def fold_resnet_bn(params: Dict, batch_stats: Dict,
                   eps: float = 1e-5) -> Dict:
    """Fold a trained ResNet's BN layers into conv weights.

    Returns the param tree for `ResNet(..., folded=True)`; `batch_stats`
    of the folded model is empty.
    """
    import jax

    params = jax.tree.map(np.asarray, jax.device_get(params))
    stats = jax.tree.map(np.asarray, jax.device_get(batch_stats))

    out: Dict = {"conv1": _fold_pair(params["conv1"], params["bn1"],
                                     stats["bn1"], eps),
                 "fc": dict(params["fc"])}
    for name, block in params.items():
        if not name.startswith("layer"):
            continue
        ob: Dict = {}
        for key in block:
            if key.startswith("conv"):
                bn = "bn" + key[len("conv"):]
                ob[key] = _fold_pair(block[key], block[bn],
                                     stats[name][bn], eps)
            elif key == "downsample_conv":
                ob[key] = _fold_pair(block[key], block["downsample_bn"],
                                     stats[name]["downsample_bn"], eps)
        out[name] = ob
    return out
