"""MTCNN face detection, JAX-native (P-Net / R-Net / O-Net cascade).

The reference delegates detection+alignment to facenet_pytorch's MTCNN
(reference preprocess.py:19-37: image_size=112, thresholds [0.5, 0.7, 0.7],
factor 0.709, post_process=False, crop+resize of the selected box). This
module reimplements the cascade natively:

- the three CNNs are flax modules (NHWC) with per-channel PReLU and
  ceil-mode pooling, jitted per pyramid scale;
- the pipeline (image pyramid, box generation at stride 2 / cell 12, NMS,
  box regression, square-ify, crop) is numpy on host — detection is an
  offline preprocessing step, the per-window math runs on device;
- weights load from facenet_pytorch's published pnet.pt/rnet.pt/onet.pt
  state_dicts via `load_facenet_pytorch_weights` (this sandbox has no
  weights baked in — `face preprocess --mtcnn-weights <dir>` takes them
  from disk; without weights preprocess falls back loudly to center-crop).

Conventions follow facenet_pytorch exactly where they are observable:
pixel normalization (x - 127.5) * 0.0078125, dense layers flatten in
(W, H, C) order, P-Net box decode at stride 2 with cell size 12, per-scale
NMS 0.5 then cross-scale 0.7, and `detect -> largest-probability box ->
crop + resize` for the aligned output.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""

    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,), jnp.float32)
        return jnp.where(x >= 0, x, alpha * x)


def _ceil_pool(x, window: int, stride: int):
    """MaxPool with torch ceil_mode=True semantics: pad right/bottom with
    -inf so partial windows count."""
    n, h, w, c = x.shape
    out_h = -(-max(h - window, 0) // stride) + 1
    out_w = -(-max(w - window, 0) // stride) + 1
    pad_h = max(0, (out_h - 1) * stride + window - h)
    pad_w = max(0, (out_w - 1) * stride + window - w)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride))


def _flatten_whc(x):
    """facenet_pytorch flattens dense inputs in (W, H, C) order
    (x.permute(0, 3, 2, 1) on NCHW == transpose H/W on NHWC)."""
    return x.transpose(0, 2, 1, 3).reshape(x.shape[0], -1)


class PNet(nn.Module):
    """Proposal net: fully convolutional, 12x12 receptive field, stride 2."""

    @nn.compact
    def __call__(self, x):
        # threshold decisions and sub-pixel landmarks are
        # accuracy-sensitive (CLAUDE.md matmul-precision rule)
        with jax.default_matmul_precision("float32"):
            x = nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x)
            x = PReLU(10, name="prelu1")(x)
            x = _ceil_pool(x, 2, 2)
            x = nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x)
            x = PReLU(16, name="prelu2")(x)
            x = nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x)
            x = PReLU(32, name="prelu3")(x)
            prob = jax.nn.softmax(
                nn.Conv(2, (1, 1), name="conv4_1")(x), axis=-1)
            reg = nn.Conv(4, (1, 1), name="conv4_2")(x)
            return prob, reg


class RNet(nn.Module):
    """Refine net over 24x24 crops."""

    @nn.compact
    def __call__(self, x):
        # threshold decisions and sub-pixel landmarks are
        # accuracy-sensitive (CLAUDE.md matmul-precision rule)
        with jax.default_matmul_precision("float32"):
            x = nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x)
            x = PReLU(28, name="prelu1")(x)
            x = _ceil_pool(x, 3, 2)
            x = nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x)
            x = PReLU(48, name="prelu2")(x)
            x = _ceil_pool(x, 3, 2)
            x = nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x)
            x = PReLU(64, name="prelu3")(x)
            x = nn.Dense(128, name="dense4")(_flatten_whc(x))
            x = PReLU(128, name="prelu4")(x)
            prob = jax.nn.softmax(nn.Dense(2, name="dense5_1")(x), axis=-1)
            reg = nn.Dense(4, name="dense5_2")(x)
            return prob, reg


class ONet(nn.Module):
    """Output net over 48x48 crops; also predicts 5 landmarks."""

    @nn.compact
    def __call__(self, x):
        # threshold decisions and sub-pixel landmarks are
        # accuracy-sensitive (CLAUDE.md matmul-precision rule)
        with jax.default_matmul_precision("float32"):
            x = nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x)
            x = PReLU(32, name="prelu1")(x)
            x = _ceil_pool(x, 3, 2)
            x = nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x)
            x = PReLU(64, name="prelu2")(x)
            x = _ceil_pool(x, 3, 2)
            x = nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x)
            x = PReLU(64, name="prelu3")(x)
            x = _ceil_pool(x, 2, 2)
            x = nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x)
            x = PReLU(128, name="prelu4")(x)
            x = nn.Dense(256, name="dense5")(_flatten_whc(x))
            x = PReLU(256, name="prelu5")(x)
            prob = jax.nn.softmax(nn.Dense(2, name="dense6_1")(x), axis=-1)
            reg = nn.Dense(4, name="dense6_2")(x)
            lmk = nn.Dense(10, name="dense6_3")(x)
            return prob, reg, lmk


# ---------------------------------------------------------------------------
# facenet_pytorch weight conversion
# ---------------------------------------------------------------------------


def _np_(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t, np.float32)


def _convert_net(sd: Dict, conv_names, dense_names) -> Dict:
    """torch state_dict -> flax params for one net."""
    params: Dict = {}
    for name in conv_names:
        params[name] = {
            "kernel": _np_(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np_(sd[f"{name}.bias"]),
        }
    for name in dense_names:
        params[name] = {"kernel": _np_(sd[f"{name}.weight"]).T,
                        "bias": _np_(sd[f"{name}.bias"])}
    for key in sd:
        if key.startswith("prelu") and key.endswith(".weight"):
            params[key[:-len(".weight")]] = {"alpha": _np_(sd[key])}
    return params


def load_facenet_pytorch_weights(directory: str) -> Dict[str, Dict]:
    """Load pnet.pt / rnet.pt / onet.pt torch state_dicts from `directory`
    (the files shipped inside the facenet_pytorch package, data/ subdir)
    and convert them to this module's flax param trees."""
    import os

    import torch

    def load(fname):
        return torch.load(os.path.join(directory, fname),
                          map_location="cpu", weights_only=True)

    return {
        "pnet": _convert_net(load("pnet.pt"),
                             ["conv1", "conv2", "conv3", "conv4_1",
                              "conv4_2"], []),
        "rnet": _convert_net(load("rnet.pt"),
                             ["conv1", "conv2", "conv3"],
                             ["dense4", "dense5_1", "dense5_2"]),
        "onet": _convert_net(load("onet.pt"),
                             ["conv1", "conv2", "conv3", "conv4"],
                             ["dense5", "dense6_1", "dense6_2",
                              "dense6_3"]),
    }


# ---------------------------------------------------------------------------
# Pipeline helpers (numpy, host)
# ---------------------------------------------------------------------------


def _nms(boxes: np.ndarray, scores: np.ndarray, thresh: float,
         mode: str = "union") -> np.ndarray:
    """Greedy NMS; returns kept indices (descending score)."""
    if len(boxes) == 0:
        return np.empty((0,), np.int64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = (np.maximum(0.0, xx2 - xx1 + 1)
                 * np.maximum(0.0, yy2 - yy1 + 1))
        if mode == "min":
            iou = inter / np.minimum(area[i], area[order[1:]])
        else:
            iou = inter / (area[i] + area[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


def _square(boxes: np.ndarray) -> np.ndarray:
    """Expand boxes to squares around their centers (rerec)."""
    out = boxes.copy()
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    out[:, 0] = boxes[:, 0] + 0.5 * (w - side)
    out[:, 1] = boxes[:, 1] + 0.5 * (h - side)
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def _regress(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    w = (boxes[:, 2] - boxes[:, 0] + 1)[:, None]
    h = (boxes[:, 3] - boxes[:, 1] + 1)[:, None]
    out = boxes.copy()
    out[:, :4] = boxes[:, :4] + reg * np.concatenate([w, h, w, h], axis=1)
    return out


def _resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] weight matrix replicating jax.image.resize 'bilinear'
    (triangle kernel, antialiased on downscale, edge-normalized)."""
    scale = out_size / in_size
    sample = (np.arange(out_size) + 0.5) / scale - 0.5
    kscale = min(scale, 1.0)
    x = (sample[:, None] - np.arange(in_size)[None, :]) * kscale
    w = np.maximum(0.0, 1.0 - np.abs(x))
    total = w.sum(axis=1, keepdims=True)
    return np.where(total > 0, w / total, 0.0).astype(np.float32)


def _np_bilinear_resize(patch: np.ndarray, size: int) -> np.ndarray:
    """Host bilinear resize matching jax.image.resize(..., 'bilinear').

    Pure numpy on purpose: the per-box patch shapes are data-dependent,
    and a device resize would compile one XLA program PER DISTINCT SHAPE
    — unbounded compile-cache growth in a long-lived `face serve --align`
    process (and each compile stalls the tunnel). Two small matmuls per
    box cost microseconds on host.
    """
    wh = _resize_weights(patch.shape[0], size)
    ww = _resize_weights(patch.shape[1], size)
    return np.einsum("oi,ijc,pj->opc", wh, patch, ww, optimize=True)


def _crop_resize(img: np.ndarray, boxes: np.ndarray, size: int
                 ) -> np.ndarray:
    """Crop float boxes (clamped, zero-padded) and bilinear-resize."""
    h, w = img.shape[:2]
    out = np.zeros((len(boxes), size, size, 3), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes[:, :4]):
        ix1, iy1 = int(round(x1)), int(round(y1))
        ix2, iy2 = int(round(x2)) + 1, int(round(y2)) + 1
        sx1, sy1 = max(ix1, 0), max(iy1, 0)
        sx2, sy2 = min(ix2, w), min(iy2, h)
        if sx2 <= sx1 or sy2 <= sy1:
            continue
        patch = np.zeros((iy2 - iy1, ix2 - ix1, 3), np.float32)
        patch[sy1 - iy1:sy2 - iy1, sx1 - ix1:sx2 - ix1] = \
            img[sy1:sy2, sx1:sx2]
        out[i] = _np_bilinear_resize(patch, size)
    return out


def _normalize(x: np.ndarray) -> np.ndarray:
    return (x.astype(np.float32) - 127.5) * 0.0078125


# ---------------------------------------------------------------------------
# The detector
# ---------------------------------------------------------------------------


class MTCNN:
    """P/R/O-Net cascade with facenet_pytorch-compatible knobs.

    params: {'pnet': ..., 'rnet': ..., 'onet': ...} flax param trees
    (from `load_facenet_pytorch_weights` or random init for tests).
    """

    def __init__(self, params: Dict[str, Dict], image_size: int = 112,
                 min_face_size: int = 20,
                 thresholds: Tuple[float, float, float] = (0.5, 0.7, 0.7),
                 factor: float = 0.709):
        self.params = jax.tree.map(jnp.asarray, params)
        self.image_size = image_size
        self.min_face_size = min_face_size
        self.thresholds = thresholds
        self.factor = factor
        self._pnet = jax.jit(
            lambda p, x: PNet().apply({"params": p}, x))
        self._rnet = jax.jit(
            lambda p, x: RNet().apply({"params": p}, x))
        self._onet = jax.jit(
            lambda p, x: ONet().apply({"params": p}, x))

    @staticmethod
    def init_random(rng=None) -> Dict[str, Dict]:
        """Random-initialized param trees (pipeline tests; no detection
        quality without real weights)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return {
            "pnet": PNet().init(rng, jnp.zeros((1, 12, 12, 3)))["params"],
            "rnet": RNet().init(rng, jnp.zeros((1, 24, 24, 3)))["params"],
            "onet": ONet().init(rng, jnp.zeros((1, 48, 48, 3)))["params"],
        }

    # ------------------------------------------------------------------
    def _scales(self, h: int, w: int) -> List[float]:
        m = 12.0 / self.min_face_size
        min_side = min(h, w) * m
        scales, s = [], m
        while min_side >= 12:
            scales.append(s)
            s *= self.factor
            min_side *= self.factor
        return scales

    def detect(self, image: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Detect faces in a uint8/float [H, W, 3] image.

        Returns (boxes [K, 4], probs [K], landmarks [K, 5, 2]); empty
        arrays when nothing survives the cascade.
        """
        img = np.asarray(image)
        h, w = img.shape[:2]
        norm = _normalize(img)
        empty = (np.zeros((0, 4)), np.zeros((0,)), np.zeros((0, 5, 2)))

        # ---- stage 1: P-Net over the pyramid --------------------------
        all_boxes = []
        for scale in self._scales(h, w):
            sh, sw = int(math.ceil(h * scale)), int(math.ceil(w * scale))
            scaled = np.asarray(jax.image.resize(
                jnp.asarray(norm), (sh, sw, 3), "bilinear"))
            prob, reg = self._pnet(self.params["pnet"], scaled[None])
            prob = np.asarray(prob)[0, :, :, 1]
            reg = np.asarray(reg)[0]
            ys, xs = np.where(prob >= self.thresholds[0])
            if len(ys) == 0:
                continue
            scores = prob[ys, xs]
            r = reg[ys, xs]                        # [k, 4]
            # stride 2, cell 12, map back to original coordinates
            x1 = np.round((xs * 2 + 1) / scale)
            y1 = np.round((ys * 2 + 1) / scale)
            x2 = np.round((xs * 2 + 12) / scale)
            y2 = np.round((ys * 2 + 12) / scale)
            boxes = np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
            keep = _nms(boxes, scores, 0.5)
            all_boxes.append(np.concatenate(
                [boxes[keep], scores[keep, None], r[keep]], axis=1))
        if not all_boxes:
            return empty
        boxes = np.concatenate(all_boxes)
        keep = _nms(boxes[:, :4], boxes[:, 4], 0.7)
        boxes = boxes[keep]
        boxes = _square(_regress(boxes[:, :4], boxes[:, 5:9]))

        # ---- stage 2: R-Net -------------------------------------------
        crops = _normalize(_crop_resize(img.astype(np.float32), boxes, 24))
        prob, reg = self._rnet(self.params["rnet"], jnp.asarray(crops))
        prob = np.asarray(prob)[:, 1]
        reg = np.asarray(reg)
        keep = prob >= self.thresholds[1]
        if not keep.any():
            return empty
        boxes, prob, reg = boxes[keep], prob[keep], reg[keep]
        keep = _nms(boxes, prob, 0.7)
        boxes = _square(_regress(boxes[keep], reg[keep]))
        prob = prob[keep]

        # ---- stage 3: O-Net -------------------------------------------
        crops = _normalize(_crop_resize(img.astype(np.float32), boxes, 48))
        oprob, reg, lmk = self._onet(self.params["onet"], jnp.asarray(crops))
        oprob = np.asarray(oprob)[:, 1]
        reg, lmk = np.asarray(reg), np.asarray(lmk)
        keep = oprob >= self.thresholds[2]
        if not keep.any():
            return empty
        boxes, oprob, reg, lmk = boxes[keep], oprob[keep], reg[keep], lmk[keep]
        # landmarks are relative to the (pre-regression) box
        bw = (boxes[:, 2] - boxes[:, 0] + 1)[:, None]
        bh = (boxes[:, 3] - boxes[:, 1] + 1)[:, None]
        pts_x = boxes[:, 0:1] + lmk[:, 0:5] * bw
        pts_y = boxes[:, 1:2] + lmk[:, 5:10] * bh
        boxes = _regress(boxes, reg)
        keep = _nms(boxes, oprob, 0.7, mode="min")
        boxes, oprob = boxes[keep], oprob[keep]
        landmarks = np.stack([pts_x[keep], pts_y[keep]], axis=2)
        return boxes, oprob, landmarks

    def extract(self, image: np.ndarray) -> Optional[np.ndarray]:
        """Reference usage (preprocess.py:35-41): highest-probability face,
        cropped and resized to image_size. uint8 [S, S, 3] or None."""
        boxes, probs, _ = self.detect(image)
        if len(boxes) == 0:
            return None
        best = boxes[int(np.argmax(probs))]
        crop = _crop_resize(np.asarray(image, np.float32), best[None],
                            self.image_size)[0]
        return np.clip(np.round(crop), 0, 255).astype(np.uint8)
