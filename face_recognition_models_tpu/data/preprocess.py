"""Offline face alignment (dataset preparation).

Equivalent of the reference's preprocess.py:8-46: walk a raw dataset tree,
detect+align each face with MTCNN (image_size=112, thresholds
[0.5, 0.7, 0.7], factor 0.709, post_process=False), save aligned JPEGs,
copying the original when no face is found.

Detection backends, in preference order:
1. the native JAX MTCNN cascade (detection/mtcnn.py) with weights loaded
   from a facenet_pytorch pnet.pt/rnet.pt/onet.pt directory
   (`face preprocess --mtcnn-weights <dir>`, or auto-discovered from an
   installed facenet_pytorch package);
2. facenet_pytorch's own MTCNN when that package is installed;
3. LOUD fallback: square center-crop + resize — NO face detection. The
   CLI prints a warning and `preprocess_dataset` reports fallback=True.
   Pre-aligned datasets (the normal case for CASIA/LFW packs) pass through
   unchanged either way.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import numpy as np

_IMAGE_EXTS = (".png", ".jpg", ".jpeg")


def _find_facenet_pytorch_weights() -> Optional[str]:
    try:
        import facenet_pytorch
        d = os.path.join(os.path.dirname(facenet_pytorch.__file__), "data")
        if all(os.path.exists(os.path.join(d, f))
               for f in ("pnet.pt", "rnet.pt", "onet.pt")):
            return d
    except ImportError:
        pass
    return None


class _FacenetPytorchAdapter:
    """facenet_pytorch MTCNN behind the native cascade's detect/extract
    contract (detection/mtcnn.py), for hosts that have the package but no
    extracted weight files."""

    def __init__(self, det, image_size: int):
        self._det = det
        self.image_size = image_size

    def detect(self, image):
        import numpy as _np
        boxes, probs, landmarks = self._det.detect(_np.asarray(image),
                                                   landmarks=True)
        if boxes is None:
            return (_np.zeros((0, 4)), _np.zeros((0,)),
                    _np.zeros((0, 5, 2)))
        return (_np.asarray(boxes, _np.float32),
                _np.asarray(probs, _np.float32),
                _np.asarray(landmarks, _np.float32))

    def extract(self, image):
        face = self._det(image)
        if face is None:
            return None
        return face.permute(1, 2, 0).byte().numpy()


def build_detector(image_size: int, weights_dir: Optional[str] = None,
                   align_mode: str = "crop"):
    """An object with `.detect(img) -> (boxes, probs, landmarks)` and
    `.extract(img) -> Optional[uint8 [S,S,3]]` — the native JAX cascade
    when weights are available, else a facenet_pytorch adapter, else None.
    Shared by offline preprocessing and the serving daemon's --align.

    align_mode selects what `.extract` does with the best face:
    'crop' (default) crops+resizes the detected box, the reference's
    behavior (preprocess.py:35-41); 'warp' similarity-warps the 5
    landmarks onto the ArcFace template (detection/align.py), the
    insightface production recipe."""
    if align_mode not in ("crop", "warp"):
        raise ValueError(f"align_mode must be 'crop' or 'warp', "
                         f"got {align_mode!r}")
    det = _build_raw_detector(image_size, weights_dir)
    if det is not None and align_mode == "warp":
        from face_recognition_models_tpu.detection.align import WarpAligner
        det = WarpAligner(det, image_size)
    return det


def _build_raw_detector(image_size: int, weights_dir: Optional[str] = None):
    weights_dir = weights_dir or _find_facenet_pytorch_weights()
    if weights_dir is not None:
        from face_recognition_models_tpu.detection import (
            MTCNN as JaxMTCNN,
            load_facenet_pytorch_weights,
        )
        params = load_facenet_pytorch_weights(weights_dir)
        return JaxMTCNN(params, image_size=image_size, min_face_size=20,
                        thresholds=(0.5, 0.7, 0.7), factor=0.709)
    try:
        import torch
        from facenet_pytorch import MTCNN
        device = "cuda" if torch.cuda.is_available() else "cpu"
        det = MTCNN(image_size=image_size, margin=0, min_face_size=20,
                    thresholds=[0.5, 0.7, 0.7], factor=0.709,
                    post_process=False, device=device)
        return _FacenetPytorchAdapter(det, image_size)
    except ImportError:
        return None


def _build_mtcnn(image_size: int, weights_dir: Optional[str] = None,
                 align_mode: str = "crop"):
    """extract-callable form of build_detector (None when unavailable)."""
    det = build_detector(image_size, weights_dir, align_mode=align_mode)
    if det is None:
        return None
    return lambda im: det.extract(np.asarray(im))


def _center_crop_resize(im, size: int):
    w, h = im.size
    s = min(w, h)
    left, top = (w - s) // 2, (h - s) // 2
    return im.crop((left, top, left + s, top + s)).resize((size, size))


def preprocess_dataset(original_path: str, aligned_path: str,
                       image_size: int = 112,
                       mtcnn_weights: Optional[str] = None,
                       align_mode: str = "crop") -> dict:
    """Align every image under original_path into aligned_path (same tree).

    Returns counters: {'aligned': n, 'copied': n, 'fallback': bool}.
    """
    from PIL import Image

    mtcnn = _build_mtcnn(image_size, weights_dir=mtcnn_weights,
                         align_mode=align_mode)
    if mtcnn is None:
        print("WARNING: no MTCNN weights available — falling back to "
              "center-crop+resize (NO face detection). Provide "
              "--mtcnn-weights <dir with pnet.pt/rnet.pt/onet.pt> or "
              "install facenet_pytorch. Pre-aligned data is unaffected.")

    os.makedirs(aligned_path, exist_ok=True)
    stats = {"aligned": 0, "copied": 0, "fallback": mtcnn is None}
    for root, _dirs, files in os.walk(original_path):
        rel = os.path.relpath(root, original_path)
        new_root = os.path.join(aligned_path, rel)
        os.makedirs(new_root, exist_ok=True)
        for name in files:
            if not name.lower().endswith(_IMAGE_EXTS):
                continue
            src = os.path.join(root, name)
            dst = os.path.join(new_root, name)
            with Image.open(src) as im:
                im = im.convert("RGB")
                if mtcnn is not None:
                    face = mtcnn(im)  # uint8 [S, S, 3] or None
                    if face is not None:
                        Image.fromarray(face).save(dst)
                        stats["aligned"] += 1
                    else:
                        shutil.copy(src, dst)  # no face: keep original
                        stats["copied"] += 1
                else:
                    _center_crop_resize(im, image_size).save(dst)
                    stats["aligned"] += 1
    return stats
