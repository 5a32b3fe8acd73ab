"""Offline face alignment (dataset preparation).

Equivalent of the reference's preprocess.py:8-46: walk a raw dataset tree,
detect+align each face with MTCNN (image_size=112, thresholds
[0.5, 0.7, 0.7], factor 0.709, post_process=False), save aligned JPEGs,
copying the original when no face is found.

MTCNN comes from facenet_pytorch when installed; in environments without it
the fallback is a square center-crop + resize (no detection) with a clear
warning — pre-aligned datasets (the normal case for CASIA/LFW packs) pass
through unchanged either way.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import numpy as np

_IMAGE_EXTS = (".png", ".jpg", ".jpeg")


def _build_mtcnn(image_size: int):
    try:
        import torch
        from facenet_pytorch import MTCNN
        device = "cuda" if torch.cuda.is_available() else "cpu"
        return MTCNN(image_size=image_size, margin=0, min_face_size=20,
                     thresholds=[0.5, 0.7, 0.7], factor=0.709,
                     post_process=False, device=device)
    except ImportError:
        return None


def _center_crop_resize(im, size: int):
    w, h = im.size
    s = min(w, h)
    left, top = (w - s) // 2, (h - s) // 2
    return im.crop((left, top, left + s, top + s)).resize((size, size))


def preprocess_dataset(original_path: str, aligned_path: str,
                       image_size: int = 112) -> dict:
    """Align every image under original_path into aligned_path (same tree).

    Returns counters: {'aligned': n, 'copied': n, 'fallback': bool}.
    """
    from PIL import Image

    mtcnn = _build_mtcnn(image_size)
    if mtcnn is None:
        print("WARNING: facenet_pytorch not installed — falling back to "
              "center-crop+resize (no face detection). Pre-aligned data is "
              "unaffected.")

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
                    face = mtcnn(im)
                    if face is not None:
                        arr = face.permute(1, 2, 0).byte().numpy()
                        Image.fromarray(arr).resize(
                            (image_size, image_size)).save(dst)
                        stats["aligned"] += 1
                    else:
                        shutil.copy(src, dst)  # no face: keep original
                        stats["copied"] += 1
                else:
                    _center_crop_resize(im, image_size).save(dst)
                    stats["aligned"] += 1
    return stats
