from face_recognition_models_tpu.detection.align import (
    ARCFACE_TEMPLATE_112,
    WarpAligner,
    extract_aligned,
    norm_crop,
    umeyama,
)
from face_recognition_models_tpu.detection.mtcnn import (
    MTCNN,
    load_facenet_pytorch_weights,
)

__all__ = [
    "ARCFACE_TEMPLATE_112",
    "MTCNN",
    "WarpAligner",
    "extract_aligned",
    "load_facenet_pytorch_weights",
    "norm_crop",
    "umeyama",
]
