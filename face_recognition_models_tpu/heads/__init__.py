from face_recognition_models_tpu.heads.base import HeadOutput, get_head
from face_recognition_models_tpu.heads import margins  # registers all heads

__all__ = ["HeadOutput", "get_head"]
