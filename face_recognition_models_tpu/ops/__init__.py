from face_recognition_models_tpu.ops.normalize import (
    cosine_logits,
    l2_normalize,
)

__all__ = ["cosine_logits", "l2_normalize"]
