from face_recognition_models_tpu.evaluation.device_protocol import (
    kfold_verification_device,
)
from face_recognition_models_tpu.evaluation.openset import (
    IdentificationResult,
    closed_set_identification,
    open_set_identification,
    tpr_at_far,
)
from face_recognition_models_tpu.evaluation.periodic import (
    PeriodicEvalHook,
)
from face_recognition_models_tpu.evaluation.verification import (
    VerificationResult,
    embed_unique_images,
    kfold_verification,
    pair_cosine_similarities,
)

__all__ = ["VerificationResult", "embed_unique_images", "kfold_verification",
           "kfold_verification_device", "pair_cosine_similarities",
           "IdentificationResult", "closed_set_identification",
           "open_set_identification", "tpr_at_far", "PeriodicEvalHook"]
