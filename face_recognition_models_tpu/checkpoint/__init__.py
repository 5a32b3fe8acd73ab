from face_recognition_models_tpu.checkpoint.manager import (
    CheckpointManager,
    restore_backbone,
)

__all__ = ["CheckpointManager", "restore_backbone"]
