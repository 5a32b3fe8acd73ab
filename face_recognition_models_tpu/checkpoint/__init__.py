from face_recognition_models_tpu.checkpoint.manager import CheckpointManager

__all__ = ["CheckpointManager"]
