from face_recognition_models_tpu.utils.logging import (
    MetricTracker,
    Tee,
)
from face_recognition_models_tpu.utils.experiment import ExperimentLogger

__all__ = ["MetricTracker", "Tee", "ExperimentLogger"]
