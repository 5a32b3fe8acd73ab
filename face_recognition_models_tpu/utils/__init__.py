from face_recognition_models_tpu.utils.logging import (
    AverageMeter,
    ProgressMeter,
    Tee,
)
from face_recognition_models_tpu.utils.experiment import ExperimentLogger

__all__ = ["AverageMeter", "ProgressMeter", "Tee", "ExperimentLogger"]
