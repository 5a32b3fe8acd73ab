from face_recognition_models_tpu.models.backbones import (
    BACKBONES,
    get_backbone,
)
from face_recognition_models_tpu.models.resnet import ResNet, resnet18, resnet50

__all__ = ["BACKBONES", "get_backbone", "ResNet", "resnet18", "resnet50"]
