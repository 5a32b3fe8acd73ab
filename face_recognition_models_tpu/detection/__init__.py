from face_recognition_models_tpu.detection.mtcnn import (
    MTCNN,
    load_facenet_pytorch_weights,
)

__all__ = ["MTCNN", "load_facenet_pytorch_weights"]
