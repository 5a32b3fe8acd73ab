from face_recognition_models_tpu.triplet.train import (
    make_triplet_train_step,
    train_facenet,
)

__all__ = ["make_triplet_train_step", "train_facenet"]
