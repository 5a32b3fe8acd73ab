from face_recognition_models_tpu.train.optim import get_optimizer
from face_recognition_models_tpu.train.schedules import get_schedule
from face_recognition_models_tpu.train.state import TrainState, create_train_state
from face_recognition_models_tpu.train.step import make_eval_step, make_train_step

__all__ = ["get_optimizer", "get_schedule", "TrainState",
           "create_train_state", "make_train_step", "make_eval_step"]
