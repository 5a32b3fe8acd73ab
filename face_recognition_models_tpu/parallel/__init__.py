from face_recognition_models_tpu.parallel.mesh import make_mesh
from face_recognition_models_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    train_state_shardings,
)

__all__ = ["make_mesh", "batch_sharding", "replicated",
           "train_state_shardings"]
