"""face_recognition_models_tpu — a TPU-native face-recognition framework.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of the
reference PyTorch framework `Lac-quan-yeu-doi/Face-Recognition-Models`:

- CNN embedding backbones (ResNet-18/50, EfficientNet-B0, MobileNet-V2) in
  Flax, bf16 compute, NHWC layout (reference: main_code/utils/backbones.py).
- Eleven margin-based softmax heads (SphereFace, CosFace, ArcFace, MV-Softmax,
  CurricularFace, VPL-ArcFace, AdaFace, ElasticArcFace, ElasticCosFace,
  MagFace, QAFace) expressed as pure margin-transform functions over a fused
  normalized-cosine logit kernel (reference: main_code/utils/criterion.py).
- A FaceNet triplet-loss pipeline with on-device semi-hard mining
  (reference: FaceNet/main.py).
- pjit/GSPMD data-parallel + class-sharded-classifier training over a device
  mesh, orbax checkpointing with rotate-3/best/resume semantics, and a fully
  vectorized LFW-style 10-fold verification protocol
  (reference: main_code/utils/model_utils.py, evaluate_models.py).
"""

from face_recognition_models_tpu.version import __version__

__all__ = ["__version__"]
