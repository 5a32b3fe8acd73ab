"""Reference-style model API.

The reference exposes one `*Net(num_classes, backbone)` class per head
(criterion.py: SphereFaceNet, CosFaceNet, ArcFaceNet, MV_SoftmaxNet,
CurricularFaceNet, VPLArcFaceNet, AdaFaceNet, ElasticArcFaceNet,
ElasticCosFaceNet, MagFaceNet, QAFaceNet) with train-mode forward returning
the head tuple and eval-mode forward returning embeddings. This module is
the functional equivalent for users porting from the reference:

    model = ArcFaceNet(num_classes=10575, backbone="resnet50")
    variables, kernel, head_state = model.init(jax.random.PRNGKey(0))
    out = model.train_forward(variables, kernel, images, labels, head_state)
    embeddings = model.embed(variables, images)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import get_head
from face_recognition_models_tpu.heads.base import HeadOutput, get_proxy
from face_recognition_models_tpu.models import get_backbone
from face_recognition_models_tpu.ops.image_ops import normalize_images


@dataclass
class MarginModel:
    """Backbone + margin head bundle (the *Net equivalent)."""

    head_name: str
    num_classes: int
    backbone_name: str = "resnet18"
    image_size: int = cfg_lib.IMAGE_SIZE
    head_overrides: Optional[dict] = None

    def __post_init__(self):
        self.head_cfg = cfg_lib.make_head_config(
            self.head_name, num_classes=self.num_classes,
            **(self.head_overrides or {}))
        self.head = get_head(self.head_name)
        self.backbone = get_backbone(self.backbone_name,
                                     embed_dim=self.head_cfg.feature_dim)
        self.loss_model = self.head_name  # reference attr parity

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Tuple[dict, jnp.ndarray, Any]:
        """(backbone variables, head kernel [D, C], head state)."""
        k1, k2 = jax.random.split(rng)
        dummy = jnp.zeros((1, self.image_size, self.image_size, 3),
                          jnp.float32)
        variables = self.backbone.init({"params": k1, "dropout": k1}, dummy,
                                       train=False)
        return variables, self.head.init_kernel(k2, self.head_cfg), \
            self.head.init_state(self.head_cfg)

    # ------------------------------------------------------------------
    def train_forward(self, variables: dict, kernel: jnp.ndarray,
                      images: jnp.ndarray, labels: jnp.ndarray,
                      head_state: Any = None,
                      rng: Optional[jax.Array] = None,
                      minput_images: Optional[jnp.ndarray] = None
                      ) -> Tuple[HeadOutput, Any]:
        """Training forward: returns (HeadOutput, new batch_stats) — the
        reference's ([pre, logits], norms, loss_g, one_hot) plus state."""
        if images.dtype == jnp.uint8:
            images = normalize_images(images)
        feats, mutated = self.backbone.apply(
            variables, images, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng} if rng is not None else None)
        minput_feats = None
        if minput_images is not None:
            if minput_images.dtype == jnp.uint8:
                minput_images = normalize_images(minput_images)
            minput_feats, _ = self.backbone.apply(
                variables, minput_images, train=True,
                mutable=["batch_stats"])
            minput_feats = minput_feats.astype(jnp.float32)
        out = self.head.apply(self.head_cfg, kernel,
                              feats.astype(jnp.float32), labels, head_state,
                              rng=rng, minput=minput_feats)
        return out, mutated["batch_stats"]

    # ------------------------------------------------------------------
    def embed(self, variables: dict, images: jnp.ndarray) -> jnp.ndarray:
        """Eval forward: raw embeddings (the *Net eval branch)."""
        if images.dtype == jnp.uint8:
            images = normalize_images(images)
        return self.backbone.apply(variables, images,
                                   train=False).astype(jnp.float32)

    # ------------------------------------------------------------------
    def get_proxy(self, kernel: jnp.ndarray,
                  labels: jnp.ndarray) -> jnp.ndarray:
        """Raw class centers [D, N] (criterion.py get_proxy parity)."""
        return get_proxy(kernel, labels)


def set_memory_training(head_state: Any, flag: bool) -> Any:
    """Equivalent of VPLArcFaceNet/QAFaceNet.change_training_mode
    (criterion.py:676-678, 1395-1397): toggle the memory-update flag in the
    head state pytree."""
    if head_state is None or not hasattr(head_state, "training_flag"):
        raise ValueError("head state has no training flag "
                         "(only VPL-ArcFace and QAFace carry one)")
    return head_state.replace(training_flag=jnp.bool_(flag))


def _net(head_name):
    def ctor(num_classes: int, backbone: str = "resnet18", **overrides):
        return MarginModel(head_name=head_name, num_classes=num_classes,
                           backbone_name=backbone,
                           head_overrides=overrides or None)
    ctor.__name__ = head_name
    return ctor


SphereFaceNet = _net("sphereface")
CosFaceNet = _net("cosface")
ArcFaceNet = _net("arcface")
MV_SoftmaxNet = _net("mv_softmax")
CurricularFaceNet = _net("curricularface")
VPLArcFaceNet = _net("vpl_arcface")
AdaFaceNet = _net("adaface")
ElasticArcFaceNet = _net("elastic_arcface")
ElasticCosFaceNet = _net("elastic_cosface")
MagFaceNet = _net("magface")
QAFaceNet = _net("qaface")
