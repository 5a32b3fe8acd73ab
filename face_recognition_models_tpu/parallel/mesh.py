"""Device-mesh construction.

The reference has no distributed backend at all (SURVEY §2.3/§5.8): its only
parallelism idea is chunking the classifier's class dimension over a GPU
list (criterion.py:67-79 etc., dormant). Here parallelism is first-class:
a ('data', 'model') mesh where the batch shards over `data` (gradient
all-reduce rides ICI via XLA-inserted psums) and the [D, C] classifier — and
the [C, D] head memories — shard over `model` (the TPU-native
generalization of the reference's class chunking).

Multi-host: call `jax.distributed.initialize()` before `make_mesh`; the mesh
is built over `jax.devices()` so it spans all hosts/slices automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import AxisType, Mesh

from face_recognition_models_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = cfg.model if cfg.model > 0 else 1
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(
            f"Mesh {data}x{model} does not cover {n} devices. "
            "Set MeshConfig(data=..., model=...) so data*model == device count.")
    # Auto axis types: shardings stay out of trace types and GSPMD inserts
    # collectives from the in/out sharding constraints alone (jax.make_mesh
    # defaults to Explicit in this JAX version, which demands out_sharding
    # annotations on every cross-axis contraction — not what we want for a
    # mesh-agnostic model definition).
    return jax.make_mesh((data, model), cfg.axis_names,
                         axis_types=(AxisType.Auto,) * len(cfg.axis_names),
                         devices=devices)
