"""Sharding rules for the train state and data batches.

Layout:
- batch arrays: sharded over the 'data' axis (DP);
- classifier kernel [D, C]: sharded over 'model' on the class axis (TP over
  classes — the native generalization of the reference's `device_id`
  chunking, criterion.py:67-79);
- head memories [C, D] (VPL/QAFace `mem`) and lifetimes [C]: sharded over
  'model' on the class axis;
- everything else (backbone params, EMA scalars, optimizer momenta of
  non-kernel leaves): replicated.

Optimizer state shards congruently because optax momenta mirror the param
tree structure (we shard by leaf shape/path on the whole state pytree).

With these constraints GSPMD inserts: psum over 'data' for gradient
all-reduce, and the softmax-CE over the class-sharded logits becomes
per-shard max/sum-exp + psum over 'model' — all over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis ('data') sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def _spec_for(path: str, leaf: Any, num_classes: int) -> P:
    """Choose a PartitionSpec for one train-state leaf by path/shape."""
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    # Classifier kernel [D, C] and its optimizer momenta — including the
    # sharded Partial-FC's manually-managed momentum buffer. Sub-center
    # kernels are [D, C*K] (class-major columns), hence the divisibility
    # form: whole classes stay together per shard when C divides the mesh.
    if ("kernel_w" in path or "kernel_mom" in path) \
            and len(shape) == 2 and shape[1] % num_classes == 0:
        return P(None, "model")
    # Head class-memories [C, D] and lifetimes [C].
    if ("head_state" in path or "kernel_w" in path) and shape[0] == num_classes:
        return P("model") if len(shape) == 1 else P("model", None)
    return P()


def train_state_shardings(mesh: Mesh, state: Any, num_classes: int):
    """A pytree of NamedShardings congruent to `state`."""

    def to_sharding(path, leaf):
        path_str = jax.tree_util.keystr(path)
        return NamedSharding(mesh, _spec_for(path_str, leaf, num_classes))

    return jax.tree_util.tree_map_with_path(to_sharding, state)
