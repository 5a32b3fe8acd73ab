"""VPL memory head at production class count on the sharded path.

The 4.2M-identity sharded-Partial-FC validation's equivalent for the
STATEFUL heads (VERDICT r3 item 5): the dense sharded path is the only
large-C recipe for the memory heads (train/partial_fc.py deliberately
guards them out of the sampled path — the [C, D] memory write is a
full-class-axis scatter), so this certifies that recipe at C = 2^20.

One VPL-ArcFace (reference criterion.py:702-717) training run at
C = 1,048,576, D = 512 on the 8-virtual-device CPU mesh (model=8, data=1;
all 8 shards on the class axis — XLA's CPU in-process collectives
hard-abort if any participant reaches a rendezvous >40 s after the first,
and on the 1-core timeshared sandbox the skew scales with per-device
segment length, so the test minimizes per-shard matmul size rather than
exercising DP, which the dryrun already covers):

- classifier kernel [512, 1M] (2 GB) + its SGD momentum shard over 'model'
  on the class axis; the [1M, 512] memory (2 GB) and [1M] lifetimes shard
  over 'model' on the class axis (parallel/sharding.py);
- two full train steps execute with finite losses;
- the per-class memory scatter lands on the SHARDED buffers: every class
  seen in a batch has a non-zero memory row afterwards, unseen classes
  stay zero;
- the lifecycle integers are exact (write sets life=delta, then ALL
  lifetimes decay 1/step): seen-in-step-2 -> 2, seen-only-in-step-1 -> 1,
  never-seen -> -2 with delta=3.

Labels are spread across the full 2^20 range by a multiplicative hash so
every model shard receives writes. ~25 GB host RAM transient (kernel +
momentum + memory + grads, all fp32), ~2-3 min on the 1-core sandbox —
hence @slow.

Runnable standalone: python tests/test_vpl_scale.py
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

C = 1 << 20          # 1,048,576 identities
D = 512              # production feature dim (2 GB memory state)
BATCH = 8            # the [N, C] logits matmuls dominate the 1-core run
IMG = 32
DELTA = 3


def _build():
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.heads import get_head
    from face_recognition_models_tpu.models.resnet import Bottleneck, ResNet
    from face_recognition_models_tpu.parallel import (
        batch_sharding,
        make_mesh,
        train_state_shardings,
    )
    from face_recognition_models_tpu.train import (
        TrainState,
        get_optimizer,
        make_train_step,
    )

    mesh = make_mesh(cfg_lib.MeshConfig(data=1, model=8))
    head_cfg = cfg_lib.make_head_config("vpl_arcface", num_classes=C,
                                        feature_dim=D, delta=DELTA)
    head = get_head("vpl_arcface")
    # tiny-stage backbone (the dryrun convention): the subject under test is
    # the sharded [C]-axis state machinery, not backbone FLOPs
    backbone = ResNet(stage_sizes=(1, 1, 1, 1), block=Bottleneck,
                      num_filters=16, embed_dim=D)
    rng = jax.random.PRNGKey(0)
    variables = backbone.init(rng, jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                              train=False)
    tx = get_optimizer("sgd", 0.1, momentum=0.9, weight_decay=5e-4)
    params = {"backbone": variables["params"],
              "kernel_w": head.init_kernel(rng, head_cfg)}
    state = TrainState(step=jnp.int32(0), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       head_state=head.init_state(head_cfg),
                       opt_state=tx.init(params), rng=jax.random.PRNGKey(1))
    shardings = train_state_shardings(mesh, state, C)
    data_s = batch_sharding(mesh)
    state = jax.device_put(state, shardings)
    step = jax.jit(make_train_step(backbone, head, head_cfg, tx),
                   in_shardings=(shardings, data_s, data_s),
                   out_shardings=(shardings, None),
                   donate_argnums=(0,))
    return mesh, state, step, data_s


def _hash_labels(seed, n):
    """n labels spread over the full [0, C) range (Knuth multiplicative
    hash) so memory writes land on many different model shards."""
    return ((np.arange(n, dtype=np.int64) * 2654435761 + 11 + seed * 65011)
            % C).astype(np.int32)


@pytest.mark.slow
def test_vpl_memory_head_at_1m_classes_sharded():
    mesh, state, step, data_s = _build()
    shard_rows = C // mesh.shape["model"]

    labels1 = _hash_labels(1, BATCH)
    # step 2 revisits the first 2 step-1 classes and writes 6 fresh ones
    labels2 = np.concatenate([labels1[:2], _hash_labels(2, BATCH - 2)])
    assert len(set(labels1) | set(labels2)) == 2 * BATCH - 2  # collide-free

    rs = np.random.RandomState(0)
    losses = []
    for labels in (labels1, labels2):
        images = jax.device_put(
            rs.randint(0, 256, (BATCH, IMG, IMG, 3)).astype(np.uint8), data_s)
        state, metrics = step(state, images, jnp.asarray(labels))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), f"non-finite loss {losses}"

    hs = state.head_state
    # the memory actually landed sharded: each addressable shard holds a
    # [C/8, D] row-slice over 'model'
    assert hs.mem.shape == (C, D)
    shard_shapes = {s.data.shape for s in hs.mem.addressable_shards}
    assert shard_shapes == {(shard_rows, D)}, shard_shapes
    assert {s.data.shape for s in hs.life.addressable_shards} \
        == {(shard_rows,)}

    # exact integer lifecycle on the 2 GB sharded buffer: seen classes get
    # life=DELTA at their write, then ALL lifetimes decay 1 per step
    seen2 = np.unique(labels2)
    seen1_only = np.setdiff1d(labels1, labels2)
    never = (np.asarray([3, 5, 7, 11]) * 104729 + 1) % C
    never = np.setdiff1d(never, np.concatenate([labels1, labels2]))
    life = np.asarray(hs.life[jnp.asarray(np.concatenate(
        [seen2, seen1_only, never]))])
    n2, n1 = len(seen2), len(seen1_only)
    np.testing.assert_array_equal(life[:n2], DELTA - 1.0)
    np.testing.assert_array_equal(life[n2:n2 + n1], DELTA - 2.0)
    np.testing.assert_array_equal(life[n2 + n1:], -2.0)

    # memory-scatter landing: written rows are feature means (non-zero),
    # untouched rows remain the zero init
    touched = np.asarray(jnp.abs(hs.mem[jnp.asarray(seen2)]).sum(axis=1))
    untouched = np.asarray(jnp.abs(hs.mem[jnp.asarray(never)]).sum(axis=1))
    assert (touched > 0.0).all()
    np.testing.assert_array_equal(untouched, 0.0)

    # the kernel and its momentum shard over 'model' on the class axis too
    assert {s.data.shape
            for s in state.params["kernel_w"].addressable_shards} \
        == {(D, shard_rows)}


if __name__ == "__main__":
    import os
    import time

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    test_vpl_memory_head_at_1m_classes_sharded()
    print(f"ok in {time.time() - t0:.1f}s")
