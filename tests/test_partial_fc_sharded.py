"""Class-sharded Partial-FC (train/partial_fc_sharded.py).

The kernel + momentum shard over 'model'; each shard samples its local
class range (the original Partial FC architecture, An et al. 2021).
Key contract: with every shard's sample covering its whole class range,
the sharded sampled step IS the dense step — loss and updated kernel
must match the single-device jnp path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.parallel import (
    batch_sharding,
    make_mesh,
    train_state_shardings,
)
from face_recognition_models_tpu.train.optim import get_optimizer
from face_recognition_models_tpu.train.partial_fc import (
    init_partial_fc_opt_state,
)
from face_recognition_models_tpu.train.partial_fc_sharded import (
    _local_sample,
    make_sharded_partial_fc_train_step,
)
from face_recognition_models_tpu.train.state import create_train_state
from face_recognition_models_tpu.train.step import make_train_step


def _make(head_name, C, batch, mesh=None, num_sampled_local=None,
          image_size=24, seed=0, lr=0.1, compute_dtype="float32",
          logq=True):
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head=head_name, num_classes=C,
        batch_size=batch, compute_dtype=compute_dtype,
        data=cfg_lib.DataConfig(image_size=image_size))
    head_cfg = cfg_lib.make_head_config(head_name, num_classes=C)
    tx = get_optimizer("sgd", lr, momentum=0.9, weight_decay=5e-4)
    backbone, head, state = create_train_state(cfg, head_cfg, tx,
                                               rng=jax.random.PRNGKey(seed))
    if mesh is not None:
        state = state.replace(
            opt_state=init_partial_fc_opt_state(tx, state.params))
        step = make_sharded_partial_fc_train_step(
            backbone, head_cfg, tx, num_sampled_local,
            learning_rate=lr, mesh=mesh, logq_correction=logq)
        shardings = train_state_shardings(mesh, state, num_classes=C)
        state = jax.device_put(state, shardings)
        data_s = batch_sharding(mesh)
        step = jax.jit(step, in_shardings=(shardings, data_s, data_s),
                       out_shardings=(shardings, None))
    else:
        step = jax.jit(make_train_step(backbone, head, head_cfg, tx,
                                       use_fused_head=False))
    return step, state


def test_local_sample_contract():
    mesh = make_mesh(cfg_lib.MeshConfig(data=2, model=4))
    C, c_local, C_s_l = 64, 16, 8
    labels = jnp.array([0, 1, 17, 18, 19, 35, 63, 63], jnp.int32)

    def block(labels_f, rng):
        classes, col_valid, u, offset = _local_sample(
            rng, labels_f, c_local, min(8, c_local), C_s_l, "model")
        return (classes[None], col_valid[None], u[None], offset[None])

    classes, valid, u, offset = shard_map(
        block, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P("model"), P("model"), P("model"), P("model")),
        check_vma=False,
    )(labels, jax.random.PRNGKey(0))
    classes, valid, u = map(np.asarray, (classes, valid, u))
    # per-shard unique positive counts: shard0 {0,1}, shard1 {1,2,3},
    # shard2 {3}, shard3 {15}
    assert u.tolist() == [2, 3, 1, 1]
    for m in range(4):
        cls_m, val_m = classes[m], valid[m]
        assert ((cls_m >= 0) & (cls_m < c_local)).all()
        locals_here = {int(l) - m * c_local for l in labels.tolist()
                       if m * c_local <= int(l) < (m + 1) * c_local}
        pos_part = set(cls_m[:8][val_m[:8]].tolist())
        assert pos_part == locals_here
        # negatives exclude local positives, all distinct
        negs = cls_m[8:].tolist()
        assert not set(negs) & locals_here
        assert len(set(negs)) == len(negs)


@pytest.mark.slow
def test_full_local_coverage_matches_dense_step():
    """batch = C with one positive per class: every shard's positives fill
    its whole range (C_s_local == c_local, zero negatives) — the sharded
    sampled step must equal the dense single-device step."""
    C, batch = 32, 32
    mesh = make_mesh(cfg_lib.MeshConfig(data=2, model=4))
    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (batch, 24, 24, 3), np.uint8)
    labels = rs.permutation(C).astype(np.int32)

    dense_step, dense_state = _make("arcface", C, batch)
    shard_step, shard_state = _make("arcface", C, batch, mesh=mesh,
                                    num_sampled_local=C // 4, logq=False)

    d_state, d_metrics = dense_step(dense_state, images, labels)
    s_state, s_metrics = shard_step(shard_state, images, labels)

    np.testing.assert_allclose(float(s_metrics["loss"]),
                               float(d_metrics["loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(s_metrics["acc1"]),
                               float(d_metrics["acc1"]))
    np.testing.assert_allclose(np.asarray(s_state.params["kernel_w"]),
                               np.asarray(d_state.params["kernel_w"]),
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_state.params["backbone"])[0]),
        np.asarray(jax.tree.leaves(d_state.params["backbone"])[0]),
        rtol=5e-3, atol=5e-5)


def test_sharded_kernel_and_momentum_shardings():
    C = 256
    mesh = make_mesh(cfg_lib.MeshConfig(data=2, model=4))
    _, state = _make("cosface", C, 16, mesh=mesh, num_sampled_local=32)
    kspec = state.params["kernel_w"].sharding.spec
    mspec = state.opt_state["kernel_mom"].sharding.spec
    assert kspec == P(None, "model")
    assert mspec == P(None, "model")


@pytest.mark.parametrize("head_name", [
    "arcface",
    pytest.param("adaface", marks=pytest.mark.slow),
])
@pytest.mark.slow
def test_sharded_partial_fc_loss_decreases(head_name):
    C, batch, C_s_l = 256, 16, 32     # c_local=64, 16 negs/shard
    mesh = make_mesh(cfg_lib.MeshConfig(data=2, model=4))
    labels = np.tile(np.arange(8, dtype=np.int32), 2) * 29 % C
    images = (labels[:, None, None, None] * 31 % 255).astype(np.uint8) \
        * np.ones((1, 24, 24, 3), np.uint8)
    step, state = _make(head_name, C, batch, mesh=mesh,
                        num_sampled_local=C_s_l, seed=3, lr=0.02)
    losses = []
    for _ in range(12):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


@pytest.mark.slow
def test_unsampled_local_columns_untouched():
    C, batch, C_s_l = 512, 8, 16      # c_local=128, samples 16/shard
    mesh = make_mesh(cfg_lib.MeshConfig(data=2, model=4))
    rs = np.random.RandomState(1)
    images = rs.randint(0, 256, (batch, 24, 24, 3), np.uint8)
    labels = rs.choice(C, batch, replace=False).astype(np.int32)
    step, state = _make("cosface", C, batch, mesh=mesh,
                        num_sampled_local=C_s_l)
    k0 = np.asarray(state.params["kernel_w"])
    new_state, _ = step(state, images, labels)
    k1 = np.asarray(new_state.params["kernel_w"])
    changed = np.flatnonzero(np.any(k0 != k1, axis=0))
    assert 0 < len(changed) <= 4 * C_s_l
    # every batch label's column was updated
    assert set(labels.tolist()) <= set(changed.tolist())
    mom = np.asarray(new_state.opt_state["kernel_mom"])
    assert set(np.flatnonzero(np.any(mom != 0, axis=0))) == set(changed)


def test_memory_heads_rejected():
    mesh = make_mesh(cfg_lib.MeshConfig(data=2, model=4))
    head_cfg = cfg_lib.make_head_config("vpl_arcface", num_classes=64)
    tx = get_optimizer("sgd", 0.1)
    with pytest.raises(ValueError, match="does not support"):
        make_sharded_partial_fc_train_step(
            None, head_cfg, tx, 8, learning_rate=0.1, mesh=mesh)


@pytest.mark.slow
def test_fit_dispatches_sharded_partial_fc():
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(32, 8, image_size=24, seed=0)
    loader = ArrayLoader(images, labels, batch_size=16, seed=0)
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=4096,
        batch_size=16, epochs=2, partial_fc=0.05, use_pallas_head=False,
        mesh=cfg_lib.MeshConfig(data=4, model=2),
        data=cfg_lib.DataConfig(image_size=24))
    result = fit(cfg, loader, use_mesh=True)
    assert np.isfinite(result.min_train_loss)


@pytest.mark.slow
def test_sharded_pfc_checkpoint_resume(tmp_path):
    """Preemption recovery at scale: a model-sharded Partial-FC fit()
    checkpoints, and the resumed run re-shards the restored kernel and
    momentum over the mesh (loop.py device_puts restored state onto the
    train-state shardings) and keeps training from the saved step."""
    from face_recognition_models_tpu.checkpoint import CheckpointManager
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    C, BS = 256, 16
    images, labels = synthetic_identities(C, 2, image_size=32, seed=0,
                                          noise=10.0)
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)

    def cfg(epochs, resume=None):
        return cfg_lib.TrainConfig(
            backbone="resnet18", head="arcface", num_classes=C,
            batch_size=BS, epochs=epochs, seed=0, partial_fc=0.5,
            continue_train=resume, print_freq=1000,
            mesh=cfg_lib.MeshConfig(data=4, model=2),
            data=cfg_lib.DataConfig(image_size=32),
            optimizer=cfg_lib.OptimizerConfig(learning_rate=0.05))

    mgr = CheckpointManager(str(tmp_path / "ck"), "arcface")
    r1 = fit(cfg(1), loader, checkpoint_manager=mgr, use_mesh=True)
    k1 = np.asarray(r1.state.params["kernel_w"])

    r2 = fit(cfg(1, resume="latest"), loader, checkpoint_manager=mgr,
             use_mesh=True)
    # resumed from the saved step, not from scratch
    steps = loader.steps_per_epoch()
    assert int(jax.tree.leaves(r2.state.step)[0]) == 2 * steps
    # restored arrays live on the mesh with the class axis model-sharded
    kspec = r2.state.params["kernel_w"].sharding.spec
    assert kspec in (P(None, "model"), P("model",))  # [D,C] or [C,D] layout
    # training continued from the epoch-1 kernel: the resumed run's kernel
    # differs from it (it trained) but not by a re-initialization
    k2 = np.asarray(r2.state.params["kernel_w"])
    assert not np.allclose(k1, k2)
    assert np.linalg.norm(k2 - k1) < np.linalg.norm(k1)
