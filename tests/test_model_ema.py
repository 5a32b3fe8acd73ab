"""Model-EMA (cfg.model_ema): closed-form correctness, limit behaviors,
sharding spec, and checkpoint/resume round-trip.

Beyond-reference production feature (the reference has no weight
averaging): ema <- d*ema + (1-d)*params after every optimizer step, kept
in TrainState.ema_params (train/state.py) so checkpoints and mesh
shardings cover it with no extra plumbing (train/loop.py wraps the step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.checkpoint import CheckpointManager
from face_recognition_models_tpu.data.pipeline import ArrayLoader
from face_recognition_models_tpu.data.synthetic import synthetic_identities
from face_recognition_models_tpu.train.loop import fit

C, PER, IMG = 4, 4, 16
BS = C * PER  # full-batch: exactly ONE step per epoch (per-step capture)


def _cfg(epochs, **kw):
    return cfg_lib.TrainConfig(
        backbone="resnet18", head="cosface", num_classes=C, batch_size=BS,
        epochs=epochs, seed=0,
        data=cfg_lib.DataConfig(image_size=IMG),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.01),
        **kw)


@pytest.fixture(scope="module")
def dataset():
    return synthetic_identities(C, PER, image_size=IMG, seed=0, noise=10.0)


def _loader(dataset):
    images, labels = dataset
    return ArrayLoader(images, labels, batch_size=BS, seed=0)


@pytest.mark.slow
def test_ema_matches_closed_form(dataset):
    """One step per epoch -> the per-epoch hook sees every per-step params;
    the EMA run (identical seed => identical training trajectory, EMA does
    not feed back into training) must equal the numpy recurrence."""
    decay = 0.9
    epochs = 5

    captured = []

    def hook(epoch, state, train_loss):
        captured.append(jax.device_get(state.params))

    plain = fit(_cfg(epochs), _loader(dataset), use_mesh=False, hooks=hook)
    assert plain.state.ema_params is None  # off by default

    ema_run = fit(_cfg(epochs, model_ema=decay), _loader(dataset),
                  use_mesh=False)

    # the recurrence is seeded at the INITIAL weights: rebuild them with
    # the same cfg/seed, then fold the captured per-step params in numpy
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import create_train_state
    cfg0 = _cfg(epochs, model_ema=decay)
    head_cfg = cfg_lib.make_head_config(cfg0.head, num_classes=C)
    tx = get_optimizer("sgd", 0.01)
    _, _, state0 = create_train_state(cfg0, head_cfg, tx)
    expect = jax.device_get(state0.params)
    for p in captured:
        expect = jax.tree.map(lambda e, q: e * decay + q * (1 - decay),
                              expect, p)
    got = jax.device_get(ema_run.state.ema_params)
    jax.tree.map(lambda g, e: np.testing.assert_allclose(
        g, e, rtol=2e-5, atol=1e-6), got, expect)


@pytest.mark.slow
def test_ema_decay_limits(dataset):
    """d -> 0: the average IS the latest params; d = 1: it never leaves
    the init."""
    r_fast = fit(_cfg(2, model_ema=1e-12), _loader(dataset), use_mesh=False)
    for e, p in zip(jax.tree.leaves(r_fast.state.ema_params),
                    jax.tree.leaves(r_fast.state.params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), rtol=1e-6)

    r_frozen = fit(_cfg(2, model_ema=1.0), _loader(dataset), use_mesh=False)
    # params moved away from init, but the d=1 average did not move with
    # them: the two must differ materially
    diffs = [float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
             for e, p in zip(jax.tree.leaves(r_frozen.state.ema_params),
                             jax.tree.leaves(r_frozen.state.params))]
    assert max(diffs) > 1e-4


def test_ema_sharding_spec():
    """EMA leaves shard exactly like their live counterparts (the
    path-based rules in parallel/sharding.py match ema_params subpaths)."""
    from face_recognition_models_tpu.parallel import make_mesh
    from face_recognition_models_tpu.parallel.sharding import (
        train_state_shardings)
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(cfg_lib.MeshConfig(data=4, model=2))
    num_classes = 16
    fake = {"params": {"kernel_w": jnp.zeros((8, num_classes))},
            "ema_params": {"kernel_w": jnp.zeros((8, num_classes))}}
    sh = train_state_shardings(mesh, fake, num_classes)
    assert sh["ema_params"]["kernel_w"].spec == P(None, "model")
    assert sh["params"]["kernel_w"].spec == P(None, "model")


@pytest.mark.slow
def test_ema_checkpoint_resume(tmp_path, dataset):
    """ema_params rides the state pytree through save -> resume and keeps
    updating after the resume."""
    loader = _loader(dataset)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), "m")
    r1 = fit(_cfg(2, model_ema=0.5), loader, checkpoint_manager=mgr,
             use_mesh=False)
    ema_after_2 = jax.device_get(r1.state.ema_params)

    r2 = fit(_cfg(1, model_ema=0.5, continue_train="latest"), loader,
             checkpoint_manager=mgr, use_mesh=False)
    ema_after_3 = jax.device_get(r2.state.ema_params)
    # restored (not re-seeded): epoch-3 EMA must differ from the epoch-2
    # save AND from a fresh-init average of the same step count
    d2 = [float(np.max(np.abs(a - b))) for a, b in
          zip(jax.tree.leaves(ema_after_2), jax.tree.leaves(ema_after_3))]
    assert max(d2) > 0.0
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(ema_after_3))
    assert int(jax.tree.leaves(r2.state.step)[0]) == 3


def test_batch_eval_loads_final_ema_artifact(tmp_path, capsys):
    """`face eval --which final_ema` restores the <model>_final_ema
    artifact saved by `face train --model-ema` (benchmark data absent ->
    benches skip, but the checkpoint restore itself must succeed)."""
    import jax
    from face_recognition_models_tpu.evaluation.batch_eval import (
        run_batch_evaluation)
    from face_recognition_models_tpu.models import get_backbone

    name = "arcface"
    model = get_backbone("resnet18", dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                   train=False)
    mgr = CheckpointManager(str(tmp_path / "ckpt" / name), name)
    payload = {"params": v["params"],
               "batch_stats": v.get("batch_stats", {})}
    mgr.save_final(payload, filename=f"{name}_final_ema")

    rc = run_batch_evaluation(
        checkpoint_dir=str(tmp_path / "ckpt"), head=name,
        backbone="resnet18", eval_data_path=str(tmp_path / "no_data"),
        benchmarks=["lfw"], batch_size=8, num_classes=4,
        output_dir=str(tmp_path / "out"), image_size=16, which="final_ema")
    out = capsys.readouterr().out
    assert rc == 0
    assert "could not load checkpoint" not in out  # the ema restore worked


@pytest.mark.slow
def test_ema_grad_accum_updates_per_optimizer_step(dataset):
    """Under grad_accum=k the EMA must lerp once per OPTIMIZER step, not
    per micro-batch (config.py documents per-optimizer-step semantics;
    lerping every micro-step compounds the decay k-fold). One micro-step
    per epoch -> the hook captures every per-micro-step params; the
    closed form folds only the epochs where MultiSteps applied."""
    decay, k, epochs = 0.9, 2, 6
    captured = []

    def hook(epoch, state, train_loss):
        captured.append(jax.device_get(state.params))

    run = fit(_cfg(epochs, model_ema=decay, grad_accum=k),
              _loader(dataset), use_mesh=False, hooks=hook)

    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import create_train_state
    cfg0 = _cfg(epochs, model_ema=decay, grad_accum=k)
    head_cfg = cfg_lib.make_head_config(cfg0.head, num_classes=C)
    _, _, state0 = create_train_state(cfg0, head_cfg,
                                      get_optimizer("sgd", 0.01))
    expect = jax.device_get(state0.params)
    for i, p in enumerate(captured, start=1):
        if i % k != 0:
            # params must be frozen between MultiSteps boundaries
            jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                         p, expect if i == 1 else captured[i - 2])
            continue
        expect = jax.tree.map(lambda e, q: e * decay + q * (1 - decay),
                              expect, p)
    got = jax.device_get(run.state.ema_params)
    jax.tree.map(lambda g, e: np.testing.assert_allclose(
        g, e, rtol=2e-5, atol=1e-6), got, expect)


@pytest.mark.slow
def test_ema_and_grad_accum_on_mesh():
    """Both beyond-reference features through the sharded fit path: EMA
    subtree + MultiSteps acc_grads shard via the same path-based rules
    (parallel/sharding.py) with zero special-casing — one epoch on the
    8-virtual-device (4 data x 2 model) mesh must run and stay finite."""
    from face_recognition_models_tpu.parallel import make_mesh

    images, labels = synthetic_identities(C, PER, image_size=IMG, seed=0,
                                          noise=10.0)
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    cfg = _cfg(1, model_ema=0.9, grad_accum=2,
               mesh=cfg_lib.MeshConfig(data=4, model=2))
    mesh = make_mesh(cfg.mesh)
    r = fit(cfg, loader, use_mesh=True, mesh=mesh)
    assert np.isfinite(r.min_train_loss)
    leaves = jax.tree.leaves(r.state.ema_params)
    assert leaves and all(np.all(np.isfinite(np.asarray(x)))
                          for x in leaves)


@pytest.mark.slow
def test_ema_with_partial_fc(tmp_path):
    """EMA wraps the Partial-FC step too (the manual sampled-column kernel
    update still lands in state.params, which is all the EMA reads)."""
    c, per, bs = 32, 8, 16
    images, labels = synthetic_identities(c, per, image_size=IMG, seed=0,
                                          noise=10.0)
    loader = ArrayLoader(images, labels, batch_size=bs, seed=0)
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=c, batch_size=bs,
        epochs=1, seed=0, model_ema=0.5, partial_fc=0.9,
        data=cfg_lib.DataConfig(image_size=IMG),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.01))
    r = fit(cfg, loader, use_mesh=False)
    # kernel EMA must have moved off the init copy (columns updated)
    dk = np.asarray(r.state.ema_params["kernel_w"]) - \
        np.asarray(r.state.params["kernel_w"])
    assert np.isfinite(dk).all()
    assert np.abs(dk).max() > 0
