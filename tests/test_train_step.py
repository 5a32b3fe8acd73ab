"""Train-step integration: loss decreases, state updates, LR schedule parity,
and the pjit path on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import get_head
from face_recognition_models_tpu.models.resnet import BasicBlock, ResNet
from face_recognition_models_tpu.parallel import (
    batch_sharding,
    make_mesh,
    train_state_shardings,
)
from face_recognition_models_tpu.train import (
    TrainState,
    get_optimizer,
    get_schedule,
    make_train_step,
)

D, C, B = 32, 12, 24
IMG = 32


def _tiny_backbone():
    return ResNet(stage_sizes=(1, 1), block=BasicBlock, embed_dim=D,
                  num_filters=8, dtype=jnp.float32)


def _synthetic_batch(rng, b=B):
    """Identity-structured images: class k has a distinct mean image."""
    k1, k2 = jax.random.split(rng)
    labels = jax.random.randint(k1, (b,), 0, C)
    protos = jax.random.normal(k2, (C, IMG, IMG, 3))
    images = protos[labels] + 0.1 * jax.random.normal(k1, (b, IMG, IMG, 3))
    return images, labels


def _init(head_name="arcface", lr=0.1, **head_kw):
    head_cfg = cfg_lib.make_head_config(head_name, feature_dim=D,
                                        num_classes=C, **head_kw)
    head = get_head(head_name)
    backbone = _tiny_backbone()
    rng = jax.random.PRNGKey(0)
    variables = backbone.init(rng, jnp.zeros((1, IMG, IMG, 3)), train=False)
    kernel = head.init_kernel(rng, head_cfg)
    params = {"backbone": variables["params"], "kernel_w": kernel}
    tx = get_optimizer("sgd", lr, momentum=0.9, weight_decay=5e-4)
    state = TrainState(step=jnp.int32(0), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       head_state=head.init_state(head_cfg),
                       opt_state=tx.init(params), rng=jax.random.PRNGKey(1))
    return backbone, head, head_cfg, tx, state


@pytest.mark.parametrize("head_name", ["arcface", "cosface", "magface",
                                       "curricularface", "adaface",
                                       "elastic_arcface", "vpl_arcface",
                                       "qaface", "sphereface", "mv_softmax",
                                       "combined_margin",
                                       "subcenter_arcface"])
def test_loss_decreases(head_name):
    backbone, head, head_cfg, tx, state = _init(head_name, lr=0.05)
    lambda_g = 0.1 if head_name == "magface" else 0.0
    step = jax.jit(make_train_step(backbone, head, head_cfg, tx,
                                   lambda_g=lambda_g))
    images, labels = _synthetic_batch(jax.random.PRNGKey(2))
    losses = []
    for _ in range(15):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 15


def test_metrics_contract():
    backbone, head, head_cfg, tx, state = _init("arcface")
    sched = get_schedule(cfg_lib.ScheduleConfig(), 0.1, steps_per_epoch=10)
    step = jax.jit(make_train_step(backbone, head, head_cfg, tx,
                                   lr_schedule=sched))
    images, labels = _synthetic_batch(jax.random.PRNGKey(2))
    state, metrics = step(state, images, labels)
    for key in ["loss", "loss_id", "loss_mag", "acc1", "acc5", "lr",
                "feat_norm"]:
        assert key in metrics
        assert np.isfinite(float(metrics[key]))
    assert 0.0 <= float(metrics["acc1"]) <= 100.0
    assert float(metrics["acc5"]) >= float(metrics["acc1"])
    assert float(metrics["lr"]) == pytest.approx(0.1)


def test_customstep_schedule_parity():
    """lr(epoch e, 1-based) = lr0 * 0.1^|{s in {20,40,60}: s <= e-1}|."""
    spe = 7
    sched = get_schedule(cfg_lib.ScheduleConfig(), 0.1, steps_per_epoch=spe)
    def lr_at_epoch(e):  # 1-based epoch -> lr used during that epoch
        return float(sched((e - 1) * spe))
    assert lr_at_epoch(1) == pytest.approx(0.1)
    assert lr_at_epoch(20) == pytest.approx(0.1)
    assert lr_at_epoch(21) == pytest.approx(0.01)
    assert lr_at_epoch(40) == pytest.approx(0.01)
    assert lr_at_epoch(41) == pytest.approx(0.001)
    assert lr_at_epoch(61) == pytest.approx(1e-4)
    assert lr_at_epoch(100) == pytest.approx(1e-4)


def test_sgd_matches_torch_semantics():
    """optax chain == torch SGD(momentum, weight_decay) update order."""
    import torch

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    g = np.random.RandomState(1).randn(4, 3).astype(np.float32)

    p_t = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SGD([p_t], lr=0.1, momentum=0.9, weight_decay=5e-4)
    for _ in range(3):
        opt.zero_grad()
        p_t.grad = torch.tensor(g.copy())
        opt.step()

    tx = get_optimizer("sgd", 0.1, momentum=0.9, weight_decay=5e-4)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(np.asarray(params["w"]),
                               p_t.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_fused_sgd_matches_chained_optax():
    """fused_sgd (single-pass) == chain(add_decayed_weights, trace,
    scale_by_lr) over multiple steps, for float lr, schedule, and
    nesterov."""
    import optax

    from face_recognition_models_tpu.train.optim import fused_sgd

    tree0 = {"a": np.random.RandomState(0).randn(8, 4).astype(np.float32),
             "b": np.random.RandomState(1).randn(5).astype(np.float32)}
    gs = [jax.tree.map(
        lambda x: jnp.asarray(
            np.random.RandomState(10 + i).randn(*x.shape).astype(np.float32)),
        tree0) for i in range(4)]
    sched = lambda c: 0.1 * (0.5 ** jnp.asarray(c, jnp.float32))

    for lr, nesterov, wd in [(0.1, False, 5e-4), (0.1, True, 5e-4),
                             (sched, False, 5e-4), (0.1, False, 0.0)]:
        chain = optax.chain(
            *([optax.add_decayed_weights(wd)] if wd else []),
            optax.trace(decay=0.9, nesterov=nesterov),
            optax.scale_by_learning_rate(lr))
        fused = fused_sgd(lr, momentum=0.9, weight_decay=wd,
                          nesterov=nesterov)
        p_c = jax.tree.map(jnp.asarray, tree0)
        p_f = jax.tree.map(jnp.asarray, tree0)
        s_c, s_f = chain.init(p_c), fused.init(p_f)
        for g in gs:
            u_c, s_c = chain.update(g, s_c, p_c)
            p_c = optax.apply_updates(p_c, u_c)
            u_f, s_f = fused.update(g, s_f, p_f)
            p_f = optax.apply_updates(p_f, u_f)
        for x, y in zip(jax.tree.leaves(p_c), jax.tree.leaves(p_f)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_train_step_on_8_device_mesh():
    """pjit DP over 'data' + class-sharded kernel over 'model'."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(cfg_lib.MeshConfig(data=4, model=2))
    backbone, head, head_cfg, tx, state = _init("vpl_arcface")

    state_shardings = train_state_shardings(mesh, state, num_classes=C)
    # kernel sharded over classes; memory sharded over classes
    kspec = state_shardings.params["kernel_w"].spec
    assert kspec == jax.sharding.PartitionSpec(None, "model")
    mspec = state_shardings.head_state.mem.spec
    assert mspec == jax.sharding.PartitionSpec("model", None)

    data_s = batch_sharding(mesh)
    state = jax.device_put(state, state_shardings)
    step = jax.jit(make_train_step(backbone, head, head_cfg, tx),
                   in_shardings=(state_shardings, data_s, data_s),
                   out_shardings=(state_shardings, None),
                   donate_argnums=(0,))

    images, labels = _synthetic_batch(jax.random.PRNGKey(2))
    images = jax.device_put(images, data_s)
    labels = jax.device_put(labels, data_s)
    prev = None
    for _ in range(3):
        state, metrics = step(state, images, labels)
        assert np.isfinite(float(metrics["loss"]))
        if prev is not None:
            assert float(metrics["loss"]) != prev
        prev = float(metrics["loss"])
    # sharded run must agree with single-device run numerically
    backbone2, head2, head_cfg2, tx2, state2 = _init("vpl_arcface")
    step2 = jax.jit(make_train_step(backbone2, head2, head_cfg2, tx2))
    for _ in range(3):
        state2, metrics2 = step2(state2, images, labels)
    np.testing.assert_allclose(prev, float(metrics2["loss"]), rtol=1e-4)


def test_global_batch_ema_under_dp():
    """AdaFace EMA must use the GLOBAL batch mean under DP sharding."""
    mesh = make_mesh(cfg_lib.MeshConfig(data=8, model=1))
    backbone, head, head_cfg, tx, state = _init("adaface")
    state_shardings = train_state_shardings(mesh, state, num_classes=C)
    data_s = batch_sharding(mesh)
    state = jax.device_put(state, state_shardings)
    step = jax.jit(make_train_step(backbone, head, head_cfg, tx),
                   in_shardings=(state_shardings, data_s, data_s),
                   out_shardings=(state_shardings, None))
    images, labels = _synthetic_batch(jax.random.PRNGKey(2))
    state_out, _ = step(state, jax.device_put(images, data_s),
                        jax.device_put(labels, data_s))

    backbone2, head2, head_cfg2, tx2, state2 = _init("adaface")
    step2 = jax.jit(make_train_step(backbone2, head2, head_cfg2, tx2))
    state2_out, _ = step2(state2, images, labels)
    np.testing.assert_allclose(
        float(state_out.head_state.batch_mean[0]),
        float(state2_out.head_state.batch_mean[0]), rtol=1e-5)


@pytest.mark.slow
def test_dropout_backbone_train_step():
    """Backbones with dropout/stochastic-depth need rngs plumbed through
    the train step (loop sets has_dropout for effnet/mbv2)."""
    from face_recognition_models_tpu.models import get_backbone

    head_cfg = cfg_lib.make_head_config("cosface", feature_dim=D,
                                        num_classes=C)
    head = get_head("cosface")
    backbone = get_backbone("mobilenet_v2", embed_dim=D, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = backbone.init({"params": rng, "dropout": rng},
                              jnp.zeros((1, IMG, IMG, 3)), train=False)
    params = {"backbone": variables["params"],
              "kernel_w": head.init_kernel(rng, head_cfg)}
    tx = get_optimizer("sgd", 0.01, momentum=0.9, weight_decay=5e-4)
    state = TrainState(step=jnp.int32(0), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       head_state=None, opt_state=tx.init(params),
                       rng=jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(backbone, head, head_cfg, tx,
                                   has_dropout=True))
    images, labels = _synthetic_batch(jax.random.PRNGKey(2), b=8)
    state, m1 = step(state, images, labels)
    state, m2 = step(state, images, labels)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_bf16_bn_matches_fp32_bn():
    """cfg.bn_dtype='bfloat16' lowers only the BN normalize/affine compute
    dtype: batch statistics and params stay fp32 (flax reduces stats in
    fp32 regardless), so the loss must track the fp32-BN step to bf16
    rounding. Guards the -12 ms/step TPU knob (PERF.md decomposition)."""
    from face_recognition_models_tpu.train.state import create_train_state

    losses = {}
    for bn_dtype in ("float32", "bfloat16"):
        cfg = cfg_lib.TrainConfig(
            backbone="resnet18", head="arcface", num_classes=C,
            batch_size=8, bn_dtype=bn_dtype, compute_dtype="float32",
            data=cfg_lib.DataConfig(image_size=IMG))
        head_cfg = cfg_lib.make_head_config("arcface", num_classes=C)
        tx = get_optimizer("sgd", 0.1, momentum=0.9, weight_decay=5e-4)
        backbone, head, state = create_train_state(cfg, head_cfg, tx)
        assert backbone.bn_dtype == jnp.dtype(bn_dtype)
        step = jax.jit(make_train_step(backbone, head, head_cfg, tx,
                                       use_fused_head=False))
        images = jax.random.randint(jax.random.PRNGKey(3), (8, IMG, IMG, 3),
                                    0, 256, jnp.uint8)
        labels = jnp.zeros((8,), jnp.int32)
        state, m = step(state, images, labels)
        # running stats must remain fp32 whatever the compute dtype
        for leaf in jax.tree.leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32
        losses[bn_dtype] = float(m["loss"])
    assert np.isfinite(losses["bfloat16"])
    assert abs(losses["bfloat16"] - losses["float32"]) < (
        0.02 * abs(losses["float32"]))


def test_clip_grad_norm_matches_torch_placement():
    """clip_grad_norm clips the RAW gradient's global norm BEFORE wd and
    momentum (torch clip_grad_norm_ placement), composing with the fused
    torch-SGD rule."""
    import numpy as np
    import optax
    import torch

    from face_recognition_models_tpu.train.optim import get_optimizer

    rs = np.random.RandomState(0)
    w0 = rs.randn(4, 3).astype(np.float32)
    gs = [rs.randn(4, 3).astype(np.float32) * 5 for _ in range(3)]
    lr, mom, wd, clip = 0.1, 0.9, 5e-4, 1.0

    # torch oracle
    p = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([p], lr=lr, momentum=mom, weight_decay=wd)
    for g in gs:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([p], clip)
        opt.step()

    tx = get_optimizer("sgd", lr, momentum=mom, weight_decay=wd,
                       clip_grad_norm=clip)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in gs:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               p.detach().numpy(), atol=1e-6)

    # a sub-threshold gradient is untouched (clip is a no-op)
    tiny = {"w": jnp.full((4, 3), 1e-3)}
    tx2 = get_optimizer("sgd", lr, momentum=mom, weight_decay=0.0,
                        clip_grad_norm=clip)
    u1, _ = tx2.update(tiny, tx2.init(tiny), tiny)
    tx3 = get_optimizer("sgd", lr, momentum=mom, weight_decay=0.0)
    u2, _ = tx3.update(tiny, tx3.init(tiny), tiny)
    np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(u2["w"]),
                               atol=1e-7)


def test_clip_grad_norm_rejected_with_partial_fc():
    import pytest

    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(64, 4, image_size=32, seed=0)
    loader = ArrayLoader(images, labels, batch_size=32)
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=64,
        batch_size=32, epochs=1, partial_fc=0.5,
        data=cfg_lib.DataConfig(image_size=32),
        optimizer=cfg_lib.OptimizerConfig(clip_grad_norm=1.0))
    with pytest.raises(ValueError, match="clip_grad_norm"):
        fit(cfg, loader)


# --- freeze_backbone (linear probe) ------------------------------------------

def _freeze_fit(tmp_path, freeze, head_path="jnp", steps=6):
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(16, 8, image_size=32, seed=0)
    loader = ArrayLoader(images, labels, batch_size=64, seed=0)
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=16,
        batch_size=64, epochs=3, freeze_backbone=freeze,
        use_pallas_head=(head_path == "fused"),
        data=cfg_lib.DataConfig(image_size=32),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.1))
    return fit(cfg, loader)


def test_freeze_backbone_trains_head_only(tmp_path):
    """Frozen trunk: backbone params AND batch stats bit-identical after
    training, head kernel moves, loss falls (the head is learnable over
    fixed random features at tiny C)."""
    import jax

    result = _freeze_fit(tmp_path, freeze=True)
    state = result.state
    # recreate the deterministic init to compare against
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import create_train_state
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=16,
        batch_size=64, epochs=3, freeze_backbone=True,
        data=cfg_lib.DataConfig(image_size=32),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.1))
    head_cfg = cfg_lib.make_head_config(cfg.head,
                                        num_classes=cfg.num_classes)
    _, _, init_state = create_train_state(
        cfg, head_cfg, get_optimizer("sgd", 0.1))

    same = jax.tree.map(lambda a, b: bool((a == b).all()),
                        state.params["backbone"],
                        init_state.params["backbone"])
    assert all(jax.tree.leaves(same)), "frozen backbone params moved"
    same_bs = jax.tree.map(lambda a, b: bool((a == b).all()),
                           state.batch_stats, init_state.batch_stats)
    assert all(jax.tree.leaves(same_bs)), "frozen batch stats moved"
    assert not bool(
        (state.params["kernel_w"] == init_state.params["kernel_w"]).all())
    assert result.min_train_loss < 60.0  # fell from the ~64-ish start

    # The optimizer's backbone slots must be pinned too: torch-SGD folds
    # wd into the grad BEFORE momentum, so without _frozen_opt_state the
    # trace would drift toward wd*p/(1-m) even at zero grad (stale-kick
    # garbage in checkpoints).
    def backbone_slots(node, found):
        if isinstance(node, dict):
            if "backbone" in node:
                found.append(node["backbone"])
            else:
                for v in node.values():
                    backbone_slots(v, found)
        elif isinstance(node, (list, tuple)):
            for v in node:
                backbone_slots(v, found)
        return found

    slots = backbone_slots(jax.device_get(state.opt_state), [])
    assert slots, "no backbone-shaped optimizer slots found"
    for sub in slots:
        for leaf in jax.tree.leaves(sub):
            assert np.all(np.asarray(leaf) == 0.0), \
                "frozen backbone momentum drifted"


def test_freeze_backbone_guards(tmp_path):
    import pytest

    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(64, 4, image_size=32, seed=0)
    loader = ArrayLoader(images, labels, batch_size=32)
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=64,
        batch_size=32, epochs=1, partial_fc=0.5, freeze_backbone=True,
        data=cfg_lib.DataConfig(image_size=32))
    with pytest.raises(ValueError, match="freeze_backbone"):
        fit(cfg, loader)
