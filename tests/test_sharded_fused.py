"""Class-sharded fused head: shard_map path must match the single-shard
kernel and the jnp path in loss and gradients (8-device CPU mesh,
interpret-mode kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.heads import get_head
from face_recognition_models_tpu.heads.fused_adapter import fused_apply
from face_recognition_models_tpu.parallel import make_mesh
from face_recognition_models_tpu.train.losses import mean_cross_entropy

N, D, C = 16, 32, 96  # C divisible by model axis sizes 2 and 4


def _setup(name, seed=0):
    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C)
    head = get_head(name)
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    kernel = head.init_kernel(k1, cfg)
    state = head.init_state(cfg)
    feats = 10.0 * jax.random.normal(k2, (N, D), jnp.float32)
    labels = jax.random.randint(k2, (N,), 0, C)
    return cfg, head, kernel, state, feats, labels, k3


@pytest.mark.parametrize("name", ["arcface", "cosface", "curricularface",
                                  "mv_softmax", "magface", "adaface"])
@pytest.mark.parametrize("model_axis", [2, 4])
@pytest.mark.slow
def test_sharded_matches_unsharded(name, model_axis):
    mesh = make_mesh(cfg_lib.MeshConfig(data=8 // model_axis,
                                        model=model_axis))
    cfg, head, kernel, state, feats, labels, rng = _setup(name)

    def loss_sharded(kernel, feats):
        out = fused_apply(cfg, kernel, feats, labels, state, rng=rng,
                          block_n=8, block_c=16, interpret=True, mesh=mesh)
        return out.loss_id

    def loss_jnp(kernel, feats):
        out = head.apply(cfg, kernel, feats, labels, state, rng=rng)
        return mean_cross_entropy(out.logits, labels)

    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else _nullcontext():
        ls, (gks, gfs) = jax.value_and_grad(
            loss_sharded, argnums=(0, 1))(kernel, feats)
    lj, (gkj, gfj) = jax.value_and_grad(loss_jnp, argnums=(0, 1))(kernel,
                                                                  feats)
    np.testing.assert_allclose(float(ls), float(lj), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gks), np.asarray(gkj),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gfs), np.asarray(gfj),
                               rtol=5e-4, atol=1e-6)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def test_sharded_metrics_match():
    mesh = make_mesh(cfg_lib.MeshConfig(data=4, model=2))
    cfg, head, kernel, state, feats, labels, rng = _setup("arcface")
    out_s = fused_apply(cfg, kernel, feats, labels, state, rng=rng,
                        block_n=8, block_c=16, interpret=True, mesh=mesh)
    out_u = fused_apply(cfg, kernel, feats, labels, state, rng=rng,
                        block_n=8, block_c=16, interpret=True)
    assert float(out_s.acc1) == float(out_u.acc1)
    assert float(out_s.acc5) == float(out_u.acc5)


def test_indivisible_classes_raise():
    from face_recognition_models_tpu.parallel.sharded_fused import (
        sharded_fused_margin_ce)

    mesh = make_mesh(cfg_lib.MeshConfig(data=4, model=2))
    xn = jnp.zeros((8, 16))
    wn = jnp.zeros((16, 95))  # 95 % 2 != 0
    with pytest.raises(ValueError, match="divide"):
        sharded_fused_margin_ce(mesh, xn, wn, jnp.zeros((8,), jnp.int32),
                                jnp.zeros(8), jnp.zeros(8), jnp.ones(8),
                                jnp.zeros((8, 2)), 0)


@pytest.mark.slow
def test_fused_sharded_train_step():
    """Full train step with the fused head on a DP x class-TP mesh."""
    from face_recognition_models_tpu.models.resnet import BasicBlock, ResNet
    from face_recognition_models_tpu.parallel import (
        batch_sharding,
        train_state_shardings,
    )
    from face_recognition_models_tpu.train import (
        TrainState,
        get_optimizer,
        make_train_step,
    )
    import face_recognition_models_tpu.heads.fused_adapter as fa

    mesh = make_mesh(cfg_lib.MeshConfig(data=4, model=2))
    cfg = cfg_lib.make_head_config("arcface", feature_dim=32, num_classes=C)
    head = get_head("arcface")
    backbone = ResNet(stage_sizes=(1, 1), block=BasicBlock, embed_dim=32,
                      num_filters=8, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = backbone.init(rng, jnp.zeros((1, 16, 16, 3)), train=False)
    params = {"backbone": variables["params"],
              "kernel_w": head.init_kernel(rng, cfg)}
    tx = get_optimizer("sgd", 0.05, momentum=0.9, weight_decay=5e-4)
    state = TrainState(step=jnp.int32(0), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       head_state=None, opt_state=tx.init(params),
                       rng=jax.random.PRNGKey(1))

    orig = fa.fused_apply
    def fused_interp(*args, **kw):
        kw.setdefault("interpret", True)
        kw.setdefault("block_n", 8)
        kw.setdefault("block_c", 16)
        return orig(*args, **kw)
    fa.fused_apply = fused_interp
    try:
        step_fn = make_train_step(backbone, head, cfg, tx,
                                  use_fused_head=True, mesh=mesh)
        shardings = train_state_shardings(mesh, state, C)
        data_s = batch_sharding(mesh)
        state = jax.device_put(state, shardings)
        step = jax.jit(lambda s, im, lb: step_fn(s, im, lb),
                       in_shardings=(shardings, data_s, data_s),
                       out_shardings=(shardings, None))
        images = jax.device_put(
            jax.random.randint(rng, (16, 16, 16, 3), 0, 256, jnp.uint8),
            data_s)
        labels = jax.device_put(jax.random.randint(rng, (16,), 0, C), data_s)
        losses = []
        for _ in range(4):
            state, metrics = step(state, images, labels)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
    finally:
        fa.fused_apply = orig


@pytest.mark.slow
@pytest.mark.parametrize("name", ["vpl_arcface", "qaface"])
def test_sharded_mem_head_matches_jnp(name):
    """Class-sharded memory-blended heads: memn/lam shard over the class
    axis with wn; loss, grads, and state must match the jnp path."""
    mesh = make_mesh(cfg_lib.MeshConfig(data=4, model=2))
    cfg = cfg_lib.make_head_config(name, feature_dim=D, num_classes=C,
                                   delta=2)
    head = get_head(name)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    kernel = head.init_kernel(k1, cfg)
    feats = 10.0 * jax.random.normal(k2, (N, D), jnp.float32)
    labels = jax.random.randint(k2, (N,), 0, C)
    minput = (feats + 2.0 * jax.random.normal(k3, (N, D), jnp.float32)
              if name == "qaface" else None)
    # one warm-up step so memories are active
    state = head.apply(cfg, kernel, feats, labels, head.init_state(cfg),
                       minput=minput).state

    def loss_sharded(kernel, feats):
        out = fused_apply(cfg, kernel, feats, labels, state, minput=minput,
                          block_n=8, block_c=16, interpret=True, mesh=mesh)
        return out.loss_id

    def loss_jnp(kernel, feats):
        out = head.apply(cfg, kernel, feats, labels, state, minput=minput)
        return mean_cross_entropy(out.logits, labels)

    ls, (gks, gfs) = jax.value_and_grad(loss_sharded, argnums=(0, 1))(
        kernel, feats)
    lj, (gkj, gfj) = jax.value_and_grad(loss_jnp, argnums=(0, 1))(kernel,
                                                                  feats)
    np.testing.assert_allclose(float(ls), float(lj), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gks), np.asarray(gkj),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gfs), np.asarray(gfj),
                               rtol=5e-4, atol=1e-6)
    # state updates must match too (fused path computes them in jnp)
    out_s = fused_apply(cfg, kernel, feats, labels, state, minput=minput,
                        block_n=8, block_c=16, interpret=True, mesh=mesh)
    out_j = head.apply(cfg, kernel, feats, labels, state, minput=minput)
    for a, b in zip(jax.tree.leaves(out_s.state),
                    jax.tree.leaves(out_j.state)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-6)
