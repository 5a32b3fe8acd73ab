"""In-training periodic verification eval (evaluation/periodic.py).

The reference's README claims training "concludes with an evaluation"
(README.md:112) but main_pipeline never runs one (SURVEY §2.5); this is
the realized capability: a fit() epoch hook that evaluates benchmark
verification every N epochs and tracks a best-by-verification artifact.
"""

import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.checkpoint import (
    CheckpointManager,
    restore_backbone,
)
from face_recognition_models_tpu.data.pipeline import ArrayLoader
from face_recognition_models_tpu.data.synthetic import (
    synthetic_identities,
    write_pair_benchmark,
)
from face_recognition_models_tpu.evaluation import PeriodicEvalHook
from face_recognition_models_tpu.train.loop import fit

C, PER, IMG, BS = 8, 8, 32, 16


def _cfg(head="cosface", epochs=3, **kw):
    return cfg_lib.TrainConfig(
        backbone="resnet18", head=head, num_classes=C, batch_size=BS,
        epochs=epochs, seed=0,
        data=cfg_lib.DataConfig(image_size=IMG),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.02),
        **kw)


@pytest.fixture(scope="module")
def bench_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("evaldata")
    write_pair_benchmark(str(root / "lfw"), num_classes=4,
                         pairs_per_kind=12, image_size=IMG)
    return str(root)


@pytest.fixture(scope="module")
def dataset():
    return synthetic_identities(C, PER, image_size=IMG, seed=0, noise=10.0)


class _Recorder:
    def __init__(self):
        self.rows = []

    def log(self, metrics, step=None):
        self.rows.append(dict(metrics))


@pytest.mark.slow
def test_hook_evaluates_and_tracks_best(tmp_path, bench_root, dataset):
    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    cfg = _cfg(epochs=3)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), "cosface")
    logger = _Recorder()

    from face_recognition_models_tpu.models import get_backbone
    hook = PeriodicEvalHook(
        get_backbone("resnet18"), bench_root, ["lfw", "missing_bench"],
        every=2, image_size=IMG, batch_size=16, total_epochs=cfg.epochs,
        logger=logger, checkpoint_manager=mgr, model_name="cosface",
        verbose=False)
    assert list(hook._data) == ["lfw"]  # missing benchmark warn-skipped

    fit(cfg, loader, checkpoint_manager=mgr, use_mesh=False, hooks=hook)

    # every=2 over 3 epochs -> epochs 2 and 3 (final epoch always runs)
    assert [e for e, _ in hook.history] == [2, 3]
    for _, results in hook.history:
        res = results["lfw"]
        assert 0.0 <= res.mean_accuracy <= 100.0
        assert np.isfinite(res.mean_auc)
    assert hook.best_epoch in (2, 3)
    assert hook.best_acc == max(
        float(np.mean([r.mean_accuracy for r in results.values()]))
        for _, results in hook.history)

    # val metrics reached the experiment logger
    val_rows = [r for r in logger.rows if "val/lfw_acc" in r]
    assert len(val_rows) == 2
    assert all("val/lfw_auc" in r for r in val_rows)

    # best-by-verification artifact restores through the standard selector
    import jax
    import jax.numpy as jnp
    module = get_backbone("resnet18")
    dummy = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(0)},
                            dummy, train=False)
    restored = restore_backbone(
        str(tmp_path / "ckpt"),
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        "best_acc", model_name="cosface")
    emb = module.apply({"params": restored["params"],
                        "batch_stats": restored["batch_stats"]},
                       jnp.asarray(images[:4], jnp.float32) / 255.0,
                       train=False)
    assert np.all(np.isfinite(np.asarray(emb, np.float32)))


@pytest.mark.slow
def test_hook_on_mesh_sharded_state(bench_root, dataset):
    """The hook evaluates a mesh-sharded train state (DP x class-TP fit):
    its plain jitted eval step must accept NamedSharding'd params."""
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.parallel import make_mesh

    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    cfg = _cfg(epochs=2, mesh=cfg_lib.MeshConfig(data=4, model=2))
    mesh = make_mesh(cfg.mesh)
    hook = PeriodicEvalHook(get_backbone("resnet18"), bench_root, ["lfw"],
                            every=1, image_size=IMG, batch_size=16,
                            total_epochs=cfg.epochs, verbose=False)
    fit(cfg, loader, use_mesh=True, mesh=mesh, hooks=hook)
    assert [e for e, _ in hook.history] == [1, 2]
    assert all(np.isfinite(r["lfw"].mean_accuracy)
               for _, r in hook.history)


def test_hook_respects_every_and_final(bench_root):
    """Cadence math only — no training. A stub state via init params."""
    import jax
    import jax.numpy as jnp

    from face_recognition_models_tpu.models import get_backbone

    module = get_backbone("resnet18")
    dummy = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(0)},
                            dummy, train=False)

    class Stub:
        params = {"backbone": variables["params"]}
        batch_stats = variables.get("batch_stats", {})
        ema_params = None

    hook = PeriodicEvalHook(module, bench_root, ["lfw"], every=3,
                            image_size=IMG, batch_size=16, total_epochs=7,
                            verbose=False)
    for epoch in range(1, 8):
        hook(epoch=epoch, state=Stub(), train_loss=0.0)
    assert [e for e, _ in hook.history] == [3, 6, 7]

    # use_ema without ema_params is a loud error
    hook_ema = PeriodicEvalHook(module, bench_root, ["lfw"], every=1,
                                image_size=IMG, total_epochs=1,
                                use_ema=True, verbose=False)
    with pytest.raises(ValueError, match="ema_params"):
        hook_ema(epoch=1, state=Stub(), train_loss=0.0)


def test_hook_all_benchmarks_missing(bench_root):
    from face_recognition_models_tpu.models import get_backbone
    with pytest.raises(FileNotFoundError):
        PeriodicEvalHook(get_backbone("resnet18"), bench_root,
                         ["nope_a", "nope_b"], image_size=IMG)
    with pytest.raises(ValueError, match="every"):
        PeriodicEvalHook(get_backbone("resnet18"), bench_root, ["lfw"],
                         every=0, image_size=IMG)
