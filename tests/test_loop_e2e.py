"""End-to-end: fit() on synthetic identities -> loss decreases, checkpoints
rotate, resume continues, eval protocol runs on the trained model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.checkpoint import CheckpointManager
from face_recognition_models_tpu.data.pipeline import ArrayLoader
from face_recognition_models_tpu.data.synthetic import synthetic_identities
from face_recognition_models_tpu.evaluation import (
    kfold_verification,
    pair_cosine_similarities,
)
from face_recognition_models_tpu.train.loop import fit
from face_recognition_models_tpu.train.step import make_eval_step

C, PER, IMG, BS = 8, 8, 32, 16


def _cfg(tmp, head="cosface", epochs=2, **kw):
    return cfg_lib.TrainConfig(
        backbone="resnet18", head=head, num_classes=C, batch_size=BS,
        epochs=epochs, seed=0,
        data=cfg_lib.DataConfig(image_size=IMG),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.02),
        **kw)


@pytest.fixture(scope="module")
def dataset():
    return synthetic_identities(C, PER, image_size=IMG, seed=0, noise=10.0)


@pytest.mark.slow
def test_fit_e2e_with_checkpoints(tmp_path, dataset):
    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    cfg = _cfg(tmp_path, epochs=2)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), "cosface")
    result = fit(cfg, loader, checkpoint_manager=mgr, use_mesh=False)

    assert np.isfinite(result.min_train_loss)
    assert result.images_per_sec > 0
    names = os.listdir(tmp_path / "ckpt")
    assert "epoch_1" in names and "epoch_2" in names
    assert "min_loss" in names

    # --- resume from latest: continues at epoch 3 ---
    cfg_resume = _cfg(tmp_path, epochs=1, continue_train="latest")
    result2 = fit(cfg_resume, loader, checkpoint_manager=mgr, use_mesh=False)
    names = os.listdir(tmp_path / "ckpt")
    assert "epoch_3" in names
    assert int(jax.tree.leaves(result2.state.step)[0]) == 3 * loader.steps_per_epoch()


@pytest.mark.slow
def test_fit_then_verification(tmp_path, dataset):
    """Train to convergence on an easy problem; the 10-fold protocol on
    held-out pairs of the same identities must beat chance by a wide margin."""
    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    result = fit(_cfg(tmp_path, epochs=6), loader, use_mesh=False)

    eval_step = jax.jit(make_eval_step(result.backbone))
    params = result.state.params["backbone"]
    stats = result.state.batch_stats
    emb = np.array(eval_step(params, stats, images))
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)

    rs = np.random.RandomState(0)
    pairs = []
    for _ in range(150):
        c = rs.randint(C)
        i, j = rs.choice(np.flatnonzero(labels == c), 2, replace=False)
        pairs.append((i, j, 1))
        c1, c2 = rs.choice(C, 2, replace=False)
        i = rs.choice(np.flatnonzero(labels == c1))
        j = rs.choice(np.flatnonzero(labels == c2))
        pairs.append((i, j, 0))
    pairs = np.asarray(pairs)
    sims = pair_cosine_similarities(emb, pairs)
    res = kfold_verification(sims, pairs[:, 2])
    assert res.mean_accuracy > 80.0, res
    assert res.mean_auc > 0.9, res


@pytest.mark.slow
def test_fit_qaface_dual_input(tmp_path, dataset):
    """QAFace trains through the fixed dual-input plumbing."""
    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    result = fit(_cfg(tmp_path, head="qaface", epochs=1), loader,
                 use_mesh=False)
    assert np.isfinite(result.min_train_loss)
    # memory was written for the classes seen
    assert float(np.abs(np.asarray(result.state.head_state.mem)).sum()) > 0


def test_fit_from_file_loader(tmp_path, dataset):
    """End-to-end with the file-based Loader (threaded decode), not just
    ArrayLoader: identity tree on disk -> index -> loader -> fit."""
    from face_recognition_models_tpu.data import ImageFolderIndex, Loader
    from face_recognition_models_tpu.data.synthetic import write_identity_tree

    images, labels = dataset
    write_identity_tree(str(tmp_path), images, labels, split="train")
    index = ImageFolderIndex.build(str(tmp_path), split="train")
    loader = Loader(index, batch_size=BS, image_size=IMG, num_workers=2,
                    seed=0)
    result = fit(_cfg(tmp_path, epochs=1), loader, use_mesh=False)
    assert np.isfinite(result.min_train_loss)


@pytest.mark.slow
def test_facenet_verification_end_to_end(tmp_path, dataset):
    """FaceNet triplet training then pair verification beats chance — with
    the full first-class artifact path: checkpoints rotate during training
    and the final artifact round-trips through the SAME restore_backbone +
    make_embed_fn machinery `face embed/eval/export` use."""
    from face_recognition_models_tpu.checkpoint import restore_backbone
    from face_recognition_models_tpu.config import FaceNetConfig
    from face_recognition_models_tpu.evaluation.batch_eval import (
        make_embed_fn)
    from face_recognition_models_tpu.evaluation.verification import (
        embed_unique_images)
    from face_recognition_models_tpu.triplet import train_facenet

    images, labels = dataset
    cfg = FaceNetConfig(backbone="resnet18", p=4, k=4, learning_rate=0.02)
    ckpt = str(tmp_path / "checkpoints" / "facenet_resnet18")
    result = train_facenet(cfg, images, labels, epochs=8, image_size=IMG,
                           verbose=False, checkpoint_dir=ckpt,
                           model_name="facenet_resnet18")

    # per-epoch checkpoints rotated (keep=3) + best + final artifact
    names = os.listdir(ckpt)
    assert "facenet_resnet18_final" in names and "min_loss" in names
    epochs_on_disk = sorted(n for n in names if n.startswith("epoch_"))
    assert epochs_on_disk == ["epoch_6", "epoch_7", "epoch_8"]

    # artifact round-trip through the standard production loading path
    abstract = {"params": result.state.params,
                "batch_stats": result.state.batch_stats}
    restored = restore_backbone(ckpt, abstract, "final",
                                model_name="facenet_resnet18")
    embed = make_embed_fn(result.model, restored["params"],
                          restored["batch_stats"])
    emb = embed_unique_images(embed, images, batch_size=BS)

    rs = np.random.RandomState(0)
    pairs = []
    for _ in range(120):
        c = rs.randint(C)
        i, j = rs.choice(np.flatnonzero(labels == c), 2, replace=False)
        pairs.append((i, j, 1))
        c1, c2 = rs.choice(C, 2, replace=False)
        pairs.append((rs.choice(np.flatnonzero(labels == c1)),
                      rs.choice(np.flatnonzero(labels == c2)), 0))
    pairs = np.asarray(pairs)
    sims = pair_cosine_similarities(emb, pairs)
    res = kfold_verification(sims, pairs[:, 2])
    assert res.mean_auc > 0.85, res

    # --- resume: one more epoch continues from the latest checkpoint ---
    result2 = train_facenet(cfg, images, labels, epochs=9, image_size=IMG,
                            verbose=False, checkpoint_dir=ckpt,
                            model_name="facenet_resnet18", resume=True)
    assert result2.start_epoch == 9
    assert "epoch_9" in os.listdir(ckpt)
    steps_per_epoch = result2.losses and len(result2.losses)
    assert int(result2.state.step) == int(result.state.step) + steps_per_epoch


@pytest.mark.slow
def test_scan_chunk_losses_match_per_step():
    """A scan chunk runs the SAME step sequence as per-step dispatches:
    the per-step losses inside one chunk must match exactly. (Full
    trajectories diverge over later steps from fp/bf16 fusion noise — that
    is expected and not asserted.)"""
    from face_recognition_models_tpu.data.synthetic import synthetic_identities
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import create_train_state
    from face_recognition_models_tpu.train.step import make_train_step

    images, labels = synthetic_identities(4, 6, image_size=16, seed=0)
    cfg = cfg_lib.TrainConfig(backbone="resnet18", head="arcface",
                              num_classes=4, batch_size=8, seed=0,
                              use_pallas_head=False,
                              data=cfg_lib.DataConfig(image_size=16))
    head_cfg = cfg_lib.make_head_config("arcface", num_classes=4)
    tx = get_optimizer("sgd", 0.1, momentum=0.9, weight_decay=5e-4)
    backbone, head, state0 = create_train_state(cfg, head_cfg, tx)
    step_fn = make_train_step(backbone, head, head_cfg, tx,
                              use_fused_head=False)
    b = [(jnp.asarray(images[i * 8:(i + 1) * 8]),
          jnp.asarray(labels[i * 8:(i + 1) * 8])) for i in range(2)]

    jstep = jax.jit(step_fn)
    s = state0
    singles = []
    for im, lb in b:
        s, m = jstep(s, im, lb)
        singles.append(float(m["loss"]))

    def chunk_fn(st, im_k, lb_k):
        return jax.lax.scan(lambda st, bb: step_fn(st, bb[0], bb[1]), st,
                            (im_k, lb_k))
    _, mk = jax.jit(chunk_fn)(state0, jnp.stack([b[0][0], b[1][0]]),
                              jnp.stack([b[0][1], b[1][1]]))
    # step 0 is identical; step 1 runs on step-0's updated params, which
    # carry ~1e-6 XLA-fusion noise amplified by the bf16 backbone -> allow
    # a small relative tolerance on later in-chunk steps.
    np.testing.assert_allclose([float(x) for x in mk["loss"]], singles,
                               rtol=5e-4)


@pytest.mark.slow
def test_scan_steps_driver_e2e():
    """fit(scan_steps=2) with an odd step count: chunked + leftover batches
    all execute, loss is finite, throughput accounting covers all images."""
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import synthetic_identities
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(4, 6, image_size=16, seed=0)
    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=4,
        batch_size=8, epochs=2, print_freq=1, seed=0,
        scan_steps=2, use_pallas_head=False,
        data=cfg_lib.DataConfig(image_size=16))
    loader = ArrayLoader(images, labels, batch_size=8, seed=0)
    result = fit(cfg, loader, use_mesh=False)
    assert np.isfinite(result.min_train_loss)
    # 3 steps/epoch x 2 epochs x batch 8 — leftovers included
    assert result.images_per_sec > 0
    assert result.steps_per_sec > 0


@pytest.mark.slow
def test_fit_warm_start_uses_given_backbone(dataset):
    """fit(warm_start=(params, stats)) must train FROM the given backbone —
    the in-memory fine-tune path (scripts/convergence_run.py two-stage
    protocol, mirroring reference backbones.py:12-26). With lr=0 the
    params are provably the warm ones; the head kernel starts fresh."""
    images, labels = dataset
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)

    stage1 = fit(_cfg(None, epochs=1), loader, use_mesh=False)
    warm = (jax.device_get(stage1.state.params["backbone"]),
            jax.device_get(stage1.state.batch_stats))

    cfg2 = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=C, batch_size=BS,
        epochs=1, seed=7, data=cfg_lib.DataConfig(image_size=IMG),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.0))
    stage2 = fit(cfg2, loader, use_mesh=False, warm_start=warm)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        stage2.state.params["backbone"], warm[0])


_PREEMPT_WORKER = r'''
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.checkpoint import CheckpointManager
from face_recognition_models_tpu.data.pipeline import ArrayLoader
from face_recognition_models_tpu.data.synthetic import synthetic_identities
from face_recognition_models_tpu.train.loop import fit

ckpt_dir = sys.argv[1]
images, labels = synthetic_identities(4, 4, image_size=16, seed=0,
                                      noise=10.0)
loader = ArrayLoader(images, labels, batch_size=8, seed=0)
cfg = cfg_lib.TrainConfig(
    backbone="resnet18", head="cosface", num_classes=4, batch_size=8,
    epochs=10000, seed=0, print_freq=1,
    data=cfg_lib.DataConfig(image_size=16),
    optimizer=cfg_lib.OptimizerConfig(learning_rate=0.02))
mgr = CheckpointManager(ckpt_dir, "cosface")
print("WORKER_READY", flush=True)
fit(cfg, loader, checkpoint_manager=mgr, use_mesh=False)
'''


@pytest.mark.slow
def test_preemption_sigterm_saves_resumable_checkpoint(tmp_path):
    """SURVEY 5.3: SIGTERM mid-training must finish the step, write (and
    DRAIN — the save is async) a checkpoint, and exit 143; the artifact
    must then restore via continue_train='latest'."""
    import signal
    import subprocess
    import sys as _sys
    import time

    worker = tmp_path / "preempt_worker.py"
    worker.write_text(_PREEMPT_WORKER)
    ckpt = tmp_path / "ckpt"
    proc = subprocess.Popen(
        [_sys.executable, str(worker), str(ckpt)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo")
    # wait until training is in its steady loop (first epochs saved)
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if (ckpt / "epoch_2").is_dir():
            break
        if proc.poll() is not None:
            break
        time.sleep(1.0)
    assert proc.poll() is None, proc.communicate()[0][-3000:]
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 143, out[-3000:]
    assert "Preemption: saved checkpoint" in out

    # the saved state restores and resumes
    from face_recognition_models_tpu import config as cfg_lib2
    from face_recognition_models_tpu.checkpoint import CheckpointManager
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    images, labels = synthetic_identities(4, 4, image_size=16, seed=0,
                                          noise=10.0)
    loader = ArrayLoader(images, labels, batch_size=8, seed=0)
    epochs_saved = max(int(d.name.split("_")[1])
                       for d in ckpt.iterdir() if d.name.startswith("epoch_"))
    cfg = cfg_lib2.TrainConfig(
        backbone="resnet18", head="cosface", num_classes=4, batch_size=8,
        epochs=epochs_saved + 1, seed=0, continue_train="latest",
        data=cfg_lib2.DataConfig(image_size=16),
        optimizer=cfg_lib2.OptimizerConfig(learning_rate=0.02))
    mgr = CheckpointManager(str(ckpt), "cosface")
    result = fit(cfg, loader, checkpoint_manager=mgr, use_mesh=False)
    assert np.isfinite(result.min_train_loss)
