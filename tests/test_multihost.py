"""REAL multi-process training test (SURVEY §5.8 / §2.3 multihost claim).

Simulates 2 hosts x 4 chips with `jax.distributed` over local CPU
processes: each worker builds the global ('data','model') mesh, loads ITS
shard of a shared on-disk identity tree through Loader(shard=...), and
runs fit() for one epoch. The per-step global loss must be identical on
both hosts (the batches assemble via make_array_from_process_local_data,
gradients psum across the full mesh).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r'''
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, port, data_root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.data import ImageFolderIndex, Loader
from face_recognition_models_tpu.parallel import make_mesh
from face_recognition_models_tpu.train.loop import fit

cfg = cfg_lib.TrainConfig(
    backbone="resnet18", head="arcface", num_classes=8, batch_size=16,
    epochs=1, print_freq=1, seed=0, use_pallas_head=False,
    mesh=cfg_lib.MeshConfig(data=4, model=2),
    data=cfg_lib.DataConfig(image_size=16),
    optimizer=cfg_lib.OptimizerConfig(learning_rate=0.05))
index = ImageFolderIndex.build(data_root, split="train")
# global batch 16 -> 8 per host
loader = Loader(index, batch_size=8, image_size=16, num_workers=2, seed=0,
                shard=(pid, 2))
mesh = make_mesh(cfg.mesh)
result = fit(cfg, loader, use_mesh=True, mesh=mesh)
print(f"RESULT {pid} {result.min_train_loss:.6f}", flush=True)
'''


@pytest.mark.slow
def test_two_process_multihost_fit(tmp_path):
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities,
        write_identity_tree,
    )

    images, labels = synthetic_identities(8, 8, image_size=16, seed=0)
    write_identity_tree(str(tmp_path / "data"), images, labels,
                        split="train")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pick their own device count
    env["JAX_PLATFORMS"] = ""
    port = "19433"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port,
         str(tmp_path / "data")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo")
        for pid in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, out[-2000:]
        losses.append(float(lines[0].split()[2]))
    # both hosts observe the identical global loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6), losses
    assert np.isfinite(losses[0])


_REC_WORKER = r'''
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, port, prefix = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=pid)

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.data.recordio import (RecLoader,
                                                       RecordIODataset)
from face_recognition_models_tpu.parallel import make_mesh
from face_recognition_models_tpu.train.loop import fit

cfg = cfg_lib.TrainConfig(
    backbone="resnet18", head="arcface", num_classes=8, batch_size=16,
    epochs=2, print_freq=1, seed=0, use_pallas_head=False,
    mesh=cfg_lib.MeshConfig(data=4, model=2),
    data=cfg_lib.DataConfig(image_size=16),
    optimizer=cfg_lib.OptimizerConfig(learning_rate=0.05))
ds = RecordIODataset.open(prefix)
loader = RecLoader(ds, batch_size=8, image_size=16, num_workers=2, seed=0,
                   drop_remainder=True, shard=(pid, 2))
assert loader.steps_per_epoch() == 1, loader.steps_per_epoch()
mesh = make_mesh(cfg.mesh)
result = fit(cfg, loader, use_mesh=True, mesh=mesh)
print(f"RESULT {pid} {result.min_train_loss:.6f}", flush=True)
'''


@pytest.mark.slow
def test_two_process_multihost_recordio_fit(tmp_path):
    """Multihost RecordIO training over an UNEVEN dataset: 31 records over
    2 hosts gave shard lengths 16/15 before the min-shard-length fix, so
    host 0 dispatched a second step host 1 never joined — the global batch
    assembly deadlocked at the epoch tail. Both hosts must now agree on
    steps_per_epoch (1) and finish 2 epochs with identical global loss
    (a hang here trips the subprocess timeout)."""
    import io

    from PIL import Image

    from face_recognition_models_tpu.data.recordio import write_recordio

    rs = np.random.RandomState(0)
    labels = np.sort(rs.randint(0, 8, 31))
    payloads = []
    for lab in labels:
        arr = np.full((16, 16, 3), 20 + 10 * int(lab), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        payloads.append(buf.getvalue())
    prefix = str(tmp_path / "train")
    write_recordio(prefix, payloads, labels.astype(np.int64))

    worker = tmp_path / "rec_worker.py"
    worker.write_text(_REC_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = ""
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "19437", prefix],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo")
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=900)[0])
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost RecordIO fit deadlocked (epoch-tail step "
                    "mismatch regression)")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = [float([l for l in out.splitlines()
                     if l.startswith("RESULT")][0].split()[2])
              for out in outs]
    assert losses[0] == pytest.approx(losses[1], abs=1e-6), losses
    assert np.isfinite(losses[0])
