"""Host input-pipeline benchmark (VERDICT r1 item 4).

Measures, on this host:
  1. raw JPEG decode throughput: native C++ (libjpeg, 1 and N threads) vs
     PIL thread pool — img/s;
  2. Loader feed rate (decode + resample policy + prefetch): img/s per
     backend;
  3. host cores needed to feed the measured device train/eval rates.

Prints one JSON line per measurement. CPU-only (never touches the TPU).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

N_IMAGES = 2048
IMAGE_SIZE = 112
BATCH = 256


def make_jpegs(root: str, n: int = N_IMAGES, size: int = IMAGE_SIZE,
               classes: int = 32):
    from PIL import Image
    rs = np.random.RandomState(0)
    paths = []
    for i in range(n):
        cls = i % classes
        d = os.path.join(root, "train", f"id_{cls:04d}")
        os.makedirs(d, exist_ok=True)
        arr = rs.randint(0, 256, (size, size, 3), np.uint8)
        p = os.path.join(d, f"img_{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def bench(fn, n_images: int, repeats: int = 3) -> float:
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = max(best, n_images / dt)
    return best


def main():
    ncores = os.cpu_count() or 1
    out = []
    with tempfile.TemporaryDirectory() as root:
        paths = make_jpegs(root)

        # --- 1. raw decode ------------------------------------------------
        from face_recognition_models_tpu.native import (
            decode_batch,
            is_available,
        )
        assert is_available(), "native decoder failed to build"
        sub = paths[:1024]

        for threads in (1, 8):
            rate = bench(lambda: decode_batch(sub, IMAGE_SIZE,
                                              n_threads=threads), len(sub))
            out.append({"metric": f"decode_native_t{threads}", "value": rate,
                        "unit": "img/s"})

        from face_recognition_models_tpu.data.pipeline import _decode_image
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(1) as pool:
            rate = bench(lambda: list(pool.map(
                lambda p: _decode_image(p, IMAGE_SIZE), sub)), len(sub))
        out.append({"metric": "decode_pil_t1", "value": rate,
                    "unit": "img/s"})
        with cf.ThreadPoolExecutor(8) as pool:
            rate = bench(lambda: list(pool.map(
                lambda p: _decode_image(p, IMAGE_SIZE), sub)), len(sub))
        out.append({"metric": "decode_pil_t8", "value": rate,
                    "unit": "img/s"})

        # --- 2. Loader feed rate -------------------------------------------
        from face_recognition_models_tpu.data import ImageFolderIndex, Loader
        index = ImageFolderIndex.build(root, split="train")
        for backend in ("native", "pil"):
            loader = Loader(index, batch_size=BATCH, image_size=IMAGE_SIZE,
                            num_workers=8, seed=0, backend=backend)
            n = loader.steps_per_epoch() * BATCH

            def drain():
                for _ in loader.epoch(0):
                    pass
            rate = bench(drain, n, repeats=2)
            out.append({"metric": f"loader_feed_{backend}", "value": rate,
                        "unit": "img/s"})

        # --- 2b. RecordIO feed rate (insightface train.rec path) -----------
        import io

        from PIL import Image

        from face_recognition_models_tpu.data.recordio import (
            RecLoader,
            RecordIODataset,
            write_recordio,
        )
        payloads = []
        for p in paths:
            with open(p, "rb") as f:
                payloads.append(f.read())
        labels = [i % 32 for i in range(len(paths))]
        write_recordio(os.path.join(root, "train"), payloads, labels)
        rec = RecordIODataset.open(os.path.join(root, "train.rec"))
        for backend in ("native", "pil"):
            rloader = RecLoader(rec, batch_size=BATCH,
                                image_size=IMAGE_SIZE, num_workers=8,
                                seed=0, backend=backend)
            n = rloader.steps_per_epoch() * BATCH

            def drain_rec():
                for _ in rloader.epoch(0):
                    pass
            rate = bench(drain_rec, n, repeats=2)
            out.append({"metric": f"recloader_feed_{backend}",
                        "value": rate, "unit": "img/s"})

        # --- 3. packed (pre-decoded) feed rate -----------------------------
        from face_recognition_models_tpu.data.packed import (
            PackedDataset,
            PackedLoader,
            pack_dataset,
        )
        pack_dir = os.path.join(root, "pack")
        t0 = time.perf_counter()
        pack_dataset(index, pack_dir, image_size=IMAGE_SIZE, num_workers=8)
        out.append({"metric": "pack_build", "value":
                    len(index) / (time.perf_counter() - t0), "unit": "img/s"})
        ds = PackedDataset.open(pack_dir)
        ploader = PackedLoader(ds, batch_size=BATCH, seed=0)
        n = ploader.steps_per_epoch() * BATCH

        def drain_packed():
            for _ in ploader.epoch(0):
                pass
        rate = bench(drain_packed, n, repeats=3)
        out.append({"metric": "loader_feed_packed", "value": rate,
                    "unit": "img/s"})

    native_core = next(o["value"] for o in out
                       if o["metric"] == "decode_native_t1")
    for target, label in ((5000, "target_5k"), (9300, "train_9k3"),
                          (44000, "eval_44k")):
        out.append({"metric": f"cores_needed_{label}",
                    "value": round(target / native_core, 2),
                    "unit": f"cores @ {native_core:.0f} img/s/core"})
    out.append({"metric": "host_cores", "value": ncores, "unit": "cores"})

    for o in out:
        print(json.dumps(o))


if __name__ == "__main__":
    sys.exit(main())
