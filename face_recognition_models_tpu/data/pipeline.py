"""Host-side image loader feeding the device.

The reference uses torch DataLoader with 8 worker processes, per-image PIL
decode, per-sample ToTensor+Normalize, and a collate that drops corrupt
images producing ragged batches (dataset.py:124-136, model_utils.py:140-144,
539-552). TPU-native design differs deliberately:

- decode on a thread pool into preallocated uint8 numpy batches (PIL
  releases the GIL around JPEG decode);
- STATIC batch shapes: a corrupt image is replaced by resampling another
  index instead of shrinking the batch (XLA recompiles on shape change, so
  the reference's ragged batches would be poison);
- normalization ((x/255 - mean)/std) is NOT done on host: batches ship as
  uint8 (4x less host->device bandwidth than fp32) and the train/eval step
  applies the fused affine on device (ops/image_ops.py);
- double-buffered prefetch: the next batch decodes while the device runs.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import random
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from face_recognition_models_tpu.data.index import ImageFolderIndex


def _decode_image(path: str, image_size: int) -> Optional[np.ndarray]:
    """uint8 HWC decode; None on failure (reference dataset.py:127-131)."""
    try:
        from PIL import Image
        with Image.open(path) as im:
            im = im.convert("RGB")
            if im.size != (image_size, image_size):
                im = im.resize((image_size, image_size))
            return np.asarray(im, dtype=np.uint8)
    except Exception:
        return None


class Loader:
    """Iterates (uint8 images [B,H,W,3], int32 labels [B]) epochs.

    backend:
      'native' — C++ threaded libjpeg batch decoder (native/fastdecode);
                 ~4x PIL per core, scales with host threads;
      'pil'    — thread-pool PIL decode;
      'auto'   — native when it builds and all files are JPEG, else PIL.
    """

    def __init__(self, index: ImageFolderIndex, batch_size: int,
                 image_size: int = 112, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 8,
                 drop_remainder: bool = True, prefetch: int = 2,
                 backend: str = "auto",
                 shard: Optional[Tuple[int, int]] = None):
        """shard=(rank, count): multi-host data parallelism — this process
        loads only its 1/count slice of each (globally shuffled) epoch, so
        under `jax.distributed` every host feeds distinct samples. The
        shuffle order is a pure function of (seed, epoch): all hosts agree
        without communication."""
        self.index = index
        self.batch_size = batch_size
        self.image_size = image_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        if shard is not None:
            rank, count = shard
            if not 0 <= rank < count:
                raise ValueError(f"bad shard {shard}")
        self.shard = shard
        self._paths = index.absolute_paths()
        self._labels = np.asarray(index.labels(), dtype=np.int32)
        self.skipped_images = 0  # corrupt-image counter (observability)

        if backend not in ("auto", "native", "pil"):
            raise ValueError(f"unknown backend {backend!r}")
        self._native = False
        if backend in ("auto", "native"):
            try:
                from face_recognition_models_tpu.native import is_available
                jpeg_only = all(p.lower().endswith((".jpg", ".jpeg"))
                                for p in self._paths[:64])
                self._native = is_available() and (jpeg_only
                                                   or backend == "native")
            except Exception:
                self._native = False
            if backend == "native" and not self._native:
                raise RuntimeError("native decode backend unavailable")
        self.backend = "native" if self._native else "pil"

    def _shard_len(self) -> int:
        n = len(self._paths)
        if self.shard is None:
            return n
        # MINIMUM shard length on every rank: differing steps_per_epoch
        # across hosts deadlocks the global-batch assembly at the epoch
        # tail (see data/recordio.py RecLoader._shard_len — same law).
        _rank, count = self.shard
        return n // count

    def steps_per_epoch(self) -> int:
        n = self._shard_len()
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self._paths))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        if self.shard is not None:
            rank, count = self.shard
            order = order[rank::count][:self._shard_len()]
        return order

    def _load_batch(self, pool: cf.ThreadPoolExecutor, idxs: np.ndarray,
                    rng: random.Random) -> Tuple[np.ndarray, np.ndarray]:
        if self._native:
            return self._load_batch_native(idxs, rng)
        return self._load_batch_pil(pool, idxs, rng)

    def _load_batch_native(self, idxs: np.ndarray, rng: random.Random
                           ) -> Tuple[np.ndarray, np.ndarray]:
        from face_recognition_models_tpu.native import decode_batch

        n = len(self._paths)
        idxs = np.array(idxs)
        images, status = decode_batch(
            [self._paths[i] for i in idxs], self.image_size,
            n_threads=self.num_workers)
        # resample failed slots (static-shape policy), PIL as last resort
        for attempt in range(8):
            bad = np.flatnonzero(status)
            if not len(bad):
                break
            self.skipped_images += len(bad)
            for slot in bad:
                idxs[slot] = rng.randrange(n)
            retry, status_r = decode_batch(
                [self._paths[idxs[s]] for s in bad], self.image_size,
                n_threads=self.num_workers)
            images[bad] = retry
            status[:] = 0
            status[bad] = status_r
        for slot in np.flatnonzero(status):
            arr = _decode_image(self._paths[idxs[slot]], self.image_size)
            if arr is None:
                # 9 independent records all undecodable: the dataset is
                # corrupt — fail loudly rather than silently training the
                # last label on a black image
                raise RuntimeError(
                    "persistent image decode failures (last: "
                    f"{self._paths[idxs[slot]]}); dataset appears corrupt")
            images[slot] = arr
        return images, self._labels[idxs]

    def _load_batch_pil(self, pool: cf.ThreadPoolExecutor, idxs: np.ndarray,
                        rng: random.Random) -> Tuple[np.ndarray, np.ndarray]:
        n = len(self._paths)
        images = np.empty((len(idxs), self.image_size, self.image_size, 3),
                          np.uint8)
        labels = np.empty((len(idxs),), np.int32)

        def fill(slot: int, idx: int, attempts: int = 8):
            arr = _decode_image(self._paths[idx], self.image_size)
            while arr is None and attempts > 0:
                # static-shape policy: resample instead of dropping
                self.skipped_images += 1
                idx = rng.randrange(n)
                arr = _decode_image(self._paths[idx], self.image_size)
                attempts -= 1
            if arr is None:
                raise RuntimeError(
                    "persistent image decode failures (last: "
                    f"{self._paths[idx]}); dataset appears corrupt")
            images[slot] = arr
            labels[slot] = self._labels[idx]

        list(pool.map(fill, range(len(idxs)), idxs))
        return images, labels

    def epoch(self, epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield batches for one epoch, with background prefetch."""
        order = self._epoch_order(epoch)
        bs = self.batch_size
        steps = self.steps_per_epoch()
        rng = random.Random(self.seed * 1000003 + epoch)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    for s in range(steps):
                        if stop.is_set():
                            return
                        idxs = order[s * bs:(s + 1) * bs]
                        q.put(self._load_batch(pool, idxs, rng))
                q.put(None)
            except BaseException as exc:  # noqa: BLE001 — surface, not hang
                q.put(exc)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)


class PKLoader(Loader):
    """PK-structured streaming loader for triplet training: every batch
    holds P identities x K images (data/sampler.PKBatchSampler), decoded on
    the hot path through the Loader backends (native C++ libjpeg / PIL)
    with the same prefetch pipeline — `face facenet --dataset-path` trains
    an identity tree without ever materializing it in host RAM (the
    reference's FaceNet DataLoader+PKSampler pairing, FaceNet/main.py:48-77
    and :133-139).

    Corrupt images follow the Loader's static-shape resample policy; a
    resampled slot may fall outside the batch's P identities, which the
    miner tolerates (pairs without a valid positive/negative are masked
    out, ops/mining.py)."""

    def __init__(self, index: ImageFolderIndex, p: int, k: int,
                 image_size: int = 112, seed: int = 0, num_workers: int = 8,
                 prefetch: int = 2, backend: str = "auto"):
        super().__init__(index, batch_size=p * k, image_size=image_size,
                         shuffle=False, seed=seed, num_workers=num_workers,
                         drop_remainder=True, prefetch=prefetch,
                         backend=backend)
        from face_recognition_models_tpu.data.sampler import PKBatchSampler
        self._sampler = PKBatchSampler(self._labels, p, k, seed=seed)

    def steps_per_epoch(self) -> int:
        return len(self._sampler)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        # one flat index array the base epoch() slices back into the
        # sampler's PK batches (batch_size == p*k)
        return np.concatenate(list(self._sampler.epoch(epoch)))


class ArrayLoader:
    """In-memory variant (synthetic data / tests): same epoch API over
    preloaded uint8 arrays."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_remainder: bool = True):
        assert images.dtype == np.uint8 and images.ndim == 4
        self.images = images
        self.labels = labels.astype(np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder

    def steps_per_epoch(self) -> int:
        n = len(self.images)
        return (n // self.batch_size if self.drop_remainder
                else -(-n // self.batch_size))

    def epoch(self, epoch: int = 0):
        order = np.arange(len(self.images))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        bs = self.batch_size
        for s in range(self.steps_per_epoch()):
            idxs = order[s * bs:(s + 1) * bs]
            yield self.images[idxs], self.labels[idxs]
