"""Packed pre-decoded dataset: decode once, train at memory bandwidth.

The reference re-decodes every JPEG every epoch through torch DataLoader
workers (dataset.py:124-136) — on this sandbox's 1-core host that caps
end-to-end training at ~2.4k img/s while the TPU chip sustains ~9k img/s
(PERF.md). TPU pods are fed from comparatively weak hosts, so the
TPU-native fix is an offline pack step:

    face pack --dataset-path <tree> --output casia.pack/

decodes the whole identity tree ONCE (native libjpeg decoder) into

    images.u8    uint8 memmap [N, H, W, 3]   (37.6 KB/img @112px)
    labels.npy   int32 [N]
    meta.json    {num_samples, image_size, identities, format_version}

and `PackedLoader` then serves shuffled batches by memmap fancy-indexing —
a pure gather, no decode — at >100k img/s/core. Batches stay uint8 so the
host->device transfer and on-device normalization are identical to the
JPEG Loader path (pipeline.py); training code cannot tell the difference.

This has no reference equivalent (the reference has no input-pipeline
optimization at all); it is the input-side analogue of its offline MTCNN
alignment step (preprocess.py:8-46): do the expensive work once, off the
training path.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from face_recognition_models_tpu.data.index import ImageFolderIndex
from face_recognition_models_tpu.data.pipeline import Loader

_FORMAT_VERSION = 1
_META = "meta.json"
_IMAGES = "images.u8"
_LABELS = "labels.npy"


def is_packed_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, _META))


def pack_dataset(index: ImageFolderIndex, out_dir: str,
                 image_size: int = 112, num_workers: int = 8,
                 backend: str = "auto", progress_every: int = 0) -> dict:
    """Decode every image in `index` into a packed dir. Returns meta.

    Corrupt images are resampled by the Loader's static-shape policy, so
    the pack always holds exactly len(index) valid samples.
    """
    n = len(index)
    if n == 0:
        raise ValueError("empty index")
    loader = Loader(index, batch_size=min(1024, n), image_size=image_size,
                    shuffle=False, num_workers=num_workers,
                    drop_remainder=False, backend=backend)
    return pack_from_loader(loader, index.identities, out_dir,
                            image_size, decode_backend=loader.backend,
                            progress_every=progress_every)


def pack_from_loader(loader, identities, out_dir: str, image_size: int,
                     decode_backend: str = "pil",
                     progress_every: int = 0) -> dict:
    """Write a packed dir from any Loader-contract source (folder Loader,
    RecordIO RecLoader, ...): the loader's epoch(0) must be an unshuffled
    full pass with drop_remainder=False."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(loader.dataset) if hasattr(loader, "dataset") \
        else len(loader.index)
    mm = np.memmap(os.path.join(out_dir, _IMAGES), dtype=np.uint8,
                   mode="w+", shape=(n, image_size, image_size, 3))
    labels = np.empty((n,), np.int32)
    pos = 0
    for imgs, labs in loader.epoch(0):
        mm[pos:pos + len(imgs)] = imgs
        labels[pos:pos + len(labs)] = labs
        pos += len(imgs)
        if progress_every and pos % progress_every < len(imgs):
            print(f"packed {pos}/{n}")
    assert pos == n, f"packed {pos} of {n}"
    mm.flush()
    del mm
    np.save(os.path.join(out_dir, _LABELS), labels)
    meta = {
        "format_version": _FORMAT_VERSION,
        "num_samples": n,
        "image_size": image_size,
        "identities": list(identities),
        "decode_backend": decode_backend,
        "skipped_images": loader.skipped_images,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


@dataclass
class PackedDataset:
    """Read side of a packed dir: zero-copy memmap over images.u8."""

    root: str
    images: np.memmap          # uint8 [N, H, W, 3]
    labels: np.ndarray         # int32 [N]
    image_size: int
    identities: List[str]

    @property
    def num_identities(self) -> int:
        return len(self.identities)

    def __len__(self) -> int:
        return len(self.labels)

    @classmethod
    def open(cls, root: str) -> "PackedDataset":
        meta_path = os.path.join(root, _META)
        if not os.path.isfile(meta_path):
            raise FileNotFoundError(f"not a packed dataset: {root}")
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"packed format v{meta.get('format_version')} "
                f"!= reader v{_FORMAT_VERSION}")
        n, s = meta["num_samples"], meta["image_size"]
        img_path = os.path.join(root, _IMAGES)
        expect = n * s * s * 3
        actual = os.path.getsize(img_path)
        if actual != expect:
            raise ValueError(
                f"{img_path}: {actual} bytes, expected {expect} "
                f"({n} x {s}x{s}x3) — truncated or corrupt pack")
        images = np.memmap(img_path, dtype=np.uint8, mode="r",
                           shape=(n, s, s, 3))
        labels = np.load(os.path.join(root, _LABELS))
        if len(labels) != n:
            raise ValueError("labels/meta length mismatch")
        return cls(root=root, images=images, labels=labels.astype(np.int32),
                   image_size=s, identities=list(meta["identities"]))


class PackedLoader:
    """Same epoch API as pipeline.Loader, over a PackedDataset.

    Batch assembly is memmap fancy-indexing in a prefetch thread (the
    gather overlaps device compute exactly like the decode pool does).
    Shuffle order is a pure function of (seed, epoch) and `shard=(rank,
    count)` takes every count-th index — identical semantics to
    Loader._epoch_order, so multi-host training can mix packed and JPEG
    hosts without divergence.
    """

    def __init__(self, dataset: PackedDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 drop_remainder: bool = True, prefetch: int = 2,
                 shard: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        if shard is not None:
            rank, count = shard
            if not 0 <= rank < count:
                raise ValueError(f"bad shard {shard}")
        self.shard = shard
        self.image_size = dataset.image_size
        self.skipped_images = 0  # parity with Loader's observability field

    def _shard_len(self) -> int:
        n = len(self.dataset)
        if self.shard is None:
            return n
        # MINIMUM shard length on every rank (multihost epoch-tail law;
        # see data/recordio.py RecLoader._shard_len)
        _rank, count = self.shard
        return n // count

    def steps_per_epoch(self) -> int:
        n = self._shard_len()
        return (n // self.batch_size if self.drop_remainder
                else -(-n // self.batch_size))

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        if self.shard is not None:
            rank, count = self.shard
            order = order[rank::count][:self._shard_len()]
        return order

    def epoch(self, epoch: int = 0
              ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._epoch_order(epoch)
        bs = self.batch_size
        steps = self.steps_per_epoch()
        images, labels = self.dataset.images, self.dataset.labels

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for s in range(steps):
                    if stop.is_set():
                        return
                    idxs = order[s * bs:(s + 1) * bs]
                    # sorted gather is sequential-friendly for cold
                    # memmaps; restore the shuffled within-batch order
                    sort = np.argsort(idxs, kind="stable")
                    batch = np.empty((len(idxs),) + images.shape[1:],
                                     np.uint8)
                    batch[sort] = images[idxs[sort]]
                    q.put((batch, labels[idxs]))
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
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)
