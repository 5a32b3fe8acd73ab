"""Data layer: indexer, loader (incl. corrupt-image policy), pairs, PK
sampler, synthetic generators, on-device image ops."""

import os

import numpy as np
import pytest

from face_recognition_models_tpu.data import (
    ImageFolderIndex,
    Loader,
    PKBatchSampler,
    load_pair_list,
)
from face_recognition_models_tpu.data.pipeline import ArrayLoader
from face_recognition_models_tpu.data.synthetic import (
    synthetic_identities,
    write_identity_tree,
    write_pair_benchmark,
)
from face_recognition_models_tpu.ops.image_ops import normalize_images


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("casia")
    images, labels = synthetic_identities(num_classes=5, per_class=6,
                                          image_size=32, seed=0)
    write_identity_tree(str(root), images, labels, split="train")
    write_identity_tree(str(root), images[::2], labels[::2], split="valid")
    return str(root)


def test_index_build(tree):
    idx = ImageFolderIndex.build(tree, split="train")
    assert len(idx) == 30
    assert idx.num_identities == 5
    labels = set(idx.labels())
    assert labels == set(range(5))


def test_index_missing_dir_raises(tree):
    with pytest.raises(FileNotFoundError):
        ImageFolderIndex.build(tree, split="nope")


def test_index_concat(tree):
    a = ImageFolderIndex.build(tree, split="train")
    b = ImageFolderIndex.build(tree, split="valid")
    both = ImageFolderIndex.concat([a, b])
    assert len(both) == len(a) + len(b)
    assert both.num_identities == 5


def test_loader_batches(tree):
    idx = ImageFolderIndex.build(tree, split="train")
    loader = Loader(idx, batch_size=8, image_size=32, num_workers=2, seed=1)
    assert loader.steps_per_epoch() == 3
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for images, labels in batches:
        assert images.shape == (8, 32, 32, 3) and images.dtype == np.uint8
        assert labels.shape == (8,) and labels.dtype == np.int32
    # different epoch -> different order
    b0 = list(loader.epoch(0))[0][1]
    b1 = list(loader.epoch(1))[0][1]
    assert not np.array_equal(b0, b1)


def test_loader_corrupt_image_resampled(tree):
    """A corrupt file must not shrink the batch (static shapes) — it is
    resampled and counted."""
    idx = ImageFolderIndex.build(tree, split="train")
    # corrupt one file
    victim = os.path.join(idx.root, idx.samples[0][0])
    with open(victim, "wb") as f:
        f.write(b"not a jpeg")
    loader = Loader(idx, batch_size=30, image_size=32, num_workers=2,
                    shuffle=False)
    images, labels = next(loader.epoch(0))
    assert images.shape[0] == 30
    assert loader.skipped_images >= 1


def test_pair_list(tmp_path):
    root = write_pair_benchmark(str(tmp_path), num_classes=4,
                                pairs_per_kind=10, image_size=32)
    pairs = load_pair_list(os.path.join(root, "pair.list"))
    assert pairs.shape == (20, 3)
    assert set(pairs[:, 2]) == {0, 1}
    # all referenced images exist
    for a, b, _ in pairs:
        assert os.path.exists(os.path.join(root, "imgs", f"{a}.jpg"))
        assert os.path.exists(os.path.join(root, "imgs", f"{b}.jpg"))


def test_pk_sampler():
    labels = np.repeat(np.arange(10), 5)  # 10 ids x 5 images
    sampler = PKBatchSampler(labels, p=4, k=3, seed=0)
    batches = list(sampler.epoch(0))
    assert len(batches) == 2  # 10 // 4
    for batch in batches:
        assert len(batch) == 12
        batch_labels = labels[batch]
        ids, counts = np.unique(batch_labels, return_counts=True)
        assert len(ids) == 4
        assert (counts == 3).all()


def test_pk_sampler_with_replacement():
    labels = [0, 0, 1, 1, 2, 2]  # only 2 images per id, k=4 needs replacement
    sampler = PKBatchSampler(labels, p=2, k=4)
    batch = next(sampler.epoch(0))
    assert len(batch) == 8


def test_normalize_images_matches_torch_transform():
    """((x/255) - 0.5)/0.5 == reference ToTensor+Normalize(0.5,0.5)."""
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(normalize_images(imgs))
    expected = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_array_loader():
    images, labels = synthetic_identities(3, 4, image_size=16)
    loader = ArrayLoader(images, labels, batch_size=4, seed=0)
    assert loader.steps_per_epoch() == 3
    for im, lb in loader.epoch(0):
        assert im.shape == (4, 16, 16, 3)


def test_native_decoder_matches_loader_contract(tree):
    """Native backend produces the same shapes/labels and handles corrupt
    files by resampling, like the PIL backend."""
    from face_recognition_models_tpu.native import is_available

    if not is_available():
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    idx = ImageFolderIndex.build(tree, split="train")
    nat = Loader(idx, batch_size=8, image_size=32, backend="native",
                 shuffle=False)
    pil = Loader(idx, batch_size=8, image_size=32, backend="pil",
                 shuffle=False)
    assert nat.backend == "native" and pil.backend == "pil"
    (im_n, lb_n), (im_p, lb_p) = next(nat.epoch(0)), next(pil.epoch(0))
    np.testing.assert_array_equal(lb_n, lb_p)
    assert im_n.shape == im_p.shape == (8, 32, 32, 3)
    # same source JPEGs: decoded pixels must agree closely (identical
    # libjpeg DCT path; PIL may differ by rounding)
    assert np.abs(im_n.astype(int) - im_p.astype(int)).mean() < 2.0


def test_native_decoder_corrupt_resample(tree):
    from face_recognition_models_tpu.native import is_available

    if not is_available():
        pytest.skip("native decoder unavailable")
    idx = ImageFolderIndex.build(tree, split="train")
    victim = os.path.join(idx.root, idx.samples[2][0])
    with open(victim, "wb") as f:
        f.write(b"corrupt")
    loader = Loader(idx, batch_size=len(idx), image_size=32,
                    backend="native", shuffle=False)
    images, labels = next(loader.epoch(0))
    assert images.shape[0] == len(idx)
    assert loader.skipped_images >= 1


def test_loader_sharding_partitions_epoch(tmp_path):
    """shard=(rank, count): per-epoch global shuffle is identical across
    ranks, rank slices are disjoint, and every rank yields EXACTLY
    n//count items (the multihost epoch-tail law — uneven shard lengths
    deadlock the global-batch assembly; up to count-1 tail items are
    dropped per epoch when count doesn't divide n)."""
    from face_recognition_models_tpu.data import ImageFolderIndex, Loader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities,
        write_identity_tree,
    )

    images, labels = synthetic_identities(5, 5, image_size=8, seed=0)
    write_identity_tree(str(tmp_path), images, labels, split="train")
    index = ImageFolderIndex.build(str(tmp_path), split="train")
    n = len(index)  # 25: NOT divisible by 3 ranks

    seen, steps = [], set()
    for rank in range(3):
        loader = Loader(index, batch_size=4, image_size=8, num_workers=1,
                        seed=5, shard=(rank, 3), drop_remainder=False)
        steps.add(loader.steps_per_epoch())
        got = []
        for _imgs, lbs in loader.epoch(2):
            got.extend(int(x) for x in lbs)
        seen.append(got)
    assert len(steps) == 1  # every rank agrees on the step count
    counts = [len(s) for s in seen]
    assert counts == [n // 3] * 3  # uniform; tail (n % 3) dropped
    with pytest.raises(ValueError, match="bad shard"):
        Loader(index, batch_size=4, image_size=8, shard=(3, 3))


def test_loader_all_corrupt_raises(tree, tmp_path):
    """When resampling cannot find ANY decodable image the loader must
    fail loudly instead of silently training labels on black images."""
    import shutil

    from face_recognition_models_tpu.data.pipeline import Loader

    root = tmp_path / "allbad"
    shutil.copytree(tree, root)
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            with open(os.path.join(dirpath, f), "wb") as fh:
                fh.write(b"corrupt")
    loader = Loader(ImageFolderIndex.build(str(root), split="train"),
                    batch_size=4, image_size=16, backend="pil",
                    num_workers=2)
    with pytest.raises(RuntimeError, match="corrupt"):
        for _ in loader.epoch(0):
            pass
