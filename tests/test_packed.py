"""Packed pre-decoded dataset (`face pack` -> PackedLoader).

No reference equivalent (the reference re-decodes JPEGs every epoch,
dataset.py:124-136); this is the offline-decode input path that keeps a
TPU chip fed from a weak host. Contract under test: pack == decode-once,
and PackedLoader is batch-for-batch identical to the JPEG Loader."""

import os

import numpy as np
import pytest

from face_recognition_models_tpu.data import ImageFolderIndex, Loader
from face_recognition_models_tpu.data.packed import (
    PackedDataset,
    PackedLoader,
    is_packed_dir,
    pack_dataset,
)
from face_recognition_models_tpu.data.synthetic import (
    synthetic_identities,
    write_identity_tree,
)


@pytest.fixture(scope="module")
def packed_pair(tmp_path_factory):
    """(index, packed_dir) over a small synthetic JPEG tree."""
    root = tmp_path_factory.mktemp("casia")
    images, labels = synthetic_identities(num_classes=4, per_class=8,
                                          image_size=32, seed=3)
    write_identity_tree(str(root), images, labels, split="train")
    index = ImageFolderIndex.build(str(root), split="train")
    out = str(tmp_path_factory.mktemp("pack"))
    pack_dataset(index, out, image_size=32, num_workers=2)
    return index, out


def test_pack_roundtrip_matches_decoded_files(packed_pair):
    index, out = packed_pair
    assert is_packed_dir(out)
    ds = PackedDataset.open(out)
    assert len(ds) == len(index) == 32
    assert ds.image_size == 32
    assert ds.num_identities == 4
    # sample i of the pack is exactly the decode of sample i of the index
    from face_recognition_models_tpu.data.pipeline import _decode_image
    for i in (0, 7, 31):
        ref = _decode_image(index.absolute_paths()[i], 32)
        np.testing.assert_array_equal(ds.images[i], ref)
        assert ds.labels[i] == index.labels()[i]


def test_packed_loader_matches_jpeg_loader(packed_pair):
    """Same (seed, epoch, shard) => byte-identical batches vs Loader."""
    index, out = packed_pair
    ds = PackedDataset.open(out)
    for shard in (None, (1, 2)):
        jpeg = Loader(index, batch_size=8, image_size=32, num_workers=2,
                      seed=5, shard=shard)
        packed = PackedLoader(ds, batch_size=8, seed=5, shard=shard)
        assert packed.steps_per_epoch() == jpeg.steps_per_epoch()
        for (pi, pl), (ji, jl) in zip(packed.epoch(2), jpeg.epoch(2)):
            np.testing.assert_array_equal(pi, ji)
            np.testing.assert_array_equal(pl, jl)


def test_packed_loader_epoch_reshuffles(packed_pair):
    _, out = packed_pair
    ds = PackedDataset.open(out)
    loader = PackedLoader(ds, batch_size=16, seed=0)
    l0 = np.concatenate([l for _, l in loader.epoch(0)])
    l1 = np.concatenate([l for _, l in loader.epoch(1)])
    assert not np.array_equal(l0, l1)
    assert sorted(l0) == sorted(l1)


def test_packed_version_check(packed_pair, tmp_path):
    _, out = packed_pair
    import json
    import shutil
    bad = tmp_path / "bad_pack"
    shutil.copytree(out, bad)
    meta = json.load(open(bad / "meta.json"))
    meta["format_version"] = 999
    json.dump(meta, open(bad / "meta.json", "w"))
    with pytest.raises(ValueError, match="format"):
        PackedDataset.open(str(bad))


@pytest.mark.slow
def test_cli_pack_then_train(tmp_path):
    """face pack -> face train --dataset-path <pack> end-to-end (CPU)."""
    from face_recognition_models_tpu.cli.main import main

    root = tmp_path / "tree"
    images, labels = synthetic_identities(num_classes=4, per_class=8,
                                          image_size=16, seed=1)
    write_identity_tree(str(root), images, labels, split="train")
    pack_dir = tmp_path / "pack"
    rc = main(["pack", "--dataset-path", str(root),
               "--output", str(pack_dir), "--image-size", "16"])
    assert rc == 0 and is_packed_dir(str(pack_dir))

    rc = main(["--platform", "cpu", "train",
               "--dataset-path", str(pack_dir),
               "--working-path", str(tmp_path / "work"),
               "--head", "cosface", "--backbone", "resnet18",
               "--batch_size", "8", "--epochs", "1",
               "--num-classes", "4", "--image-size", "16",
               "--wandb-project", "", "--print_freq", "1"])
    assert rc == 0


def test_truncated_pack_rejected(packed_pair, tmp_path):
    import shutil
    _, out = packed_pair
    bad = tmp_path / "trunc_pack"
    shutil.copytree(out, bad)
    with open(bad / "images.u8", "r+b") as f:
        f.truncate(100)
    with pytest.raises(ValueError, match="truncated or corrupt"):
        PackedDataset.open(str(bad))
