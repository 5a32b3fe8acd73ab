"""RecordIO (.rec/.idx) and .bin benchmark interop.

The insightface ecosystem ships training sets as MXNet RecordIO pairs and
verification benchmarks as pickled .bin files; the reference consumes only
their unpacked folder forms (dataset.py:93-119, 258-360). These tests pin
the native parsers (data/recordio.py, data/pairs.load_bin) against
format-law oracles and the folder-path loaders.
"""

import os

import numpy as np
import pytest

from face_recognition_models_tpu.data.pairs import (
    bin_path,
    load_bin,
    save_bin,
)
from face_recognition_models_tpu.data.pipeline import ArrayLoader
from face_recognition_models_tpu.data.recordio import (
    RecLoader,
    RecordIODataset,
    is_recordio,
    read_idx,
    read_record,
    resolve_prefix,
    write_recordio,
)


def _jpeg_bytes(arr, quality=95):
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _synthetic_rec(tmp_path, n_ident=5, per_ident=4, size=24, seed=0,
                   insightface_layout=True, name="train"):
    rng = np.random.RandomState(seed)
    # flat gray images survive JPEG encode within +-2, so decoded batches
    # can be matched back to their source labels
    labels = np.repeat(np.arange(n_ident), per_ident)
    images = np.stack([
        np.full((size, size, 3), 20 + 10 * int(l), np.uint8)
        for l in labels])
    # shuffle write order: the insightface writer must group by identity
    perm = rng.permutation(len(labels))
    payloads = [_jpeg_bytes(images[i]) for i in perm]
    prefix = str(tmp_path / name)
    write_recordio(prefix, payloads, labels[perm],
                   insightface_layout=insightface_layout)
    return prefix, images, labels


def test_write_read_roundtrip_record_level(tmp_path):
    prefix, images, labels = _synthetic_rec(tmp_path)
    idx = read_idx(prefix + ".idx")
    with open(prefix + ".rec", "rb") as f:
        buf = f.read()
    # key 0 meta record: label = (ident_start, ident_end)
    lab0, payload0 = read_record(buf, idx[0])
    n = len(labels)
    assert payload0 == b""
    assert int(lab0[0]) == n + 1  # images occupy keys 1..n
    assert int(lab0[1]) == n + 1 + 5  # five identity records
    # every image record decodes back to its flat-gray source
    from PIL import Image
    import io
    for key in range(1, n + 1):
        lab, payload = read_record(buf, idx[key])
        with Image.open(io.BytesIO(payload)) as im:
            arr = np.asarray(im.convert("RGB"))
        expect = 20 + 10 * int(lab[0])
        assert abs(int(arr.mean()) - expect) <= 2
    # identity records carry contiguous, complete key ranges
    spans = []
    for key in range(n + 1, n + 6):
        lab, _ = read_record(buf, idx[key])
        spans.append((int(lab[0]), int(lab[1])))
    assert spans[0][0] == 1 and spans[-1][1] == n + 1
    assert all(spans[i][1] == spans[i + 1][0] for i in range(4))


@pytest.mark.parametrize("layout", [True, False])
def test_dataset_open_labels_and_count(tmp_path, layout):
    prefix, images, labels = _synthetic_rec(tmp_path,
                                            insightface_layout=layout)
    ds = RecordIODataset.open(prefix)
    assert len(ds) == len(labels)
    assert ds.num_identities == 5
    assert sorted(np.asarray(ds.labels).tolist()) == sorted(labels.tolist())


def test_resolve_prefix_forms(tmp_path):
    prefix, _, _ = _synthetic_rec(tmp_path)
    for p in (prefix, prefix + ".rec", prefix + ".idx", str(tmp_path)):
        assert resolve_prefix(p) == prefix, p
        assert is_recordio(p)
    assert resolve_prefix(str(tmp_path / "nope")) is None


def test_recloader_matches_folder_loader_law(tmp_path):
    """RecLoader must follow the Loader contract: static uint8 batches,
    (seed, epoch)-deterministic order, labels consistent with pixels."""
    prefix, images, labels = _synthetic_rec(tmp_path, n_ident=4,
                                            per_ident=5, size=16)
    ds = RecordIODataset.open(prefix)
    loader = RecLoader(ds, batch_size=4, image_size=16, seed=3,
                       num_workers=2)
    assert loader.steps_per_epoch() == 5
    seen = 0
    for imgs, labs in loader.epoch(1):
        assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.uint8
        assert labs.dtype == np.int32
        for img, lab in zip(imgs, labs):
            assert abs(int(img.mean()) - (20 + 10 * int(lab))) <= 2
        seen += len(labs)
    assert seen == 20
    # determinism: same (seed, epoch) -> identical batches
    a = [l.copy() for _, l in RecLoader(ds, 4, image_size=16,
                                        seed=3).epoch(1)]
    b = [l.copy() for _, l in RecLoader(ds, 4, image_size=16,
                                        seed=3).epoch(1)]
    assert all((x == y).all() for x, y in zip(a, b))
    # different epoch -> different order (20 samples, overwhelmingly)
    c = [l.copy() for _, l in RecLoader(ds, 4, image_size=16,
                                        seed=3).epoch(2)]
    assert not all((x == y).all() for x, y in zip(a, c))


def test_recloader_shard_partition(tmp_path):
    """shard=(r, k) slices one agreed global order, disjoint + complete —
    the multi-host law the folder Loader follows (data/pipeline.py)."""
    prefix, _, labels = _synthetic_rec(tmp_path, n_ident=3, per_ident=8,
                                       size=16)
    ds = RecordIODataset.open(prefix)
    full = RecLoader(ds, batch_size=24, image_size=16, seed=7,
                     drop_remainder=False)
    (all_imgs, all_labs), = list(full.epoch(0))
    parts = []
    for r in range(2):
        sh = RecLoader(ds, batch_size=12, image_size=16, seed=7,
                       drop_remainder=False, shard=(r, 2))
        for imgs, labs in sh.epoch(0):
            parts.append((imgs, labs))
    got = np.concatenate([p[1] for p in parts])
    assert sorted(got.tolist()) == sorted(all_labs.tolist())
    # rank 0 takes order[0::2] of the same global order
    sh0 = np.concatenate([l for _, l in RecLoader(
        ds, 12, image_size=16, seed=7, drop_remainder=False,
        shard=(0, 2)).epoch(0)])
    assert (sh0 == all_labs[0::2]).all()


def test_recloader_uneven_shards_agree_on_steps(tmp_path):
    """When len(dataset) doesn't divide the shard count, every rank must
    still report the SAME steps_per_epoch and yield the SAME batch sizes
    — a rank dispatching one extra step would deadlock the multihost
    global-batch assembly at the epoch tail."""
    prefix, _, _ = _synthetic_rec(tmp_path, n_ident=5, per_ident=5,
                                  size=16)  # 25 items, 2 ranks -> 13/12
    ds = RecordIODataset.open(prefix)
    for drop in (True, False):
        loaders = [RecLoader(ds, batch_size=4, image_size=16, seed=7,
                             drop_remainder=drop, shard=(r, 2))
                   for r in range(2)]
        steps = {ld.steps_per_epoch() for ld in loaders}
        assert len(steps) == 1, f"ranks disagree on steps: {steps}"
        shapes = [[labs.shape for _, labs in ld.epoch(0)]
                  for ld in loaders]
        assert shapes[0] == shapes[1]
        assert len(shapes[0]) == steps.pop()


def test_recloader_producer_error_surfaces(tmp_path):
    """A decode-path exception in the producer thread must propagate to
    the consumer as an exception, not leave it blocked on q.get()."""
    prefix, _, _ = _synthetic_rec(tmp_path, n_ident=3, per_ident=4,
                                  size=16)
    ds = RecordIODataset.open(prefix)
    loader = RecLoader(ds, batch_size=4, image_size=16, seed=0)

    def boom(*a, **kw):
        raise ValueError("bad RecordIO magic (synthetic)")

    loader._load_batch = boom
    with pytest.raises(ValueError, match="bad RecordIO magic"):
        list(loader.epoch(0))


def test_recloader_corrupt_record_resampled(tmp_path):
    """A truncated JPEG payload must be resampled, not dropped (static
    batch shapes; reference drops via collate, model_utils.py:140-144)."""
    labels = np.repeat(np.arange(2), 4)
    images = np.stack([np.full((16, 16, 3), 30 + 40 * int(l), np.uint8)
                       for l in labels])
    payloads = [_jpeg_bytes(im) for im in images]
    payloads[3] = payloads[3][:10]  # corrupt one record
    prefix = str(tmp_path / "train")
    write_recordio(prefix, payloads, labels)
    ds = RecordIODataset.open(prefix)
    loader = RecLoader(ds, batch_size=8, image_size=16, shuffle=False,
                       seed=0, num_workers=1)
    (imgs, labs), = list(loader.epoch(0))
    assert imgs.shape == (8, 16, 16, 3)
    assert loader.skipped_images >= 1
    # every surviving row is a valid decode of SOME sample
    for img, lab in zip(imgs, labs):
        assert abs(int(img.mean()) - (30 + 40 * int(lab))) <= 2


def test_pack_from_recordio_matches_arrayloader(tmp_path):
    """`face pack` from a .rec produces the same packed contents as the
    in-memory arrays that built it (label-wise; pixels within JPEG error).
    """
    from face_recognition_models_tpu.data.packed import (
        PackedDataset, pack_from_loader)
    prefix, images, labels = _synthetic_rec(tmp_path, n_ident=3,
                                            per_ident=4, size=16)
    ds = RecordIODataset.open(prefix)
    loader = RecLoader(ds, batch_size=5, image_size=16, shuffle=False,
                       drop_remainder=False, num_workers=1)
    out = str(tmp_path / "pack")
    meta = pack_from_loader(loader, ds.identities, out, 16)
    assert meta["num_samples"] == 12
    packed = PackedDataset.open(out)
    ref = ArrayLoader(images, labels, batch_size=12, shuffle=False)
    (ref_imgs, ref_labs), = list(ref.epoch(0))
    # same multiset of labels; per-row pixel/label consistency
    assert (sorted(np.asarray(packed.labels).tolist())
            == sorted(ref_labs.tolist()))
    for row in range(12):
        img = packed.images[row]
        lab = int(packed.labels[row])
        assert abs(int(np.asarray(img).mean()) - (20 + 10 * lab)) <= 2


# ---------------------------------------------------------------------------
# .bin verification benchmarks
# ---------------------------------------------------------------------------

def test_bin_roundtrip_and_eval_path(tmp_path):
    rng = np.random.RandomState(0)
    n_pairs = 6
    images = np.stack([
        np.full((20, 20, 3), 15 * (i + 1), np.uint8)
        for i in range(2 * n_pairs)])
    issame = np.asarray([1, 0, 1, 1, 0, 0])
    path = str(tmp_path / "lfw.bin")
    save_bin(path, images, issame)

    got, pairs = load_bin(path, image_size=20)
    assert got.shape == (12, 20, 20, 3)
    assert (pairs[:, 0] == np.arange(0, 12, 2)).all()
    assert (pairs[:, 1] == np.arange(1, 12, 2)).all()
    assert (pairs[:, 2] == issame).all()
    assert np.abs(got.astype(int) - images.astype(int)).max() <= 3

    # resolution: bin_path finds <root>/<bench>.bin and explicit paths
    assert bin_path(str(tmp_path), "lfw") == path
    assert bin_path(str(tmp_path), "lfw.bin") == path
    assert bin_path(str(tmp_path), "agedb_30") is None

    # load_benchmark serves the .bin through the shared eval entry
    from face_recognition_models_tpu.evaluation.batch_eval import (
        load_benchmark)
    p2, stack, id_to_row = load_benchmark(str(tmp_path), "lfw",
                                          image_size=20)
    assert (p2 == pairs).all() and stack.shape == (12, 20, 20, 3)
    assert id_to_row[5] == 5


def test_bin_resize_and_decoded_array_entries(tmp_path):
    """load_bin resizes to the requested size and accepts already-decoded
    uint8 array entries (repacked bins)."""
    import pickle
    images = np.stack([np.full((20, 20, 3), 60, np.uint8)
                       for _ in range(4)])
    arrays = [images[0], _jpeg_bytes(images[1]), images[2],
              _jpeg_bytes(images[3])]
    path = str(tmp_path / "mix.bin")
    with open(path, "wb") as f:
        pickle.dump((arrays, [True, False]), f)
    got, pairs = load_bin(path, image_size=16)
    assert got.shape == (4, 16, 16, 3)
    assert np.abs(got.astype(int) - 60).max() <= 3
    assert (pairs[:, 2] == np.asarray([1, 0])).all()


def test_benchmark_dir_layout_still_wins(tmp_path):
    """When both forms exist the unpacked directory layout is used."""
    from face_recognition_models_tpu.evaluation.batch_eval import (
        load_benchmark)
    bench = tmp_path / "lfw"
    (bench / "imgs").mkdir(parents=True)
    from PIL import Image
    for i in range(4):
        Image.fromarray(np.full((16, 16, 3), 40 + i, np.uint8)).save(
            bench / "imgs" / f"{i}.jpg", quality=98)
    (bench / "pair.list").write_text("0 1 1\n2 3 0\n")
    # a conflicting .bin with DIFFERENT pixel content
    save_bin(str(tmp_path / "lfw.bin"),
             np.full((4, 16, 16, 3), 200, np.uint8),
             np.asarray([1, 0]))
    pairs, stack, id_to_row = load_benchmark(str(tmp_path), "lfw",
                                             image_size=16)
    assert int(stack.mean()) < 100  # the directory copy, not the bin
    assert len(pairs) == 2 and len(id_to_row) == 4


def test_native_and_pil_backends_agree(tmp_path):
    """The C++ mem decoder and PIL produce the same pixels off the same
    .rec (same bilinear target; JPEG decode itself is bit-exact across
    libjpeg/PIL for baseline files at native size)."""
    from face_recognition_models_tpu.native import is_available
    if not is_available():
        pytest.skip("native decoder unavailable")
    prefix, images, labels = _synthetic_rec(tmp_path, n_ident=3,
                                            per_ident=4, size=16)
    ds = RecordIODataset.open(prefix)
    a = RecLoader(ds, batch_size=12, image_size=16, shuffle=False,
                  drop_remainder=False, backend="native")
    b = RecLoader(ds, batch_size=12, image_size=16, shuffle=False,
                  drop_remainder=False, backend="pil")
    (ia, la), = list(a.epoch(0))
    (ib, lb), = list(b.epoch(0))
    assert (la == lb).all()
    np.testing.assert_array_equal(ia, ib)


def test_decode_batch_mem_guards():
    from face_recognition_models_tpu.native import (
        decode_batch_mem, is_available)
    if not is_available():
        pytest.skip("native decoder unavailable")
    blob = np.zeros((100,), np.uint8)
    with pytest.raises(ValueError, match="beyond blob end"):
        decode_batch_mem(blob, np.asarray([90]), np.asarray([20]), 8)
    with pytest.raises(ValueError, match="negative"):
        decode_batch_mem(blob, np.asarray([-1]), np.asarray([5]), 8)
    # zero-length and garbage ranges fail per-slot, not fatally
    imgs, status = decode_batch_mem(blob, np.asarray([0, 10]),
                                    np.asarray([0, 50]), 8)
    assert (status != 0).all()


def test_pk_rec_loader_streams_pk_batches(tmp_path):
    """PKRecLoader (the triplet path's RecordIO source): every batch is
    exactly P identities x K images decoded off the .rec mmap, with the
    PKBatchSampler's deterministic per-epoch reshuffle."""
    from face_recognition_models_tpu.data.recordio import PKRecLoader

    prefix, images, labels = _synthetic_rec(tmp_path, n_ident=6,
                                            per_ident=4, size=24)
    ds = RecordIODataset.open(prefix)
    p, k = 3, 2
    loader = PKRecLoader(ds, p, k, image_size=24, seed=0, num_workers=2)

    assert loader.steps_per_epoch() == 6 // p
    seen = 0
    for bimages, blabels in loader.epoch(0):
        assert bimages.shape == (p * k, 24, 24, 3)
        uniq, counts = np.unique(blabels, return_counts=True)
        assert len(uniq) == p and (counts == k).all()
        # flat-gray construction: decoded pixel level identifies the label
        lv = bimages[:, 0, 0, 0].astype(np.int32)
        np.testing.assert_allclose(lv, 20 + 10 * blabels, atol=3)
        seen += 1
    assert seen == loader.steps_per_epoch()

    first = [b[1].tolist() for b in loader.epoch(1)]
    again = [b[1].tolist() for b in loader.epoch(1)]
    assert first == again
