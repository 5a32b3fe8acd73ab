"""`face serve` — micro-batching embedding service (serving/server.py)."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from face_recognition_models_tpu.serving.server import (
    EmbedService,
    MicroBatcher,
    make_server,
)

IMG = 32


# --- MicroBatcher (no model: deterministic fake embed) ----------------------

def _fake_embed(images):
    """[B,S,S,3] u8 -> [B,4] f32: per-channel means + a constant."""
    b = images.shape[0]
    f = images.reshape(b, -1, 3).mean(axis=1)
    return np.concatenate([f, np.full((b, 1), 7.0)], axis=1)


def test_microbatcher_correct_and_coalesces():
    mb = MicroBatcher(_fake_embed, batch_size=4, max_wait_ms=200.0)
    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 256, (IMG, IMG, 3), dtype=np.uint8)
            for _ in range(8)]
    results = [None] * 8

    def work(i):
        results[i] = mb.submit(imgs[i])

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(8):
        np.testing.assert_allclose(results[i],
                                   _fake_embed(imgs[i][None])[0], rtol=1e-6)
    st = mb.stats()
    assert st["images"] == 8
    # 8 concurrent requests into batch_size-4 slots with a 200 ms window
    # must coalesce: strictly fewer batches than images
    assert st["batches"] < 8
    assert st["max_coalesced"] >= 2
    mb.close()


def test_microbatcher_error_propagates_and_recovers():
    calls = {"n": 0}

    def flaky(images):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return _fake_embed(images)

    mb = MicroBatcher(flaky, batch_size=2, max_wait_ms=1.0)
    img = np.zeros((IMG, IMG, 3), np.uint8)
    with pytest.raises(RuntimeError, match="boom"):
        mb.submit(img)
    # the worker survives a failed batch
    out = mb.submit(img)
    np.testing.assert_allclose(out, _fake_embed(img[None])[0])
    mb.close()


def test_microbatcher_rejects_bad_batch_size():
    with pytest.raises(ValueError, match="batch_size"):
        MicroBatcher(_fake_embed, batch_size=0)


# --- HTTP service over a real (random-weight) backbone ----------------------

@pytest.fixture(scope="module")
def served():
    import jax

    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.train.step import make_eval_step

    model = get_backbone("resnet18")
    dummy = np.zeros((1, IMG, IMG, 3), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           dummy, train=False)
    eval_step = jax.jit(make_eval_step(model))
    params, stats = variables["params"], variables.get("batch_stats", {})
    embed_fn = lambda im: eval_step(params, stats, im)

    service = EmbedService(embed_fn, IMG, batch_size=4, max_wait_ms=2.0)
    server = make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, service, embed_fn
    server.shutdown()
    service.close()


def _jpeg_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")  # PNG: lossless round trip
    return buf.getvalue()


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_http_embed_matches_direct(served):
    url, service, embed_fn = served
    rs = np.random.RandomState(1)
    img = rs.randint(0, 256, (IMG, IMG, 3), dtype=np.uint8)
    out = _post(url + "/embed", _jpeg_bytes(img))

    emb = np.asarray(out["embedding"], np.float32)
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-4  # L2-normalized
    assert 0.0 <= out["quality"] <= 1.0
    assert out["norm"] > 0
    # same math as a direct eval of the one image; tolerance covers the
    # bf16 tiling difference between a batch-1 and a padded batch-4 program
    direct = np.asarray(embed_fn(img[None]), np.float32)[0]
    direct = direct / np.linalg.norm(direct)
    np.testing.assert_allclose(emb, direct, atol=2e-3)
    assert float(emb @ direct) > 0.999999


def test_http_healthz_and_errors(served):
    url, service, _ = served
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["embed_dim"] == 512 and h["image_size"] == IMG

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/embed", b"not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/identify", _jpeg_bytes(
            np.zeros((IMG, IMG, 3), np.uint8)))
    assert e.value.code == 409  # no gallery loaded
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/nope", b"")
    assert e.value.code == 404
    # body bounds: empty body on a real route -> 400; huge declared
    # Content-Length -> 413 (never rfile.read(-1) / unbounded buffering)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/embed", b"")
    assert e.value.code == 400
    req = urllib.request.Request(url + "/embed", data=b"x",
                                 method="POST")
    req.add_header("Content-Length", str(1 << 40))
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 413
    # negative top_k must be rejected, not return the whole gallery
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/identify?top_k=-1", _jpeg_bytes(
            np.zeros((IMG, IMG, 3), np.uint8)))
    assert e.value.code in (400, 409)


def test_microbatcher_bad_shape_errors_batch_not_worker():
    """A mis-shaped submit must error its own waiters and leave the
    worker alive for subsequent well-formed requests (np.stack failures
    used to kill the thread and hang the service forever)."""
    from face_recognition_models_tpu.serving.server import MicroBatcher

    import threading

    mb = MicroBatcher(_fake_embed, batch_size=4, max_wait_ms=5.0)
    try:
        slots = [{"event": threading.Event(), "result": None,
                  "error": None} for _ in range(2)]
        # grayscale coalesced with a good image: np.stack raises inside
        # _flush; both waiters must get the error
        mb._flush([(np.zeros((7, 7), np.uint8), slots[0]),
                   (np.zeros((IMG, IMG, 3), np.uint8), slots[1])])
        for s in slots:
            assert s["event"].is_set() and s["error"] is not None
        # the worker thread is untouched; normal requests still serve
        out = mb.submit(np.zeros((IMG, IMG, 3), np.uint8), timeout=10)
        assert np.isfinite(out).all()
    finally:
        mb.close()


def test_http_identify_with_gallery(served, tmp_path):
    url, service, embed_fn = served
    rs = np.random.RandomState(2)
    imgs = rs.randint(0, 256, (3, IMG, IMG, 3), dtype=np.uint8)
    emb = np.array(embed_fn(np.concatenate(
        [imgs, np.zeros((1, IMG, IMG, 3), np.uint8)])), np.float32)[:3]
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    gal = tmp_path / "gallery.npz"
    np.savez(gal, embeddings=emb,
             paths=np.asarray([f"id{i}/img.png" for i in range(3)]))

    # a second service sharing the already-compiled embed_fn, with gallery
    svc = EmbedService(embed_fn, IMG, batch_size=4, max_wait_ms=1.0,
                       gallery_path=str(gal))
    srv = make_server(svc, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        u = f"http://127.0.0.1:{srv.server_address[1]}"
        out = _post(u + "/identify?top_k=2", _jpeg_bytes(imgs[1]))
        assert len(out["matches"]) == 2
        assert out["matches"][0]["path"] == "id1/img.png"
        assert out["matches"][0]["score"] > 0.99  # self-match, lossless PNG
        assert out["matches"][0]["score"] >= out["matches"][1]["score"]
    finally:
        srv.shutdown()
        svc.close()

    # dim-mismatched gallery is a loud startup error
    np.savez(tmp_path / "bad.npz", embeddings=np.zeros((2, 7), np.float32),
             paths=np.asarray(["a", "b"]))
    with pytest.raises(ValueError, match="dim"):
        EmbedService(embed_fn, IMG, batch_size=4,
                     gallery_path=str(tmp_path / "bad.npz"))


# --- detect + align serving path (serving/server.py detector wiring) --------

class _StubDetector:
    """Duck-typed detector (the build_detector contract,
    data/preprocess.py): extract = top-left IMGxIMG corner of the photo."""

    def __init__(self, find=True):
        self.find = find

    def detect(self, img):
        if not self.find:
            return (np.zeros((0, 4)), np.zeros((0,)), np.zeros((0, 5, 2)))
        return (np.asarray([[2.0, 3.0, 2.0 + IMG, 3.0 + IMG]]),
                np.asarray([0.97]),
                np.asarray([[[float(i), float(i + 1)] for i in range(5)]]))

    def extract(self, img):
        if not self.find:
            return None
        return np.asarray(img)[:IMG, :IMG]


def _served_with(embed_fn, detector):
    svc = EmbedService(embed_fn, IMG, batch_size=4, max_wait_ms=1.0,
                       detector=detector)
    srv = make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return svc, srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_http_detect_and_aligned_embed(served):
    _, _, embed_fn = served
    svc, srv, url = _served_with(embed_fn, _StubDetector(find=True))
    try:
        rs = np.random.RandomState(3)
        photo = rs.randint(0, 256, (2 * IMG, 2 * IMG, 3), dtype=np.uint8)

        det = _post(url + "/detect", _jpeg_bytes(photo))
        assert det["boxes"] == [[2.0, 3.0, 2.0 + IMG, 3.0 + IMG]]
        assert det["probs"] == [0.97]
        assert np.asarray(det["landmarks"]).shape == (1, 5, 2)

        out = _post(url + "/embed", _jpeg_bytes(photo))
        assert out["aligned"] is True
        direct = np.array(embed_fn(photo[None, :IMG, :IMG]),
                          np.float32)[0]
        direct /= np.linalg.norm(direct)
        np.testing.assert_allclose(np.asarray(out["embedding"], np.float32),
                                   direct, atol=2e-3)

        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["align"] is True
    finally:
        srv.shutdown()
        svc.close()


def test_align_no_face_falls_back_center_crop(served):
    _, _, embed_fn = served
    svc, srv, url = _served_with(embed_fn, _StubDetector(find=False))
    try:
        rs = np.random.RandomState(4)
        photo = rs.randint(0, 256, (3 * IMG, 2 * IMG, 3), dtype=np.uint8)
        out = _post(url + "/embed", _jpeg_bytes(photo))
        assert out["aligned"] is False
        # the documented fallback: center square crop, resized to IMG
        from PIL import Image
        s = 2 * IMG
        crop = photo[(3 * IMG - s) // 2:(3 * IMG + s) // 2, :s]
        crop = np.asarray(Image.fromarray(crop).resize((IMG, IMG)),
                          np.uint8)
        direct = np.array(embed_fn(crop[None]), np.float32)[0]
        direct /= np.linalg.norm(direct)
        np.testing.assert_allclose(np.asarray(out["embedding"], np.float32),
                                   direct, atol=2e-3)
    finally:
        srv.shutdown()
        svc.close()


def test_detect_without_detector_409_and_no_aligned_key(served):
    url, service, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/detect", _jpeg_bytes(np.zeros((IMG, IMG, 3),
                                                    np.uint8)))
    assert e.value.code == 409
    out = _post(url + "/embed", _jpeg_bytes(np.zeros((IMG, IMG, 3),
                                                     np.uint8)))
    assert "aligned" not in out  # pre-aligned mode: no alignment claim


def test_chunked_transfer_encoding_rejected_explicitly(served):
    """A chunked POST must get a clear 411 (we never read chunked bodies),
    not a misleading Content-Length complaint."""
    import socket
    url, _, _ = served
    host, port = url.replace("http://", "").split(":")
    with socket.create_connection((host, int(port)), timeout=30) as s:
        s.sendall(b"POST /embed HTTP/1.1\r\n"
                  b"Host: test\r\n"
                  b"Transfer-Encoding: chunked\r\n\r\n"
                  b"4\r\nabcd\r\n0\r\n\r\n")
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = s.recv(4096)
            if not chunk:
                break
            resp += chunk
        # drain whatever body arrived with/after the headers
        try:
            s.settimeout(2.0)
            while True:
                chunk = s.recv(4096)
                if not chunk:
                    break
                resp += chunk
        except socket.timeout:
            pass
    text = resp.decode("utf-8", "replace")
    assert " 411 " in text.splitlines()[0]
    assert "chunked" in text
