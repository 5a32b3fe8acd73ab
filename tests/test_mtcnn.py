"""Native MTCNN cascade: net shapes, converter congruence, pipeline
mechanics, NMS/box math oracles.

Real pnet.pt/rnet.pt/onet.pt weights don't exist in this sandbox, so
detection QUALITY is not testable here; these tests pin everything else:
architectures accept facenet_pytorch-shaped state_dicts, the cascade runs
end-to-end, and the geometry helpers match hand-computed oracles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_recognition_models_tpu.detection.mtcnn import (
    MTCNN,
    ONet,
    PNet,
    RNet,
    _ceil_pool,
    _convert_net,
    _nms,
    _regress,
    _square,
)


def test_net_output_shapes():
    rng = jax.random.PRNGKey(0)
    p = PNet()
    v = p.init(rng, jnp.zeros((1, 12, 12, 3)))
    prob, reg = p.apply(v, jnp.zeros((2, 100, 80, 3)))
    # fully convolutional: out = (in - 12) // 2 + 1 per dim
    assert prob.shape == (2, 45, 35, 2) and reg.shape == (2, 45, 35, 4)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-5)

    r = RNet()
    v = r.init(rng, jnp.zeros((1, 24, 24, 3)))
    prob, reg = r.apply(v, jnp.zeros((3, 24, 24, 3)))
    assert prob.shape == (3, 2) and reg.shape == (3, 4)

    o = ONet()
    v = o.init(rng, jnp.zeros((1, 48, 48, 3)))
    prob, reg, lmk = o.apply(v, jnp.zeros((3, 48, 48, 3)))
    assert prob.shape == (3, 2) and reg.shape == (3, 4)
    assert lmk.shape == (3, 10)


def test_ceil_pool_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    for (h, w), (k, s) in [((11, 11), (2, 2)), ((11, 13), (3, 2)),
                           ((23, 23), (3, 2)), ((5, 5), (2, 2))]:
        x = rs.randn(1, h, w, 4).astype(np.float32)
        got = np.asarray(_ceil_pool(jnp.asarray(x), k, s))
        ref = torch.nn.functional.max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), k, s,
            ceil_mode=True).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_converter_congruence():
    """A facenet_pytorch-shaped state_dict converts into param trees the
    flax nets accept (key names, kernel transposes, dense layout)."""
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    pnet_sd = {"conv1.weight": t(10, 3, 3, 3), "conv1.bias": t(10),
               "prelu1.weight": t(10),
               "conv2.weight": t(16, 10, 3, 3), "conv2.bias": t(16),
               "prelu2.weight": t(16),
               "conv3.weight": t(32, 16, 3, 3), "conv3.bias": t(32),
               "prelu3.weight": t(32),
               "conv4_1.weight": t(2, 32, 1, 1), "conv4_1.bias": t(2),
               "conv4_2.weight": t(4, 32, 1, 1), "conv4_2.bias": t(4)}
    params = _convert_net(pnet_sd, ["conv1", "conv2", "conv3", "conv4_1",
                                    "conv4_2"], [])
    prob, reg = PNet().apply({"params": params}, jnp.zeros((1, 24, 24, 3)))
    assert prob.shape == (1, 7, 7, 2)

    rnet_sd = {"conv1.weight": t(28, 3, 3, 3), "conv1.bias": t(28),
               "prelu1.weight": t(28),
               "conv2.weight": t(48, 28, 3, 3), "conv2.bias": t(48),
               "prelu2.weight": t(48),
               "conv3.weight": t(64, 48, 2, 2), "conv3.bias": t(64),
               "prelu3.weight": t(64),
               "dense4.weight": t(128, 576), "dense4.bias": t(128),
               "prelu4.weight": t(128),
               "dense5_1.weight": t(2, 128), "dense5_1.bias": t(2),
               "dense5_2.weight": t(4, 128), "dense5_2.bias": t(4)}
    params = _convert_net(rnet_sd, ["conv1", "conv2", "conv3"],
                          ["dense4", "dense5_1", "dense5_2"])
    prob, reg = RNet().apply({"params": params}, jnp.zeros((2, 24, 24, 3)))
    assert prob.shape == (2, 2) and reg.shape == (2, 4)


def test_nms_oracle():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = _nms(boxes, scores, 0.5)
    # box 1 overlaps box 0 heavily -> suppressed; box 2 disjoint -> kept
    assert list(keep) == [0, 2]
    keep = _nms(boxes, scores, 0.95)
    assert list(keep) == [0, 1, 2]


def test_square_and_regress_oracles():
    boxes = np.array([[0.0, 0.0, 10.0, 20.0]], np.float32)
    sq = _square(boxes)
    # center preserved, side = max(w, h) = 20
    np.testing.assert_allclose(sq[0], [-5.0, 0.0, 15.0, 20.0])
    reg = np.array([[0.1, 0.1, -0.1, -0.1]], np.float32)
    out = _regress(boxes, reg)
    # offsets scale by (w+1, h+1)
    np.testing.assert_allclose(out[0], [1.1, 2.1, 8.9, 17.9])


def test_pipeline_runs_end_to_end_random_weights():
    """The full cascade executes on a real image array (random weights:
    detections are arbitrary or empty, but every stage must run)."""
    params = MTCNN.init_random()
    det = MTCNN(params, image_size=112)
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (160, 120, 3), np.uint8)
    boxes, probs, landmarks = det.detect(img)
    assert boxes.shape[1:] == (4,) if len(boxes) else True
    assert len(boxes) == len(probs) == len(landmarks)
    face = det.extract(img)
    assert face is None or (face.shape == (112, 112, 3)
                            and face.dtype == np.uint8)


def test_preprocess_fallback_is_loud(tmp_path, capsys):
    """Without weights, preprocess_dataset reports fallback=True and warns."""
    from PIL import Image

    from face_recognition_models_tpu.data.preprocess import preprocess_dataset

    src = tmp_path / "raw" / "id_0"
    src.mkdir(parents=True)
    Image.fromarray(np.zeros((64, 48, 3), np.uint8)).save(src / "a.jpg")
    stats = preprocess_dataset(str(tmp_path / "raw"), str(tmp_path / "out"))
    assert stats["fallback"] is True
    assert "NO face detection" in capsys.readouterr().out
    assert (tmp_path / "out" / "id_0" / "a.jpg").exists()
