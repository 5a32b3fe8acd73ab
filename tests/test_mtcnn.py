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


@pytest.mark.slow
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


@pytest.mark.slow
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


class _DetectFaceOracle:
    """Independent numpy re-derivation of facenet_pytorch's detect_face
    control flow (the algorithm the reference's preprocess.py:19-37 runs):
    image pyramid (factor scaling until min side < 12), P-Net box decode at
    stride 2 / cell 12 with +1/+12 offsets and rounding, per-scale NMS 0.5
    (union) then cross-scale NMS 0.7, box regression scaled by (w+1, h+1),
    square-ify around centers, rounded zero-padded crops, R-Net threshold +
    NMS 0.7 + regress + square, O-Net threshold + landmarks relative to the
    PRE-regression box + regress + NMS 0.7 (min mode).

    The three CNNs are called as black-box score functions (their op-level
    torch congruence is pinned above); everything else is written from the
    algorithm, deliberately NOT by calling the production helpers, so a
    composition bug in detection/mtcnn.py cannot cancel out here.
    """

    def __init__(self, det):
        self.det = det

    @staticmethod
    def _iou_matrix(ref_box, boxes, mode):
        lo = np.maximum(ref_box[:2], boxes[:, :2])
        hi = np.minimum(ref_box[2:4], boxes[:, 2:4])
        wh = np.maximum(0.0, hi - lo + 1.0)
        inter = wh[:, 0] * wh[:, 1]
        area = lambda b: (b[..., 2] - b[..., 0] + 1) * \
            (b[..., 3] - b[..., 1] + 1)
        if mode == "min":
            return inter / np.minimum(area(ref_box), area(boxes))
        return inter / (area(ref_box) + area(boxes) - inter)

    def _nms(self, dets, scores, thresh, mode="union"):
        alive = list(np.argsort(-scores, kind="stable"))
        keep = []
        while alive:
            best = alive.pop(0)
            keep.append(best)
            if not alive:
                break
            rest = np.asarray(alive)
            iou = self._iou_matrix(dets[best], dets[rest], mode)
            alive = [i for i, v in zip(rest, iou) if v <= thresh]
        return np.asarray(keep, np.int64)

    @staticmethod
    def _apply_reg(boxes, reg):
        dims = np.stack([boxes[:, 2] - boxes[:, 0] + 1,
                         boxes[:, 3] - boxes[:, 1] + 1], axis=1)
        return boxes[:, :4] + reg * np.tile(dims, 2)

    @staticmethod
    def _rerec(boxes):
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        half = np.maximum(boxes[:, 2] - boxes[:, 0],
                          boxes[:, 3] - boxes[:, 1]) / 2
        return np.stack([cx - half, cy - half, cx + half, cy + half], axis=1)

    @staticmethod
    def _crops(img, boxes, size):
        h, w = img.shape[:2]
        out = []
        for box in boxes:
            x1, y1 = int(round(box[0])), int(round(box[1]))
            x2, y2 = int(round(box[2])) + 1, int(round(box[3])) + 1
            patch = np.zeros((y2 - y1, x2 - x1, 3), np.float32)
            cy1, cy2 = max(0, y1), min(h, y2)
            cx1, cx2 = max(0, x1), min(w, x2)
            if cy2 > cy1 and cx2 > cx1:
                patch[cy1 - y1:cy2 - y1, cx1 - x1:cx2 - x1] = \
                    img[cy1:cy2, cx1:cx2]
            out.append(np.asarray(jax.image.resize(
                jnp.asarray(patch), (size, size, 3), "bilinear")))
        return (np.stack(out).astype(np.float32) - 127.5) * 0.0078125

    def __call__(self, image):
        det = self.det
        img = np.asarray(image, np.float32)
        h, w = img.shape[:2]
        norm = (img - 127.5) * 0.0078125
        t0, t1, t2 = det.thresholds
        empty = (np.zeros((0, 4)), np.zeros((0,)), np.zeros((0, 5, 2)))

        scale = 12.0 / det.min_face_size
        stage1 = []
        while min(h, w) * scale >= 12.0:
            sh, sw = int(np.ceil(h * scale)), int(np.ceil(w * scale))
            scaled = np.asarray(jax.image.resize(
                jnp.asarray(norm), (sh, sw, 3), "bilinear"))
            prob, reg = det._pnet(det.params["pnet"], scaled[None])
            prob, reg = np.asarray(prob)[0, :, :, 1], np.asarray(reg)[0]
            ys, xs = np.nonzero(prob >= t0)
            if len(ys):
                cand = np.zeros((len(ys), 9), np.float32)
                cand[:, 0] = np.round((2 * xs + 1) / scale)
                cand[:, 1] = np.round((2 * ys + 1) / scale)
                cand[:, 2] = np.round((2 * xs + 12) / scale)
                cand[:, 3] = np.round((2 * ys + 12) / scale)
                cand[:, 4] = prob[ys, xs]
                cand[:, 5:] = reg[ys, xs]
                keep = self._nms(cand[:, :4], cand[:, 4], 0.5)
                stage1.append(cand[keep])
            scale *= det.factor
        if not stage1:
            return empty
        cand = np.concatenate(stage1)
        cand = cand[self._nms(cand[:, :4], cand[:, 4], 0.7)]
        boxes = self._rerec(self._apply_reg(cand[:, :4], cand[:, 5:]))

        prob, reg = det._rnet(det.params["rnet"],
                              jnp.asarray(self._crops(img, boxes, 24)))
        prob, reg = np.asarray(prob)[:, 1], np.asarray(reg)
        mask = prob >= t1
        if not mask.any():
            return empty
        boxes, prob, reg = boxes[mask], prob[mask], reg[mask]
        keep = self._nms(boxes, prob, 0.7)
        boxes = self._rerec(self._apply_reg(boxes[keep], reg[keep]))
        prob = prob[keep]

        oprob, reg, lmk = det._onet(det.params["onet"],
                                    jnp.asarray(self._crops(img, boxes, 48)))
        oprob = np.asarray(oprob)[:, 1]
        reg, lmk = np.asarray(reg), np.asarray(lmk)
        mask = oprob >= t2
        if not mask.any():
            return empty
        boxes, oprob = boxes[mask], oprob[mask]
        reg, lmk = reg[mask], lmk[mask]
        bw = boxes[:, 2] - boxes[:, 0] + 1
        bh = boxes[:, 3] - boxes[:, 1] + 1
        pts = np.stack([boxes[:, 0, None] + lmk[:, :5] * bw[:, None],
                        boxes[:, 1, None] + lmk[:, 5:] * bh[:, None]],
                       axis=2)
        boxes = self._apply_reg(boxes, reg)
        keep = self._nms(boxes, oprob, 0.7, mode="min")
        return boxes[keep], oprob[keep], pts[keep]


@pytest.mark.slow
@pytest.mark.parametrize("seed,shape,thresholds", [
    (0, (160, 120), (0.35, 0.25, 0.25)),
    (1, (96, 144), (0.45, 0.3, 0.3)),
    (2, (128, 128), (0.35, 0.99, 0.99)),  # R/O gates kill everything
])
def test_detect_pipeline_matches_numpy_oracle(seed, shape, thresholds):
    """Composed-pipeline oracle (SURVEY preprocess.py:19-37): the cascade's
    final boxes/probs/landmarks must equal an independently-written numpy
    detect_face on shared random weights. Low thresholds keep candidates
    flowing through all three stages so every pipeline branch is compared;
    the high-threshold case pins the empty-return contract."""
    params = MTCNN.init_random(jax.random.PRNGKey(seed))
    det = MTCNN(params, image_size=112, thresholds=thresholds)
    rs = np.random.RandomState(seed)
    img = rs.randint(0, 256, shape + (3,), np.uint8)

    got_boxes, got_probs, got_lmk = det.detect(img)
    exp_boxes, exp_probs, exp_lmk = _DetectFaceOracle(det)(img)

    assert got_boxes.shape == exp_boxes.shape, \
        f"box count: got {got_boxes.shape} vs oracle {exp_boxes.shape}"
    np.testing.assert_allclose(got_boxes, exp_boxes, atol=1e-3,
                               err_msg="final boxes")
    np.testing.assert_allclose(got_probs, exp_probs, atol=1e-5)
    np.testing.assert_allclose(got_lmk, exp_lmk, atol=1e-3)
    if thresholds[1] > 0.9:
        assert len(got_boxes) == 0


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
