"""Landmark alignment (detection/align.py): Umeyama similarity estimate
and template warp.

Oracles are independent of the implementation: exact recovery of known
transforms, a separately-derived constrained linear-least-squares solve,
and the production invariance property (aligned output is stable under
similarity transforms of the input photo)."""

import numpy as np
import pytest

from face_recognition_models_tpu.detection.align import (
    ARCFACE_TEMPLATE_112,
    WarpAligner,
    extract_aligned,
    norm_crop,
    template_for,
    umeyama,
    warp_affine,
)


def _similarity(scale, theta, tx, ty):
    c, s = np.cos(theta), np.sin(theta)
    m = np.array([[scale * c, -scale * s, tx],
                  [scale * s, scale * c, ty]], np.float64)
    return m


def _apply(m, pts):
    return pts @ m[:, :2].T + m[:, 2]


class TestUmeyama:
    def test_recovers_exact_similarity(self):
        rng = np.random.RandomState(0)
        src = ARCFACE_TEMPLATE_112.astype(np.float64)
        for _ in range(20):
            true = _similarity(scale=rng.uniform(0.3, 3.0),
                               theta=rng.uniform(-np.pi, np.pi),
                               tx=rng.uniform(-50, 50),
                               ty=rng.uniform(-50, 50))
            est = umeyama(src, _apply(true, src))
            np.testing.assert_allclose(est, true, atol=1e-9)

    def test_matches_linear_lstsq_oracle(self):
        # Independent derivation: a similarity transform is linear in
        # (a, b, tx, ty) with matrix [[a, -b], [b, a]]; the global L2
        # optimum solves one ordinary least-squares system. Umeyama must
        # agree whenever the optimum is a proper rotation.
        rng = np.random.RandomState(1)
        for _ in range(10):
            src = rng.uniform(0, 100, (7, 2))
            dst = _apply(_similarity(1.3, 0.4, 10, -5), src)
            dst += rng.normal(0, 2.0, dst.shape)  # noisy

            k = len(src)
            A = np.zeros((2 * k, 4))
            A[0::2, 0], A[0::2, 1], A[0::2, 2] = src[:, 0], -src[:, 1], 1
            A[1::2, 0], A[1::2, 1], A[1::2, 3] = src[:, 1], src[:, 0], 1
            b = dst.reshape(-1)
            a_, b_, tx, ty = np.linalg.lstsq(A, b, rcond=None)[0]
            oracle = np.array([[a_, -b_, tx], [b_, a_, ty]])

            np.testing.assert_allclose(umeyama(src, dst), oracle, atol=1e-8)

    def test_least_squares_optimality(self):
        rng = np.random.RandomState(2)
        src = ARCFACE_TEMPLATE_112.astype(np.float64)
        dst = _apply(_similarity(0.8, -0.3, 5, 7), src)
        dst += rng.normal(0, 3.0, dst.shape)
        est = umeyama(src, dst)
        resid = ((_apply(est, src) - dst) ** 2).sum()
        for _ in range(50):
            pert = est + rng.normal(0, 0.01, est.shape)
            # restrict perturbations to the similarity manifold
            a, b = pert[0, 0], pert[1, 0]
            pert[0, :2] = [a, -b]
            pert[1, :2] = [b, a]
            assert ((_apply(pert, src) - dst) ** 2).sum() >= resid - 1e-9

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            umeyama(np.zeros((5, 2)), np.zeros((4, 2)))
        with pytest.raises(ValueError):
            umeyama(np.zeros((5, 3)), np.zeros((5, 3)))


class TestWarp:
    def test_identity_map_is_exact(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (112, 112, 3)).astype(np.float32)
        out = warp_affine(img, np.array([[1.0, 0, 0], [0, 1.0, 0]]), 112)
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_pure_translation_shifts_pixels(self):
        img = np.zeros((32, 32, 3), np.float32)
        img[10, 12] = 255.0
        # forward map source->output shifts +3 in x, +5 in y
        out = warp_affine(img, np.array([[1.0, 0, 3.0], [0, 1.0, 5.0]]), 32)
        assert out[15, 15, 0] == pytest.approx(255.0, abs=1e-3)
        assert out[10, 12, 0] == pytest.approx(0.0, abs=1e-3)

    def test_out_of_bounds_is_zero(self):
        img = np.full((8, 8, 3), 200.0, np.float32)
        out = warp_affine(img, np.array([[1.0, 0, 100.0], [0, 1.0, 0]]), 8)
        np.testing.assert_allclose(out, 0.0)


class TestNormCrop:
    def test_landmarks_on_template_is_identity(self):
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (112, 112, 3), dtype=np.uint8)
        out = norm_crop(img, ARCFACE_TEMPLATE_112)
        assert out.dtype == np.uint8 and out.shape == (112, 112, 3)
        np.testing.assert_array_equal(out, img)

    def test_similarity_invariance(self):
        # THE production property: the aligned crop of a rotated/scaled/
        # shifted photo matches the aligned crop of the original, because
        # the estimated transform absorbs the difference.
        ys, xs = np.mgrid[0:160, 0:160].astype(np.float32)
        img = np.stack([
            100 + 80 * np.sin(xs / 17.0),
            100 + 80 * np.cos(ys / 23.0),
            100 + 60 * np.sin((xs + ys) / 29.0),
        ], axis=-1)

        lmk = template_for(112) * 0.9 + np.array([25.0, 30.0])
        s = _similarity(scale=1.15, theta=0.35, tx=8.0, ty=-4.0)
        img2 = warp_affine(img, s, 160)
        lmk2 = _apply(s, lmk)

        a = norm_crop(img, lmk).astype(np.float32)
        b = norm_crop(img2, lmk2).astype(np.float32)
        # compare only where neither crop touched a zero border (img2's
        # corners sample outside img): the pattern is >= 20 everywhere,
        # so exact zeros mark out-of-bounds samples.
        valid = (a.min(axis=-1) > 0) & (b.min(axis=-1) > 0)
        assert valid.mean() > 0.7  # the comparison is not vacuous
        diff = np.abs(a - b)[valid]
        assert diff.mean() < 2.0 and np.percentile(diff, 99) < 10.0

    def test_template_scales_with_image_size(self):
        t224 = template_for(224)
        np.testing.assert_allclose(t224, ARCFACE_TEMPLATE_112 * 2.0)
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (224, 224, 3), dtype=np.uint8)
        out = norm_crop(img, t224, image_size=224)
        np.testing.assert_array_equal(out, img)

    def test_landmark_shape_validation(self):
        with pytest.raises(ValueError):
            norm_crop(np.zeros((112, 112, 3)), np.zeros((4, 2)))


class _StubDetector:
    """Two faces; the higher-probability one carries landmarks centered
    on the bright region of the test image."""

    image_size = 112

    def __init__(self, boxes, probs, landmarks):
        self._out = (np.asarray(boxes, np.float32),
                     np.asarray(probs, np.float32),
                     np.asarray(landmarks, np.float32))
        self.calls = 0

    def detect(self, image):
        self.calls += 1
        return self._out

    def extract(self, image):  # box-crop path (not used by WarpAligner)
        raise AssertionError("WarpAligner must not call extract")


class TestExtractAligned:
    def test_picks_highest_probability_face(self):
        img = np.zeros((200, 200, 3), np.uint8)
        img[100:, :, :] = 230  # bottom half bright
        top = ARCFACE_TEMPLATE_112 * 0.5 + np.array([20.0, 10.0])
        bottom = ARCFACE_TEMPLATE_112 * 0.5 + np.array([20.0, 130.0])
        det = _StubDetector(boxes=[[0, 0, 90, 90], [0, 110, 90, 200]],
                            probs=[0.4, 0.9],
                            landmarks=[top, bottom])
        out = extract_aligned(det, img)
        assert out.shape == (112, 112, 3)
        assert out.mean() > 150  # aligned from the bright (best) face

    def test_none_when_no_faces(self):
        det = _StubDetector(np.zeros((0, 4)), np.zeros((0,)),
                            np.zeros((0, 5, 2)))
        assert extract_aligned(det, np.zeros((50, 50, 3))) is None

    def test_warp_aligner_proxy(self):
        lmk = ARCFACE_TEMPLATE_112 * 0.4 + 10.0
        det = _StubDetector([[0, 0, 60, 60]], [0.8], [lmk])
        proxy = WarpAligner(det, image_size=112)
        boxes, _, _ = proxy.detect(np.zeros((80, 80, 3)))
        assert det.calls == 1 and len(boxes) == 1
        out = proxy.extract(np.zeros((80, 80, 3), np.uint8))
        assert out.shape == (112, 112, 3)

    def test_build_detector_validates_mode(self):
        from face_recognition_models_tpu.data.preprocess import (
            build_detector)
        with pytest.raises(ValueError, match="align_mode"):
            build_detector(112, align_mode="bogus")


class TestDegenerateLandmarks:
    def test_umeyama_coincident_points_raise(self):
        from face_recognition_models_tpu.detection.align import (
            DegenerateLandmarksError)
        src = np.full((5, 2), 17.0)
        with pytest.raises(DegenerateLandmarksError):
            umeyama(src, template_for(112))

    def test_extract_aligned_degenerate_detection_returns_none(self):
        """A junk detection with collapsed landmarks is 'no usable face',
        not a NaN-filled warp or a crash."""
        from face_recognition_models_tpu.detection.align import (
            extract_aligned)

        class FakeDet:
            def detect(self, img):
                return (np.asarray([[0, 0, 10, 10]]), np.asarray([0.99]),
                        np.full((1, 5, 2), 5.0))

        img = np.zeros((64, 64, 3), np.uint8)
        assert extract_aligned(FakeDet(), img, 112) is None
