"""Float-descriptor family: SIFT detector (cv2-backed) + L2/FLANN matchers."""
import numpy as np
import pytest

from visual_slam_tpu.frontend import BFMatcherL2, FlannMatcher, feature_factory

from test_features import textured_image


@pytest.fixture(scope="module")
def sift_feats(rng=None):
    rng = np.random.default_rng(8)
    try:
        det = feature_factory("sift", num_features=128)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cv2 SIFT unavailable: {e}")
    img = textured_image(rng, h=160, w=200)
    f1 = det.detectAndCompute(img)
    img2 = np.roll(img, 5, axis=1)
    f2 = det.detectAndCompute(img2)
    return f1, f2


def test_sift_detect_shapes(sift_feats):
    f1, _ = sift_feats
    assert f1.xy.shape == (128, 2)
    assert f1.desc.shape == (128, 128)  # 128 f32 bit-cast into uint32 block
    assert int(np.asarray(f1.valid).sum()) > 20


def test_l2_matcher_self_identity(sift_feats):
    f1, _ = sift_feats
    m = BFMatcherL2(ratio=0.9)
    res = m.match(f1, f1)
    ti = np.asarray(res["train_idx"])
    ok = np.asarray(res["valid"])
    v = np.asarray(f1.valid)
    assert ok[v].mean() > 0.9
    np.testing.assert_array_equal(ti[ok], np.nonzero(np.ones_like(ti))[0][ok])


def test_l2_matcher_shifted(sift_feats):
    f1, f2 = sift_feats
    res = FlannMatcher(ratio=0.8).match(f1, f2)
    ok = np.asarray(res["valid"])
    ti = np.asarray(res["train_idx"])
    assert ok.sum() > 10
    disp = np.asarray(f2.xy)[ti[ok]] - np.asarray(f1.xy)[ok]
    med = np.median(disp, axis=0)
    assert abs(med[0] - 5.0) < 1.5 and abs(med[1]) < 1.5
