import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.ops import fast as fast_ops
from visual_slam_tpu.ops import orb as orb_ops
from visual_slam_tpu.ops import detector as det_ops
from visual_slam_tpu.ops import matching as match_ops
from visual_slam_tpu.ops import pyramid as pyr_ops


def textured_image(rng, h=120, w=160, n_blobs=200):
    """Random blob field — plenty of corners, smooth enough for stable FAST."""
    img = np.full((h, w), 100.0, np.float32)
    ys = rng.integers(8, h - 14, n_blobs)
    xs = rng.integers(8, w - 14, n_blobs)
    for y, x in zip(ys, xs):
        sz = int(rng.integers(4, 9))
        val = float(rng.uniform(0, 255))
        img[y : y + sz, x : x + sz] = val
    return img


def test_fast_finds_square_corners():
    img = np.zeros((64, 64), np.float32)
    img[20:40, 20:40] = 200.0
    scores = np.asarray(fast_ops.fast_scores(jnp.asarray(img), 20.0))
    assert scores.max() > 0
    ys, xs = np.nonzero(scores)
    # all detections near the 4 square corners
    corners = np.array([[20, 20], [20, 39], [39, 20], [39, 39]])
    for y, x in zip(ys, xs):
        assert np.min(np.abs(corners - [y, x]).sum(1)) <= 4, (y, x)
    # and each corner region has a detection
    for cy, cx in corners:
        assert scores[cy - 3 : cy + 4, cx - 3 : cx + 4].max() > 0


def test_fast_against_opencv(rng):
    import cv2

    img = textured_image(rng)
    scores = np.asarray(fast_ops.nms(fast_ops.fast_scores(jnp.asarray(img), 20.0)))
    ours = np.stack(np.nonzero(scores), axis=1)  # (N, 2) y,x
    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = det.detect(img.astype(np.uint8))
    cv_pts = np.array([[kp.pt[1], kp.pt[0]] for kp in kps]) if kps else np.zeros((0, 2))
    assert len(cv_pts) > 10
    # Most OpenCV corners should have one of ours within 2px.
    interior = (cv_pts[:, 0] > 8) & (cv_pts[:, 0] < 112) & (cv_pts[:, 1] > 8) & (cv_pts[:, 1] < 152)
    cv_in = cv_pts[interior]
    d = np.abs(cv_in[:, None, :] - ours[None, :, :]).sum(-1).min(1)
    assert (d <= 2).mean() > 0.8


def test_nms_separation():
    rngl = np.random.default_rng(3)
    img = textured_image(rngl)
    s = np.asarray(fast_ops.nms(fast_ops.fast_scores(jnp.asarray(img), 15.0)))
    ys, xs = np.nonzero(s)
    pts = np.stack([ys, xs], 1)
    for i in range(len(pts)):
        d = np.abs(pts - pts[i]).max(1)
        assert (d == 0).sum() == 1 or d[d > 0].min() >= 1


def test_top_k_grid_shapes_and_validity(rng):
    img = textured_image(rng)
    s = fast_ops.nms(fast_ops.fast_scores(jnp.asarray(img), 20.0))
    yx, resp, valid = fast_ops.top_k_grid(s, 64, grid=4)
    assert yx.shape == (64, 2) and resp.shape == (64,) and valid.shape == (64,)
    yx, resp, valid = map(np.asarray, (yx, resp, valid))
    n = valid.sum()
    assert n > 10
    # valid entries have positive scores at the right location
    snp = np.asarray(s)
    for i in range(n):
        assert snp[yx[i, 0], yx[i, 1]] == resp[i]


def test_orientation_rotates():
    # Gradient patch: bright on +x side -> angle ~ 0; rotate 90deg -> ~pi/2.
    base = np.zeros((64, 64), np.float32)
    xx = np.arange(64) - 32.0
    base += xx[None, :] * 2.0 + 100.0
    yx = jnp.asarray([[32, 32]], jnp.int32)
    p = orb_ops.extract_patches(jnp.asarray(base), yx)
    a0 = float(orb_ops.orientations(p)[0])
    assert abs(a0) < 0.1
    p90 = orb_ops.extract_patches(jnp.asarray(base.T.copy()), yx)
    a90 = float(orb_ops.orientations(p90)[0])
    assert abs(abs(a90) - np.pi / 2) < 0.1


def test_descriptor_shift_invariance(rng):
    """Same physical points in a shifted image produce near-identical descriptors."""
    img = textured_image(rng, h=140, w=180)
    img = np.asarray(pyr_ops.gaussian_blur(jnp.asarray(img), 1.0, 2))
    dy, dx = 7, 11
    img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    yx1 = np.stack([rng.integers(30, 100, 40), rng.integers(30, 140, 40)], 1).astype(np.int32)
    yx2 = yx1 + np.array([dy, dx], np.int32)
    p1 = orb_ops.extract_patches(jnp.asarray(img), jnp.asarray(yx1))
    p2 = orb_ops.extract_patches(jnp.asarray(img2), jnp.asarray(yx2))
    a1 = orb_ops.orientations(p1)
    a2 = orb_ops.orientations(p2)
    samp = orb_ops.sampling_matrix()
    d1 = orb_ops.descriptors(p1, a1, samp)
    d2 = orb_ops.descriptors(p2, a2, samp)
    ham_same = np.asarray(
        match_ops.hamming_distance_matrix(d1, d2, jnp.ones(40, bool), jnp.ones(40, bool))
    )
    diag = np.diag(ham_same)
    off = ham_same[~np.eye(40, dtype=bool)]
    assert diag.mean() < 5
    assert off.mean() > 60


def test_hamming_matrix_matches_numpy(rng):
    d1 = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
    d2 = rng.integers(0, 2**32, (12, 8), dtype=np.uint32)
    ham = np.asarray(
        match_ops.hamming_distance_matrix(
            jnp.asarray(d1), jnp.asarray(d2), jnp.ones(16, bool), jnp.ones(12, bool)
        )
    )
    expect = np.zeros((16, 12))
    for i in range(16):
        for j in range(12):
            expect[i, j] = bin(int.from_bytes((d1[i] ^ d2[j]).tobytes(), "little")).count("1")
    np.testing.assert_array_equal(ham, expect)


def test_match_self_identity(rng):
    d = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
    res = match_ops.match_descriptors(
        jnp.asarray(d), jnp.asarray(d), jnp.ones(32, bool), jnp.ones(32, bool),
        ratio=0.9, cross_check=True,
    )
    ti = np.asarray(res["train_idx"])
    ok = np.asarray(res["valid"])
    assert ok.all()
    np.testing.assert_array_equal(ti, np.arange(32))
    np.testing.assert_array_equal(np.asarray(res["distance"]), 0)


def test_detect_and_describe_end_to_end(rng):
    img = textured_image(rng, h=128, w=160)
    feats = det_ops.detect_and_describe(
        jnp.asarray(img), num_features=128, threshold=15.0, n_levels=2, grid=4
    )
    assert feats.xy.shape == (128, 2)
    assert feats.desc.shape == (128, 8)
    v = np.asarray(feats.valid)
    assert v.sum() > 30
    xy = np.asarray(feats.xy)[v]
    assert (xy[:, 0] < 160).all() and (xy[:, 1] < 128).all()


def test_match_shifted_frames(rng):
    """Full front-end on an image pair differing by translation: matched
    displacement should recover the shift."""
    img = textured_image(rng, h=128, w=160)
    dy, dx = 4, 6
    img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    f1 = det_ops.detect_and_describe(jnp.asarray(img), num_features=128, threshold=15.0, n_levels=1, grid=4)
    f2 = det_ops.detect_and_describe(jnp.asarray(img2), num_features=128, threshold=15.0, n_levels=1, grid=4)
    res = match_ops.match_descriptors(
        f1.desc, f2.desc, f1.valid, f2.valid, f1.angle, f2.angle,
        ratio=0.8, cross_check=True,
    )
    ok = np.asarray(res["valid"])
    ti = np.asarray(res["train_idx"])
    assert ok.sum() > 20
    disp = np.asarray(f2.xy)[ti[ok]] - np.asarray(f1.xy)[ok]
    med = np.median(disp, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=1.0)


def test_shi_tomasi_finds_square_corners():
    """Min-eigenvalue response peaks at true 2D corners, not along edges."""
    img = np.full((96, 128), 100.0, np.float32)
    img[30:60, 40:80] = 220.0  # one bright square
    scores = np.asarray(fast_ops.shi_tomasi_scores(jnp.asarray(img), quality_level=0.2))
    peaks = np.argwhere(fast_ops.nms(jnp.asarray(scores)) > 0)
    assert len(peaks) >= 4
    corners = np.array([[30, 40], [30, 79], [59, 40], [59, 79]])
    for c in corners:
        d = np.linalg.norm(peaks - c, axis=1).min()
        assert d <= 3.0, (c, d)
    # edge midpoints must NOT fire (Shi-Tomasi rejects 1D structure)
    for e in [[30, 60], [59, 60], [45, 40], [45, 79]]:
        d = np.linalg.norm(peaks - np.array(e), axis=1).min()
        assert d > 4.0, e


def test_shi_tomasi_detector_matches_across_views(rng):
    """ShiTomasiOrbFeature2D end to end: detect + describe + match recovers
    image translation (same harness as the FAST variant)."""
    from visual_slam_tpu.frontend.features import ShiTomasiOrbFeature2D

    img = textured_image(rng, h=128, w=160)
    dy, dx = 4, 6
    img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    det = ShiTomasiOrbFeature2D(num_features=128, fast_threshold=20.0, n_levels=1, grid=4)
    assert det.fast_threshold == 0.01  # FAST-unit configs map to cv2 quality
    f1 = det.detectAndCompute(img)
    f2 = det.detectAndCompute(img2)
    assert int(f1.valid.sum()) > 60
    res = match_ops.match_descriptors(
        f1.desc, f2.desc, f1.valid, f2.valid, f1.angle, f2.angle,
        ratio=0.8, cross_check=True,
    )
    ok = np.asarray(res["valid"])
    ti = np.asarray(res["train_idx"])
    assert ok.sum() > 20
    disp = np.asarray(f2.xy)[ti[ok]] - np.asarray(f1.xy)[ok]
    np.testing.assert_allclose(np.median(disp, axis=0), [dx, dy], atol=1.0)


def test_descriptors_sorted_matches_dense():
    """The grouped-matmul (bin-sorted ragged_dot) descriptor path must
    produce the same descriptor per keypoint as the dense 30-bin matmul,
    with all fields permuted consistently."""
    import numpy as np
    import jax.numpy as jnp
    from visual_slam_tpu.ops import orb

    rng = np.random.default_rng(3)
    K = 64
    P = orb.PATCH
    patches = jnp.asarray(rng.uniform(0, 255, (K, P, P)).astype(np.float32))
    angles = jnp.asarray(rng.uniform(-np.pi, 3 * np.pi, K).astype(np.float32))
    dense = np.asarray(orb.descriptors(patches, angles, orb.sampling_matrix()))
    sorted_desc, order = orb.descriptors_sorted(
        patches, angles, orb.sampling_stack()
    )
    sorted_desc = np.asarray(sorted_desc)
    order = np.asarray(order)
    # Same multiset: descriptor i of the sorted output belongs to original
    # keypoint order[i].
    np.testing.assert_array_equal(sorted_desc, dense[order])
    # The permutation sorts by orientation bin.
    two_pi = 2 * np.pi
    bins = np.floor(np.mod(np.asarray(angles), two_pi) / two_pi * orb.N_BINS).astype(int) % orb.N_BINS
    assert (np.diff(bins[order]) >= 0).all()


def test_detector_ragged_descriptor_path():
    """detect_and_describe_with_sampling accepts the (N_BINS, P, 512) stack
    and must match the dense path: geometry fields exactly, descriptors up
    to rare near-tie bit flips (computed bin-sorted, then unsorted)."""
    import numpy as np
    import jax.numpy as jnp
    from visual_slam_tpu.ops import orb
    from visual_slam_tpu.ops.detector import detect_and_describe_with_sampling

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    kw = dict(num_features=64, threshold=10.0, n_levels=2, grid=4)
    f_dense = detect_and_describe_with_sampling(img, orb.sampling_matrix(), **kw)
    f_ragged = detect_and_describe_with_sampling(img, orb.sampling_stack(), **kw)
    # The ragged path unsorts descriptors back to detection order: all
    # geometry fields are bit-identical; descriptors match up to near-tie
    # BRIEF bits (same math, different accumulation order) — require >=99%
    # of bits equal and every non-descriptor field exact.
    for name in ("xy", "response", "angle", "octave", "size", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(f_ragged, name)), np.asarray(getattr(f_dense, name)),
            err_msg=name,
        )
    v = np.asarray(f_dense.valid)
    assert v.sum() > 10
    dx = np.asarray(f_dense.desc)[v] ^ np.asarray(f_ragged.desc)[v]
    bits_diff = np.unpackbits(dx.view(np.uint8)).sum()
    assert bits_diff <= 0.01 * v.sum() * 256, bits_diff
