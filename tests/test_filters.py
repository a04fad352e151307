"""Keypoint filters + match-filter dispatcher parity tests."""
import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.ops.detector import Features
from visual_slam_tpu.ops.keypoint_filters import (
    filter_keypoints,
    filter_keypoints_grid,
    filter_keypoints_nms,
)
from visual_slam_tpu.ops import matching as m_ops


def _feats(rng, K=64, w=160, h=120):
    return Features(
        xy=jnp.asarray(rng.uniform(0, [w, h], (K, 2)), jnp.float32),
        response=jnp.asarray(rng.uniform(1, 100, K), jnp.float32),
        angle=jnp.asarray(rng.uniform(-np.pi, np.pi, K), jnp.float32),
        octave=jnp.zeros(K, jnp.int32),
        size=jnp.full((K,), 31.0, jnp.float32),
        desc=jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32)),
        valid=jnp.ones(K, bool),
    )


def test_grid_filter_caps_cells(rng):
    f = _feats(rng, K=128)
    out = filter_keypoints_grid(f, 160, 120, grid=2, per_cell=5)
    xy = np.asarray(out.xy)[np.asarray(out.valid)]
    cx = (xy[:, 0] / 160 * 2).astype(int).clip(0, 1)
    cy = (xy[:, 1] / 120 * 2).astype(int).clip(0, 1)
    counts = np.zeros((2, 2), int)
    np.add.at(counts, (cy, cx), 1)
    assert counts.max() <= 5


def test_nms_filter_separates(rng):
    f = _feats(rng, K=96)
    out = filter_keypoints_nms(f, radius=10.0)
    xy = np.asarray(out.xy)[np.asarray(out.valid)]
    for i in range(len(xy)):
        d = np.linalg.norm(xy - xy[i], axis=1)
        assert (d[d > 0] >= 10.0 - 1e-3).all() or len(xy) == 1


def test_dispatcher_runs_without_logger(rng):
    f = _feats(rng)
    out = filter_keypoints(f, 160, 120, use_grid=True, use_nms=True, logger=None)
    assert int(np.asarray(out.valid).sum()) >= 1


def test_stereo_filter(rng):
    K = 32
    xy1 = rng.uniform(50, 100, (K, 2)).astype(np.float32)
    xy2 = xy1.copy()
    xy2[:, 0] -= 5.0  # disparity 5
    xy2[10] += [0, 8.0]  # row violation
    xy2[11, 0] = xy1[11, 0] + 3  # negative disparity
    ti = jnp.arange(K)
    ok = jnp.ones(K, bool)
    out = np.asarray(
        m_ops.stereo_epipolar_filter(jnp.asarray(xy1), jnp.asarray(xy2), ti, ok, row_tolerance=2.0)
    )
    assert not out[10] and not out[11]
    assert out.sum() == K - 2


def test_region_mask_filter(rng):
    K = 20
    xy = rng.uniform(0, 100, (K, 2)).astype(np.float32)
    xy[0] = [50, 50]
    regions = jnp.asarray([[40, 40, 60, 60], [0, 0, 0, 0]], jnp.float32)
    ok = np.asarray(
        m_ops.region_mask_filter(jnp.asarray(xy), jnp.ones(K, bool), regions, exclude=True)
    )
    assert not ok[0]
    inside = ((xy[:, 0] >= 40) & (xy[:, 0] < 60) & (xy[:, 1] >= 40) & (xy[:, 1] < 60))
    np.testing.assert_array_equal(ok, ~inside)


def test_filter_matches_dispatcher(rng):
    from visual_slam_tpu.frontend.filters import filter_matches
    from visual_slam_tpu.frontend.tracker import FeatureTrackingResult

    f1 = _feats(rng)
    f2 = _feats(rng)
    r = FeatureTrackingResult(
        features1=f1, features2=f2,
        train_idx=jnp.arange(64), distance=jnp.asarray(rng.uniform(0, 100, 64), jnp.float32),
        valid=jnp.ones(64, bool),
    )
    out = filter_matches(r, use_ransac_fund_matrix=False, use_orientation=False,
                         use_max_distance=True, max_distance=50.0)
    d = np.asarray(out.distance)
    np.testing.assert_array_equal(np.asarray(out.valid), d <= 50.0)
