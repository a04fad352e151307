"""Projection-guided matching unit tests."""
import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.ops.guided_matching import guided_match
from visual_slam_tpu.ops.orb import unpack_bits  # noqa: F401 (sanity import)


def _setup(rng, M=40, Kp=50, f=300.0, w=320, h=240):
    K = jnp.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]], jnp.float32)
    pts = np.stack([
        rng.uniform(-2, 2, M), rng.uniform(-1.5, 1.5, M), rng.uniform(4, 10, M)
    ], 1).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    uv = (pts[:, :2] / pts[:, 2:3]) * f + np.array([w / 2, h / 2])
    desc = rng.integers(0, 2**32, (M, 8), dtype=np.uint32)
    # keypoints: first M are the projected landmarks (same descriptors),
    # rest are clutter with random descriptors.
    kp_xy = np.zeros((Kp, 2), np.float32)
    kp_xy[:M] = uv + rng.normal(0, 1.0, (M, 2))
    kp_xy[M:] = rng.uniform(0, [w, h], (Kp - M, 2))
    kp_desc = rng.integers(0, 2**32, (Kp, 8), dtype=np.uint32)
    kp_desc[:M] = desc
    return K, pts, T, desc, kp_xy, kp_desc, w, h


def test_guided_match_associates_correctly(rng):
    K, pts, T, desc, kp_xy, kp_desc, w, h = _setup(rng)
    M = len(pts)
    res = guided_match(
        jnp.asarray(pts), jnp.asarray(desc), jnp.ones(M, bool),
        jnp.asarray(T), K,
        jnp.asarray(kp_xy), jnp.asarray(kp_desc), jnp.ones(len(kp_xy), bool),
        float(w), float(h), radius_px=10.0,
    )
    valid = np.asarray(res["valid"])
    lm_idx = np.asarray(res["lm_idx"])
    # keypoint i < M should match landmark i (identical descriptors, within radius)
    assert valid[:M].mean() > 0.9
    agree = lm_idx[:M][valid[:M]] == np.arange(M)[valid[:M]]
    assert agree.mean() > 0.95
    pts3d = np.asarray(res["pts3d"])
    np.testing.assert_allclose(pts3d[:M][valid[:M]], pts[lm_idx[:M][valid[:M]]])


def test_guided_match_radius_gate(rng):
    K, pts, T, desc, kp_xy, kp_desc, w, h = _setup(rng)
    M = len(pts)
    # Move keypoints far from predicted projections -> no matches.
    kp_xy2 = kp_xy.copy()
    kp_xy2[:M] += 60.0
    res = guided_match(
        jnp.asarray(pts), jnp.asarray(desc), jnp.ones(M, bool),
        jnp.asarray(T), K,
        jnp.asarray(kp_xy2), jnp.asarray(kp_desc), jnp.ones(len(kp_xy), bool),
        float(w), float(h), radius_px=10.0,
    )
    assert int(res["n_matches"]) <= 2  # chance collisions only


def test_guided_match_behind_camera_excluded(rng):
    K, pts, T, desc, kp_xy, kp_desc, w, h = _setup(rng)
    M = len(pts)
    pts2 = pts.copy()
    pts2[:, 2] *= -1  # all behind the camera
    res = guided_match(
        jnp.asarray(pts2), jnp.asarray(desc), jnp.ones(M, bool),
        jnp.asarray(T), K,
        jnp.asarray(kp_xy), jnp.asarray(kp_desc), jnp.ones(len(kp_xy), bool),
        float(w), float(h),
    )
    assert int(res["n_matches"]) == 0
