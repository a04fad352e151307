"""Distorted-camera handling: keypoints undistorted to ideal pinhole pixels."""
import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.config import Config
from visual_slam_tpu.tracking import undistort_features
from visual_slam_tpu.ops.detector import Features


def _feats(rng, K=32):
    return Features(
        xy=jnp.asarray(rng.uniform(100, 400, (K, 2)), jnp.float32),
        response=jnp.ones(K, jnp.float32),
        angle=jnp.zeros(K, jnp.float32),
        octave=jnp.zeros(K, jnp.int32),
        size=jnp.full((K,), 31.0, jnp.float32),
        desc=jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32)),
        valid=jnp.ones(K, bool),
    )


def test_no_distortion_is_noop(rng):
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cam = PinholeCamera(640, 480, K)
    assert not cam.has_distortion
    f = _feats(rng)
    out = undistort_features(f, cam)
    assert out is f


def test_undistortion_matches_opencv(rng):
    import cv2

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    D = np.array([-0.28, 0.07, 2e-4, -2e-4, 0.0])
    cam = PinholeCamera(640, 480, K, D=D)
    assert cam.has_distortion
    f = _feats(rng)
    out = undistort_features(f, cam)
    ud_cv = cv2.undistortPoints(
        np.asarray(f.xy, np.float64).reshape(-1, 1, 2), K, D, P=K
    ).reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(out.xy), ud_cv, atol=0.05)
