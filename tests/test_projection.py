import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.ops import projection as pj
from synthetic import make_scene, default_K


def test_project_backproject_roundtrip(rng):
    sc = make_scene(rng, n_pts=100)
    K = jnp.asarray(sc["K"], jnp.float32)
    Kinv = jnp.asarray(sc["Kinv"], jnp.float32)
    T = jnp.asarray(sc["T2"], jnp.float32)
    pts = jnp.asarray(sc["pts3d"], jnp.float32)
    uv, z = pj.project_points(K, T, pts)
    np.testing.assert_allclose(np.asarray(uv), sc["uv2"], atol=1e-2)
    np.testing.assert_allclose(np.asarray(z), sc["z2"], rtol=1e-4)
    # Backproject in camera frame and transform back to world.
    pc = pj.backproject(Kinv, uv, z)
    from visual_slam_tpu.ops.lie import inv_T

    pw = pj.transform_points(inv_T(T), pc)
    np.testing.assert_allclose(np.asarray(pw), sc["pts3d"], atol=1e-2)


def test_normalize_denormalize(rng):
    K = jnp.asarray(default_K(), jnp.float32)
    Kinv = jnp.linalg.inv(K)
    uv = jnp.asarray(rng.uniform(0, 640, (50, 2)), jnp.float32)
    xy = pj.normalize_points(Kinv, uv)
    back = pj.denormalize_points(K, xy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-3)


def test_are_in_image():
    pts = jnp.array([[0.0, 0.0], [639.0, 479.0], [640.0, 100.0], [-1.0, 5.0], [320, 240]])
    m = np.asarray(pj.are_in_image(pts, 640, 480))
    assert m.tolist() == [True, True, False, False, True]


def test_distort_undistort_roundtrip(rng):
    dist = jnp.array([-0.3, 0.1, 1e-3, -1e-3, 0.01], jnp.float32)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, (100, 2)), jnp.float32)
    xy_d = pj.distort_normalized(dist, xy)
    xy_u = pj.undistort_normalized(dist, xy_d, iters=10)
    np.testing.assert_allclose(np.asarray(xy_u), np.asarray(xy), atol=1e-4)


def test_distortion_matches_opencv(rng):
    import cv2

    K = default_K()
    dist = np.array([-0.3, 0.1, 1e-3, -1e-3, 0.01])
    uv = rng.uniform(100, 500, (50, 2))
    # OpenCV undistort: pixel -> normalized undistorted
    ud_cv = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist).reshape(-1, 2)
    xy = pj.normalize_points(jnp.asarray(np.linalg.inv(K), jnp.float32), jnp.asarray(uv, jnp.float32))
    ud = pj.undistort_normalized(jnp.asarray(dist, jnp.float32), xy, iters=12)
    np.testing.assert_allclose(np.asarray(ud), ud_cv, atol=1e-3)


def test_view_cos_and_reproj(rng):
    sc = make_scene(rng, n_pts=60)
    K = jnp.asarray(sc["K"], jnp.float32)
    T = jnp.asarray(sc["T2"], jnp.float32)
    pts = jnp.asarray(sc["pts3d"], jnp.float32)
    errs = pj.reprojection_errors(K, T, pts, jnp.asarray(sc["uv2"], jnp.float32))
    assert float(jnp.max(errs)) < 1e-2
    vc = pj.view_cos(T, pts)
    assert float(jnp.min(vc)) > 0.5  # all points in frustum
