import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.ops import epipolar as ep
from visual_slam_tpu.ops import triangulation as tri
from synthetic import make_scene


def _scene(rng, noise=0.0, n_pts=200):
    sc = make_scene(rng, n_pts=n_pts, noise_px=noise)
    x1 = jnp.asarray(sc["xy1"], jnp.float32)
    x2 = jnp.asarray(sc["xy2"], jnp.float32)
    return sc, x1, x2


def test_eight_point_exact(rng):
    sc, x1, x2 = _scene(rng)
    w = jnp.ones(x1.shape[0], jnp.float32)
    E = np.asarray(ep.eight_point(x1, x2, w, essential=True))
    # True E from relative pose: cam1 = world. x2^T E x1 = 0 with E = [t]x R.
    T_rel = sc["T2"]  # T_1->2 since T1 = I
    R, t = T_rel[:3, :3], T_rel[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_true = tx @ R
    E_true = E_true / np.linalg.norm(E_true)
    # E defined up to sign
    err = min(np.abs(E - E_true).max(), np.abs(E + E_true).max())
    assert err < 1e-3
    errs = np.asarray(ep.sampson_error(jnp.asarray(E), x1, x2))
    assert errs.max() < 1e-8


def test_ransac_essential_with_outliers(rng):
    sc, x1, x2 = _scene(rng, noise=0.3)
    n = x1.shape[0]
    # corrupt 30% of matches
    n_out = n // 3
    x2_np = np.asarray(x2).copy()
    x2_np[:n_out] += rng.uniform(-0.3, 0.3, (n_out, 2))
    x2c = jnp.asarray(x2_np)
    mask = jnp.ones(n, bool)
    res = ep.ransac_essential(x1, x2c, mask, jax.random.PRNGKey(0), n_hyp=128, thresh=4e-3)
    inl = np.asarray(res["inliers"])
    # outlier region should be mostly rejected, inlier region mostly kept
    assert inl[n_out:].mean() > 0.9
    assert inl[:n_out].mean() < 0.25


def test_recover_pose_direction(rng):
    sc, x1, x2 = _scene(rng)
    mask = jnp.ones(x1.shape[0], bool)
    res = ep.estimate_motion_2d2d(x1, x2, mask, jax.random.PRNGKey(1), n_hyp=64)
    R_est, t_est = np.asarray(res["R"]), np.asarray(res["t"])
    T_rel = sc["T2"]
    R_true, t_true = T_rel[:3, :3], T_rel[:3, 3]
    np.testing.assert_allclose(R_est, R_true, atol=1e-2)
    # translation up to scale
    cos = np.dot(t_est, t_true) / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
    assert cos > 0.999
    assert int(res["n_inliers"]) > 0.9 * x1.shape[0]


def test_triangulate_matches_groundtruth(rng):
    sc, x1, x2 = _scene(rng)
    P1 = tri.projection_from_T(jnp.asarray(sc["T1"], jnp.float32))
    P2 = tri.projection_from_T(jnp.asarray(sc["T2"], jnp.float32))
    pts, ok = tri.triangulate_dlt(P1, P2, x1, x2)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(pts), sc["pts3d"], atol=5e-2)


def test_triangulate_matches_opencv(rng):
    import cv2

    sc, x1, x2 = _scene(rng, noise=0.5)
    P1 = sc["T1"][:3]
    P2 = sc["T2"][:3]
    X_cv = cv2.triangulatePoints(P1, P2, np.asarray(x1).T.astype(np.float64), np.asarray(x2).T.astype(np.float64))
    X_cv = (X_cv[:3] / X_cv[3]).T
    pts, ok = tri.triangulate_dlt(
        jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32), x1, x2
    )
    np.testing.assert_allclose(np.asarray(pts), X_cv, atol=5e-2)


def test_depth_and_parallax_gates(rng):
    sc, x1, x2 = _scene(rng)
    T1 = jnp.asarray(sc["T1"], jnp.float32)
    T2 = jnp.asarray(sc["T2"], jnp.float32)
    pts = jnp.asarray(sc["pts3d"], jnp.float32)
    m = tri.depth_mask(T1, T2, pts, 0.1, 50.0)
    assert bool(jnp.all(m))
    m2 = tri.depth_mask(T1, T2, pts, 0.1, 3.0)  # scene depths are >= 4
    assert not bool(jnp.any(m2))
    ang = tri.parallax_angles(T1, T2, pts)
    assert float(jnp.min(ang)) > np.deg2rad(0.5)


def test_masked_median():
    x = jnp.array([5.0, 1.0, 3.0, 100.0])
    m = jnp.array([True, True, True, False])
    assert float(tri.masked_median(x, m)) == 3.0
    m2 = jnp.array([True, True, False, False])
    assert float(tri.masked_median(x, m2)) == 3.0  # (1+5)/2
    assert float(tri.masked_median(x, jnp.zeros(4, bool))) == 0.0
