import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.ops import pnp
from synthetic import make_scene


def test_pnp_dlt_exact(rng):
    sc = make_scene(rng, n_pts=50)
    pts3d = jnp.asarray(sc["pts3d"], jnp.float32)
    xy = jnp.asarray(sc["xy2"], jnp.float32)
    w = jnp.ones(50, jnp.float32)
    R, t = pnp.pnp_dlt(pts3d, xy, w)
    np.testing.assert_allclose(np.asarray(R), sc["T2"][:3, :3], atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), sc["T2"][:3, 3], atol=1e-2)


def test_refine_pose_gn(rng):
    sc = make_scene(rng, n_pts=80, noise_px=0.2)
    pts3d = jnp.asarray(sc["pts3d"], jnp.float32)
    xy = jnp.asarray(sc["xy2"], jnp.float32)
    # Perturb the true pose and refine back.
    from visual_slam_tpu.ops.lie import so3_exp

    dR = np.asarray(so3_exp(jnp.array([0.02, -0.01, 0.015], jnp.float32)))
    R0 = jnp.asarray(dR @ sc["T2"][:3, :3], jnp.float32)
    t0 = jnp.asarray(sc["T2"][:3, 3] + np.array([0.05, -0.05, 0.08]), jnp.float32)
    w = jnp.ones(80, jnp.float32)
    R, t = pnp.refine_pose_gn(R0, t0, pts3d, xy, w, iters=12, huber=1e-2)
    np.testing.assert_allclose(np.asarray(R), sc["T2"][:3, :3], atol=2e-3)
    np.testing.assert_allclose(np.asarray(t), sc["T2"][:3, 3], atol=1e-2)


def test_ransac_pnp_with_outliers(rng):
    sc = make_scene(rng, n_pts=150, noise_px=0.3)
    pts3d = np.asarray(sc["pts3d"]).copy()
    n_out = 40
    pts3d[:n_out] += rng.uniform(-3, 3, (n_out, 3))
    res = pnp.ransac_pnp(
        jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(sc["xy2"], jnp.float32),
        jnp.ones(150, bool),
        jax.random.PRNGKey(0),
        n_hyp=128,
        thresh=2.0 / 500.0,
    )
    assert bool(res["ok"])
    R, t = np.asarray(res["R"]), np.asarray(res["t"])
    np.testing.assert_allclose(R, sc["T2"][:3, :3], atol=5e-3)
    np.testing.assert_allclose(t, sc["T2"][:3, 3], atol=5e-2)
    inl = np.asarray(res["inliers"])
    assert inl[n_out:].mean() > 0.9
    assert inl[:n_out].mean() < 0.2


def test_ransac_pnp_matches_opencv(rng):
    """Golden parity: our pose should agree with cv2.solvePnPRansac."""
    import cv2

    sc = make_scene(rng, n_pts=120, noise_px=0.5)
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        sc["pts3d"].astype(np.float64),
        sc["uv2"].astype(np.float64),
        sc["K"],
        None,
        iterationsCount=100,
        reprojectionError=3.0,
        confidence=0.99,
    )
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)
    res = pnp.ransac_pnp(
        jnp.asarray(sc["pts3d"], jnp.float32),
        jnp.asarray(sc["xy2"], jnp.float32),
        jnp.ones(120, bool),
        jax.random.PRNGKey(2),
        n_hyp=128,
        thresh=3.0 / 500.0,
    )
    np.testing.assert_allclose(np.asarray(res["R"]), R_cv, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res["t"]), tvec.ravel(), atol=5e-2)
