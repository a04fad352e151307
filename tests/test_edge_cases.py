"""Degenerate-input edge cases: fixed-shape ops must stay finite and flag
invalidity rather than crash."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.ops import epipolar as ep
from visual_slam_tpu.ops import pnp as pnp_ops
from visual_slam_tpu.ops import triangulation as tri
from visual_slam_tpu.ops.matching import match_descriptors


def test_ransac_essential_all_invalid():
    x = jnp.zeros((64, 2), jnp.float32)
    res = ep.ransac_essential(x, x, jnp.zeros(64, bool), jax.random.PRNGKey(0), n_hyp=16)
    assert int(res["n_inliers"]) == 0
    assert np.isfinite(np.asarray(res["E"])).all()


def test_ransac_pnp_all_invalid():
    res = pnp_ops.ransac_pnp(
        jnp.zeros((32, 3), jnp.float32), jnp.zeros((32, 2), jnp.float32),
        jnp.zeros(32, bool), jax.random.PRNGKey(0), n_hyp=8,
    )
    assert not bool(res["ok"])
    assert np.isfinite(np.asarray(res["T"])).all()


def test_triangulate_zero_baseline():
    """Identical cameras: triangulation is degenerate — results must be
    finite and the depth/parallax gates must reject everything."""
    P = tri.projection_from_T(jnp.eye(4))
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (16, 2)), jnp.float32)
    pts, ok = tri.triangulate_dlt(P, P, x, x)
    assert np.isfinite(np.asarray(pts)).all()
    # The combined depth + parallax gate (as used by the initializer/local
    # mapping) must reject every degenerate point: valid-depth points have
    # zero parallax; the zero-ray guard cases fail the depth gate.
    good = tri.depth_mask(jnp.eye(4), jnp.eye(4), pts, 0.1, 50.0)
    good &= tri.parallax_angles(jnp.eye(4), jnp.eye(4), pts) >= jnp.deg2rad(0.5)
    assert not bool(jnp.any(good))


def test_match_all_invalid():
    d = jnp.zeros((16, 8), jnp.uint32)
    res = match_descriptors(d, d, jnp.zeros(16, bool), jnp.zeros(16, bool))
    assert int(res["n_matches"]) == 0


def test_masked_median_single():
    x = jnp.array([7.0, 1.0, 2.0])
    m = jnp.array([True, False, False])
    assert float(tri.masked_median(x, m)) == 7.0


def test_se3_log_near_pi(rng):
    from visual_slam_tpu.ops.lie import se3_exp, se3_log

    w = rng.standard_normal(3)
    w = w / np.linalg.norm(w) * (np.pi - 1e-3)
    xi = np.concatenate([rng.standard_normal(3), w]).astype(np.float32)
    T = se3_exp(jnp.asarray(xi))
    back = np.asarray(se3_log(T))
    T2 = np.asarray(se3_exp(jnp.asarray(back)))
    # Representative may differ; the TRANSFORM must round-trip.
    np.testing.assert_allclose(T2, np.asarray(T), atol=5e-3)
