import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.backend.adam import adam_bundle_adjust
from test_ba import make_ba_problem


def test_adam_reduces_cost(rng):
    problem, T_gt, pts_gt, f = make_ba_problem(rng, noise_px=0.2)
    T, X, info = adam_bundle_adjust(problem, n_iter=200, lr=2e-3, huber=5.0 / f)
    assert float(info["cost"]) < float(info["cost0"]) * 0.5
    assert np.isfinite(np.asarray(T)).all()
    assert np.isfinite(np.asarray(X)).all()


def test_adam_keeps_fixed_pose(rng):
    problem, T_gt, pts_gt, f = make_ba_problem(rng)
    T, X, info = adam_bundle_adjust(problem, n_iter=50, lr=1e-3, huber=5.0 / f)
    np.testing.assert_allclose(np.asarray(T[0]), T_gt[0], atol=1e-6)


def test_lm_beats_adam_iterations(rng):
    """LM reaches a (much) lower cost in far fewer iterations — the point of
    the second-order solver."""
    from visual_slam_tpu.backend.ba import bundle_adjust

    problem, T_gt, pts_gt, f = make_ba_problem(rng, noise_px=0.2)
    _, _, lm_info = bundle_adjust(problem, n_iter=10, huber=5.0 / f)
    _, _, adam_info = adam_bundle_adjust(problem, n_iter=150, lr=1e-3, huber=5.0 / f)
    assert float(lm_info["cost"]) <= float(adam_info["cost"]) * 1.05
