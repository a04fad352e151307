"""Analytic-Jacobian verification: the LM solver's hand-derived residual
Jacobians must match JAX autodiff of the same residual model."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_slam_tpu.backend.ba import _residuals_and_jacobians
from visual_slam_tpu.ops.lie import so3_exp


def _random_problem(rng, M=5, W=3):
    from scipy.spatial.transform import Rotation

    pts = np.stack([rng.uniform(-2, 2, M), rng.uniform(-1, 1, M), rng.uniform(4, 8, M)], 1)
    T = np.zeros((W, 4, 4))
    for w in range(W):
        R = Rotation.from_rotvec(rng.normal(0, 0.05, 3)).as_matrix()
        T[w] = np.eye(4)
        T[w, :3, :3] = R
        T[w, :3, 3] = rng.normal(0, 0.3, 3)
    uv = rng.normal(0, 0.2, (M, W, 2))
    return (
        jnp.asarray(T, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(uv, jnp.float32),
    )


def test_pose_jacobian_matches_autodiff(rng):
    T, X, uv = _random_problem(rng)
    _, Jp, _, _ = _residuals_and_jacobians(T, X, uv, jnp.ones(uv.shape[:2], bool))

    def residual_wrt_xi(xi, w):
        # left perturbation of pose w: T_w <- exp(xi) T_w
        dR = so3_exp(xi[3:])
        T_p = T.at[w, :3, :3].set(dR @ T[w, :3, :3]).at[w, :3, 3].set(
            dR @ T[w, :3, 3] + xi[:3]
        )
        r, _, _, _ = _residuals_and_jacobians(T_p, X, uv, jnp.ones(uv.shape[:2], bool))
        return r[:, w]  # (M, 2)

    for w in range(T.shape[0]):
        J_auto = jax.jacfwd(residual_wrt_xi)(jnp.zeros(6), w)  # (M, 2, 6)
        np.testing.assert_allclose(
            np.asarray(Jp[:, w]), np.asarray(J_auto), atol=1e-4, rtol=1e-3
        )


def test_point_jacobian_matches_autodiff(rng):
    T, X, uv = _random_problem(rng)
    _, _, Jx, _ = _residuals_and_jacobians(T, X, uv, jnp.ones(uv.shape[:2], bool))

    def residual_wrt_point(dx, i):
        Xp = X.at[i].add(dx)
        r, _, _, _ = _residuals_and_jacobians(T, Xp, uv, jnp.ones(uv.shape[:2], bool))
        return r[i]  # (W, 2)

    for i in range(X.shape[0]):
        J_auto = jax.jacfwd(residual_wrt_point)(jnp.zeros(3), i)  # (W, 2, 3)
        np.testing.assert_allclose(
            np.asarray(Jx[i]), np.asarray(J_auto), atol=1e-4, rtol=1e-3
        )
