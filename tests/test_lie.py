import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from visual_slam_tpu.ops import lie


def random_rotvecs(rng, n=32, scale=np.pi * 0.95):
    v = rng.standard_normal((n, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    return v * rng.uniform(0, scale, (n, 1))


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_small_angle(rng):
    w = (rng.standard_normal((8, 3)) * 1e-6).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng, scale=3.0).astype(np.float32)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w_back = np.asarray(lie.so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_quat_conversions(rng):
    w = random_rotvecs(rng).astype(np.float32)
    R_ref = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R_ref)))
    # unit norm, w >= 0
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    assert (q[:, 0] >= -1e-6).all()
    R_back = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, R_ref, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = (rng.standard_normal((16, 6)) * np.array([2, 2, 2, 0.8, 0.8, 0.8])).astype(np.float32)
    # keep rotation angle < pi so the log is the principal representative
    ang = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] *= np.minimum(1.0, 3.0 / ang)
    T = lie.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=2e-3)


def test_inv_T(rng):
    xi = rng.standard_normal((8, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    TT = np.asarray(T @ lie.inv_T(T))
    np.testing.assert_allclose(TT, np.broadcast_to(np.eye(4), TT.shape), atol=1e-5)


def test_rotation_angle(rng):
    w = random_rotvecs(rng, scale=3.0).astype(np.float32)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    ang = np.asarray(lie.rotation_angle(jnp.asarray(R)))
    np.testing.assert_allclose(ang, np.linalg.norm(w, axis=-1), atol=1e-3)


def test_project_to_so3(rng):
    M = np.eye(3) + 0.1 * rng.standard_normal((3, 3))
    R = np.asarray(lie.project_to_so3(jnp.asarray(M, dtype=jnp.float32)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99


def test_euler_roundtrip(rng):
    rpy = (rng.uniform(-1.2, 1.2, (16, 3))).astype(np.float32)
    R = lie.euler_to_rotmat(jnp.asarray(rpy))
    back = np.asarray(lie.rotmat_to_euler(R))
    np.testing.assert_allclose(back, rpy, atol=1e-4)


def test_jit_and_vmap():
    w = jnp.array([[0.1, 0.2, 0.3], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R1 = jax.jit(lie.so3_exp)(w)
    R2 = jax.vmap(lie.so3_exp)(w)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-6)


def test_se3_inverse_matches_numpy():
    import numpy as np
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from visual_slam_tpu.ops.lie import se3_inverse

    rng = np.random.default_rng(4)
    Ts = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    for i in range(5):
        Ts[i, :3, :3] = Rotation.from_rotvec(rng.normal(0, 1, 3)).as_matrix()
        Ts[i, :3, 3] = rng.normal(0, 5, 3)
    inv = np.asarray(se3_inverse(jnp.asarray(Ts)))
    np.testing.assert_allclose(inv, np.linalg.inv(Ts), atol=2e-6)
    # single (unbatched) transform too
    inv1 = np.asarray(se3_inverse(jnp.asarray(Ts[0])))
    np.testing.assert_allclose(inv1, np.linalg.inv(Ts[0]), atol=2e-6)


def test_det3x3_and_inv3x3_match_numpy():
    import numpy as np
    import jax.numpy as jnp

    from visual_slam_tpu.ops.lie import det3x3, inv3x3

    rng = np.random.default_rng(7)
    A = rng.normal(0, 2, (32, 3, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(det3x3(jnp.asarray(A))), np.linalg.det(A), rtol=2e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(inv3x3(jnp.asarray(A))), np.linalg.inv(A), rtol=3e-3,
        atol=2e-4,
    )
    # Unbatched too.
    np.testing.assert_allclose(
        float(det3x3(jnp.asarray(A[0]))), float(np.linalg.det(A[0])),
        rtol=2e-4,
    )


def test_project_to_so3_newton_matches_svd(rng):
    """The elementwise polar iteration agrees with the SVD projection on
    noisy near-rotations (the DLT-fit regime it replaces it in)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from visual_slam_tpu.ops.lie import project_to_so3, project_to_so3_newton

    Ms = []
    for i in range(24):
        R = Rotation.from_rotvec(rng.normal(0, 1, 3)).as_matrix()
        scale = rng.uniform(0.3, 3.0)
        noise = rng.normal(0, 0.05 * (i % 4), (3, 3))
        Ms.append(scale * R + noise)
    M = jnp.asarray(np.stack(Ms).astype(np.float32))
    R_svd = np.asarray(jax.vmap(project_to_so3)(M))
    R_new = np.asarray(project_to_so3_newton(M))
    np.testing.assert_allclose(R_new, R_svd, atol=5e-5)
    # Proper rotations: R^T R = I, det = +1.
    eye = np.einsum("nij,nik->njk", R_new, R_new)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (24, 1, 1)), atol=5e-5)
    assert np.all(np.linalg.det(R_new) > 0.99)
