"""TPU lowering A/B for the pnp_dlt hot pieces at RANSAC batch (H, ...).

q_pnp_pieces.log: the vmapped minimal fit owns the PnP leg (2.5/3.0 ms at
H=128) — 12x12 eigh + 3x3 SVDs per hypothesis, the tiny-batched linalg
pattern CLAUDE.md flags. Candidate relowerings, all batched over H=128:

  nullspace:  eigh(AtA)[:, 0]        vs  Cholesky inverse iteration (k=3)
  scale:      svdvals(M) geomean      vs  |det M|^(1/3)  (closed form)
  so3 proj:   svd-based project_to_so3 vs Newton polar iteration (inv3x3)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.ops.lie import project_to_so3  # noqa: E402

H = 128
REPS = 20


def timed(fn, *args, reps=3):
    @jax.jit
    def run(c0, *a):
        def body(c, _):
            return c + fn(c, *a), None
        c, _ = jax.lax.scan(body, c0, None, length=REPS)
        return c

    out = run(jnp.zeros(()), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(jnp.zeros(()), *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / REPS * 1e3


def chol_inv_iter(AtA, iters=3):
    """Smallest-eigenvector by inverse iteration off one Cholesky factor.
    AtA: (H, 12, 12) PSD. Fully batched; no pivoting, no eigh."""
    eps = 1e-7 * jnp.trace(AtA, axis1=-2, axis2=-1)[:, None, None] + 1e-12
    L = jnp.linalg.cholesky(AtA + eps * jnp.eye(12))
    x = jnp.ones((AtA.shape[0], 12), AtA.dtype)

    def body(x, _):
        y = jax.scipy.linalg.cho_solve((L, True), x[..., None])[..., 0]
        x = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


def polar_newton(M, iters=4):
    """Nearest rotation by scaled Newton polar iteration; closed-form 3x3
    inverses only (no SVD). M: (H, 3, 3), det(M) > 0 assumed."""
    def inv3(A):
        a, b, c = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
        d, e, f = A[:, 1, 0], A[:, 1, 1], A[:, 1, 2]
        g, h, i = A[:, 2, 0], A[:, 2, 1], A[:, 2, 2]
        c00 = e * i - f * h; c01 = c * h - b * i; c02 = b * f - c * e
        c10 = f * g - d * i; c11 = a * i - c * g; c12 = c * d - a * f
        c20 = d * h - e * g; c21 = b * g - a * h; c22 = a * e - b * d
        det = a * c00 + b * c10 + c * c20
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        adj = jnp.stack([
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ], -2)
        return adj * inv_det[:, None, None]

    X = M

    def body(X, _):
        Xit = jnp.swapaxes(inv3(X), -1, -2)
        # Higham scaling: gamma = (|det Xinv| / |det X|)^(1/6) per batch.
        dX = jnp.abs(jnp.linalg.det(X)) + 1e-12
        g = (1.0 / dX) ** (1.0 / 3.0)
        X = 0.5 * (g[:, None, None] * X + Xit / g[:, None, None])
        return X, None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    return X


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    A = rng.normal(size=(H, 12, 12)).astype(np.float32)
    AtA = jnp.asarray(np.einsum("hij,hkj->hik", A, A))
    Ms = []
    for _ in range(H):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        Ms.append(1.7 * q + 0.05 * rng.normal(size=(3, 3)))
    M = jnp.asarray(np.stack(Ms).astype(np.float32))

    t_eigh = timed(lambda c, a: c + 1e-9 * jnp.sum(
        jnp.linalg.eigh(a + c)[1][:, :, 0]), AtA)
    t_chol = timed(lambda c, a: c + 1e-9 * jnp.sum(chol_inv_iter(a + c)), AtA)
    print(f"nullspace: eigh {t_eigh:7.3f} ms   chol-invit(3) {t_chol:7.3f} ms")

    # Accuracy: residual |AtA x| vs eigh's.
    x_e = jnp.linalg.eigh(AtA)[1][:, :, 0]
    x_c = chol_inv_iter(AtA)
    r_e = jnp.linalg.norm(jnp.einsum("hij,hj->hi", AtA, x_e), axis=-1)
    r_c = jnp.linalg.norm(jnp.einsum("hij,hj->hi", AtA, x_c), axis=-1)
    print(f"  residual |AtA x|: eigh med {np.median(np.asarray(r_e)):.3e}  "
          f"chol med {np.median(np.asarray(r_c)):.3e}")

    t_svdv = timed(lambda c, m: c + 1e-9 * jnp.sum(
        jnp.linalg.svd(m + c, compute_uv=False)), M)
    t_det = timed(lambda c, m: c + 1e-9 * jnp.sum(
        jnp.abs(jnp.linalg.det(m + c)) ** (1.0 / 3.0)), M)
    print(f"scale:     svdvals {t_svdv:7.3f} ms   |det|^(1/3) {t_det:7.3f} ms")

    t_so3 = timed(lambda c, m: c + 1e-9 * jnp.sum(
        jax.vmap(project_to_so3)(m + c)), M)
    t_pol = timed(lambda c, m: c + 1e-9 * jnp.sum(polar_newton(m + c)), M)
    print(f"so3 proj:  svd {t_so3:7.3f} ms   polar-newton(4) {t_pol:7.3f} ms")

    R_s = jax.vmap(project_to_so3)(M)
    R_p = polar_newton(M)
    d = np.asarray(jnp.linalg.norm(R_s - R_p, axis=(-2, -1)))
    print(f"  |R_svd - R_polar| med {np.median(d):.3e} max {d.max():.3e}")


if __name__ == "__main__":
    main()
