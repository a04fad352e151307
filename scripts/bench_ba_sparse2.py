"""Sparse-BA device A/B (VERDICT r4 #4): current _solve_step_sparse vs a
GATHER-FREE variant.

Evidence shape: sparse is fine at M=1024 (0.88 ms) and explodes 80x past
dense at M=4096 (9.5 s vs 121 ms, q_ba_sparse.log) — an M*K-proportional
serial lowering. The dense solver shares every einsum pattern; what is
sparse-ONLY is the tiny unaligned gathers (T_w2c[obs_pose] slicing 3x3
blocks, pose_free[obs_pose], dxi[obs_pose]) — exactly the op class TPU
lowers to a serial loop when the gathered slice is not a tiled row
(CLAUDE.md scatter/gather lessons). The variant replaces every gather with
a one-hot matmul (the onehot is built ONCE per solve, outside the LM scan).

Usage: python scripts/bench_ba_sparse2.py
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend import ba as ba_mod  # noqa: E402
from visual_slam_tpu.backend.ba import (  # noqa: E402
    BASparse, _EPS, bundle_adjust_sparse,
)

REPS = 4


def make_problem(rng, W, M, K):
    T = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    T[:, :3, 3] = rng.normal(0, 0.3, (W, 3))
    pts = rng.uniform(-5, 5, (M, 3)).astype(np.float32) + [0, 0, 12]
    uv = rng.normal(0, 0.3, (M, K, 2)).astype(np.float32)
    obs_pose = rng.integers(0, W, (M, K)).astype(np.int32)
    obs = rng.uniform(size=(M, K)) < 0.8
    pose_valid = np.ones(W, bool)
    pose_fixed = np.zeros(W, bool)
    pose_fixed[0] = True
    return BASparse(
        T_w2c=jnp.asarray(T), points=jnp.asarray(pts), uv=jnp.asarray(uv),
        obs_pose=jnp.asarray(obs_pose), obs_valid=jnp.asarray(obs),
        pose_valid=jnp.asarray(pose_valid), pose_fixed=jnp.asarray(pose_fixed),
    )


def _rj_sparse_onehot(onehot, T_w2c, points, uv):
    """Gather-free _residuals_and_jacobians_sparse: pose blocks arrive via
    one-hot contraction instead of T_w2c[obs_pose]."""
    Rg = jnp.einsum("mkw,wab->mkab", onehot, T_w2c[:, :3, :3])
    tg = jnp.einsum("mkw,wa->mka", onehot, T_w2c[:, :3, 3])
    pc = jnp.einsum("mkab,mb->mka", Rg, points) + tg
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    inv_z = 1.0 / zs
    u = x * inv_z
    v = y * inv_z
    r = jnp.stack([u, v], axis=-1) - uv
    zero = jnp.zeros_like(u)
    Ju = jnp.stack([inv_z, zero, -u * inv_z, -u * v, 1.0 + u * u, -v], axis=-1)
    Jv = jnp.stack([zero, inv_z, -v * inv_z, -(1.0 + v * v), u * v, u], axis=-1)
    Jp = jnp.stack([Ju, Jv], axis=-2)
    A = jnp.stack(
        [
            jnp.stack([inv_z, zero, -u * inv_z], axis=-1),
            jnp.stack([zero, inv_z, -v * inv_z], axis=-1),
        ],
        axis=-2,
    )
    Jx = jnp.einsum("mkab,mkbc->mkac", A, Rg)
    in_front = z > _EPS
    return r, Jp, Jx, in_front


def _solve_step_sparse_nf(onehot, pf_obs, T_w2c, points, uv, w_obs,
                          pose_free, lam, huber):
    W = T_w2c.shape[0]
    r, Jp, Jx, in_front = _rj_sparse_onehot(onehot, T_w2c, points, uv)
    w = w_obs * ba_mod._robust_weights(r, huber) * in_front
    Jp = Jp * pf_obs[..., None, None]

    U = jnp.einsum("mkai,mk,mkaj,mkw->wij", Jp, w, Jp, onehot)
    gp = jnp.einsum("mkai,mk,mka,mkw->wi", Jp, w, r, onehot)
    V = jnp.einsum("mkai,mk,mkaj->mij", Jx, w, Jx)
    gx = jnp.einsum("mkai,mk,mka->mi", Jx, w, r)
    Y = jnp.einsum("mkai,mk,mkaj->mkij", Jp, w, Jx)

    U = U + lam * jnp.eye(6)[None]
    V = V + lam * jnp.eye(3)[None]
    Vinv = ba_mod._inv3x3(V)

    T_blk = jnp.einsum("mkij,mjl->mkil", Y, Vinv)
    Tb_w = jnp.einsum("mkil,mkw->mwil", T_blk, onehot)
    Y_w = jnp.einsum("mkjl,mkw->mwjl", Y, onehot)
    S_cross = jnp.einsum("muil,mvjl->uivj", Tb_w, Y_w)
    b_local = -jnp.einsum("mkil,ml,mkw->wi", T_blk, gx, onehot)
    b = gp + b_local
    S = jnp.zeros((W, 6, W, 6)).at[jnp.arange(W), :, jnp.arange(W), :].add(U) - S_cross
    free = pose_free
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S.at[jnp.arange(W), :, jnp.arange(W), :].add(
        jnp.eye(6)[None] * (1.0 - free)[:, None, None]
    )
    b = b * free[:, None]
    Sd = S.reshape(W * 6, W * 6)
    L = jnp.linalg.cholesky(Sd)
    dxi = -jax.scipy.linalg.cho_solve((L, True), b.reshape(W * 6)).reshape(W, 6)
    dxi_obs = jnp.einsum("mkw,wi->mki", onehot, dxi)  # gather-free dxi[obs_pose]
    YtdP = jnp.einsum("mkij,mki->mj", Y, dxi_obs)
    dX = -jnp.einsum("mij,mj->mi", Vinv, gx + YtdP)
    return dxi, dX


@partial(jax.jit, static_argnames=("n_iter",))
def bundle_adjust_sparse_nf(problem, n_iter=20, huber=5e-3, lam0=1e-3):
    w_obs = problem.obs_valid.astype(jnp.float32)
    pose_free = (problem.pose_valid & ~problem.pose_fixed).astype(jnp.float32)
    # Constant across LM iterations: build ONCE outside the scan.
    onehot = jax.nn.one_hot(problem.obs_pose, problem.T_w2c.shape[0],
                            dtype=jnp.float32)
    pf_obs = jnp.einsum("mkw,w->mk", onehot, pose_free)

    def cost_of(T, X):
        r, _, _, in_front = _rj_sparse_onehot(onehot, T, X, problem.uv)
        return ba_mod._cost(r, w_obs, in_front, huber)

    def body(carry, _):
        T, X, lam, c = carry
        dxi, dX = _solve_step_sparse_nf(
            onehot, pf_obs, T, X, problem.uv, w_obs, pose_free, lam, huber
        )
        T_new, X_new = ba_mod._apply_step(T, X, dxi, dX)
        c_new = cost_of(T_new, X_new)
        accept = c_new < c
        T = jnp.where(accept, T_new, T)
        X = jnp.where(accept, X_new, X)
        c = jnp.where(accept, c_new, c)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (T, X, lam, c), c

    c0 = cost_of(problem.T_w2c, problem.points)
    (T, X, lam, c), cs = jax.lax.scan(
        body, (problem.T_w2c, problem.points, jnp.asarray(lam0), c0),
        None, length=n_iter,
    )
    return T, X, {"cost0": c0, "cost": c}


def timed(jitted_solve, problem, n_iter):
    stacked = jax.tree.map(lambda x: jnp.stack([x] * REPS), problem)

    @partial(jax.jit, static_argnames=("n_iter",))
    def many(probs, n_iter):
        def body(_, p):
            T, X, info = jitted_solve(p, n_iter=n_iter)
            return 0, info["cost"]

        _, cs = jax.lax.scan(body, 0, probs)
        return cs

    cs = many(stacked, n_iter)
    float(cs[0])
    t0 = time.perf_counter()
    cs = many(stacked, n_iter)
    _ = float(cs[-1])
    return (time.perf_counter() - t0) * 1e3 / REPS


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev}", flush=True)

    for (W, M, K) in [(16, 1024, 16), (32, 4096, 16), (64, 4096, 16)]:
        p = make_problem(rng, W, M, K)
        # correctness: both solvers agree
        T0, X0, i0 = bundle_adjust_sparse(p, n_iter=10, huber=5e-3)
        T1, X1, i1 = bundle_adjust_sparse_nf(p, n_iter=10, huber=5e-3)
        dT = float(jnp.abs(T0 - T1).max())
        ms_old = timed(bundle_adjust_sparse, p, 20)
        ms_new = timed(bundle_adjust_sparse_nf, p, 20)
        print(
            f"W={W:3d} M={M:5d} K={K}: sparse_old {ms_old:9.2f} ms  "
            f"sparse_nf {ms_new:9.2f} ms  speedup {ms_old / ms_new:6.1f}x  "
            f"maxT diff {dT:.2e}", flush=True,
        )


if __name__ == "__main__":
    main()
