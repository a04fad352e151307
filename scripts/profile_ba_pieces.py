"""Time each piece of the dense LM/Schur iteration at the full-pipeline
shapes to find the W=16 -> W=32 cost cliff (0.17 ms -> 195 ms per solve)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend import ba  # noqa: E402
from scripts.bench_ba_sparse import make_problem  # noqa: E402


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print("device:", jax.devices()[0].device_kind)
    for W, M in [(16, 1024), (32, 4096), (64, 4096)]:
        p, _ = make_problem(W, M, K=16)
        w_obs = p.obs_valid.astype(jnp.float32)
        pose_free = (p.pose_valid & ~p.pose_fixed).astype(jnp.float32)
        lam = jnp.asarray(1e-3)

        @jax.jit
        def jac(T, X):
            r, Jp, Jx, in_front = ba._residuals_and_jacobians(T, X, p.uv, w_obs > 0)
            w = w_obs * ba._robust_weights(r, 5e-3) * in_front
            return r, Jp * pose_free[None, :, None, None], Jx, w

        r, Jp, Jx, w = jac(p.T_w2c, p.points)
        jax.block_until_ready((r, Jp, Jx, w))

        @jax.jit
        def blocks(Jp, Jx, w, r):
            U = jnp.einsum("mwai,mw,mwaj->wij", Jp, w, Jp)
            V = jnp.einsum("mwai,mw,mwaj->mij", Jx, w, Jx)
            Y = jnp.einsum("mwai,mw,mwaj->mwij", Jp, w, Jx)
            gp = jnp.einsum("mwai,mw,mwa->wi", Jp, w, r)
            gx = jnp.einsum("mwai,mw,mwa->mi", Jx, w, r)
            return U, V, Y, gp, gx

        U, V, Y, gp, gx = blocks(Jp, Jx, w, r)
        jax.block_until_ready(U)

        @jax.jit
        def schur_cross(Y, V):
            Vinv = jnp.linalg.inv(V + lam * jnp.eye(3)[None])
            T_blk = jnp.einsum("mwij,mjk->mwik", Y, Vinv)
            S_cross = jnp.einsum("muik,mvjk->uivj", T_blk, Y)
            b_local = -jnp.einsum("mwik,mk->wi", T_blk, gx)
            return S_cross, b_local, Vinv, T_blk

        S_cross, b_local, Vinv, T_blk = schur_cross(Y, V)
        jax.block_until_ready(S_cross)

        @jax.jit
        def assemble_solve(S_cross, U, gp, b_local):
            Wn = U.shape[0]
            S = jnp.zeros((Wn, 6, Wn, 6)).at[
                jnp.arange(Wn), :, jnp.arange(Wn), :
            ].add(U + lam * jnp.eye(6)[None]) - S_cross
            free = pose_free
            S = S * free[:, None, None, None] * free[None, None, :, None]
            S = S.at[jnp.arange(Wn), :, jnp.arange(Wn), :].add(
                jnp.eye(6)[None] * (1.0 - free)[:, None, None]
            )
            b = (gp + b_local) * free[:, None]
            Sd = S.reshape(Wn * 6, Wn * 6)
            return jnp.linalg.solve(Sd, b.reshape(Wn * 6))

        x = assemble_solve(S_cross, U, gp, b_local)
        jax.block_until_ready(x)

        @jax.jit
        def backsub(Y, Vinv, gx, dxi):
            YtdP = jnp.einsum("mwij,wi->mj", Y, dxi)
            return -jnp.einsum("mij,mj->mi", Vinv, gx + YtdP)

        dxi = x.reshape(W, 6)
        dX = backsub(Y, Vinv, gx, dxi)
        jax.block_until_ready(dX)

        t_jac = timed(jac, p.T_w2c, p.points)
        t_blocks = timed(blocks, Jp, Jx, w, r)
        t_cross = timed(schur_cross, Y, V)
        t_solve = timed(assemble_solve, S_cross, U, gp, b_local)
        t_back = timed(backsub, Y, Vinv, gx, dxi)
        print(
            f"W={W:3d} M={M:5d}: jac {t_jac:7.2f}  blocks {t_blocks:7.2f}  "
            f"cross {t_cross:7.2f}  assemble+solve {t_solve:7.2f}  "
            f"backsub {t_back:7.2f}  (ms)"
        )


if __name__ == "__main__":
    main()
