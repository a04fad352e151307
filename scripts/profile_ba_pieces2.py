"""Scan-wrapped per-piece timing of the dense LM iteration (relay dispatch
inflation cancels): which term explodes from (W=16,M=1024) to (W=32,M=4096)?"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend import ba  # noqa: E402
from scripts.bench_ba_sparse import make_problem  # noqa: E402

REPS = 20


def timed_scan(fn, carry0, reps=3):
    @jax.jit
    def run(c0):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, c0, None, length=REPS)
        return c

    out = run(carry0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(carry0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / REPS * 1e3


def main():
    print("device:", jax.devices()[0].device_kind)
    lam = jnp.asarray(1e-3)
    for W, M in [(16, 1024), (16, 4096), (32, 1024), (32, 4096), (64, 4096)]:
        p, _ = make_problem(W, M, K=16)
        w_obs = p.obs_valid.astype(jnp.float32)
        pose_free = (p.pose_valid & ~p.pose_fixed).astype(jnp.float32)

        r, Jp, Jx, in_front = ba._residuals_and_jacobians(
            p.T_w2c, p.points, p.uv, w_obs > 0
        )
        w = w_obs * ba._robust_weights(r, 5e-3) * in_front
        Jp = Jp * pose_free[None, :, None, None]
        U = jnp.einsum("mwai,mw,mwaj->wij", Jp, w, Jp)
        V = jnp.einsum("mwai,mw,mwaj->mij", Jx, w, Jx)
        Y = jnp.einsum("mwai,mw,mwaj->mwij", Jp, w, Jx)
        gp = jnp.einsum("mwai,mw,mwa->wi", Jp, w, r)
        gx = jnp.einsum("mwai,mw,mwa->mi", Jx, w, r)
        Vinv = jnp.linalg.inv(V + lam * jnp.eye(3)[None])
        T_blk = jnp.einsum("mwij,mjk->mwik", Y, Vinv)
        S_cross = jnp.einsum("muik,mvjk->uivj", T_blk, Y)
        jax.block_until_ready((U, V, Y, gp, gx, Vinv, T_blk, S_cross))

        # Each piece as a scan carrying a small perturbation to defeat CSE.
        t_jac = timed_scan(
            lambda X: X
            + 1e-9
            * jnp.pad(
                ba._residuals_and_jacobians(p.T_w2c, X, p.uv, w_obs > 0)[0][:, 0, :],
                ((0, 0), (0, 1)),
            ),
            p.points,
        )
        t_blocks = timed_scan(
            lambda Jpc: Jpc
            + 1e-12
            * jnp.einsum("mwai,mw,mwaj->wij", Jpc, w, Jpc).sum(),
            Jp,
        )
        t_vinv = timed_scan(
            lambda Vc: Vc + 1e-12 * jnp.linalg.inv(Vc + lam * jnp.eye(3)[None]),
            V,
        )
        t_tblk = timed_scan(
            lambda Yc: Yc + 1e-12 * jnp.einsum("mwij,mjk->mwik", Yc, Vinv),
            Y,
        )
        t_cross = timed_scan(
            lambda Tc: Tc
            + 1e-12 * jnp.einsum("muik,mvjk->uivj", Tc, Y).sum(),
            T_blk,
        )
        Sd = (
            jnp.zeros((W, 6, W, 6))
            .at[jnp.arange(W), :, jnp.arange(W), :]
            .add(U + lam * jnp.eye(6)[None])
            - S_cross
        ).reshape(W * 6, W * 6) + jnp.eye(W * 6)
        b = jnp.ones((W * 6,))
        t_solve = timed_scan(
            lambda bc: bc + 1e-6 * jnp.linalg.solve(Sd, bc), b
        )
        print(
            f"W={W:3d} M={M:5d}: jac {t_jac:7.3f}  blocks {t_blocks:7.3f}  "
            f"vinv {t_vinv:7.3f}  tblk {t_tblk:7.3f}  cross {t_cross:7.3f}  "
            f"solve384 {t_solve:7.3f}  (ms/iter)"
        )


if __name__ == "__main__":
    main()
