"""Ablation bisection of the dense BA LM iteration on the real TPU.

The solve runs 0.12 GFLOP in ~100 ms (W=32, M=4096, 20 iters) — 3000x
below VPU rate — with NO per-op dispatch floor (q_scan_floor.log: scan
iterations cost ~1 us). Isolated piece timings are relay-harness-biased,
so this measures the REAL fused iteration with one piece at a time
replaced by a shape-compatible stand-in; the delta is that piece's true
fused cost.

Arms (cumulative ablations re-add nothing; each arm ablates ONE piece):
  full       : the real _solve_step + cost + apply, scanned n_iter times
  no_vinv    : Vinv := V (skip the closed-form 3x3 inverse)
  no_cross   : S_cross := 0 (skip the (W,6,W,6) double contraction)
  no_chol    : dxi := -b (skip Cholesky + cho_solve)
  no_jac     : Jp/Jx := broadcast constants (skip jacobian construction)
  no_cost    : skip the accept/reject cost evaluation
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend import ba as ba_mod  # noqa: E402
from visual_slam_tpu.backend.ba import BAProblem, _EPS  # noqa: E402

REPS = 3


def make_problem(rng, W, M):
    T = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    T[:, :3, 3] = rng.normal(0, 0.3, (W, 3))
    pts = rng.uniform(-5, 5, (M, 3)).astype(np.float32) + [0, 0, 12]
    uv = rng.normal(0, 0.3, (M, W, 2)).astype(np.float32)
    obs = rng.uniform(size=(M, W)) < 0.6
    pose_valid = np.ones(W, bool)
    pose_fixed = np.zeros(W, bool)
    pose_fixed[0] = True
    return BAProblem(
        T_w2c=jnp.asarray(T), points=jnp.asarray(pts), uv=jnp.asarray(uv),
        obs_valid=jnp.asarray(obs), pose_valid=jnp.asarray(pose_valid),
        pose_fixed=jnp.asarray(pose_fixed),
    )


def build_solver(ablate):
    rj = ba_mod._residuals_and_jacobians

    def solve_step(T_w2c, X, uv, w_obs, pose_free, lam, huber):
        W = T_w2c.shape[0]
        r, Jp, Jx, in_front = rj(T_w2c, X, uv, w_obs > 0)
        if ablate == "no_jac":
            Jp = jnp.ones_like(Jp) * 1e-3
            Jx = jnp.ones_like(Jx) * 1e-3
        rn = jnp.linalg.norm(r, axis=-1)
        hub = jnp.where(rn <= huber, 1.0, huber / jnp.maximum(rn, _EPS))
        w = w_obs * hub * in_front
        Jp = Jp * pose_free[None, :, None, None]
        Jpw = Jp * w[..., None, None]
        U = jnp.einsum("mwai,mwaj->wij", Jpw, Jp)
        V = jnp.einsum("mwai,mw,mwaj->mij", Jx, w, Jx)
        Y = jnp.einsum("mwai,mwaj->mwij", Jpw, Jx)
        gp = jnp.einsum("mwai,mwa->wi", Jpw, r)
        gx = jnp.einsum("mwai,mw,mwa->mi", Jx, w, r)
        U = U + lam * jnp.eye(6)[None]
        V = V + lam * jnp.eye(3)[None]
        if ablate == "no_vinv":
            Vinv = V
        else:
            Vinv = ba_mod._inv3x3(V)
        T_blk = jnp.einsum("mwij,mjk->mwik", Y, Vinv)
        if ablate == "no_cross":
            S_cross = jnp.zeros((W, 6, W, 6))
        else:
            S_cross = jnp.einsum("muik,mvjk->uivj", T_blk, Y)
        b_local = -jnp.einsum("mwik,mk->wi", T_blk, gx)
        b = gp + b_local
        S = jnp.zeros((W, 6, W, 6)).at[jnp.arange(W), :, jnp.arange(W), :].add(U) - S_cross
        free = pose_free
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[jnp.arange(W), :, jnp.arange(W), :].add(
            jnp.eye(6)[None] * (1.0 - free)[:, None, None]
        )
        b = b * free[:, None]
        if ablate == "no_chol":
            dxi = -b
        else:
            Sd = S.reshape(W * 6, W * 6)
            L = jnp.linalg.cholesky(Sd)
            dxi = -jax.scipy.linalg.cho_solve(
                (L, True), b.reshape(W * 6)
            ).reshape(W, 6)
        YtdP = jnp.einsum("mwij,wi->mj", Y, dxi)
        dX = -jnp.einsum("mij,mj->mi", Vinv, gx + YtdP)
        return dxi, dX

    def solve(problem, n_iter=20, huber=5e-3, lam0=1e-3):
        w_obs = problem.obs_valid.astype(jnp.float32)
        pose_free = (problem.pose_valid & ~problem.pose_fixed).astype(jnp.float32)

        def cost_of(T, X):
            r, _, _, in_front = rj(T, X, problem.uv, w_obs > 0)
            return ba_mod._cost(r, w_obs, in_front, huber)

        def body(carry, _):
            T, X, lam, c = carry
            dxi, dX = solve_step(T, X, problem.uv, w_obs, pose_free, lam, huber)
            T_new, X_new = ba_mod._apply_step(T, X, dxi, dX)
            if ablate == "no_cost":
                c_new = c * 0.999
            else:
                c_new = cost_of(T_new, X_new)
            accept = c_new < c
            T = jnp.where(accept, T_new, T)
            X = jnp.where(accept, X_new, X)
            c = jnp.where(accept, c_new, c)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            return (T, X, lam, c), None

        c0 = cost_of(problem.T_w2c, problem.points)
        (T, X, lam, c), _ = jax.lax.scan(
            body, (problem.T_w2c, problem.points, jnp.asarray(lam0), c0),
            None, length=n_iter,
        )
        return T, X, c

    return jax.jit(solve, static_argnames=("n_iter",))


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    for (W, M) in ((32, 4096), (32, 2048)):
        problem = make_problem(rng, W, M)
        base = None
        row = [f"W={W} M={M}:"]
        for arm in ("full", "no_vinv", "no_cross", "no_chol", "no_jac",
                    "no_cost"):
            fn = build_solver(arm)
            out = fn(problem)
            float(out[2])  # value fetch: block_until_ready does NOT wait
            t0 = time.perf_counter()  # through the axon relay (q_ba_real_check)
            for _ in range(REPS):
                out = fn(problem)
                float(out[2])
            ms = (time.perf_counter() - t0) / REPS * 1e3
            if arm == "full":
                base = ms
                row.append(f"full={ms:7.1f}")
            else:
                row.append(f"{arm}={ms:7.1f}(d{base - ms:+6.1f})")
        print("  ".join(row) + "  (ms/20-iter solve)", flush=True)


if __name__ == "__main__":
    main()
