"""Dense-BA M-cliff fix A/B (VERDICT r4 #3), honest harness.

Findings feeding this (benchlogs/q_ba_cliff_quick.log):
  * Harness: a lax.scan over stacked problems adds a ~400 ms ONE-TIME
    in-program cost at M=4096 (scan1 = 463 ms vs dispatch8-fetch-last =
    43 ms for the SAME solve) — every scan-rep number this repo published
    for BA is harness-distorted. Honest amortizer: dispatch the jitted
    solve N times back-to-back, fetch one value from the LAST (device
    executes in order; sync cost /N).
  * Attribution (cumulative ablation, scan-harness relative deltas):
    T_blk/b_local/YtdP/dX — the batched per-landmark TINY matmuls
    ((M,W,6,3)x(M,3,3) etc.) — cost ~68 of ~100 ms; S_cross ~17 ms;
    everything else single-digit.

Fix arms (each a full bundle_adjust twin, cost-parity checked):
  base   : current ba._solve_step
  tiny   : T_blk / dX / YtdP / V / gx / Y as UNROLLED broadcast
           multiply-adds (VPU elementwise, fuses) instead of dot_general
           over 3-wide contractions (which lowers to padded per-m matmuls)
  cross2d: tiny + S_cross as an explicit (W6, M3)x(M3, W6) 2-D dot
           (transpose+reshape) instead of the rank-4 einsum

Usage: python scripts/bench_ba_fix.py
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend import ba as ba_mod  # noqa: E402
from visual_slam_tpu.backend.ba import BAProblem, bundle_adjust  # noqa: E402

N_DISPATCH = 8


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


def _solve_step_tiny(T_w2c, points, uv, w_obs, pose_free, lam, huber,
                     cross2d=False):
    """ba._solve_step with every 3-wide contraction unrolled to broadcast
    multiply-adds; optionally the cross term as an explicit 2-D dot."""
    M, W = uv.shape[:2]
    r, Jp, Jx, in_front = ba_mod._residuals_and_jacobians(
        T_w2c, points, uv, w_obs > 0
    )
    w = w_obs * ba_mod._robust_weights(r, huber) * in_front
    Jp = Jp * pose_free[None, :, None, None]
    Jpw = Jp * w[..., None, None]
    Jxw = Jx * w[..., None, None]

    # Contractions over the BIG m axis stay matmuls (MXU-correct).
    U = jnp.einsum("mwai,mwaj->wij", Jpw, Jp)
    gp = jnp.einsum("mwai,mwa->wi", Jpw, r)

    # V (M,3,3): unrolled symmetric outer-product reduction over (w, a).
    V = jnp.einsum("mwai,mwaj->mij", Jxw, Jx)  # contraction over w,a (64)
    # gx (M,3): reduction over (w,a) — keep einsum (free dim 3 is fine
    # when the contraction is over w,a and output is (M, 3)).
    gx = jnp.einsum("mwai,mwa->mi", Jxw, r)

    U = U + lam * jnp.eye(6)[None]
    V = V + lam * jnp.eye(3)[None]
    Vinv = ba_mod._inv3x3(V)

    # Y (M,W,6,3): unroll the 2-wide 'a' contraction.
    Y = (
        Jpw[:, :, 0, :, None] * Jx[:, :, 0, None, :]
        + Jpw[:, :, 1, :, None] * Jx[:, :, 1, None, :]
    )
    # T_blk = Y @ Vinv per landmark: unroll the 3-wide 'j' contraction.
    T_blk = (
        Y[:, :, :, 0, None] * Vinv[:, None, None, 0, :]
        + Y[:, :, :, 1, None] * Vinv[:, None, None, 1, :]
        + Y[:, :, :, 2, None] * Vinv[:, None, None, 2, :]
    )
    if cross2d:
        Tb2 = jnp.transpose(T_blk, (1, 2, 0, 3)).reshape(W * 6, M * 3)
        Y2 = jnp.transpose(Y, (1, 2, 0, 3)).reshape(W * 6, M * 3)
        S_cross = (Tb2 @ Y2.T).reshape(W, 6, W, 6)
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
    Sd = S.reshape(W * 6, W * 6)
    L = jnp.linalg.cholesky(Sd)
    dxi = -jax.scipy.linalg.cho_solve((L, True), b.reshape(W * 6)).reshape(W, 6)
    # YtdP (M,3): contraction over (w,i)=192 — keep as reshape matvec.
    YtdP = jnp.einsum("mwij,wi->mj", Y, dxi)
    g2 = gx + YtdP
    # dX = -Vinv @ g2 per landmark: unroll.
    dX = -(
        Vinv[:, :, 0] * g2[:, None, 0]
        + Vinv[:, :, 1] * g2[:, None, 1]
        + Vinv[:, :, 2] * g2[:, None, 2]
    )
    return dxi, dX


def make_variant(cross2d):
    @partial(jax.jit, static_argnames=("n_iter",))
    def solve(problem, n_iter=20, huber=5e-3, lam0=1e-3):
        w_obs = problem.obs_valid.astype(jnp.float32)
        pose_free = (problem.pose_valid & ~problem.pose_fixed).astype(jnp.float32)

        def cost_of(T, X):
            r, _, _, in_front = ba_mod._residuals_and_jacobians(
                T, X, problem.uv, w_obs > 0
            )
            return ba_mod._cost(r, w_obs, in_front, huber)

        def body(carry, _):
            T, X, lam, c = carry
            dxi, dX = _solve_step_tiny(
                T, X, problem.uv, w_obs, pose_free, lam, huber, cross2d=cross2d
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

    return solve


def timed_dispatch(solve, problem, n_iter=20):
    """Honest amortizer: N back-to-back dispatches, ONE value fetch from the
    last output (device executes in order; sync cost /N)."""
    _, _, info = solve(problem, n_iter=n_iter)
    float(info["cost"])  # compile + drain
    t0 = time.perf_counter()
    infos = [solve(problem, n_iter=n_iter)[2] for _ in range(N_DISPATCH)]
    _ = float(infos[-1]["cost"])
    return (time.perf_counter() - t0) * 1e3 / N_DISPATCH


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev}", flush=True)
    variants = [
        ("base", lambda p, n_iter: bundle_adjust(p, n_iter=n_iter, huber=5e-3)),
        ("tiny", make_variant(cross2d=False)),
        ("cross2d", make_variant(cross2d=True)),
    ]
    for (W, M) in [(16, 1024), (32, 2048), (32, 4096), (64, 4096)]:
        p = make_problem(rng, W, M)
        ref = None
        row = []
        for name, solve in variants:
            T, X, info = solve(p, n_iter=20)
            c = float(info["cost"])
            if ref is None:
                ref = (np.asarray(T), c)
            dT = float(np.abs(np.asarray(T) - ref[0]).max())
            ms = timed_dispatch(solve, p)
            row.append(f"{name}={ms:8.2f}ms(dT {dT:.1e}, c {c:.3e})")
        print(f"W={W:3d} M={M:5d}: " + "  ".join(row), flush=True)


if __name__ == "__main__":
    main()
