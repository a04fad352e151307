"""Honest bisection of the REAL dense BA solve on device.

profile_ba_pieces2 timed isolated einsums (each carried a ~0.4 ms scan
floor and used linalg.inv where production uses the closed-form _inv3x3)
and did NOT reproduce the measured 116-121 ms/solve. This profiler times
the production ``bundle_adjust`` itself — scan-wrapped back-to-back solves
with the final cost fetched (no async-dispatch mirage) — and then surgical
variants to bisect the per-iteration cost:

  full        production solve (cholesky + cho_solve Schur)
  lu          Schur solved with jnp.linalg.solve (LU) instead
  nocost      accept every step (no per-iteration cost evaluation)
  nochol      Schur step replaced by a fixed zero pose update (isolates
              everything downstream of the S build)
  iter5       n_iter=5 (linear-in-iterations check)

Run: timeout 1800 python scripts/profile_ba_pieces3.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend import ba  # noqa: E402
from scripts.bench_ba_sparse import make_problem  # noqa: E402


def timed_scan_solve(solve_fn, problem, n_iter, scan_reps=8, reps=3):
    """Mean ms per solve: scan over back-to-back solves (each seeded from
    the previous output so nothing is CSE'd away), final cost fetched."""

    @jax.jit
    def run(T0, X0):
        def body(carry, _):
            T, X = carry
            Tn, Xn, info = solve_fn(
                ba.BAProblem(
                    T_w2c=T, points=X, uv=problem.uv,
                    obs_valid=problem.obs_valid,
                    pose_valid=problem.pose_valid,
                    pose_fixed=problem.pose_fixed,
                ),
                n_iter=n_iter,
            )
            # Re-perturb so every solve does real work.
            return (Tn, Xn + 1e-4), info["cost"]
        (_, _), cs = jax.lax.scan(body, (T0, X0), None, length=scan_reps)
        return cs

    cs = run(problem.T_w2c, problem.points)
    float(cs[-1])  # block via value fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        cs = run(problem.T_w2c, problem.points)
        last = float(cs[-1])
    dt = (time.perf_counter() - t0) / reps / scan_reps * 1e3
    return dt, last


def make_variant(kind):
    """Return a bundle_adjust-compatible callable for the variant."""
    if kind == "full":
        return ba.bundle_adjust
    if kind == "lu":
        def solve_lu(problem, n_iter=20, huber=5e-3, lam0=1e-3):
            orig_chol = jnp.linalg.cholesky
            orig_cho = jax.scipy.linalg.cho_solve
            try:
                jnp.linalg.cholesky = lambda A: A
                jax.scipy.linalg.cho_solve = (
                    lambda LA, b: jnp.linalg.solve(LA[0], b)
                )
                return ba.bundle_adjust.__wrapped__(
                    problem, n_iter=n_iter, huber=huber, lam0=lam0
                )
            finally:
                jnp.linalg.cholesky = orig_chol
                jax.scipy.linalg.cho_solve = orig_cho
        return solve_lu
    if kind == "nocost":
        def solve_nocost(problem, n_iter=20, huber=5e-3, lam0=1e-3):
            w_obs = problem.obs_valid.astype(jnp.float32)
            pose_free = (
                problem.pose_valid & ~problem.pose_fixed
            ).astype(jnp.float32)

            def body(carry, _):
                T, X, lam = carry
                dxi, dX = ba._solve_step(
                    T, X, problem.uv, w_obs, pose_free, lam, huber
                )
                T, X = ba._apply_step(T, X, dxi, dX)
                return (T, X, lam), dxi.sum()
            (T, X, lam), ss = jax.lax.scan(
                body, (problem.T_w2c, problem.points, jnp.asarray(lam0)),
                None, length=n_iter,
            )
            return T, X, {"cost": ss[-1]}
        return jax.jit(solve_nocost, static_argnames=("n_iter",))
    if kind == "nochol":
        def solve_nochol(problem, n_iter=20, huber=5e-3, lam0=1e-3):
            w_obs = problem.obs_valid.astype(jnp.float32)
            pose_free = (
                problem.pose_valid & ~problem.pose_fixed
            ).astype(jnp.float32)
            orig_chol = jnp.linalg.cholesky
            orig_cho = jax.scipy.linalg.cho_solve
            try:
                # Identity "solve": keeps the S build + back-substitution,
                # removes the factorization/triangular solves.
                jnp.linalg.cholesky = lambda A: A
                jax.scipy.linalg.cho_solve = lambda LA, b: b * 1e-6

                def body(carry, _):
                    T, X, lam = carry
                    dxi, dX = ba._solve_step(
                        T, X, problem.uv, w_obs, pose_free, lam, huber
                    )
                    T, X = ba._apply_step(T, X, dxi, dX)
                    return (T, X, lam), dxi.sum()
                (T, X, lam), ss = jax.lax.scan(
                    body, (problem.T_w2c, problem.points, jnp.asarray(lam0)),
                    None, length=n_iter,
                )
                return T, X, {"cost": ss[-1]}
            finally:
                jnp.linalg.cholesky = orig_chol
                jax.scipy.linalg.cho_solve = orig_cho
        return jax.jit(solve_nochol, static_argnames=("n_iter",))
    raise ValueError(kind)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    shapes = [(16, 1024), (16, 4096), (32, 1024), (32, 4096)]
    for W, M in shapes:
        problem, _ = make_problem(W, M, K=16)
        row = [f"W={W:3d} M={M:5d}:"]
        for kind in ("full", "lu", "nocost", "nochol"):
            fn = make_variant(kind)
            ms, _ = timed_scan_solve(fn, problem, n_iter=20)
            row.append(f"{kind} {ms:8.2f}")
        ms5, _ = timed_scan_solve(ba.bundle_adjust, problem, n_iter=5)
        row.append(f"iter5 {ms5:8.2f}")
        print("  ".join(row) + "  (ms/solve, 20 iter unless noted)",
              flush=True)


if __name__ == "__main__":
    main()
