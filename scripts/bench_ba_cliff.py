"""Root-cause the dense-BA M-cliff (VERDICT r4 #3) with a CUMULATIVE
ablation: the r4 one-at-a-time ablation (q_ba_ablation2.log) attributed
only ~48 of the 121 ms @ W32/M4096 because shared subexpressions survive
single-piece stand-ins. Here each arm is the REAL LM iteration truncated
after stage k (later stages replaced by shape-compatible cheap reductions
of what exists so far), so consecutive deltas decompose the whole wall.

Also measured:
  * a landmark-CHUNKED solve (lax.scan over M-chunks accumulating the pose
    blocks, landmarks back-substituted in a second chunk pass) — the fix
    candidate if the cliff is HBM traffic of (M, W, ...) intermediates;
  * blocked-fetch vs scan-amortized reconciliation (VERDICT r4 weak #5):
    n_iter scaling + dispatch-N-fetch-one.

Usage: python scripts/bench_ba_cliff.py [quick]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend import ba as ba_mod  # noqa: E402
from visual_slam_tpu.backend.ba import BAProblem, _EPS  # noqa: E402

REPS = 8


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


# --------------------------------------------------------------- cumulative
STAGES = [
    "rj", "weights", "uvgp", "vinv", "y", "tblk", "cross", "chol", "cost",
]


def build_cumulative(stage):
    """The real iteration truncated after ``stage``; everything later is a
    cheap reduction of live values so the data dependence chain survives."""
    upto = STAGES.index(stage)
    rj = ba_mod._residuals_and_jacobians

    def solve_step(T_w2c, X, uv, w_obs, pose_free, lam, huber):
        W = T_w2c.shape[0]
        r, Jp, Jx, in_front = rj(T_w2c, X, uv, w_obs > 0)
        if upto < 1:  # rj only
            dxi = 1e-6 * jnp.sum(r) * jnp.ones((W, 6))
            dxi += 1e-9 * (jnp.sum(Jp) + jnp.sum(Jx))
            dX = 1e-6 * jnp.sum(r, axis=(1, 2))[:, None] * jnp.ones((1, 3))
            return dxi, dX
        w = w_obs * ba_mod._robust_weights(r, huber) * in_front
        Jp = Jp * pose_free[None, :, None, None]
        if upto < 2:  # + weights
            dxi = 1e-6 * jnp.sum(w) * jnp.ones((W, 6))
            dxi += 1e-9 * (jnp.sum(Jp) + jnp.sum(Jx))
            dX = 1e-6 * jnp.sum(w, axis=1)[:, None] * jnp.ones((1, 3))
            return dxi, dX
        U = jnp.einsum("mwai,mw,mwaj->wij", Jp, w, Jp)
        V = jnp.einsum("mwai,mw,mwaj->mij", Jx, w, Jx)
        gp = jnp.einsum("mwai,mw,mwa->wi", Jp, w, r)
        gx = jnp.einsum("mwai,mw,mwa->mi", Jx, w, r)
        U = U + lam * jnp.eye(6)[None]
        V = V + lam * jnp.eye(3)[None]
        if upto < 3:  # + U/V/gp/gx
            dxi = -1e-3 * gp + 1e-9 * jnp.sum(U) * jnp.ones((W, 6))
            dX = -1e-3 * gx + 1e-9 * jnp.sum(V) * jnp.ones((1, 3))
            return dxi, dX
        Vinv = ba_mod._inv3x3(V)
        if upto < 4:  # + vinv
            dxi = -1e-3 * gp
            dX = -jnp.einsum("mij,mj->mi", Vinv, gx)
            return dxi, dX
        Y = jnp.einsum("mwai,mw,mwaj->mwij", Jp, w, Jx)
        if upto < 5:  # + Y
            dxi = -1e-3 * gp + 1e-9 * jnp.sum(Y) * jnp.ones((W, 6))
            dX = -jnp.einsum("mij,mj->mi", Vinv, gx)
            return dxi, dX
        T_blk = jnp.einsum("mwij,mjk->mwik", Y, Vinv)
        b_local = -jnp.einsum("mwik,mk->wi", T_blk, gx)
        b = gp + b_local
        if upto < 6:  # + T_blk/b
            dxi = -1e-3 * b
            YtdP = jnp.einsum("mwij,wi->mj", Y, dxi)
            dX = -jnp.einsum("mij,mj->mi", Vinv, gx + YtdP)
            return dxi, dX
        S_cross = jnp.einsum("muik,mvjk->uivj", T_blk, Y)
        S = jnp.zeros((W, 6, W, 6)).at[
            jnp.arange(W), :, jnp.arange(W), :
        ].add(U) - S_cross
        free = pose_free
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[jnp.arange(W), :, jnp.arange(W), :].add(
            jnp.eye(6)[None] * (1.0 - free)[:, None, None]
        )
        b = b * free[:, None]
        if upto < 7:  # + cross
            dxi = -1e-3 * b + 1e-9 * jnp.sum(S) * jnp.ones((W, 6))
            YtdP = jnp.einsum("mwij,wi->mj", Y, dxi)
            dX = -jnp.einsum("mij,mj->mi", Vinv, gx + YtdP)
            return dxi, dX
        Sd = S.reshape(W * 6, W * 6)
        L = jnp.linalg.cholesky(Sd)
        dxi = -jax.scipy.linalg.cho_solve((L, True), b.reshape(W * 6)).reshape(W, 6)
        YtdP = jnp.einsum("mwij,wi->mj", Y, dxi)
        dX = -jnp.einsum("mij,mj->mi", Vinv, gx + YtdP)
        return dxi, dX  # upto >= 7: full linear algebra

    def solve(problem, n_iter, huber=5e-3, lam0=1e-3):
        w_obs = problem.obs_valid.astype(jnp.float32)
        pose_free = (problem.pose_valid & ~problem.pose_fixed).astype(jnp.float32)

        def cost_of(T, X):
            r, _, _, in_front = rj(T, X, problem.uv, w_obs > 0)
            return ba_mod._cost(r, w_obs, in_front, huber)

        def body(carry, _):
            T, X, lam, c = carry
            dxi, dX = solve_step(T, X, problem.uv, w_obs, pose_free, lam, huber)
            T_new, X_new = ba_mod._apply_step(T, X, dxi, dX)
            if upto < 8:
                c_new = c * 0.999 + 1e-12 * jnp.sum(dX)
            else:
                c_new = cost_of(T_new, X_new)
            accept = c_new < c
            T = jnp.where(accept, T_new, T)
            X = jnp.where(accept, X_new, X)
            c = jnp.where(accept, c_new, c)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            return (T, X, lam, c), None

        c0 = jnp.float32(1e6)
        (T, X, lam, c), _ = jax.lax.scan(
            body, (problem.T_w2c, problem.points, jnp.asarray(lam0), c0),
            None, length=n_iter,
        )
        return T, X, c

    return solve


# ----------------------------------------------------- landmark-chunked fix
def solve_chunked(problem, n_iter, n_chunks, huber=5e-3, lam0=1e-3):
    """Full LM solve with the landmark axis processed in n_chunks scan
    steps: pass 1 accumulates the pose blocks (U, gp, S_cross, b), the tiny
    Schur system solves once, pass 2 recomputes per-chunk V/Y/gx for the
    landmark back-substitution. FLOPs ~1.4x the monolithic solve; HBM
    traffic drops from every (M, W, 2, 6)-class intermediate to the chunk
    working set."""
    rj = ba_mod._residuals_and_jacobians
    w_all = problem.obs_valid.astype(jnp.float32)
    pose_free = (problem.pose_valid & ~problem.pose_fixed).astype(jnp.float32)
    Wp = problem.T_w2c.shape[0]
    M = problem.points.shape[0]
    C = M // n_chunks
    uv_c = problem.uv.reshape(n_chunks, C, Wp, 2)
    w_c = w_all.reshape(n_chunks, C, Wp)

    def chunk_blocks(T, Xi, uvi, wi, lam, huber):
        r, Jp, Jx, in_front = rj(T, Xi, uvi, wi > 0)
        w = wi * ba_mod._robust_weights(r, huber) * in_front
        Jp = Jp * pose_free[None, :, None, None]
        V = jnp.einsum("mwai,mw,mwaj->mij", Jx, w, Jx) + lam * jnp.eye(3)[None]
        Vinv = ba_mod._inv3x3(V)
        Y = jnp.einsum("mwai,mw,mwaj->mwij", Jp, w, Jx)
        gx = jnp.einsum("mwai,mw,mwa->mi", Jx, w, r)
        return r, Jp, Jx, w, Vinv, Y, gx

    def solve_step(T, X, lam, huber):
        X_c = X.reshape(n_chunks, C, 3)

        def acc(carry, inp):
            U, gp, S_cross, b_local = carry
            Xi, uvi, wi = inp
            r, Jp, Jx, w, Vinv, Y, gx = chunk_blocks(T, Xi, uvi, wi, lam, huber)
            U = U + jnp.einsum("mwai,mw,mwaj->wij", Jp, w, Jp)
            gp = gp + jnp.einsum("mwai,mw,mwa->wi", Jp, w, r)
            T_blk = jnp.einsum("mwij,mjk->mwik", Y, Vinv)
            S_cross = S_cross + jnp.einsum("muik,mvjk->uivj", T_blk, Y)
            b_local = b_local - jnp.einsum("mwik,mk->wi", T_blk, gx)
            return (U, gp, S_cross, b_local), None

        zeros = (
            jnp.zeros((Wp, 6, 6)), jnp.zeros((Wp, 6)),
            jnp.zeros((Wp, 6, Wp, 6)), jnp.zeros((Wp, 6)),
        )
        (U, gp, S_cross, b_local), _ = jax.lax.scan(
            acc, zeros, (X_c, uv_c, w_c)
        )
        U = U + lam * jnp.eye(6)[None]
        b = gp + b_local
        S = jnp.zeros((Wp, 6, Wp, 6)).at[
            jnp.arange(Wp), :, jnp.arange(Wp), :
        ].add(U) - S_cross
        free = pose_free
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[jnp.arange(Wp), :, jnp.arange(Wp), :].add(
            jnp.eye(6)[None] * (1.0 - free)[:, None, None]
        )
        b = b * free[:, None]
        Sd = S.reshape(Wp * 6, Wp * 6)
        L = jnp.linalg.cholesky(Sd)
        dxi = -jax.scipy.linalg.cho_solve(
            (L, True), b.reshape(Wp * 6)
        ).reshape(Wp, 6)

        def back(_, inp):
            Xi, uvi, wi = inp
            r, Jp, Jx, w, Vinv, Y, gx = chunk_blocks(T, Xi, uvi, wi, lam, huber)
            YtdP = jnp.einsum("mwij,wi->mj", Y, dxi)
            dXi = -jnp.einsum("mij,mj->mi", Vinv, gx + YtdP)
            return 0, dXi

        _, dX_c = jax.lax.scan(back, 0, (X_c, uv_c, w_c))
        return dxi, dX_c.reshape(M, 3)

    def cost_of(T, X):
        r, _, _, in_front = rj(T, X, problem.uv, w_all > 0)
        return ba_mod._cost(r, w_all, in_front, huber)

    def body(carry, _):
        T, X, lam, c = carry
        dxi, dX = solve_step(T, X, lam, huber)
        T_new, X_new = ba_mod._apply_step(T, X, dxi, dX)
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


def timed(fn, problem, n_iter, label):
    """Scan-wrapped REPS problems inside one program, value fetch."""
    stacked = jax.tree.map(
        lambda x: jnp.stack([x] * REPS), problem
    )

    @partial(jax.jit, static_argnames=("n_iter",))
    def many(probs, n_iter):
        def body(_, p):
            T, X, c = fn(p, n_iter)
            return 0, c

        _, cs = jax.lax.scan(body, 0, probs)
        return cs

    cs = many(stacked, n_iter)
    float(cs[0])  # compile + drain
    t0 = time.perf_counter()
    cs = many(stacked, n_iter)
    _ = float(cs[-1])
    ms = (time.perf_counter() - t0) * 1e3 / REPS
    return ms


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev}", flush=True)
    n_iter = 20

    grid = [(32, 4096)] if quick else [(16, 1024), (32, 2048), (32, 4096), (64, 4096)]
    for (W, M) in grid:
        p = make_problem(rng, W, M)
        prev = 0.0
        out = []
        for st in STAGES:
            fn = lambda pr, ni, _st=st: build_cumulative(_st)(pr, ni)
            ms = timed(fn, p, n_iter, st)
            out.append(f"{st}={ms:7.2f}(d{ms - prev:+7.2f})")
            prev = ms
        print(f"W={W} M={M} cumulative: " + "  ".join(out), flush=True)
        for nc in ([8] if quick else [4, 8, 16]):
            if M % nc:
                continue
            fn = lambda pr, ni, _nc=nc: solve_chunked(pr, ni, _nc)
            ms = timed(fn, p, n_iter, f"chunk{nc}")
            print(f"W={W} M={M} chunked x{nc}: {ms:7.2f} ms/solve", flush=True)

    # ---- weak #5 reconciliation: blocked vs scan vs n_iter scaling ----
    from visual_slam_tpu.backend.ba import bundle_adjust

    W, M = 10, 4096
    p = make_problem(rng, W, M)
    for ni in [20, 80]:
        _, _, info = bundle_adjust(p, n_iter=ni, huber=5e-3)
        float(info["cost"])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            _, _, info = bundle_adjust(p, n_iter=ni, huber=5e-3)
            _ = float(info["cost"])
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"blocked_fetch n_iter={ni}: med={np.median(ts):.1f} ms "
              f"(all {[round(t,1) for t in ts]})", flush=True)
    # dispatch-8-fetch-last: per-solve amortized incl. queue drain
    t0 = time.perf_counter()
    infos = [bundle_adjust(p, n_iter=20, huber=5e-3)[2] for _ in range(8)]
    _ = float(infos[-1]["cost"])
    print(f"dispatch8_fetch_last: {(time.perf_counter()-t0)*1e3/8:.1f} "
          f"ms/solve", flush=True)

    # scan-wrapped plain solve at 1 and 8 reps
    def plain(pr, ni):
        T, X, info = bundle_adjust(pr, n_iter=ni, huber=5e-3)
        return T, X, info["cost"]

    global REPS
    for reps_label, r in [("scan1", 1), ("scan8", 8)]:
        old, REPS = REPS, r
        ms = timed(plain, p, 20, reps_label)
        REPS = old
        print(f"{reps_label}: {ms:.1f} ms/solve", flush=True)


if __name__ == "__main__":
    main()
