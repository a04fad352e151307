"""Honest dense-vs-sparse BA timing on the SHIPPED solvers (post relower).

Harness: N back-to-back dispatches of the jitted solve, ONE value fetch
from the last output — the only barrier the relay honors (CLAUDE.md; the
lax.scan rep harness adds a ~400 ms one-time in-program cost at M=4096,
q_ba_cliff_quick.log, so every scan-rep number is inflated by ~100 ms/rep
at REPS=4).

Usage: python scripts/bench_ba_honest.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend.ba import (  # noqa: E402
    BAProblem, BASparse, bundle_adjust, bundle_adjust_sparse,
)

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


def to_sparse(p, K):
    """Top-K observations per landmark from the dense problem."""
    M, W = p.uv.shape[:2]
    obs = np.asarray(p.obs_valid)
    uv = np.asarray(p.uv)
    obs_pose = np.zeros((M, K), np.int32)
    uv_s = np.zeros((M, K, 2), np.float32)
    valid = np.zeros((M, K), bool)
    for m in range(M):
        idx = np.nonzero(obs[m])[0][:K]
        obs_pose[m, : len(idx)] = idx
        uv_s[m, : len(idx)] = uv[m, idx]
        valid[m, : len(idx)] = True
    return BASparse(
        T_w2c=p.T_w2c, points=p.points, uv=jnp.asarray(uv_s),
        obs_pose=jnp.asarray(obs_pose), obs_valid=jnp.asarray(valid),
        pose_valid=p.pose_valid, pose_fixed=p.pose_fixed,
    )


def timed(solve, problem, n_iter=20):
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
    for (W, M, K) in [(16, 1024, 16), (32, 2048, 16), (32, 4096, 16),
                      (64, 4096, 16)]:
        p = make_problem(rng, W, M)
        sp = to_sparse(p, K)
        ms_d = timed(bundle_adjust, p, 20)
        ms_s = timed(bundle_adjust_sparse, sp, 20)
        # FLOP-parity note: the sparse problem carries <= M*K of the dense
        # problem's ~0.6*M*W observations, so at W=64 it does ~2.4x less
        # residual work — the comparison is capacity-per-wall, not parity.
        print(
            f"W={W:3d} M={M:5d}: dense {ms_d:8.2f} ms   "
            f"sparse(K={K}) {ms_s:8.2f} ms", flush=True,
        )


if __name__ == "__main__":
    main()
