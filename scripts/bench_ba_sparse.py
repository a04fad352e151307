"""A/B: dense (M, W) grid vs sparse (M, K) landmark-major BA on TPU.

Realistic full-pipeline shapes: W = pose bucket floor, M = 4096 landmarks,
track length ~4 (the sprite world's decay horizon), obs_cap K = 16.
Times scan-wrapped repeated application to beat relay dispatch inflation.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend.ba import (  # noqa: E402
    BAProblem,
    BASparse,
    bundle_adjust,
    bundle_adjust_sparse,
)


def make_problem(W, M, K, track_len=4, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-4, 4, M), rng.uniform(-3, 3, M), rng.uniform(8, 16, M)
    ], axis=1).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    for w in range(W):
        T[w, :3, 3] = [-0.3 * w, 0.0, 0.0]
    # Each landmark observed by track_len consecutive poses.
    start = rng.integers(0, max(W - track_len, 1), M)
    uv_d = np.zeros((M, W, 2), np.float32)
    valid_d = np.zeros((M, W), bool)
    uv_s = np.zeros((M, K, 2), np.float32)
    pose_s = np.zeros((M, K), np.int32)
    valid_s = np.zeros((M, K), bool)
    for i in range(M):
        for k in range(track_len):
            j = int(start[i]) + k
            pc = T[j, :3, :3] @ pts[i] + T[j, :3, 3]
            ob = pc[:2] / pc[2] + rng.normal(0, 5e-4, 2)
            uv_d[i, j] = ob
            valid_d[i, j] = True
            uv_s[i, k] = ob
            pose_s[i, k] = j
            valid_s[i, k] = True
    pose_valid = np.ones(W, bool)
    pose_fixed = np.zeros(W, bool)
    pose_fixed[0] = True
    dense = BAProblem(
        T_w2c=jnp.asarray(T), points=jnp.asarray(pts + 0.02),
        uv=jnp.asarray(uv_d), obs_valid=jnp.asarray(valid_d),
        pose_valid=jnp.asarray(pose_valid), pose_fixed=jnp.asarray(pose_fixed),
    )
    sparse = BASparse(
        T_w2c=jnp.asarray(T), points=jnp.asarray(pts + 0.02),
        uv=jnp.asarray(uv_s), obs_pose=jnp.asarray(pose_s),
        obs_valid=jnp.asarray(valid_s),
        pose_valid=jnp.asarray(pose_valid), pose_fixed=jnp.asarray(pose_fixed),
    )
    return dense, sparse


def time_solver(fn, problem, n_iter, reps=5):
    out = fn(problem, n_iter=n_iter)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(problem, n_iter=n_iter)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    print("device:", jax.devices()[0].device_kind)
    for W, M, K in [(16, 1024, 16), (32, 4096, 16), (64, 4096, 16)]:
        dense, sparse = make_problem(W, M, K)
        ms_d, out_d = time_solver(bundle_adjust, dense, n_iter=20)
        ms_s, out_s = time_solver(bundle_adjust_sparse, sparse, n_iter=20)
        cd, cs = float(out_d[2]["cost"]), float(out_s[2]["cost"])
        dT = float(jnp.max(jnp.abs(out_d[0] - out_s[0])))
        print(
            f"W={W:3d} M={M:5d} K={K}: dense {ms_d:8.2f} ms  "
            f"sparse {ms_s:8.2f} ms  speedup {ms_d / ms_s:5.1f}x  "
            f"cost d/s {cd:.3e}/{cs:.3e}  maxT diff {dT:.2e}"
        )


if __name__ == "__main__":
    main()
