"""Bisect ransac_pnp on the real TPU at bench shapes (N=2000 points).

Which piece owns the ~4-8 ms/frame PnP leg: the vmapped minimal DLT fits
(12x12 eigh + 3x3 SVDs per hypothesis — tiny-batched linalg, the known-bad
TPU lowering), the vmapped 2-iter GN local optimization over all N points,
or the (H, N) scoring pass?  Scan-wrapped reps cancel relay dispatch
inflation (CLAUDE.md round-3 lesson).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.ops.pnp import (  # noqa: E402
    pnp_dlt,
    ransac_pnp,
    refine_pose_gn,
    _reproj_err2,
)
from visual_slam_tpu.ops.epipolar import _sample_minimal_sets  # noqa: E402

N = 2000
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


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    pts3d = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32)
                        + np.array([0, 0, 12], np.float32))
    R_gt = np.eye(3, dtype=np.float32)
    t_gt = np.array([0.1, -0.05, 0.2], np.float32)
    pc = np.asarray(pts3d) @ R_gt.T + t_gt
    xy = jnp.asarray((pc[:, :2] / pc[:, 2:3]).astype(np.float32)
                     + rng.normal(0, 1e-3, (N, 2)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=N) < 0.7)
    key = jax.random.PRNGKey(0)

    for H in (64, 128, 256):
        idx = _sample_minimal_sets(key, mask, H, 6)

        def fits(c, idx_):
            def fit(si):
                return pnp_dlt(pts3d[si], xy[si], jnp.ones(6, xy.dtype))
            Rs, ts = jax.vmap(fit)(idx_)
            return 1e-9 * (jnp.sum(Rs) + jnp.sum(ts)) + c * 0

        Rs0, ts0 = jax.vmap(
            lambda si: pnp_dlt(pts3d[si], xy[si], jnp.ones(6, xy.dtype))
        )(idx)

        def lo(c, Rs_, ts_):
            def one(R, t):
                return refine_pose_gn(R, t, pts3d, xy,
                                      mask.astype(xy.dtype), iters=2,
                                      huber=2e-2)
            Rs2, ts2 = jax.vmap(one)(Rs_ + c * 0, ts_)
            return 1e-9 * (jnp.sum(Rs2) + jnp.sum(ts2))

        def score(c, Rs_, ts_):
            errs = jax.vmap(lambda R, t: _reproj_err2(R, t, pts3d, xy))(
                Rs_ + c * 0, ts_)
            return 1e-9 * jnp.sum(jnp.minimum(errs, 1.0))

        def full(c, key_):
            res = ransac_pnp(pts3d, xy, mask, key_, n_hyp=H, thresh=5e-3)
            return 1e-9 * (jnp.sum(res["R"]) + res["n_inliers"]) + c * 0

        t_fit = timed(fits, idx)
        t_lo = timed(lo, Rs0, ts0)
        t_sc = timed(score, Rs0, ts0)
        t_full = timed(full, key)
        print(f"H={H:4d}: fit {t_fit:7.3f}  LO(2xGN) {t_lo:7.3f}  "
              f"score {t_sc:7.3f}  FULL {t_full:7.3f}  (ms)", flush=True)


if __name__ == "__main__":
    main()
