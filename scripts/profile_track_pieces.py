"""Scan-wrapped per-piece timing of the fused track step at bench shapes:
where do the ~9.5 ms/frame go? (detect / match / guided / RANSAC-PnP / GN).
Run on TPU; relay dispatch inflation cancels inside the scans."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from visual_slam_tpu.ops import orb  # noqa: E402
from visual_slam_tpu.ops.detector import detect_and_describe_with_sampling  # noqa: E402
from visual_slam_tpu.ops import matching as m_ops  # noqa: E402
from visual_slam_tpu.ops.guided_matching import guided_match  # noqa: E402
from visual_slam_tpu.ops.pnp import ransac_pnp, refine_pose_gn  # noqa: E402
from visual_slam_tpu.ops.projection import normalize_points  # noqa: E402

REPS = 20
K = 2000


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
    print("device:", jax.devices()[0].device_kind, flush=True)
    frames, K_np, _ = bench.synth_kitti_frames(n_frames=2, seed=3)
    img = jnp.asarray(frames[0])
    S = orb.sampling_matrix()
    stack = orb.sampling_stack()
    Km = jnp.asarray(K_np, jnp.float32)
    Kinv = jnp.asarray(np.linalg.inv(K_np), jnp.float32)

    feats = detect_and_describe_with_sampling(img, S, num_features=K, n_levels=4)
    jax.block_until_ready(feats.xy)

    t_det = timed_scan(
        lambda c: detect_and_describe_with_sampling(
            c, S, num_features=K, n_levels=4
        ).xy.sum() * 1e-9 + c,
        img,
    )
    t_det_ragged = timed_scan(
        lambda c: detect_and_describe_with_sampling(
            c, stack, num_features=K, n_levels=4
        ).xy.sum() * 1e-9 + c,
        img,
    )

    rng = np.random.default_rng(0)
    d2 = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint64).astype(np.uint32))
    a2 = jnp.asarray(rng.uniform(0, 2 * np.pi, K).astype(np.float32))
    v2 = jnp.ones(K, bool)

    t_match = timed_scan(
        lambda c: c + 1e-9 * m_ops.match_descriptors(
            feats.desc, d2, feats.valid, v2, feats.angle, a2,
            ratio=0.75, cross_check=True, use_orientation=True,
        )["train_idx"].sum().astype(jnp.float32),
        jnp.zeros(()),
    )

    pos = jnp.asarray(rng.uniform(-5, 5, (2 * K, 3)).astype(np.float32) + np.array([0, 0, 12], np.float32))
    lvalid = jnp.ones(2 * K, bool)
    T = jnp.eye(4)
    t_guided = timed_scan(
        lambda c: c + 1e-9 * guided_match(
            pos, jnp.concatenate([d2, d2]), lvalid, T, Km,
            feats.xy, feats.desc, feats.valid,
            float(img.shape[1]), float(img.shape[0]), 25.0,
        )["valid"].sum().astype(jnp.float32),
        jnp.zeros(()),
    )

    pts3d = jnp.asarray(rng.uniform(-4, 4, (K, 3)).astype(np.float32) + np.array([0, 0, 12], np.float32))
    xyn = normalize_points(Kinv, feats.xy)
    pvalid = jnp.ones(K, bool)
    key = jax.random.PRNGKey(0)
    t_pnp = timed_scan(
        lambda c: c + 1e-9 * ransac_pnp(
            pts3d, xyn, pvalid, key, n_hyp=256, thresh=3.0 / float(K_np[0, 0])
        )["n_inliers"].astype(jnp.float32),
        jnp.zeros(()),
    )
    R0 = jnp.eye(3)
    t0v = jnp.zeros(3)
    t_gn = timed_scan(
        lambda c: c + 1e-9 * refine_pose_gn(
            R0, t0v, pts3d, xyn, pvalid.astype(jnp.float32), iters=10,
            huber=3.0 / float(K_np[0, 0]),
        )[1].sum(),
        jnp.zeros(()),
    )
    print(
        f"detect(dense) {t_det:6.2f}  detect(ragged) {t_det_ragged:6.2f}  "
        f"match {t_match:6.2f}  guided {t_guided:6.2f}  pnp256 {t_pnp:6.2f}  "
        f"gn10 {t_gn:6.2f}  (ms)"
    )


if __name__ == "__main__":
    main()
