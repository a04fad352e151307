"""Data-parallel multi-sequence VO demo (BASELINE.json config 5): B synthetic
sequences tracked simultaneously through the fused pipeline, batch axis
sharded over the device mesh.

  python examples/multiseq_demo.py [--batch 4] [--frames 10]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--features", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from render import make_world, render, camera_path
    from visual_slam_tpu.ops.detector import detect_and_describe
    from visual_slam_tpu.parallel import make_mesh
    from visual_slam_tpu.parallel.multiseq import make_batched_vo, shard_batch
    from visual_slam_tpu.pipeline import init_track_state

    B = args.batch
    W, H, f = 320, 240, 260.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]], np.float32)
    rng = np.random.default_rng(0)

    # B independent worlds + paths.
    worlds = [make_world(np.random.default_rng(s)) for s in range(B)]
    paths = [camera_path(args.frames, step=0.25) for _ in range(B)]
    seqs = [
        [render(w, T, K, W, H) for T in Ts] for w, Ts in zip(worlds, paths)
    ]

    # Per-sequence reference state from frame 0 (ray-at-depth landmarks).
    NF = args.features
    states = []
    Kinv = np.linalg.inv(K)
    for b in range(B):
        feats = detect_and_describe(
            jnp.asarray(seqs[b][0]), num_features=NF, threshold=12.0, n_levels=2, grid=4
        )
        xy = np.asarray(feats.xy)
        pw = worlds[b]["pts"]
        uv = (pw[:, :2] / pw[:, 2:3]) @ K[:2, :2].T + K[:2, 2]
        lm = np.zeros((NF, 3), np.float32)
        has = np.zeros(NF, bool)
        for i in np.nonzero(np.asarray(feats.valid))[0]:
            d = np.linalg.norm(uv - xy[i], axis=1)
            j = int(d.argmin())
            if d[j] < 6.0:
                lm[i] = (Kinv @ np.array([xy[i, 0], xy[i, 1], 1.0])) * pw[j, 2]
                has[i] = True
        states.append(init_track_state(feats, lm, has, np.eye(4), seed=b))

    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    # Shard over at most B devices (sharding needs batch % devices == 0).
    n_dev = len(jax.devices())
    use = n_dev
    while args.batch % use:
        use -= 1
    mesh = make_mesh("seq", devices=jax.devices()[:use])
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} {jax.devices()[0].platform} devices")
    batched = shard_batch(mesh, "seq", batched)
    step = make_batched_vo(
        jnp.asarray(K), mesh, num_features=NF, fast_threshold=12.0, n_levels=2,
        grid=4, pnp_hypotheses=64,
    )

    imgs0 = jnp.asarray(np.stack([s[1] for s in seqs]))
    s, out = step(batched, imgs0)  # compile
    jax.block_until_ready(out.T_w2c)
    t0 = time.perf_counter()
    n = 0
    for i in range(1, args.frames):
        imgs = jnp.asarray(np.stack([sq[i] for sq in seqs]))
        s, out = step(s, imgs)
        n += 1
    jax.block_until_ready(out.T_w2c)
    dt = time.perf_counter() - t0
    print(f"{B} sequences x {n} steps in {dt:.2f}s = {B * n / dt:.1f} frame-tracks/s")
    print("final inliers per sequence:", np.asarray(out.n_inliers))


if __name__ == "__main__":
    main()
