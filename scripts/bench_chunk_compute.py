"""Isolate the DEVICE compute cost of one tracking chunk (no fetch): bare
fused-step scan vs plain chunk (make_track_chunk) vs devpromo chunk
(make_track_chunk_promote), 8 frames each, block_until_ready on a scalar
output only. Diagnoses the dg.compute_wait ~225 ms/chunk seen in the full
profile (scripts/profile_full_pipeline.py) — ~28 ms/frame vs the ~7 ms
fused-step headline.

Run on TPU: timeout 1800 python scripts/bench_chunk_compute.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timed(fn, n=10):
    import jax

    jax.block_until_ready(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from visual_slam_tpu.ops.detector import Features
    from visual_slam_tpu.pipeline import (
        TrackState,
        make_track_chunk,
        make_track_chunk_promote,
        make_track_step,
    )

    print("device:", jax.devices()[0])
    C = 8
    NF = 2000
    ARENA = 4096
    frames, K_np, Ts_gt = bench.synth_kitti_frames(
        n_frames=C + 1, seed=3, step=0.6, n_sprites=1500
    )
    H, W = frames[0].shape
    K = jnp.asarray(K_np, jnp.float32)
    step = make_track_step(
        K, num_features=NF, local_map=True, width=W, height=H,
        pnp_hypotheses=128,
    )
    chunk = make_track_chunk(step)
    chunk_promo = make_track_chunk_promote(step, K)

    rng = np.random.default_rng(0)
    feats = Features(
        xy=jnp.asarray(rng.uniform(16, min(H, W) - 16, (NF, 2)).astype(np.float32)),
        response=jnp.ones((NF,), jnp.float32),
        angle=jnp.zeros((NF,), jnp.float32),
        octave=jnp.zeros((NF,), jnp.int32),
        size=jnp.full((NF,), 31.0, jnp.float32),
        desc=jnp.asarray(rng.integers(0, 2**32, (NF, 8), dtype=np.uint32)),
        valid=jnp.ones((NF,), bool),
    )
    state = TrackState(
        ref_feats=feats,
        ref_landmarks=jnp.asarray(rng.normal(0, 5, (NF, 3)).astype(np.float32)),
        ref_has_landmark=jnp.ones((NF,), bool),
        T_w2c=jnp.eye(4, dtype=jnp.float32),
        T_rel=jnp.eye(4, dtype=jnp.float32),
        key=jax.random.PRNGKey(0),
        lm_pos=jnp.asarray(rng.normal(0, 5, (ARENA, 3)).astype(np.float32)),
        lm_desc=jnp.asarray(rng.integers(0, 2**32, (ARENA, 8), dtype=np.uint32)),
        lm_valid=jnp.ones((ARENA,), bool),
    )
    imgs = jnp.asarray(np.stack(frames[:C]))
    img1 = jnp.asarray(frames[0])

    # 1. Bare fused step, once (dispatch-inflation-prone; context only).
    t_step1 = timed(lambda: step(state, img1)[1].n_inliers)
    print(f"single fused step (relay-inflated): {t_step1:.1f} ms")

    # 2. Plain chunk of 8.
    t_plain = timed(lambda: chunk(state, imgs)[1].n_inliers)
    print(f"plain chunk x{C}: {t_plain:.1f} ms = {t_plain / C:.2f} ms/frame")

    # 3. Devpromo chunk of 8.
    def run_promo():
        s, fsr, T_ref, outs, recs = chunk_promo(
            state, np.int32(0), np.asarray(np.eye(4), np.float32), imgs
        )
        return outs.n_inliers

    t_promo = timed(run_promo)
    print(f"devpromo chunk x{C}: {t_promo:.1f} ms = {t_promo / C:.2f} ms/frame")
    print(f"promotion overhead: {(t_promo - t_plain) / C:.2f} ms/frame")


if __name__ == "__main__":
    main()
