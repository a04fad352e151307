"""Honest (value-fetched) cost of the fused track-chunk program at the
bench shape, with config-level ablations to attribute the unaccounted
compute (stage profile: ~15 ms/frame device compute vs ~7 ms/frame of
summed pieces).

Arms (each its own CompiledSLAM + compile):
  full      : bench config (devpromo, arena 4096, pnp 128)
  no_promo  : promotion gates set unreachable (isolates the in-chunk
              promote/triangulate/describe branch)
  no_guided : local_map_size=0 (isolates guided arena matching)
  pnp64     : half the RANSAC hypothesis batch

Timing: re-dispatch the SAME chunk on the same state REPS times, fetching
a scalar (sum of inliers) each rep — block_until_ready does NOT wait
through the relay (q_ba_real_check.log).
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench
from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.config import Config
from visual_slam_tpu.models import CompiledSLAM

REPS = 5
CHUNK = 8


def build(arm, frames, K_np):
    cfg = Config()
    cfg.feature.num_features = 2000
    cfg.tracking.keyframe_interval = 4
    cfg.tracking.chunk_size = CHUNK
    cfg.tracking.device_promotion = True
    cfg.tracking.heavy_boundary_every = 2
    cfg.tracking.upload_f16 = True
    cfg.optimization.max_points = 4096
    cfg.optimization.window_size = 16
    cfg.optimization.pose_bucket_floor = 32
    cfg.optimization.point_bucket_floor = 4096
    cfg.initialization.min_inliers = 100
    if arm == "no_promo":
        cfg.tracking.keyframe_interval = 10_000
        cfg.tracking.kf_min_matches = -1
    elif arm == "no_guided":
        cfg.tracking.local_map_size = 0
    elif arm == "pnp64":
        cfg.tracking.pnp_hypotheses = 64
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0],
                        K=np.asarray(K_np, np.float64))
    return CompiledSLAM(cam, cfg)


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0].device_kind, flush=True)
    # n_frames shapes the sprite-world span (synth_kitti_frames: span =
    # step*n_frames+20) — a 24-frame world is a DIFFERENT, init-hostile
    # world. Use the exact bench world.
    frames, K_np, _ = bench.synth_kitti_frames(
        n_frames=64, seed=3, step=0.6, n_sprites=1500
    )
    for arm in ("full", "no_promo", "no_guided", "pnp64"):
        slam = build(arm, frames, K_np)
        i = 0
        while slam.state.name != "OK" and i < 6:
            slam.track([frames[i]], timestamp=i * 0.1)
            i += 1
        if slam.state.name != "OK":
            print(f"{arm}: bootstrap failed", flush=True)
            continue
        # Feed frames until one full chunk has run (compiles the program).
        while slam._chunk is None or not hasattr(slam, "_track_state") or \
                len(slam._chunk_buf) != 0 or slam.num_frames_tracked() < i + CHUNK:
            slam.track([frames[i]], timestamp=i * 0.1)
            i += 1
            if i >= len(frames):
                break
        state = slam._track_state
        imgs = jnp.asarray(np.stack(
            [np.asarray(f, np.float16) for f in frames[8:8 + CHUNK]]
        ))
        fsr = np.int32(0)
        T_ref = np.asarray(slam._ref_kf.T_w2c, np.float32)
        # Warm this exact call.
        out = slam._chunk(state, fsr, T_ref, imgs, n_valid=CHUNK)
        _ = float(jnp.sum(out[3].n_inliers))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = slam._chunk(state, fsr, T_ref, imgs, n_valid=CHUNK)
            _ = float(jnp.sum(out[3].n_inliers))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{arm:10s}: {ms:7.1f} ms/chunk  ({ms / CHUNK:5.2f} ms/frame)",
              flush=True)


if __name__ == "__main__":
    main()
