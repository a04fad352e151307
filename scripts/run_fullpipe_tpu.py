"""Run ONLY the full-pipeline bench configuration (for fast A/Bs on the
attached device): python scripts/run_fullpipe_tpu.py [chunk] [dtype]"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import logging
import numpy as np

import bench


def run(chunk=8, dtype="u8", n_frames=64, async_ba=False, heavy_every=1,
        devpromo=False, pose_floor=None, compact=None, n_iter=None,
        point_floor=None):
    import time

    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.config import Config
    from visual_slam_tpu.models import CompiledSLAM
    from visual_slam_tpu.utils.metrics import ate_rmse

    frames, K_np, Ts_gt = bench.synth_kitti_frames(
        n_frames=n_frames, seed=3, step=0.6, n_sprites=1500
    )
    if dtype == "u8":
        frames = [np.clip(f, 0, 255).astype(np.uint8) for f in frames]
    cfg = Config()
    if dtype == "f16":
        cfg.tracking.upload_f16 = True
    if async_ba == "boundary":
        cfg.tracking.async_boundary = True
    if compact is not None:
        cfg.tracking.compact_fetch_promos = compact
    cfg.feature.num_features = 2000
    cfg.tracking.keyframe_interval = 4
    cfg.tracking.chunk_size = chunk
    cfg.tracking.heavy_boundary_every = heavy_every
    cfg.tracking.device_promotion = devpromo
    cfg.optimization.max_points = 4096
    cfg.optimization.async_ba = async_ba is True
    if devpromo:
        # Device promotion mints more keyframes/landmarks than the host
        # boundary path (19 KFs / ~1300 landmarks on this sequence), which
        # blows the default (16, 1024) BA bucket floors MID-RUN — each
        # fresh shape is a 7-13 s compile inside the timed window. Hold ONE
        # shape for the whole run: global BA while <= 2x16 keyframes with
        # floors (64, 4096).
        cfg.optimization.window_size = 16
        cfg.optimization.pose_bucket_floor = pose_floor or 64
        cfg.optimization.point_bucket_floor = point_floor or 4096
    if n_iter is not None:
        cfg.optimization.n_iter = n_iter
    cfg.initialization.min_inliers = 100
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0],
                        K=np.asarray(K_np, np.float64))
    slam = CompiledSLAM(cam, cfg)
    slam.logger.setLevel(logging.DEBUG)
    logging.basicConfig(level=logging.DEBUG)
    i = 0
    while slam.state.name != "OK" and i < 6:
        slam.track([frames[i]], timestamp=i * 0.1)
        i += 1
    assert slam.state.name == "OK"
    # Warm through TWO full heavy-boundary cycles so every shape (chunk
    # scan, compaction, BA bucket) compiles before the timed window.
    warm_end = min(i + 2 * max(chunk, 4) * max(heavy_every, 1) + 1,
                   len(frames) - 2 * max(chunk, 8))
    while i < warm_end:
        slam.track([frames[i]], timestamp=i * 0.1)
        i += 1
    t0 = time.perf_counter()
    n_timed = 0
    for k in range(i, len(frames)):
        info = slam.track([frames[k]], timestamp=k * 0.1)
        if "n_inliers" in info:
            print(f"frame {k}: {info}", flush=True)
        n_timed += 1
    slam.flush()
    dt = time.perf_counter() - t0
    ts, Ts = slam.trajectory()
    idx = [int(round(t / 0.1)) for t in ts]
    est = np.stack([-T[:3, :3].T @ T[:3, 3] for T in Ts])
    gt = np.stack([-Ts_gt[j][:3, :3].T @ Ts_gt[j][:3, 3] for j in idx])
    res = ate_rmse(est, gt, align_scale=True)
    path_len = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
    print(
        f"RESULT chunk={chunk} dtype={dtype} async={async_ba} heavy_every={heavy_every} devpromo={devpromo} pose_floor={pose_floor} compact={compact} n_iter={n_iter} point_floor={point_floor}: fps={n_timed/dt:.2f} "
        f"ate_pct={100*res['rmse']/path_len:.3f} kfs={slam.map.num_keyframes()} "
        f"landmarks={slam.map.num_map_points()} state={slam.state.name}",
        flush=True,
    )


if __name__ == "__main__":
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = sys.argv[2] if len(sys.argv) > 2 else "u8"
    async_ba = "async" in sys.argv[3:]
    if "asyncb" in sys.argv[3:]:
        async_ba = "boundary"
    devpromo = "devpromo" in sys.argv[3:]
    heavy_every = 1
    pose_floor = None
    compact = None
    n_iter = None
    point_floor = None
    for a in sys.argv[3:]:
        if a.startswith("heavy"):
            heavy_every = int(a[5:])
        if a.startswith("pf"):
            pose_floor = int(a[2:])
        if a.startswith("compact"):
            compact = int(a[7:])
        if a.startswith("niter"):
            n_iter = int(a[5:])
        if a.startswith("mf"):
            point_floor = int(a[2:])
    run(chunk, dtype, async_ba=async_ba, heavy_every=heavy_every,
        devpromo=devpromo, pose_floor=pose_floor, compact=compact,
        n_iter=n_iter, point_floor=point_floor)
