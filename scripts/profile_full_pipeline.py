"""Per-stage wall-clock breakdown of the bench full-pipeline loop on the
attached device. Monkeypatch-wraps CompiledSLAM internals with StageTimer so
the bench path itself is unchanged. Run on TPU (background, generous
timeout):

    timeout 1800 python scripts/profile_full_pipeline.py
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench
from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.config import Config
from visual_slam_tpu.models import CompiledSLAM
from visual_slam_tpu.utils.profiling import StageTimer

TIMER = StageTimer()


def timed(name):
    def deco(fn):
        @functools.wraps(fn)
        def wrap(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                TIMER.add(name, time.perf_counter() - t0)
        return wrap
    return deco


def main():
    import jax

    print("device:", jax.devices()[0])
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    devpromo = "devpromo" in sys.argv[2:]
    heavy_every = 1
    pose_floor = None
    point_floor = None
    for a in sys.argv[2:]:
        if a.startswith("heavy"):
            heavy_every = int(a[5:])
        if a.startswith("pf"):
            pose_floor = int(a[2:])
        if a.startswith("mf"):
            point_floor = int(a[2:])
    num_features = 2000
    frames, K_np, Ts_gt = bench.synth_kitti_frames(
        n_frames=80, seed=3, step=0.6, n_sprites=1500
    )
    cfg = Config()
    cfg.feature.num_features = num_features
    cfg.tracking.keyframe_interval = 4
    cfg.tracking.chunk_size = chunk
    cfg.tracking.device_promotion = devpromo
    cfg.tracking.heavy_boundary_every = heavy_every
    if "f16" in sys.argv[2:]:
        cfg.tracking.upload_f16 = True
    if "asyncb" in sys.argv[2:]:
        cfg.tracking.async_boundary = True
    cfg.optimization.max_points = 4096
    if devpromo:
        # Match run_fullpipe_tpu.py: hold ONE BA shape for the whole run.
        cfg.optimization.window_size = 16
        cfg.optimization.pose_bucket_floor = pose_floor or 64
        cfg.optimization.point_bucket_floor = (
            4096 if point_floor is None else point_floor
        )
    cfg.initialization.min_inliers = 100
    cam = PinholeCamera(
        width=frames[0].shape[1], height=frames[0].shape[0],
        K=np.asarray(K_np, np.float64),
    )
    slam = CompiledSLAM(cam, cfg)

    # Instrument internals.
    slam._decide = timed("decide")(slam._decide)
    slam._run_chunk = timed("run_chunk_total")(slam._run_chunk)
    slam._promote_keyframe = timed("promote_total")(slam._promote_keyframe)
    slam._adopt_device_keyframe = timed("adopt_kf")(slam._adopt_device_keyframe)
    slam._boundary_heavy = timed("boundary_heavy")(slam._boundary_heavy)
    slam._finish_async_solve = timed("finish_async")(slam._finish_async_solve)
    slam._stack_imgs = timed("stack_imgs")(slam._stack_imgs)
    slam._triangulate = timed("promote.triangulate")(slam._triangulate)
    slam._install_reference = timed("promote.install_ref")(slam._install_reference)
    slam._refresh_arena = timed("promote.refresh_arena")(slam._refresh_arena)
    opt = slam.optimizer
    opt._pack = timed("ba.pack")(opt._pack)
    orig_solve = opt._solve_and_writeback
    opt._solve_and_writeback = timed("ba.solve_writeback")(orig_solve)
    opt.solve_start = timed("ba.start")(opt.solve_start)
    opt.solve_finish = timed("ba.finish")(opt.solve_finish)
    if slam.loop_closing is not None:
        slam.loop_closing.process_keyframe = timed("loop_closing")(
            slam.loop_closing.process_keyframe
        )

    chunk_inner = slam._chunk

    def chunk_timed(*a, **k):
        t0 = time.perf_counter()
        out = chunk_inner(*a, **k)
        TIMER.add("chunk_dispatch", time.perf_counter() - t0)
        return out

    slam._chunk = chunk_timed
    import jax
    dg = jax.device_get

    def dg_timed(x):
        # Split compute-wait (block_until_ready: device still running) from
        # transfer (the actual host copy through the relay) so we can tell
        # whether the chunk sync is compute-bound or fetch-bandwidth-bound.
        t0 = time.perf_counter()
        jax.block_until_ready(x)
        t1 = time.perf_counter()
        r = dg(x)
        t2 = time.perf_counter()
        TIMER.add("device_get", t2 - t0)
        TIMER.add("dg.compute_wait", t1 - t0)
        TIMER.add("dg.fetch", t2 - t1)
        return r

    jax.device_get = dg_timed

    i = 0
    while slam.state.name != "OK" and i < 6:
        slam.track([frames[i]], timestamp=i * 0.1)
        i += 1
    assert slam.state.name == "OK", "bootstrap failed"
    # Warm through at least two full chunk cycles INCLUDING a heavy
    # boundary so every shape is compiled before the timed window.
    warm_end = min(i + 2 * max(chunk, 4) * max(heavy_every, 1) + 1,
                   len(frames) - 2 * max(chunk, 8))
    while i < warm_end:
        slam.track([frames[i]], timestamp=i * 0.1)
        i += 1
    TIMER.reset()  # drop compile-time samples

    t0 = time.perf_counter()
    n_timed = 0
    for k in range(i, len(frames)):
        with TIMER("frame_total"):
            slam.track([frames[k]], timestamp=k * 0.1)
        n_timed += 1
    with TIMER("flush"):
        slam.flush()
    with TIMER("trajectory"):
        ts, Ts = slam.trajectory()
    dt = time.perf_counter() - t0
    print(f"frames={n_timed} wall={dt:.2f}s fps={n_timed/dt:.2f}")
    print(TIMER.report())


if __name__ == "__main__":
    main()
