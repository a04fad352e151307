"""Diagnose why bench_full_pipeline(n_frames=256, n_sprites=3400,
max_landmarks=2048) returned None in bench_1787155464: the only None path is
bootstrap failing to reach OK within 6 frames. Print per-frame state +
initializer internals for the long-world first frames."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_kitti_frames  # noqa: E402


def main():
    n_frames = 256
    t0 = time.time()
    frames, K_np, Ts_gt = synth_kitti_frames(
        n_frames=n_frames, seed=3, step=0.6, n_sprites=3400
    )
    print(f"render: {time.time()-t0:.1f}s, {len(frames)} frames", flush=True)

    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.config import Config
    from visual_slam_tpu.models import CompiledSLAM

    cfg = Config()
    cfg.feature.num_features = 2000
    cfg.tracking.keyframe_interval = 4
    cfg.tracking.chunk_size = 8
    cfg.tracking.device_promotion = True
    cfg.tracking.heavy_boundary_every = 2
    cfg.tracking.upload_f16 = True
    cfg.optimization.max_points = 2048
    cfg.optimization.window_size = 16
    cfg.optimization.pose_bucket_floor = 32
    cfg.optimization.point_bucket_floor = 2048
    cfg.map.max_landmarks = 2048
    cfg.initialization.min_inliers = 100
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0],
                        K=np.asarray(K_np, np.float64))
    slam = CompiledSLAM(cam, cfg)
    for i in range(min(12, len(frames))):
        t = time.time()
        slam.track([frames[i]], timestamp=i * 0.1)
        ini = getattr(slam, "initializer", None)
        detail = ""
        if ini is not None:
            for attr in ("last_n_matches", "last_n_inliers", "last_reason",
                         "n_matches", "n_inliers"):
                v = getattr(ini, attr, None)
                if v is not None:
                    detail += f" {attr}={v}"
        print(f"frame {i}: state={slam.state.name} dt={time.time()-t:.1f}s"
              f" kfs={slam.map.num_keyframes()}"
              f" pts={slam.map.num_map_points()}{detail}", flush=True)
        if slam.state.name == "OK" and i >= 6:
            print("BOOTSTRAP OK (late)", flush=True)
            break
    print("final:", slam.state.name, flush=True)


if __name__ == "__main__":
    main()
