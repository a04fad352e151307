"""Trace the long-world (256f / 3400 sprites) LOST: per-chunk inlier lists
and promotions via the CompiledSLAM debug log, per-frame state transitions,
keyframe/landmark counts at every boundary. q_long_256.log showed the run
dying with 10 KFs / 523 landmarks and never recovering."""
import logging
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_kitti_frames  # noqa: E402


def main():
    frames, K_np, Ts_gt = synth_kitti_frames(
        n_frames=256, seed=3, step=0.6, n_sprites=3400
    )
    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.config import Config
    from visual_slam_tpu.models import CompiledSLAM

    logging.basicConfig(level=logging.INFO, format="%(message)s")

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
    slam.logger.setLevel(logging.DEBUG)
    last_state = None
    t_start = time.time()
    for i, img in enumerate(frames):
        info = slam.track([img], timestamp=i * 0.1)
        if slam.state.name != last_state or (i % 16 == 0):
            print(
                f"[f{i:3d}] state={slam.state.name}"
                f" kfs={slam.map.num_keyframes()}"
                f" pts={slam.map.num_map_points()}"
                f" inl={info.get('n_inliers', '-')}"
                f" t={time.time()-t_start:.0f}s",
                flush=True,
            )
            last_state = slam.state.name
        if slam.state.name == "LOST" and i > 150:
            print("still LOST past frame 150 — stopping early", flush=True)
            break
    print("final:", slam.state.name, slam.map.num_keyframes(),
          slam.map.num_map_points(), flush=True)


if __name__ == "__main__":
    main()
