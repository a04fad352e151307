"""Compare per-chunk inlier profiles between the 64-frame bench world
(n_sprites=1500, works: 27 fps @ 1.07%) and the 256-frame world
(n_sprites=3400, collapses at f43 with inliers 20-50 from the start,
q_diag_long_lost.log) — same generator, same per-x-unit sprite density, same
seed integer (different RNG consumption). Also probe alternative long-world
seeds: if some work, seed-3's layout is unlucky; if none do, the density/
overdraw regime itself is hostile and the fix is in the front end."""
import logging
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import synth_kitti_frames  # noqa: E402


def run_arm(tag, n_frames, n_sprites, seed, limit=48):
    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.config import Config
    from visual_slam_tpu.models import CompiledSLAM

    frames, K_np, _ = synth_kitti_frames(
        n_frames=n_frames, seed=seed, step=0.6, n_sprites=n_sprites
    )
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
    print(f"=== {tag} (n_sprites={n_sprites}, seed={seed}) ===", flush=True)
    for i in range(min(limit, len(frames))):
        slam.track([frames[i]], timestamp=i * 0.1)
        if slam.state.name == "LOST":
            print(f"{tag}: LOST at f{i}", flush=True)
            break
    print(f"{tag}: final {slam.state.name} kfs={slam.map.num_keyframes()}"
          f" pts={slam.map.num_map_points()}", flush=True)


def main():
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    run_arm("short1500", 64, 1500, 3)
    run_arm("long3400_s3", 256, 3400, 3)
    run_arm("long3400_s4", 256, 3400, 4)
    run_arm("long3400_s5", 256, 3400, 5)
    run_arm("long1500_s3", 256, 1500, 3)


if __name__ == "__main__":
    main()
