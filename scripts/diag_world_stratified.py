"""Validate the stratified long-world fix (q_diag_world_compare.log found
i.i.d. placement starves/clumps over the 256-frame span: seeds 3/4 die at
f43/f16 with 20-50 inliers while the same density tracks fine short).
Stratified x-placement should make every seed healthy. 48-frame probes at
the exact long-bench config, seeds 3/4/5, plus one full-length tail probe
(frames 200-256 region enters fresh world — run seed 3 to 128 frames)."""
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
        n_frames=n_frames, seed=seed, step=0.6, n_sprites=n_sprites,
        stratified=True,
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
    print(f"=== {tag} (n_sprites={n_sprites}, seed={seed}, "
          f"limit={limit}) ===", flush=True)
    for i in range(min(limit, len(frames))):
        slam.track([frames[i]], timestamp=i * 0.1)
        if slam.state.name == "LOST":
            print(f"{tag}: LOST at f{i}", flush=True)
            break
    print(f"{tag}: final {slam.state.name} kfs={slam.map.num_keyframes()}"
          f" pts={slam.map.num_map_points()}", flush=True)


def main():
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    run_arm("strat3400_s3", 256, 3400, 3)
    run_arm("strat3400_s4", 256, 3400, 4)
    run_arm("strat3400_s5", 256, 3400, 5)
    run_arm("strat3400_s3_deep", 256, 3400, 3, limit=128)


if __name__ == "__main__":
    main()
