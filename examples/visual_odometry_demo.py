"""Self-contained visual-odometry demo on a synthetic rendered world — the
script equivalent of the reference's notebooks/VisualOdometry.ipynb (which
depends on an unshipped KITTI download; this demo generates its own scene).

  python examples/visual_odometry_demo.py [--cpu]
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

# Must precede the package imports (module-level device constants
# initialize the backend at import time).
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from render import render_sequence  # tests/render.py synthetic world

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.config import Config
from visual_slam_tpu.slam import SLAM
from visual_slam_tpu.utils.metrics import ate_rmse, trajectory_from_keyframes
from visual_slam_tpu.utils.profiling import StageTimer


def main():
    rng = np.random.default_rng(0)
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=20, step=0.3)

    cfg = Config()
    cfg.feature.num_features = 512
    cfg.feature.num_pyramid_levels = 2
    cfg.feature.fast_threshold = 12.0
    cfg.initialization.min_inliers = 40
    cfg.tracking.keyframe_interval = 2
    cfg.optimization.window_size = 10

    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
    slam = SLAM(cam, cfg)
    timer = StageTimer()
    for i, img in enumerate(frames):
        with timer("track"):
            info = slam.track([img], timestamp=i * 0.1)
        print(f"frame {i:3d} state={info['state']:<14} "
              f"inliers={info.get('n_inliers', '-')}")
    slam.shutdown()

    kfs = slam.map.get_keyframes()
    print(f"\nkeyframes: {len(kfs)}  landmarks: {slam.map.num_map_points()}")
    est = trajectory_from_keyframes(kfs)
    idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
    gt = np.stack([-Ts_gt[i][:3, :3].T @ Ts_gt[i][:3, 3] for i in idx])
    res = ate_rmse(est, gt)
    print(f"ATE RMSE (Sim3-aligned): {res['rmse']:.4f} world units")
    print("\nper-stage timing:\n" + timer.report())


if __name__ == "__main__":
    main()
