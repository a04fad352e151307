"""Endurance: a longer run with growth management active — map stays
bounded, tracking stays alive, trajectory stays sane."""
import numpy as np

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.config import Config
from visual_slam_tpu.slam import SLAM
from visual_slam_tpu.state import State
from visual_slam_tpu.utils.metrics import ate_rmse, trajectory_from_keyframes

from render import render_sequence


def test_long_run_bounded_map():
    rng = np.random.default_rng(2)
    n = 36
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=n, step=0.28)
    cfg = Config()
    cfg.feature.num_features = 320
    cfg.feature.num_pyramid_levels = 2
    cfg.feature.fast_threshold = 12.0
    cfg.feature.grid_cells = 4
    cfg.initialization.min_inliers = 40
    cfg.tracking.keyframe_interval = 2
    cfg.tracking.kf_min_matches = 25
    cfg.optimization.window_size = 6
    cfg.optimization.ba_every_n_keyframes = 2
    cfg.map.cull_redundant_keyframes = True
    cfg.map.min_keyframes_before_cull = 6
    cfg.map.max_landmarks = 1500
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
    slam = SLAM(cam, cfg)
    lost_frames = 0
    for i, img in enumerate(frames):
        info = slam.track([img], timestamp=i * 0.1)
        if info.get("state") == "LOST":
            lost_frames += 1
    slam.shutdown()
    # Growth bounded.
    assert slam.map.num_map_points() <= 1500
    assert slam.map.num_keyframes() < n  # culling removed some
    # Alive (occasional relocalization allowed, but not chronic loss).
    assert lost_frames <= 4
    assert slam.state == State.OK
    # Sane trajectory over the surviving keyframes.
    kfs = slam.map.get_keyframes()
    assert len(kfs) >= 6
    est = trajectory_from_keyframes(kfs)
    idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
    gt = np.stack([-Ts_gt[i][:3, :3].T @ Ts_gt[i][:3, 3] for i in idx])
    res = ate_rmse(est, gt, align_scale=True)
    # With the mono scale-gauge re-projection in global BA the long-run ATE
    # measures ~0.7% of path length; gate at 5% (7x headroom).
    path_len = 0.28 * n
    assert res["rmse"] < 0.05 * path_len, res
