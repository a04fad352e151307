"""Full-system checkpoint/resume: track, save, restore in a fresh SLAM,
continue tracking (capability the reference lacks, SURVEY.md §5)."""
import numpy as np

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.slam import SLAM
from visual_slam_tpu.state import State

from render import render_sequence
from test_slam_e2e import small_config


def test_save_and_resume(tmp_path):
    rng = np.random.default_rng(42)
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=12, step=0.3)
    cfg = small_config()
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
    slam = SLAM(cam, cfg)
    for i in range(8):
        slam.track([frames[i]], timestamp=i * 0.1)
    assert slam.state == State.OK
    n_kf = slam.map.num_keyframes()
    n_mp = slam.map.num_map_points()
    slam.save(tmp_path / "ckpt")

    slam2 = SLAM.resume(tmp_path / "ckpt", cam)
    assert slam2.state == State.OK
    assert slam2.map.num_keyframes() == n_kf
    assert slam2.map.num_map_points() == n_mp
    assert slam2.config.feature.num_features == cfg.feature.num_features
    # Continue tracking from the checkpoint.
    ok_frames = 0
    for i in range(8, 12):
        info = slam2.track([frames[i]], timestamp=i * 0.1)
        ok_frames += info.get("state") == "OK"
    assert slam2.state == State.OK
    assert ok_frames >= 3
    assert slam2.map.num_keyframes() >= n_kf
