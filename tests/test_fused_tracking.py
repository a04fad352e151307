"""Fused single-dispatch host tracking (config.tracking.fused_pipeline)."""
import numpy as np

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.slam import SLAM
from visual_slam_tpu.state import State
from visual_slam_tpu.utils.metrics import ate_rmse, trajectory_from_keyframes

from render import render_sequence
from test_slam_e2e import small_config


def test_fused_pipeline_e2e():
    rng = np.random.default_rng(42)
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=12, step=0.35)
    cfg = small_config()
    cfg.tracking.fused_pipeline = True
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
    slam = SLAM(cam, cfg)
    from visual_slam_tpu.trackingalgorithm import FusedMonoTracking

    assert isinstance(slam.tracking.algorithm, FusedMonoTracking)
    for i, img in enumerate(frames):
        slam.track([img], timestamp=i * 0.1)
    slam.shutdown()
    assert slam.state == State.OK
    kfs = slam.map.get_keyframes()
    assert len(kfs) >= 3
    est = trajectory_from_keyframes(kfs)
    idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
    gt = np.stack([-Ts_gt[i][:3, :3].T @ Ts_gt[i][:3, 3] for i in idx])
    res = ate_rmse(est, gt, align_scale=True)
    assert res["rmse"] < 0.35, res
