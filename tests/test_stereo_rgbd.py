"""Stereo and RGB-D pipeline tests (the reference ships only 0-byte stubs
for these paths)."""
import numpy as np
import pytest

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.slam import SLAM
from visual_slam_tpu.state import State
from visual_slam_tpu.utils.metrics import ate_rmse, trajectory_from_keyframes

from render import camera_path, make_world, render_with_depth, stereo_pair
from test_slam_e2e import small_config

BASELINE = 0.5


def _stereo_slam():
    rng = np.random.default_rng(5)
    world = make_world(rng)
    Ts = camera_path(10, step=0.3)
    f = 260.0
    W, H = 320, 240
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cfg = small_config()
    cfg.camera.sensor_type = "stereo"
    cfg.initialization.min_inliers = 30
    cam = PinholeCamera(width=W, height=H, K=K, baseline=BASELINE)
    slam = SLAM(cam, cfg)
    for i, T in enumerate(Ts):
        left, right = stereo_pair(world, T, K, BASELINE, W, H)
        slam.track([left, right], timestamp=i * 0.1)
    return slam, Ts


@pytest.fixture(scope="module")
def stereo_run():
    return _stereo_slam()


def test_stereo_initializes_first_frame(stereo_run):
    slam, Ts = stereo_run
    assert slam.state == State.OK
    kfs = slam.map.get_keyframes()
    assert len(kfs) >= 2
    # First KF comes from frame 0 (single-frame metric init).
    assert kfs[0].timestamp == 0.0


def test_stereo_metric_scale(stereo_run):
    """Stereo gives metric scale: NO scale alignment needed for ATE."""
    slam, Ts = stereo_run
    kfs = slam.map.get_keyframes()
    est = trajectory_from_keyframes(kfs)
    idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
    gt = np.stack([-Ts[i][:3, :3].T @ Ts[i][:3, 3] for i in idx])
    res = ate_rmse(est, gt, align_scale=False)
    assert abs(res["scale"] - 1.0) < 1e-9  # no scale was estimated
    assert res["rmse"] < 0.3, res
    # and the recovered scale, if estimated, should be ~1 (metric)
    res_s = ate_rmse(est, gt, align_scale=True)
    assert 0.8 < res_s["scale"] < 1.25  # metric (mono gauge would be ~12x)


def test_rgbd_initializes_and_tracks():
    rng = np.random.default_rng(9)
    world = make_world(rng)
    Ts = camera_path(8, step=0.3)
    f = 260.0
    W, H = 320, 240
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cfg = small_config()
    cfg.camera.sensor_type = "rgbd"
    cfg.initialization.min_inliers = 30
    cam = PinholeCamera(width=W, height=H, K=K)
    slam = SLAM(cam, cfg)
    for i, T in enumerate(Ts):
        img, depth = render_with_depth(world, T, K, W, H)
        slam.track([img], timestamp=i * 0.1, depth=depth)
    assert slam.state == State.OK
    kfs = slam.map.get_keyframes()
    est = trajectory_from_keyframes(kfs)
    idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
    gt = np.stack([-Ts[i][:3, :3].T @ Ts[i][:3, 3] for i in idx])
    res = ate_rmse(est, gt, align_scale=True)
    assert 0.8 < res["scale"] < 1.25  # metric scale from depth
    assert res["rmse"] < 0.3, res


def test_stereo_fused_pipeline_e2e():
    """Stereo through the fused single-dispatch path: detect-both + in-step
    depth + depth-aware PnP, metric scale preserved."""
    rng = np.random.default_rng(5)
    world = make_world(rng)
    Ts = camera_path(10, step=0.3)
    f, W, H = 260.0, 320, 240
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cfg = small_config()
    cfg.camera.sensor_type = "stereo"
    cfg.initialization.min_inliers = 30
    cfg.tracking.fused_pipeline = True
    cam = PinholeCamera(width=W, height=H, K=K, baseline=BASELINE)
    slam = SLAM(cam, cfg)
    for i, T in enumerate(Ts):
        left, right = stereo_pair(world, T, K, BASELINE, W, H)
        slam.track([left, right], timestamp=i * 0.1)
    assert slam.state == State.OK
    kfs = slam.map.get_keyframes()
    est = trajectory_from_keyframes(kfs)
    idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
    gt = np.stack([-Ts[i][:3, :3].T @ Ts[i][:3, 3] for i in idx])
    res = ate_rmse(est, gt, align_scale=False)  # metric: no alignment
    assert res["rmse"] < 0.3, res


def test_rgbd_fused_pipeline_e2e():
    """RGB-D through the fused single-dispatch path: in-step depth lookup +
    depth-aware PnP with the virtual baseline."""
    rng = np.random.default_rng(9)
    world = make_world(rng)
    Ts = camera_path(8, step=0.3)
    f, W, H = 260.0, 320, 240
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cfg = small_config()
    cfg.camera.sensor_type = "rgbd"
    cfg.initialization.min_inliers = 30
    cfg.tracking.fused_pipeline = True
    cam = PinholeCamera(width=W, height=H, K=K)
    slam = SLAM(cam, cfg)
    for i, T in enumerate(Ts):
        img, depth = render_with_depth(world, T, K, W, H)
        slam.track([img], timestamp=i * 0.1, depth=depth)
    assert slam.state == State.OK
    kfs = slam.map.get_keyframes()
    est = trajectory_from_keyframes(kfs)
    idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
    gt = np.stack([-Ts[i][:3, :3].T @ Ts[i][:3, 3] for i in idx])
    res = ate_rmse(est, gt, align_scale=False)  # metric from depth
    assert res["rmse"] < 0.3, res


@pytest.mark.slow
def test_stereo_loop_closure_ring():
    """Stereo (metric) circular revisit: loop closes with s~1 through the
    Sim(3) graph, per-frame depth residuals keep tracking alive through the
    full turn, and final ATE is metric (NO scale alignment)."""
    from render import loop_path, make_ring_world, render
    from visual_slam_tpu.config import Config

    N, STEP, BL = 80, 0.25, 0.4
    rng = np.random.default_rng(11)
    Ts = loop_path(N, step=STEP, closes=1.08)
    yaw_rate = 2 * np.pi * 1.08 / N
    radius = STEP / (2 * np.sin(yaw_rate / 2))
    world = make_ring_world(rng, np.array([-radius, 0.0, 0.0]), radius + 3.0, radius + 13.0)
    f, W, H = 260.0, 320, 240
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cfg = Config()
    cfg.camera.sensor_type = "stereo"
    cfg.feature.num_features = 320
    cfg.feature.num_pyramid_levels = 2
    cfg.feature.fast_threshold = 12.0
    cfg.feature.grid_cells = 4
    cfg.initialization.min_inliers = 30
    cfg.tracking.keyframe_interval = 2
    cfg.optimization.window_size = 6
    cfg.loop_closing.enabled = True
    cam = PinholeCamera(width=W, height=H, K=K, baseline=BL)
    slam = SLAM(cam, cfg)
    lost = 0
    for i, T in enumerate(Ts):
        Tr = T.copy()
        Tr[0, 3] -= BL
        info = slam.track(
            [render(world, T, K, W, H), render(world, Tr, K, W, H)],
            timestamp=i * 0.1,
        )
        if info.get("state") == "LOST":
            lost += 1
    slam.shutdown()
    assert slam.state == State.OK
    assert lost == 0
    assert len(slam.loop_closing.closed_loops) >= 1
    kfs = slam.map.get_keyframes()
    est = trajectory_from_keyframes(kfs)
    idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
    gt = np.stack([-Ts[j][:3, :3].T @ Ts[j][:3, 3] for j in idx])
    res = ate_rmse(est, gt, align_scale=False)  # metric
    assert res["rmse"] < 0.02 * STEP * N, res  # measured 0.77% of path
