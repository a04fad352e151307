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


def test_resume_in_fresh_process_restores_id_counters(tmp_path):
    """Regression: resume in a FRESH process (id counters restart at 0) must
    restore keyframe/frame ids and advance the global counters, or the
    keyframe-gap test (frame.id - last_keyframe_frame_id) suppresses keyframe
    creation and starves the map."""
    import itertools

    from visual_slam_tpu.map import KeyFrame
    from visual_slam_tpu.map.frame import FrameBase

    rng = np.random.default_rng(42)
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=12, step=0.3)
    cfg = small_config()
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
    slam = SLAM(cam, cfg)
    for i in range(8):
        slam.track([frames[i]], timestamp=i * 0.1)
    assert slam.state == State.OK
    saved_kf_ids = [kf.keyframe_id for kf in slam.map.get_keyframes()]
    saved_frame_ids = [kf.id for kf in slam.map.get_keyframes()]
    n_kf = slam.map.num_keyframes()
    slam.save(tmp_path / "ckpt")

    # Simulate a fresh interpreter: id counters restart at 0.
    with FrameBase._ids_lock:
        FrameBase._ids = itertools.count(0)
    with KeyFrame._kf_ids_lock:
        KeyFrame._kf_ids = itertools.count(0)

    slam2 = SLAM.resume(tmp_path / "ckpt", cam)
    restored_kf_ids = [kf.keyframe_id for kf in slam2.map.get_keyframes()]
    restored_frame_ids = [kf.id for kf in slam2.map.get_keyframes()]
    assert restored_kf_ids == saved_kf_ids
    assert restored_frame_ids == saved_frame_ids
    # New frames must allocate ids past the restored maxima.
    from visual_slam_tpu.map import Frame

    assert Frame().id > max(saved_frame_ids)

    # Keyframe creation must not be starved after resume.
    for i in range(8, 12):
        slam2.track([frames[i]], timestamp=i * 0.1)
    assert slam2.state == State.OK
    assert slam2.map.num_keyframes() > n_kf, "keyframe creation starved after resume"


def test_compiled_slam_save_resume(tmp_path):
    """CompiledSLAM checkpoint: save after a run, resume in a new instance,
    keep tracking the same sequence."""
    import numpy as np

    from render import make_world, render, camera_path
    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.models import CompiledSLAM
    from test_slam_e2e import small_config

    rng = np.random.default_rng(7)
    world = make_world(rng)
    Ts = camera_path(10, step=0.3)
    f, W, H = 260.0, 320, 240
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cam = PinholeCamera(width=W, height=H, K=K)
    slam = CompiledSLAM(cam, small_config())
    for i in range(6):
        slam.track([render(world, Ts[i], K, W, H)], timestamp=i * 0.1)
    slam.flush()
    assert slam.state.name == "OK"
    n_kf = slam.map.num_keyframes()
    n_poses = len(slam.poses)
    slam.save(tmp_path / "ckpt")

    slam2 = CompiledSLAM.resume(tmp_path / "ckpt", cam)
    assert slam2.state.name == "OK"
    assert slam2.map.num_keyframes() == n_kf
    assert len(slam2.poses) == n_poses
    for i in range(6, 10):
        info = slam2.track([render(world, Ts[i], K, W, H)], timestamp=i * 0.1)
    slam2.flush()
    assert slam2.state.name == "OK"
    ts, Tw = slam2.trajectory()
    assert len(ts) > n_poses  # kept tracking after resume
    # resumed trajectory stays near GT (mono: Umeyama scale alignment)
    from visual_slam_tpu.utils.metrics import ate_rmse

    idx = [int(round(t / 0.1)) for t in ts]
    est = np.stack([-T[:3, :3].T @ T[:3, 3] for T in Tw])
    gt = np.stack([-Ts[j][:3, :3].T @ Ts[j][:3, 3] for j in idx])
    res = ate_rmse(est, gt, align_scale=True)
    assert res["rmse"] < 0.35, res
