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
