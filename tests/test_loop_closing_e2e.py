"""Loop closing against a real SLAM map: build a map on the linear synthetic
sequence, then present a revisit view of the start — detection must find the
old keyframe, geometric verification must recover the pose, and the closure
must run the pose graph without degrading the trajectory."""
import numpy as np
import pytest

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.loop_closing import LoopClosing
from visual_slam_tpu.map import KeyFrame
from visual_slam_tpu.slam import SLAM
from visual_slam_tpu.state import State

from render import render_sequence, render
from test_slam_e2e import small_config


@pytest.fixture(scope="module")
def slam_with_map():
    rng = np.random.default_rng(42)
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=12, step=0.35)
    cfg = small_config()
    cfg.map.cull_redundant_keyframes = False
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
    slam = SLAM(cam, cfg)
    for i, img in enumerate(frames):
        slam.track([img], timestamp=i * 0.1)
    assert slam.state == State.OK
    return slam, frames, Ts_gt, K, world


def test_loop_detect_verify_close(slam_with_map):
    slam, frames, Ts_gt, K, world = slam_with_map
    lc = LoopClosing(
        slam.map, slam.camera, slam.config, optimizer=None,
        min_gap=4, min_matches=25, min_inliers=15,
    )
    # Revisit: re-render the frame at GT pose 1 (same viewpoint as an early
    # keyframe) and promote it to a keyframe with a deliberately wrong pose
    # estimate (simulating accumulated drift).
    revisit_img = render(world, Ts_gt[1], K, frames[0].shape[1], frames[0].shape[0])
    feats = slam.feature_tracker.detectAndCompute(revisit_img)
    from visual_slam_tpu.map import Frame

    fr = Frame(images=[revisit_img], images_gray=[revisit_img], features=[feats],
               timestamp=9.9)
    kf = KeyFrame.from_frame(fr)
    drifted = slam.map.get_keyframes()[-1].T_w2c.copy()
    kf.update_pose(drifted)  # far from the true (early) pose
    slam.map.add_keyframe(kf)

    det = lc.detect(kf)
    assert det is not None, "revisit not detected"
    cand = det["candidate"]
    # The matched candidate should be one of the EARLY keyframes.
    early_ids = [k.keyframe_id for k in slam.map.get_keyframes()[:3]]
    assert cand.keyframe_id in early_ids, (cand.keyframe_id, early_ids)
    assert det["n_inliers"] >= 15
    # Verified pose should be near the candidate's pose (same viewpoint
    # modulo the map's scale gauge), far from the drifted guess.
    T_corr = det["T_kf_corrected"]
    d_cand = np.linalg.norm(T_corr[:3, 3] - cand.T_w2c[:3, 3])
    d_drift = np.linalg.norm(T_corr[:3, 3] - drifted[:3, 3])
    assert d_cand < d_drift

    result = lc.close(kf, det)
    assert lc.closed_loops
    assert np.isfinite(result["pose_graph_cost"])
    for k in slam.map.get_keyframes():
        assert np.isfinite(k.T_w2c).all()
