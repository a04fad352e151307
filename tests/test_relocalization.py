"""Failure detection + recovery: inject a tracking failure (blank frames)
and verify the system goes LOST and then relocalizes (the reference's
_relocalize is a stub returning None — LOST is terminal there,
tracking.py:596-598)."""
import numpy as np

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.slam import SLAM
from visual_slam_tpu.state import State

from render import render_sequence
from test_slam_e2e import small_config


def test_lost_and_relocalize():
    rng = np.random.default_rng(7)
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=10, step=0.3)
    cfg = small_config()
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
    slam = SLAM(cam, cfg)
    # Normal tracking for 7 frames.
    for i in range(7):
        slam.track([frames[i]], timestamp=i * 0.1)
    assert slam.state == State.OK
    # Inject failure: featureless frames.
    blank = np.full_like(frames[0], 100.0)
    for k in range(2):
        slam.track([blank], timestamp=(7 + k) * 0.1)
    assert slam.state == State.LOST
    # Resume from a view close to frame 7 -> should relocalize.
    info = slam.track([frames[7]], timestamp=1.1)
    assert slam.state == State.OK, info
    assert info.get("relocalized", False)
    # And keep tracking.
    info = slam.track([frames[8]], timestamp=1.2)
    assert slam.state == State.OK


def test_global_candidates_rank_matching_view_first():
    """The signature shortlist must surface a far-past keyframe whose view
    matches the query frame even when it is outside the recent-keyframe
    window (tracking._reloc_global_candidates — the loop-around recovery
    path ORB-SLAM serves with its DBoW database)."""
    rng = np.random.default_rng(9)
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=12, step=0.3)
    cfg = small_config()
    cfg.tracking.keyframe_interval = 1  # a keyframe per frame: 10+ KFs
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
    slam = SLAM(cam, cfg)
    for i in range(12):
        slam.track([frames[i]], timestamp=i * 0.1)
    tr = slam.tracking
    kfs = slam.map.get_keyframes()
    assert len(kfs) >= 8
    # Query with an early view; exclude the recent 5 KFs (the primary set).
    frame = tr._create_frame([frames[1]], timestamp=99.0, depth=None)
    recent_ids = {kf.keyframe_id for kf in kfs[-5:]}
    cands = tr._reloc_global_candidates(frame, exclude=recent_ids, top_n=3)
    assert cands, "no global candidates returned"
    # The top candidate must be an EARLY keyframe (timestamp near frame 1),
    # not a late one: the early view matches the query.
    assert cands[0].timestamp <= 0.45, [c.timestamp for c in cands]
