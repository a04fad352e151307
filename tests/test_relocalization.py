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
