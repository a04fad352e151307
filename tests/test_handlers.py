"""Handler thread machinery + metrics export."""
import time

import numpy as np

from visual_slam_tpu.handlers.base_handler import BaseHandler


class CountingHandler(BaseHandler):
    def __init__(self, **kw):
        super().__init__(**kw)
        self.count = 0

    def step(self):
        self.count += 1


def test_synchronous_trigger():
    h = CountingHandler(threaded=False)
    h.trigger()
    h.trigger()
    assert h.count == 2


def test_threaded_trigger_and_stop():
    h = CountingHandler(threaded=True, run_timeout=0.01)
    h.start()
    h.trigger()
    t0 = time.time()
    while h.count < 1 and time.time() - t0 < 2.0:
        time.sleep(0.01)
    assert h.count >= 1
    h.stop()
    h.join(2.0)


def test_metrics_export():
    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.config import Config
    from visual_slam_tpu.slam import SLAM

    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    slam = SLAM(PinholeCamera(320, 240, K), Config())
    m = slam.metrics()
    assert m["state"] == "NO_IMAGES_YET"
    assert m["num_keyframes"] == 0
    assert "mean_reprojection_error_px" in m
