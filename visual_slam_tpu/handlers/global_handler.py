"""Global bundle-adjustment handler.

The reference ships a 0-byte stub here (visual_slam/handlers/
global_handler.py); this is a working implementation: full-map BA over all
keyframes, intended to run rarely (after loop closures or on demand).
"""
from __future__ import annotations

from ..map import Map
from .base_handler import BaseHandler


class GlobalHandler(BaseHandler):
    def __init__(self, slam_map: Map, optimizer, camera, config, **kwargs):
        super().__init__(run_timeout=1.0, **kwargs)
        self.map = slam_map
        self.optimizer = optimizer
        self.camera = camera
        self.config = config
        self.last_result: dict = {}

    def step(self) -> None:
        if self.map.num_keyframes() < 3:
            return
        err_before = self.map.compute_mean_reprojection_error(self.camera.K)
        with self.map._lock:  # consistent pack+solve+writeback (see local)
            result = self.map.optimize_global(self.optimizer)
        err_after = self.map.compute_mean_reprojection_error(self.camera.K)
        result["reproj_before_px"] = err_before
        result["reproj_after_px"] = err_after
        self.last_result = result
        self.logger.info(
            "global BA over %d KFs: reproj %.3fpx -> %.3fpx",
            self.map.num_keyframes(), err_before, err_after,
        )
