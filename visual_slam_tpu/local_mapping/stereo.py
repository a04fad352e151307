"""Stereo keyframe handler: disparity-based landmark creation.

The reference ships a 0-byte stub here (visual_slam/local_mapping/stereo.py);
this is a working implementation: matched left/right features on the same
keyframe give depth = bf / disparity (reference triangulate_stereo_points,
utils/motion_estimation.py:400-437), then landmarks are backprojected into
the world frame — no parallax wait, stereo scale is metric.
"""
from __future__ import annotations

import numpy as np

from ..map import KeyFrame, MapPoint
from .base import BaseKeyframeHandler
from .mono import MonoKeyframeHandler, _pixel_color


class StereoKeyframeHandler(BaseKeyframeHandler):
    def __init__(self, *args, row_tolerance: float = 2.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.row_tolerance = row_tolerance
        self._mono = MonoKeyframeHandler(
            self.camera, self.config, self.map, self.tracker, self.logger
        )

    def process_keyframe(self, kf: KeyFrame) -> dict:
        created = self._create_stereo_points(kf)
        # Also run the temporal (mono) association for cross-KF links.
        stats = self._mono.process_keyframe(kf)
        stats["stereo_created"] = created
        return stats

    def _create_stereo_points(self, kf: KeyFrame) -> int:
        fl = kf.get_features(0)
        fr = kf.get_features(1)
        if fl is None or fr is None:
            return 0
        bf = getattr(self.camera, "bf", 0.0)
        if bf <= 0:
            self.logger.warning("stereo handler: camera has no baseline")
            return 0
        r = self.tracker.match(fl, fr)
        ti = np.asarray(r.train_idx)
        ok = np.asarray(r.valid)
        xy_l = np.asarray(fl.xy)
        xy_r = np.asarray(fr.xy)
        lcfg = self.config.local_mapping
        created = 0
        R_c2w = kf.R_c2w
        t_c2w = kf.t_c2w
        Kinv = self.camera.Kinv
        for i_l in np.nonzero(ok)[0]:
            i_r = int(ti[i_l])
            ul, vl = xy_l[i_l]
            ur, vr = xy_r[i_r]
            # Rectified epipolar constraint: same row, positive disparity
            # (reference stereo row/disparity filter, matching.py:192-228).
            if abs(vl - vr) > self.row_tolerance:
                continue
            disp = ul - ur
            if disp <= 0.1:
                continue
            z = bf / disp
            if not (lcfg.min_depth < z < lcfg.max_depth):
                continue
            ray = Kinv @ np.array([ul, vl, 1.0])
            p_cam = ray * z
            p_w = R_c2w @ p_cam + t_c2w
            if kf.get_map_point(0, int(i_l)) is None:
                mp = MapPoint(p_w, color=_pixel_color(kf.get_image(0), xy_l[i_l]))
                kf.add_map_point(0, int(i_l), mp)
                self.map.add_map_point(mp)
                created += 1
        return created
