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
        if fl is None:
            return 0
        bf = getattr(self.camera, "bf", 0.0)
        if bf <= 0:
            self.logger.warning("stereo handler: camera has no baseline")
            return 0
        lcfg = self.config.local_mapping
        # Per-keypoint depths: reuse the tracking-time measurement when the
        # frame carries one; otherwise one batched row-gated Hamming dispatch
        # (ops/stereo.py — replaces the per-pair Python loop of round 1).
        z = getattr(kf, "kp_z", None)
        ok = getattr(kf, "kp_z_valid", None)
        if z is None or ok is None:
            fr = kf.get_features(1)
            if fr is None:
                return 0
            from ..ops.stereo import stereo_feature_depths

            res = stereo_feature_depths(
                fl.xy, fl.desc, fl.valid, fr.xy, fr.desc, fr.valid,
                float(bf), row_tolerance=self.row_tolerance,
                max_disparity=float(bf) / max(lcfg.min_depth, 1e-6),
            )
            z = np.asarray(res["z"])
            ok = np.asarray(res["valid"])
        ok = ok & (z > lcfg.min_depth) & (z < lcfg.max_depth)
        xy_l = np.asarray(fl.xy)
        from ..ops.stereo import backproject_np

        p_w = backproject_np(self.camera.Kinv, kf.R_c2w, kf.t_c2w, xy_l, z)
        created = 0
        for i_l in np.nonzero(ok)[0]:
            if kf.get_map_point(0, int(i_l)) is None:
                mp = MapPoint(p_w[i_l], color=_pixel_color(kf.get_image(0), xy_l[i_l]))
                mp.descriptor = np.asarray(fl.desc[i_l])
                kf.add_map_point(0, int(i_l), mp)
                self.map.add_map_point(mp)
                created += 1
        return created
