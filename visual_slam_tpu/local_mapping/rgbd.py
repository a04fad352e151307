"""RGB-D keyframe handler: depth-image landmark creation.

The reference ships a 0-byte stub here (visual_slam/local_mapping/rgbd.py);
this is a working implementation: every valid keypoint with a depth reading
backprojects directly into a metric landmark.
"""
from __future__ import annotations

import numpy as np

from ..map import KeyFrame, MapPoint
from .base import BaseKeyframeHandler
from .mono import MonoKeyframeHandler, _pixel_color


class RGBDKeyframeHandler(BaseKeyframeHandler):
    def __init__(self, *args, depth_scale: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.depth_scale = depth_scale
        self._mono = MonoKeyframeHandler(
            self.camera, self.config, self.map, self.tracker, self.logger
        )

    def process_keyframe(self, kf: KeyFrame) -> dict:
        created = self._create_depth_points(kf)
        stats = self._mono.process_keyframe(kf)
        stats["rgbd_created"] = created
        return stats

    def _create_depth_points(self, kf: KeyFrame) -> int:
        feats = kf.get_features(0)
        depth = kf.depth
        if feats is None or depth is None:
            return 0
        lcfg = self.config.local_mapping
        xy = np.asarray(feats.xy)
        valid = np.asarray(feats.valid)
        Kinv = self.camera.Kinv
        R_c2w = kf.R_c2w
        t_c2w = kf.t_c2w
        created = 0
        H, W = depth.shape[:2]
        for i in np.nonzero(valid)[0]:
            if kf.get_map_point(0, int(i)) is not None:
                continue
            u, v = xy[i]
            ui, vi = int(round(u)), int(round(v))
            if not (0 <= ui < W and 0 <= vi < H):
                continue
            z = float(depth[vi, ui]) * self.depth_scale
            if not (lcfg.min_depth < z < lcfg.max_depth):
                continue
            ray = Kinv @ np.array([u, v, 1.0])
            p_w = R_c2w @ (ray * z) + t_c2w
            mp = MapPoint(p_w, color=_pixel_color(kf.get_image(0), xy[i]))
            kf.add_map_point(0, int(i), mp)
            self.map.add_map_point(mp)
            created += 1
        return created
