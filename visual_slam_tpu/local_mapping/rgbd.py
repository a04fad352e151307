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
        if feats is None:
            return 0
        lcfg = self.config.local_mapping
        # Reuse the tracking-time per-keypoint depth measurement when the
        # frame carries one; otherwise one batched lookup (ops/stereo.py).
        z = getattr(kf, "kp_z", None)
        ok = getattr(kf, "kp_z_valid", None)
        if z is None or ok is None:
            if kf.depth is None:
                return 0
            import jax.numpy as jnp

            from ..ops.stereo import sample_depth_at

            res = sample_depth_at(jnp.asarray(kf.depth), feats.xy, self.depth_scale)
            z = np.asarray(res["z"])
            ok = np.asarray(res["valid"]) & np.asarray(feats.valid)
        ok = ok & (z > lcfg.min_depth) & (z < lcfg.max_depth)
        xy = np.asarray(feats.xy)
        from ..ops.stereo import backproject_np

        p_w = backproject_np(self.camera.Kinv, kf.R_c2w, kf.t_c2w, xy, z)
        created = 0
        for i in np.nonzero(ok)[0]:
            if kf.get_map_point(0, int(i)) is not None:
                continue
            mp = MapPoint(p_w[i], color=_pixel_color(kf.get_image(0), xy[i]))
            mp.descriptor = np.asarray(feats.desc[i])
            kf.add_map_point(0, int(i), mp)
            self.map.add_map_point(mp)
            created += 1
        return created
