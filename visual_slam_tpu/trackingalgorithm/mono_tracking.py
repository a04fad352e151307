"""Default monocular strategy: local-map descriptor association + RANSAC-PnP
(reference stub visual_slam/trackingalgorithm/mono_traking.py — the filename
typo is not reproduced)."""
from __future__ import annotations

import numpy as np

from .base import BaseTrackingAlgorithm


class MonoTracking(BaseTrackingAlgorithm):
    def __init__(self, n_local_keyframes: int = 3):
        self.n_local_keyframes = n_local_keyframes

    def track_frame(self, tracking, frame) -> dict:
        match_res, pts3d, xy_obs, pair_valid = tracking._track_local_map(
            frame, n_keyframes=self.n_local_keyframes
        )
        n_candidates = int(np.asarray(pair_valid).sum())
        info = {
            "n_matches": match_res.n_matches if match_res else 0,
            "n_3d2d": n_candidates,
            "match_res": match_res,
        }
        if n_candidates >= 6:
            info.update(tracking._optimize_pose(frame, pts3d, xy_obs, pair_valid))
        else:
            info.update({"ok": False, "n_inliers": 0, "inlier_ratio": 0.0})
        return info
