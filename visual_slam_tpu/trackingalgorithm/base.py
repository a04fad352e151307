"""Tracking-strategy ABC (reference stub visual_slam/trackingalgorithm/base.py)."""
from __future__ import annotations

import abc


class BaseTrackingAlgorithm(abc.ABC):
    """Per-frame pose-tracking strategy. Receives the Tracking orchestrator
    (for camera/config/map access) and the freshly created Frame; returns the
    info dict (must contain 'ok', 'n_inliers', 'inlier_ratio')."""

    @abc.abstractmethod
    def track_frame(self, tracking, frame) -> dict: ...

    def process(self, tracking, images, timestamp, depth):
        """Full per-frame flow: frame creation + pose prediction +
        track_frame. Strategies that fuse detection into their device program
        (FusedMonoTracking) override this entirely. Returns (frame, info)."""
        frame = tracking._create_frame(images, timestamp, depth)
        tracking._predict_pose(frame)
        return frame, self.track_frame(tracking, frame)
