"""Tracking-strategy ABC (reference stub visual_slam/trackingalgorithm/base.py)."""
from __future__ import annotations

import abc


class BaseTrackingAlgorithm(abc.ABC):
    """Per-frame pose-tracking strategy. Receives the Tracking orchestrator
    (for camera/config/map access) and the freshly created Frame; returns the
    info dict (must contain 'ok', 'n_inliers', 'inlier_ratio')."""

    @abc.abstractmethod
    def track_frame(self, tracking, frame) -> dict: ...
