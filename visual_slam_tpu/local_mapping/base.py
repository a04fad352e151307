"""Keyframe handler ABC (reference visual_slam/local_mapping/base.py:16-38)."""
from __future__ import annotations

import abc
import logging

from ..camera import Camera
from ..config import Config
from ..map import KeyFrame, Map


class BaseKeyframeHandler(abc.ABC):
    def __init__(self, camera: Camera, config: Config, slam_map: Map,
                 feature_tracker, logger: logging.Logger | None = None):
        self.camera = camera
        self.config = config
        self.map = slam_map
        self.tracker = feature_tracker
        self.logger = logger or logging.getLogger(self.__class__.__name__)

    @abc.abstractmethod
    def process_keyframe(self, kf: KeyFrame) -> dict:
        """Associate the new keyframe with the map: reuse neighbour landmarks
        and triangulate new ones. Returns stats dict."""
