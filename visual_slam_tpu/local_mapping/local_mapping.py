"""LocalMapping: keyframe consumer (synchronous or background thread).

API parity with the reference LocalMapping (visual_slam/local_mapping/
local_mapping.py:27-165): ``insert_keyframe`` + a queue-draining ``run``
loop.  Default mode here is SYNCHRONOUS — the keyframe is processed inline at
insertion, giving a deterministic pipeline (the functional-core design makes
each step fast enough that the reference's thread overlap is unnecessary);
``threaded=True`` restores the reference's producer/consumer behavior.

Beyond the reference: covisibility bookkeeping and landmark culling are
actually implemented (the reference comments them out,
local_mapping.py:108-118, 135-165).
"""
from __future__ import annotations

import logging
import queue
import threading
from typing import Optional

from ..camera import Camera
from ..config import Config
from ..map import KeyFrame, Map
from ..sensor_type import SensorType
from .base import BaseKeyframeHandler
from .mono import MonoKeyframeHandler
from .rgbd import RGBDKeyframeHandler
from .stereo import StereoKeyframeHandler


def make_handler(
    sensor_type: SensorType, camera, config, slam_map, tracker, logger=None
) -> BaseKeyframeHandler:
    cls = {
        SensorType.MONOCULAR: MonoKeyframeHandler,
        SensorType.STEREO: StereoKeyframeHandler,
        SensorType.RGBD: RGBDKeyframeHandler,
    }[sensor_type]
    return cls(camera, config, slam_map, tracker, logger)


class LocalMapping:
    def __init__(
        self,
        camera: Camera,
        config: Config,
        slam_map: Map,
        feature_tracker,
        sensor_type: SensorType = SensorType.MONOCULAR,
        logger: Optional[logging.Logger] = None,
        threaded: bool = False,
    ):
        self.camera = camera
        self.config = config
        self.map = slam_map
        self.logger = logger or logging.getLogger("local_mapping")
        self.handler = make_handler(
            sensor_type, camera, config, slam_map, feature_tracker, self.logger
        )
        self.threaded = threaded
        self._queue: "queue.Queue[KeyFrame]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.covisibility: dict[int, dict[int, int]] = {}  # kf_id -> {kf_id: shared}

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> None:
        if self.threaded and self._thread is None:
            self._stop.clear()
            self._thread = threading.Thread(target=self.run, daemon=True, name="local_mapping")
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()

    def join(self, timeout: float | None = None) -> None:
        if self._thread is not None:
            self._thread.join(timeout)
            self._thread = None

    # -- producer side (reference local_mapping.py:73-75) ------------------
    def insert_keyframe(self, kf: KeyFrame) -> None:
        if self.threaded:
            self._queue.put(kf)
        else:
            self.process_keyframe(kf)

    # -- consumer loop (reference local_mapping.py:80-94) ------------------
    def run(self) -> None:
        while not self._stop.is_set():
            try:
                kf = self._queue.get(timeout=self.config.local_mapping.run_timeout)
            except queue.Empty:
                continue
            try:
                self.process_keyframe(kf)
            except Exception:  # pragma: no cover - keep the thread alive
                self.logger.exception("keyframe processing failed")

    def drain(self) -> None:
        """Process any queued keyframes inline (used by shutdown/tests)."""
        while not self._queue.empty():
            self.process_keyframe(self._queue.get_nowait())

    # -- the work (reference local_mapping.py:96-133) ----------------------
    def process_keyframe(self, kf: KeyFrame) -> dict:
        stats = self.handler.process_keyframe(kf)
        self.map.add_keyframe(kf)
        self.update_covisibility(kf)
        self.cull_bad_points()
        return stats

    def update_covisibility(self, kf: KeyFrame) -> None:
        """Count shared landmarks with other keyframes (implemented; the
        reference leaves this commented out, local_mapping.py:108-118)."""
        counts: dict[int, int] = {}
        for mp in kf.map_points.values():
            if mp.is_bad:
                continue
            for kf_id in mp.observations.get_keyframe_ids():
                if kf_id != kf.keyframe_id:
                    counts[kf_id] = counts.get(kf_id, 0) + 1
        self.covisibility[kf.keyframe_id] = counts
        for other_id, c in counts.items():
            self.covisibility.setdefault(other_id, {})[kf.keyframe_id] = c

    def covisible_keyframes(self, kf: KeyFrame, min_shared: int = 15) -> list[int]:
        return [
            kf_id
            for kf_id, c in sorted(
                self.covisibility.get(kf.keyframe_id, {}).items(), key=lambda x: -x[1]
            )
            if c >= min_shared
        ]

    def cull_bad_points(self) -> int:
        """Remove landmarks that lost their observations (implemented; the
        reference leaves this commented out, local_mapping.py:135-165)."""
        removed = 0
        for mp in self.map.get_map_points():
            if mp.is_bad or (mp.num_observations() < 1):
                self.map.remove_map_point(mp)
                removed += 1
        return removed
