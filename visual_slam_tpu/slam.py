"""SLAM system facade: wiring + lifecycle.

API parity with the reference SLAM (visual_slam/slam.py:15-71): constructs
FeatureTracker, Map, Tracking, LocalMapping, LocalHandler (+ a working
GlobalHandler and loop-closing slot), owns the global state value, exposes
``track(images, timestamp, depth)``, ``shutdown()``, ``reset()``.

Default execution is synchronous/deterministic (local mapping + windowed BA
run inline at keyframe boundaries); ``threaded=True`` restores the
reference's background-thread pipeline (slam.py:50-54).
"""
from __future__ import annotations


from .backend.optimizer import LMOptimizer
from .camera import Camera
from .config import Config
from .frontend.tracker import FeatureTracker
from .handlers import GlobalHandler, LocalHandler
from .local_mapping import LocalMapping
from .map import Map
from .sensor_type import SensorType
from .state import State
from .tracking import Tracking
from .utils.logging import get_logger


class SLAM:
    def __init__(
        self,
        camera: Camera,
        config: Config | None = None,
        log_dir: str | None = None,
        threaded: bool = False,
    ):
        self.camera = camera
        self.config = config or Config()
        self.state = State.NO_IMAGES_YET
        self.logger = get_logger("slam", log_dir=log_dir)
        from .ops import orb as _orb

        _orb.set_ragged_descriptors(self.config.feature.ragged_descriptors)

        # Component wiring (reference slam.py:34-44).
        self.feature_tracker = FeatureTracker(self.config.feature)
        self.map = Map(max_frames=self.config.map.max_frames)
        if self.config.optimization.solver == "adam":
            from .backend.adam import AdamOptimizer

            self.optimizer = AdamOptimizer(self.config, camera, logger=get_logger("optimizer", log_dir))
        else:
            self.optimizer = LMOptimizer(self.config, camera, logger=get_logger("optimizer", log_dir))
        sensor = SensorType[self.config.camera.sensor_type.upper()]
        self.local_mapping = LocalMapping(
            camera, self.config, self.map, self.feature_tracker,
            sensor_type=sensor, logger=get_logger("local_mapping", log_dir),
            threaded=threaded,
        )
        self.tracking = Tracking(
            camera, self.config, self.feature_tracker, self.map,
            self.local_mapping, optimizer=self.optimizer,
            logger=get_logger("tracking", log_dir), slam=self,
        )
        self.local_handler = LocalHandler(
            self.map, self.optimizer, camera, self.config,
            threaded=threaded, logger=get_logger("local_handler", log_dir),
        )
        self.global_handler = GlobalHandler(
            self.map, self.optimizer, camera, self.config,
            threaded=threaded, logger=get_logger("global_handler", log_dir),
        )
        # Working loop closing (reference slam.py:44 hardcodes None).
        if self.config.loop_closing.enabled:
            from .loop_closing import LoopClosing

            self.loop_closing = LoopClosing(
                self.map, camera, self.config, optimizer=self.optimizer,
                logger=get_logger("loop_closing", log_dir),
            )
        else:
            self.loop_closing = None
        self.threaded = threaded
        self._post_start()

    def _post_start(self) -> None:
        """(reference slam.py:50-54)"""
        if self.threaded:
            self.local_mapping.start()
            self.local_handler.start()
            self.global_handler.start()

    # -- main API (reference slam.py:56-71) --------------------------------
    def track(self, images, timestamp: float, depth=None) -> dict:
        info = self.tracking.track(images, timestamp, depth)
        if info.get("new_keyframe"):
            # Windowed BA at keyframe boundaries — the deterministic
            # replacement for the reference's timer-driven BA thread.
            self.local_handler.trigger()
            if self.loop_closing is not None:
                kf = self.map.get_last_keyframe()
                if kf is not None:
                    loop = self.loop_closing.process_keyframe(kf)
                    if loop is not None:
                        info["loop_closed"] = loop["loop"]
        return info

    def shutdown(self) -> None:
        if self.threaded:
            self.local_mapping.stop()
            self.local_handler.stop()
            self.global_handler.stop()
            self.local_mapping.join(2.0)
            self.local_handler.join(2.0)
            self.global_handler.join(2.0)
        self.local_mapping.drain()
        if self.threaded and self.map.num_keyframes() >= 2:
            # Final synchronous refinement (standard SLAM shutdown): the
            # background threads may have stopped mid-solve or written back
            # a solve packed from a now-stale snapshot — one clean full-map
            # BA on the quiesced map consolidates it (collapses the
            # thread-interleaving ATE tail: 10 reps measured 0.03-0.61
            # without, the tail being late/stale writebacks, not gauge
            # mixing).
            try:
                self.optimizer.optimize_global(
                    self.map.get_keyframes(), self.map.get_map_points()
                )
            except Exception:  # pragma: no cover - shutdown must not raise
                self.logger.exception("final shutdown BA failed")
        self.logger.info(
            "shutdown: %d keyframes, %d landmarks", self.map.num_keyframes(), self.map.num_map_points()
        )

    def reset(self) -> None:
        self.map.reset()
        self.state = State.NO_IMAGES_YET
        self.tracking.last_frame = None
        self.tracking.current_frame = None
        self.tracking.reference_keyframe = None
        self.tracking.initializer.initialized = False

    # -- checkpoint / resume (absent in the reference, SURVEY.md §5) --------
    def save(self, path) -> None:
        """Checkpoint the full system: map + tracking context."""
        import json
        from pathlib import Path

        import numpy as np

        from .utils.serialization import save_map

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        save_map(self.map, path / "map.npz")
        meta = {
            "state": self.state.name,
            "motion_model": np.asarray(self.tracking.motion_model).tolist(),
            "last_keyframe_frame_id": self.tracking.last_keyframe_frame_id,
            "config": self.config.to_dict(),
        }
        (path / "slam.json").write_text(json.dumps(meta, indent=2))

    @classmethod
    def resume(cls, path, camera, log_dir: str | None = None) -> "SLAM":
        """Restore a checkpointed system and continue tracking."""
        import json
        from pathlib import Path

        import numpy as np

        from .config import Config
        from .utils.serialization import load_map

        path = Path(path)
        meta = json.loads((path / "slam.json").read_text())
        cfg = Config.from_dict(meta["config"])
        slam = cls(camera, cfg, log_dir=log_dir)
        slam.map = load_map(path / "map.npz")
        # Rewire components onto the restored map.
        slam.tracking.map = slam.map
        slam.tracking.initializer.map = slam.map
        slam.local_mapping.map = slam.map
        slam.local_mapping.handler.map = slam.map
        slam.local_handler.map = slam.map
        slam.global_handler.map = slam.map
        if slam.loop_closing is not None:
            slam.loop_closing.map = slam.map
        kf = slam.map.get_last_keyframe()
        if kf is not None and meta["state"] in ("OK", "MAPPING"):
            slam.state = State.OK
            slam.tracking.reference_keyframe = kf
            slam.tracking.last_frame = kf
            slam.tracking.current_frame = kf
            slam.tracking.last_keyframe_frame_id = meta["last_keyframe_frame_id"]
            slam.tracking.motion_model = np.asarray(meta["motion_model"])
            slam.tracking.initializer.initialized = True
        return slam

    # -- introspection -----------------------------------------------------
    def metrics(self) -> dict:
        """Observability snapshot (the reference logs counts to files only;
        this is a structured export for dashboards/tests)."""
        return {
            "state": self.state.name,
            "num_keyframes": self.map.num_keyframes(),
            "num_map_points": self.map.num_map_points(),
            "num_frames_buffered": self.map.num_frames(),
            "mean_reprojection_error_px": self.map.compute_mean_reprojection_error(
                self.camera.K
            ),
            "last_track": {
                k: v
                for k, v in self.tracking.last_track_info.items()
                if isinstance(v, (int, float, bool, str))
            },
            "last_ba": {
                k: v
                for k, v in self.local_handler.last_result.items()
                if isinstance(v, (int, float, bool, str))
            },
            "loops_closed": len(self.loop_closing.closed_loops)
            if self.loop_closing is not None
            else 0,
        }

    def trajectory(self):
        """(frame_id, timestamp, T_w2c (4,4)) per keyframe, ordered."""
        import numpy as np

        return [
            (kf.id, kf.timestamp, np.asarray(kf.T_w2c)) for kf in self.map.get_keyframes()
        ]
