"""CompiledSLAM: the full SLAM system built around the fused device-resident
tracking step.

The flexible host pipeline (slam.SLAM) issues several device calls per frame;
this variant issues exactly ONE per tracked frame — pipeline.track_step — and
reuses its outputs (features, matches, PnP inliers) for keyframe promotion,
so the per-frame cost equals the benchmark path (~100 FPS on v5e at 2000
features). Host work happens only at keyframe boundaries: landmark
inheritance from the reference block, fixed-shape triangulation of new
landmarks against the previous keyframe, bucketed LM/Schur bundle adjustment,
and a reference swap.

This is the deployment configuration for the "full pipeline at sensor rate"
workload (BASELINE config 4).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..backend.optimizer import LMOptimizer
from ..camera import PinholeCamera
from ..config import Config
from ..map import Frame, KeyFrame, Map, MapPoint
from ..ops import triangulation as tri_ops
from ..ops.projection import normalize_points
from ..pipeline import init_track_state, make_track_step, swap_reference
from ..state import State
from ..utils.logging import get_logger


class CompiledSLAM:
    def __init__(
        self,
        camera: PinholeCamera,
        config: Config | None = None,
        log_dir: str | None = None,
    ):
        self.camera = camera
        self.config = config or Config()
        self.logger = get_logger("compiled_slam", log_dir)
        fcfg = self.config.feature
        tcfg = self.config.tracking
        self.map = Map(max_frames=self.config.map.max_frames)
        self.optimizer = LMOptimizer(self.config, camera, logger=self.logger)
        self.state = State.NO_IMAGES_YET
        self._step = make_track_step(
            jnp.asarray(camera.K, jnp.float32),
            num_features=fcfg.num_features,
            fast_threshold=fcfg.fast_threshold,
            n_levels=fcfg.num_pyramid_levels,
            scale=fcfg.scale_factor,
            grid=fcfg.grid_cells,
            ratio=tcfg.match_ratio,
            pnp_hypotheses=tcfg.pnp_hypotheses,
            pnp_threshold_px=tcfg.pnp_threshold_px,
        )
        self._track_state = None
        self._init_frames: list[tuple[np.ndarray, float]] = []
        self._frames_since_kf = 0
        self.poses: list[tuple[float, np.ndarray]] = []  # (ts, T_w2c) per frame
        # Bootstrap reuses the host initializer (runs once).
        from ..frontend.tracker import FeatureTracker
        from ..initializer import Initializer

        self._feature_tracker = FeatureTracker(fcfg)
        self._initializer = Initializer(
            camera, self.config, self._feature_tracker, self.map, logger=self.logger
        )
        self._initializer.optimizer = self.optimizer

    # ------------------------------------------------------------------ API
    def track(self, images, timestamp: float, depth=None) -> dict:
        img = images[0] if isinstance(images, (list, tuple)) else images
        if self.state == State.LOST:
            return self._relocalize(img, timestamp)
        if self.state != State.OK:
            return self._bootstrap(img, timestamp, depth)
        return self._track_compiled(img, timestamp)

    def shutdown(self) -> None:
        self.logger.info(
            "shutdown: %d keyframes, %d landmarks, %d frame poses",
            self.map.num_keyframes(), self.map.num_map_points(), len(self.poses),
        )

    def metrics(self) -> dict:
        return {
            "state": self.state.name,
            "num_keyframes": self.map.num_keyframes(),
            "num_map_points": self.map.num_map_points(),
            "num_frames": len(self.poses),
        }

    # ----------------------------------------------------------- bootstrap
    def _bootstrap(self, img, timestamp, depth) -> dict:
        self.state = State.INITIALIZING
        if self._initializer.initialize([img], timestamp, depth):
            self.state = State.OK
            kf = self.map.get_last_keyframe()
            self._install_reference(kf, T_init=kf.T_w2c)
            self.poses.append((timestamp, np.asarray(kf.T_w2c)))
        return {"state": self.state.name}

    def _relocalize(self, img, timestamp) -> dict:
        """LOST recovery: retry the compiled step against each recent
        keyframe's reference block (the step IS a PnP relocalization when
        given a candidate reference)."""
        tcfg = self.config.tracking
        for kf in reversed(self.map.get_keyframes()[-5:]):
            self._install_reference(kf, T_init=kf.T_w2c)
            self._track_state, out = self._step(
                self._track_state, jnp.asarray(img, jnp.float32)
            )
            n_inl = int(out.n_inliers)
            if n_inl >= tcfg.min_inliers:
                self.state = State.OK
                T = np.asarray(out.T_w2c, np.float64)
                self.poses.append((timestamp, T))
                self.logger.info("relocalized against KF %d (%d inliers)",
                                 kf.keyframe_id, n_inl)
                return {"state": self.state.name, "relocalized": True,
                        "n_inliers": n_inl}
        return {"state": self.state.name, "relocalized": False}

    def _install_reference(self, kf: KeyFrame, T_init: np.ndarray) -> None:
        pos, mask = kf.point_arrays(0)
        feats = kf.get_features(0)
        if self._track_state is None:
            self._track_state = init_track_state(feats, pos, mask, T_init)
        else:
            self._track_state = swap_reference(self._track_state, feats, pos, mask)
            self._track_state = self._track_state._replace(
                T_w2c=jnp.asarray(T_init, jnp.float32)
            )
        self._ref_kf = kf

    # ------------------------------------------------------- steady state
    def _track_compiled(self, img, timestamp) -> dict:
        self._track_state, out = self._step(
            self._track_state, jnp.asarray(img, jnp.float32)
        )
        n_inl = int(out.n_inliers)
        T = np.asarray(out.T_w2c, np.float64)
        self.poses.append((timestamp, T))
        info = {"state": self.state.name, "n_inliers": n_inl,
                "n_matches": int(out.n_matches)}
        self._frames_since_kf += 1
        tcfg = self.config.tracking
        if n_inl < tcfg.min_inliers:
            self.state = State.LOST
            info["state"] = self.state.name
            self.logger.warning("compiled tracking lost (%d inliers)", n_inl)
            return info
        if (
            self._frames_since_kf > tcfg.keyframe_interval
            or n_inl < tcfg.kf_min_matches
        ):
            self._promote_keyframe(out, timestamp, T)
            info["new_keyframe"] = True
        return info

    def _promote_keyframe(self, out, timestamp: float, T: np.ndarray) -> None:
        """Keyframe boundary: all data comes from the track step's outputs —
        no re-detection, no extra matching."""
        frame = Frame(features=[out.features], timestamp=timestamp)
        frame.update_pose(T)
        kf = KeyFrame.from_frame(frame)
        ref = self._ref_kf

        ti = np.asarray(out.match_train_idx)
        m_ok = np.asarray(out.match_valid)
        inl = np.asarray(out.pnp_inliers)

        # Inherit landmarks: current kp i matched ref slot ti[i] that carries
        # a landmark and survived PnP.
        _, ref_mask = ref.point_arrays(0)
        inherit = m_ok & inl & ref_mask[ti]
        for i in np.nonzero(inherit)[0]:
            mp = ref.get_map_point(0, int(ti[i]))
            if mp is not None and not mp.is_bad:
                kf.add_map_point(0, int(i), mp)

        # Triangulate new landmarks from matched-but-landmarkless pairs.
        tri_mask = m_ok & ~ref_mask[ti]
        self._triangulate(kf, ref, ti, tri_mask, out)

        self.map.add_keyframe(kf)
        self._frames_since_kf = 0

        # Windowed BA (bucketed shapes; full map while small).
        if self.map.num_keyframes() > 2:
            kfs = self.map.get_keyframes()
            if len(kfs) <= 2 * self.config.optimization.window_size:
                self.map.optimize_global(self.optimizer)
            else:
                self.map.optimize_local(
                    self.optimizer, kfs[-self.config.optimization.window_size:]
                )
            T_new = kf.T_w2c  # BA may have moved the new keyframe

        else:
            T_new = T
        self._install_reference(kf, T_init=T_new)

    def _triangulate(self, kf: KeyFrame, ref: KeyFrame, ti, tri_mask, out) -> int:
        lcfg = self.config.local_mapping
        Kinv = jnp.asarray(self.camera.Kinv, jnp.float32)
        x_cur = normalize_points(Kinv, out.features.xy)
        x_ref = normalize_points(Kinv, ref.get_features(0).xy[jnp.asarray(ti)])
        T_cur = jnp.asarray(kf.T_w2c, jnp.float32)
        T_ref = jnp.asarray(ref.T_w2c, jnp.float32)
        pts3d, w_ok = tri_ops.triangulate_dlt(
            tri_ops.projection_from_T(T_ref), tri_ops.projection_from_T(T_cur),
            x_ref, x_cur,
        )
        good = w_ok & tri_ops.depth_mask(T_ref, T_cur, pts3d, lcfg.min_depth, lcfg.max_depth)
        par = tri_ops.parallax_angles(T_ref, T_cur, pts3d)
        good &= par >= jnp.deg2rad(lcfg.min_parallax_deg)
        good_np = np.asarray(good) & tri_mask
        pts_np = np.asarray(pts3d)
        desc_np = np.asarray(out.features.desc)
        created = 0
        for i in np.nonzero(good_np)[0]:
            mp = MapPoint(pts_np[i], descriptor=desc_np[i])
            kf.add_map_point(0, int(i), mp)
            ref.add_map_point(0, int(ti[i]), mp)
            self.map.add_map_point(mp)
            created += 1
        return created
