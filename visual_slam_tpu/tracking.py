"""Per-frame tracking state machine.

API parity with the reference Tracking (visual_slam/tracking.py:113-598):
state dispatch, first-frame intake, two-view initialization hand-off,
steady-state PnP tracking against the reference keyframe with a
constant-velocity motion model, tracking-quality gates, keyframe decision,
and motion-model update. The per-match Python gather of the reference
(tracking.py:300-316) is replaced by a dense slot-aligned landmark array
lookup; pose estimation is the vmapped fixed-budget RANSAC-PnP + GN refine.

Beyond the reference: ``_relocalize`` is implemented (PnP against recent
keyframes) instead of a stub returning None (reference tracking.py:596-598),
so LOST is recoverable.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .config import Config
from .frontend.tracker import FeatureTracker
from .initializer import Initializer
from .map import Frame, KeyFrame, Map
from .ops.lie import rotation_angle
from .ops.pnp import ransac_pnp
from .ops.projection import normalize_points
from .state import State


class Tracking:
    def __init__(
        self,
        camera: Camera,
        config: Config,
        feature_tracker: FeatureTracker,
        slam_map: Map,
        local_mapping,
        optimizer=None,
        logger: Optional[logging.Logger] = None,
        slam=None,
    ):
        self.camera = camera
        self.config = config
        self.tracker = feature_tracker
        self.map = slam_map
        self.local_mapping = local_mapping
        self.optimizer = optimizer
        self.logger = logger or logging.getLogger("tracking")
        self._slam = slam  # state owner (reference slam.py:29 / tracking.py:81-87)
        self._state = State.NO_IMAGES_YET

        self.initializer = Initializer(
            camera, config, feature_tracker, slam_map, logger=self.logger
        )
        self.initializer.optimizer = optimizer

        self.current_frame: Frame | None = None
        self.last_frame: Frame | None = None
        self.reference_keyframe: KeyFrame | None = None
        self.motion_model = np.eye(4)  # T_rel = T_cur @ inv(T_last), w2c
        self.last_keyframe_frame_id = -1
        self._key = jax.random.PRNGKey(13)
        self.last_track_info: dict = {}
        # Mono-gauge versioning (threaded mode): the map gauge the carried
        # state (last_frame pose, motion model) is expressed in, and the
        # gauge of the latest landmark gather. See Map.gauge_version.
        self._gauge_seen = 0
        self._gather_gauge_version = 0
        # Relocalization place-recognition cache: kf_id -> (V,) global
        # signature (loop_closing/signature.py), backfilled lazily.
        self._reloc_sig_table: dict[int, np.ndarray] = {}
        # (ref_kf_id, T_w2c at gather time): a concurrent BA writeback may
        # move the reference keyframe between this frame's landmark gather
        # and its promotion; the keyframe is then re-anchored through the
        # reference's pose delta (ORB-SLAM's reference-relative pose).
        self._gather_ref_snap: tuple[int, np.ndarray] | None = None
        from .trackingalgorithm import FusedMonoTracking, MonoTracking

        # Pluggable strategy (trackingalgorithm/).
        self.algorithm = (
            FusedMonoTracking() if config.tracking.fused_pipeline else MonoTracking()
        )

    # -- state proxied to the SLAM facade (reference tracking.py:81-87) ----
    @property
    def state(self) -> State:
        return self._slam.state if self._slam is not None else self._state

    @state.setter
    def state(self, value: State) -> None:
        if self._slam is not None:
            self._slam.state = value
        else:
            self._state = value

    # -- entry point (reference tracking.py:113-138) -----------------------
    def track(self, images, timestamp: float, depth=None) -> dict:
        state = self.state
        if state == State.NO_IMAGES_YET:
            if self.config.camera.sensor_type == "monocular":
                self._process_first_frame(images, timestamp, depth)
            else:
                # Stereo/RGBD have metric depth: initialize immediately.
                self._try_initialize(images, timestamp, depth)
            return {"state": self.state.name}
        if state in (State.NOT_INITIALIZED, State.INITIALIZING):
            self._try_initialize(images, timestamp, depth)
            return {"state": self.state.name}
        if state == State.OK:
            info = self._track_ok(images, timestamp, depth)
            info["state"] = self.state.name
            return info
        if state == State.LOST:
            info = self._relocalize(images, timestamp, depth)
            info["state"] = self.state.name
            return info
        return {"state": state.name}

    # -- bootstrap states --------------------------------------------------
    def _process_first_frame(self, images, timestamp, depth) -> None:
        """(reference tracking.py:144-151)"""
        self.initializer.add_frame(images, timestamp, depth)
        self.state = State.NOT_INITIALIZED

    def _try_initialize(self, images, timestamp, depth) -> None:
        """(reference tracking.py:153-163)"""
        self.state = State.INITIALIZING
        if self.initializer.initialize(images, timestamp, depth):
            self.reference_keyframe = self.map.get_last_keyframe()
            self.current_frame = self.map.get_last_frame()
            self.last_frame = self.current_frame
            self.last_keyframe_frame_id = self.current_frame.id if self.current_frame else -1
            self.motion_model = np.eye(4)
            self.state = State.OK

    # -- steady state ------------------------------------------------------
    def _track_ok(self, images, timestamp, depth) -> dict:
        """(reference tracking.py:169-230 _track_ok/_track_mono)"""
        sensor = self.config.camera.sensor_type
        if sensor == "monocular":
            return self._track_mono(images, timestamp, depth)
        # Stereo/RGBD share the mono PnP core; landmarks differ at KF creation.
        return self._track_mono(images, timestamp, depth)

    def _track_mono(self, images, timestamp, depth) -> dict:
        kf_ref = self.map.get_last_keyframe()
        self.reference_keyframe = kf_ref
        frame, info = self.algorithm.process(self, images, timestamp, depth)
        match_res = info.pop("match_res", None)
        # Async global BA may have renormalized the map gauge mid-frame:
        # convert the just-solved pose (and carried state) before any
        # decision or promotion reads it.
        self._catch_up_gauge(frame)

        good = self._is_tracking_good(info)
        info["tracking_good"] = good
        if not good:
            self.logger.warning(
                "tracking lost at frame %d (inliers=%s of %s)",
                frame.id, info.get("n_inliers"), info.get("n_3d2d"),
            )
            self.state = State.LOST
            self.last_track_info = info
            return info

        if self._need_new_keyframe(frame, kf_ref, info):
            self._create_keyframe(frame, match_res, info)
            info["new_keyframe"] = True

        self._update_tracking_state(frame)
        info.pop("guided", None)  # internal association payload
        info.pop("pnp_inliers", None)
        self.last_track_info = info
        return info

    def _create_frame(self, images, timestamp, depth) -> Frame:
        """(reference _create_frame_mono, tracking.py:232-257; detects on
        every camera for stereo pairs). With a distorted camera, keypoint
        coordinates are undistorted to ideal pinhole pixels once here, so
        every downstream stage (matching gates, PnP, triangulation, BA)
        operates in the rectified model — replaces the reference's scattered
        cv2.undistortPoints calls (camera.py:160-169)."""
        images = list(images) if isinstance(images, (list, tuple)) else [images]
        grays = [im if im.ndim == 2 else _to_gray(im) for im in images]
        feats = [self.tracker.detectAndCompute(g) for g in grays]
        feats = [undistort_features(f, self.camera) for f in feats]
        frame = Frame(
            images=images, images_gray=grays, features=feats,
            timestamp=timestamp, depth=depth,
        )
        self._measure_depth(frame)
        self.map.add_frame(frame)
        self.current_frame = frame
        return frame

    def _measure_depth(self, frame: Frame) -> None:
        """Per-keypoint depth for the second modality (stereo right image /
        RGB-D depth map), one batched dispatch — feeds the depth-aware PnP
        residual and keyframe landmark creation (reference never uses the
        second modality during tracking, visual_slam/tracking.py:415-444)."""
        tcfg = self.config.tracking
        sensor = self.config.camera.sensor_type
        if not tcfg.use_depth_residual:
            return
        if sensor == "stereo" and frame.get_features(1) is not None:
            from .ops.stereo import stereo_feature_depths

            bf = float(getattr(self.camera, "bf", 0.0))
            if bf <= 0:
                return
            fl, fr = frame.get_features(0), frame.get_features(1)
            lcfg = self.config.local_mapping
            res = stereo_feature_depths(
                fl.xy, fl.desc, fl.valid, fr.xy, fr.desc, fr.valid,
                bf, row_tolerance=tcfg.stereo_row_tolerance,
                max_disparity=bf / max(lcfg.min_depth, 1e-6),
            )
            z = np.asarray(res["z"])
            ok = np.asarray(res["valid"]) & (z > lcfg.min_depth) & (z < lcfg.max_depth)
            frame.kp_z, frame.kp_z_valid = z, ok
        elif sensor == "rgbd" and frame.depth is not None:
            from .ops.stereo import sample_depth_at

            feats = frame.get_features(0)
            res = sample_depth_at(
                jnp.asarray(frame.depth), feats.xy, depth_scale=tcfg.depth_scale
            )
            z = np.asarray(res["z"])
            lcfg = self.config.local_mapping
            ok = (
                np.asarray(res["valid"]) & np.asarray(feats.valid)
                & (z > lcfg.min_depth) & (z < lcfg.max_depth)
            )
            frame.kp_z, frame.kp_z_valid = z, ok

    def _depth_baseline(self) -> float:
        """Baseline (m) for the normalized-disparity residual."""
        if self.config.camera.sensor_type == "stereo":
            return float(getattr(self.camera, "baseline", 0.0))
        return float(self.config.tracking.rgbd_virtual_baseline)

    def _predict_pose(self, frame: Frame) -> None:
        """Constant-velocity prediction (reference tracking.py:446-451)."""
        if self.last_frame is not None:
            frame.update_pose(self.motion_model @ self.last_frame.T_w2c)

    # -- mono-gauge catch-up (threaded-mode race cure) ----------------------
    def _consistent_gather(self, fn):
        """Run a landmark gather with a consistent gauge snapshot: the async
        global-BA thread rescales every landmark and bumps the map gauge
        version under the map lock, so version-before == version-after
        proves the gather saw one gauge. On a torn read, retry; as a last
        resort take the map lock (blocks the BA thread's writeback).
        Records the snapshot version for the end-of-frame catch-up."""
        ref = self.reference_keyframe
        for _ in range(3):
            v0 = self.map.gauge_version
            out = fn()
            if self.map.gauge_version == v0:
                self._gather_gauge_version = v0
                if ref is not None:
                    self._gather_ref_snap = (ref.keyframe_id, ref.T_w2c.copy())
                return out
        with self.map._lock:
            self._gather_gauge_version = self.map.gauge_version
            if ref is not None:
                self._gather_ref_snap = (ref.keyframe_id, ref.T_w2c.copy())
            return fn()

    @staticmethod
    def _apply_similarity_to_pose(frame, s: float, b: np.ndarray) -> None:
        """Convert a pose solved in an old gauge into the current one: the
        similarity x -> s*x + b moves the camera center, rotation unchanged
        (reprojection-invariant, backend/optimizer._reimpose_mono_gauge)."""
        R = frame.R_w2c
        C = s * frame.t_c2w + b
        frame.set_pose_Rt(R, -R @ C)

    def _catch_up_gauge(self, frame: Frame | None) -> None:
        """Bring the in-flight frame pose (solved against landmarks gathered
        at _gather_gauge_version) and the carried tracking state (last_frame
        pose, motion-model translation) up to the map's current gauge. In
        synchronous mode this is a no-op (versions never diverge mid-frame).
        Cures the round-2 'tolerated' race: a keyframe promoted with a
        pre-renormalization-scale pose mixed gauges in the map."""
        v_now = self.map.gauge_version
        if frame is not None and self._gather_gauge_version != v_now:
            s, b = self.map.gauge_since(self._gather_gauge_version)
            self._apply_similarity_to_pose(frame, s, b)
            # Keep the gather-time reference snapshot in the SAME gauge, so
            # the promotion-time reference-delta correction measures only
            # non-gauge BA movement (no double-correction).
            if self._gather_ref_snap is not None:
                _, T_snap = self._gather_ref_snap
                R = T_snap[:3, :3]
                C = s * (-R.T @ T_snap[:3, 3]) + b
                T_snap = T_snap.copy()
                T_snap[:3, 3] = -R @ C
                self._gather_ref_snap = (self._gather_ref_snap[0], T_snap)
        if self._gauge_seen != v_now:
            s, b = self.map.gauge_since(self._gauge_seen)
            if self.last_frame is not None and self.last_frame is not frame:
                self._apply_similarity_to_pose(self.last_frame, s, b)
            # Relative translation between same-gauge poses scales by s (the
            # center offset b cancels in the difference).
            self.motion_model = self.motion_model.copy()
            self.motion_model[:3, 3] *= s
        self._gauge_seen = v_now
        self._gather_gauge_version = v_now

    def _track_reference_keyframe(self, frame: Frame, kf_ref: KeyFrame):
        """Match current frame to the reference KF and gather 3D-2D pairs
        (reference _track_local_map_mono, tracking.py:259-330 — the Python
        per-match gather becomes a dense slot lookup)."""
        if kf_ref is None:
            return None, None, None, np.zeros(0, bool)
        res = self.tracker.match(frame.get_features(0), kf_ref.get_features(0))
        ref_pos, ref_mask = self._consistent_gather(lambda: kf_ref.point_arrays(0))
        ti = np.asarray(res.train_idx)
        pair_valid = np.asarray(res.valid) & ref_mask[ti]
        pts3d = ref_pos[ti]
        xy_obs = np.asarray(res.features1.xy)
        return res, pts3d, xy_obs, pair_valid

    def _local_landmark_block(
        self, n_keyframes: int = 3, cap: int | None = None, keyframes=None
    ):
        """Dense local-map landmark block (positions, descriptors, mask) from
        the last-N keyframes (or an explicit ``keyframes`` list — e.g. the
        relocalization candidates, which may be far in the past), padded to a
        fixed capacity for stable jit shapes. Feeds the projection-guided
        matcher. The capacity scales with the feature budget (at 2000 feats
        x 3 KFs a fixed 2048 would truncate)."""
        if cap is None:
            cap = max(2048, 2 * self.config.feature.num_features)

        def gather():
            mps = {}
            for kf in (
                keyframes
                if keyframes is not None
                else self.map.get_keyframes()[-n_keyframes:]
            ):
                for mp in list(kf.map_points.values()):
                    if not mp.is_bad and mp.descriptor is not None:
                        mps[mp.id] = mp
            pos = np.zeros((cap, 3), np.float32)
            # Descriptor width follows the configured family (8 binary
            # words, or 128 bitcast floats — matching.is_binary_desc).
            dw = self.tracker.desc_words
            desc = np.zeros((cap, dw), np.uint32)
            valid = np.zeros(cap, bool)
            sel = list(mps.values())[:cap]
            for i, mp in enumerate(sel):
                pos[i] = mp.position
                desc[i] = mp.descriptor
                valid[i] = True
            return pos, desc, valid, sel

        return self._consistent_gather(gather)

    def _track_guided(
        self,
        frame: Frame,
        n_keyframes: int = 3,
        radius_px: float = 25.0,
        keyframes=None,
    ):
        """Projection-guided local-map association (ops/guided_matching.py):
        project landmarks into the motion-model predicted pose, match within
        a pixel window. Returns (pts3d, xy_obs, pair_valid) keypoint-aligned."""
        from .ops.guided_matching import guided_match

        pos, desc, lvalid, landmarks = self._local_landmark_block(
            n_keyframes, keyframes=keyframes
        )
        if not lvalid.any():
            return None
        feats = frame.get_features(0)
        res = guided_match(
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(lvalid),
            jnp.asarray(frame.T_w2c, jnp.float32),
            jnp.asarray(self.camera.K, jnp.float32),
            feats.xy, feats.desc, feats.valid,
            float(self.camera.width), float(self.camera.height),
            radius_px=radius_px,
        )
        return {
            "pts3d": np.asarray(res["pts3d"]),
            "xy": np.asarray(feats.xy),
            "valid": np.asarray(res["valid"]),
            "lm_idx": np.asarray(res["lm_idx"]),
            "landmarks": landmarks,
        }

    def _track_local_map(self, frame: Frame, n_keyframes: int = 3):
        """Gather 3D-2D candidates against the last-N keyframes (a true
        local-map search, unlike the reference's single-latest-KF matching —
        SURVEY.md §3.2 note). Each current keypoint keeps its best landmark
        association across keyframes. Returns (match_res_of_last_kf, pts3d,
        xy_obs, pair_valid)."""
        kfs = self.map.get_keyframes()[-n_keyframes:]
        if not kfs:
            return None, None, None, np.zeros(0, bool)
        feats_cur = frame.get_features(0)
        Kslots = feats_cur.xy.shape[0]

        def gather():
            best_dist = np.full(Kslots, np.inf, np.float32)
            pts3d = np.zeros((Kslots, 3), np.float32)
            pair_valid = np.zeros(Kslots, bool)
            res_last = None
            for kf in reversed(kfs):  # newest first
                res = self.tracker.match(feats_cur, kf.get_features(0))
                if res_last is None:
                    res_last = res
                ref_pos, ref_mask = kf.point_arrays(0)
                ti = np.asarray(res.train_idx)
                ok = np.asarray(res.valid) & ref_mask[ti]
                dist = np.asarray(res.distance)
                take = ok & (dist < best_dist)
                best_dist[take] = dist[take]
                pts3d[take] = ref_pos[ti[take]]
                pair_valid |= take
            return res_last, pts3d, pair_valid

        res_last, pts3d, pair_valid = self._consistent_gather(gather)
        xy_obs = np.asarray(feats_cur.xy)
        return res_last, pts3d, xy_obs, pair_valid

    def _optimize_pose(self, frame: Frame, pts3d, xy_obs, pair_valid) -> dict:
        """(reference _optimize_pose_mono -> solvePnPRansac,
        tracking.py:332-413)"""
        tcfg = self.config.tracking
        focal = self.camera.fx
        Kinv = jnp.asarray(self.camera.Kinv, jnp.float32)
        xy_norm = normalize_points(Kinv, jnp.asarray(xy_obs, jnp.float32))
        self._key, sub = jax.random.split(self._key)
        # Depth-aware solve when the frame carries per-keypoint depth
        # (stereo/RGB-D): the normalized-disparity residual constrains pose
        # every frame. Requires keypoint-slot-aligned candidates (guided /
        # local-map paths, which both index by keypoint slot).
        kp_z = getattr(frame, "kp_z", None)
        use_depth = (
            kp_z is not None
            and len(kp_z) == len(xy_obs)
            and self._depth_baseline() > 0
        )
        if use_depth:
            from .ops.pnp import ransac_pnp_depth

            res = ransac_pnp_depth(
                jnp.asarray(pts3d, jnp.float32),
                xy_norm,
                jnp.asarray(pair_valid),
                jnp.asarray(kp_z, jnp.float32),
                jnp.asarray(frame.kp_z_valid),
                self._depth_baseline(),
                sub,
                n_hyp=tcfg.pnp_hypotheses,
                thresh=tcfg.pnp_threshold_px / focal,
            )
        else:
            res = ransac_pnp(
                jnp.asarray(pts3d, jnp.float32),
                xy_norm,
                jnp.asarray(pair_valid),
                sub,
                n_hyp=tcfg.pnp_hypotheses,
                thresh=tcfg.pnp_threshold_px / focal,
            )
        ok = bool(res["ok"])
        n_inl = int(res["n_inliers"])
        n_pairs = max(int(pair_valid.sum()), 1)
        if n_inl < tcfg.min_inliers:
            # Motion-model fallback: robust GN from the predicted pose — the
            # RANSAC hypothesis batch can miss when candidates are scarce but
            # the prior is strong (constant-velocity).
            from .ops.pnp import refine_pose_gn, refine_pose_gn_depth, _reproj_err2

            R0 = jnp.asarray(frame.R_w2c, jnp.float32)
            t0 = jnp.asarray(frame.t_w2c, jnp.float32)
            thresh = tcfg.pnp_threshold_px / focal
            if use_depth:
                R1, t1 = refine_pose_gn_depth(
                    R0, t0, jnp.asarray(pts3d, jnp.float32), xy_norm,
                    jnp.asarray(pair_valid, jnp.float32),
                    jnp.asarray(kp_z, jnp.float32),
                    jnp.asarray(frame.kp_z_valid, jnp.float32),
                    self._depth_baseline(), iters=10, huber=thresh,
                )
            else:
                R1, t1 = refine_pose_gn(
                    R0, t0, jnp.asarray(pts3d, jnp.float32), xy_norm,
                    jnp.asarray(pair_valid, jnp.float32), iters=10, huber=thresh,
                )
            errs = _reproj_err2(R1, t1, jnp.asarray(pts3d, jnp.float32), xy_norm)
            inl2 = np.asarray((errs < thresh * thresh)) & pair_valid
            if int(inl2.sum()) > n_inl:
                res = {"R": R1, "t": t1, "inliers": jnp.asarray(inl2)}
                n_inl = int(inl2.sum())
                ok = n_inl >= 6
        if ok:
            frame.set_pose_Rt(np.asarray(res["R"], np.float64), np.asarray(res["t"], np.float64))
        return {
            "ok": ok,
            "n_inliers": n_inl,
            "inlier_ratio": n_inl / n_pairs,
            "pnp_inliers": np.asarray(res["inliers"]),
        }

    def _is_tracking_good(self, info: dict) -> bool:
        """(reference tracking.py:453-516)"""
        tcfg = self.config.tracking
        if not info.get("ok", False):
            return False
        if info.get("n_inliers", 0) < tcfg.min_inliers:
            return False
        if info.get("inlier_ratio", 0.0) < tcfg.min_inlier_ratio:
            return False
        if tcfg.check_reprojection_error and self.current_frame is not None:
            err = self.map.compute_mean_reprojection_error(self.camera.K)
            if err > tcfg.max_reprojection_error:
                return False
        return True

    def _need_new_keyframe(self, frame: Frame, kf_ref: KeyFrame, info: dict) -> bool:
        """(reference tracking.py:518-580; the undefined-variable path when
        last_frame is None is fixed by the early return)"""
        if kf_ref is None:
            return False
        tcfg = self.config.tracking
        gap = frame.id - self.last_keyframe_frame_id
        if gap <= 0:
            return False
        if info.get("n_inliers", 0) < tcfg.kf_min_matches:
            return True
        # Landmark coverage is thinning — refresh the local map before
        # tracking starves (beyond-reference gate; the reference only
        # counts raw matches, tracking.py:560-567).
        if info.get("n_3d2d", 0) < 2 * tcfg.kf_min_matches:
            return True
        if gap > tcfg.keyframe_interval:
            return True
        trans = float(np.linalg.norm(frame.t_c2w - kf_ref.t_c2w))
        rot_deg = float(
            np.rad2deg(
                np.asarray(rotation_angle(jnp.asarray(frame.R_w2c @ kf_ref.R_w2c.T, jnp.float32)))
            )
        )
        return trans > tcfg.kf_min_translation or rot_deg > tcfg.kf_min_rotation_deg

    def _create_keyframe(self, frame: Frame, match_res, info: dict) -> None:
        """Promote to keyframe, inherit tracked landmarks, hand to local
        mapping (reference tracking.py:582-585)."""
        # Re-anchor through the reference keyframe's pose delta: if an async
        # BA writeback moved the map between this frame's landmark gather
        # and now, the solved pose is expressed against PRE-solve geometry.
        # T_rel = T_frame @ inv(T_ref_at_gather) is BA-invariant; promoting
        # T_rel @ T_ref_now keeps the new keyframe consistent with the map
        # it joins. No-op in synchronous mode (delta is identity).
        snap = self._gather_ref_snap
        ref = self.reference_keyframe
        if (
            snap is not None
            and ref is not None
            and snap[0] == ref.keyframe_id
        ):
            with self.map._lock:
                T_ref_now = ref.T_w2c.copy()
            if not np.allclose(T_ref_now, snap[1], atol=1e-12):
                T_new = frame.T_w2c @ np.linalg.inv(snap[1]) @ T_ref_now
                frame.set_pose_Rt(T_new[:3, :3], T_new[:3, 3])
        kf = KeyFrame.from_frame(frame)
        # Gauge stamp: the pose is current as of the catch-up this frame;
        # the (threaded) mapping consumer re-checks before triangulating.
        kf.gauge_version = self._gauge_seen
        pnp_inl = info.get("pnp_inliers")
        guided = info.get("guided")
        if guided is not None:
            # Guided path: keypoint slot -> landmark identity directly.
            ok = guided["valid"]
            if pnp_inl is not None:
                ok = ok & np.asarray(pnp_inl)
            landmarks = guided["landmarks"]
            lm_idx = guided["lm_idx"]
            for i_cur in np.nonzero(ok)[0]:
                mp = landmarks[int(lm_idx[i_cur])]
                if not mp.is_bad:
                    kf.add_map_point(0, int(i_cur), mp)
        elif match_res is not None and self.reference_keyframe is not None:
            ti = np.asarray(match_res.train_idx)
            ok = np.asarray(match_res.valid)
            if pnp_inl is not None:
                ok = ok & np.asarray(pnp_inl)
            for i_cur in np.nonzero(ok)[0]:
                mp = self.reference_keyframe.get_map_point(0, int(ti[i_cur]))
                if mp is not None and not mp.is_bad:
                    kf.add_map_point(0, int(i_cur), mp)
        self.last_keyframe_frame_id = frame.id
        self.local_mapping.insert_keyframe(kf)
        self.reference_keyframe = kf

    def _update_tracking_state(self, frame: Frame) -> None:
        """Motion model T_rel = T_cur @ inv(T_last) (reference
        tracking.py:587-594 up to its T_w2c convention)."""
        if self.last_frame is not None:
            self.motion_model = frame.T_w2c @ np.linalg.inv(self.last_frame.T_w2c)
        self.last_frame = frame

    # -- relocalization (reference stub tracking.py:596-598; implemented) --
    def _relocalize(self, images, timestamp, depth, max_candidates: int = 5) -> dict:
        frame = self._create_frame(images, timestamp, depth)
        # Primary: descriptor PnP against the UNION landmark block of the
        # recent keyframes. Per-KF matching alone starves on sparse keyframes
        # (observed: 26 raw matches x 72/320 landmark slots -> 9 pairs, under
        # the inlier gate); the union block offers every local landmark.
        # Fallback: place-recognition over ALL keyframes — while LOST the
        # camera keeps moving, so after a few failed frames the recent
        # keyframes no longer overlap the view at all (observed: a 3-frame
        # blackout followed by 37 consecutive recent-KF relocalization
        # failures while older keyframes DID see the current view). The
        # compact-signature shortlist (loop_closing/signature.py) is the
        # same machinery ORB-SLAM uses DBoW for.
        recent = list(reversed(self.map.get_keyframes()[-max_candidates:]))
        tried = {kf.keyframe_id for kf in recent}
        candidates = recent + self._reloc_global_candidates(
            frame, exclude=tried, top_n=max_candidates
        )
        # Stage 1 — coarse pose from the candidates. Per-KF PnP FIRST (a
        # single keyframe's pairs are few but pure — observed 6 pairs / 6
        # inliers right after a blackout); the cross-candidate UNION only as
        # a backstop (it has count but cross-KF mismatches dilute the inlier
        # fraction below what 256 RANSAC hypotheses reliably crack —
        # observed 24 union pairs -> 3 inliers while one member KF was
        # 6-for-6). This is ORB-SLAM's multi-candidate relocalization shape.
        blocks = []
        per_kf = []  # (n_pairs, kf, match_res) for reference re-anchoring
        best = None  # (n_inliers, T_w2c, kf, match_res)
        for kf in candidates:
            res, pts3d, xy_obs, pair_valid = self._track_reference_keyframe(
                frame, kf
            )
            if res is None:
                continue
            n = int(pair_valid.sum())
            per_kf.append((n, kf, res))
            if n > 0:
                blocks.append((pts3d, xy_obs, pair_valid))
            if n >= 6:
                pr = self._optimize_pose(frame, pts3d, xy_obs, pair_valid)
                n_inl = pr.get("n_inliers", 0)
                if pr.get("ok") and n_inl >= 6 and (
                    best is None or n_inl > best[0]
                ):
                    best = (n_inl, frame.T_w2c.copy(), kf, res)
        if not blocks or not per_kf:
            return {"ok": False, "relocalized": False}
        if best is None:
            # Union backstop, padded to a fixed block count (one compile
            # shape per bucket).
            n_blocks = 2 * max_candidates
            Kf = blocks[0][0].shape[0]
            blocks = blocks[:n_blocks]
            while len(blocks) < n_blocks:
                blocks.append(
                    (
                        np.zeros((Kf, 3), np.float32),
                        np.zeros((Kf, 2), np.float32),
                        np.zeros(Kf, bool),
                    )
                )
            pose_res = self._optimize_pose(
                frame,
                np.concatenate([b[0] for b in blocks]),
                np.concatenate([b[1] for b in blocks]),
                np.concatenate([b[2] for b in blocks]),
            )
            self.logger.debug(
                "reloc union: %d pairs over %d candidates -> ok=%s inl=%d",
                sum(int(b[2].sum()) for b in blocks), len(per_kf),
                pose_res.get("ok"), pose_res.get("n_inliers", 0),
            )
            if pose_res.get("ok") and pose_res.get("n_inliers", 0) >= 6:
                n_best, kf_best, res_best = max(per_kf, key=lambda t: t[0])
                best = (
                    pose_res["n_inliers"], frame.T_w2c.copy(),
                    kf_best, res_best,
                )
        if best is None:
            return {"ok": False, "relocalized": False}
        # Re-impose the winning coarse pose (later per-KF attempts may have
        # overwritten the frame pose with a worse accepted solve).
        _, T_best, best_kf, best_res = best
        frame.set_pose_Rt(T_best[:3, :3], T_best[:3, 3])
        # Stage 2 — guided refine: the coarse pose seeds a projection-guided
        # search over the CANDIDATES' landmark block (not the last-N
        # keyframes: a loop-around relocalization matches far-past views),
        # and the expanded, keypoint-aligned set is re-optimized. A wide
        # radius absorbs the coarse pose's error (LOST = high uncertainty).
        pose_res = {"ok": True, "n_inliers": best[0], "inlier_ratio": 1.0}
        guided = self._track_guided(
            frame,
            radius_px=30.0,
            keyframes=[kf for _, kf, _ in per_kf],
        )
        guided_used = None
        if guided is not None and int(guided["valid"].sum()) >= 6:
            refined = self._optimize_pose(
                frame, guided["pts3d"], guided["xy"], guided["valid"]
            )
            if refined.get("ok"):
                pose_res = refined
                guided_used = guided
        self.logger.debug(
            "reloc guided: %s assoc -> inl=%d ratio=%.2f",
            "none" if guided is None else int(guided["valid"].sum()),
            pose_res.get("n_inliers", 0), pose_res.get("inlier_ratio", 0.0),
        )
        if guided_used is not None and self._is_tracking_good(pose_res):
            self.logger.info(
                "relocalized against KF %d (union %d pairs over %d candidates)",
                best_kf.keyframe_id, pose_res.get("n_inliers", 0), len(per_kf),
            )
            self.reference_keyframe = best_kf
            # Extend the map immediately: the relocalized frame becomes a
            # keyframe, so subsequent frames track fresh geometry instead
            # of the stale pre-loss keyframes (observed: without this the
            # camera moves on and tracking re-dies within a frame).
            creation_info = {
                "pnp_inliers": pose_res.get("pnp_inliers"),
                "guided": guided_used,
            }
            self._create_keyframe(frame, best_res, creation_info)
            self.motion_model = np.eye(4)
            self.last_frame = frame
            self.state = State.OK
            pose_res["relocalized"] = True
            return pose_res
        return {"ok": False, "relocalized": False}

    def _reloc_global_candidates(self, frame: Frame, exclude, top_n: int = 5):
        """Top-``top_n`` keyframes over the WHOLE map by compact global
        signature similarity (one tiny matmul per new keyframe + a host
        matvec — flat cost at any map size; loop_closing/signature.py)."""
        from .loop_closing.signature import (
            batch_signatures,
            keyframe_signature,
            score_signatures,
        )

        kfs = [
            kf
            for kf in self.map.get_keyframes()
            if kf.keyframe_id not in exclude and kf.get_features(0) is not None
        ]
        if not kfs:
            return []
        if len(self._reloc_sig_table) > len(kfs) + 64:
            # Evict signatures of culled keyframes (host-memory leak on
            # long runs otherwise).
            live = {kf.keyframe_id for kf in kfs}
            for kf_id in [k for k in self._reloc_sig_table if k not in live]:
                del self._reloc_sig_table[kf_id]
        missing = [
            kf for kf in kfs if kf.keyframe_id not in self._reloc_sig_table
        ]
        if missing:
            descs = np.stack([kf.descriptors(0) for kf in missing])
            valids = np.stack([kf.valid_mask(0) for kf in missing])
            for kf, sig in zip(missing, batch_signatures(descs, valids)):
                self._reloc_sig_table[kf.keyframe_id] = sig
        f = frame.get_features(0)
        if f is None:
            return []
        q = np.asarray(keyframe_signature(f.desc, f.valid))
        table = np.stack([self._reloc_sig_table[kf.keyframe_id] for kf in kfs])
        scores = score_signatures(q, table)
        top = np.argsort(-scores)[:top_n]
        return [kfs[int(i)] for i in top]


def _to_gray(img: np.ndarray) -> np.ndarray:
    return (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).astype(np.float32)


def undistort_features(feats, camera):
    """Replace keypoint pixel coordinates with their ideal-pinhole positions
    (no-op for distortion-free cameras)."""
    if not camera.has_distortion:
        return feats
    from .ops.projection import undistort_pixels

    xy_u = undistort_pixels(
        jnp.asarray(camera.K, jnp.float32),
        jnp.asarray(camera.Kinv, jnp.float32),
        jnp.asarray(camera.D, jnp.float32),
        feats.xy,
    )
    return feats._replace(xy=xy_u)
