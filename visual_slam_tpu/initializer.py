"""Two-view monocular map initialization.

API parity with the reference Initializer (visual_slam/initializer.py:65-491):
frame buffering, readiness gates (dt, feature counts, grid coverage), the
essential-matrix + triangulation chain with parallax/depth gating, keyframe
promotion, landmark creation with colors/observations, and a two-view BA
polish. Every geometric stage runs as a jitted fixed-shape op.

Deliberate deviations from reference quirks (SURVEY.md §7):
  * pose composition uses T_w2c_cur = T_ref2cur @ T_w2c_ref (the reference
    multiplies in the reverse order, initializer.py:171-176 — harmless there
    only because the reference frame is the identity);
  * the failure adaptation LOWERS min_inliers toward a floor (the reference's
    ``max(30, min_inliers - 10)`` RAISES a threshold that started at 10,
    initializer.py:283-287);
  * median-depth scale normalization is active by default (the reference
    implements but comments it out, initializer.py:384-391).
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
from .map import Frame, KeyFrame, Map, MapPoint
from .ops import epipolar as ep_ops
from .ops import triangulation as tri_ops
from .ops.projection import normalize_points


def check_feature_coverage(
    xy: np.ndarray, valid: np.ndarray, width: int, height: int,
    grid: int = 3, min_per_cell: int = 5, min_cell_fraction: float = 0.6,
) -> bool:
    """3x3 grid coverage gate (reference check_feature_coverage,
    utils/motion_estimation.py:312-359)."""
    pts = xy[valid]
    if len(pts) == 0:
        return False
    cx = np.clip((pts[:, 0] / width * grid).astype(int), 0, grid - 1)
    cy = np.clip((pts[:, 1] / height * grid).astype(int), 0, grid - 1)
    counts = np.zeros((grid, grid), int)
    np.add.at(counts, (cy, cx), 1)
    return (counts >= min_per_cell).mean() >= min_cell_fraction


class Initializer:
    def __init__(
        self,
        camera: Camera,
        config: Config,
        feature_tracker: FeatureTracker,
        slam_map: Map,
        logger: Optional[logging.Logger] = None,
        visualizer=None,
    ):
        self.camera = camera
        self.config = config
        self.tracker = feature_tracker
        self.map = slam_map
        self.logger = logger or logging.getLogger("initializer")
        self.visualizer = visualizer
        self.initialized = False
        self.min_inliers = config.initialization.min_inliers
        # Relaxation floor: never tightens a user-configured low threshold
        # (30 only caps the DEFAULT of 100, not a deliberate 20).
        self._min_inliers_floor = min(30, self.min_inliers)
        self._n_failures = 0
        self._key = jax.random.PRNGKey(7)

    # -- frame intake (reference initializer.py:65-86) ---------------------
    def add_frame(self, images, timestamp: float, depth=None) -> Frame:
        from .tracking import undistort_features

        images = list(images) if isinstance(images, (list, tuple)) else [images]
        grays = [im if im.ndim == 2 else _to_gray(im) for im in images]
        feats = [
            undistort_features(self.tracker.detectAndCompute(g), self.camera)
            for g in grays
        ]
        frame = Frame(
            images=images,
            images_gray=grays,
            features=feats,
            timestamp=timestamp,
            depth=depth,
        )
        self.map.add_frame(frame)
        return frame

    # -- entry point (reference initializer.py:88-108) ---------------------
    def initialize(self, images, timestamp: float, depth=None) -> bool:
        frame_cur = self.add_frame(images, timestamp, depth)
        sensor = self.config.camera.sensor_type
        if sensor == "monocular":
            return self._initialize_mono(frame_cur)
        if sensor == "stereo":
            return self._initialize_stereo(frame_cur)
        if sensor == "rgbd":
            return self._initialize_rgbd(frame_cur)
        raise ValueError(f"unknown sensor type {sensor!r}")

    # -- stereo / RGBD single-frame bootstrap (reference has `pass` stubs,
    # initializer.py:289-293) ----------------------------------------------
    def _initialize_stereo(self, frame: Frame) -> bool:
        """Metric bootstrap from one stereo pair: left/right match ->
        disparity -> depth = bf/d -> landmarks. No parallax wait, no scale
        gauge."""
        fl = frame.get_features(0)
        fr = frame.get_features(1)
        bf = getattr(self.camera, "bf", 0.0)
        if fl is None or fr is None or bf <= 0:
            return False
        res = self.tracker.match(fl, fr)
        ti = np.asarray(res.train_idx)
        ok = np.asarray(res.valid)
        xy_l = np.asarray(fl.xy)
        xy_r = np.asarray(fr.xy)
        icfg = self.config.initialization
        kf = KeyFrame.from_frame(frame)
        created = 0
        Kinv = self.camera.Kinv
        for i_l in np.nonzero(ok)[0]:
            ul, vl = xy_l[i_l]
            ur, vr = xy_r[int(ti[i_l])]
            if abs(vl - vr) > 2.0:  # rectified row gate (matching.py:192-228)
                continue
            disp = ul - ur
            if disp <= 0.1:
                continue
            z = bf / disp
            if not (icfg.min_depth < z < icfg.max_depth):
                continue
            p_cam = (Kinv @ np.array([ul, vl, 1.0])) * z
            p_w = frame.R_c2w @ p_cam + frame.t_c2w
            mp = MapPoint(p_w, color=_pixel_color(frame.get_image(0), xy_l[i_l]))
            kf.add_map_point(0, int(i_l), mp)
            self.map.add_map_point(mp)
            created += 1
        if created < self.min_inliers:
            for key in list(kf.map_points):
                kf.remove_map_point(*key)
            return False
        self.map.add_keyframe(kf)
        self.logger.info("stereo init: %d landmarks from one pair", created)
        self.initialized = True
        return True

    def _initialize_rgbd(self, frame: Frame) -> bool:
        """Metric bootstrap from one depth frame."""
        feats = frame.get_features(0)
        depth = frame.depth
        if feats is None or depth is None:
            return False
        icfg = self.config.initialization
        xy = np.asarray(feats.xy)
        valid = np.asarray(feats.valid)
        kf = KeyFrame.from_frame(frame)
        Kinv = self.camera.Kinv
        H, W = depth.shape[:2]
        created = 0
        for i in np.nonzero(valid)[0]:
            u, v = xy[i]
            ui, vi = int(round(u)), int(round(v))
            if not (0 <= ui < W and 0 <= vi < H):
                continue
            z = float(depth[vi, ui])
            if not (icfg.min_depth < z < icfg.max_depth):
                continue
            p_w = frame.R_c2w @ ((Kinv @ np.array([u, v, 1.0])) * z) + frame.t_c2w
            mp = MapPoint(p_w, color=_pixel_color(frame.get_image(0), xy[i]))
            kf.add_map_point(0, int(i), mp)
            self.map.add_map_point(mp)
            created += 1
        if created < self.min_inliers:
            for key in list(kf.map_points):
                kf.remove_map_point(*key)
            return False
        self.map.add_keyframe(kf)
        self.logger.info("rgbd init: %d landmarks from one frame", created)
        self.initialized = True
        return True

    # -- mono two-view bootstrap (reference initializer.py:119-287) --------
    def _initialize_mono(self, frame_cur: Frame) -> bool:
        """Evaluates EVERY buffered reference frame and initializes from the
        best-supported pair (n_points x parallax score) — the reference
        takes the first pair that passes its gates (initializer.py:119-287),
        which often locks in the minimum-baseline (noisiest) map."""
        frames = self.map.get_frames()
        icfg = self.config.initialization
        candidates = []
        for frame_ref in frames[:-1]:
            if not self._can_initialize(frame_ref, frame_cur):
                continue
            res = self.tracker.match(frame_cur.get_features(0), frame_ref.get_features(0))
            n_matches = res.n_matches
            if n_matches < self.min_inliers:
                self.logger.debug("init: %d matches < %d", n_matches, self.min_inliers)
                continue

            Kinv = jnp.asarray(self.camera.Kinv, jnp.float32)
            x_cur = normalize_points(Kinv, res.features1.xy)
            x_ref = normalize_points(Kinv, res.features2.xy[res.train_idx])

            self._key, sub = jax.random.split(self._key)
            motion = ep_ops.estimate_motion_2d2d(
                x_ref, x_cur, res.valid, sub,
                n_hyp=icfg.essential_hypotheses, thresh=icfg.essential_threshold,
            )
            n_inl = int(motion["n_inliers"])
            if n_inl < self.min_inliers:
                self.logger.debug("init: %d essential inliers < %d", n_inl, self.min_inliers)
                self._register_failure()
                continue

            # Compose world pose of cur from ref (T maps ref cam -> cur cam).
            T_ref = jnp.asarray(frame_ref.T_w2c, jnp.float32)
            T_cur = motion["T"] @ T_ref

            # Median parallax gate (reference initializer.py:207-220).
            med_par = float(
                tri_ops.median_ray_parallax(motion["R"], x_ref, x_cur, motion["inliers"])
            )
            if np.rad2deg(med_par) < icfg.min_parallax_deg / 2.0:
                self.logger.debug("init: median parallax %.3fdeg too low", np.rad2deg(med_par))
                self._register_failure()
                continue

            # Triangulate inliers (reference initializer.py:222-238).
            P1 = tri_ops.projection_from_T(T_ref)
            P2 = tri_ops.projection_from_T(T_cur)
            pts3d, w_ok = tri_ops.triangulate_dlt(P1, P2, x_ref, x_cur)
            good = motion["inliers"] & w_ok
            good &= tri_ops.depth_mask(T_ref, T_cur, pts3d, icfg.min_depth, icfg.max_depth)
            par = tri_ops.parallax_angles(T_ref, T_cur, pts3d)
            good &= par >= jnp.deg2rad(icfg.min_parallax_deg)
            n_good = int(jnp.sum(good))
            if n_good < self.min_inliers:
                self.logger.debug("init: %d surviving points < %d", n_good, self.min_inliers)
                self._register_failure()
                continue

            candidates.append({
                "frame_ref": frame_ref,
                "res": res,
                "T_cur": T_cur,
                "pts3d": np.asarray(pts3d),
                "good": np.asarray(good),
                "n_good": n_good,
                "parallax": med_par,
                "score": n_good * med_par,
            })

        if not candidates:
            return False
        best = max(candidates, key=lambda c: c["score"])
        frame_cur.update_pose(np.asarray(best["T_cur"], np.float64))
        self._finalize_initialization(
            best["frame_ref"], frame_cur, best["res"], best["pts3d"], best["good"]
        )
        self.logger.info(
            "init: success with %d points (parallax %.2fdeg, %d candidate pairs)",
            best["n_good"], np.rad2deg(best["parallax"]), len(candidates),
        )
        return True

    def _can_initialize(self, frame_ref: Frame, frame_cur: Frame) -> bool:
        """(reference initializer.py:396-414)"""
        icfg = self.config.initialization
        if frame_cur.timestamp - frame_ref.timestamp < icfg.min_dt:
            return False
        for f in (frame_ref, frame_cur):
            feats = f.get_features(0)
            if feats is None or int(np.asarray(feats.valid).sum()) < self.min_inliers:
                return False
        feats = frame_cur.get_features(0)
        return check_feature_coverage(
            np.asarray(feats.xy), np.asarray(feats.valid),
            self.camera.width, self.camera.height,
        )

    def _register_failure(self) -> None:
        """Adaptive threshold relaxation (fixes the reference's inverted
        floor, initializer.py:283-287)."""
        self._n_failures += 1
        if self._n_failures % 5 == 0:
            self.min_inliers = max(self._min_inliers_floor, self.min_inliers - 10)
            self.logger.info("init: relaxing min_inliers to %d", self.min_inliers)

    # -- map bootstrap (reference initializer.py:295-394) ------------------
    def _finalize_initialization(
        self, frame_ref: Frame, frame_cur: Frame, res, pts3d: np.ndarray, good: np.ndarray
    ) -> None:
        # Scale normalization: median landmark depth in ref camera -> 1
        # (reference normalize_depth_scale, motion_estimation.py:362-397).
        sel = np.nonzero(good)[0]
        pts_sel = pts3d[sel]
        z_ref = pts_sel @ frame_ref.R_w2c[2] + frame_ref.t_w2c[2]
        med = np.median(z_ref[z_ref > 0]) if (z_ref > 0).any() else 1.0
        if med > 1e-6:
            scale = 1.0 / med
            pts_sel = pts_sel * scale
            for fr in (frame_ref, frame_cur):
                T = fr.T_w2c.copy()
                T[:3, 3] *= scale
                fr.update_pose(T)

        kf_ref = KeyFrame.from_frame(frame_ref)
        kf_cur = KeyFrame.from_frame(frame_cur)
        self.map.add_keyframe(kf_ref)
        self.map.add_keyframe(kf_cur)

        train_idx = np.asarray(res.train_idx)
        img_ref = frame_ref.get_image(0)
        xy_ref = np.asarray(res.features2.xy)
        desc_ref = np.asarray(res.features2.desc)
        for n, i_cur in enumerate(sel):
            i_ref = int(train_idx[i_cur])
            color = _pixel_color(img_ref, xy_ref[i_ref])
            mp = MapPoint(pts_sel[n], color=color, descriptor=desc_ref[i_ref])
            kf_ref.add_map_point(0, i_ref, mp)
            kf_cur.add_map_point(0, int(i_cur), mp)
            self.map.add_map_point(mp)

        err_before = self.map.compute_mean_reprojection_error(self.camera.K)
        if getattr(self, "optimizer", None) is not None:
            self.map.optimize_initial(self.optimizer, [kf_ref, kf_cur])
            err_after = self.map.compute_mean_reprojection_error(self.camera.K)
            self.logger.info(
                "init BA: reproj %.3fpx -> %.3fpx", err_before, err_after
            )
        self.initialized = True


def _to_gray(img: np.ndarray) -> np.ndarray:
    return (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).astype(np.float32)


def _pixel_color(img: np.ndarray | None, xy: np.ndarray) -> np.ndarray:
    if img is None:
        return np.array([128, 128, 128], np.uint8)
    x = int(np.clip(xy[0], 0, img.shape[1] - 1))
    y = int(np.clip(xy[1], 0, img.shape[0] - 1))
    px = img[y, x]
    if np.ndim(px) == 0:
        return np.array([px, px, px], np.uint8)
    return np.asarray(px, np.uint8)
