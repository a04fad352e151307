"""Fused monocular strategy: the whole per-frame device work — detection,
projection-guided landmark association, RANSAC-PnP, predicted-pose fallback —
is ONE jitted program (pipeline.make_frame_step), so the host state machine
pays a single dispatch per frame instead of 3-4. The brute descriptor path
remains as a host-side retry for frames where the motion prediction poisons
the guided associations.

Distorted cameras are handled in-program: detected keypoints are undistorted
to ideal pinhole coordinates inside the fused step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseTrackingAlgorithm
from .mono_tracking import MonoTracking


class FusedMonoTracking(BaseTrackingAlgorithm):
    def __init__(self, n_local_keyframes: int = 3, landmark_cap: int | None = None):
        self.n_local_keyframes = n_local_keyframes
        self.landmark_cap = landmark_cap  # None -> scales with feature budget
        self._step = None
        self._stereo = False
        self._rgbd = False
        self._key = jax.random.PRNGKey(31)
        self._fallback = MonoTracking(n_local_keyframes, use_guided=False)

    def _get_step(self, tracking):
        if self._step is None:
            from ..pipeline import make_frame_step

            cam = tracking.camera
            fcfg = tracking.config.feature
            tcfg = tracking.config.tracking
            sensor = tracking.config.camera.sensor_type
            stereo = (
                sensor == "stereo"
                and tcfg.use_depth_residual
                and float(getattr(cam, "baseline", 0.0)) > 0
            )
            rgbd = sensor == "rgbd" and tcfg.use_depth_residual
            self._stereo = stereo
            self._rgbd = rgbd
            self._step = make_frame_step(
                jnp.asarray(cam.K, jnp.float32),
                float(cam.width), float(cam.height),
                num_features=fcfg.num_features,
                fast_threshold=fcfg.fast_threshold,
                n_levels=fcfg.num_pyramid_levels,
                scale=fcfg.scale_factor,
                grid=fcfg.grid_cells,
                pnp_hypotheses=tcfg.pnp_hypotheses,
                pnp_threshold_px=tcfg.pnp_threshold_px,
                dist=cam.D if cam.has_distortion else None,
                stereo=stereo,
                rgbd=rgbd,
                baseline=(
                    float(getattr(cam, "baseline", 0.0))
                    if stereo
                    else tcfg.rgbd_virtual_baseline
                ),
                stereo_row_tolerance=tcfg.stereo_row_tolerance,
                min_depth=tracking.config.local_mapping.min_depth,
                max_depth=tracking.config.local_mapping.max_depth,
                depth_scale=tcfg.depth_scale,
            )
        return self._step

    def track_frame(self, tracking, frame) -> dict:  # pragma: no cover - unused
        return self._fallback.track_frame(tracking, frame)

    def process(self, tracking, images, timestamp, depth):
        from ..map import Frame

        step = self._get_step(tracking)
        imgs = list(images) if isinstance(images, (list, tuple)) else [images]
        grays = [im if im.ndim == 2 else _to_gray(im) for im in imgs]
        pos, desc, lvalid, landmarks = tracking._local_landmark_block(
            self.n_local_keyframes, cap=self.landmark_cap
        )
        T_pred = (
            tracking.motion_model @ tracking.last_frame.T_w2c
            if tracking.last_frame is not None
            else np.eye(4)
        )
        self._key, sub = jax.random.split(self._key)
        if self._stereo:
            if len(grays) < 2:
                raise ValueError("stereo fused pipeline needs [left, right] images")
            img_arg = jnp.stack([jnp.asarray(g, jnp.float32) for g in grays[:2]])
        elif self._rgbd:
            if depth is None:
                raise ValueError("rgbd fused pipeline needs a depth image")
            img_arg = jnp.stack(
                [jnp.asarray(grays[0], jnp.float32), jnp.asarray(depth, jnp.float32)]
            )
        else:
            img_arg = jnp.asarray(grays[0], jnp.float32)
        out = step(
            img_arg,
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(lvalid),
            jnp.asarray(T_pred, jnp.float32), sub,
        )
        feats = out["features"]
        feat_list = [feats]
        if out.get("features_right") is not None:
            feat_list.append(out["features_right"])
        frame = Frame(
            images=imgs, images_gray=grays, features=feat_list,
            timestamp=timestamp, depth=depth,
        )
        if "kp_z" in out:
            # In-step stereo depth: reused by PnP retries and KF handlers.
            lcfg = tracking.config.local_mapping
            z = np.asarray(out["kp_z"])
            frame.kp_z = z
            frame.kp_z_valid = (
                np.asarray(out["kp_z_valid"]) & (z > lcfg.min_depth) & (z < lcfg.max_depth)
            )
        elif tracking.config.camera.sensor_type == "rgbd":
            tracking._measure_depth(frame)
        tracking.map.add_frame(frame)
        tracking.current_frame = frame

        pair_valid = np.asarray(out["pair_valid"])
        n_candidates = int(pair_valid.sum())
        n_inl = int(out["n_inliers"])
        info = {
            "n_guided": n_candidates,
            "n_matches": n_candidates,
            "n_3d2d": n_candidates,
            "n_inliers": n_inl,
            "inlier_ratio": n_inl / max(n_candidates, 1),
            "ok": bool(out["ok"]),
            "pnp_inliers": np.asarray(out["pnp_inliers"]),
            "guided": {
                "valid": pair_valid,
                "lm_idx": np.asarray(out["lm_idx"]),
                "landmarks": landmarks,
            },
            "match_res": None,
        }
        if info["ok"]:
            frame.update_pose(np.asarray(out["T_w2c"], np.float64))

        # Host-side retry with brute descriptor matching when the fused
        # (prediction-gated) association failed the quality gates.
        if not tracking._is_tracking_good(info):
            match_res, pts3d_b, xy_b, valid_b = tracking._track_local_map(
                frame, n_keyframes=self.n_local_keyframes
            )
            n_b = int(np.asarray(valid_b).sum())
            if n_b >= 6:
                retry = tracking._optimize_pose(frame, pts3d_b, xy_b, valid_b)
                if retry.get("n_inliers", 0) > info.get("n_inliers", 0):
                    info.pop("guided", None)
                    info.update(retry)
                    info.update({
                        "n_matches": match_res.n_matches,
                        "n_3d2d": n_b,
                        "match_res": match_res,
                        "inlier_ratio": retry["n_inliers"] / max(n_b, 1),
                    })
        return frame, info


def _to_gray(img):
    return (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).astype(np.float32)
