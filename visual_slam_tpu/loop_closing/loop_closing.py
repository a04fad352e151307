"""Loop detection + closure.

A working implementation of the reference's declared-but-absent loop closing
(visual_slam/loop_closing/base.py is 0 bytes; slam.py:44 sets
``loop_closing = None``; README.md:47 lists it as not implemented).

Detection is brute-force descriptor place recognition, which is the
TPU-shaped choice: the query keyframe's packed descriptors are matched
against EVERY candidate keyframe with the same MXU Hamming matmul the
tracker uses — at 2000 features x hundreds of keyframes this is a few
milliseconds, so no vocabulary tree / BoW approximation is needed.
Candidates are gated to exclude the recent window, scored by ratio-test
match count, then geometrically verified with the PnP solver against the
candidate's landmarks; success yields a corrected relative-pose edge and a
pose-graph optimization + (optional) global BA.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..map import KeyFrame, Map
from ..ops import matching as m_ops
from ..ops.pnp import ransac_pnp
from ..ops.projection import normalize_points
from .pose_graph import (
    build_sequential_graph,
    build_sim3_graph,
    optimize_pose_graph,
    optimize_sim3_graph,
)


class LoopClosing:
    def __init__(
        self,
        slam_map: Map,
        camera,
        config,
        optimizer=None,
        min_gap: int = 10,
        min_matches: int = 40,
        min_inliers: int = 20,
        logger: Optional[logging.Logger] = None,
    ):
        self.map = slam_map
        self.camera = camera
        self.config = config
        self.optimizer = optimizer
        self.min_gap = min_gap  # exclude this many most-recent KFs
        self.min_matches = min_matches
        self.min_inliers = min_inliers
        self.logger = logger or logging.getLogger("loop_closing")
        self._key = jax.random.PRNGKey(99)
        self.closed_loops: list[tuple[int, int]] = []

    # -- detection ---------------------------------------------------------
    def detect(self, kf: KeyFrame) -> Optional[dict]:
        """Best verified loop candidate for ``kf``, or None."""
        kfs = self.map.get_keyframes()
        if len(kfs) <= self.min_gap + 1:
            return None
        candidates = [k for k in kfs[: -self.min_gap] if k.keyframe_id != kf.keyframe_id]
        if not candidates:
            return None
        f_q = kf.get_features(0)
        best = None
        for cand in candidates:
            f_c = cand.get_features(0)
            if f_c is None:
                continue
            res = m_ops.match_descriptors(
                f_q.desc, f_c.desc, f_q.valid, f_c.valid, f_q.angle, f_c.angle,
                ratio=0.75, cross_check=True, use_orientation=True,
            )
            n = int(res["n_matches"])
            if n >= self.min_matches and (best is None or n > best[0]):
                best = (n, cand, res)
        if best is None:
            return None
        n, cand, res = best
        verified = self._verify(kf, cand, res)
        if verified is None:
            return None
        verified.update({"candidate": cand, "n_matches": n})
        return verified

    def _verify(self, kf: KeyFrame, cand: KeyFrame, res) -> Optional[dict]:
        """Geometric verification: PnP of kf's keypoints against cand's
        landmarks -> corrected T_kf_w2c in the candidate's frame."""
        pos, has = cand.point_arrays(0)
        ti = np.asarray(res["train_idx"])
        ok = np.asarray(res["valid"]) & has[ti]
        if ok.sum() < self.min_inliers:
            return None
        pts3d = pos[ti]
        f_q = kf.get_features(0)
        Kinv = jnp.asarray(self.camera.Kinv, jnp.float32)
        xy_norm = normalize_points(Kinv, f_q.xy)
        self._key, sub = jax.random.split(self._key)
        pnp = ransac_pnp(
            jnp.asarray(pts3d, jnp.float32), xy_norm, jnp.asarray(ok), sub,
            n_hyp=256, thresh=3.0 / self.camera.fx,
        )
        n_inl = int(pnp["n_inliers"])
        if not bool(pnp["ok"]) or n_inl < self.min_inliers:
            return None
        T_corrected = np.asarray(pnp["T"], np.float64)
        return {"T_kf_corrected": T_corrected, "n_inliers": n_inl}

    # -- closure -----------------------------------------------------------
    def close(self, kf: KeyFrame, detection: dict, use_sim3: bool = True) -> dict:
        """Apply a verified loop: pose-graph optimization over all keyframes
        with the loop edge, then optional global BA.

        Mono scale drift is handled with the Sim(3) graph: the measured
        relative scale comes from comparing the drifted-map baseline
        ||C_i - C_j|| against the PnP-corrected baseline (both in the old
        map's scale at node j), and each keyframe's landmark cloud is
        re-scaled about its camera center by the optimized node scale.
        """
        kfs = self.map.get_keyframes()
        idx = {k.keyframe_id: i for i, k in enumerate(kfs)}
        i = idx[kf.keyframe_id]
        j = idx[detection["candidate"].keyframe_id]
        # Edge measurement: corrected relative pose T_i @ inv(T_j) with the
        # PnP-corrected pose for node i.
        T_i_corr = detection["T_kf_corrected"]
        T_j = kfs[j].T_w2c
        T_meas = T_i_corr @ np.linalg.inv(T_j)
        poses = np.stack([k.T_w2c for k in kfs]).astype(np.float32)

        def center(T):
            return -T[:3, :3].T @ T[:3, 3]

        d_drift = float(np.linalg.norm(center(kfs[i].T_w2c) - center(T_j)))
        d_corr = float(np.linalg.norm(center(T_i_corr) - center(T_j)))
        s_meas = d_drift / max(d_corr, 1e-9) if d_corr > 1e-6 else 1.0
        s_meas = float(np.clip(s_meas, 0.2, 5.0))

        if use_sim3:
            graph = build_sim3_graph(poses, loop_edges=[(i, j, T_meas, s_meas)])
            T_opt, scales, info = optimize_sim3_graph(graph, n_iter=10)
            scales = np.asarray(scales, np.float64)
        else:
            graph = build_sequential_graph(poses, loop_edges=[(i, j, T_meas)])
            T_opt, info = optimize_pose_graph(graph, n_iter=10)
            scales = np.ones(len(kfs))
        T_opt = np.asarray(T_opt, np.float64)

        # Landmark correction: re-express each landmark in its first
        # observing KF's OLD camera frame, scale by that node's factor, map
        # out through the NEW pose (the ORB-SLAM loop-correction recipe).
        kf_row = {k.keyframe_id: r for r, k in enumerate(kfs)}
        T_old = poses.astype(np.float64)
        corrected = 0
        for mp in self.map.get_map_points():
            if mp.is_bad:
                continue
            obs_kfs = mp.observations.get_keyframe_ids()
            rows = [kf_row[k] for k in obs_kfs if k in kf_row]
            if not rows:
                continue
            r = min(rows)  # first (oldest) observing keyframe
            x_cam = T_old[r, :3, :3] @ mp.position + T_old[r, :3, 3]
            x_cam *= scales[r]
            R_new = T_opt[r, :3, :3]
            X_new = R_new.T @ (x_cam - T_opt[r, :3, 3])
            mp.update_position(X_new)
            corrected += 1

        for k, kfr in enumerate(kfs):
            kfr.update_pose(T_opt[k])
        self.closed_loops.append((kf.keyframe_id, detection["candidate"].keyframe_id))
        self.logger.info(
            "closed loop %d -> %d (%d inliers); pose-graph cost %.5f",
            kf.keyframe_id, detection["candidate"].keyframe_id,
            detection["n_inliers"], float(info["cost"]),
        )
        result = {
            "pose_graph_cost": float(info["cost"]),
            "loop": (i, j),
            "scale_meas": s_meas,
            "landmarks_corrected": corrected,
        }
        if self.optimizer is not None:
            result["global_ba"] = self.map.optimize_global(self.optimizer)
        return result

    def process_keyframe(self, kf: KeyFrame) -> Optional[dict]:
        det = self.detect(kf)
        if det is None:
            return None
        return self.close(kf, det)
