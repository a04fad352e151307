"""Fused device-resident visual-odometry pipeline.

This is the performance path: one jitted program per frame covering
  detect (pyramid/FAST/rBRIEF) -> match (MXU Hamming) -> 3D-2D gather ->
  RANSAC-PnP + GN refine -> motion-model update
with ALL state (reference features, landmark slots, poses) living on device
as a fixed-shape pytree. The host only feeds images and occasionally swaps
the reference-keyframe block (at keyframe boundaries). This replaces the
reference's per-frame OpenCV/numpy round-trips (SURVEY.md §3.2 hot path)
with a single XLA executable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ops import matching as m_ops
from .ops.detector import Features, detect_and_describe_with_sampling
from .ops.pnp import ransac_pnp, refine_pose_gn, _reproj_err2
from .ops.projection import normalize_points


class TrackState(NamedTuple):
    """Device-resident tracking state."""

    ref_feats: Features  # reference keyframe feature block
    ref_landmarks: jnp.ndarray  # (K, 3) landmark position per ref kp slot
    ref_has_landmark: jnp.ndarray  # (K,) bool
    T_w2c: jnp.ndarray  # (4, 4) current pose
    T_rel: jnp.ndarray  # (4, 4) constant-velocity motion model
    key: jnp.ndarray  # PRNG state


class TrackOutput(NamedTuple):
    T_w2c: jnp.ndarray
    n_inliers: jnp.ndarray
    n_matches: jnp.ndarray
    features: Features  # current-frame features (for KF promotion host-side)
    match_train_idx: jnp.ndarray
    match_valid: jnp.ndarray
    pnp_inliers: jnp.ndarray


def make_track_step(
    K: jnp.ndarray,
    num_features: int = 2000,
    fast_threshold: float = 20.0,
    n_levels: int = 4,
    scale: float = 1.2,
    grid: int = 8,
    ratio: float = 0.75,
    pnp_hypotheses: int = 128,
    pnp_threshold_px: float = 3.0,
):
    # 128 hypotheses: at the >=60% inlier ratios of steady-state tracking the
    # clean-sample probability is ~1 - 1e-6, and the motion-model GN fallback
    # covers degraded frames; 256 costs ~35% of the frame budget (measured
    # 75 -> 118 FPS going 256 -> 64 on v5e).
    """Build the jitted per-frame tracking step for a fixed camera/config."""
    Kinv = jnp.linalg.inv(K)
    focal = K[0, 0]
    thresh = pnp_threshold_px / focal
    from .ops import orb as orb_ops

    @jax.jit
    def _track_step(state: TrackState, img: jnp.ndarray, sampling: jnp.ndarray):
        feats = detect_and_describe_with_sampling(
            img,
            sampling,
            num_features=num_features,
            threshold=fast_threshold,
            n_levels=n_levels,
            scale=scale,
            grid=grid,
        )
        match = m_ops.match_descriptors(
            feats.desc, state.ref_feats.desc, feats.valid, state.ref_feats.valid,
            feats.angle, state.ref_feats.angle,
            ratio=ratio, cross_check=True, use_orientation=True,
        )
        ti = match["train_idx"]
        pair_valid = match["valid"] & state.ref_has_landmark[ti]
        pts3d = state.ref_landmarks[ti]
        xy_norm = normalize_points(Kinv, feats.xy)

        key, sub = jax.random.split(state.key)
        T_pred = state.T_rel @ state.T_w2c
        res = ransac_pnp(
            pts3d, xy_norm, pair_valid, sub,
            n_hyp=pnp_hypotheses, thresh=thresh,
        )
        # Motion-model fallback: robust GN from the predicted pose.
        R_f, t_f = refine_pose_gn(
            T_pred[:3, :3], T_pred[:3, 3], pts3d, xy_norm,
            pair_valid.astype(jnp.float32), iters=8, huber=thresh,
        )
        err_f = _reproj_err2(R_f, t_f, pts3d, xy_norm)
        inl_f = (err_f < thresh * thresh) & pair_valid
        use_fallback = jnp.sum(inl_f) > res["n_inliers"]
        R = jnp.where(use_fallback, R_f, res["R"])
        t = jnp.where(use_fallback, t_f, res["t"])
        inliers = jnp.where(use_fallback, inl_f, res["inliers"])
        n_inl = jnp.sum(inliers)

        T_new = jnp.eye(4, dtype=state.T_w2c.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
        ok = n_inl >= 6
        T_new = jnp.where(ok, T_new, T_pred)
        T_rel = jnp.where(ok, T_new @ jnp.linalg.inv(state.T_w2c), state.T_rel)

        new_state = TrackState(
            ref_feats=state.ref_feats,
            ref_landmarks=state.ref_landmarks,
            ref_has_landmark=state.ref_has_landmark,
            T_w2c=T_new,
            T_rel=T_rel,
            key=key,
        )
        out = TrackOutput(
            T_w2c=T_new,
            n_inliers=n_inl,
            n_matches=match["n_matches"],
            features=feats,
            match_train_idx=ti,
            match_valid=match["valid"],
            pnp_inliers=inliers,
        )
        return new_state, out

    def track_step(state: TrackState, img: jnp.ndarray):
        # The sampling matrix rides as a traced argument (uploaded once).
        return _track_step(state, img, orb_ops.sampling_matrix())

    track_step.jitted = _track_step  # explicit-sampling variant for composition
    return track_step


def make_frame_step(
    K: jnp.ndarray,
    width: float,
    height: float,
    num_features: int = 2000,
    fast_threshold: float = 20.0,
    n_levels: int = 4,
    scale: float = 1.2,
    grid: int = 8,
    pnp_hypotheses: int = 128,
    pnp_threshold_px: float = 3.0,
    guided_radius_px: float = 25.0,
    guided_ratio: float = 0.8,
    dist: jnp.ndarray | None = None,
):
    """Fused host-pipeline frame step: detect -> projection-guided landmark
    association -> RANSAC-PnP (+ predicted-pose GN fallback), ONE jitted
    program. Unlike ``make_track_step`` it takes the local-map landmark
    block and the predicted pose explicitly, so the host Tracking state
    machine can drive it while paying a single dispatch per frame.

    Returns fn(img, lm_pos (M,3), lm_desc (M,8) u32, lm_valid (M,),
    T_pred (4,4), key) -> dict(features, T_w2c, n_inliers, pair_valid,
    lm_idx, pnp_inliers, ok).
    """
    from .ops.guided_matching import guided_match
    from .ops.projection import undistort_pixels

    Kinv = jnp.linalg.inv(K)
    focal = K[0, 0]
    thresh = pnp_threshold_px / focal
    dist_arr = None if dist is None else jnp.asarray(dist, jnp.float32)

    @jax.jit
    def _frame_step(img, lm_pos, lm_desc, lm_valid, T_pred, key, sampling):
        feats = detect_and_describe_with_sampling(
            img, sampling,
            num_features=num_features, threshold=fast_threshold,
            n_levels=n_levels, scale=scale, grid=grid,
        )
        if dist_arr is not None:
            # Work in ideal pinhole coordinates throughout (reference
            # camera.py:160-169 undistorts ad hoc; here it is in-program).
            feats = feats._replace(xy=undistort_pixels(K, Kinv, dist_arr, feats.xy))
        g = guided_match(
            lm_pos, lm_desc, lm_valid, T_pred, K,
            feats.xy, feats.desc, feats.valid, width, height,
            radius_px=guided_radius_px, ratio=guided_ratio,
        )
        pts3d = g["pts3d"]
        pair_valid = g["valid"]
        xy_norm = normalize_points(Kinv, feats.xy)
        res = ransac_pnp(
            pts3d, xy_norm, pair_valid, key,
            n_hyp=pnp_hypotheses, thresh=thresh,
        )
        R_f, t_f = refine_pose_gn(
            T_pred[:3, :3], T_pred[:3, 3], pts3d, xy_norm,
            pair_valid.astype(jnp.float32), iters=8, huber=thresh,
        )
        err_f = _reproj_err2(R_f, t_f, pts3d, xy_norm)
        inl_f = (err_f < thresh * thresh) & pair_valid
        use_fallback = jnp.sum(inl_f) > res["n_inliers"]
        R = jnp.where(use_fallback, R_f, res["R"])
        t = jnp.where(use_fallback, t_f, res["t"])
        inliers = jnp.where(use_fallback, inl_f, res["inliers"])
        n_inl = jnp.sum(inliers)
        T = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
        return {
            "features": feats,
            "T_w2c": T,
            "n_inliers": n_inl,
            "pair_valid": pair_valid,
            "lm_idx": g["lm_idx"],
            "pnp_inliers": inliers,
            "ok": n_inl >= 6,
        }

    def frame_step(img, lm_pos, lm_desc, lm_valid, T_pred, key):
        from .ops import orb as orb_ops

        return _frame_step(
            img, lm_pos, lm_desc, lm_valid, T_pred, key, orb_ops.sampling_matrix()
        )

    frame_step.jitted = _frame_step
    return frame_step


def init_track_state(
    ref_feats: Features,
    ref_landmarks: jnp.ndarray,
    ref_has_landmark: jnp.ndarray,
    T_w2c: jnp.ndarray,
    seed: int = 0,
) -> TrackState:
    return TrackState(
        ref_feats=ref_feats,
        ref_landmarks=jnp.asarray(ref_landmarks, jnp.float32),
        ref_has_landmark=jnp.asarray(ref_has_landmark),
        T_w2c=jnp.asarray(T_w2c, jnp.float32),
        T_rel=jnp.eye(4, dtype=jnp.float32),
        key=jax.random.PRNGKey(seed),
    )


def swap_reference(
    state: TrackState,
    ref_feats: Features,
    ref_landmarks: jnp.ndarray,
    ref_has_landmark: jnp.ndarray,
) -> TrackState:
    """Host-side keyframe boundary: install a new reference block."""
    return state._replace(
        ref_feats=ref_feats,
        ref_landmarks=jnp.asarray(ref_landmarks, jnp.float32),
        ref_has_landmark=jnp.asarray(ref_has_landmark),
    )
