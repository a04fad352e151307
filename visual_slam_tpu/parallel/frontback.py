"""Pipeline-parallel front-end/back-end split over a 2-stage device mesh.

The reference runs tracking and optimization in separate HOST threads
(visual_slam/slam.py + handlers, timer-driven); the TPU-native equivalent is
a DEVICE pipeline: stage 0 (front-end) runs detection + descriptor matching
for frame t while stage 1 (back-end) runs the robust pose solve for frame
t-1 — concurrently, on different chips of a ``pp`` mesh axis, exchanging the
fixed-shape 3D-2D candidate payload over ICI with one ``ppermute`` per frame.
The whole T-frame loop is ONE jitted ``shard_map`` program (lax.scan), so
the pipeline never returns to the host between frames.

Payloads are fixed-shape (num_features slots + validity), poses come back
with a one-frame pipeline latency (the classic single-bubble fill).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import matching as m_ops
from ..ops.detector import Features, detect_and_describe_with_sampling
from ..ops.pnp import refine_pose_gn, _reproj_err2
from ..ops.projection import normalize_points


class _Payload(NamedTuple):
    pts3d: jnp.ndarray  # (K, 3) candidate landmark per keypoint slot
    xy_norm: jnp.ndarray  # (K, 2) normalized observations
    valid: jnp.ndarray  # (K,) f32 candidate validity (f32: ppermute-friendly)


def make_frontback_pipeline(
    K: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pp",
    num_features: int = 512,
    fast_threshold: float = 20.0,
    n_levels: int = 2,
    scale: float = 1.2,
    grid: int = 4,
    ratio: float = 0.75,
    pnp_threshold_px: float = 3.0,
    gn_iters: int = 10,
):
    """Build fn(frames (T,H,W), ref_feats, ref_landmarks (K,3), ref_has (K,),
    T0 (4,4), sampling) -> (T_w2c (T,4,4), n_inliers (T,)).

    Pipeline latency one frame: output row t is the back-end solve of frame
    t-1 (row 0 is the bubble-fill step and returns T0). Requires mesh axis
    ``axis`` of size 2.
    """
    if mesh.shape[axis] != 2:
        raise ValueError(f"front/back pipeline needs mesh axis {axis!r} of size 2")
    Kinv = jnp.linalg.inv(K)
    thresh = pnp_threshold_px / float(K[0, 0])

    def front(frame, ref_feats, ref_lm, ref_has, sampling):
        feats = detect_and_describe_with_sampling(
            frame, sampling,
            num_features=num_features, threshold=fast_threshold,
            n_levels=n_levels, scale=scale, grid=grid,
        )
        match = m_ops.match_descriptors(
            feats.desc, ref_feats.desc, feats.valid, ref_feats.valid,
            feats.angle, ref_feats.angle,
            ratio=ratio, cross_check=True, use_orientation=True,
        )
        ti = match["train_idx"]
        valid = match["valid"] & ref_has[ti]
        return _Payload(
            pts3d=ref_lm[ti],
            xy_norm=normalize_points(Kinv, feats.xy),
            valid=valid.astype(jnp.float32),
        )

    def back(payload: _Payload, T_prev):
        R, t = refine_pose_gn(
            T_prev[:3, :3], T_prev[:3, 3],
            payload.pts3d, payload.xy_norm, payload.valid,
            iters=gn_iters, huber=thresh,
        )
        err = _reproj_err2(R, t, payload.pts3d, payload.xy_norm)
        inl = (err < thresh * thresh) & (payload.valid > 0)
        n_inl = jnp.sum(inl)
        T_new = jnp.eye(4, dtype=T_prev.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
        ok = n_inl >= 6
        T_new = jnp.where(ok, T_new, T_prev)
        return T_new, n_inl

    def _zero_payload(dtype=jnp.float32):
        return _Payload(
            pts3d=jnp.zeros((num_features, 3), dtype),
            xy_norm=jnp.zeros((num_features, 2), dtype),
            valid=jnp.zeros((num_features,), dtype),
        )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    def _pipeline(frames, ref_feats, ref_lm, ref_has, T0, sampling):
        r = jax.lax.axis_index(axis)

        def step(carry, frame):
            payload_prev, T_prev = carry
            # Stage 0 (this chip, frame t) and stage 1 (other chip, frame
            # t-1) execute their cond branches CONCURRENTLY; the ppermute at
            # the step boundary hands frame t's candidates to the back-end.
            payload = jax.lax.cond(
                r == 0,
                lambda: front(frame, ref_feats, ref_lm, ref_has, sampling),
                lambda: _zero_payload(),
            )
            T_new, n_inl = jax.lax.cond(
                r == 1,
                lambda: back(payload_prev, T_prev),
                lambda: (
                    T_prev,
                    jax.lax.pcast(jnp.asarray(0, jnp.int32), (axis,), to="varying"),
                ),
            )
            payload_recv = jax.lax.ppermute(payload, axis, [(0, 1)])
            return (payload_recv, T_new), (T_new, n_inl)

        # Initial carry must be marked device-varying over the pp axis (the
        # cond-on-rank outputs are varying, and scan demands matching types).
        init = jax.lax.pcast(
            (_zero_payload(), T0.astype(jnp.float32)), (axis,), to="varying"
        )
        (_, _), (Ts, n_inls) = jax.lax.scan(step, init, frames)
        # Per-shard outputs: stage 1's rows carry the solves. Leading axis
        # sharded over pp -> caller reads the rank-1 block.
        return Ts[None], n_inls[None]

    def pipeline(frames, ref_feats: Features, ref_lm, ref_has, T0, sampling):
        Ts, n_inls = _pipeline(
            frames, ref_feats, jnp.asarray(ref_lm, jnp.float32),
            jnp.asarray(ref_has), jnp.asarray(T0, jnp.float32), sampling,
        )
        return Ts[1], n_inls[1]  # rank-1 (back-end) shard

    return pipeline
