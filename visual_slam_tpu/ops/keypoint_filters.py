"""Keypoint spatial filters operating on Features blocks (mask updates only
— fixed shapes).

API parity with the reference keypoint filters (visual_slam/utils/
keypoints.py:14-134: grid top-N per cell, radius NMS, dispatcher). The
detector's built-in grid top-k usually makes these unnecessary; they exist
for post-hoc thinning (e.g. before an expensive custom matcher) and for API
parity. Unlike the reference, a missing logger can't crash the dispatcher
(reference keypoints.py:114 calls logger.info unguarded).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .detector import Features


@partial(jax.jit, static_argnames=("grid", "per_cell"))
def filter_keypoints_grid(
    feats: Features, width: int, height: int, grid: int = 8, per_cell: int = 10
) -> Features:
    """Keep the top-``per_cell`` responses per grid cell (reference
    filter_keypoints_grid, keypoints.py:14-51)."""
    cx = jnp.clip((feats.xy[:, 0] / width * grid).astype(jnp.int32), 0, grid - 1)
    cy = jnp.clip((feats.xy[:, 1] / height * grid).astype(jnp.int32), 0, grid - 1)
    cell = cy * grid + cx
    resp = jnp.where(feats.valid, feats.response, -jnp.inf)
    # Rank within cell: count of strictly-better same-cell entries.
    same = cell[:, None] == cell[None, :]
    better = (resp[None, :] > resp[:, None]) | (
        (resp[None, :] == resp[:, None])
        & (jnp.arange(resp.shape[0])[None, :] < jnp.arange(resp.shape[0])[:, None])
    )
    rank = jnp.sum(same & better, axis=1)
    keep = feats.valid & (rank < per_cell)
    return feats._replace(valid=keep)


@partial(jax.jit, static_argnames=("radius",))
def filter_keypoints_nms(feats: Features, radius: float = 5.0) -> Features:
    """Radius non-max suppression: drop a keypoint if a stronger one lies
    within ``radius`` pixels (reference filter_keypoints_nms,
    keypoints.py:57-83 — O(N^2) there too, but vectorized here)."""
    resp = jnp.where(feats.valid, feats.response, -jnp.inf)
    d2 = jnp.sum((feats.xy[:, None, :] - feats.xy[None, :, :]) ** 2, axis=-1)
    n = resp.shape[0]
    stronger = (resp[None, :] > resp[:, None]) | (
        (resp[None, :] == resp[:, None])
        & (jnp.arange(n)[None, :] < jnp.arange(n)[:, None])
    )
    near = d2 <= radius * radius
    suppressed = jnp.any(near & stronger & feats.valid[None, :], axis=1)
    return feats._replace(valid=feats.valid & ~suppressed)


def filter_keypoints(
    feats: Features,
    width: int,
    height: int,
    use_grid: bool = False,
    use_nms: bool = False,
    grid: int = 8,
    per_cell: int = 10,
    nms_radius: float = 5.0,
    logger=None,
    **_: object,
) -> Features:
    """Dispatcher (reference filter_keypoints, keypoints.py:89-134)."""
    if use_grid:
        feats = filter_keypoints_grid(feats, width, height, grid=grid, per_cell=per_cell)
    if use_nms:
        feats = filter_keypoints_nms(feats, radius=nms_radius)
    if logger is not None:
        logger.debug("filter_keypoints: %d valid", int(jnp.sum(feats.valid)))
    return feats
