"""Match-filter dispatcher over FeatureTrackingResult.

API parity with the reference ``filter_matches`` (visual_slam/utils/
matching.py:340-460): same filter set and defaults (RANSAC-F and
orientation on; ratio/cross-check handled by the matcher itself; stereo,
region-mask, max-distance, unique-train opt-in). Each filter ANDs a mask
into the fixed-shape result — no list rebuilding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import epipolar as ep_ops
from ..ops import matching as m_ops
from .tracker import FeatureTrackingResult

_KEY = [jax.random.PRNGKey(21)]


def filter_matches(
    result: FeatureTrackingResult,
    use_ransac_fund_matrix: bool = True,
    use_orientation: bool = True,
    use_stereo: bool = False,
    use_mask_regions: bool = False,
    use_max_distance: bool = False,
    use_unique: bool = False,
    ransac_threshold: float = 1.0,
    ransac_hypotheses: int = 128,
    orientation_bins: int = 30,
    orientation_keep_bins: int = 3,
    row_tolerance: float = 2.0,
    min_disparity: float = 0.0,
    max_disparity: float = 1e9,
    mask_regions=None,
    exclude_regions: bool = True,
    max_distance: float = 64.0,
    logger=None,
    **_: object,
) -> FeatureTrackingResult:
    ok = result.valid
    f1, f2, ti = result.features1, result.features2, result.train_idx
    if use_max_distance:
        ok = ok & (result.distance <= max_distance)
    if use_unique:
        ok = m_ops.unique_train(ti, result.distance, ok, f2.desc.shape[0])
    if use_orientation:
        ok = m_ops.orientation_filter(
            f1.angle, f2.angle, ti, ok,
            n_bins=orientation_bins, keep_bins=orientation_keep_bins,
        )
    if use_stereo:
        ok = m_ops.stereo_epipolar_filter(
            f1.xy, f2.xy, ti, ok,
            row_tolerance=row_tolerance,
            min_disparity=min_disparity, max_disparity=max_disparity,
        )
    if use_mask_regions and mask_regions is not None:
        ok = m_ops.region_mask_filter(
            f1.xy, ok, jnp.asarray(mask_regions, jnp.float32), exclude=exclude_regions
        )
    if use_ransac_fund_matrix:
        _KEY[0], sub = jax.random.split(_KEY[0])
        res = ep_ops.ransac_fundamental(
            f1.xy, f2.xy[ti], ok, sub,
            n_hyp=ransac_hypotheses, thresh=ransac_threshold,
        )
        ok = ok & res["inliers"]
    out = FeatureTrackingResult(f1, f2, ti, result.distance, ok)
    if logger is not None:
        logger.debug("filter_matches: %d -> %d", result.n_matches, out.n_matches)
    return out
