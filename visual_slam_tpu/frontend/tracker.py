"""FeatureTracker: detect + match + filter chain.

API parity with the reference tracker (visual_slam/feature/tracker.py:14-190):
``FeatureTrackingResult`` (matched index/coordinate arrays + filter_by_mask)
and ``FeatureTracker.detectAndCompute/match/track``. The filter chain mirrors
the reference's ``filter_matches`` dispatcher defaults
(utils/matching.py:340-460): RANSAC fundamental + orientation consistency on,
others opt-in — but every filter is a masked fixed-shape JAX op; the
RANSAC-F runs the vmapped LO-RANSAC of ops/epipolar.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig
from ..ops import epipolar as ep_ops
from ..ops.detector import Features
from .feature_manager import FeatureManager


@dataclass
class FeatureTrackingResult:
    """Fixed-shape match table between a query (1 = cur) and train (2 = ref)
    frame (reference tracker.py:14-46). ``valid`` is the live mask; the
    compressed idx/kps arrays are materialized on demand for host code."""

    features1: Features
    features2: Features
    train_idx: jnp.ndarray  # (K,) int32: for query slot i, matched train slot
    distance: jnp.ndarray  # (K,) float32
    valid: jnp.ndarray  # (K,) bool

    @property
    def n_matches(self) -> int:
        return int(jnp.sum(self.valid))

    @property
    def idxs1(self) -> np.ndarray:
        return np.nonzero(np.asarray(self.valid))[0]

    @property
    def idxs2(self) -> np.ndarray:
        return np.asarray(self.train_idx)[self.idxs1]

    @property
    def kps1_matched(self) -> np.ndarray:
        return np.asarray(self.features1.xy)[self.idxs1]

    @property
    def kps2_matched(self) -> np.ndarray:
        return np.asarray(self.features2.xy)[self.idxs2]

    def filter_by_mask(self, mask: np.ndarray | jnp.ndarray) -> "FeatureTrackingResult":
        """AND an extra (K,) slot-aligned mask into the result."""
        return FeatureTrackingResult(
            features1=self.features1,
            features2=self.features2,
            train_idx=self.train_idx,
            distance=self.distance,
            valid=self.valid & jnp.asarray(mask),
        )


class FeatureTracker:
    """(reference tracker.py:49-190)"""

    def __init__(self, config: FeatureConfig):
        self.config = config
        self.manager = FeatureManager(config)
        fp = dict(config.filter_params)
        self.use_ransac_fund = bool(fp.get("use_ransac_fund_matrix", True))
        self.ransac_thresh_px = float(fp.get("ransac_threshold", 1.0))
        self.ransac_hypotheses = int(fp.get("ransac_hypotheses", 128))
        self.use_orientation = bool(fp.get("use_orientation", True))
        self.orientation_bins = int(fp.get("orientation_bins", 30))
        self.orientation_keep = int(fp.get("orientation_keep_bins", 3))
        self._key = jax.random.PRNGKey(int(fp.get("seed", 0)))

    @property
    def desc_words(self) -> int:
        """uint32 words per descriptor row of the configured family
        (8 binary / 128 float — see ops.matching.is_binary_desc)."""
        return int(getattr(self.manager.detector, "desc_words", 8))

    def detectAndCompute(self, image: np.ndarray) -> Features:
        return self.manager.detectAndCompute(image)

    def match(self, f1: Features, f2: Features) -> FeatureTrackingResult:
        res = self.manager.match(f1, f2)
        out = FeatureTrackingResult(
            features1=f1,
            features2=f2,
            train_idx=res["train_idx"],
            distance=res["distance"],
            valid=res["valid"],
        )
        if self.use_orientation and not getattr(self.manager.matcher, "use_orientation", False):
            from ..ops.matching import orientation_filter

            ok = orientation_filter(
                f1.angle, f2.angle, out.train_idx, out.valid,
                n_bins=self.orientation_bins, keep_bins=self.orientation_keep,
            )
            out = FeatureTrackingResult(f1, f2, out.train_idx, out.distance, ok)
        if self.use_ransac_fund:
            out = self._ransac_fundamental_filter(out)
        return out

    def _ransac_fundamental_filter(self, r: FeatureTrackingResult) -> FeatureTrackingResult:
        """Geometric consistency on pixel coords (reference
        matching.py:93-140)."""
        x1 = r.features1.xy
        x2 = r.features2.xy[r.train_idx]
        self._key, sub = jax.random.split(self._key)
        res = ep_ops.ransac_fundamental(
            x1, x2, r.valid, sub,
            n_hyp=self.ransac_hypotheses, thresh=self.ransac_thresh_px,
        )
        return FeatureTrackingResult(
            r.features1, r.features2, r.train_idx, r.distance, r.valid & res["inliers"]
        )

    def track(self, image_cur: np.ndarray, features_ref: Features) -> FeatureTrackingResult:
        """Detect on the current image and match against reference features
        (reference tracker.py:106-190)."""
        f_cur = self.detectAndCompute(image_cur)
        return self.match(f_cur, features_ref)
