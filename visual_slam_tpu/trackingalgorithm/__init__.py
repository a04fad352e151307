"""Pluggable tracking strategies.

The reference declares this package but ships 0-byte stubs
(visual_slam/trackingalgorithm/base.py, mono_traking.py). Here it is real:
``BaseTrackingAlgorithm`` defines the per-frame strategy interface and
``MonoTracking`` is the default monocular PnP strategy used by Tracking;
alternatives (e.g. direct/semi-dense methods) can be swapped in via
``Tracking.algorithm``.
"""

from .base import BaseTrackingAlgorithm  # noqa: F401
from .mono_tracking import MonoTracking  # noqa: F401
from .fused_mono import FusedMonoTracking  # noqa: F401
