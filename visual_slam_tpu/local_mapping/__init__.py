"""Local mapping: keyframe handlers + consumer (API parity with
visual_slam/local_mapping/)."""

from .base import BaseKeyframeHandler  # noqa: F401
from .mono import MonoKeyframeHandler  # noqa: F401
from .stereo import StereoKeyframeHandler  # noqa: F401
from .rgbd import RGBDKeyframeHandler  # noqa: F401
from .local_mapping import LocalMapping, make_handler  # noqa: F401
