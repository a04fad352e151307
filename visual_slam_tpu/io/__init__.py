"""Host-side IO: frame sources and calibration loaders (reference
visual_slam/source.py + calibration.py)."""

from .source import (  # noqa: F401
    CameraSource,
    DataSourceBase,
    DatasetSource,
    VideoSource,
    imread_color,
    imread_gray,
    to_gray,
)
from .calibration import (  # noqa: F401
    MonoCalibration,
    StereoCalibration,
    UniversalCalibration,
)
