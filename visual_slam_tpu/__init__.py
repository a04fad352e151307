"""visual_slam_tpu — a TPU-native (JAX/XLA/Pallas) monocular visual SLAM
framework with the capabilities of AntonSHBK/visual-slam-core, redesigned
TPU-first: fixed-shape functional pipeline state, vmapped fixed-budget RANSAC,
MXU-friendly descriptor matching, and a Levenberg-Marquardt/Schur bundle
adjustment back-end."""

__version__ = "0.1.0"

import jax as _jax

# Geometry (SE(3) chains, 8-point systems, normal equations) needs true f32
# matmuls; the TPU default would route them through bf16 MXU passes. Hot
# large matmuls (descriptor distance) request lower precision explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import Config  # noqa: F401
from .state import State  # noqa: F401
from .sensor_type import SensorType  # noqa: F401
from .camera import Camera, PinholeCamera  # noqa: F401


def __getattr__(name):
    # Lazy heavyweight imports (pull in the full pipeline stack on demand).
    if name == "SLAM":
        from .slam import SLAM

        return SLAM
    if name == "Processing":
        from .processing import Processing

        return Processing
    if name == "Tracking":
        from .tracking import Tracking

        return Tracking
    if name == "Initializer":
        from .initializer import Initializer

        return Initializer
    raise AttributeError(f"module 'visual_slam_tpu' has no attribute {name!r}")
