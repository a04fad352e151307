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

# Persistent compilation cache: the pipeline's programs are expensive to
# build (detect ~80 s, BA ~55 s per fresh process on the remote-relay
# stack) and shape-stable across runs — cache serialized executables on
# disk so every process after the first warms in seconds. Opt out with
# VSLAM_NO_COMPCACHE=1 (e.g. when benchmarking compile time itself).
import os as _os

if not _os.environ.get("VSLAM_NO_COMPCACHE"):
    try:
        _cache_dir = _os.environ.get(
            "VSLAM_COMPCACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "visual_slam_tpu_xla"
            ),
        )
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass

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
