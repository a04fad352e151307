"""Pipeline families ("models") — discoverable, configured entry points over
the framework, one per sensor/deployment mode:

  * MonoVO    — monocular SLAM (two-view init, PnP tracking, LM-BA)
  * StereoVO  — stereo SLAM (single-frame metric init, disparity landmarks)
  * RGBDVO    — RGB-D SLAM (depth-map landmarks)
  * CompiledVO — the fused device-resident per-frame step (bench/serving path)
  * BatchedVO — data-parallel multi-sequence VO over a device mesh
"""

from .families import (  # noqa: F401
    BatchedVO,
    CompiledVO,
    MonoVO,
    PipelinedVO,
    RGBDVO,
    StereoVO,
)
from .compiled_slam import CompiledSLAM  # noqa: F401
