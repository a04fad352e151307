"""Multi-device execution: landmark-sharded bundle adjustment and
data-parallel multi-sequence SLAM over a jax.sharding.Mesh."""

from .mesh import make_mesh  # noqa: F401
from .ba_sharded import bundle_adjust_sharded, bundle_adjust_sparse_sharded  # noqa: F401
from .multiseq import batched_track_step, make_batched_vo  # noqa: F401
from .frontback import make_frontback_pipeline  # noqa: F401
