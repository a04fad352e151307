"""Background work handlers (API parity with visual_slam/handlers/)."""

from .base_handler import BaseHandler  # noqa: F401
from .local_handler import LocalHandler  # noqa: F401
from .global_handler import GlobalHandler  # noqa: F401
