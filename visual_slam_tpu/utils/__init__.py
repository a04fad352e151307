"""Host utilities: logging, metrics, profiling."""

from .logging import get_logger, setup_logging  # noqa: F401
