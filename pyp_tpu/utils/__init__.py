"""Timers, logging, small helpers."""

from pyp_tpu.utils.log import get_logger  # noqa: F401
from pyp_tpu.utils.timer import Timer  # noqa: F401
