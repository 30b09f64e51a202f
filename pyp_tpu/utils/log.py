"""Logging with a TRACE level and optional file/web handlers.

Equivalent of the reference's system/logging.py (custom TRACE level :69,
stdout + file + website-streaming handlers) without the web coupling; a
handler can be attached for RPC streaming by the stream layer.
"""

from __future__ import annotations

import logging
import sys

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_FORMAT = "%(asctime)s %(levelname)7s %(name)s] %(message)s"
_configured = False


def _configure():
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    root = logging.getLogger("pyp_tpu")
    root.addHandler(handler)
    # workers honor the level exported by the scheduler scripts
    # (tabs.slurm.verbose_level: info/debug/trace)
    import os

    level = os.environ.get("PYP_TPU_LOG_LEVEL", "info").lower()
    root.setLevel({"debug": logging.DEBUG, "trace": TRACE}.get(
        level, logging.INFO))
    _configured = True


def get_logger(name: str = "") -> logging.Logger:
    _configure()
    logger = logging.getLogger(f"pyp_tpu.{name}" if name else "pyp_tpu")

    def trace(msg, *args, **kw):
        logger.log(TRACE, msg, *args, **kw)

    logger.trace = trace  # type: ignore[attr-defined]
    return logger


def add_file_handler(path):
    _configure()
    handler = logging.FileHandler(path)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    logging.getLogger("pyp_tpu").addHandler(handler)
    return handler
