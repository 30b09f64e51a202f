"""Named timers with a process-wide registry.

Equivalent of the reference's utils/timer.py:27 Timer context/decorator that
annotates every pipeline stage ("Movie frame alignment took ...")."""

from __future__ import annotations

import functools
import time

from pyp_tpu.utils.log import get_logger

logger = get_logger("timer")

REGISTRY: dict[str, list[float]] = {}

# profiling mode (tabs.slurm.profile via PYP_TPU_TRACE=1 in scheduler
# scripts): dump the per-stage timing report when the worker exits
import os as _os

if _os.environ.get("PYP_TPU_TRACE"):
    import atexit as _atexit

    def _dump_profile():
        for name, vals in sorted(REGISTRY.items()):
            logger.info("[profile] %s: n=%d total=%.2fs mean=%.2fs",
                        name, len(vals), sum(vals), sum(vals) / len(vals))

    _atexit.register(_dump_profile)


class Timer:
    def __init__(self, name: str, log: bool = True):
        self.name = name
        self.log = log
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        REGISTRY.setdefault(self.name, []).append(self.elapsed)
        if self.log:
            logger.info("%s took %.2fs", self.name, self.elapsed)
        return False

    def __call__(self, fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with Timer(self.name, self.log):
                return fn(*args, **kwargs)

        return wrapper


def report() -> dict[str, float]:
    """Total elapsed per named timer."""
    return {k: sum(v) for k, v in REGISTRY.items()}
