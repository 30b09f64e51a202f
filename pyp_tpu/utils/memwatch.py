"""Per-program HBM telemetry for the hot kernels.

The reference relies on RSS/`free` host counters (utils/cuda_info.py GPU
inventory print; no device-memory accounting at all).  On TPU the usual
counter, ``device.memory_stats()``, returns nothing through the axon
tunnel (measured: ``None`` — BENCH_r04's hbm block read 0/0), which made
every OOM hunt at production boxes blind trial-and-error.  XLA, however,
reports each compiled executable's exact memory plan without any device
counter: ``jitted.lower(*args).compile().memory_analysis()`` gives
argument/output/temp/peak bytes of the program the device will actually
run.  This module records those per hot program (once per argument-shape
signature) plus the framework-level view ``jax.live_arrays()`` (bytes of
every live device buffer — the *resident* state between dispatches).

Peak HBM of a dispatch ~= live bytes at call time + program peak
(arguments alias live buffers, so this overcounts by the argument size;
both numbers are recorded so either bound can be read).

Enable with ``PYP_TPU_MEMWATCH=1``.  Each observed program is lowered and
compiled once more than strictly necessary; the XLA compilation cache
(local, and the remote axon compile server's) makes the second compile of
identical HLO cheap, and observation happens once per shape signature.
"""

from __future__ import annotations

import logging
import os
import threading

logger = logging.getLogger("pyp_tpu.memwatch")

_LOCK = threading.Lock()
_SEEN: set = set()
_REGISTRY: dict = {}   # name -> stats dict (max over shape signatures)


def enabled() -> bool:
    return os.environ.get("PYP_TPU_MEMWATCH", "0") not in ("", "0")


def live_device_bytes() -> int:
    """Total bytes of live jax.Array buffers (the resident state)."""
    import jax

    try:
        return int(sum(a.nbytes for a in jax.live_arrays()))
    except Exception:
        return 0


def hbm_limit_bytes() -> int:
    """Device HBM capacity. memory_stats()['bytes_limit'] when the backend
    exposes it; otherwise a device-kind table (the axon tunnel exposes no
    counters at all). Override with PYP_TPU_HBM_GIB for unusual runtimes."""
    env = os.environ.get("PYP_TPU_HBM_GIB")
    if env:
        return int(float(env) * 2**30)
    ms = device_memory_stats()
    if ms.get("bytes_limit"):
        return int(ms["bytes_limit"])
    import jax

    try:
        dev = jax.local_devices()[0]
        kind = dev.device_kind.lower()
        platform = dev.platform.lower()
    except Exception:
        return 16 * 2**30
    cap = 16 * 2**30
    for pat, gib in (("v5p", 95), ("v5 lite", 16), ("v5e", 16),
                     ("v6 lite", 32), ("v6e", 32), ("v4", 32), ("v3", 32),
                     ("v2", 16)):
        if pat in kind:
            cap = gib * 2**30
            break
    if platform == "axon":
        # the shared tunnel runtime never exposed counters, and the 49k x
        # box-256 campaign measured repeated RESOURCE_EXHAUSTED between
        # ~11.3 and ~12.4 GiB of accounted usage on a "16 GB" v5e —
        # budget for ~12 GiB usable unless PYP_TPU_HBM_GIB overrides
        cap = min(cap, 12 * 2**30)
    return cap


def device_memory_stats() -> dict:
    """Raw backend counters; {} when the backend exposes none (axon)."""
    import jax

    try:
        ms = jax.local_devices()[0].memory_stats()
    except Exception:
        ms = None
    return dict(ms) if ms else {}


def _sig(args, kwargs):
    parts = []
    for a in list(args) + sorted((kwargs or {}).items()):
        if isinstance(a, tuple):
            a = a[1]
        shape = getattr(a, "shape", None)
        if shape is not None:
            parts.append((tuple(shape), str(getattr(a, "dtype", ""))))
        else:
            parts.append(repr(a)[:64])
    return tuple(parts)


def observe(name: str, jitted, args=(), kwargs=None) -> None:
    """Record `jitted`'s compiled memory plan for these argument shapes.

    No-op unless PYP_TPU_MEMWATCH=1.  Never raises: telemetry must not be
    able to kill a multi-hour run."""
    if not enabled():
        return
    key = (name, _sig(args, kwargs))
    with _LOCK:
        if key in _SEEN:
            return
        _SEEN.add(key)
    try:
        ma = jitted.lower(*args, **(kwargs or {})).compile().memory_analysis()
        stats = {
            "peak_bytes": int(getattr(ma, "peak_memory_in_bytes", 0) or 0),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "code_bytes": int(ma.generated_code_size_in_bytes),
        }
    except Exception as e:  # pragma: no cover - backend-dependent
        logger.debug("memwatch observe(%s) failed: %s", name, e)
        return
    with _LOCK:
        prev = _REGISTRY.get(name)
        if prev is None or stats["peak_bytes"] > prev["peak_bytes"]:
            _REGISTRY[name] = stats
    logger.info(
        "memwatch %s: peak %.2f GiB (args %.2f + temp %.2f + out %.2f)",
        name, stats["peak_bytes"] / 2**30,
        stats["argument_bytes"] / 2**30, stats["temp_bytes"] / 2**30,
        stats["output_bytes"] / 2**30)


def report() -> dict:
    """Combined telemetry snapshot for bench extras / e2e logs."""
    with _LOCK:
        programs = {k: dict(v) for k, v in _REGISTRY.items()}
    out = {
        "live_bytes": live_device_bytes(),
        "programs": programs,
    }
    ms = device_memory_stats()
    if ms.get("peak_bytes_in_use"):
        out["device_peak_bytes_in_use"] = int(ms["peak_bytes_in_use"])
        out["device_bytes_limit"] = int(ms.get("bytes_limit", 0))
    return out


def reset() -> None:
    with _LOCK:
        _SEEN.clear()
        _REGISTRY.clear()
