"""ctypes binding for the native pypio library (with pure-Python fallback).

Builds on demand from native/pypio (g++ is in the image). Used by the TIFF
reader for LZW decode (~100x the Python decoder) and by mrc.merge-scale
streaming copies.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path


_LIB = None
_TRIED = False

_SRC_DIR = Path(__file__).resolve().parents[2] / "native" / "pypio"


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _SRC_DIR / "libpypio.so"
    if not so.exists() and (_SRC_DIR / "pypio.cpp").exists():
        try:
            subprocess.run(["make", "-C", str(_SRC_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:  # noqa: BLE001
            return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.lzw_decode.restype = ctypes.c_long
    lib.lzw_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
    ]
    lib.copy_section.restype = ctypes.c_long
    lib.copy_section.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_long,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def lzw_decode(data: bytes, expected_size: int) -> bytes | None:
    """Native LZW decode; returns None if the library is unavailable (caller
    falls back to the Python decoder)."""
    lib = _load()
    if lib is None:
        return None
    cap = max(expected_size, 4 * len(data) + 1024)
    out = (ctypes.c_uint8 * cap)()
    n = lib.lzw_decode(data, len(data), out, cap)
    if n < 0:
        return None
    return bytes(bytearray(out[:n]))


def copy_section(src_path, src_off, dst_path, dst_off, count) -> int:
    lib = _load()
    if lib is None:
        # python fallback
        import os

        if not os.path.exists(dst_path):
            open(dst_path, "wb").close()
        with open(src_path, "rb") as src, open(dst_path, "r+b") as dst:
            src.seek(src_off)
            dst.seek(dst_off)
            remaining = count
            while remaining:
                chunk = src.read(min(1 << 22, remaining))
                if not chunk:
                    break
                dst.write(chunk)
                remaining -= len(chunk)
            return count - remaining
    return lib.copy_section(
        str(src_path).encode(), src_off, str(dst_path).encode(), dst_off, count
    )
