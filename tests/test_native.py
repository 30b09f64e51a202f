"""Native layer tests: pypio library (LZW, section copy) and the launcher."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from pyp_tpu.io import native, tiff

REPO = Path(__file__).resolve().parents[1]

needs_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


def lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF-LZW encoder (test-only reference implementation)."""
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code, code_size = 258, 9
    out_bits = [(CLEAR, code_size)]
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            out_bits.append((table[w], code_size))
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
                if next_code + 1 > (1 << code_size) and code_size < 12:
                    code_size += 1
            else:
                out_bits.append((CLEAR, code_size))
                table = {bytes([i]): i for i in range(256)}
                next_code, code_size = 258, 9
            w = bytes([ch])
    if w:
        out_bits.append((table[w], code_size))
    out_bits.append((EOI, code_size))
    buf = cnt = 0
    out = bytearray()
    for code, size in out_bits:
        buf = (buf << size) | code
        cnt += size
        while cnt >= 8:
            out.append((buf >> (cnt - 8)) & 0xFF)
            cnt -= 8
    if cnt:
        out.append((buf << (8 - cnt)) & 0xFF)
    return bytes(out)


@needs_gxx
class TestPypio:
    def test_lzw_matches_python(self):
        assert native.available()
        rng = np.random.RandomState(0)
        payload = (rng.rand(20000) * 8).astype(np.uint8).tobytes()
        enc = lzw_encode(payload)
        assert native.lzw_decode(enc, len(payload)) == payload
        assert tiff._lzw_decode(enc) == payload

    def test_lzw_corrupt_stream_safe(self):
        out = native.lzw_decode(b"\xff\xff\xff\xff\xff\xff", 100)
        # must not crash; None (error) or some bytes are both acceptable
        assert out is None or isinstance(out, bytes)

    def test_copy_section(self, tmp_path):
        src = tmp_path / "src.bin"
        dst = tmp_path / "dst.bin"
        src.write_bytes(b"0123456789" * 100)
        dst.write_bytes(b"x" * 2000)
        n = native.copy_section(src, 10, dst, 5, 50)
        assert n == 50
        assert dst.read_bytes()[5:55] == (b"0123456789" * 100)[10:60]


@needs_gxx
class TestLauncher:
    def test_builds_and_dispatches(self, tmp_path):
        build = subprocess.run(["make", "-C", str(REPO / "native/launcher")],
                               capture_output=True, text=True)
        assert build.returncode == 0, build.stderr
        binary = REPO / "native/launcher/pyp"
        # symlink alias dispatch: byp -> the byp box-interop mode
        # (matching the reference's bin/run/byp driver)
        alias = tmp_path / "byp"
        alias.symlink_to(binary)
        (tmp_path / "mic.box").write_text("10\t20\t64\t64\n30\t40\t64\t64\n")
        out = subprocess.run(
            [str(alias), "mic.box", "-scope_pixel", "1.25"],
            capture_output=True, text=True, cwd=tmp_path,
            env={"PATH": "/usr/bin:/bin", "HOME": str(tmp_path),
                 "PYP_TPU_PATH": str(REPO),
                 "PYP_TPU_PYTHON": shutil.which("python3") or "python3"},
        )
        assert out.returncode == 0, out.stderr
        assert '"mode": "box2mod"' in out.stdout, out.stdout

    def test_config_file_env_forwarding(self, tmp_path):
        binary = REPO / "native/launcher/pyp"
        cfgdir = tmp_path / ".pyp_tpu"
        cfgdir.mkdir()
        (cfgdir / "config.toml").write_text(
            f'python = "{shutil.which("python3")}"\n'
            f'pyp_path = "{REPO}"\n'
            'env_PYP_TEST_FLAG = "hello"\n'
        )
        out = subprocess.run(
            [str(binary), "params"],
            capture_output=True, text=True, cwd=tmp_path,
            env={"PATH": "/usr/bin:/bin", "HOME": str(tmp_path)},
        )
        assert out.returncode == 0, out.stderr
