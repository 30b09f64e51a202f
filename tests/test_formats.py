"""Raw-data edge formats (VERDICT r2 item 4): 4-bit packed TIFF (K3
counting movies), MRC mode 101, big-endian MRC, and EER byte-level spec
vectors hand-packed independently of io.eer's encoder.

Reference behavior being matched: inout/image/core.py:913-1128 (the
reference converts these through IMOD; we decode natively).
"""

import struct

import numpy as np

from pyp_tpu.io import eer, mrc, tiff


class TestMrc101:
    def test_roundtrip_even_width(self, tmp_path):
        rng = np.random.RandomState(0)
        data = rng.randint(0, 16, (3, 8, 10)).astype(np.uint8)
        p = tmp_path / "k3.mrc"
        mrc.write_packed4(data, p)
        hdr = mrc.read_header(p)
        assert hdr.mode == 101 and hdr.shape == (3, 8, 10)
        out = mrc.read(p)
        np.testing.assert_array_equal(out, data)

    def test_roundtrip_odd_width(self, tmp_path):
        rng = np.random.RandomState(1)
        data = rng.randint(0, 16, (2, 5, 7)).astype(np.uint8)
        p = tmp_path / "odd.mrc"
        mrc.write_packed4(data, p)
        np.testing.assert_array_equal(mrc.read(p), data)

    def test_packing_layout_low_nibble_first(self):
        # IMOD/SerialEM convention: first pixel in the LOW nibble
        packed = mrc.pack_4bit(np.array([[1, 2, 3, 4]], dtype=np.uint8))
        assert packed.tobytes() == bytes([0x21, 0x43])

    def test_slices(self, tmp_path):
        data = np.arange(2 * 4 * 4).reshape(2, 4, 4).astype(np.uint8) % 16
        p = tmp_path / "s.mrc"
        mrc.write_packed4(data, p)
        np.testing.assert_array_equal(mrc.read(p, 1), data[1])


class TestMrcBigEndian:
    def _write_big_endian(self, path, data):
        """Hand-pack a minimal big-endian MRC (as a big-endian machine or
        byte-swapped legacy writer would)."""
        nz, ny, nx = data.shape
        hdr = bytearray(1024)
        struct.pack_into(">10i", hdr, 0, nx, ny, nz, 1, 0, 0, 0, nx, ny, nz)
        struct.pack_into(">6f", hdr, 40, nx * 1.0, ny * 1.0, nz * 1.0,
                         90.0, 90.0, 90.0)
        struct.pack_into(">3i", hdr, 64, 1, 2, 3)
        hdr[208:212] = b"MAP "
        hdr[212:216] = b"\x11\x11\x00\x00"   # big-endian machine stamp
        with open(path, "wb") as f:
            f.write(bytes(hdr))
            f.write(data.astype(">i2").tobytes())

    def test_read_big_endian_i16(self, tmp_path):
        rng = np.random.RandomState(0)
        data = rng.randint(-500, 500, (2, 6, 6)).astype(np.int16)
        p = tmp_path / "be.mrc"
        self._write_big_endian(p, data)
        hdr = mrc.read_header(p)
        assert hdr.byte_order == ">" and hdr.shape == (2, 6, 6)
        out = mrc.read(p)
        np.testing.assert_array_equal(out.astype(np.int16), data)

    def test_zeroed_stamp_falls_back_to_mode_sniff(self, tmp_path):
        # legacy files with no machine stamp: big-endian mode field decodes
        # as a huge little-endian integer -> sniff flips the byte order
        data = np.ones((1, 4, 4), dtype=np.int16)
        p = tmp_path / "legacy.mrc"
        self._write_big_endian(p, data)
        raw = bytearray(p.read_bytes())
        raw[212:216] = b"\x00\x00\x00\x00"
        p.write_bytes(bytes(raw))
        assert mrc.read_header(p).byte_order == ">"
        np.testing.assert_array_equal(mrc.read(p).astype(np.int16), data[0])


class TestTiff4bit:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        data = rng.randint(0, 16, (3, 6, 8)).astype(np.uint8)
        p = tmp_path / "k3.tif"
        tiff.write(data, p, bits=4)
        out = tiff.read(p)
        np.testing.assert_array_equal(out, data)

    def test_roundtrip_odd_width(self, tmp_path):
        rng = np.random.RandomState(2)
        data = rng.randint(0, 16, (2, 4, 5)).astype(np.uint8)
        p = tmp_path / "odd.tif"
        tiff.write(data, p, bits=4)
        np.testing.assert_array_equal(tiff.read(p), data)

    def test_high_nibble_first(self, tmp_path):
        # TIFF spec FillOrder=1: FIRST pixel in the HIGH nibble (opposite
        # of MRC mode 101) — a swapped implementation round-trips its own
        # files but misreads camera data, so pin the byte layout
        p = tmp_path / "layout.tif"
        tiff.write(np.array([[[1, 2, 3, 4]]], dtype=np.uint8), p, bits=4)
        raw = p.read_bytes()
        assert bytes([0x12, 0x34]) in raw


class TestEerSpecVectors:
    """Bitstreams packed BY HAND from the published EER layout (7-bit RLE +
    4-bit sub-pixel, little-endian bit order) — independent of io.eer's
    _BitWriter, so an encoder/decoder that agree on a wrong layout fail."""

    def test_eer7_vector(self):
        # fields: run=5, sub=0b0110 (sy=1,sx=2); run=3, sub=0b1011
        # (sy=2,sx=3); run=127 (terminator). Hand-packed LSB-first:
        data = bytes([0x05, 0x1B, 0xEC, 0x1F])
        img = eer.decode_frame(data, eer.COMPRESSION_EER7, size=16)
        expect = np.zeros((16, 16), np.uint16)
        expect[0, 5] = 1    # after skipping 5 pixels
        expect[0, 9] = 1    # 5+1 + 3 more
        np.testing.assert_array_equal(img, expect)

    def test_eer7_vector_16k_subpixels(self):
        data = bytes([0x05, 0x1B, 0xEC, 0x1F])
        img = eer.decode_frame(data, eer.COMPRESSION_EER7, size=16,
                               upsampling=4)
        expect = np.zeros((64, 64), np.uint16)
        # event 1: x=5,y=0, sub=6 -> sx=(6&3)^2=0, sy=((6>>2)&3)^2=3
        expect[3, 20] = 1
        # event 2: x=9,y=0, sub=11 -> sx=(11&3)^2=1, sy=((11>>2)&3)^2=0
        expect[0, 37] = 1
        np.testing.assert_array_equal(img, expect)

    def test_eer7_vector_8k_subpixels(self):
        data = bytes([0x05, 0x1B, 0xEC, 0x1F])
        img = eer.decode_frame(data, eer.COMPRESSION_EER7, size=16,
                               upsampling=2)
        expect = np.zeros((32, 32), np.uint16)
        expect[1, 10] = 1   # sx=0 -> 5*2+0; sy=3 -> 0*2+1
        expect[0, 18] = 1   # sx=1 -> 9*2+0... sx>>1=0; sy=0
        np.testing.assert_array_equal(img, expect)

    def test_eer8_vector(self):
        # 8-bit RLE, no sub-pixel bits: run=2, then 255 terminator
        img = eer.decode_frame(bytes([0x02, 0xFF]),
                               eer.COMPRESSION_EER8, size=16)
        expect = np.zeros((16, 16), np.uint16)
        expect[0, 2] = 1
        np.testing.assert_array_equal(img, expect)

    def test_skip_only_marker_run127(self):
        # run=127 is skip-without-event: electron lands at 127+3 = pos 130
        # hand-pack: run=127 (7 bits all 1), run=3, sub=0, run=127
        bits = [1] * 7 + [1, 1, 0, 0, 0, 0, 0] + [0] * 4 + [1] * 7
        buf = bytearray((len(bits) + 7) // 8)
        for i, b in enumerate(bits):
            if b:
                buf[i >> 3] |= 1 << (i & 7)
        img = eer.decode_frame(bytes(buf), eer.COMPRESSION_EER7, size=16)
        assert img.sum() == 1
        y, x = divmod(130, 16)
        assert img[y, x] == 1
