"""Round-trip tests for the I/O codecs (MRC, .cistem, .par, .star, metadata)."""

import numpy as np
import pytest

from pyp_tpu.io import cistem, metadata, mrc, parfile, star


class TestMrc:
    def test_roundtrip_f32(self, tmp_path):
        data = np.random.RandomState(0).randn(5, 32, 48).astype(np.float32)
        p = tmp_path / "a.mrc"
        mrc.write(data, p, pixel_size=1.35)
        hdr = mrc.read_header(p)
        assert hdr.shape == (5, 32, 48)
        assert abs(hdr.pixel_size - 1.35) < 1e-6
        back = mrc.read(p)
        np.testing.assert_array_equal(back, data)

    def test_roundtrip_2d(self, tmp_path):
        data = np.random.RandomState(1).randn(16, 16).astype(np.float32)
        p = tmp_path / "b.mrc"
        mrc.write(data, p)
        back = mrc.read(p)
        assert back.shape == (16, 16)
        np.testing.assert_array_equal(back, data)

    def test_modes(self, tmp_path):
        for dt in [np.int8, np.int16, np.uint16, np.float16, np.complex64]:
            data = (np.random.RandomState(2).rand(3, 8, 8) * 50).astype(dt)
            p = tmp_path / f"m_{np.dtype(dt).name}.mrc"
            mrc.write(data, p)
            np.testing.assert_array_equal(mrc.read(p), data)

    def test_slices_and_mmap(self, tmp_path):
        data = np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8)
        p = tmp_path / "c.mrc"
        mrc.write(data, p)
        np.testing.assert_array_equal(mrc.read(p, slices=2), data[2])
        np.testing.assert_array_equal(mrc.read(p, slices=[1, 3]), data[[1, 3]])
        mm = mrc.mmap(p)
        np.testing.assert_array_equal(np.asarray(mm), data)

    def test_append_and_merge(self, tmp_path):
        a = np.random.RandomState(3).randn(2, 8, 8).astype(np.float32)
        b = np.random.RandomState(4).randn(3, 8, 8).astype(np.float32)
        p1, p2, pm = tmp_path / "s1.mrc", tmp_path / "s2.mrc", tmp_path / "m.mrc"
        mrc.write(a, p1)
        mrc.append(b, p1)
        np.testing.assert_array_equal(mrc.read(p1), np.concatenate([a, b]))
        mrc.write(a, p1)
        mrc.write(b, p2)
        mrc.merge([p1, p2], pm)
        np.testing.assert_array_equal(mrc.read(pm), np.concatenate([a, b]))


class TestCistem:
    def test_roundtrip_parameters(self, tmp_path):
        n = 17
        t = cistem.Table.zeros(n)
        t["position_in_stack"] = np.arange(1, n + 1)
        t["psi"] = np.linspace(0, 350, n)
        t["theta"] = np.linspace(0, 170, n)
        t["defocus_1"] = np.full(n, 21234.5)
        t["occupancy"] = np.full(n, 100.0)
        p = tmp_path / "r.cistem"
        cistem.write_parameters(t, p)
        back = cistem.read_parameters(p)
        assert back.column_ids == t.column_ids
        np.testing.assert_allclose(back["psi"], t["psi"].astype(np.float32))
        np.testing.assert_array_equal(back["position_in_stack"], t["position_in_stack"])

    def test_roundtrip_extended(self, tmp_path):
        part = cistem.Table.zeros(5, cistem.PARTICLE_BLOCK_COLUMNS)
        part["particle_index"] = np.arange(5)
        part["shift_x"] = np.random.RandomState(0).randn(5)
        tilt = cistem.Table.zeros(7, cistem.TILT_BLOCK_COLUMNS)
        tilt["tilt_index"] = np.arange(7)
        tilt["tilt_angle"] = np.linspace(-60, 60, 7)
        p = tmp_path / "e.cistem"
        cistem.write_extended(part, tilt, p)
        p2, t2 = cistem.read_extended(p)
        np.testing.assert_allclose(p2["shift_x"], part["shift_x"].astype(np.float32))
        np.testing.assert_allclose(t2["tilt_angle"], tilt["tilt_angle"].astype(np.float32))

    def test_merge(self):
        a = cistem.Table.zeros(3)
        b = cistem.Table.zeros(4)
        a["score"] = [1, 2, 3]
        b["score"] = [4, 5, 6, 7]
        m = cistem.merge_tables([a, b])
        assert m.n_rows == 7
        np.testing.assert_allclose(m["score"], [1, 2, 3, 4, 5, 6, 7])


class TestParfile:
    @pytest.mark.parametrize("variant,extended", [("new", False), ("frealignx", False), ("new", True), ("frealignx", True), ("cclin", False)])
    def test_roundtrip(self, tmp_path, variant, extended):
        pf = parfile.ParFile.zeros(6, variant=variant, extended=extended)
        pf["PSI"] = np.linspace(0, 300, 6)
        pf["DF1"] = np.full(6, 18000.4)
        p = tmp_path / "t.par"
        parfile.write(pf, p, variant=variant)
        back = parfile.read(p)
        assert back.columns == pf.columns
        np.testing.assert_allclose(back["PSI"], pf["PSI"], atol=0.01)
        np.testing.assert_allclose(back["DF1"], pf["DF1"], atol=0.1)

    def test_detect_columns(self, tmp_path):
        pf = parfile.ParFile.zeros(2, variant="frealignx")
        p = tmp_path / "x.par"
        parfile.write(pf, p)
        back = parfile.read(p)
        assert "PSHIFT" in back.columns


class TestStar:
    def test_roundtrip(self, tmp_path):
        blocks = {
            "optics": {
                "fields": {"rlnVoltage": "300"},
                "loop": {"rlnOpticsGroup": np.array([1]), "rlnImagePixelSize": np.array([1.0])},
            },
            "particles": {
                "fields": {},
                "loop": {
                    "rlnCoordinateX": np.array([100.5, 200.25]),
                    "rlnCoordinateY": np.array([50.0, 60.0]),
                    "rlnImageName": np.array(["1@s.mrcs", "2@s.mrcs"], dtype=object),
                },
            },
        }
        p = tmp_path / "p.star"
        star.write(blocks, p)
        back = star.read(p)
        assert back["optics"]["fields"]["rlnVoltage"] == "300"
        np.testing.assert_allclose(back["particles"]["loop"]["rlnCoordinateX"], [100.5, 200.25])
        assert list(back["particles"]["loop"]["rlnImageName"]) == ["1@s.mrcs", "2@s.mrcs"]


class TestMetadata:
    def test_save_load_refresh(self, tmp_path):
        m = metadata.ItemMetadata("mic001", tmp_path, mode="spr")
        m["drift"] = np.random.RandomState(0).randn(30, 2)
        m["ctf"] = np.array([21000.0, 20500.0, 45.0, 0.0, 4.2])
        m.scalars["voltage"] = 300.0
        m.save()
        m2 = metadata.ItemMetadata("mic001", tmp_path, mode="spr").load()
        assert m2.is_done("drift") and m2.is_done("ctf")
        np.testing.assert_allclose(m2["drift"], m["drift"])
        assert m2.scalars["voltage"] == 300.0
        dropped = m2.refresh({"ctf_force": True})
        assert dropped == ["ctf"] and not m2.is_done("ctf") and m2.is_done("drift")


class TestMrcExtendedHeader:
    def test_read_skips_extended_header(self, tmp_path):
        # files with nsymbt extended headers (serialEM writes these)
        data = np.random.RandomState(0).randn(2, 8, 8).astype(np.float32)
        p = tmp_path / "ext.mrc"
        mrc.write(data, p)
        raw = p.read_bytes()
        ext = b"\\x07" * 128
        hdr = bytearray(raw[:1024])
        import struct

        struct.pack_into("<i", hdr, 92, len(ext))  # nsymbt
        (tmp_path / "ext2.mrc").write_bytes(bytes(hdr) + ext + raw[1024:])
        back = mrc.read(tmp_path / "ext2.mrc")
        np.testing.assert_array_equal(back, data)
        mm = mrc.mmap(tmp_path / "ext2.mrc")
        np.testing.assert_array_equal(np.asarray(mm), data)


class TestCistemByteLayout:
    def test_hand_crafted_bytes_read(self, tmp_path):
        """Byte-level contract check: a file assembled by hand to the
        documented layout (SURVEY §A.6: int32 ncols, int32 nrows, per-column
        int64 id + int8 type code, row-major records) must parse."""
        import struct

        buf = b""
        # two columns: POSITION_IN_STACK (uint32) and PSI (float)
        buf += struct.pack("<ii", 2, 3)                     # ncols, nrows
        buf += struct.pack("<qb", 1, 9)                     # POSITION, UINT
        buf += struct.pack("<qb", 4, 3)                     # PSI, FLOAT
        for i, psi in [(1, 10.5), (2, 20.5), (3, 30.5)]:
            buf += struct.pack("<If", i, psi)
        p = tmp_path / "hand.cistem"
        p.write_bytes(buf)
        t = cistem.read_parameters(p)
        assert t.n_rows == 3
        np.testing.assert_array_equal(t["position_in_stack"], [1, 2, 3])
        np.testing.assert_allclose(t["psi"], [10.5, 20.5, 30.5])

    def test_writer_emits_documented_layout(self, tmp_path):
        import struct

        t = cistem.Table.zeros(2, [cistem.POSITION_IN_STACK, cistem.PSI])
        t["position_in_stack"] = [7, 8]
        t["psi"] = [1.25, 2.5]
        p = tmp_path / "w.cistem"
        cistem.write_parameters(t, p)
        raw = p.read_bytes()
        ncols, nrows = struct.unpack_from("<ii", raw, 0)
        assert (ncols, nrows) == (2, 2)
        cid0, tc0 = struct.unpack_from("<qb", raw, 8)
        cid1, tc1 = struct.unpack_from("<qb", raw, 17)
        assert (cid0, tc0) == (1, 9)   # POSITION_IN_STACK, UINT
        assert (cid1, tc1) == (4, 3)   # PSI, FLOAT
        v0, p0 = struct.unpack_from("<If", raw, 26)
        assert v0 == 7 and abs(p0 - 1.25) < 1e-6


class TestCompressedMovies:
    def test_bz2_and_gz_movie_roundtrip(self, tmp_path):
        """The transfer-compression layer (reference pbzip2 role): movies
        arriving as .mrc.bz2/.tif.gz load identically."""
        import bz2
        import gzip

        from pyp_tpu.io import mrc
        from pyp_tpu.pipeline.spr import load_movie

        rng = np.random.RandomState(0)
        frames = rng.rand(3, 24, 24).astype(np.float32)
        raw = tmp_path / "m.mrc"
        mrc.write(frames, raw)
        bz = tmp_path / "m.mrc.bz2"
        bz.write_bytes(bz2.compress(raw.read_bytes()))
        gz = tmp_path / "m.mrc.gz"
        gz.write_bytes(gzip.compress(raw.read_bytes()))
        np.testing.assert_allclose(load_movie(bz), frames, rtol=1e-6)
        np.testing.assert_allclose(load_movie(gz), frames, rtol=1e-6)


class TestWarpInterop:
    def test_tomostar_roundtrip(self, tmp_path):
        from pyp_tpu.io import warp

        names = [f"ts1_{t:03d}.mrc" for t in range(5)]
        angles = np.linspace(-60, 60, 5)
        warp.write_tomostar(tmp_path / "ts1.tomostar", names, angles,
                            axis_angles=85.3, doses=np.arange(5) * 3.0)
        got = warp.read_tomostar(tmp_path / "ts1.tomostar")
        assert got["movie_names"] == names
        np.testing.assert_allclose(got["tilt_angles"], angles, atol=1e-4)
        np.testing.assert_allclose(got["axis_angles"], 85.3, atol=1e-4)
        np.testing.assert_allclose(got["doses"], np.arange(5) * 3.0, atol=1e-4)

    def test_export_from_metadata(self, tmp_path):
        from pyp_tpu.io import warp
        from pyp_tpu.io.metadata import ItemMetadata

        meta = ItemMetadata("tsA", tmp_path, mode="tomo")
        meta["tlt"] = np.linspace(-30, 30, 3).astype(np.float32)
        meta["xf"] = np.array([[1.0, 2.0, 84.0]] * 3, np.float32)
        paths = warp.export_tomostar_dir({"tsA": meta}, tmp_path / "tomostar")
        assert paths[0].name == "tsA.tomostar"
        got = warp.read_tomostar(paths[0])
        np.testing.assert_allclose(got["axis_angles"], 84.0, atol=1e-4)
