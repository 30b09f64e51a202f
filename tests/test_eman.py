"""EMAN2 interop (refine/eman role): HDF stacks in the MDF layout and LSX
list files round-trip, and the HDF structure matches what EMAN2 readers
expect (/MDF/images/<i>/image + EMAN.* attrs)."""

import numpy as np

from pyp_tpu.io import eman


class TestHdf:
    def test_stack_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        stack = rng.randn(5, 32, 32).astype(np.float32)
        p = tmp_path / "stack.hdf"
        eman.write_hdf(stack, p, apix=1.35)
        back, apix = eman.read_hdf(p)
        np.testing.assert_array_equal(back, stack)
        assert abs(apix - 1.35) < 1e-9

    def test_mdf_layout(self, tmp_path):
        import h5py

        stack = np.zeros((2, 8, 8), np.float32)
        p = tmp_path / "s.hdf"
        eman.write_hdf(stack, p, apix=2.0)
        with h5py.File(p, "r") as f:
            assert "MDF/images" in f
            assert int(f["MDF/images"].attrs["imageid_max"]) == 1
            g = f["MDF/images/0"]
            assert g["image"].shape == (8, 8)
            assert abs(float(g.attrs["EMAN.apix_x"]) - 2.0) < 1e-9
            assert int(g.attrs["EMAN.nx"]) == 8

    def test_volume(self, tmp_path):
        import h5py

        vol = np.random.RandomState(1).randn(16, 16, 16).astype(np.float32)
        p = tmp_path / "vol.hdf"
        eman.write_hdf(vol, p, volume=True)
        back, _ = eman.read_hdf(p)
        np.testing.assert_array_equal(back[0], vol)
        with h5py.File(p, "r") as f:
            # ONE 3-D image, not 16 slices
            assert int(f["MDF/images"].attrs["imageid_max"]) == 0
            assert f["MDF/images/0/image"].shape == (16, 16, 16)
            assert int(f["MDF/images/0"].attrs["EMAN.nz"]) == 16


class TestLst:
    def test_roundtrip(self, tmp_path):
        entries = [(0, "stack.hdf", "score=0.9"),
                   (3, "stack.hdf", ""),
                   (7, "other.hdf", "defocus=1.5")]
        p = tmp_path / "parts.lst"
        eman.write_lst(entries, p, comment="test list")
        back = eman.read_lst(p)
        assert back == entries
        # LSX fixed-width: all record lines equal length
        lines = [ln for ln in p.read_text().splitlines()
                 if ln and not ln.startswith("#")]
        assert len({len(ln) for ln in lines}) == 1
        assert p.read_text().startswith("#LSX\n")


class TestBypDispatch:
    def test_hdf_mrc_both_ways(self, tmp_path, monkeypatch):
        from pyp_tpu import cli
        from pyp_tpu.io import mrc

        monkeypatch.chdir(tmp_path)
        stack = np.random.RandomState(3).randn(3, 16, 16).astype(np.float32)
        mrc.write(stack, "s.mrc", pixel_size=1.5)
        assert cli.main(["byp", "s.mrc", "-to_hdf",
                         "-scope_pixel", "1.5"]) == 0
        assert (tmp_path / "s.hdf").exists()
        (tmp_path / "s.mrc").unlink()
        assert cli.main(["byp", "s.hdf"]) == 0
        back = mrc.read("s.mrc")
        np.testing.assert_allclose(back, stack, atol=1e-6)


class TestMrcBridge:
    def test_export_particles_hdf(self, tmp_path):
        from pyp_tpu.io import mrc

        stack = np.random.RandomState(2).randn(4, 16, 16).astype(np.float32)
        mp = tmp_path / "stack.mrc"
        mrc.write(stack, mp, pixel_size=1.1)
        out = eman.export_particles_hdf(mp, tmp_path / "stack.hdf",
                                        apix=1.1)
        back, apix = eman.read_hdf(out)
        np.testing.assert_allclose(back, stack, atol=1e-6)
        assert abs(apix - 1.1) < 1e-9
