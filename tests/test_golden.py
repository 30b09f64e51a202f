"""Reference-golden format parity.

The fixtures under tests/golden/ were written by the REFERENCE
implementation's own codecs (tools/make_golden_fixtures.py runs nextPYP's
cistem_star_file / frealign_parfile writers and IMOD-layout savetxt), with
the exact source values saved alongside as .npy. These tests prove our
readers decode the other implementation's bytes — the convention drift
that synthetic round-trips cannot catch (VERDICT round 1, item 8)."""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"

pytestmark = pytest.mark.skipif(
    not GOLDEN.exists(), reason="golden fixtures not generated")


class TestCistemGolden:
    def test_main_block(self):
        from pyp_tpu.io import cistem

        want = np.load(GOLDEN / "ref_particles_data.npy")
        table = cistem.read_parameters(GOLDEN / "ref_particles.cistem")
        assert table.n_rows == want.shape[0]
        # reference column order (cistem_star_file.Parameters.HEADERS)
        checks = {
            "position_in_stack": 0, "psi": 1, "theta": 2, "phi": 3,
            "x_shift": 4, "y_shift": 5, "defocus_1": 6, "defocus_2": 7,
            "defocus_angle": 8, "phase_shift": 9, "image_is_active": 10,
            "occupancy": 11, "logp": 12, "sigma": 13, "score": 14,
            "pixel_size": 15, "microscope_voltage": 16, "microscope_cs": 17,
            "amplitude_contrast": 18,
        }
        for name, col in checks.items():
            assert name in table, name
            np.testing.assert_allclose(
                np.asarray(table[name], dtype=np.float64), want[:, col],
                rtol=1e-5, atol=1e-4, err_msg=name)

    def test_extended_blocks(self):
        from pyp_tpu.io import cistem

        particles, tilts = cistem.read_extended(
            GOLDEN / "ref_particles_extended.cistem")
        assert particles is not None and tilts is not None
        # generator wrote 3 particles (pind 0..2, score 15.5, occ 100) and
        # 3 tilts (tind 0..2, angle -60 + 3*t, axis 85.3)
        assert particles.n_rows == 3
        np.testing.assert_allclose(np.sort(np.asarray(particles["particle_index"])),
                                   [0, 1, 2])
        np.testing.assert_allclose(np.asarray(particles["pscore"]),
                                   [15.5] * 3, rtol=1e-5)
        assert tilts.n_rows == 3
        order = np.argsort(np.asarray(tilts["tilt_index"]))
        np.testing.assert_allclose(
            np.asarray(tilts["tilt_angle"])[order],
            [-60.0, -57.0, -54.0], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(tilts["tilt_axis"]),
                                   [85.3] * 3, rtol=1e-5)


class TestParGolden:
    def test_new_par(self):
        from pyp_tpu.io import parfile

        want = np.load(GOLDEN / "ref_new_par_data.npy")
        pf = parfile.read(GOLDEN / "ref_new.par")
        assert pf.n_rows == want.shape[0]
        for i, col in enumerate(parfile.NEW_COLUMNS):
            np.testing.assert_allclose(
                np.asarray(pf[col], dtype=np.float64), want[:, i],
                rtol=1e-4, atol=5e-3, err_msg=col)

    def test_frealignx_par(self):
        from pyp_tpu.io import parfile

        want = np.load(GOLDEN / "ref_frealignx_par_data.npy")
        pf = parfile.read(GOLDEN / "ref_frealignx.par")
        assert pf.n_rows == want.shape[0]
        for i, col in enumerate(parfile.FREALIGNX_COLUMNS):
            np.testing.assert_allclose(
                np.asarray(pf[col], dtype=np.float64), want[:, i],
                rtol=1e-4, atol=5e-3, err_msg=col)


class TestImodGolden:
    def test_xf_tlt(self):
        want_xf = np.load(GOLDEN / "ref_series_xf.npy")
        want_tlt = np.load(GOLDEN / "ref_series_tlt.npy")
        xf = np.loadtxt(GOLDEN / "ref_series.xf")
        tlt = np.loadtxt(GOLDEN / "ref_series.tlt")
        np.testing.assert_allclose(xf, want_xf, atol=1e-6)
        np.testing.assert_allclose(tlt, want_tlt, atol=1e-2)
        # semantic check: the 2x2 block is a rotation (reference xf rows are
        # [a11 a12 a21 a22 dx dy], IMOD xfproduct layout)
        A = xf[:, :4].reshape(-1, 2, 2)
        np.testing.assert_allclose(
            np.linalg.det(A), np.ones(len(A)), atol=1e-5)


class TestImodModelGolden:
    def test_reads_imod_written_model(self):
        """Parse a model written by IMOD itself (template from the
        reference tree): header fields + chunk walk must succeed."""
        from pyp_tpu.io import imod

        objects, header = imod.read_model(GOLDEN / "ref_imod.mod")
        assert header["xmax"] == 1080 and header["ymax"] == 360
        assert header["zmax"] == 20 and header["objsize"] == 1
        assert header["name"] == "IMOD-NewModel"
        assert len(objects) == 1 and objects[0] == []  # empty template

    def test_point_model_roundtrip(self, tmp_path):
        from pyp_tpu.io import imod

        rng = np.random.RandomState(0)
        pts = (rng.rand(25, 3) * [1024, 1024, 60]).astype(np.float32)
        p = tmp_path / "picks.mod"
        imod.write_point_model(p, pts, shape_xyz=(1024, 1024, 60))
        back = imod.read_points(p)
        np.testing.assert_allclose(back, pts, atol=1e-4)
        objs, header = imod.read_model(p)
        assert header["xmax"] == 1024 and header["objsize"] == 1
        assert len(objs[0]) == 25  # one contour per scattered point
