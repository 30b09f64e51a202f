"""Interop + streaming tests: box/boxx/spk files, mdoc, RELION star round
trip, session daemon."""

import numpy as np

from pathlib import Path

from pyp_tpu.io import boxfiles, cistem, mdoc, relion

GOLDEN = Path(__file__).resolve().parent / "golden"


class TestBoxFiles:
    def test_box_roundtrip(self, tmp_path):
        coords = np.array([[100, 200], [300, 400]], dtype=float)
        p = tmp_path / "a.box"
        boxfiles.write_box(coords, 64, p)
        back, w = boxfiles.read_box(p)
        assert w == 64
        np.testing.assert_allclose(back, coords)

    def test_boxx_roundtrip(self, tmp_path):
        coords = np.array([[50, 60], [70, 80], [90, 100]], dtype=float)
        p = tmp_path / "a.boxx"
        boxfiles.write_boxx(coords, 32, p, kept=[1, 0, 1])
        back, w, inside, kept = boxfiles.read_boxx(p)
        np.testing.assert_allclose(back, coords)
        assert kept.tolist() == [1, 0, 1]

    def test_spk_roundtrip(self, tmp_path):
        coords = np.array([[10, 20, 30], [40, 50, 60]], dtype=float)
        p = tmp_path / "a.spk"
        boxfiles.write_spk(coords, p)
        np.testing.assert_allclose(boxfiles.read_spk(p), coords)


class TestMdoc:
    def test_parse(self, tmp_path):
        text = """PixelSpacing = 2.7
Voltage = 300

[ZValue = 0]
TiltAngle = -60.0
ExposureDose = 3.1
SubFramePath = X:\\data\\frames_001.tif

[ZValue = 1]
TiltAngle = -57.0
ExposureDose = 3.2
SubFramePath = X:\\data\\frames_002.tif
"""
        p = tmp_path / "series.mdoc"
        p.write_text(text)
        doc = mdoc.read(p)
        assert doc["global"]["PixelSpacing"] == 2.7
        assert mdoc.tilt_angles(doc) == [-60.0, -57.0]
        assert mdoc.exposure_doses(doc) == [3.1, 3.2]
        assert mdoc.subframe_paths(doc) == ["frames_001.tif", "frames_002.tif"]


class TestRelion:
    def test_star_roundtrip(self, tmp_path):
        n = 7
        table = cistem.Table.zeros(n)
        table["position_in_stack"] = np.arange(1, n + 1)
        table["phi"] = np.linspace(0, 300, n)
        table["theta"] = np.linspace(10, 170, n)
        table["psi"] = np.linspace(-170, 170, n)
        table["x_shift"] = np.linspace(-5, 5, n)
        table["defocus_1"] = np.full(n, 21234.0)
        table["score"] = np.linspace(10, 20, n)
        p = tmp_path / "particles.star"
        relion.export_star(table, p, pixel_size=1.1, voltage=200.0)
        back, optics = relion.import_star(p)
        assert back.n_rows == n
        np.testing.assert_allclose(back["phi"], np.asarray(table["phi"], dtype=np.float32), atol=1e-4)
        np.testing.assert_allclose(back["x_shift"], np.asarray(table["x_shift"], dtype=np.float32), atol=1e-4)
        np.testing.assert_allclose(back["defocus_1"], 21234.0)
        assert optics["pixel_size"] == 1.1
        assert optics["voltage"] == 200.0


class TestSessionDaemon:
    def test_processes_incoming_files(self, tmp_path, monkeypatch):
        import jax.numpy as jnp

        from pyp_tpu.config.params import defaults
        from pyp_tpu.io import mrc
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        rng = np.random.RandomState(0)
        params = defaults()
        params.update({
            "scope_pixel": 2.0, "detect_rad": 30, "detect_thresh": 2.0,
            "ctf_min_def": 8000, "ctf_max_def": 30000, "ctf_max_res": 8.0,
            "ctf_tile": 256, "extract_box": 32, "movie_ali": "skip",
        })
        daemon = SessionDaemon(str(tmp_path / "incoming" / "*.mrc"), params,
                               tmp_path, poll_interval=0.01)
        (tmp_path / "incoming").mkdir()

        # drop two "movies" in
        for i in range(2):
            frames = rng.randn(2, 256, 256).astype(np.float32)
            mrc.write(frames, tmp_path / "incoming" / f"s{i}.mrc", pixel_size=2.0)
        out = daemon.run(max_iterations=3, idle_exit=1)
        assert len(out) == 2
        assert (tmp_path / "s0.meta.npz").exists()

        # drop one more; daemon picks up only the new one
        frames = rng.randn(2, 256, 256).astype(np.float32)
        mrc.write(frames, tmp_path / "incoming" / "s9.mrc", pixel_size=2.0)
        out = daemon.run(max_iterations=2, idle_exit=1)
        assert len(out) == 3
        names = sorted(s["name"] for s in out)
        assert names == ["s0", "s1", "s9"]

    def test_live_params_update(self, tmp_path, monkeypatch):
        """The web->daemon params-file protocol (streampyp/params.py role):
        dropping/updating the session params file retunes a running daemon
        between polls."""
        from pyp_tpu.config.params import defaults
        from pyp_tpu.stream.daemon import SessionDaemon
        from pyp_tpu.stream import params as sparams

        monkeypatch.chdir(tmp_path)
        daemon = SessionDaemon(str(tmp_path / "in" / "*.mrc"), defaults(),
                               tmp_path, poll_interval=0.01)
        (tmp_path / "in").mkdir()
        daemon.run(max_iterations=1, idle_exit=1)
        assert daemon.params["detect_rad"] == defaults()["detect_rad"]

        sparams.write_params_file(
            {"detect_rad": 77.0, "class_num": 4, "unknown_key": "x"},
            tmp_path)
        daemon.run(max_iterations=1, idle_exit=1)
        assert daemon.params["detect_rad"] == 77.0
        assert daemon.n_classes == 4
        assert daemon.params["unknown_key"] == "x"  # forward compat

        # unchanged file -> no reload; updated file -> reload
        w = sparams.ParamsWatcher(tmp_path)
        assert w.refresh() is not None
        assert w.refresh() is None

    def test_params_file_toml_interop(self, tmp_path):
        """Read-side TOML support for files written by the reference's web
        server, with schema type coercion."""
        from pyp_tpu.stream.params import parse_params_file

        p = tmp_path / "session.toml"
        p.write_text('detect_rad = 55\nclass_num = "8"\n')
        out = parse_params_file(p)
        assert out["detect_rad"] == 55.0 and isinstance(out["detect_rad"], float)
        assert out["class_num"] == 8 and isinstance(out["class_num"], int)


class TestStarCliModes:
    def test_import_export_roundtrip(self, tmp_path, monkeypatch):
        import json

        from pyp_tpu import cli
        from pyp_tpu.io import cistem, relion

        monkeypatch.chdir(tmp_path)
        n = 5
        table = cistem.Table.zeros(n)
        table["position_in_stack"] = np.arange(1, n + 1)
        table["phi"] = np.linspace(0, 100, n)
        table["defocus_1"] = np.full(n, 19000.0)
        cistem.write_parameters(table, "stack.cistem")
        assert cli.main(["export_star", "-scope_pixel", "1.2"]) == 0
        assert (tmp_path / "particles.star").exists()
        # wipe and re-import
        (tmp_path / "stack.cistem").unlink()
        assert cli.main(["import_star", "particles.star"]) == 0
        back = cistem.read_parameters("stack.cistem")
        assert back.n_rows == n
        np.testing.assert_allclose(back["defocus_1"], 19000.0)

    def test_reference_compatible_flags(self, tmp_path, monkeypatch):
        """The reference's rlp/csp flag spellings work: -import_refine_star,
        -export_location (docs/cli/spa_import_export.rst)."""
        from pyp_tpu import cli
        from pyp_tpu.io import cistem

        monkeypatch.chdir(tmp_path)
        n = 4
        table = cistem.Table.zeros(n)
        table["position_in_stack"] = np.arange(1, n + 1)
        table["defocus_1"] = np.full(n, 17000.0)
        cistem.write_parameters(table, "stack.cistem")
        assert cli.main(["export_star", "-scope_pixel", "1.2",
                         "-export_location", "relion"]) == 0
        assert (tmp_path / "relion" / "particles.star").exists()
        (tmp_path / "stack.cistem").unlink()
        assert cli.main(["import_star", "-import_refine_star",
                         "relion/particles.star"]) == 0
        assert cistem.read_parameters("stack.cistem").n_rows == n

    def test_import_motion_star_records_metrics(self, tmp_path,
                                                monkeypatch):
        """-import_motion_star: RELION accumulated-motion stats land as
        filterable metadata scalars."""
        from pyp_tpu import cli
        from pyp_tpu.io.metadata import ItemMetadata

        monkeypatch.chdir(tmp_path)
        (tmp_path / "corrected_micrographs.star").write_text(
            "data_micrographs\n\nloop_\n_rlnMicrographName #1\n"
            "_rlnAccumMotionTotal #2\n_rlnAccumMotionEarly #3\n"
            "_rlnAccumMotionLate #4\n"
            "Micrographs/mic_a.mrc 42.5 30.0 12.5\n"
            "Micrographs/mic_b.mrc 13.0 9.0 4.0\n")
        assert cli.main(["import_star", "-import_motion_star",
                         "corrected_micrographs.star"]) == 0
        ma = ItemMetadata("mic_a", ".", mode="spr").load()
        assert abs(ma.scalars["motion_total"] - 42.5) < 1e-6
        assert abs(ma.scalars["motion_late"] - 12.5) < 1e-6
        # metrics reach the filter subsystem
        from pyp_tpu.analysis.filters import apply_filter

        kept, _ = apply_filter(".", "motion_total<20")
        assert kept == ["mic_b"], kept


class TestRelionTomoStar:
    """RELION 4/5 tomo star interop (VERDICT r2 item 6): projection
    matrices pinned to the reference's getRelionMatrix via golden
    fixtures; export -> import round-trips the geometry and particles."""

    def _series(self):
        rng = np.random.RandomState(3)
        T = 7
        angles = np.linspace(-45, 45, T).astype(np.float32)
        rots = rng.uniform(-2, 2, T)
        xf = np.stack([np.cos(np.radians(rots)), -np.sin(np.radians(rots)),
                       np.sin(np.radians(rots)), np.cos(np.radians(rots)),
                       rng.uniform(-5, 5, T), rng.uniform(-5, 5, T)], 1)
        return {
            "name": "TS_01", "tilt_angles": angles, "xf": xf,
            "defocus": np.stack([rng.uniform(15000, 30000, T)] * 2, 1),
            "astig_angle": rng.uniform(0, 180, T).astype(np.float32),
            "order": np.arange(T, dtype=np.float32),
            "image_dims": (512, 480),
        }

    def _params(self):
        return {"scope_pixel": 2.1, "scope_voltage": 300.0, "scope_cs": 2.7,
                "scope_wgh": 0.07, "scope_dose_rate": 3.0,
                "tomo_rec_thickness": 600, "extract_box": 64,
                "extract_bin": 2}

    def test_matrix_matches_reference_golden(self):
        from pyp_tpu.core.geometry import relion_tomo_projection_matrix

        cases = np.load(GOLDEN / "ref_relion_tomo_cases.npy")
        mats = np.load(GOLDEN / "ref_relion_tomo_matrices.npy")
        for c, m in zip(cases, mats):
            ours = relion_tomo_projection_matrix(
                c[0], c[1:7], c[7], (c[8], c[9]), c[10], c[11])
            np.testing.assert_allclose(ours, m, atol=1e-10)

    def test_tomograms_star_roundtrip(self, tmp_path):
        from pyp_tpu.io import relion_tomo as rt

        s = self._series()
        p = self._params()
        path = tmp_path / "tomograms.star"
        rt.export_tomograms_star([s], p, path)
        series, gparams = rt.import_tomograms_star(path)
        assert len(series) == 1
        out = series[0]
        assert out["name"] == "TS_01"
        np.testing.assert_allclose(out["tilt_angles"], s["tilt_angles"],
                                   atol=1e-4)
        np.testing.assert_allclose(out["defocus"], s["defocus"], rtol=1e-6)
        np.testing.assert_allclose(out["astig_angle"], s["astig_angle"],
                                   rtol=1e-5)
        np.testing.assert_allclose(out["exposure"],
                                   s["order"] * p["scope_dose_rate"],
                                   rtol=1e-6)
        assert gparams["scope_pixel"] == p["scope_pixel"]
        assert gparams["tomo_rec_thickness"] == p["tomo_rec_thickness"]

    def test_particles_star_v5_roundtrip(self, tmp_path):
        from pyp_tpu.io import relion_tomo as rt

        rng = np.random.RandomState(5)
        P = 11
        parts = {
            "tomo_names": ["TS_01"] * 6 + ["TS_02"] * 5,
            "positions": rng.uniform(0, 512, (P, 3)).astype(np.float32),
            "eulers": rng.uniform(0, 360, (P, 3)).astype(np.float32),
            "shifts": rng.uniform(-8, 8, (P, 3)).astype(np.float32),
            "visible": (rng.rand(P, 7) > 0.2).astype(np.int32),
        }
        path = tmp_path / "particles.star"
        rt.export_particles_star_v5(parts, self._params(), path)
        out = rt.import_particles_star_v5(path)
        assert out["tomo_names"] == parts["tomo_names"]
        np.testing.assert_allclose(out["positions"], parts["positions"],
                                   rtol=1e-6)
        np.testing.assert_allclose(out["eulers"], parts["eulers"], rtol=1e-6)
        np.testing.assert_allclose(out["shifts"], parts["shifts"], rtol=1e-5)
        np.testing.assert_array_equal(out["visible"], parts["visible"])
        assert out["optics"]["box"] == 64
        assert out["optics"]["pixel_size"] == 2.1


class TestParSemanticConversion:
    def test_shx_sign_flip_roundtrip(self):
        """FREALIGN SHX/SHY carry the opposite sign of the internal pose
        convention (reference pyp_metadata.py:1114 negates when leaving
        FREALIGN-land): the semantic converters flip and round-trip."""
        from pyp_tpu.io import cistem, parfile

        t = cistem.Table.zeros(4)
        t["position_in_stack"] = np.arange(1, 5)
        t["x_shift"] = np.array([1.5, -2.0, 0.5, 0.0])
        t["y_shift"] = np.array([0.5, 1.0, -1.0, 2.5])
        t["phi"] = np.array([10.0, 20.0, 30.0, 40.0])
        t["defocus_1"] = np.full(4, 15000.0)
        t["occupancy"] = np.full(4, 100.0)
        pf = parfile.from_cistem_table(t)
        np.testing.assert_allclose(pf["SHX"], -np.asarray(t["x_shift"]))
        np.testing.assert_allclose(pf["SHY"], -np.asarray(t["y_shift"]))
        back = parfile.to_cistem_table(pf)
        for c in ("x_shift", "y_shift", "phi", "defocus_1", "occupancy"):
            np.testing.assert_allclose(np.asarray(back[c]),
                                       np.asarray(t[c]), atol=1e-5)

    def test_file_roundtrip_preserves_semantics(self, tmp_path):
        from pyp_tpu.io import cistem, parfile

        t = cistem.Table.zeros(2)
        t["position_in_stack"] = [1, 2]
        t["x_shift"] = np.array([3.25, -1.5])
        t["defocus_1"] = np.full(2, 12000.0)
        pf = parfile.from_cistem_table(t)
        p = tmp_path / "a.par"
        parfile.write(pf, p)
        back = parfile.to_cistem_table(parfile.read(p))
        np.testing.assert_allclose(np.asarray(back["x_shift"]),
                                   np.asarray(t["x_shift"]), atol=1e-2)


class TestArtiaxStar:
    """Per-series ArtiaX ministar (reference generate_ministar role)."""

    def test_round_trip_and_coordinate_frame(self, tmp_path):
        from pyp_tpu.io.relion_tomo import (export_artiax_star,
                                            import_artiax_star)

        # two particles at known centered unbinned voxels
        pos = np.array([[0.0, 0.0, 0.0],      # tomogram center
                        [-64.0, 32.0, 80.0]])  # (z, y, x)
        eul = np.array([[10.0, 20.0, 30.0], [40.0, 50.0, 60.0]])
        rec_shape = (32, 128, 128)  # binned display tomogram
        path = export_artiax_star(
            "TS_01", pos, eul, rec_shape, 8.0,
            tmp_path / "artiax" / "TS_01_K1.star",
            scores=np.array([0.9, 0.4]))
        out = import_artiax_star(path)
        assert list(out["_rlnTomoName"]) == ["TS_01", "TS_01"]
        # center particle lands at the center of the .rec, z flipped frame
        assert out["_rlnCoordinateX"][0] == 64.0
        assert out["_rlnCoordinateY"][0] == 64.0
        assert out["_rlnCoordinateZ"][0] == 16.0
        # second: x = 80/8 + 64, y = 32/8 + 64, z = 32 - (-64/8 + 16)
        assert out["_rlnCoordinateX"][1] == 74.0
        assert out["_rlnCoordinateY"][1] == 68.0
        assert out["_rlnCoordinateZ"][1] == 24.0
        np.testing.assert_allclose(out["_rlnAngleRot"], eul[:, 0])
        np.testing.assert_allclose(out["_rlnAngleTilt"], eul[:, 1])
        np.testing.assert_allclose(out["_rlnAnglePsi"], eul[:, 2])
        np.testing.assert_allclose(out["_rlnLogLikeliContribution"],
                                   [0.9, 0.4])


class TestSessionTiltScheme:
    def test_mdocless_tomo_session_assembles_series(self, tmp_path,
                                                    monkeypatch):
        """stream_num_tilts/tilt_angles/tilt_order: an mdoc-less tomo
        session processes a series once all its tilt files arrive, mapping
        arrival order -> angles through the declared acquisition order."""
        from pyp_tpu.config.params import defaults
        from pyp_tpu.io import mrc
        from pyp_tpu.io.metadata import ItemMetadata
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        rng = np.random.RandomState(0)
        params = defaults()
        params.update({
            "data_mode": "tomo", "scope_pixel": 2.0,
            "stream_num_tilts": 3,
            "stream_tilt_angles": "-30,0,30",
            "stream_tilt_order": "1,0,2",  # arrival 0 -> angle idx 1 (0 deg)
            "tomo_ali_method": "skip", "tomo_ali_bin": 1,
            "ctf_min_def": 8000, "ctf_max_def": 25000, "ctf_tile": 64,
            "ctf_max_res": 9.0, "tomo_rec_thickness": 16,
            "tomo_rec_binning": 1, "tomo_spk_method": "none",
        })
        daemon = SessionDaemon(str(tmp_path / "in" / "*.mrc"), params,
                               tmp_path, poll_interval=0.01)
        (tmp_path / "in").mkdir()
        for i in range(3):
            frames = rng.randn(2, 128, 128).astype(np.float32)
            mrc.write(frames, tmp_path / "in" / f"ts1_{i:03d}.mrc",
                      pixel_size=2.0)
        daemon.run(max_iterations=3, idle_exit=1)
        meta = ItemMetadata("ts1", tmp_path, mode="tomo").load()
        np.testing.assert_allclose(meta["tlt"], [-30.0, 0.0, 30.0])

    def test_transfer_link_keeps_source(self, tmp_path, monkeypatch):
        from pyp_tpu.config.params import defaults
        from pyp_tpu.io import mrc
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        params = defaults()
        params.update({
            "scope_pixel": 2.0, "movie_ali": "skip", "extract_box": 32,
            "ctf_min_def": 8000, "ctf_max_def": 30000, "ctf_max_res": 8.0,
            "ctf_tile": 64, "stream_transfer_dir": str(tmp_path / "sess"),
            "stream_transfer_operation": "link",
        })
        daemon = SessionDaemon(str(tmp_path / "in" / "*.mrc"), params,
                               tmp_path, poll_interval=0.01)
        (tmp_path / "in").mkdir()
        src = tmp_path / "in" / "m0.mrc"
        mrc.write(np.random.RandomState(1).randn(2, 128, 128).astype(
            np.float32), src, pixel_size=2.0)
        daemon.run(max_iterations=2, idle_exit=1)
        assert src.exists()                      # link keeps the source
        assert (tmp_path / "sess" / "m0.mrc").exists()
