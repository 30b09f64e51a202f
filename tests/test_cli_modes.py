"""CLI completeness: gain / stream / kselection / classify3d modes
(reference driver branches in bin/run/pyp: gain estimation, streampyp
session daemon, kselection class filtering, 3D classification)."""

import json

import numpy as np
import pytest

from pyp_tpu.io import cistem, mrc


@pytest.fixture()
def project(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _write_stack_and_table(n_particles=16, box=32, seed=0):
    rng = np.random.RandomState(seed)
    mrc.write(rng.randn(n_particles, box, box).astype(np.float32), "stack.mrc")
    t = cistem.Table.zeros(n_particles)
    t["pixel_size"] = np.full(n_particles, 1.0)
    t["defocus_1"] = np.full(n_particles, 15000.0)
    t["defocus_2"] = np.full(n_particles, 14000.0)
    t["best_2d_class"] = np.tile(np.arange(1, 5), n_particles // 4).astype(np.int64)
    cistem.write_parameters(t, "stack.cistem")
    return t


def test_mode_gain(project, capsys):
    from pyp_tpu.cli import main

    rng = np.random.RandomState(1)
    for i in range(3):
        mrc.write((1.0 + 0.1 * rng.rand(4, 48, 48)).astype(np.float32),
                  f"mov{i}.mrc")
    assert main(["gain", "-data_path", "mov*.mrc", "-gain_movies", "2"]) == 0
    gain = mrc.read("gain.mrc")
    assert gain.shape == (48, 48)
    # flat-field estimate: unit mean, strictly positive
    np.testing.assert_allclose(1.0 / np.mean(1.0 / gain), 1.0, rtol=0.05)
    assert (gain > 0).all()


def test_mode_kselection(project, capsys):
    from pyp_tpu.cli import main

    _write_stack_and_table()
    assert main(["kselection", "-keep_classes", "1,3"]) == 0
    t = cistem.read_parameters("stack.cistem")
    active = np.asarray(t["image_is_active"]).astype(bool)
    cls = np.asarray(t["best_2d_class"]).astype(int)
    assert active.sum() == 8
    assert set(cls[active]) == {1, 3}
    # without -keep_classes and no persisted value -> usage error
    import os

    os.remove(".pyp_tpu_config.toml")
    assert main(["kselection"]) == 1


def test_mode_clean_discard_and_export(project, capsys):
    """clean -clean_particles with the reference's clean-tab knobs:
    clean_discard permanently drops rows, clean_export_clean writes the
    surviving coordinates (tabs.clean.discard/export_clean,
    pyp_config.toml:10620-10640)."""
    import os

    from pyp_tpu.cli import main

    t = _write_stack_and_table(n_particles=20)
    t["score"] = np.array([5.0] * 10 + [25.0] * 10)
    t["occupancy"] = np.full(20, 100.0)
    t["image_is_active"] = np.ones(20, dtype=np.int64)
    t["original_x_position"] = np.arange(20, dtype=np.float64)
    t["original_y_position"] = np.arange(20, dtype=np.float64) * 2
    cistem.write_parameters(t, "stack.cistem")
    assert main(["clean", "-clean_particles", "-clean_mode", "fixed",
                 "-clean_min_score", "15", "-clean_discard",
                 "-clean_export_clean"]) == 0
    t2 = cistem.read_parameters("stack.cistem")
    assert t2.n_rows == 10                       # discard removed the junk
    assert (np.asarray(t2["score"]) >= 15).all()
    coords = np.loadtxt("frealign/selected_particles/clean.spk")
    assert coords.shape[0] == 10


def test_mode_clean_spr_auto(project, capsys):
    """clean_spr_auto: automatic bimodal threshold needs no user cutoff
    (tabs.clean.spr_auto)."""
    from pyp_tpu.cli import main

    t = _write_stack_and_table(n_particles=40)
    rng = np.random.RandomState(3)
    t["score"] = np.concatenate([rng.normal(5, 1, 20), rng.normal(25, 1, 20)])
    t["occupancy"] = np.full(40, 100.0)
    t["image_is_active"] = np.ones(40, dtype=np.int64)
    cistem.write_parameters(t, "stack.cistem")
    assert main(["clean", "-clean_particles", "-clean_spr_auto"]) == 0
    t2 = cistem.read_parameters("stack.cistem")
    active = np.asarray(t2["image_is_active"]).astype(bool)
    assert active[20:].all() and not active[:20].any()


def test_mode_fsc(project, capsys):
    """Standalone FSC utility (reference pyp_fsc.py role): map pairs ->
    curves + resolutions, optional mask correction."""
    from pathlib import Path

    from pyp_tpu.cli import main

    rng = np.random.RandomState(0)
    base = rng.randn(32, 32, 32).astype(np.float32)
    h1 = base + 0.3 * rng.randn(32, 32, 32).astype(np.float32)
    h2 = base + 0.3 * rng.randn(32, 32, 32).astype(np.float32)
    mrc.write(h1, "h1.mrc", pixel_size=1.5)
    mrc.write(h2, "h2.mrc", pixel_size=1.5)
    assert main(["fsc", "h1.mrc", "h2.mrc"]) == 0
    assert Path("fsc.txt").exists() and Path("fsc.png").exists()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pairs"][0]["res_0.143_A"] >= 3.0   # Nyquist 3 A at 1.5 A/px
    # identical halves -> FSC == 1 everywhere
    assert main(["fsc", "h1.mrc", "h1.mrc", "-fsc_out", "self"]) == 0
    txt = np.loadtxt("self.txt")
    np.testing.assert_allclose(txt[:, 1], 1.0, atol=1e-3)
    # odd map count -> usage error
    assert main(["fsc", "h1.mrc"]) == 1


def test_mode_stream_bounded(project, capsys):
    from pyp_tpu.cli import main

    rng = np.random.RandomState(2)
    for i in range(2):
        mrc.write(rng.randn(3, 64, 64).astype(np.float32), f"s{i}.mrc")
    rc = main(["stream", "-data_path", "s*.mrc", "-stream_max_iterations", "2",
               "-stream_poll_interval", "0.05", "-scope_pixel", "1.0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"processed": 2' in out


@pytest.mark.slow
def test_mode_classify3d(project):
    from pyp_tpu.cli import main

    _write_stack_and_table()
    rng = np.random.RandomState(3)
    mrc.write(rng.randn(32, 32, 32).astype(np.float32), "initial_model.mrc")
    rc = main(["classify3d", "-class_num", "2", "-refine_maxiter", "2",
               "-scope_pixel", "1.0", "-refine_rhref", "8"])
    assert rc == 0
    from pathlib import Path

    assert len(list(Path("maps").glob("*_r0?_0?.mrc"))) >= 4


def test_mode_byp_roundtrip(project):
    from pyp_tpu.cli import main
    from pyp_tpu.io import imod

    pts = (np.random.RandomState(0).rand(10, 3) * [256, 256, 1]).astype(
        np.float32)
    imod.write_point_model("picks.mod", pts)
    assert main(["byp", "picks.mod", "-extract_box", "64"]) == 0
    from pyp_tpu.io import boxfiles

    coords_yx, boxsize = boxfiles.read_box("picks.box")
    assert len(coords_yx) == 10 and boxsize == 64
    np.testing.assert_allclose(np.asarray(coords_yx)[:, 1], pts[:, 0],
                               atol=1.0)  # x column
    assert main(["byp", "picks.box"]) == 0
    back = imod.read_points("picks.mod")
    np.testing.assert_allclose(back[:, 0], pts[:, 0], atol=1.0)


def test_mode_byp_cbox_roundtrip(project):
    """crYOLO .cbox interop (reference pyp_convert_coord cryolo2mod /
    mod2cryolo): scaling + z re-centering round-trips exactly."""
    from pyp_tpu.cli import main
    from pyp_tpu.io import boxfiles, imod

    pts = (np.random.RandomState(0).rand(12, 3)
           * [512, 512, 256]).astype(np.float64)
    imod.write_point_model("picks.mod", pts)
    assert main(["byp", "picks.mod", "-to_cbox", "-extract_box", "32",
                 "-convert_scaling", "2", "-convert_z", "256"]) == 0
    centers, size, conf = boxfiles.read_cbox("picks.cbox")
    assert size == 64.0 and len(centers) == 12
    assert main(["byp", "picks.cbox", "-convert_scaling", "2",
                 "-convert_z", "256"]) == 0
    back = imod.read_points("picks.mod")
    np.testing.assert_allclose(back[:, :3], pts, atol=0.2)


class TestAuxSubsystems:
    def test_history_and_profile_and_free_space(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli

        rc = cli.main(["clean", "-profile"])
        assert rc == 0
        hist = (tmp_path / ".pyp_history").read_text()
        assert "clean" in hist
        assert (tmp_path / "profile_clean.prof").exists()

    def test_refine_loop_wait_file_pauses(self, tmp_path, monkeypatch):
        """The wait file must hold refine_loop between iterations and
        release when removed (frealign.py:1425 parity)."""
        import threading
        import time
        from types import SimpleNamespace

        import numpy as np

        from pyp_tpu.io import cistem
        from pyp_tpu.pipeline import refine as ref_pipe

        n = 8
        table = cistem.Table.zeros(4)
        table["pixel_size"] = np.full(4, 1.0)
        vol = np.zeros((n, n, n), np.float32)
        recon = SimpleNamespace(
            volume=vol, half1=vol, half2=vol,
            fsc=np.ones(n // 2, np.float32),
            freqs=np.linspace(0, 0.5, n // 2).astype(np.float32))
        monkeypatch.setattr(
            ref_pipe, "refinement_iteration",
            lambda stack, t, ref, params, it, **kw: (t, recon, 10.0))
        params = {"refine_maxiter": 1, "refine_iter": 2, "scope_pixel": 1.0}
        maps_dir = tmp_path / "maps"
        maps_dir.mkdir()
        (maps_dir / "wait").touch()

        def release():
            time.sleep(1.2)
            (maps_dir / "wait").unlink()

        th = threading.Thread(target=release)
        th.start()
        t0 = time.perf_counter()
        ref_pipe.refine_loop(
            np.zeros((4, n, n), np.float32), table, vol, params,
            work_dir=tmp_path, dataset="w")
        elapsed = time.perf_counter() - t0
        th.join()
        assert elapsed >= 1.0, elapsed


class TestMineMode:
    def test_mine_writes_gallery_and_spk(self, tmp_path, monkeypatch):
        import jax.numpy as jnp

        from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
        from pyp_tpu.io import boxfiles, mrc

        monkeypatch.chdir(tmp_path)
        rng = np.random.RandomState(0)
        p = 16
        v = rng.randn(p, p, p).astype(np.float32)
        v *= np.asarray(soft_spherical_mask(p, p * 0.35, 2.0))
        v = np.array(lowpass_filter_3d(jnp.asarray(v), 1.0, 4.0)) * 8.0
        tomo = rng.randn(40, 80, 80).astype(np.float32) * 0.3
        for _ in range(10):
            z0, y0, x0 = rng.randint(0, 24), rng.randint(0, 64), rng.randint(0, 64)
            tomo[z0:z0 + p, y0:y0 + p, x0:x0 + p] += v
        mrc.write(tomo, "ts1.rec.mrc", pixel_size=10.0)

        from pyp_tpu import cli

        rc = cli.main(["mine", "-mine_steps", "30", "-mine_clusters", "3"])
        assert rc == 0
        gallery = json.loads((tmp_path / "mine_gallery.json").read_text())
        assert "ts1" in gallery and len(gallery["ts1"]) == 3
        spks = list(tmp_path.glob("ts1_cluster*.spk"))
        assert spks
        coords = boxfiles.read_spk(spks[0])
        assert coords.shape[1] == 3


class TestEditTrainMaskModes:
    """Round-3 CLI breadth: mask / tomoedit / boxedit / sprtrain / tomotrain
    (reference driver branches bin/run/pyp:6640, :3526, :3612, :4801)."""

    def test_mode_mask_sphere_and_auto(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli
        from pyp_tpu.io import mrc

        rng = np.random.RandomState(0)
        vol = np.zeros((32, 32, 32), np.float32)
        vol[12:20, 12:20, 12:20] = 5.0
        vol += rng.randn(32, 32, 32).astype(np.float32) * 0.1
        mrc.write(vol, "model.mrc")
        rc = cli.main(["mask", "-model_path", "model.mrc", "-data_set", "d",
                       "-mask_method", "sphere", "-mask_radius", "8"])
        assert rc == 0
        m = mrc.read("d_mask.mrc")
        assert m.shape == (32, 32, 32)
        assert m[16, 16, 16] > 0.9 and m[2, 2, 2] < 0.05
        rc = cli.main(["mask", "-model_path", "model.mrc", "-data_set", "d2",
                       "-mask_method", "auto", "-mask_lowpass", "8"])
        assert rc == 0
        m2 = mrc.read("d2_mask.mrc")
        assert m2[16, 16, 16] > 0.5 and m2[2, 2, 2] < 0.2

    def test_mode_tomoedit_excludes_tilts(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli
        from pyp_tpu.io.metadata import ItemMetadata

        meta = ItemMetadata("TS_x", ".", mode="tomo").load()
        meta["tlt"] = np.linspace(-30, 30, 7).astype(np.float32)
        meta["ctf"] = np.arange(7 * 6, dtype=np.float32).reshape(7, 6)
        meta.save()
        rc = cli.main(["tomoedit", "-edit_name", "TS_x",
                       "-edit_exclude_tilts", "0:3"])
        assert rc == 0
        m2 = ItemMetadata("TS_x", ".", mode="tomo").load()
        assert len(np.asarray(m2["tlt"]).reshape(-1)) == 5
        assert np.asarray(m2["ctf"]).shape == (5, 6)

    def test_mode_boxedit_remove_and_import(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli
        from pyp_tpu.io.metadata import ItemMetadata

        meta = ItemMetadata("m1", ".", mode="spr").load()
        meta["box"] = np.array([[10.0, 10.0, 1.0], [40.0, 40.0, 0.2],
                                [12.0, 11.0, 0.9]], dtype=np.float32)
        meta.save()
        rc = cli.main(["boxedit", "-edit_name", "m1",
                       "-edit_remove_circle", "11:11:5"])
        assert rc == 0
        m2 = ItemMetadata("m1", ".", mode="spr").load()
        assert len(m2["box"]) == 1 and m2["box"][0][0] == 40.0
        # import replaces picks from a .box file
        (tmp_path / "new.box").write_text("4\t6\t8\t8\n20\t30\t8\t8\n")
        rc = cli.main(["boxedit", "-edit_name", "m1",
                       "-edit_import_box", "new.box"])
        assert rc == 0
        m3 = ItemMetadata("m1", ".", mode="spr").load()
        assert len(m3["box"]) == 2
        np.testing.assert_allclose(m3["box"][0][:2], [10.0, 8.0])  # y, x

    def test_mode_sprtrain_then_nn_pick(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli
        from pyp_tpu.io.metadata import ItemMetadata

        rng = np.random.RandomState(0)
        yy, xx = np.mgrid[:96, :96]
        avg = rng.randn(96, 96).astype(np.float32) * 0.1
        picks = [(24, 24), (24, 72), (72, 24), (72, 72)]
        for cy, cx in picks:
            avg -= 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 12.0)
        meta = ItemMetadata("t1", ".", mode="spr").load()
        meta["average"] = avg
        meta["box"] = np.array([[cy, cx, 1.0] for cy, cx in picks],
                               dtype=np.float32)
        meta.save()
        rc = cli.main(["sprtrain", "-detect_rad", "4", "-scope_pixel", "1",
                       "-train_steps", "60", "-train_patch", "64",
                       "-train_batch", "8"])
        assert rc == 0
        assert (tmp_path / "picker_model.npz").exists()

    def test_mode_tomotrain(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli
        from pyp_tpu.io import mrc

        rng = np.random.RandomState(1)
        vol = rng.randn(8, 64, 64).astype(np.float32) * 0.1
        zz = 4
        for cy, cx in ((20, 20), (44, 44)):
            yy, xx = np.mgrid[:64, :64]
            vol[zz] -= 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 10.0)
        mrc.write(vol, "TS_t.rec.mrc")
        # .spk rows are (x, y, z)
        (tmp_path / "TS_t.spk").write_text("20 20 4\n44 44 4\n")
        rc = cli.main(["tomotrain", "-tomo_spk_rad", "24",
                       "-tomo_rec_binning", "8", "-scope_pixel", "1",
                       "-train_steps", "40", "-train_patch", "64",
                       "-train_batch", "8"])
        assert rc == 0
        assert (tmp_path / "picker_model_tomo.npz").exists()


class TestExportSession:
    def test_session_to_relion_star(self, tmp_path, monkeypatch):
        """export_session (the reference's pex driver): session metadata ->
        relion micrographs star + autopick coordinate stars."""
        import numpy as np

        from pyp_tpu import cli
        from pyp_tpu.io import star
        from pyp_tpu.io.metadata import ItemMetadata

        session = tmp_path / "sess"
        session.mkdir()
        for i, name in enumerate(["m0", "m1"]):
            meta = ItemMetadata(name, session, mode="spr").load()
            meta["ctf"] = np.array([21000.0 + i, 20000.0 + i, 45.0, 0.0,
                                    0.8, 4.5])
            meta["box"] = np.array([[100.0, 120.0, 1.0],
                                    [200.0, 220.0, 0.9]])
            meta.save()
        from pyp_tpu.config import params as pcfg

        pcfg.save_parameters({"data_set": "sess", "scope_pixel": 1.1,
                              "scope_voltage": 300.0, "scope_cs": 2.7,
                              "scope_wgh": 0.07}, session)

        export = tmp_path / "export"
        export.mkdir()
        monkeypatch.chdir(export)
        (export / "sel.micrographs").write_text("m1\n")
        rc = cli.main(["export_session", "-data_parent", str(session)])
        assert rc == 0
        blocks = star.read("relion/sess_micrographs.star")
        loop = blocks["micrographs"]["loop"]
        assert list(loop["rlnMicrographName"]) == ["m1.mrc"]
        assert float(np.asarray(loop["rlnDefocusU"])[0]) == 21001.0
        coords = star.read("relion/m1_autopick.star")
        cl = next(iter(coords.values()))["loop"]
        assert len(np.asarray(cl["rlnCoordinateX"])) == 2
        assert float(np.asarray(cl["rlnCoordinateX"])[0]) == 120.0
