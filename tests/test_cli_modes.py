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
