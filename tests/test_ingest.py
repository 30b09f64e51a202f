"""Raw-data ingestion: EER/DM4 movie dispatch and mdoc-driven tilt-series
assembly from per-tilt movies (reference readMoviefileandsave
inout/image/core.py:913 and read_tilt_series preprocess/core.py:176)."""

import numpy as np

from pyp_tpu.pipeline.spr import load_movie


def _sparse_counts(rng, n, frames, density=0.01):
    stack = (rng.rand(frames, n, n) < density).astype(np.uint16)
    return stack


class TestMovieDispatch:
    def test_eer_file_roundtrip_through_load_movie(self, tmp_path):
        from pyp_tpu.io import eer

        rng = np.random.RandomState(0)
        counts = _sparse_counts(rng, 64, 8)
        path = tmp_path / "movie.eer"
        eer.write(path, counts)
        # direct read preserves every event
        back = eer.read(path)
        np.testing.assert_array_equal(back, counts)
        # pipeline dispatch groups frames (fractionation)
        frames = load_movie(path, {"movie_eer_frames": 4})
        assert frames.shape == (4, 64, 64)
        np.testing.assert_allclose(frames.sum(), counts.sum())

    def test_dm4_through_load_movie(self, tmp_path):
        from pyp_tpu.io import dm

        rng = np.random.RandomState(1)
        data = rng.randn(48, 48).astype(np.float32)
        path = tmp_path / "image.dm4"
        dm.write_dm4(data, path)
        frames = load_movie(path)
        assert frames.shape == (1, 48, 48)
        np.testing.assert_allclose(frames[0], data, rtol=1e-6)

    def test_tiff_and_mrc_still_dispatch(self, tmp_path):
        from pyp_tpu.io import mrc, tiff

        rng = np.random.RandomState(2)
        data = rng.randn(3, 32, 32).astype(np.float32)
        mrc.write(data, tmp_path / "m.mrc")
        np.testing.assert_allclose(load_movie(tmp_path / "m.mrc"), data,
                                   rtol=1e-6)
        tiff.write((data * 100 + 500).astype(np.uint16), tmp_path / "m.tif")
        assert load_movie(tmp_path / "m.tif").shape == (3, 32, 32)


def _write_mdoc_dataset(tmp_path, rng, n=96, frames=3):
    """Per-tilt TIFF movies + .mdoc in dose-symmetric acquisition order."""
    from pyp_tpu.io import tiff

    acq_angles = [0.0, 20.0, -20.0, 40.0, -40.0]
    base = np.zeros((n, n), dtype=np.float32)
    yy, xx = np.meshgrid(np.arange(n) - n // 2, np.arange(n) - n // 2,
                         indexing="ij")
    for cy, cx in [(-20, 10), (15, -8), (5, 25)]:
        base += 30.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 30.0)
    lines = ["PixelSpacing = 2.0", ""]
    for z, ang in enumerate(acq_angles):
        stretch = np.cos(np.radians(ang))
        img = base.copy()
        img[:, :] = np.interp(
            (xx[0] / max(stretch, 1e-3)),
            xx[0], base.mean(axis=0),
        )[None, :] + base * stretch
        movie = np.stack([
            img + 2.0 * rng.randn(n, n) for _ in range(frames)
        ]).astype(np.float32)
        fname = f"tilt_{z:03d}.tif"
        tiff.write((movie * 10 + 1000).astype(np.uint16), tmp_path / fname)
        lines += [
            f"[ZValue = {z}]",
            f"TiltAngle = {ang}",
            "ExposureDose = 3.0",
            f"SubFramePath = X:\\data\\{fname}",
            "",
        ]
    (tmp_path / "series1.mrc.mdoc").write_text("\n".join(lines))
    return acq_angles


class TestMdocAssembly:
    def test_assembles_sorted_with_cumulative_dose(self, tmp_path):
        from pyp_tpu.pipeline.tomo import assemble_tilt_series

        rng = np.random.RandomState(3)
        _write_mdoc_dataset(tmp_path, rng)
        params = {"scope_pixel": 2.0, "movie_iters": 3}
        item = assemble_tilt_series(tmp_path / "series1.mrc.mdoc", params)
        assert item["name"] == "series1"
        np.testing.assert_allclose(item["angles"], [-40, -20, 0, 20, 40])
        assert item["tilts"].shape == (5, 96, 96)
        # cumulative dose follows acquisition order: -40 was acquired last
        np.testing.assert_allclose(item["doses"], [15.0, 9.0, 3.0, 6.0, 12.0])
        np.testing.assert_array_equal(item["order"], [4, 2, 0, 1, 3])

    def test_cli_tomo_runs_from_mdoc(self, tmp_path, monkeypatch):
        from pyp_tpu import cli

        rng = np.random.RandomState(4)
        _write_mdoc_dataset(tmp_path, rng)
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "tomo", "-data_path", str(tmp_path / "*.mdoc"),
            "-scope_pixel", "2.0", "-tomo_ali_patches", "0",
            "-tomo_ali_bin", "1", "-tomo_rec_thickness", "48",
            "-tomo_rec_binning", "2", "-tomo_rec_dose_weighting",
            "-ctf_max_res", "10", "-tomo_spk_method", "none",
            "-movie_iters", "3",
        ])
        assert rc == 0
        assert (tmp_path / "series1.rec.mrc").exists()
