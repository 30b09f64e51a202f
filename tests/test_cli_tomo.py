"""End-to-end TOMO CLI test: tilt-series MRC + .tlt on disk -> `tomo` mode
-> alignment, per-tilt CTF, WBP tomogram, metadata; then `csp` mode runs on
the result."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu import cli
from pyp_tpu.io import mrc
from pyp_tpu.io.metadata import ItemMetadata


@pytest.mark.slow
class TestTomoCli:
    def test_tomo_then_csp(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from tests.test_csp import make_reference, make_tilt_series, NBOX, PIXEL

        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, noise=0.08)
        tilts = np.asarray(images)
        mrc.write(tilts, "ts01.mrc", pixel_size=PIXEL)
        np.savetxt("ts01.tlt", np.asarray(true.tilt_angles))

        rc = cli.main([
            "tomo", "-data_path", str(tmp_path / "ts01.mrc"),
            "-scope_pixel", str(PIXEL), "-tomo_ali_bin", "1",
            "-tomo_ali_patches", "0", "-tomo_rec_binning", "1",
            "-tomo_rec_thickness", "64", "-ctf_min_def", "8000",
            "-ctf_max_def", "25000", "-ctf_tile", "128",
            "-tomo_spk_method", "none",
        ])
        assert rc == 0
        meta = ItemMetadata("ts01", ".", mode="tomo").load()
        assert "tlt" in meta and "xf" in meta and "ctf" in meta
        assert Path("ts01.rec.mrc").exists()
        rec = mrc.read("ts01.rec.mrc")
        assert rec.ndim == 3 and np.isfinite(rec).all()

        # per-tilt CTF fits are within the search bounds (accuracy on real
        # spectra is covered by tests/test_ctf_fit.py; these 160-px synthetic
        # tilts have too little signal area for tight tolerances)
        assert np.isfinite(meta["ctf"]).all()
        assert (meta["ctf"][:, 0] >= 8000).all() and (meta["ctf"][:, 0] <= 25000).all()

        # ---- csp mode on top: plant picks + reference --------------------
        meta["box"] = np.asarray(true.particle_pos) + np.array(
            [32.0, tilts.shape[-2] / 2, tilts.shape[-1] / 2]
        )  # tomogram-frame coords at binning 1 (thickness 64 -> center 32)
        meta.scalars["binning"] = 1
        meta.save()
        mrc.write(vol, "initial_model.mrc", pixel_size=PIXEL)
        rc = cli.main([
            "csp", "-data_path", str(tmp_path / "ts01.mrc"),
            "-csp_box", str(NBOX), "-csp_OptimizerIters", "5",
            "-csp_rhref", "5", "-tomo_rec_thickness", "64",
        ])
        assert rc == 0
        assert list(Path("maps").glob("*_csp_*.mrc")), "csp merge wrote no maps"
        # ArtiaX ministar written per series (reference generate_ministar)
        from pyp_tpu.io.relion_tomo import import_artiax_star

        stars = list(Path("artiax").glob("*_K1.star"))
        assert stars, "csp wrote no ArtiaX ministar"
        ax = import_artiax_star(stars[0])
        assert len(ax["_rlnCoordinateX"]) == len(meta["box"])
        assert np.isfinite(ax["_rlnLogLikeliContribution"]).all()
        # per-particle scores persisted for cleaning/filtering
        meta_after = ItemMetadata("ts01", ".", mode="tomo").load()
        assert "csp_scores" in meta_after
        assert len(meta_after["csp_scores"]) == len(meta["box"])
