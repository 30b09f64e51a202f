"""End-to-end CSPT pipeline test: refine a perturbed tilt-series and verify
the subtomogram-average reconstruction correlates with the reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.config.params import defaults
from pyp_tpu.io.metadata import ItemMetadata
from pyp_tpu.pipeline import csp as csp_pipe
from tests.test_csp import make_reference, make_tilt_series, NBOX, PIXEL, T, P


@pytest.mark.slow
class TestCspPipeline:
    def test_swarm_and_merge(self, tmp_path):
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, noise=0.08)

        # metadata bundle as tomo preprocessing would leave it
        meta = ItemMetadata("ts1", tmp_path, mode="tomo")
        meta["tlt"] = np.asarray(true.tilt_angles)
        meta["xf"] = np.concatenate([
            np.asarray(true.tilt_shifts) + np.random.RandomState(0).uniform(-1.5, 1.5, (T, 2)),
            np.full((T, 1), 2.0),
        ], axis=1).astype(np.float32)
        meta["ctf"] = np.concatenate([
            np.asarray(defocus),
            np.zeros((T, 3), dtype=np.float32),
        ], axis=1)
        meta.save()

        params = defaults()
        params.update({
            "scope_pixel": PIXEL, "csp_box": NBOX, "csp_rlref": 60.0,
            "csp_rhref": "5", "csp_OptimizerIters": 15, "csp_transreg": 0.0,
            "csp_refine_modes": "3:1",
        })
        item = {
            "name": "ts1",
            "tilts": np.asarray(images),
            "coords": np.asarray(true.particle_pos),
            "eulers": np.asarray(true.particle_eulers) + np.random.RandomState(1).uniform(-4, 4, (P, 3)),
        }
        refined, acc, scores = csp_pipe.csp_swarm_one(
            item, params, vol, tmp_path, iteration=2,
        )
        assert scores[-1] > scores[0] - 1e-3, scores

        out, res = csp_pipe.csp_merge([acc], NBOX, params, tmp_path, "t")
        assert out.volume.shape == (NBOX, NBOX, NBOX)
        # subtomogram average should correlate with the reference volume
        a = np.asarray(out.volume).ravel()
        b = np.asarray(vol).ravel()
        cc = np.corrcoef(a, b)[0, 1]
        assert cc > 0.5, cc
        # refined geometry persisted for resume
        meta2 = ItemMetadata("ts1", tmp_path, mode="tomo").load()
        assert meta2["xf"].shape == (T, 3)


@pytest.mark.slow
class TestCspClassify:
    def test_two_state_subtomogram_classification(self):
        from pyp_tpu.pipeline.csp import csp_classify
        from pyp_tpu.config.params import defaults

        volA = make_reference(seed=0)
        volB = make_reference(seed=55)
        trueA, imagesA, defocusA = make_tilt_series(volA, seed=1, noise=0.08)
        trueB, imagesB, defocusB = make_tilt_series(volB, seed=2, noise=0.08)
        params = defaults()
        params.update({"scope_pixel": PIXEL, "csp_box": NBOX,
                       "csp_rlref": 60.0, "csp_rhref": "5"})
        items = [
            {"name": "a", "tilts": np.asarray(imagesA), "params": trueA,
             "defocus": np.asarray(defocusA)},
            {"name": "b", "tilts": np.asarray(imagesB), "params": trueB,
             "defocus": np.asarray(defocusB)},
        ]
        outs, occs, resolutions = csp_classify(items, params, [volA, volB])
        assert len(outs) == 2 and len(occs) == 2
        # particles from series A should prefer class 0, series B class 1
        prefA = (occs[0][:, 0] > occs[0][:, 1]).mean()
        prefB = (occs[1][:, 1] > occs[1][:, 0]).mean()
        assert prefA > 0.8, occs[0]
        assert prefB > 0.8, occs[1]
        # class maps correlate with their own state
        ccAA = np.corrcoef(np.asarray(outs[0].volume).ravel(), volA.ravel())[0, 1]
        ccBB = np.corrcoef(np.asarray(outs[1].volume).ravel(), volB.ravel())[0, 1]
        ccAB = np.corrcoef(np.asarray(outs[0].volume).ravel(), volB.ravel())[0, 1]
        assert ccAA > ccAB, (ccAA, ccAB)
        assert ccBB > 0.3
