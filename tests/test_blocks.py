"""UI-block parameter overrides (reference [tabs.csp_tomo_*] munging,
bin/run/pyp:5254-5420) + the optimizer knobs they drive."""

import numpy as np
import pytest

from pyp_tpu.config.blocks import (BLOCK_FIELDS, apply_block_overrides,
                                   block_mode_schedule)
from pyp_tpu.config.schema import all_params, defaults


class TestBlockOverrides:
    def test_every_block_tab_is_in_schema(self):
        ap = all_params()
        for tab, fields in BLOCK_FIELDS.items():
            for f in fields:
                assert f"{tab}_{f}" in ap, (tab, f)

    def test_coarse_block_maps_tolerances_and_modes(self):
        params = defaults()
        params.update({
            "csp_tomo_coarse_refine_micrographs": True,
            "csp_tomo_coarse_refine_particles": False,
            "csp_tomo_coarse_refine_ctf": True,
            "csp_tomo_coarse_ToleranceMicrographShifts": 42.0,
            "csp_tomo_coarse_maxiter": 3,
        })
        out = apply_block_overrides(params, "csp_tomo_coarse")
        assert out["csp_ToleranceMicrographShifts"] == 42.0
        assert out["refine_maxiter"] == 3
        # micrographs (3, 0) then ctf (4); no particle modes
        assert out["csp_refine_modes"] == "3:0:4"

    def test_movie_block_forces_frames(self):
        params = defaults()
        out = apply_block_overrides(params, "csp_tomo_movie")
        assert out["csp_frames"] is True
        assert out["csp_time_sigma"] == 21

    def test_classification_block_schedule_and_focusmask(self):
        params = defaults()
        params.update({
            "csp_tomo_classification_num": 4,
            "csp_tomo_classification_focusmask": "1,2,3,10",
            "csp_tomo_classification_refineeulers": 2,
            "csp_tomo_classification_refineshifts": 1,
        })
        out = apply_block_overrides(params, "csp_tomo_classification")
        assert out["class_num"] == 4
        assert out["class_focusmask"] == "1,2,3,10"
        assert out["csp_refine_modes"] == "2:1:1"

    def test_powell_units_rescale(self):
        """Reference Powell defaults (5 iters, step 20.0) land on the
        engine defaults (20 gradient steps, lr 0.3)."""
        params = defaults()
        out = apply_block_overrides(params, "csp_tomo_coarse")
        assert out["csp_OptimizerIters"] == 20
        assert abs(out["csp_OptimizerStepLength"] - 0.3) < 1e-9

    def test_unknown_block_rejected(self):
        with pytest.raises(ValueError):
            apply_block_overrides({}, "csp_tomo_nope")

    def test_mode_schedule_builder(self):
        assert block_mode_schedule(True, True, True) == "3:0:2:1:4"
        assert block_mode_schedule(False, True, False) == "2:1"
        assert block_mode_schedule(False, False, False) == "2:1"


class TestOptimizerKnobs:
    def test_random_iterations_extend_offsets(self):
        from pyp_tpu.ops.csp import make_mode_offsets

        base = make_mode_offsets(2, 10.0, steps=5)
        ext = make_mode_offsets(2, 10.0, steps=5, random_iters=17)
        assert len(ext) == len(base) + 17
        # random shift candidates stay inside the tolerance disk
        assert (np.linalg.norm(ext[len(base):], axis=1) <= 10.0 + 1e-4).all()
        # deterministic (resume safety)
        ext2 = make_mode_offsets(2, 10.0, steps=5, random_iters=17)
        np.testing.assert_array_equal(ext, ext2)

    def test_step_spacing_controls_grid_density(self):
        from pyp_tpu.ops.csp import build_mode_offsets

        tols = {3: 20.0}
        coarse, _ = build_mode_offsets((3,), tols, grid_steps=9,
                                       shift_step=10.0)
        fine, _ = build_mode_offsets((3,), tols, grid_steps=9,
                                     shift_step=2.0)
        assert len(fine[0]) > len(coarse[0])

    def test_value_tolerance_freezes_updates(self):
        """With an absurdly large value tolerance every step after the
        first counts as stalled — the refined params barely move, while
        the tolerance-free run moves them."""
        from pyp_tpu.ops import csp as csp_ops
        from tests.test_csp import (NBOX, PIXEL, make_reference,
                                    make_tilt_series)

        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, noise=0.02)
        # perturb particle positions so mode 2 has work to do
        rng = np.random.RandomState(5)
        cp0 = true._replace(particle_pos=true.particle_pos + rng.uniform(
            -2, 2, np.asarray(true.particle_pos).shape).astype(np.float32))

        def run(**kw):
            out = csp_ops.csp_refine(
                cp0, images, defocus, vol, PIXEL, NBOX, modes=(2,),
                iters_per_mode=8, **kw)
            return np.asarray(out[0].particle_pos)

        frozen = run(value_tol=1e9)
        free = run()
        move_frozen = np.abs(frozen - np.asarray(cp0.particle_pos)).max()
        move_free = np.abs(free - np.asarray(cp0.particle_pos)).max()
        assert move_frozen < 0.6 * move_free + 1e-6, (move_frozen, move_free)
