"""3D classification test: particles from two distinct volumes must separate
into two classes whose maps match their own volume better than the other."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.config.params import defaults
from pyp_tpu.io import cistem
from pyp_tpu.pipeline import classify3d
from tests.test_refine3d import make_particles, make_volume, N, PIXEL


@pytest.mark.slow
class TestClassify3D:
    def test_two_state_separation(self, tmp_path):
        volA = make_volume(seed=0)
        volB = make_volume(seed=99)
        imgsA, cpA, truthA = make_particles(volA, n_particles=24, noise=0.1, seed=1)
        imgsB, cpB, truthB = make_particles(volB, n_particles=24, noise=0.1, seed=2)
        stack = np.concatenate([np.asarray(imgsA), np.asarray(imgsB)])
        ctf = np.concatenate([np.asarray(cpA), np.asarray(cpB)])
        labels = np.array([0] * 24 + [1] * 24)

        B = len(stack)
        table = cistem.Table.zeros(B)
        table["position_in_stack"] = np.arange(1, B + 1)
        table["pixel_size"] = np.full(B, PIXEL)
        table["defocus_1"] = ctf[:, 0]
        table["defocus_2"] = ctf[:, 1]
        table["defocus_angle"] = ctf[:, 2]
        table["occupancy"] = np.full(B, 100.0)
        table["assigned_subset"] = np.arange(B) % 2 + 1
        # consensus-quality poses: angles true; shifts at the correct
        # pose convention (centering translation = -content offset) —
        # classification starts from a good consensus, and round-0 shift
        # marginalization re-estimates within its +/-6 px extent
        table["phi"] = np.concatenate([truthA["phi"], truthB["phi"]])
        table["theta"] = np.concatenate([truthA["theta"], truthB["theta"]])
        table["psi"] = np.concatenate([truthA["psi"], truthB["psi"]])
        table["y_shift"] = -np.concatenate([truthA["shifts"][:, 0], truthB["shifts"][:, 0]]) * PIXEL
        table["x_shift"] = -np.concatenate([truthA["shifts"][:, 1], truthB["shifts"][:, 1]]) * PIXEL

        params = defaults()
        params.update({
            "scope_pixel": PIXEL, "class_num": 2, "refine_maxiter": 3,
            "refine_iter": 2, "refine_rhref": "6", "class_rhcls": 6.0,
            "refine_local_iters": 6, "particle_sym": "C1",
        })
        # consensus start: average of the two volumes
        consensus = 0.5 * (volA + volB)
        table, refs, occ, history = classify3d.classify3d_loop(
            stack, table, consensus, params, tmp_path, "cls")

        assign = np.asarray(table["best_2d_class"]) - 1
        # purity up to label permutation
        agree = (assign == labels).mean()
        purity = max(agree, 1 - agree)
        assert purity > 0.8, (purity, assign)

        # each class map matches its own volume better than the other's
        k0 = int(round(1 - agree))  # class index matching volA
        ccs = np.zeros((2, 2))
        for k in range(2):
            for vi, v in enumerate((volA, volB)):
                ccs[k, vi] = np.corrcoef(refs[k].ravel(), v.ravel())[0, 1]
        matched = ccs[k0, 0] + ccs[1 - k0, 1]
        crossed = ccs[k0, 1] + ccs[1 - k0, 0]
        assert matched > crossed, ccs
        # per-class maps written
        assert (tmp_path / "maps" / "cls_r01_04.mrc").exists()
