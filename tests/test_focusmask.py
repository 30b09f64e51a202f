"""Focused classification / focused refinement (cisTEM refine3d focus-mask
sphere + "apply 2D masking", reference stdin lines 29-32/44 built at
/root/reference/src/pyp/refine/frealign/frealign.py:3958, enabled by
class_focusmask in pyp_config.toml [tabs.class]).

The e2e test is the VERDICT-prescribed scenario: two classes differing ONLY
inside the focus sphere must separate with focused scoring and fail to
separate without it. The failure mechanism is the real one — per-class
reference maps carry reconstruction noise everywhere, which drowns the
small in-sphere signal unless scoring is restricted to the sphere."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi

from pyp_tpu.config.params import defaults
from pyp_tpu.io import cistem
from pyp_tpu.ops import refine3d as r3
from pyp_tpu.pipeline import classify3d
from tests.test_refine3d import N, PIXEL, make_particles, make_volume

FX, FY, FZ = 8.0, -5.0, 3.0   # focus sphere center, px from box center
FR = 4.0                      # sphere radius, px


class TestFocusMaskGeometry:
    def test_projected_mask_captures_blob(self):
        """A point feature at volume position p projects inside the 2D
        focus mask at ANY pose, including with nonzero centering shifts
        (raw content sits at projection minus the stored shift)."""
        n = 48
        vol = np.zeros((n, n, n), np.float32)
        vol[n // 2 + int(FZ), n // 2 + int(FY), n // 2 + int(FX)] = 1.0
        vol = ndi.gaussian_filter(vol, 1.5)
        poses = np.array([[33.0, 50.0, 120.0, 2.0, -3.0],
                          [210.0, 110.0, 15.0, -1.5, 2.5]], np.float32)

        from pyp_tpu.ops.fourier_slice import (fourier_to_image,
                                               image_to_fourier,
                                               project_real)
        from pyp_tpu.ops.reconstruct import _shift_correct

        img = np.asarray(project_real(
            vol, poses[:, 0], poses[:, 1], poses[:, 2]))
        # raw particle = centered content displaced by -shift
        X = image_to_fourier(jnp.asarray(img))
        raw = np.asarray(fourier_to_image(
            _shift_correct(X, -jnp.asarray(poses[:, 3:5]), n), n))
        m = np.asarray(r3.focus_mask_2d(
            poses, (FX, FY, FZ, 5.0), n, 1.0))
        frac = (raw ** 2 * m).sum(axis=(1, 2)) / (raw ** 2).sum(axis=(1, 2))
        assert (frac > 0.95).all(), frac

    def test_parse_focus_mask(self):
        assert r3.parse_focus_mask("") is None
        assert r3.parse_focus_mask(None) is None
        assert r3.parse_focus_mask("1,2,3,0") is None   # zero radius = off
        assert r3.parse_focus_mask("1,2,3,4") == (1.0, 2.0, 3.0, 4.0)
        assert r3.parse_focus_mask("1:2:3:4") == (1.0, 2.0, 3.0, 4.0)


def _two_state_problem(amp=0.25, noise=0.3, jitter_deg=3.0, ref_noise=2.0,
                       n_per=24):
    """Classes differ ONLY inside the focus sphere (a Gaussian blob);
    per-class references carry independent reconstruction-like noise."""
    from pyp_tpu.core.filters import lowpass_filter_3d

    base = make_volume(seed=0)
    blob = np.zeros((N, N, N), np.float32)
    blob[N // 2 + int(FZ), N // 2 + int(FY), N // 2 + int(FX)] = 1.0
    blob = ndi.gaussian_filter(blob, 1.8)
    blob *= amp * base.std() / blob.std()
    volA, volB = base, (base + blob).astype(np.float32)

    imgsA, cpA, tA = make_particles(volA, n_particles=n_per, noise=noise,
                                    seed=1)
    imgsB, cpB, tB = make_particles(volB, n_particles=n_per, noise=noise,
                                    seed=2)
    stack = np.concatenate([np.asarray(imgsA), np.asarray(imgsB)])
    ctf = np.concatenate([np.asarray(cpA), np.asarray(cpB)])
    labels = np.array([0] * n_per + [1] * n_per)
    B = len(stack)
    rng = np.random.RandomState(7)

    table = cistem.Table.zeros(B)
    table["position_in_stack"] = np.arange(1, B + 1)
    table["pixel_size"] = np.full(B, PIXEL)
    table["defocus_1"] = ctf[:, 0]
    table["defocus_2"] = ctf[:, 1]
    table["defocus_angle"] = ctf[:, 2]
    table["occupancy"] = np.full(B, 100.0)
    table["assigned_subset"] = np.arange(B) % 2 + 1
    table["phi"] = np.concatenate([tA["phi"], tB["phi"]]) + rng.normal(
        0, jitter_deg, B)
    table["theta"] = np.concatenate([tA["theta"], tB["theta"]]) + rng.normal(
        0, jitter_deg, B)
    table["psi"] = np.concatenate([tA["psi"], tB["psi"]]) + rng.normal(
        0, jitter_deg, B)
    table["y_shift"] = -np.concatenate(
        [tA["shifts"][:, 0], tB["shifts"][:, 0]]) * PIXEL
    table["x_shift"] = -np.concatenate(
        [tA["shifts"][:, 1], tB["shifts"][:, 1]]) * PIXEL

    rngr = np.random.RandomState(11)
    refs = []
    for v in (volA, volB):
        r = (v + rngr.normal(0, ref_noise * base.std(), v.shape)
             ).astype(np.float32)
        refs.append(np.asarray(lowpass_filter_3d(
            jnp.asarray(r), PIXEL, 3.0 * PIXEL)))
    return stack, ctf, table, refs, labels


@pytest.mark.slow
class TestFocusedClassification:
    def test_focused_separates_where_unfocused_fails(self):
        stack, ctf, table, refs, labels = _two_state_problem()
        B = len(stack)
        fm = f"{FX * PIXEL},{FY * PIXEL},{FZ * PIXEL},{FR * PIXEL}"
        occ0 = np.full((B, 2), 50.0)
        purity = {}
        for label, fmv in (("unfocused", ""), ("focused", fm)):
            params = defaults()
            params.update({
                "scope_pixel": PIXEL, "class_num": 2,
                "refine_rhref": "6", "class_rhcls": 6.0,
                "refine_local_iters": 6, "particle_sym": "C1",
                "class_focusmask": fmv,
            })
            t, _refs, _occ, _res = classify3d.classify3d_iteration(
                stack, table.copy(), [r.copy() for r in refs], occ0.copy(),
                params, 2)
            assign = np.asarray(t["best_2d_class"]) - 1
            agree = (assign == labels).mean()
            purity[label] = max(agree, 1 - agree)
        assert purity["focused"] >= 0.85, purity
        assert purity["unfocused"] <= purity["focused"] - 0.10, purity

    def test_focused_refinement_path_runs(self):
        """refinement_iteration with class_focusmask in local mode: the
        focus mask reaches the matching stack and the iteration completes
        with finite scores and an intact reconstruction."""
        from pyp_tpu.pipeline.refine import refinement_iteration

        stack, ctf, table, refs, _labels = _two_state_problem(n_per=8)
        params = defaults()
        params.update({
            "scope_pixel": PIXEL, "refine_rhref": "6",
            "refine_rlref": 100.0, "refine_mode": "local",
            "refine_maxiter": 2, "particle_sym": "C1",
            "refine_searchx": 4.0, "refine_local_iters": 4,
            "class_focusmask": f"{FX * PIXEL},{FY * PIXEL},"
                               f"{FZ * PIXEL},{FR * PIXEL}",
        })
        t, recon, res_a = refinement_iteration(
            stack, table.copy(), refs[0], params, 2, batch=64)
        assert np.isfinite(np.asarray(t["score"])).all()
        assert np.isfinite(np.asarray(recon.volume)).all()
