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

    def test_surface_prior_spin_init(self, tmp_path):
        """Surface-normal priors give (theta, psi); the spin ring recovers
        the free phi — the full prior -> CSPT init chain
        (detect_particles_from_surface role)."""
        from pyp_tpu.core.geometry import euler_to_matrix

        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, noise=0.08)

        meta = ItemMetadata("ts1", tmp_path, mode="tomo")
        meta["tlt"] = np.asarray(true.tilt_angles)
        meta["xf"] = np.concatenate([
            np.asarray(true.tilt_shifts), np.full((T, 1), 2.0),
        ], axis=1).astype(np.float32)
        meta["ctf"] = np.concatenate([
            np.asarray(defocus), np.zeros((T, 3), dtype=np.float32),
        ], axis=1)
        meta.save()

        # what normal_to_euler would hand over: theta/psi exact, phi unknown
        priors = np.asarray(true.particle_eulers).copy()
        priors[:, 0] = 0.0

        params = defaults()
        params.update({
            "scope_pixel": PIXEL, "csp_box": NBOX, "csp_rlref": 60.0,
            "csp_rhref": "5", "csp_OptimizerIters": 15, "csp_transreg": 0.0,
            "csp_refine_modes": "1", "csp_spin_search": 15.0,
        })
        item = {"name": "ts1", "tilts": np.asarray(images),
                "coords": np.asarray(true.particle_pos), "eulers": priors}
        refined, _acc, _scores = csp_pipe.csp_swarm_one(
            item, params, vol, tmp_path, iteration=2)

        def rot_err(eul):
            Rt = euler_to_matrix(true.particle_eulers[:, 0],
                                 true.particle_eulers[:, 1],
                                 true.particle_eulers[:, 2])
            Re = euler_to_matrix(eul[:, 0], eul[:, 1], eul[:, 2])
            tr = np.einsum("pij,pij->p", np.asarray(Rt), np.asarray(Re))
            return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))

        e_prior = np.median(rot_err(jnp.asarray(priors)))
        e_ref = np.median(rot_err(refined.particle_eulers))
        assert e_ref < 5.0, (e_prior, e_ref)
        assert e_ref < e_prior * 0.25, (e_prior, e_ref)


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


class TestCspFrameRefinement:
    @pytest.mark.slow
    def test_recovers_per_frame_drift(self):
        """CSPT frame axis: per-tilt movies with planted per-frame drift —
        the refined trajectories must recover it and the polished windows
        must beat the naive frame sum."""
        import jax.numpy as jnp

        from pyp_tpu.core.fft import shift_images
        from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
        from pyp_tpu.core.geometry import euler_to_matrix
        from pyp_tpu.ops import csp as csp_ops
        from pyp_tpu.ops import fourier_slice as fs
        from pyp_tpu.pipeline.csp import csp_polish_frames

        rng = np.random.RandomState(0)
        box, ny, nx, T, F, P = 32, 128, 128, 3, 6, 4
        vol = rng.randn(box, box, box).astype(np.float32)
        vol *= np.asarray(soft_spherical_mask(box, box * 0.35, 3.0))
        vol = np.array(lowpass_filter_3d(jnp.asarray(vol), 2.0, 6.0)) * 20

        angles = np.array([-30.0, 0.0, 30.0], np.float32)
        coords = np.stack([
            np.zeros(P), rng.uniform(-30, 30, P), rng.uniform(-30, 30, P),
        ], 1).astype(np.float32)
        eulers = rng.uniform(0, 360, (P, 3)).astype(np.float32)
        cp = csp_ops.make_params(angles, np.zeros(T, np.float32),
                                 np.zeros((T, 2), np.float32), eulers, coords)
        R_eff = np.asarray(csp_ops.effective_rotations(cp))
        pred = np.asarray(csp_ops.project_positions(cp))
        Fv = fs.volume_to_fourier(jnp.asarray(vol))

        drift = np.cumsum(rng.uniform(-0.7, 0.7, (T, F, 2)), axis=1).astype(
            np.float32)
        movies, doses = [], []
        for t in range(T):
            frames = rng.randn(F, ny, nx).astype(np.float32) * 0.3
            proj = np.asarray(fs.fourier_to_image(
                fs.project(Fv, jnp.asarray(R_eff[t]), box), box))
            for f in range(F):
                canvas = np.zeros((ny, nx), np.float32)
                for p in range(P):
                    cy = int(round(pred[t, p, 0])) + ny // 2
                    cx = int(round(pred[t, p, 1])) + nx // 2
                    sh = np.asarray(shift_images(
                        jnp.asarray(proj[p])[None],
                        jnp.asarray(drift[t, f])[None]))[0]
                    canvas[cy - box // 2:cy + box // 2,
                           cx - box // 2:cx + box // 2] += sh
                frames[f] += canvas
            movies.append(frames)
            doses.append(np.arange(1, F + 1, dtype=np.float32))

        params = {"scope_pixel": 2.0, "scope_voltage": 300.0,
                  "scope_cs": 2.7, "scope_wgh": 0.07, "csp_box": box,
                  "csp_rlref": 60.0, "csp_rhref": "8", "polish_iters": 40}
        defocus = np.full((T, 2), 15000.0, np.float32)
        polished, trajs = csp_polish_frames(movies, cp, defocus, vol, params,
                                            doses=doses)
        assert polished.shape == (T, P, box, box)
        # recovered trajectory should correlate with planted drift deltas
        # (gauge: trajectories are relative to the per-tilt mean)
        errs = []
        for t in range(T):
            tr = trajs[t]                       # (P, F, 2)
            want = drift[t] - drift[t].mean(0)  # (F, 2), gauge-fixed
            got = tr.mean(axis=0) - tr.mean(axis=(0, 1))
            errs.append(np.abs(got - want).mean())
        assert np.mean(errs) < 0.5, errs


class TestTiltStackExport:
    def test_export_shapes_and_poses(self, tmp_path, monkeypatch):
        """csp -csp_save_stacks: exported bundles carry (P, T) tilt stacks
        with per-tilt eulers/shifts/defocus usable by the tomoDRGN-role
        heterogeneity trainer."""
        from pyp_tpu import cli
        from pyp_tpu.ops import csp as csp_ops

        monkeypatch.chdir(tmp_path)
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, noise=0.05)
        meta = ItemMetadata("ts1", ".", mode="tomo")
        meta["ctf"] = np.concatenate(
            [np.asarray(defocus), np.zeros((T, 3), np.float32)], axis=1)
        meta.save()
        cli._export_tilt_stacks(
            "ts1", np.asarray(images), true,
            ItemMetadata("ts1", ".", mode="tomo").load(),
            {"scope_pixel": PIXEL, "csp_box": NBOX})
        data = np.load(f"stacks/ts1_stack.npz")
        assert data["stacks"].shape == (P, T, NBOX, NBOX)
        assert data["poses"].shape == (P, T, 5)
        assert data["ctf"].shape == (P, T, 4)
        # exported per-tilt rotations reproduce the effective geometry
        from pyp_tpu.core.geometry import euler_to_matrix

        R_want = np.asarray(csp_ops.effective_rotations(true))  # (T, P, 3, 3)
        pp = data["poses"]
        R_got = np.asarray(euler_to_matrix(
            jnp.asarray(pp[:, :, 0]), jnp.asarray(pp[:, :, 1]),
            jnp.asarray(pp[:, :, 2])))                          # (P, T, 3, 3)
        err = np.abs(np.transpose(R_got, (1, 0, 2, 3)) - R_want).max()
        assert err < 1e-4, err
        # residual sub-pixel shifts are bounded by half a pixel and follow
        # the pose-shift convention: s = -(true position - window center)
        assert np.abs(pp[:, :, 3:]).max() <= 0.5 + 1e-5
        from pyp_tpu.io import mrc as _mrc  # noqa: F401 (import parity)

        pred = np.asarray(csp_ops.project_positions(true))    # (T, P, 2)
        ny, nx = np.asarray(images).shape[-2:]
        center = np.array([ny // 2, nx // 2])
        ci = np.round(pred + center).astype(np.int32)
        starts = np.clip(ci - NBOX // 2, 0, [ny - NBOX, nx - NBOX])
        want = -((pred + center) - (starts + NBOX // 2))      # (T, P, 2)
        np.testing.assert_allclose(
            np.transpose(pp[:, :, 3:], (1, 0, 2)), want, atol=1e-4)


class TestCspSwitches:
    """Reference top-level CSP switches: refine_{micrographs,particles,ctf}
    build the mode schedule; RandomParticles/RandomSkipRatio subsample;
    InitialSkip suppresses the spin init; rotreg_method picks the smoother."""

    def test_refine_switches_build_modes(self):
        from pyp_tpu.pipeline.csp import _csp_config

        base = {"scope_voltage": 300.0, "scope_cs": 2.7, "scope_wgh": 0.07}
        cfg = _csp_config(dict(base, csp_refine_micrographs=True,
                               csp_refine_particles=False), 2, 1.0)
        assert cfg["modes"] == (3, 0)
        cfg = _csp_config(dict(base, csp_refine_particles=True,
                               csp_refine_ctf=True), 2, 1.0)
        assert cfg["modes"] == (2, 1, 4)
        # unset switches keep the explicit schedule
        cfg = _csp_config(dict(base, csp_refine_modes="1:2"), 2, 1.0)
        assert cfg["modes"] == (1, 2)

    def test_initial_skip_disables_spin(self):
        from pyp_tpu.pipeline.csp import _csp_config

        base = {"scope_voltage": 300.0, "scope_cs": 2.7, "scope_wgh": 0.07,
                "csp_spin_search": 30.0}
        assert _csp_config(base, 2, 1.0)["spin_step"] == 30.0
        assert _csp_config(dict(base, csp_InitialSkip=True), 2,
                           1.0)["spin_step"] == 0.0

    def test_rotreg_methods_smooth_a_kinked_track(self):
        from pyp_tpu.pipeline.csp import _rotreg_track

        t = np.linspace(-60, 60, 41).astype(np.float32)
        kinked = t.copy()
        kinked[20] += 8.0  # one bad tilt
        for method in ("AB1", "AB2", "XD"):
            out = np.asarray(_rotreg_track(
                kinked, {"csp_rotreg_method": method}))
            assert abs(out[20] - t[20]) < abs(kinked[20] - t[20]), method

    def test_random_subsampling_zeroes_weights(self, tmp_path):
        """csp_RandomSkipRatio: skipped particles end with zero weight and
        unchanged parameters through csp_swarm_batch."""
        import os

        from pyp_tpu.io.metadata import ItemMetadata
        from pyp_tpu.pipeline.csp import csp_swarm_batch
        from test_csp import ANGLES, NBOX, P, PIXEL, make_reference, \
            make_tilt_series

        vol = make_reference()
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            true, images, defocus = make_tilt_series(vol, seed=3)
            meta = ItemMetadata("s0", ".", mode="tomo")
            meta["tlt"] = ANGLES
            meta["ctf"] = np.asarray(defocus)
            meta["box"] = np.zeros((P, 5), dtype=np.float32)
            meta.save()
            items = [{"name": "s0", "tilts": np.asarray(images),
                      "coords": np.asarray(true.particle_pos),
                      "eulers": np.asarray(true.particle_eulers)}]
            params = {
                "scope_pixel": PIXEL, "scope_voltage": 300.0,
                "scope_cs": 2.7, "scope_wgh": 0.07, "csp_box": NBOX,
                "csp_refine_modes": "2", "csp_OptimizerIters": 2,
                "csp_RandomSkipRatio": 0.5,
            }
            refined, acc, scores, pscores = csp_swarm_batch(
                items, params, vol, ".")
            # with half the particles skipped, their positions must be
            # bit-identical to the input (no gradient reached them)
            moved = (np.abs(np.asarray(refined[0].particle_pos)
                            - np.asarray(true.particle_pos)).max(axis=1)
                     > 1e-7)
            assert 0 < moved.sum() < P, moved.sum()
        finally:
            os.chdir(cwd)
