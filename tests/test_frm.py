"""FRM (polar matmul) projection matching: exactness + closed-loop recovery.

The FRM engine must (a) interpolate spectra exactly (Dirichlet matrix),
(b) honor the same pose/shift conventions as the gather path, and
(c) recover ground-truth poses on the same synthetic data the gather-based
refine3d tests use (test_refine3d.make_particles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops import frm
from pyp_tpu.ops import fourier_slice as fs

from test_refine3d import N, PIXEL, make_particles, make_volume, rotation_error_deg


class TestPolarMatrix:
    def test_exact_interpolation(self):
        """Matrix polar samples == brute-force NUDFT of the image."""
        n = 24
        rng = np.random.RandomState(0)
        img = rng.randn(n, n).astype(np.float32)
        radii = np.array([3.0, 5.0, 8.5])
        n_psi = 16
        Xp = np.asarray(frm.polar_transform(
            jnp.asarray(img[None]),
            *[jnp.asarray(w) for w in frm.polar_matrix(n, radii, n_psi)],
        ))[0].reshape(len(radii), n_psi)

        # brute force: X(g) = sum_m img[m] exp(-2pi i g.(m - c)/n), c = n//2
        ys, xs = np.mgrid[0:n, 0:n]
        pts = frm.polar_points(radii, n_psi)
        want = np.zeros((len(radii), n_psi), dtype=np.complex128)
        for i in range(len(radii)):
            for j in range(n_psi):
                gy, gx = pts[i, j]
                ph = -2j * np.pi * (gy * (ys - n // 2) + gx * (xs - n // 2)) / n
                want[i, j] = np.sum(img * np.exp(ph))
        np.testing.assert_allclose(Xp, want, rtol=2e-4, atol=2e-3)

    def test_bank_matches_projection_spectrum(self):
        """U_d ring values must equal the polar transform of the projection
        at (phi, theta, psi=0) — the two sides of the score see the same
        function (bank: trilinear 3D gather; particle: Dirichlet matrix)."""
        vol = make_volume()
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        radii = np.array([3.0, 6.0, 9.0])
        n_psi = 32
        d = np.array([[40.0, 70.0]], dtype=np.float32)
        U = np.asarray(frm.direction_bank(Fv, d, radii, n_psi, N))[0]

        proj = np.asarray(fs.fourier_to_image(
            fs.project(Fv, euler_to_matrix(40.0, 70.0, 0.0)[None], N), N))
        Xp = np.asarray(frm.polar_transform(
            jnp.asarray(proj),
            *[jnp.asarray(w) for w in frm.polar_matrix(N, radii, n_psi)],
        ))[0].reshape(len(radii), n_psi)
        # trilinear (bank) vs exact (particle): interpolation-limited
        # agreement — pad-2 trilinear at N=32 carries ~7% median error
        # (shrinks with box size; both score sides see the same function)
        err = np.abs(U - Xp) / (np.abs(Xp).mean() + 1e-9)
        assert np.median(err) < 0.12, np.median(err)


class TestFrmRecovery:
    def _cfg(self, **kw):
        kw.setdefault("low_res", 30.0)
        kw.setdefault("high_res", 6.0)
        kw.setdefault("angular_step", 11.0)
        kw.setdefault("shift_extent", 3.0)
        kw.setdefault("shift_step", 0.5)
        return frm.FrmConfig(N, PIXEL, **kw)

    def test_global_recovery(self):
        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=12,
                                                  noise=0.1)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        cfg = self._cfg()
        poses, scores = frm.frm_refine(stack, ctf_params, Fv, cfg)
        poses = np.asarray(poses)
        errs, shift_errs = [], []
        for b in range(poses.shape[0]):
            Rf = np.asarray(euler_to_matrix(*poses[b, :3]))
            errs.append(rotation_error_deg(Rf, truth["R"][b]))
            # pose convention: stored shift is the CENTERING translation
            # (= -content offset); truth["shifts"] moved content +s
            shift_errs.append(
                np.abs(poses[b, 3:5] + truth["shifts"][b]).max())
        errs = np.array(errs)
        # lattice step 11 deg -> every particle within ~1.2 lattice steps
        assert np.median(errs) < 9.0, errs
        assert (errs < 14.0).mean() >= 0.8, errs
        assert np.median(shift_errs) < 1.0, shift_errs

    def test_local_mode_prior(self):
        """With a warm pose + cone prior the search stays near the init and
        still refines shifts."""
        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=8,
                                                  noise=0.1)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        cfg = self._cfg(angular_step=6.0)
        init = np.stack([truth["phi"], truth["theta"], truth["psi"],
                         np.zeros(8), np.zeros(8)], axis=1).astype(np.float32)
        poses, scores = frm.frm_refine(stack, ctf_params, Fv, cfg,
                                       init_poses=init, prior_cone_deg=10.0)
        poses = np.asarray(poses)
        errs = [rotation_error_deg(np.asarray(euler_to_matrix(*poses[b, :3])),
                                   truth["R"][b]) for b in range(8)]
        assert np.median(errs) < 7.0, errs

    @pytest.mark.slow
    def test_beats_or_matches_gather_path(self):
        """Same data, FRM vs the gather-based global search + local refine:
        median angular error must be no worse than 1.5x the gather path."""
        from pyp_tpu.ops import refine3d

        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=10,
                                                  noise=0.15)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        cfg = self._cfg()
        poses_f, _ = frm.frm_refine(stack, ctf_params, Fv, cfg)
        res_g = refine3d.refine_batch(
            stack, ctf_params, jnp.asarray(vol), PIXEL,
            angular_step=11.0, psi_step=10.0, low_res=30.0,
            high_res_search=6.0, high_res_refine=6.0,
            shift_extent=3.0, shift_step=1.0, local_iters=12,
        )
        poses_f = np.asarray(poses_f)
        e_f, e_g = [], []
        for b in range(10):
            e_f.append(rotation_error_deg(
                np.asarray(euler_to_matrix(*poses_f[b, :3])), truth["R"][b]))
            Rg = np.asarray(euler_to_matrix(
                float(res_g.phi[b]), float(res_g.theta[b]),
                float(res_g.psi[b])))
            e_g.append(rotation_error_deg(Rg, truth["R"][b]))
        assert np.median(e_f) <= max(1.5 * np.median(e_g), 9.0), (e_f, e_g)


class TestBandLimitedCrop:
    def test_large_box_autocrops_and_recovers(self):
        """A 64-px box searched to 6 A must internally crop (wavenumbers are
        preserved by Fourier cropping) and still recover poses + shifts in
        DATA pixels."""
        from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
        from pyp_tpu.ops import reconstruct as rec

        n, pixel = 64, 1.5
        rng = np.random.RandomState(4)
        vol = rng.randn(n, n, n).astype(np.float32)
        vol *= np.asarray(soft_spherical_mask(n, n * 0.35, 3.0))
        vol = np.array(lowpass_filter_3d(jnp.asarray(vol), pixel,
                                         3.0 * pixel)) * 10
        B = 8
        phi = rng.uniform(0, 360, B).astype(np.float32)
        theta = np.degrees(np.arccos(rng.uniform(-1, 1, B))).astype(np.float32)
        psi = rng.uniform(0, 360, B).astype(np.float32)
        shifts = rng.uniform(-3, 3, (B, 2)).astype(np.float32)
        df = rng.uniform(12000, 22000, B).astype(np.float32)
        ctf_params = np.stack([df, df, np.zeros(B), np.zeros(B)], 1)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        R = euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta),
                            jnp.asarray(psi))
        F = fs.project(Fv, R, n)
        ctfs = rec._ctf_grids(n, pixel, jnp.asarray(ctf_params), 300.0, 2.7,
                              0.07)
        F = rec._shift_correct(F * ctfs, jnp.asarray(shifts), n)
        imgs = np.array(fs.fourier_to_image(F, n))
        imgs += 0.05 * np.abs(imgs).max() * rng.randn(*imgs.shape).astype(
            np.float32)

        cfg = frm.FrmConfig(n, pixel, low_res=40.0, high_res=9.0,
                            angular_step=11.0, shift_extent=4.0,
                            shift_step=0.5, rounds=2)
        assert cfg.n < n, (cfg.n, n)  # the crop actually engaged
        poses, scores = frm.frm_refine(jnp.asarray(imgs),
                                       jnp.asarray(ctf_params), Fv, cfg)
        poses = np.asarray(poses)
        R_true = np.asarray(R)
        errs = [rotation_error_deg(np.asarray(euler_to_matrix(*poses[b, :3])),
                                   R_true[b]) for b in range(B)]
        sh_err = np.abs(poses[:, 3:5] + shifts).max(axis=1)
        assert np.median(errs) < 9.0, errs
        assert np.median(sh_err) < 1.0, (poses[:, 3:5], shifts)


class TestSubLatticePolish:
    def test_final_iteration_polish_beats_lattice_snap(self, monkeypatch):
        """refine_frm_polish=final: the last iteration's gradient polish
        must cut the FRM lattice-quantization error."""
        from pyp_tpu.io import cistem
        from pyp_tpu.pipeline.refine import refinement_iteration

        monkeypatch.setenv("PYP_TPU_DISABLE_SPMD", "1")
        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=16,
                                                  noise=0.1)
        B = 16
        table = cistem.Table.zeros(B)
        table["pixel_size"] = np.full(B, PIXEL)
        table["defocus_1"] = np.asarray(ctf_params)[:, 0]
        table["defocus_2"] = np.asarray(ctf_params)[:, 1]
        table["defocus_angle"] = np.asarray(ctf_params)[:, 2]
        table["occupancy"] = np.full(B, 100.0)
        params = {"scope_pixel": PIXEL, "scope_voltage": 300.0,
                  "scope_cs": 2.7, "scope_wgh": 0.07, "refine_rlref": 40.0,
                  "refine_rhref": "8", "refine_dang": 12.0,
                  "refine_psi_step": 10.0, "refine_searchx": 4.0,
                  "refine_searchy": 4.0, "particle_sym": "C1",
                  "refine_mode": "global", "refine_engine": "frm",
                  "refine_maxiter": 1, "reconstruct_wiener": 0.5}

        def run(polish):
            p = dict(params, refine_frm_polish=polish)
            t, _out, _res = refinement_iteration(
                np.asarray(stack), table.copy(), np.asarray(vol), p, 2)
            errs = [rotation_error_deg(
                np.asarray(euler_to_matrix(float(t["phi"][b]),
                                           float(t["theta"][b]),
                                           float(t["psi"][b]))),
                truth["R"][b]) for b in range(B)]
            return float(np.median(errs))

        # iteration 2 == maxiter+1 here, so "final" triggers the polish
        err_snap = run("never")
        err_pol = run("final")
        assert err_pol < err_snap, (err_pol, err_snap)
        assert err_pol < 4.0, err_pol


class TestRingWeightsFromFsc:
    def test_data_wavenumber_indexing_under_crop(self):
        """Ring radii are DATA wavenumbers (Fourier crop preserves them):
        a full-grid FSC cliff at shell 20 must map to exactly the rings
        with radius < 20, independent of the auto-crop factor."""
        cfg = frm.get_config(256, 1.0, low_res=100.0, high_res=8.0,
                             angular_step=15.0, symmetry="C1",
                             shift_extent=4.0, shift_step=1.0)
        assert cfg.n < cfg.n_data  # auto-crop active
        curve = np.zeros(128)
        curve[:20] = 1.0
        w = frm.ring_weights_from_fsc(curve, cfg.radii, cfg.n_data)
        r = np.asarray(cfg.radii)
        assert np.all(w[r < 20] == 1.0), w[r < 20]
        assert np.all(w[r >= 20] == 0.0), w[r >= 20]


class TestCrossEngineConsistency:
    def test_frm_poses_reconstruct_directly(self):
        """The decisive cross-check the sign bug evaded: poses from the FRM
        engine must center particles when fed STRAIGHT into the
        reconstruction path (full-band cc vs ground truth) — no polish, no
        negation, no intermediate table round-trip."""
        from pyp_tpu.ops import reconstruct as rec

        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=48,
                                                  noise=0.05, shift_max=3.0)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        cfg = self._cfg_cross()
        poses, _ = frm.frm_refine(stack, ctf_params, Fv, cfg)
        out = rec.reconstruct(stack, poses, ctf_params, PIXEL)
        cc = np.corrcoef(np.asarray(out.volume).ravel(), vol.ravel())[0, 1]
        # pre-fix this was 0.08 (every particle displaced by 2x its shift)
        assert cc > 0.6, cc

    @staticmethod
    def _cfg_cross():
        return frm.FrmConfig(N, PIXEL, low_res=30.0, high_res=6.0,
                             angular_step=10.0, shift_extent=4.0,
                             shift_step=0.5, rounds=3)


class TestPolarGather:
    """Band-scalable polar sampling (oversampled-FFT + bicubic gather):
    the dense Dirichlet matmul's W is (R*n_psi, n_crop^2), which reaches
    41 GiB at box-256 rhref 3 A — above a size threshold FrmConfig flips
    to the gather sampler, which must match the matmul path's physics."""

    def test_raw_sampling_matches_matmul(self):
        """Unrestored polar samples: gather == exact Dirichlet to <1%
        (bicubic on the 2x-oversampled spectrum of an n-support image)."""
        rng = np.random.RandomState(3)
        n = 32
        stack = rng.randn(3, n, n).astype(np.float32)
        radii = frm.make_rings(n, 1.0, 25.0, 3.0)
        K = frm.default_n_psi(radii)
        pts = frm.polar_points(radii, K)
        W_re, W_im = frm.polar_matrix(n, radii, K)
        Xm = np.asarray(frm.polar_transform(
            jnp.asarray(stack), jnp.asarray(W_re),
            jnp.asarray(W_im))).reshape(3, len(radii), K)
        Y = frm._oversampled_spectra(jnp.asarray(stack), 2)
        Xg = np.asarray(frm._bicubic_wrap_take(Y, jnp.asarray(pts) * 2.0))
        num = np.real(np.conj(Xg) * Xm).sum()
        den = np.linalg.norm(Xg) * np.linalg.norm(Xm)
        assert num / den > 0.99, num / den

    def test_restore_is_grid_consistent(self):
        """Restoration must happen ON the grid before interpolation: the
        data nodes are C[k]*S[k] and their band-limited interpolant at
        off-node points is not C(pt)*S(pt) when the CTF aliases
        (interpolate-then-divide measured ring ncc 0.41 vs 0.99). Pin the
        restored gather samples against the matmul-restored ones."""
        rng = np.random.RandomState(4)
        n = 32
        stack = rng.randn(3, n, n).astype(np.float32)
        ctfp = np.stack([np.full(3, 15000.0), np.full(3, 14000.0),
                         np.full(3, 30.0), np.zeros(3)], 1).astype(np.float32)
        radii = frm.make_rings(n, 1.0, 25.0, 3.0)
        K = frm.default_n_psi(radii)
        pts = jnp.asarray(frm.polar_points(radii, K))
        ring_w = jnp.asarray(frm.ring_weights(radii))
        W_re, W_im = frm.polar_matrix(n, radii, K)
        Xm, _ = frm._restore_polar(
            jnp.asarray(stack), jnp.asarray(ctfp), jnp.asarray(W_re),
            jnp.asarray(W_im), pts, ring_w, n, K, 1.0, 300.0, 2.7, 0.07,
            0.1, False)
        Xg, _ = frm._restore_polar(
            jnp.asarray(stack), jnp.asarray(ctfp), jnp.zeros((1, 1)),
            jnp.zeros((1, 1)), pts, ring_w, n, K, 1.0, 300.0, 2.7, 0.07,
            0.1, True)
        Xm, Xg = np.asarray(Xm), np.asarray(Xg)
        ncc = np.real(np.conj(Xg) * Xm).sum() / (
            np.linalg.norm(Xg) * np.linalg.norm(Xm))
        assert ncc > 0.95, ncc

    def test_gather_mode_recovery_parity(self, monkeypatch):
        """frm_refine in gather mode recovers poses as well as matmul mode
        on the shared synthetic problem."""
        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=12,
                                                  noise=0.1)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        meds = {}
        for mode in ("matmul", "gather"):
            monkeypatch.setenv("PYP_TPU_FRM_POLAR", mode)
            frm._CFG_CACHE.clear()
            cfg = frm.FrmConfig(N, PIXEL, low_res=30.0, high_res=6.0,
                                angular_step=11.0, shift_extent=3.0,
                                shift_step=0.5)
            assert cfg.polar_gather == (mode == "gather")
            poses, _ = frm.frm_refine(stack, ctf_params, Fv, cfg)
            poses = np.asarray(poses)
            errs = [rotation_error_deg(
                np.asarray(euler_to_matrix(*poses[b, :3])), truth["R"][b])
                for b in range(poses.shape[0])]
            meds[mode] = float(np.median(errs))
        frm._CFG_CACHE.clear()
        # same lattice, same data: the gather sampler must not degrade the
        # search (allow one lattice step of slack for interp noise)
        assert meds["gather"] <= meds["matmul"] + 5.5, meds
