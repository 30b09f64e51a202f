"""Closed-loop refine3d + reconstruct3d tests on synthetic data.

Ground truth: a smooth random volume; particles are CTF-modulated central
slices at known poses with noise. The kernel must recover orientations to a
few degrees, shifts to sub-pixel, and reconstruct a map that FSC-matches the
original volume.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.core import fsc as fsc_mod
from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops import fourier_slice as fs
from pyp_tpu.ops import reconstruct as rec
from pyp_tpu.ops import refine3d


N = 32
PIXEL = 2.0


def make_volume(seed=0):
    rng = np.random.RandomState(seed)
    vol = rng.randn(N, N, N).astype(np.float32)
    # mask first, then lowpass: keeps the spectrum inside the Nyquist sphere
    # (the Fourier-slice operators are sphere-limited by construction)
    vol *= np.asarray(soft_spherical_mask(N, N * 0.35, 3.0))
    vol = np.array(lowpass_filter_3d(jnp.asarray(vol), PIXEL, 3.0 * PIXEL))
    return vol * 10.0


def make_particles(vol, n_particles=16, noise=0.2, shift_max=2.0, seed=1):
    rng = np.random.RandomState(seed)
    phi = rng.uniform(0, 360, n_particles).astype(np.float32)
    theta = np.degrees(np.arccos(rng.uniform(-1, 1, n_particles))).astype(np.float32)
    psi = rng.uniform(0, 360, n_particles).astype(np.float32)
    shifts = rng.uniform(-shift_max, shift_max, (n_particles, 2)).astype(np.float32)
    df = rng.uniform(12000, 25000, n_particles).astype(np.float32)
    ctf_params = np.stack([df + 500, df - 500, np.full(n_particles, 30.0),
                           np.zeros(n_particles)], axis=1).astype(np.float32)

    Fvol = fs.volume_to_fourier(jnp.asarray(vol))
    R = euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta), jnp.asarray(psi))
    F = fs.project(Fvol, R, N)  # (B, N, nxf)
    ctfs = rec._ctf_grids(N, PIXEL, jnp.asarray(ctf_params), 300.0, 2.7, 0.07)
    F = F * ctfs
    # apply true shifts (content moves +s)
    F = rec._shift_correct(F, jnp.asarray(shifts), N)
    imgs = np.array(fs.fourier_to_image(F, N))
    imgs += noise * np.abs(imgs).max() * rng.randn(*imgs.shape).astype(np.float32)
    truth = {
        "phi": phi, "theta": theta, "psi": psi, "shifts": shifts,
        "R": np.asarray(R),
    }
    return jnp.asarray(imgs), jnp.asarray(ctf_params), truth


def rotation_error_deg(R1, R2):
    tr = np.einsum("ij,ij->", R1, R2)
    return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))


class TestProjectInsertAdjoint:
    def test_project_matches_rotated_sum(self):
        vol = make_volume()
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        R = euler_to_matrix(0.0, 0.0, 0.0)[None]
        proj = np.asarray(fs.fourier_to_image(fs.project(Fv, R, N), N)[0])
        np.testing.assert_allclose(proj, vol.sum(axis=0), atol=1e-3)

    def test_psi_rotation_consistency(self):
        # projection at (0, 0, psi) equals in-plane rotated projection at 0
        vol = make_volume()
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        p0 = np.asarray(fs.fourier_to_image(fs.project(Fv, euler_to_matrix(0.0, 0.0, 0.0)[None], N), N)[0])
        p90 = np.asarray(fs.fourier_to_image(fs.project(Fv, euler_to_matrix(0.0, 0.0, 90.0)[None], N), N)[0])
        # psi=+90 = clockwise image rotation about the center pixel n//2;
        # np.rot90 rotates about (n-1)/2, so a one-pixel roll re-centers it
        rot = np.roll(np.rot90(p0, k=3), 1, axis=1)
        cc = np.corrcoef(rot.ravel(), p90.ravel())[0, 1]
        assert cc > 0.999, cc


class TestLocalRefine:
    def test_refines_perturbed_poses(self):
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=8, noise=0.1)
        rng = np.random.RandomState(3)
        init = np.stack([
            truth["phi"] + rng.uniform(-8, 8, 8),
            truth["theta"] + rng.uniform(-8, 8, 8),
            truth["psi"] + rng.uniform(-8, 8, 8),
            -truth["shifts"][:, 0] + rng.uniform(-1, 1, 8),
            -truth["shifts"][:, 1] + rng.uniform(-1, 1, 8),
        ], axis=1).astype(np.float32)
        res = refine3d.refine_batch(
            imgs, ctf_params, vol, PIXEL, mode="local", init_poses=init,
            high_res_refine=2.5 * PIXEL, local_iters=30,
        )
        R_est = np.asarray(euler_to_matrix(res.phi, res.theta, res.psi))
        errs = [rotation_error_deg(R_est[i], truth["R"][i]) for i in range(8)]
        init_R = np.asarray(euler_to_matrix(jnp.asarray(init[:, 0]), jnp.asarray(init[:, 1]), jnp.asarray(init[:, 2])))
        errs0 = [rotation_error_deg(init_R[i], truth["R"][i]) for i in range(8)]
        assert np.median(errs) < np.median(errs0), (errs, errs0)
        assert np.median(errs) < 5.0, errs
        sh_err = np.abs(np.stack([np.asarray(res.shift_y), np.asarray(res.shift_x)], 1) + truth["shifts"])
        assert np.median(sh_err) < 0.7, sh_err


class TestGlobalSearch:
    def test_recovers_orientations(self):
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=12, noise=0.1)
        res = refine3d.refine_batch(
            imgs, ctf_params, vol, PIXEL,
            angular_step=15.0, psi_step=10.0,
            low_res=100.0, high_res_search=3.0 * PIXEL,
            high_res_refine=2.5 * PIXEL,
            shift_extent=3.0, shift_step=1.5, local_iters=30,
        )
        R_est = np.asarray(euler_to_matrix(res.phi, res.theta, res.psi))
        errs = np.array([rotation_error_deg(R_est[i], truth["R"][i]) for i in range(12)])
        # most particles should land near truth after global+local
        assert np.median(errs) < 8.0, errs
        assert float(jnp.median(res.score)) > 30.0


class TestReconstruct:
    def test_reconstruction_matches_truth(self):
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=96, noise=0.15, seed=7)
        poses = np.stack([
            truth["phi"], truth["theta"], truth["psi"],
            -truth["shifts"][:, 0], -truth["shifts"][:, 1],
        ], axis=1).astype(np.float32)
        out = rec.reconstruct(imgs, jnp.asarray(poses), ctf_params, PIXEL, batch=48)
        assert out.volume.shape == (N, N, N)
        # FSC of reconstruction vs ground-truth volume
        freqs, curve = fsc_mod.fsc(out.volume, jnp.asarray(vol))
        low_shells = np.asarray(curve[1:6])
        assert low_shells.min() > 0.8, low_shells
        # half-map FSC should be high at low res too
        assert float(out.fsc[1]) > 0.8, np.asarray(out.fsc)

    def test_merge_equals_single_pass(self):
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=16, noise=0.1)
        poses = jnp.asarray(np.stack([
            truth["phi"], truth["theta"], truth["psi"],
            -truth["shifts"][:, 0], -truth["shifts"][:, 1],
        ], axis=1).astype(np.float32))
        subset = jnp.asarray((np.arange(16) % 2))
        w = jnp.ones(16)
        acc_all = rec.accumulate(imgs, poses, ctf_params, subset, w, N, PIXEL)
        acc_a = rec.accumulate(imgs[:8], poses[:8], ctf_params[:8], subset[:8], w[:8], N, PIXEL)
        acc_b = rec.accumulate(imgs[8:], poses[8:], ctf_params[8:], subset[8:], w[8:], N, PIXEL)
        merged = rec.merge_accumulators([acc_a, acc_b])
        np.testing.assert_allclose(np.asarray(merged.den1), np.asarray(acc_all.den1), atol=1e-3)
        np.testing.assert_allclose(np.asarray(merged.num1), np.asarray(acc_all.num1), atol=1e-2)

    def test_save_load_accumulators(self, tmp_path):
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=4)
        poses = jnp.zeros((4, 5))
        acc = rec.accumulate(imgs, poses, ctf_params, jnp.zeros(4, dtype=int), jnp.ones(4), N, PIXEL)
        p = tmp_path / "acc.npz"
        rec.save_accumulators(acc, p)
        back = rec.load_accumulators(p)
        np.testing.assert_allclose(np.asarray(back.den1), np.asarray(acc.den1), rtol=1e-6)


class TestRefineDefocus:
    def test_recovers_defocus_error(self):
        import jax.numpy as jnp
        from pyp_tpu.ops.fourier_slice import volume_to_fourier

        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=8, noise=0.05)
        rng = np.random.RandomState(11)
        derr = rng.uniform(-400, 400, 8).astype(np.float32)
        wrong = np.asarray(ctf_params).copy()
        wrong[:, 0] += derr
        wrong[:, 1] += derr
        poses = jnp.asarray(np.stack([
            truth["phi"], truth["theta"], truth["psi"],
            -truth["shifts"][:, 0], -truth["shifts"][:, 1],
        ], axis=1).astype(np.float32))
        Fref = volume_to_fourier(jnp.asarray(vol))
        pts = refine3d.make_mask_points(N, PIXEL, 100.0, 2.2 * PIXEL)
        new_cp, scores = refine3d.refine_defocus(
            imgs, jnp.asarray(wrong), Fref, poses, jnp.asarray(pts),
            N, PIXEL, search_range=600.0,
        )
        err_before = np.abs(derr).mean()
        err_after = np.abs(np.asarray(new_cp)[:, 0] - np.asarray(ctf_params)[:, 0]).mean()
        assert err_after < err_before * 0.6, (err_before, err_after)


class TestShellWeights:
    def test_weighted_scoring_runs_and_downweights(self):
        import jax.numpy as jnp
        from pyp_tpu.ops.fourier_slice import volume_to_fourier

        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=4, noise=0.1)
        poses = jnp.asarray(np.stack([
            truth["phi"], truth["theta"], truth["psi"],
            -truth["shifts"][:, 0], -truth["shifts"][:, 1],
        ], axis=1).astype(np.float32))
        pts = refine3d.make_mask_points(N, PIXEL, 100.0, 2.2 * PIXEL)
        # a decaying FSC curve -> decreasing weights with frequency
        curve = np.linspace(1.0, 0.1, N // 2)
        w = refine3d.shell_weights_from_fsc(curve, pts, N)
        assert w.shape == (len(pts),)
        r = np.sqrt((pts ** 2).sum(1))
        assert w[np.argmin(r)] > w[np.argmax(r)]  # low freq weighted higher
        Fref = volume_to_fourier(jnp.asarray(vol))
        _, s_w = refine3d.local_refine(imgs, ctf_params, Fref, poses,
                                       jnp.asarray(pts), N, PIXEL, iters=0,
                                       weights=jnp.asarray(w))
        _, s_u = refine3d.local_refine(imgs, ctf_params, Fref, poses,
                                       jnp.asarray(pts), N, PIXEL, iters=0)
        # weighted scores emphasize the reliable low-res band -> higher NCC
        assert float(jnp.mean(s_w)) >= float(jnp.mean(s_u)) - 0.05


class TestBeamTilt:
    def test_recover_planted_tilt(self):
        """Particles synthesized with a known beam-tilt phase: the estimator
        must recover (tx, ty) and correction must restore scores."""
        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=24,
                                                  noise=0.05, shift_max=0.0)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        poses = np.stack([truth["phi"], truth["theta"], truth["psi"],
                          truth["shifts"][:, 0], truth["shifts"][:, 1]],
                         axis=1).astype(np.float32)
        t_true = (4e-4, -2.5e-4)  # radians (~0.4 / -0.25 mrad)
        ph = refine3d.beam_tilt_phase(N, PIXEL, *t_true)
        X = fs.image_to_fourier(stack)
        tilted = fs.fourier_to_image(
            X * jax.lax.complex(jnp.cos(ph), jnp.sin(ph)), N)

        tx, ty = refine3d.estimate_beam_tilt(
            tilted, ctf_params, Fv, jnp.asarray(poses), N, PIXEL,
            low_res=40.0, high_res=2.5 * PIXEL)
        assert abs(float(tx) - t_true[0]) < 0.3 * abs(t_true[0]), (
            float(tx), t_true)
        assert abs(float(ty) - t_true[1]) < 0.3 * abs(t_true[1]), (
            float(ty), t_true)

        # correction restores the untilted stack
        fixed = refine3d.correct_beam_tilt(tilted, float(tx), float(ty), PIXEL)
        err_before = float(jnp.abs(tilted - stack).mean())
        err_after = float(jnp.abs(fixed - stack).mean())
        assert err_after < 0.5 * err_before, (err_before, err_after)

    def test_zero_tilt_is_stable(self):
        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=16,
                                                  noise=0.05, shift_max=0.0)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        poses = np.stack([truth["phi"], truth["theta"], truth["psi"],
                          truth["shifts"][:, 0], truth["shifts"][:, 1]],
                         axis=1).astype(np.float32)
        tx, ty = refine3d.estimate_beam_tilt(
            stack, ctf_params, Fv, jnp.asarray(poses), N, PIXEL,
            low_res=40.0, high_res=2.5 * PIXEL)
        # magnitude well under the planted-tilt scale of the other test
        assert abs(float(tx)) < 1e-4 and abs(float(ty)) < 1e-4, (tx, ty)
