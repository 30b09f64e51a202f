"""Motion-correction kernel tests: recovery of known synthetic drift."""

import jax.numpy as jnp
import numpy as np

from pyp_tpu.core import fft, filters
from pyp_tpu.ops import motion


def make_movie(n_frames=12, n=128, drift_scale=6.0, noise=0.5, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, n).astype(np.float32)
    base = np.asarray(filters.apply_bandpass(jnp.asarray(base)[None], 0.0, 0.25)[0]) * 10
    t = np.linspace(0, 1, n_frames)
    # smooth polynomial drift, fast early decay like real beam-induced motion
    traj = np.stack(
        [drift_scale * (1 - np.exp(-3 * t)), -0.6 * drift_scale * t**2], axis=1
    ).astype(np.float32)
    traj -= traj.mean(axis=0, keepdims=True)  # zero-mean so aligned avg ~ base
    frames = np.array(fft.shift_images(jnp.asarray(np.repeat(base[None], n_frames, 0)), jnp.asarray(traj)))
    frames += noise * rng.randn(*frames.shape).astype(np.float32)
    return frames, traj, base


class TestAlignMovie:
    def test_recovers_known_drift(self):
        frames, traj, _ = make_movie()
        res = motion.align_movie(jnp.asarray(frames), bfactor=200.0, search_radius=20.0)
        expected = -(traj - traj.mean(axis=0))
        err = np.abs(np.asarray(res.shifts) - expected)
        assert err.max() < 0.35, f"max shift error {err.max():.3f} px\n{np.asarray(res.shifts)}\n{expected}"

    def test_average_sharper_than_unaligned(self):
        frames, _, base = make_movie()
        res = motion.align_movie(jnp.asarray(frames), bfactor=200.0, search_radius=20.0)
        unaligned = frames.mean(axis=0)
        # correlation of averages with the base image
        def corr(a, b):
            a = a - a.mean(); b = b - b.mean()
            return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
        assert corr(np.asarray(res.average), base) > corr(unaligned, base) + 0.05

    def test_zero_drift_stays_zero(self):
        frames, _, _ = make_movie(drift_scale=0.0, noise=0.2)
        res = motion.align_movie(jnp.asarray(frames), bfactor=200.0)
        assert float(jnp.max(jnp.abs(res.shifts))) < 0.3

    def test_dose_weighted_average(self):
        frames, traj, base = make_movie()
        res = motion.align_movie(jnp.asarray(frames), bfactor=200.0, search_radius=20.0)
        doses = jnp.linspace(2.0, 30.0, frames.shape[0])
        dw = motion.dose_weighted_average(jnp.asarray(frames), res.shifts, doses, pixel_size=1.0)
        assert dw.shape == base.shape
        assert np.isfinite(np.asarray(dw)).all()


class TestPatches:
    def test_extract_patches_shapes(self):
        frames = jnp.zeros((4, 64, 64))
        p = motion.extract_patches(frames, (2, 2))
        assert p.shape == (4, 4, 32, 32)

    def test_patch_alignment_on_uniform_drift(self):
        frames, traj, _ = make_movie(n=128)
        glob, patch_shifts, centers = motion.align_movie_patches(
            jnp.asarray(frames), patch_grid=(2, 2), bfactor=200.0
        )
        # after global correction, per-patch residual shifts should be small
        assert float(jnp.max(jnp.abs(patch_shifts))) < 1.0

    def test_interpolate_local_shifts(self):
        # synthetic: patch shifts linear in position -> interpolation exact
        centers = jnp.asarray(np.array([[16.0, 16.0], [16.0, 48.0], [48.0, 16.0], [48.0, 48.0]]))
        n_frames = 3
        shifts = jnp.stack(
            [centers[:, 0:1] * 0.01 * (f + 1) for f in range(n_frames)], axis=1
        )  # (P, n_frames, 1)
        shifts = jnp.concatenate([shifts, jnp.zeros_like(shifts)], axis=-1)
        pos = jnp.asarray(np.array([[32.0, 32.0]]))
        out = motion.interpolate_local_shifts(shifts, centers, pos, (64, 64), order=1)
        np.testing.assert_allclose(np.asarray(out[0, :, 0]), [0.32, 0.64, 0.96], atol=1e-3)


class TestFrameAverages:
    def test_running_average(self):
        rng = np.random.RandomState(0)
        f = jnp.asarray(rng.randn(6, 16, 16).astype(np.float32))
        ra = motion.running_average(f, 3)
        assert ra.shape == f.shape
        np.testing.assert_allclose(np.asarray(ra[2]),
                                   np.asarray((f[1] + f[2] + f[3]) / 3), atol=1e-5)
        # edges use edge-padding
        np.testing.assert_allclose(np.asarray(ra[0]),
                                   np.asarray((f[0] + f[0] + f[1]) / 3), atol=1e-5)

    def test_weighted_average_scalar_weights(self):
        rng = np.random.RandomState(1)
        f = jnp.asarray(rng.randn(4, 8, 8).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(motion.weighted_average(f, jnp.ones(4))),
            np.asarray(f.mean(0)), atol=1e-5)
        w = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(motion.weighted_average(f, w)), np.asarray(f[0]), atol=1e-5)


class TestLargeMovie:
    def test_binned_alignment_recovers_drift(self):
        frames, traj, base = make_movie(n_frames=8, n=256, drift_scale=6.0, noise=0.3)
        res = motion.align_movie_large(jnp.asarray(frames), binning=2,
                                       bfactor=200.0, dose_weighted=False)
        expected = -(traj - traj.mean(axis=0))
        err = np.abs(np.asarray(res.shifts) - expected)
        assert err.max() < 1.0, (np.asarray(res.shifts), expected)
        assert res.average.shape == base.shape  # full resolution output

    def test_scan_average_matches_batch(self):
        frames, traj, base = make_movie(n_frames=6, n=128)
        shifts = jnp.asarray(-(traj - traj.mean(axis=0)))
        doses = jnp.arange(1.0, 7.0)
        a = motion._average_scan(jnp.asarray(frames), shifts, doses, 1.0, True)
        b = motion.dose_weighted_average(jnp.asarray(frames), shifts, doses, 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


class TestMotionCorCards:
    """movie_motioncor_* alias targets: phase-only correlation and the
    convergence-tolerance early stop."""

    def test_phase_only_recovers_drift(self):
        frames, traj, _ = make_movie(noise=0.3)
        res = motion.align_movie(jnp.asarray(frames), bfactor=200.0,
                                 search_radius=20.0, phase_only=True)
        expected = -(traj - traj.mean(axis=0))
        err = np.abs(np.asarray(res.shifts) - expected)
        assert err.max() < 1.0, err.max()

    def test_tolerance_freezes_iterations(self):
        frames, traj, _ = make_movie(noise=0.3)
        # huge tolerance: converged after the first update, so the result
        # equals a single-iteration run
        res_tol = motion.align_movie(jnp.asarray(frames), bfactor=200.0,
                                     search_radius=20.0, max_iters=8,
                                     tol=1e6)
        res_one = motion.align_movie(jnp.asarray(frames), bfactor=200.0,
                                     search_radius=20.0, max_iters=1)
        np.testing.assert_allclose(np.asarray(res_tol.shifts),
                                   np.asarray(res_one.shifts), atol=1e-4)


class TestMagDistortion:
    def test_correction_inverts_planted_distortion(self):
        """correct_mag_distortion must undo a known anisotropic stretch
        (MotionCor -Mag role)."""
        import jax.numpy as jnp

        from pyp_tpu.core.filters import apply_bandpass
        from pyp_tpu.ops.motion import correct_mag_distortion

        rng = np.random.RandomState(0)
        img = np.asarray(apply_bandpass(
            jnp.asarray(rng.randn(128, 128).astype(np.float32)),
            0.0, 0.12))
        maj, mino, ang = 1.03, 0.98, 25.0
        # plant the distortion by sampling the TRUE image at A^-1 grid:
        # correct_mag_distortion(img, 1/maj, 1/mino, ang) applies A itself
        distorted = np.asarray(correct_mag_distortion(
            jnp.asarray(img), 1.0 / maj, 1.0 / mino, ang))
        fixed = np.asarray(correct_mag_distortion(
            jnp.asarray(distorted), maj, mino, ang))
        c = 20  # interior (edge pixels extrapolate)
        err_fixed = np.abs(fixed - img)[c:-c, c:-c].mean()
        err_dist = np.abs(distorted - img)[c:-c, c:-c].mean()
        assert err_fixed < 0.35 * err_dist, (err_fixed, err_dist)
