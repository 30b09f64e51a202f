"""Unit tests for pyp_tpu.core — FFT helpers, geometry, CTF, filters, FSC."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.core import ctf, fft, filters, fsc, geometry


class TestFFT:
    def test_integer_shift_matches_roll(self):
        rng = np.random.RandomState(0)
        img = rng.randn(32, 32).astype(np.float32)
        out = fft.shift_images(img[None], jnp.array([[3.0, -5.0]]))[0]
        np.testing.assert_allclose(out, np.roll(img, (3, -5), axis=(0, 1)), atol=1e-4)

    def test_subpixel_shift_matches_scipy(self):
        from scipy import ndimage

        rng = np.random.RandomState(1)
        img = rng.randn(32, 32).astype(np.float32)
        ours = np.asarray(fft.shift_images(img[None], jnp.array([[1.25, -0.75]]))[0])
        ref = np.fft.irfft2(
            ndimage.fourier_shift(np.fft.rfft2(img), (1.25, -0.75), n=32), s=(32, 32)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_fourier_crop_preserves_mean(self):
        rng = np.random.RandomState(2)
        img = rng.randn(64, 64).astype(np.float32) + 5.0
        small = fft.fourier_crop(img[None], (32, 32))[0]
        assert small.shape == (32, 32)
        assert abs(float(jnp.mean(small)) - float(np.mean(img))) < 1e-3

    def test_fourier_crop_roundtrip_lowfreq(self):
        # a band-limited image survives crop+pad exactly
        y, x = np.mgrid[0:64, 0:64]
        img = np.cos(2 * np.pi * 3 * y / 64) * np.sin(2 * np.pi * 2 * x / 64)
        img = img.astype(np.float32)
        small = fft.fourier_crop(img[None], (32, 32))
        back = fft.fourier_crop(small, (64, 64))[0]
        np.testing.assert_allclose(back, img, atol=1e-4)

    def test_radial_average_isotropic(self):
        ny = nx = 64
        r = np.asarray(fft.radius_grid(ny, nx))
        power = (r**2).astype(np.float32)
        prof, counts = fft.radial_average(jnp.asarray(power)[None], 16, ny, nx)
        centers = (np.arange(16) + 0.5) * 0.5 / 16
        # profile should track r^2 up to bin discretization
        assert np.all(np.abs(prof[0][2:12] - centers[2:12] ** 2) < 0.01)


class TestGeometry:
    def test_euler_matrix_roundtrip(self):
        rng = np.random.RandomState(3)
        phi = rng.uniform(-180, 180, 50)
        theta = rng.uniform(5, 175, 50)
        psi = rng.uniform(-180, 180, 50)
        R = geometry.euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta), jnp.asarray(psi))
        p2, t2, s2 = geometry.matrix_to_euler(R)
        R2 = geometry.euler_to_matrix(p2, t2, s2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)

    def test_rotation_orthonormal(self):
        R = geometry.euler_to_matrix(33.0, 71.0, -12.0)
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
        assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-6

    @pytest.mark.parametrize("sym,order", [("C1", 1), ("C6", 6), ("D7", 14), ("T", 12), ("O", 24), ("I", 60)])
    def test_symmetry_group_order(self, sym, order):
        mats = geometry.apply_symmetry_matrices(sym)
        assert mats.shape == (order, 3, 3)
        for m in mats:
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)

    def test_angular_grid_coverage(self):
        grid = geometry.angular_grid(30.0)
        assert grid.shape[1] == 3
        # poles present exactly once per psi ring
        assert (grid[:, 1] == 0.0).sum() == 12
        assert len(grid) > 100

    def test_regions(self):
        pts = np.array([[0.1, 0.1], [0.9, 0.9], [0.1, 0.9]])
        idx = geometry.region_of(pts, [0, 0], [1, 1], [2, 2])
        assert idx[0] == 0 and idx[1] == 3 and idx[2] == 1


class TestCTF:
    def test_wavelength(self):
        # 300 kV electrons: lambda ~= 0.0197 Å
        lam = float(ctf.wavelength(300.0))
        assert abs(lam - 0.0197) < 2e-4

    def test_first_zero_location(self):
        # CTF first zero for df=1 um, 300 kV, Cs=2.7: solve chi = -pi
        df, kv, cs = 10000.0, 300.0, 2.7
        g = np.linspace(1e-4, 0.1, 20000)
        c = np.asarray(ctf.ctf_1d(jnp.asarray(g), df, kv, cs, w=0.0))
        # first sign change after start
        zero_idx = np.where(np.diff(np.sign(c)))[0][0]
        g_zero = g[zero_idx]
        lam = float(ctf.wavelength(kv))
        # analytic first zero (ignoring Cs, small correction): g = sqrt(1/(lam*df))
        g_analytic = np.sqrt(1.0 / (lam * df))
        assert abs(g_zero - g_analytic) / g_analytic < 0.05

    def test_astigmatism_axis(self):
        out = ctf.defocus_at_azimuth(20000.0, 18000.0, 30.0, jnp.deg2rad(30.0))
        assert abs(float(out) - 20000.0) < 1e-3
        out90 = ctf.defocus_at_azimuth(20000.0, 18000.0, 30.0, jnp.deg2rad(120.0))
        assert abs(float(out90) - 18000.0) < 1e-3

    def test_ctf2d_batched(self):
        out = ctf.ctf_2d((64, 64), 1.0, jnp.array([10000.0, 20000.0]), jnp.array([10000.0, 20000.0]), 0.0, 300.0, 2.7)
        assert out.shape == (2, 64, 33)
        assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-6)

    def test_dose_weight_monotone(self):
        g = jnp.array([0.1])
        w1 = float(ctf.dose_weight(g, 10.0)[0])
        w2 = float(ctf.dose_weight(g, 40.0)[0])
        assert 0 < w2 < w1 < 1

    def test_dose_weight_2d_normalized(self):
        w = ctf.dose_weight_2d((32, 32), 1.0, jnp.linspace(2, 40, 10))
        ss = np.asarray(jnp.sum(w * w, axis=0))
        np.testing.assert_allclose(ss, 1.0, atol=1e-4)


class TestFilters:
    def test_bandpass_dc_blocked(self):
        img = np.ones((32, 32), dtype=np.float32)
        out = filters.apply_bandpass(img[None], 0.05, 0.4)[0]
        assert abs(float(jnp.mean(out))) < 1e-4

    def test_mask_shapes(self):
        m = filters.soft_spherical_mask(32, 10.0)
        assert m.shape == (32, 32, 32)
        assert float(m[16, 16, 16]) == pytest.approx(1.0)
        assert float(m[0, 0, 0]) == pytest.approx(0.0)

    def test_normalize(self):
        rng = np.random.RandomState(5)
        imgs = rng.randn(3, 16, 16).astype(np.float32) * 7 + 3
        out = filters.normalize_images(jnp.asarray(imgs))
        np.testing.assert_allclose(np.asarray(jnp.mean(out, axis=(1, 2))), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.std(out, axis=(1, 2))), 1.0, atol=1e-4)


class TestFSC:
    def test_identical_maps(self):
        rng = np.random.RandomState(6)
        vol = rng.randn(32, 32, 32).astype(np.float32)
        freqs, curve = fsc.fsc(jnp.asarray(vol), jnp.asarray(vol))
        np.testing.assert_allclose(np.asarray(curve), 1.0, atol=1e-5)

    def test_independent_noise(self):
        rng = np.random.RandomState(7)
        a = rng.randn(32, 32, 32).astype(np.float32)
        b = rng.randn(32, 32, 32).astype(np.float32)
        _, curve = fsc.fsc(jnp.asarray(a), jnp.asarray(b))
        assert float(jnp.max(jnp.abs(curve[2:]))) < 0.35

    def test_resolution_at_threshold(self):
        freqs = jnp.linspace(0.01, 0.5, 50)
        curve = jnp.where(freqs < 0.25, 1.0, 0.0)
        res = float(fsc.resolution_at_threshold(freqs, curve, pixel_size=1.0))
        assert 3.5 < res < 4.5  # crossing at 0.25 cyc/px -> 4 Å

    def test_ssnr_positive(self):
        curve = jnp.array([0.99, 0.9, 0.5, 0.143, 0.01])
        ssnr = np.asarray(fsc.fsc_to_ssnr(curve))
        assert np.all(ssnr >= 0) and ssnr[0] > ssnr[-1]
