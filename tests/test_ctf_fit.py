"""CTF estimation tests: recover known synthetic CTF parameters."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.core import ctf as ctf_model
from pyp_tpu.ops import ctf_fit


def synthetic_power(n=512, pixel=1.0, df1=21000.0, df2=19000.0, angast=35.0,
                    phase=0.0, noise=0.3, seed=0):
    """Power spectrum that looks like a periodogram: CTF^2 * envelope + bg."""
    rng = np.random.RandomState(seed)
    c = np.asarray(
        ctf_model.ctf_2d((n, n), pixel, df1, df2, angast, 300.0, 2.7,
                         w=0.07, phase_shift_rad=phase)
    )
    fy = np.fft.fftfreq(n, d=pixel).reshape(n, 1)
    fx = np.fft.rfftfreq(n, d=pixel).reshape(1, -1)
    g = np.sqrt(fy**2 + fx**2)
    envelope = np.exp(-g * 14.0)  # falling background + signal envelope
    power = envelope * (0.5 + c**2) + noise * np.abs(rng.randn(n, n // 2 + 1)) * envelope
    return jnp.asarray(power.astype(np.float32))


class TestFitCtf:
    @pytest.mark.parametrize("df1,df2,angast", [
        (21000.0, 19000.0, 35.0),
        (12000.0, 12000.0, 0.0),
        (32000.0, 28500.0, 120.0),
    ])
    def test_recover_defocus_astig(self, df1, df2, angast):
        power = synthetic_power(df1=df1, df2=df2, angast=angast)
        fit = ctf_fit.fit_ctf(power, 1.0, dfmin=5000.0, dfmax=40000.0,
                              dfstep=250.0, min_res=25.0, max_res=3.5)
        assert abs(float(fit.df1) - df1) < 300.0, (float(fit.df1), df1)
        assert abs(float(fit.df2) - df2) < 300.0, (float(fit.df2), df2)
        if df1 - df2 > 500:
            dang = abs(((float(fit.angast) - angast) + 90) % 180 - 90)
            assert dang < 8.0, (float(fit.angast), angast)

    def test_phase_shift_recovery(self):
        power = synthetic_power(df1=15000.0, df2=15000.0, angast=0.0, phase=1.2, noise=0.1)
        fit = ctf_fit.fit_ctf(power, 1.0, dfmin=5000.0, dfmax=40000.0,
                              dfstep=250.0, min_res=25.0, max_res=3.5,
                              fit_phase=True)
        assert abs(float(fit.phase_shift) - 1.2) < 0.35
        assert abs(float(fit.df1) - 15000.0) < 800.0

    def test_known_astigmatism_pinned(self):
        """ctf_known_ast role: astigmatism/angle fixed to the calibrated
        values, only defocus searched."""
        power = synthetic_power(df1=21000.0, df2=19000.0, angast=35.0)
        fit = ctf_fit.fit_ctf(power, 1.0, dfmin=5000.0, dfmax=40000.0,
                              dfstep=250.0, min_res=25.0, max_res=3.5,
                              known_astig=2000.0, known_astig_angle=35.0)
        assert abs((float(fit.df1) - float(fit.df2)) - 2000.0) < 1e-3
        assert abs(float(fit.angast) - 35.0) < 1e-3
        assert abs((float(fit.df1) + float(fit.df2)) / 2 - 20000.0) < 400.0

    def test_fit_res_reasonable(self):
        power = synthetic_power()
        fit = ctf_fit.fit_ctf(power, 1.0, dfmin=5000.0, dfmax=40000.0,
                              dfstep=250.0, min_res=25.0, max_res=3.5)
        assert 2.0 < float(fit.fit_res) < 30.0


class TestPeriodogram:
    def test_shapes_and_thon_rings(self):
        # micrograph = white noise convolved with CTF -> periodogram shows CTF^2
        rng = np.random.RandomState(1)
        n = 1024
        img_f = np.fft.rfft2(rng.randn(n, n).astype(np.float32))
        c = np.asarray(ctf_model.ctf_2d((n, n), 1.0, 18000.0, 18000.0, 0.0, 300.0, 2.7))
        mic = np.fft.irfft2(img_f * c, s=(n, n)).astype(np.float32)
        power = ctf_fit.periodogram(jnp.asarray(mic), tile=256)
        assert power.shape == (256, 129)
        fit = ctf_fit.fit_ctf(power, 1.0, dfmin=8000.0, dfmax=30000.0,
                              dfstep=250.0, min_res=20.0, max_res=4.0,
                              fit_astigmatism=False)
        assert abs(float(fit.df1) - 18000.0) < 500.0

    def test_end_to_end_micrograph(self):
        rng = np.random.RandomState(2)
        n = 1024
        img_f = np.fft.rfft2(rng.randn(n, n).astype(np.float32))
        c = np.asarray(ctf_model.ctf_2d((n, n), 1.0, 24000.0, 21000.0, 60.0, 300.0, 2.7))
        mic = np.fft.irfft2(img_f * c, s=(n, n)).astype(np.float32)
        fit = ctf_fit.fit_ctf_micrograph(jnp.asarray(mic), 1.0, tile=512,
                                         dfmin=10000.0, dfmax=35000.0,
                                         dfstep=250.0, min_res=20.0, max_res=4.0)
        assert abs(float(fit.df1) - 24000.0) < 600.0
        assert abs(float(fit.df2) - 21000.0) < 600.0


class TestLocalCtf:
    def test_defocus_plane_recovered(self):
        # micrograph with a defocus gradient along x
        rng = np.random.RandomState(9)
        n = 1024
        mic = np.zeros((n, n), dtype=np.float32)
        for half, sl in ((0, slice(0, n // 2)), (1, slice(n // 2, n))):
            df = 15000.0 if half == 0 else 19000.0
            noise = rng.randn(n, n // 2).astype(np.float32)
            c = np.asarray(ctf_model.ctf_2d((n, n // 2), 1.0, df, df, 0.0, 300.0, 2.7))
            mic[:, sl] = np.fft.irfft2(np.fft.rfft2(noise) * c, s=(n, n // 2))
        fits, plane = ctf_fit.fit_ctf_local(
            jnp.asarray(mic), 1.0, grid=(1, 2), tile=512,
            dfmin=10000.0, dfmax=25000.0, dfstep=250.0,
            min_res=25.0, max_res=5.0, fit_astigmatism=False,
        )
        df_left = 0.5 * (float(fits[0].df1) + float(fits[0].df2))
        df_right = 0.5 * (float(fits[1].df1) + float(fits[1].df2))
        assert abs(df_left - 15000) < 800, df_left
        assert abs(df_right - 19000) < 800, df_right
        # plane evaluation at region centers matches
        est = ctf_fit.defocus_at_positions(plane, [[512, 256], [512, 768]])
        assert abs(est[0] - 15000) < 1000 and abs(est[1] - 19000) < 1000


class TestThickness:
    def test_recovers_sample_thickness(self):
        # synthesize a depth-averaged power spectrum at known thickness
        n, pixel, df, t_true = 512, 1.0, 18000.0, 1500.0  # 150 nm lamella: nodes inside the fit band
        fy = np.fft.fftfreq(n, d=pixel).reshape(n, 1)
        fx = np.fft.rfftfreq(n, d=pixel).reshape(1, -1)
        g = np.sqrt(fy**2 + fx**2)
        lam = float(ctf_model.wavelength(300.0))
        cs = 2.7e7
        chi = np.pi * lam * g * g * df - 0.5 * np.pi * cs * lam**3 * g**4
        amp = np.arctan2(0.07, np.sqrt(1 - 0.07**2))
        c2t = 0.5 - 0.5 * np.cos(2 * (chi + amp)) * np.sinc(lam * g * g * t_true)
        envelope = np.exp(-g * 12.0)
        rng = np.random.RandomState(0)
        power = envelope * (0.4 + c2t) + 0.15 * np.abs(rng.randn(n, n // 2 + 1)) * envelope
        power = jnp.asarray(power.astype(np.float32))

        fit = ctf_fit.fit_ctf(power, pixel, dfmin=10000.0, dfmax=30000.0,
                              dfstep=250.0, min_res=25.0, max_res=3.5,
                              fit_astigmatism=False)
        assert abs(float(fit.df1) - df) < 500.0
        t_est, scores = ctf_fit.fit_thickness(power, pixel, fit,
                                              min_res=25.0, max_res=3.5,
                                              t_max=3000.0, n_steps=76)
        assert abs(t_est - t_true) < 200.0, (t_est, t_true)

    def test_thin_sample_gives_small_thickness(self):
        power = synthetic_power(df1=18000.0, df2=18000.0, angast=0.0, noise=0.1)
        fit = ctf_fit.fit_ctf(power, 1.0, dfmin=10000.0, dfmax=30000.0,
                              dfstep=250.0, min_res=25.0, max_res=3.5,
                              fit_astigmatism=False)
        t_est, scores = ctf_fit.fit_thickness(power, 1.0, fit,
                                              min_res=25.0, max_res=3.5)
        assert t_est < 250.0, t_est  # no depth modulation planted


class TestDiagnostic:
    def test_diagnostic_renders(self):
        power = synthetic_power()
        fit = ctf_fit.fit_ctf(power, 1.0, dfmin=5000.0, dfmax=40000.0,
                              dfstep=250.0, min_res=25.0, max_res=3.5)
        img = ctf_fit.diagnostic_image(power, 1.0, fit, size=256)
        assert img.shape == (256, 256)
        assert np.isfinite(img).all()
        # model half in [0, 1], and there is ring contrast
        assert img.std() > 0.05
