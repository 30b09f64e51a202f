"""Tilt-series alignment + WBP reconstruction tests on synthetic tomograms."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.core.filters import lowpass_filter_3d
from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops import fourier_slice as fs
from pyp_tpu.ops import tomo


N = 64
ANGLES = np.arange(-60.0, 61.0, 10.0, dtype=np.float32)  # 13 tilts


def make_tomo_data(shift_scale=4.0, noise=0.1, seed=0):
    rng = np.random.RandomState(seed)
    vol = np.zeros((N, N, N), dtype=np.float32)
    # place a few gaussian blobs in the central slab
    for _ in range(8):
        z, y, x = rng.randint(N // 2 - 8, N // 2 + 8), rng.randint(10, N - 10), rng.randint(10, N - 10)
        zz, yy, xx = np.mgrid[0:N, 0:N, 0:N]
        vol += np.exp(-((zz - z) ** 2 + (yy - y) ** 2 + (xx - x) ** 2) / 8.0).astype(np.float32)
    vol = np.array(lowpass_filter_3d(jnp.asarray(vol), 1.0, 3.0)) * 50
    Fv = fs.volume_to_fourier(jnp.asarray(vol))
    R = euler_to_matrix(jnp.zeros(len(ANGLES)), jnp.asarray(ANGLES), jnp.zeros(len(ANGLES)))
    tilts = np.array(fs.fourier_to_image(fs.project(Fv, R, N), N))
    true_shifts = rng.uniform(-shift_scale, shift_scale, (len(ANGLES), 2)).astype(np.float32)
    ref_idx = int(np.argmin(np.abs(ANGLES)))
    true_shifts -= true_shifts[ref_idx]
    from pyp_tpu.core.fft import shift_images

    misaligned = np.array(shift_images(jnp.asarray(tilts), jnp.asarray(-true_shifts)))
    misaligned += noise * np.abs(misaligned).max() * rng.randn(*misaligned.shape).astype(np.float32)
    return vol, tilts, misaligned, true_shifts


class TestPrealign:
    def test_recovers_shifts(self):
        vol, tilts, misaligned, true_shifts = make_tomo_data()
        shifts = np.asarray(tomo.prealign_tilt_series(misaligned, ANGLES))
        err = np.abs(shifts - true_shifts)
        assert np.median(err) < 1.0, (shifts, true_shifts)

    def test_aligned_series_needs_no_shift(self):
        vol, tilts, _, _ = make_tomo_data(noise=0.05)
        shifts = np.asarray(tomo.prealign_tilt_series(tilts, ANGLES))
        assert np.abs(shifts).max() < 1.5, shifts


class TestProjectionModel:
    def test_solves_synthetic_model(self):
        rng = np.random.RandomState(1)
        P = 12
        pts = np.stack([
            rng.uniform(-10, 10, P),   # z
            rng.uniform(-20, 20, P),   # y
            rng.uniform(-20, 20, P),   # x
        ], axis=1)
        # shifts are only determined up to the projection of a global 3D
        # translation (gauge freedom); fix the gauge as the solver does
        pts -= pts.mean(axis=0, keepdims=True)
        th = np.radians(ANGLES)
        alpha = 3.0
        d_true = rng.uniform(-5, 5, (len(ANGLES), 2))
        ca, sa = np.cos(np.radians(alpha)), np.sin(np.radians(alpha))
        xr = pts[None, :, 2] * np.cos(th)[:, None] + pts[None, :, 0] * np.sin(th)[:, None]
        yr = np.broadcast_to(pts[None, :, 1], xr.shape)
        x2 = ca * xr - sa * yr
        y2 = sa * xr + ca * yr
        measured = np.stack([y2, x2], axis=-1) - d_true[:, None, :]
        measured += np.array([N // 2, N // 2])
        model = tomo.solve_projection_model(jnp.asarray(measured), ANGLES, (N, N), iters=8)
        assert float(model.residual) < 0.3, float(model.residual)
        assert abs(float(model.axis_angle) - alpha) < 0.5
        d_err = np.abs(np.asarray(model.shifts) - d_true)
        assert np.median(d_err) < 0.5


class TestWBP:
    def test_reconstruction_correlates_with_truth(self):
        vol, tilts, misaligned, true_shifts = make_tomo_data(noise=0.05)
        recon = np.asarray(tomo.wbp_reconstruct(
            jnp.asarray(misaligned), jnp.asarray(ANGLES),
            shifts=jnp.asarray(true_shifts), thickness=N, slab=16,
        ))
        assert recon.shape == (N, N, N)
        # compare central slab (missing wedge blurs z)
        sl = slice(N // 2 - 6, N // 2 + 6)
        a = recon[sl].ravel()
        b = vol[sl].ravel()
        cc = np.corrcoef(a, b)[0, 1]
        assert cc > 0.6, cc

    def test_blob_positions_recovered(self):
        vol, tilts, _, _ = make_tomo_data(noise=0.02)
        recon = np.asarray(tomo.wbp_reconstruct(
            jnp.asarray(tilts), jnp.asarray(ANGLES), thickness=N, slab=16,
        ))
        # the brightest voxel of the recon should be near a bright voxel of vol
        pz, py, px = np.unravel_index(recon.argmax(), recon.shape)
        neighborhood = vol[max(pz-3,0):pz+4, max(py-3,0):py+4, max(px-3,0):px+4]
        assert neighborhood.max() > 0.5 * vol.max()


class TestCtfCorrect:
    def test_phase_flip_runs(self):
        rng = np.random.RandomState(2)
        tilts = rng.randn(3, 64, 64).astype(np.float32)
        out = tomo.ctf_correct_tilts(tilts, [-30.0, 0.0, 30.0],
                                     [20000.0, 20000.0, 20000.0], 2.0)
        assert out.shape == tilts.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_matches_numpy_band_loop(self):
        """The jitted scan kernel must reproduce the per-band phase-flip
        semantics (IMOD ctfphaseflip strips) computed directly in numpy."""
        from pyp_tpu.core import ctf as cm

        rng = np.random.RandomState(3)
        pixel, n_bands = 2.0, 8
        tilts = rng.randn(2, 48, 64).astype(np.float32)
        angles = [35.0, -25.0]
        defoci = [18000.0, 22000.0]
        out = np.asarray(tomo.ctf_correct_tilts(
            tilts, angles, defoci, pixel, n_bands=n_bands))

        T, ny, nx = tilts.shape
        want = np.zeros_like(tilts)
        for t in range(T):
            theta = np.radians(angles[t])
            xs = (np.arange(nx) - nx // 2) * pixel
            df_col = defoci[t] + xs * np.tan(theta)
            lo, hi = df_col.min(), df_col.max() + 1.0
            edges = lo + (hi - lo) * np.arange(n_bands + 1) / n_bands
            band_of_col = np.clip(
                ((df_col - lo) / (hi - lo) * n_bands).astype(int),
                0, n_bands - 1)
            F = np.fft.rfft2(tilts[t])
            for b in range(n_bands):
                df_mid = 0.5 * (edges[b] + edges[b + 1])
                c = np.asarray(cm.ctf_2d((ny, nx), pixel, df_mid, df_mid,
                                         0.0, 300.0, 2.7))
                flipped = np.fft.irfft2(F * np.sign(c), s=(ny, nx))
                want[t][:, band_of_col == b] = flipped[:, band_of_col == b]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


class TestHandedness:
    def test_detects_planted_gradient(self):
        # build tilts whose defocus gradient matches +tan(theta)
        from pyp_tpu.core import ctf as cm

        rng = np.random.RandomState(7)
        T, ny, nx = 3, 256, 512
        angles = [-40.0, 30.0, 45.0]
        df0 = 20000.0
        tilts = np.zeros((T, ny, nx), dtype=np.float32)
        for t, theta in enumerate(angles):
            for half, sl in ((0, slice(0, nx // 2)), (1, slice(nx // 2, nx))):
                xc = (-nx / 4 if half == 0 else nx / 4)
                df = df0 + xc * 2.0 * np.tan(np.radians(theta))
                noise = rng.randn(ny, nx // 2).astype(np.float32)
                c = np.asarray(cm.ctf_2d((ny, nx // 2), 2.0, df, df, 0.0, 300.0, 2.7))
                tilts[t][:, sl] = np.fft.irfft2(np.fft.rfft2(noise) * c,
                                                s=(ny, nx // 2))
        hand, grads = tomo.detect_handedness(tilts, angles, [df0] * T, 2.0)
        assert hand == 1, (hand, grads)

    def test_flipped_gradient(self):
        from pyp_tpu.core import ctf as cm

        rng = np.random.RandomState(8)
        T, ny, nx = 2, 256, 512
        angles = [40.0, -35.0]
        df0 = 18000.0
        tilts = np.zeros((T, ny, nx), dtype=np.float32)
        for t, theta in enumerate(angles):
            for half, sl in ((0, slice(0, nx // 2)), (1, slice(nx // 2, nx))):
                xc = (-nx / 4 if half == 0 else nx / 4)
                df = df0 - xc * 2.0 * np.tan(np.radians(theta))  # flipped
                noise = rng.randn(ny, nx // 2).astype(np.float32)
                c = np.asarray(cm.ctf_2d((ny, nx // 2), 2.0, df, df, 0.0, 300.0, 2.7))
                tilts[t][:, sl] = np.fft.irfft2(np.fft.rfft2(noise) * c,
                                                s=(ny, nx // 2))
        hand, grads = tomo.detect_handedness(tilts, angles, [df0] * T, 2.0)
        assert hand == -1, (hand, grads)


class TestHalves:
    def test_halves_shapes_and_independence(self):
        vol, tilts, _, _ = make_tomo_data(noise=0.05)
        h1, h2 = tomo.wbp_reconstruct_halves(
            jnp.asarray(tilts), jnp.asarray(ANGLES), thickness=32, slab=16)
        assert h1.shape == h2.shape == (32, N, N)
        # halves come from disjoint tilts but share signal: correlated but
        # not identical
        cc = np.corrcoef(np.asarray(h1).ravel(), np.asarray(h2).ravel())[0, 1]
        assert 0.3 < cc < 0.999


@pytest.mark.slow
class TestTiltExclusion:
    def test_excluded_tilts_dropped(self, tmp_path):
        from pyp_tpu.config.params import defaults
        from pyp_tpu.pipeline.tomo import process_tilt_series

        rng = np.random.RandomState(3)
        tilts = rng.randn(7, 128, 128).astype(np.float32)
        params = defaults()
        params.update({
            "scope_pixel": 2.0, "tomo_ali_method": "skip",
            "tomo_ali_exclude": "0:6", "ctf_min_def": 8000,
            "ctf_max_def": 25000, "ctf_tile": 64, "ctf_max_res": 9.0,
            "tomo_rec_thickness": 32, "tomo_rec_binning": 1,
            "tomo_ali_bin": 1, "tomo_spk_method": "none",
        })
        item = {"name": "ex1", "tilts": tilts,
                "angles": np.linspace(-60, 60, 7)}
        out = process_tilt_series(item, params, tmp_path)
        from pyp_tpu.io.metadata import ItemMetadata

        meta = ItemMetadata("ex1", tmp_path, mode="tomo").load()
        assert len(meta["tlt"]) == 5  # 7 - 2 excluded
        assert meta["ctf"].shape[0] == 5
        assert out.get("excluded_tilts") == [0, 6]


@pytest.mark.slow
class TestReconstructionFilters:
    """Pipeline wiring of gold erasure + dose weighting before WBP
    (merge/core.py ccderaser :251-320 and mtffilter :219-249 roles)."""

    def _params(self):
        from pyp_tpu.config.params import defaults

        params = defaults()
        params.update({
            "scope_pixel": 2.0, "tomo_ali_method": "skip",
            "ctf_min_def": 8000, "ctf_max_def": 25000, "ctf_tile": 64,
            "ctf_max_res": 9.0, "tomo_rec_thickness": 32,
            "tomo_rec_binning": 1, "tomo_ali_bin": 1,
            "tomo_spk_method": "none",
        })
        return params

    def test_gold_erasure_removes_streaks(self, tmp_path):
        from pyp_tpu.pipeline.tomo import process_tilt_series

        rng = np.random.RandomState(4)
        tilts = 0.1 * rng.randn(7, 128, 128).astype(np.float32)
        tilts[:, 60:68, 60:68] = -50.0  # gold bead in every tilt
        angles = np.linspace(-60, 60, 7)
        params = self._params()
        params["tomo_rec_erase_fiducials"] = True
        params["tomo_rec_gold_rad"] = 8.0  # 4 px at 2 Å/px
        out = process_tilt_series(
            {"name": "au1", "tilts": tilts, "angles": angles},
            params, tmp_path)
        assert out.get("fiducials_erased")
        from pyp_tpu.io import mrc

        rec = mrc.read(f"{tmp_path}/au1.rec.mrc")
        # without erasure the bead dominates the tomogram dynamic range
        params2 = self._params()
        out2 = process_tilt_series(
            {"name": "au2", "tilts": tilts, "angles": angles},
            params2, tmp_path)
        rec2 = mrc.read(f"{tmp_path}/au2.rec.mrc")
        assert np.abs(rec).max() < 0.2 * np.abs(rec2).max(), (
            np.abs(rec).max(), np.abs(rec2).max())

    def test_dose_weighting_attenuates_late_high_freq(self, tmp_path):
        from pyp_tpu.pipeline.tomo import process_tilt_series

        rng = np.random.RandomState(5)
        tilts = rng.randn(7, 128, 128).astype(np.float32)
        angles = np.linspace(-60, 60, 7)
        params = self._params()
        params["tomo_rec_dose_weighting"] = True
        params["scope_dose_rate"] = 30.0  # heavy dose: strong filtering
        out = process_tilt_series(
            {"name": "dw1", "tilts": tilts, "angles": angles},
            params, tmp_path)
        assert out.get("dose_weighted")
        from pyp_tpu.io import mrc

        rec = mrc.read(f"{tmp_path}/dw1.rec.mrc")
        params2 = self._params()
        process_tilt_series(
            {"name": "dw2", "tilts": tilts, "angles": angles},
            params2, tmp_path)
        rec2 = mrc.read(f"{tmp_path}/dw2.rec.mrc")
        # weighting changes the reconstruction and reduces total power of
        # white noise (high frequencies attenuated for late tilts)
        assert not np.allclose(rec, rec2)
        assert np.std(rec) < np.std(rec2)


def make_fiducial_series(T=25, ny=192, nx=192, P=10, seed=0, axis_angle=3.0,
                         specimen_contrast=0.3, noise=0.3, dropout_beads=0):
    """Low-contrast specimen + gold beads rendered through the single-axis
    projection model (the regime where patch tracking fails but bead
    tracking must not)."""
    rng = np.random.RandomState(seed)
    angles = np.linspace(-60.0, 60.0, T)
    th = np.radians(angles)
    # rejection-sample bead positions with a minimum separation so projected
    # beads never blend (physically: beads are dispersed on the support film)
    pts = []
    while len(pts) < P:
        cand = np.array([
            rng.uniform(-25, 25), rng.uniform(-55, 55), rng.uniform(-55, 55),
        ])
        if all(np.linalg.norm(cand[1:] - q[1:]) > 28.0 for q in pts):
            pts.append(cand)
    pts = np.asarray(pts)
    d_true = rng.uniform(-6, 6, (T, 2))
    ca, sa = np.cos(np.radians(axis_angle)), np.sin(np.radians(axis_angle))
    xr = pts[None, :, 2] * np.cos(th)[:, None] + pts[None, :, 0] * np.sin(th)[:, None]
    yr = np.broadcast_to(pts[None, :, 1], (T, P))
    pos = np.stack([sa * xr + ca * yr, ca * xr - sa * yr], axis=-1)
    pos = pos - d_true[:, None, :] + np.array([ny // 2, nx // 2])

    # smooth, very low-contrast specimen background
    from scipy.ndimage import gaussian_filter

    bg = gaussian_filter(rng.randn(ny, nx), 8.0)
    bg = specimen_contrast * bg / (bg.std() + 1e-9)

    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    sig2 = 2.0 * (5.0 / 1.5) ** 2
    tilts = np.zeros((T, ny, nx), dtype=np.float32)
    for t in range(T):
        img = bg.copy()
        for p in range(P):
            if dropout_beads and p < dropout_beads and t % 3 == 0:
                continue  # bead invisible in a third of the tilts
            dy2 = (yy - pos[t, p, 0]) ** 2 + (xx - pos[t, p, 1]) ** 2
            img = img - 3.0 * np.exp(-dy2 / sig2)
        img = img + noise * rng.randn(ny, nx)
        tilts[t] = img
    return tilts, angles, pts, d_true, pos


class TestFiducialAlignment:
    def test_recovers_model_on_low_contrast_specimen(self):
        tilts, angles, pts, d_true, pos_true = make_fiducial_series()
        model, coords, tracks, w = tomo.align_tilt_series_fiducial(
            jnp.asarray(tilts), angles, bead_radius_px=5.0, max_beads=20)
        assert float(model.residual) < 0.5
        assert abs(float(model.axis_angle) - 3.0) < 0.75

    def test_robust_to_vanishing_beads(self):
        tilts, angles, pts, d_true, pos_true = make_fiducial_series(
            dropout_beads=3, seed=1)
        model, coords, tracks, w = tomo.align_tilt_series_fiducial(
            jnp.asarray(tilts), angles, bead_radius_px=5.0, max_beads=20)
        assert float(model.residual) < 0.6

    def test_reprojection_matches_truth(self):
        """The solved model must reproject beads onto their true positions
        (not just fit its own tracks)."""
        tilts, angles, pts, d_true, pos_true = make_fiducial_series(seed=2)
        T, ny, nx = tilts.shape
        model, coords, tracks, w = tomo.align_tilt_series_fiducial(
            jnp.asarray(tilts), angles, bead_radius_px=5.0, max_beads=20)
        # measured tracks of high-confidence beads sit on true projections
        w = np.asarray(w)
        tracks = np.asarray(tracks)
        errs = []
        for p in range(tracks.shape[1]):
            if w[:, p].mean() < 0.1:
                continue
            # nearest true bead (detector order is arbitrary)
            t0 = len(angles) // 2
            d2 = ((pos_true[t0] - tracks[t0, p]) ** 2).sum(axis=1)
            q = int(np.argmin(d2))
            sel = w[:, p] > 0.3  # measurements the solve actually trusts
            errs.extend(
                np.abs(pos_true[:, q][sel] - tracks[:, p][sel]).max(axis=1)
            )
        errs = np.asarray(errs)
        assert errs.size > 50
        assert np.median(errs) < 0.5
        assert np.percentile(errs, 90) < 1.5


class TestSartReconstruct:
    def _phantom_and_tilts(self, nz=32, ny=24, nx=48, T=21):
        import jax.numpy as jnp

        from pyp_tpu.ops import tomo

        rng = np.random.RandomState(0)
        vol = np.zeros((nz, ny, nx), np.float32)
        for _ in range(6):
            z, y, x = rng.randint(8, nz - 8), rng.randint(4, ny - 4), rng.randint(10, nx - 10)
            vol[z - 2:z + 2, y - 2:y + 2, x - 2:x + 2] = rng.rand() + 0.5
        angles = np.linspace(-60, 60, T).astype(np.float32)
        tilts = np.stack([
            np.asarray(tomo._forward_project(
                jnp.asarray(vol), np.deg2rad(a), nx)) for a in angles])
        return vol, tilts, angles

    def test_sart_recovers_phantom(self):
        import jax.numpy as jnp

        from pyp_tpu.ops import tomo

        vol, tilts, angles = self._phantom_and_tilts()
        rec = np.asarray(tomo.sart_reconstruct(
            jnp.asarray(tilts), jnp.asarray(angles), thickness=vol.shape[0],
            iterations=10, relax=1.0, subsets=4))
        # compare inside the reliably-covered central region
        c = vol[4:-4, :, 8:-8].ravel()
        r = rec[4:-4, :, 8:-8].ravel()
        cc = np.corrcoef(c, r)[0, 1]
        assert cc > 0.82, cc

    def test_sart_beats_unfiltered_bp_contrast(self):
        import jax.numpy as jnp

        from pyp_tpu.ops import tomo

        vol, tilts, angles = self._phantom_and_tilts()
        rec_sart = np.asarray(tomo.sart_reconstruct(
            jnp.asarray(tilts), jnp.asarray(angles), thickness=vol.shape[0],
            iterations=10, relax=1.0, subsets=4))
        rec_wbp = np.asarray(tomo.wbp_reconstruct(
            jnp.asarray(tilts), jnp.asarray(angles), thickness=vol.shape[0],
            slab=16))
        c = vol[4:-4, :, 8:-8].ravel()
        cc_s = np.corrcoef(c, rec_sart[4:-4, :, 8:-8].ravel())[0, 1]
        cc_w = np.corrcoef(c, rec_wbp[4:-4, :, 8:-8].ravel())[0, 1]
        # SART should at least be competitive on clean data
        assert cc_s > 0.9 * cc_w, (cc_s, cc_w)

    def test_fake_sirt_filter_boosts_low_freq(self):
        from pyp_tpu.ops import tomo

        ramp = np.asarray(tomo.ramp_filter(64))
        fs = np.asarray(tomo.fake_sirt_filter(64, 30))
        # fake-SIRT response relative to ramp rises toward low frequency
        rel = fs[1:10] / np.maximum(ramp[1:10], 1e-9)
        assert np.all(np.diff(rel) <= 1e-6)  # monotonically decreasing
        assert fs[1] <= ramp[1] + 1e-6       # never exceeds exact inverse


class TestCtfDeconvolve:
    """Wiener CTF deconvolution (IsoNet deconv role, isonet_tools.py:64)."""

    def _ctf_modulated_phantom(self, seed=0):
        import jax.numpy as jnp

        from pyp_tpu.core import ctf as ctf_model

        rng = np.random.default_rng(seed)
        nz, ny, nx = 32, 64, 64
        vol = np.zeros((nz, ny, nx), np.float32)
        zz, yy, xx = np.mgrid[:nz, :ny, :nx]
        for _ in range(6):
            c = rng.uniform(10, 22), rng.uniform(16, 48), rng.uniform(16, 48)
            r = rng.uniform(3, 6)
            vol += ((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                    + (xx - c[2]) ** 2 < r * r).astype(np.float32)
        pixel, df = 10.0, 30000.0
        gz = np.fft.fftfreq(nz)[:, None, None]
        gy = np.fft.fftfreq(ny)[None, :, None]
        gx = np.fft.rfftfreq(nx)[None, None, :]
        g = np.sqrt(gz**2 + gy**2 + gx**2) / pixel
        c3 = np.asarray(ctf_model.ctf_1d(jnp.asarray(g), df, 300.0, 2.7))
        meas = np.fft.irfftn(np.fft.rfftn(vol) * c3, s=vol.shape, axes=(0, 1, 2))
        meas += rng.normal(scale=0.05 * vol.std(), size=vol.shape)
        return vol, meas.astype(np.float32), df, pixel

    def test_restores_contrast(self):
        from pyp_tpu.ops.tomo import ctf_deconvolve

        vol, meas, df, pixel = self._ctf_modulated_phantom()
        dec = np.asarray(ctf_deconvolve(meas, df, pixel))
        v = vol - vol.mean()
        cc_in = np.corrcoef(v.ravel(), meas.ravel())[0, 1]
        cc_out = np.corrcoef(v.ravel(), dec.ravel())[0, 1]
        # a defocused acquisition inverts contrast bands; deconvolution
        # must recover a markedly better (and correctly-signed) match
        assert cc_out > cc_in + 0.1, (cc_in, cc_out)
        assert cc_out > 0.5, cc_out

    def test_phase_flipped_variant_and_2d(self):
        from pyp_tpu.ops.tomo import ctf_deconvolve

        vol, meas, df, pixel = self._ctf_modulated_phantom(seed=1)
        out2 = np.asarray(ctf_deconvolve(meas[16], df, pixel,
                                         phase_flipped=True))
        assert out2.shape == meas[16].shape
        assert np.isfinite(out2).all()

    def test_dc_not_amplified(self):
        from pyp_tpu.ops.tomo import ctf_deconvolve

        rng = np.random.default_rng(2)
        v = rng.normal(size=(16, 32, 32)).astype(np.float32) + 100.0
        dec = np.asarray(ctf_deconvolve(v, 25000.0, 8.0))
        # the cosine highpass zeroes the Wiener gain at DC: the huge mean
        # must not blow up the output
        assert abs(dec.mean()) < 1.0, dec.mean()
        assert np.isfinite(dec).all()


class TestTomoPickCards:
    """[tabs.tomo_pick] native wiring: template conditioning, spectral
    whitening, false-positive cutoff estimation, coordinate import."""

    def test_prepare_template_invert_mirror_resize(self):
        from pyp_tpu.pipeline.tomo import _prepare_pick_template

        rng = np.random.RandomState(0)
        t = rng.randn(24, 24, 24).astype(np.float32)
        out = _prepare_pick_template(t, {
            "tomo_pick_template_invert": True,
            "tomo_pick_template_mirror": True,
            "tomo_pick_template_size": 16,
            "tomo_pick_mask_method": "none",
        }, 2.0)
        assert out.shape == (16, 16, 16)
        plain = _prepare_pick_template(t, {
            "tomo_pick_template_size": 16,
            "tomo_pick_mask_method": "none",
        }, 2.0)
        np.testing.assert_allclose(out, -plain[::-1], atol=1e-4)

    def test_whiten_flattens_spectrum(self):
        import jax.numpy as jnp

        from pyp_tpu.core import fsc as fsc_mod
        from pyp_tpu.core.filters import lowpass_filter_3d
        from pyp_tpu.pipeline.tomo import _whiten_volume

        rng = np.random.RandomState(1)
        v = rng.randn(32, 32, 32).astype(np.float32)
        v = np.asarray(lowpass_filter_3d(jnp.asarray(v), 1.0, 4.0))
        w = _whiten_volume(v)

        def shell_amp(vol):
            F = jnp.fft.rfftn(jnp.asarray(vol))
            bins = fsc_mod._shell_bins(32, 16)
            a = jnp.zeros(16).at[bins].add(jnp.abs(F.reshape(-1)) ** 2)
            c = jnp.zeros(16).at[bins].add(1.0)
            return np.sqrt(np.asarray(a / jnp.maximum(c, 1)))

        a0, a1 = shell_amp(v), shell_amp(w)
        # colored input: orders of magnitude between shells; whitened:
        # within a small factor
        assert a0[2] / max(a0[12], 1e-12) > 50
        assert a1[2] / max(a1[12], 1e-12) < 5

    def test_cutoff_matches_false_positive_budget(self):
        from pyp_tpu.pipeline.tomo import _score_cutoff_from_fp

        rng = np.random.RandomState(2)
        score = rng.randn(64, 64, 64).astype(np.float32)
        for n_fp in (1.0, 100.0):
            thr = _score_cutoff_from_fp(score, n_fp)
            n_above = int((score > thr).sum())
            assert 0 <= n_above <= 8 * n_fp + 8, (n_fp, thr, n_above)
        assert _score_cutoff_from_fp(score, 100.0) < _score_cutoff_from_fp(
            score, 1.0)

    def test_read_coords_dispatch(self, tmp_path):
        from pyp_tpu.io import boxfiles

        coords = np.array([[10.0, 20.0, 30.0], [5.0, 6.0, 7.0]])
        boxfiles.write_spk(coords, tmp_path / "a.spk")
        back = boxfiles.read_coords(tmp_path / "a.spk")
        np.testing.assert_allclose(back, coords, atol=0.1)
        boxfiles.write_cbox(coords[:, ::-1], 32.0, tmp_path / "a.cbox")
        back2 = boxfiles.read_coords(tmp_path / "a.cbox")
        np.testing.assert_allclose(back2, coords, atol=0.1)


class TestAlignKnobs:
    """Reference tomo_ali knobs: tilt offset, dark-tilt auto-exclusion,
    external .xf import, robust-fitting factor."""

    def _params(self, **kw):
        from pyp_tpu.config.params import defaults

        params = defaults()
        params.update({
            "scope_pixel": 2.0, "tomo_ali_method": "skip",
            "ctf_min_def": 8000, "ctf_max_def": 25000, "ctf_tile": 64,
            "ctf_max_res": 9.0, "tomo_rec_thickness": 32,
            "tomo_rec_binning": 1, "tomo_ali_bin": 1,
            "tomo_spk_method": "none",
        })
        params.update(kw)
        return params

    def test_tiltoff_and_dark_exclusion(self, tmp_path):
        from pyp_tpu.io.metadata import ItemMetadata
        from pyp_tpu.pipeline.tomo import process_tilt_series

        rng = np.random.RandomState(5)
        tilts = rng.randn(7, 128, 128).astype(np.float32) + 10.0
        tilts[3] -= 9.5  # dark tilt
        item = {"name": "ak1", "tilts": tilts,
                "angles": np.linspace(-60, 60, 7)}
        out = process_tilt_series(
            item, self._params(tomo_ali_tiltoff=2.0,
                               tomo_ali_aretomo_dark_tol=0.5), tmp_path)
        meta = ItemMetadata("ak1", tmp_path, mode="tomo").load()
        assert out["tilt_offset_deg"] == 2.0
        assert 3 in out["excluded_tilts"]
        np.testing.assert_allclose(
            meta["tlt"], np.delete(np.linspace(-60, 60, 7) + 2.0, 3))

    def test_xf_roundtrip_and_import(self, tmp_path):
        from pyp_tpu.io.imod import read_xf, write_xf
        from pyp_tpu.io.metadata import ItemMetadata
        from pyp_tpu.pipeline.tomo import process_tilt_series

        sh = np.array([[1.5, -2.0], [0.0, 3.25], [-4.0, 0.5]],
                      dtype=np.float32)
        rot = np.array([85.0, 85.5, 86.0], dtype=np.float32)
        p = tmp_path / "ak2.xf"
        write_xf(p, sh, rot)
        sh2, rot2 = read_xf(p)
        np.testing.assert_allclose(sh2, sh, atol=1e-3)
        np.testing.assert_allclose(rot2, rot, atol=1e-4)

        rng = np.random.RandomState(7)
        item = {"name": "ak2",
                "tilts": rng.randn(3, 128, 128).astype(np.float32),
                "angles": np.linspace(-30, 30, 3)}
        process_tilt_series(
            item, self._params(tomo_ali_method="import",
                               tomo_ali_import_path=str(tmp_path)),
            tmp_path)
        meta = ItemMetadata("ak2", tmp_path, mode="tomo").load()
        np.testing.assert_allclose(meta["xf"][:, :2], sh, atol=1e-3)
        np.testing.assert_allclose(meta["xf"][:, 2], rot, atol=1e-4)

    def test_robust_factor_rejects_outlier_track(self):
        from pyp_tpu.ops import tomo as tomo_ops

        # synthetic bead projections with one corrupted measurement
        T, P = 9, 6
        rng = np.random.RandomState(0)
        angles = np.linspace(-60, 60, T)
        pts = rng.uniform(-30, 30, (P, 3))
        th = np.radians(angles)
        proj = np.stack([
            np.stack([pts[:, 0],
                      pts[:, 1] * np.cos(t) + pts[:, 2] * np.sin(t)], 1)
            for t in th])  # (T, P, 2) ideal y,x
        proj = proj + np.array([64.0, 64.0])
        bad = proj.copy()
        bad[4, 2] += 25.0  # gross outlier
        m_strict, w_strict = tomo_ops.solve_projection_model_robust(
            bad, angles, (128, 128), tukey_factor=1.0)
        assert w_strict[4, 2] < 0.1  # outlier killed
        m_loose, w_loose = tomo_ops.solve_projection_model_robust(
            bad, angles, (128, 128), tukey_factor=100.0)
        assert w_loose[4, 2] > w_strict[4, 2]  # loose factor keeps it
        assert float(m_strict.residual) <= float(m_loose.residual) + 1e-3
