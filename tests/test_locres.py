"""Local resolution estimation + local filtering (relion_postprocess
--locres role, reference postprocess/core.py:325-364).

Synthetic half maps with a known resolution gradient: the left half of the
box carries signal to ~6 Å, the right half only to ~20 Å; beyond its band
each half sees independent noise. The local-resolution map must separate
the two regions, and the locally-filtered map must keep the left half's
high-frequency power while suppressing the right half's noise.
"""

import jax.numpy as jnp
import numpy as np

from pyp_tpu.core.filters import lowpass_filter_3d
from pyp_tpu.postprocess.locres import local_filter, local_resolution

N = 96
PIXEL = 2.0


def make_halves(seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randn(N, N, N).astype(np.float32)
    hi = np.asarray(lowpass_filter_3d(jnp.asarray(base), PIXEL, 6.0))
    lo = np.asarray(lowpass_filter_3d(jnp.asarray(base), PIXEL, 20.0))
    # resolution gradient along x: hi-res left, lo-res right
    ramp = np.zeros((1, 1, N), dtype=np.float32)
    ramp[..., : N // 2] = 1.0
    signal = hi * ramp + lo * (1.0 - ramp)
    noise_amp = 0.15 * signal.std()
    h1 = signal + noise_amp * rng.randn(N, N, N).astype(np.float32)
    h2 = signal + noise_amp * rng.randn(N, N, N).astype(np.float32)
    return signal, h1, h2


class TestLocalResolution:
    def test_separates_hi_and_lo_res_regions(self):
        _, h1, h2 = make_halves()
        locres, points, values = local_resolution(
            h1, h2, PIXEL, sampling_a=16.0, minres_a=50.0)
        locres = np.asarray(locres)
        assert locres.shape == (N, N, N)
        assert np.all(values >= 2 * PIXEL - 1e-6)
        assert np.all(values <= 50.0 + 1e-6)
        # small soft windows make the FSC optimistic in absolute terms
        # (shell leakage through the mask kernel — also true of RELION's
        # locres); what matters is the regions separate cleanly
        # evaluate only zones whose windows (radius ~12 px) never
        # straddle the boundary at N//2
        left = np.median(locres[:, :, : N // 4])
        right = np.median(locres[:, :, 3 * N // 4:])
        assert left < 6.0, (left, right)
        assert right > 1.8 * left, (left, right)

    def test_local_filter_preserves_hi_kills_lo(self):
        signal, h1, h2 = make_halves(seed=3)
        combined = 0.5 * (h1 + h2)
        locres, _, _ = local_resolution(
            h1, h2, PIXEL, sampling_a=16.0, minres_a=50.0)
        filt = np.asarray(local_filter(combined, locres, PIXEL))
        assert filt.shape == combined.shape

        # the user-relevant claim: filtering at the LOCAL resolution beats
        # the unfiltered map against ground truth everywhere — it removes
        # out-of-band noise in the soft zone without blurring the sharp one
        left = slice(None), slice(None), slice(0, N // 4)
        right = slice(None), slice(None), slice(2 * N // 3, 11 * N // 12)

        def err(v, region):
            return float(np.linalg.norm((v - signal)[region]))

        assert err(filt, right) < 0.65 * err(combined, right), (
            err(filt, right), err(combined, right))
        assert err(filt, left) < err(combined, left), (
            err(filt, left), err(combined, left))
        # and the sharp zone keeps its high-frequency signal: correlation
        # with truth must not drop below the unfiltered map's
        cc_filt = np.corrcoef(filt[left].ravel(), signal[left].ravel())[0, 1]
        cc_comb = np.corrcoef(combined[left].ravel(),
                              signal[left].ravel())[0, 1]
        assert cc_filt >= cc_comb - 1e-4, (cc_filt, cc_comb)


class TestPostprocessIntegration:
    def test_postprocess_latest_writes_locres_maps(self, tmp_path):
        from pyp_tpu.io import mrc
        from pyp_tpu.postprocess.core import postprocess_latest

        _, h1, h2 = make_halves()
        maps = tmp_path / "maps"
        maps.mkdir()
        mrc.write(h1, maps / "ds_r01_02_half1.mrc", pixel_size=PIXEL)
        mrc.write(h2, maps / "ds_r01_02_half2.mrc", pixel_size=PIXEL)
        out = postprocess_latest("ds", {
            "sharpen_locres": True,
            "sharpen_locres_sampling": 20.0,
        }, tmp_path)
        assert "locres_map" in out and "locfilt_map" in out
        lr = mrc.read(out["locres_map"])
        assert lr.shape == (N, N, N)
        assert 2 * PIXEL <= np.median(lr) <= 50.0
        assert mrc.read(out["locfilt_map"]).shape == (N, N, N)

    def test_ampl_corr_outputs(self, tmp_path):
        """--ampl_corr role: amplitude correlation high in-band where the
        halves share signal, DPR small there and large beyond."""
        from pyp_tpu.core.fsc import amplitude_correlation_and_dpr
        from pyp_tpu.io import mrc
        from pyp_tpu.postprocess.core import postprocess_latest

        _, h1, h2 = make_halves()
        fa, ac, dpr = amplitude_correlation_and_dpr(h1, h2)
        fa, ac, dpr = map(np.asarray, (fa, ac, dpr))
        # halves share signal to ~6 A in the left zone -> low shells agree
        assert np.median(ac[2:8]) > 0.8, ac[:8]
        assert np.median(dpr[2:8]) < 30.0, dpr[:8]
        assert np.median(dpr[-8:]) > np.median(dpr[2:8])

        maps = tmp_path / "maps"
        maps.mkdir()
        mrc.write(h1, maps / "ds_r01_02_half1.mrc", pixel_size=PIXEL)
        mrc.write(h2, maps / "ds_r01_02_half2.mrc", pixel_size=PIXEL)
        out = postprocess_latest("ds", {"sharpen_ampl_corr": True},
                                 tmp_path)
        tab = np.loadtxt(out["ampl_corr"])
        assert tab.shape[1] == 3 and len(tab) == N // 2

    def test_user_mask_and_half_maps(self, tmp_path):
        from pyp_tpu.io import mrc
        from pyp_tpu.postprocess.core import postprocess_latest

        _, h1, h2 = make_halves()
        maps = tmp_path / "maps"
        maps.mkdir()
        mrc.write(h1, maps / "ds_r01_02_half1.mrc", pixel_size=PIXEL)
        mrc.write(h2, maps / "ds_r01_02_half2.mrc", pixel_size=PIXEL)
        # a hard box mask over the left half only
        user = np.zeros((N, N, N), dtype=np.float32)
        user[:, :, : N // 2] = 1.0
        mpath = tmp_path / "user_mask.mrc"
        mrc.write(user, mpath, pixel_size=PIXEL)
        out = postprocess_latest("ds", {
            "sharpen_mask": str(mpath),
            "sharpen_half_maps": True,
        }, tmp_path)
        final = mrc.read(out["map"])
        # the user mask is honored: right half zeroed in the output
        assert np.abs(final[:, :, 3 * N // 4:]).max() < 1e-5
        assert np.abs(final[:, :, : N // 4]).std() > 0
        for tag in ("half1", "half2"):
            hp = out[f"{tag}_postprocessed"]
            assert mrc.read(hp).shape == (N, N, N)


class TestMtfCorrection:
    def test_divides_out_known_mtf(self, tmp_path):
        from pyp_tpu.postprocess.core import mtf_correct

        rng = np.random.RandomState(0)
        vol = np.asarray(lowpass_filter_3d(
            jnp.asarray(rng.randn(48, 48, 48).astype(np.float32)),
            PIXEL, 6.0))
        # synthetic sinc-like falling MTF, applied radially
        f_tab = np.linspace(0.0, 0.75, 40)
        v_tab = 1.0 / (1.0 + 4.0 * f_tab)
        n = 48
        fz = np.fft.fftfreq(n).reshape(n, 1, 1)
        fy = np.fft.fftfreq(n).reshape(1, n, 1)
        fx = np.fft.rfftfreq(n).reshape(1, 1, -1)
        r = np.sqrt(fz**2 + fy**2 + fx**2)
        damp = np.interp(r, f_tab, v_tab).astype(np.float32)
        degraded = np.fft.irfftn(np.fft.rfftn(vol) * damp, s=vol.shape,
                                 axes=(0, 1, 2))

        table = tmp_path / "mtf.txt"
        np.savetxt(table, np.stack([f_tab, v_tab], 1))
        restored = np.asarray(mtf_correct(degraded, PIXEL, table))
        # recovery to float32 FFT accuracy
        rel = (np.linalg.norm(restored - vol)
               / np.linalg.norm(vol))
        assert rel < 1e-3, rel

    def test_reads_relion_star_format(self, tmp_path):
        from pyp_tpu.postprocess.core import read_mtf_curve

        p = tmp_path / "mtf.star"
        p.write_text(
            "data_mtf\n\nloop_\n_rlnResolutionInversePixel #1\n"
            "_rlnMtfValue #2\n0.0 1.0\n0.25 0.7\n0.5 0.4\n")
        f, v = read_mtf_curve(p)
        assert np.allclose(f, [0.0, 0.25, 0.5])
        assert np.allclose(v, [1.0, 0.7, 0.4])


class TestSharpenCards:
    """New sharpen cards (sharpen_cistem/sharpen_relion alias targets):
    explicit inputs, spherical shell mask, split-B, handedness flip,
    randomize-at-FSC."""

    def test_single_map_input_and_invert_handedness(self, tmp_path):
        from pyp_tpu.io import mrc
        from pyp_tpu.postprocess.core import postprocess_latest

        _, h1, h2 = make_halves()
        single = tmp_path / "my_map.mrc"
        mrc.write(((h1 + h2) / 2).astype(np.float32), single,
                  pixel_size=PIXEL)
        out = postprocess_latest("ds", {
            "sharpen_input_map": str(single),
            "sharpen_invert_handedness": True,
            "sharpen_high_res_limit": 3.0 * PIXEL,
            "sharpen_apply_mask": False,
            "sharpen_fsc_weight": False,
        }, tmp_path)
        flipped = mrc.read(out["map"])
        # re-run without the flip: the two outputs mirror through z
        out2 = postprocess_latest("ds", {
            "sharpen_input_map": str(single),
            "sharpen_high_res_limit": 3.0 * PIXEL,
            "sharpen_apply_mask": False,
            "sharpen_fsc_weight": False,
        }, tmp_path)
        plain = mrc.read(out2["map"])
        np.testing.assert_allclose(flipped, plain[::-1], atol=1e-5)

    def test_explicit_halves_and_spherical_mask(self, tmp_path):
        from pyp_tpu.io import mrc
        from pyp_tpu.postprocess.core import postprocess_latest

        _, h1, h2 = make_halves()
        p1, p2 = tmp_path / "a_half1.mrc", tmp_path / "b_half2.mrc"
        mrc.write(h1, p1, pixel_size=PIXEL)
        mrc.write(h2, p2, pixel_size=PIXEL)
        out = postprocess_latest("ds", {
            "sharpen_first_half": str(p1),
            "sharpen_second_half": str(p2),
            "sharpen_outer_mask_radius": N * PIXEL * 0.3,
        }, tmp_path)
        m = mrc.read(out["map"])
        assert m.shape == (N, N, N)
        # spherical mask: corners are (softly) zeroed
        assert abs(m[0, 0, 0]) < 1e-6
        assert out["resolution_A"] > 0

    def test_split_bfactor_changes_spectrum(self):
        from pyp_tpu.postprocess.core import sharpen_map

        vol, _, _ = make_halves()
        flat, _ = sharpen_map(vol, PIXEL, bfactor=0.0)
        split, _ = sharpen_map(vol, PIXEL, bfactor=-300.0, bfactor_low=0.0,
                               flatten_res=8.0)
        # the split-B map boosts high frequencies relative to the flat one
        def hf_power(v):
            F = np.abs(np.fft.rfftn(np.asarray(v))) ** 2
            return F[N // 4:, :, :].sum()
        assert hf_power(split) > 1.5 * hf_power(flat)

    def test_randomize_at_fsc_picks_cutoff(self, tmp_path):
        from pyp_tpu.io import mrc
        from pyp_tpu.postprocess.core import postprocess_latest

        _, h1, h2 = make_halves()
        maps = tmp_path / "maps"
        maps.mkdir()
        mrc.write(h1, maps / "ds_r01_02_half1.mrc", pixel_size=PIXEL)
        mrc.write(h2, maps / "ds_r01_02_half2.mrc", pixel_size=PIXEL)
        out = postprocess_latest("ds", {
            "sharpen_randomize_at_fsc": 0.8,
            "sharpen_random_seed": 3,
        }, tmp_path)
        assert out["resolution_A"] > 0


class TestSharpenStrategies:
    """Reference sharpen-tab strategy params: masking methods, threshold
    strategies, FSC^2 weighting, gaussian lowpass, highpass, flips."""

    def _run(self, tmp_path, extra):
        from pyp_tpu.io import mrc
        from pyp_tpu.postprocess.core import postprocess_latest

        _, h1, h2 = make_halves()
        maps = tmp_path / "maps"
        maps.mkdir(exist_ok=True)
        mrc.write(h1, maps / "ds_r01_02_half1.mrc", pixel_size=PIXEL)
        mrc.write(h2, maps / "ds_r01_02_half2.mrc", pixel_size=PIXEL)
        return postprocess_latest("ds", dict({"plot_per_item": False},
                                             **extra), tmp_path)

    def test_volume_fraction_threshold(self, tmp_path):
        from pyp_tpu.postprocess.core import auto_mask

        _, h1, h2 = make_halves()
        m = np.asarray(auto_mask(h1 + h2, pixel_size=PIXEL,
                                 volume_fraction=0.1))
        # the binary core covers ~10% of voxels before dilation/soft edge
        assert 0.05 < (m > 0.99).mean() < 0.45, (m > 0.99).mean()
        m_abs = np.asarray(auto_mask(h1 + h2, pixel_size=PIXEL,
                                     threshold_abs=float((h1 + h2).max())))
        assert (m_abs > 0.99).mean() < 0.01  # absolute thr above max -> ~0

    def test_strategy_params_run_end_to_end(self, tmp_path):
        out = self._run(tmp_path, {
            "sharpen_masking_method": "auto",
            "sharpen_masking_threshold_method": "volume",
            "sharpen_automask_fraction": 0.15,
            "sharpen_bfactor_method": "auto",
            "sharpen_bfactor": -123.0,   # must be ignored (auto forces fit)
            "sharpen_randomize_method": "fsc",
            "sharpen_apply_fsc2": True,
            "sharpen_gaussian": True,
            "sharpen_highpass": 100.0,
        })
        assert out["resolution_A"] > 0
        assert out["bfactor"] != -123.0  # Guinier fit ran, not adhoc

    def test_flips(self, tmp_path):
        from pyp_tpu.io import mrc

        out = self._run(tmp_path, {"sharpen_apply_mask": False})
        base = mrc.read(out["map"])
        out_x = self._run(tmp_path, {"sharpen_apply_mask": False,
                                     "sharpen_flip_x": True})
        flipped = mrc.read(out_x["map"])
        np.testing.assert_allclose(flipped, base[:, :, ::-1], atol=1e-5)
