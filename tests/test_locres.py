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
