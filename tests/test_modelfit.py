"""Model-map fit (the Model-fitting tab role): PDB parsing, structure
factors vs an independent real-space Gaussian rendering, translation
recovery, and right-vs-wrong model discrimination."""

import numpy as np

from pyp_tpu.analysis.modelfit import model_map_fit, model_structure_factors
from pyp_tpu.io.pdb import read_pdb, write_pdb

N = 48
PIXEL = 2.0


def make_model(seed=0, n_atoms=40, spread=24.0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-spread, spread, (n_atoms, 3)).astype(np.float32)
    return {
        "coords": xyz,
        "weights": np.full(n_atoms, 6.0, np.float32),
        "bfactors": np.zeros(n_atoms, np.float32),
        "elements": ["C"] * n_atoms,
    }


def render_real_space(model, n, pixel, sigma_a=4.0):
    """Independent rendering: Gaussians stamped on the real grid."""
    vol = np.zeros((n, n, n), np.float32)
    g = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1)
    center = model["coords"].mean(axis=0)
    for (x, y, z), w in zip(model["coords"], model["weights"]):
        p = (np.array([z, y, x]) - center[::-1]) / pixel + n // 2
        d2 = np.sum((g - p) ** 2, axis=-1) * pixel**2
        vol += w * np.exp(-d2 / (2 * sigma_a**2))
    return vol


class TestPdbIo:
    def test_roundtrip(self, tmp_path):
        m = make_model()
        p = tmp_path / "m.pdb"
        write_pdb(m["coords"], p, elements=m["elements"])
        back = read_pdb(p)
        np.testing.assert_allclose(back["coords"], m["coords"], atol=1e-3)
        assert back["weights"][0] == 6.0  # carbon


class TestStructureFactors:
    def test_matches_real_space_rendering(self):
        """F_model from the chunked exponential sums must equal the FFT of
        an independently rendered Gaussian-atom density (within the band
        the Gaussian envelope keeps)."""
        m = make_model(n_atoms=12, spread=16.0)
        sigma_a = 4.0
        # Gaussian of real-space sigma s <-> B = 8 pi^2 s^2 ... in our
        # e^{-B k^2/4} convention with k in cycles/px and B in px^2:
        # real-space sigma_px^2 = B_px2 / (8 pi^2) * (2 pi)^2 ... easier:
        # match empirically via the same envelope on both sides.
        vol = render_real_space(m, N, PIXEL, sigma_a=sigma_a)
        F_ref = np.fft.rfftn(vol)
        # model spectrum with the equivalent B: density e^{-r^2/2s^2} has
        # spectrum e^{-2 pi^2 s_px^2 k^2}; our envelope is
        # e^{-B_px2 k^2 / 4} -> B_px2 = 8 pi^2 s_px^2, B_A2 = B_px2*pix^2
        s_px = sigma_a / PIXEL
        B_a2 = 8 * np.pi**2 * s_px**2 * PIXEL**2
        F_mod = np.asarray(model_structure_factors(
            m, PIXEL, N, extra_bfactor_a2=B_a2))
        # compare within a generous band (corners differ by tiny numbers)
        cc = np.corrcoef(
            np.concatenate([F_ref.real.ravel(), F_ref.imag.ravel()]),
            np.concatenate([F_mod.real.ravel(), F_mod.imag.ravel()]))[0, 1]
        assert cc > 0.99, cc


def _matched_b(sigma_a=4.0):
    """B (Å²) whose Fourier envelope equals a sigma_a real-space Gaussian."""
    s_px = sigma_a / PIXEL
    return 8 * np.pi**2 * s_px**2 * PIXEL**2


class TestFit:
    def test_high_cc_for_matching_model_low_for_wrong(self):
        m = make_model(seed=1)
        vol = render_real_space(m, N, PIXEL)
        fit = model_map_fit(m, vol, PIXEL, high_res=10.0,
                            extra_bfactor_a2=_matched_b())
        assert fit["cc"] > 0.9, fit["cc"]
        wrong = make_model(seed=99)
        fit_w = model_map_fit(wrong, vol, PIXEL, high_res=10.0,
                              extra_bfactor_a2=_matched_b())
        assert fit["cc"] > fit_w["cc"] + 0.2, (fit["cc"], fit_w["cc"])

    def test_recovers_known_translation(self):
        m = make_model(seed=2)
        vol = render_real_space(m, N, PIXEL)
        shift = (3, -2, 4)
        vol_s = np.roll(vol, shift, axis=(0, 1, 2))
        fit = model_map_fit(m, vol_s, PIXEL, high_res=10.0,
                            extra_bfactor_a2=_matched_b())
        assert tuple(fit["shift_px"]) == shift, fit["shift_px"]
        assert fit["cc"] > 0.9, fit["cc"]
        # model-map FSC is high in the low-res shells
        assert np.median(fit["fsc"][2:8]) > 0.8
