"""NN model tests: learned picker recovers planted particles; noise2noise
denoiser beats the noisy input."""

import numpy as np
import pytest

from pyp_tpu.models import denoise, picker


def make_labeled_micrographs(n_mics=2, n=256, n_particles=12, radius=8, seed=0):
    rng = np.random.RandomState(seed)
    mics, coords = [], []
    ax = np.arange(-2 * radius, 2 * radius + 1)
    blob = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (radius**2 / 1.5))
    for _ in range(n_mics):
        img = rng.randn(n, n).astype(np.float32) * 0.6
        cs = []
        while len(cs) < n_particles:
            y, x = rng.randint(3 * radius, n - 3 * radius, 2)
            if all(abs(y - a) + abs(x - b) > 4 * radius for a, b in cs):
                cs.append((y, x))
        for y, x in cs:
            img[y - 2 * radius:y + 2 * radius + 1, x - 2 * radius:x + 2 * radius + 1] -= 2.5 * blob
        mics.append(img)
        coords.append(np.array(cs))
    return mics, coords


@pytest.mark.slow
class TestPicker:
    def test_train_and_pick(self):
        mics, coords = make_labeled_micrographs()
        model = picker.train_picker(
            mics, coords, radius_px=8, patch=64, steps=150, batch=8,
            features=(8, 16, 32),
        )
        test_mics, test_coords = make_labeled_micrographs(n_mics=1, seed=5)
        heat = picker.infer_heatmap(model, test_mics[0], features=(8, 16, 32))
        found, vals, valid = picker.pick_from_heatmap(heat, 8, threshold=0.3)
        found = found[valid]
        hits = sum(
            1 for y, x in test_coords[0]
            if np.abs(found - [y, x]).sum(axis=1).min() < 8
        )
        assert hits >= len(test_coords[0]) * 0.7, (hits, len(test_coords[0]))


@pytest.mark.slow
class TestDenoise:
    def test_noise2noise_improves(self):
        rng = np.random.RandomState(0)
        # shared signal with two independent noise realizations
        from pyp_tpu.core.filters import apply_bandpass
        import jax.numpy as jnp

        signal = np.array(apply_bandpass(
            jnp.asarray(rng.randn(4, 128, 128).astype(np.float32)), 0.0, 0.15
        )) * 3
        a = signal + rng.randn(*signal.shape).astype(np.float32)
        b = signal + rng.randn(*signal.shape).astype(np.float32)
        model = denoise.train_denoiser(
            list(a[:3]), list(b[:3]), patch=64, steps=200, batch=8,
            features=(8, 16, 32),
        )
        out = denoise.denoise_image(model, a[3], features=(8, 16, 32))
        err_in = float(np.mean((a[3] - signal[3]) ** 2))
        err_out = float(np.mean((out - signal[3]) ** 2))
        assert err_out < err_in * 0.8, (err_in, err_out)


@pytest.mark.slow
class TestNnPickingPipeline:
    def test_detect_method_nn(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from pyp_tpu.config.params import defaults
        from pyp_tpu.models import io as mio
        from pyp_tpu.pipeline.spr import process_micrograph

        mics, coords = make_labeled_micrographs(n_mics=2)
        model = picker.train_picker(mics, coords, radius_px=8, patch=64,
                                    steps=120, batch=8, features=(8, 16, 32))
        mio.save_params(model.params, tmp_path / "picker_model.npz", patch=64)

        test_mics, test_coords = make_labeled_micrographs(n_mics=1, seed=9)
        params = defaults()
        params.update({
            "scope_pixel": 1.0, "detect_method": "nn", "detect_rad": 8,
            "movie_ali": "skip", "ctf_tile": 128, "ctf_min_def": 8000,
            "ctf_max_def": 30000, "ctf_max_res": 8.0, "extract_box": 32,
        })
        out = process_micrograph(
            {"name": "nnmic", "frames": test_mics[0][None]}, params, tmp_path)
        assert out["particles"] > 0
        from pyp_tpu.io.metadata import ItemMetadata

        meta = ItemMetadata("nnmic", tmp_path, mode="spr").load()
        found = meta["box"][:, :2]
        hits = sum(1 for y, x in test_coords[0]
                   if np.abs(found - [y, x]).sum(axis=1).min() < 8)
        assert hits >= len(test_coords[0]) * 0.6, hits
