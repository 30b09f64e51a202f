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

    def test_wedge_filter_zeroes_sector_only(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(1)
        img = rng.randn(32, 32).astype(np.float32)
        out = np.asarray(denoise.wedge_filter_2d(jnp.asarray(img), 60.0))
        F = np.fft.rfft2(out)
        kz = np.fft.fftfreq(32).reshape(-1, 1)
        kx = np.fft.rfftfreq(32).reshape(1, -1)
        ang = np.degrees(np.arctan2(np.abs(kz), np.abs(kx)))
        assert np.abs(F[(ang > 60.0) & ~((kz == 0) & (kx == 0))]).max() < 1e-3
        # measured sector untouched
        Fin = np.fft.rfft2(img)
        keep = ang <= 60.0
        np.testing.assert_allclose(np.abs(F[keep]), np.abs(Fin[keep]),
                                   atol=1e-3)

    def test_wedge_restorer_learns_and_respects_data_consistency(self):
        """IsoNet-role self-supervised training. The net predicts only the
        missing-sector residual with a hard Fourier projection, so: the
        training loss must drop below the identity-solution bound (~all
        wedge variance, normalized to ~0.5 on these smooth volumes), the
        restored volume must keep every measured frequency exactly, and
        must put nonzero content into the wedge sector."""
        import jax.numpy as jnp

        from pyp_tpu.core.filters import apply_bandpass

        rng = np.random.RandomState(2)
        vols = np.array(apply_bandpass(
            jnp.asarray(rng.randn(3, 32, 32, 32).astype(np.float32))
            .reshape(3 * 32, 32, 32), 0.0, 0.2,
        )).reshape(3, 32, 32, 32) * 5
        wedged = np.stack([
            np.asarray(denoise.wedge_filter_3d(jnp.asarray(v), 50.0))
            for v in vols
        ])
        model = denoise.train_wedge_restorer(
            list(wedged[:2]), 50.0, patch=32, steps=300, batch=8,
            features=(8, 16))
        # learned more than the identity solution (which scores ~0.5 here:
        # the wedge fraction of slice variance)
        assert model.params["final_loss"] < 0.47, model.params["final_loss"]
        restored = denoise.restore_wedge(model, wedged[2], features=(8, 16))
        # data consistency: measured sector of every (z, x) slice unchanged
        kz = np.fft.fftfreq(32).reshape(-1, 1)
        kx = np.fft.rfftfreq(32).reshape(1, -1)
        ang = np.degrees(np.arctan2(np.abs(kz), np.abs(kx)))
        measured = ang <= 50.0
        F_in = np.fft.rfft2(wedged[2][:, 5, :])
        F_out = np.fft.rfft2(restored[:, 5, :])
        np.testing.assert_allclose(F_out[measured], F_in[measured],
                                   atol=1e-2)
        # and the wedge sector gained content
        wedge_power = np.abs(F_out[~measured]).sum()
        assert wedge_power > 1.0, wedge_power


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


@pytest.mark.slow
class TestMiner:
    def test_two_species_separate(self):
        """MiLoPYP-role miner: two distinct planted species in a synthetic
        tomogram must land in different clusters (label purity over planted
        sites), with exemplars on actual particle positions."""
        import jax.numpy as jnp

        from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
        from pyp_tpu.models import miner

        rng = np.random.RandomState(0)
        p = 16

        def species(seed):
            v = np.random.RandomState(seed).randn(p, p, p).astype(np.float32)
            v *= np.asarray(soft_spherical_mask(p, p * 0.35, 2.0))
            return np.array(lowpass_filter_3d(jnp.asarray(v), 1.0, 4.0)) * 8.0

        volA, volB = species(1), species(2)
        nz, ny, nx = 48, 96, 96
        tomo = rng.randn(nz, ny, nx).astype(np.float32) * 0.3
        sites = []
        for i in range(24):
            z0 = rng.randint(0, nz - p)
            y0 = rng.randint(0, ny - p)
            x0 = rng.randint(0, nx - p)
            which = i % 2
            tomo[z0:z0 + p, y0:y0 + p, x0:x0 + p] += volA if which == 0 else volB
            sites.append((z0 + p // 2, y0 + p // 2, x0 + p // 2, which))

        model = miner.train_miner([tomo], patch=p, n_steps=120, batch=48,
                                  seed=0)
        # embed the exact planted windows; species must separate
        wins = np.stack([
            tomo[z - p // 2:z + p // 2, y - p // 2:y + p // 2,
                 x - p // 2:x + p // 2] for z, y, x, _ in sites])
        z = miner.embed_patches(model, wins)
        labels, _ = miner.kmeans(z, 2, seed=1)
        truth = np.array([w for *_xyz, w in sites])
        agree = (labels == truth).mean()
        purity = max(agree, 1 - agree)
        assert purity > 0.85, (purity, labels, truth)

        clusters, all_labels, coords = miner.mine_tomogram(
            model, tomo, n_clusters=4, stride=p // 2)
        assert sum(c["size"] for c in clusters) == len(coords)
        assert any(len(c["exemplars"]) > 0 for c in clusters)


@pytest.mark.slow
class TestSprDenoise:
    def test_n2n_micrograph_denoising_improves_pick_image(self, tmp_path):
        """denoise_spr=n2n: the denoised pick image must correlate with the
        clean signal better than the raw average does, and picking must
        still find the planted particles."""
        import jax.numpy as jnp

        from pyp_tpu.config.params import defaults
        from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
        from pyp_tpu.io.metadata import ItemMetadata
        from pyp_tpu.pipeline import spr as spr_pipe
        from pyp_tpu.pipeline.spr import process_micrograph

        rng = np.random.RandomState(0)
        ny = nx = 256
        p = 24
        blob = rng.randn(p, p, p).astype(np.float32)
        blob *= np.asarray(soft_spherical_mask(p, p * 0.3, 2.0))
        proj = np.array(lowpass_filter_3d(jnp.asarray(blob), 1.0, 5.0)).sum(0)
        clean = np.zeros((ny, nx), np.float32)
        coords = []
        for _ in range(12):
            y0 = rng.randint(p, ny - 2 * p)
            x0 = rng.randint(p, nx - 2 * p)
            clean[y0:y0 + p, x0:x0 + p] += proj * 8.0
            coords.append((y0 + p // 2, x0 + p // 2))
        frames = clean[None] / 8 + rng.randn(8, ny, nx).astype(np.float32) * 1.5

        spr_pipe._spr_denoiser_cache.clear()
        params = defaults()
        params.update({
            "scope_pixel": 1.0, "movie_ali": "skip", "denoise_spr": "n2n",
            "denoise_epochs": 200, "ctf_tile": 128, "ctf_min_def": 8000,
            "ctf_max_def": 30000, "ctf_max_res": 8.0, "extract_box": 32,
            "detect_rad": 10, "detect_thresh": 1.0,
        })
        out = process_micrograph(
            {"name": "denmic", "frames": frames}, params, tmp_path)
        meta = ItemMetadata("denmic", tmp_path, mode="spr").load()
        assert "denoised" in meta
        avg = meta["average"]
        den = meta["denoised"]

        def cc(a):
            return np.corrcoef(a.ravel(), clean.ravel())[0, 1]

        assert cc(den) > cc(avg) + 0.05, (cc(den), cc(avg))
        assert out["particles"] > 0
        # model reused from cache on a second micrograph
        assert "model" in spr_pipe._spr_denoiser_cache


class TestMembrane:
    """Membrane segmentation NN (models/membrane.py — MemBrain-seg role)."""

    def test_synth_batch_shapes(self):
        from pyp_tpu.models import membrane as mem

        rng = np.random.RandomState(0)
        x, y = mem._synth_batch(rng, 4, 64)
        assert x.shape == (4, 64, 64) and y.shape == (4, 64, 64)
        assert 0.0 < y.mean() < 0.5  # sparse membrane labels
        assert abs(float(x.mean())) < 0.1  # normalized

    @pytest.mark.slow
    def test_segmenter_finds_membranes(self):
        import jax.numpy as jnp

        from pyp_tpu.models import membrane as mem
        from pyp_tpu.ops.template_match import spherical_shell_template

        model = mem.train_membrane_segmenter(steps=150, batch=8, patch=64,
                                             seed=0)
        # synthetic tomogram: one dark spherical shell in noise
        rng = np.random.RandomState(1)
        n = 64
        zz, yy, xx = np.mgrid[:n, :n, :n]
        r = np.sqrt((zz - 32.0) ** 2 + (yy - 32.0) ** 2 + (xx - 32.0) ** 2)
        shell = np.exp(-0.5 * ((r - 18.0) / 2.5) ** 2).astype(np.float32)
        vol = -2.0 * shell + rng.randn(n, n, n).astype(np.float32)
        prob = mem.segment_tomogram(model, vol)
        on = prob[shell > 0.5].mean()
        off = prob[(r < 12) | (r > 26)].mean()
        assert on > off + 0.15, (on, off)

        centers, rads, scores, valid = mem.detect_virions_from_segmentation(
            prob, [16.0, 18.0, 20.0], n_peaks=2)
        c = np.asarray(centers)[np.asarray(valid)]
        assert len(c) >= 1
        assert np.linalg.norm(c[0] - np.array([32, 32, 32])) < 5.0, c[0]
