"""2D classification tests: separate known classes, recover alignments."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.core.filters import apply_bandpass, soft_circular_mask
from pyp_tpu.ops import refine2d
from pyp_tpu.ops.fourier_slice import image_to_fourier, fourier_to_image
from pyp_tpu.ops.reconstruct import _ctf_grids, _shift_correct


N = 48
PIXEL = 2.0


def make_class_images(n_classes=3, seed=0):
    rng = np.random.RandomState(seed)
    mask = np.asarray(soft_circular_mask(N, N * 0.35, 3.0))
    outs = []
    for _ in range(n_classes):
        img = rng.randn(N, N).astype(np.float32)
        img = np.array(apply_bandpass(jnp.asarray(img)[None], 0.0, 0.2)[0]) * mask
        outs.append(img * 10)
    return np.stack(outs)


def make_dataset(classes, per_class=16, noise=0.4, seed=1):
    rng = np.random.RandomState(seed)
    K = classes.shape[0]
    imgs, labels, psis, shifts = [], [], [], []
    for k in range(K):
        for _ in range(per_class):
            psi = rng.uniform(0, 360)
            sh = rng.uniform(-2, 2, 2).astype(np.float32)
            img = np.array(refine2d._rotate_images(jnp.asarray(classes[k])[None], jnp.asarray([psi]))[0])
            F = _shift_correct(image_to_fourier(jnp.asarray(img)[None]), -jnp.asarray(sh)[None], N)
            img = np.array(fourier_to_image(F, N)[0])
            imgs.append(img)
            labels.append(k)
            psis.append(psi)
            shifts.append(sh)
    imgs = np.stack(imgs)
    imgs += noise * np.abs(imgs).max() * rng.randn(*imgs.shape).astype(np.float32)
    df = rng.uniform(12000, 20000, len(imgs)).astype(np.float32)
    ctf = np.stack([df, df, np.zeros_like(df), np.zeros_like(df)], 1)
    # apply CTF to images
    grids = _ctf_grids(N, PIXEL, jnp.asarray(ctf), 300.0, 2.7, 0.07)
    imgs = np.array(fourier_to_image(image_to_fourier(jnp.asarray(imgs)) * grids, N))
    return jnp.asarray(imgs), jnp.asarray(ctf), np.array(labels)


def cluster_purity(assign, labels, K):
    """Best-case purity via greedy matching of clusters to labels."""
    total = 0
    for k in range(K):
        members = labels[assign == k]
        if len(members):
            total += np.bincount(members, minlength=K).max()
    return total / len(labels)


class TestClassify2D:
    @pytest.mark.slow
    def test_separates_classes(self):
        classes = make_class_images(3)
        imgs, ctf, labels = make_dataset(classes, per_class=12, noise=0.3)
        res = refine2d.classify2d(imgs, ctf, 3, PIXEL, iters=8,
                                  psi_step=20.0, high_res=3.0 * PIXEL, seed=3)
        purity = cluster_purity(np.asarray(res.assignments), labels, 3)
        assert purity > 0.8, purity

    def test_class_averages_match_truth(self):
        classes = make_class_images(2, seed=5)
        imgs, ctf, labels = make_dataset(classes, per_class=16, noise=0.25, seed=6)
        res = refine2d.classify2d(imgs, ctf, 2, PIXEL, iters=8,
                                  psi_step=20.0, high_res=3.0 * PIXEL, seed=4)
        # each true class should correlate strongly with some average under
        # some rotation: check via rotationally-averaged power correlation
        avgs = np.asarray(res.class_avgs)
        found = 0
        for k in range(2):
            best = 0
            for j in range(2):
                for ang in np.arange(0, 360, 10.0):
                    r = np.array(refine2d._rotate_images(jnp.asarray(avgs[j])[None], jnp.asarray([ang]))[0])
                    cc = np.corrcoef(r.ravel(), classes[k].ravel())[0, 1]
                    best = max(best, cc)
            if best > 0.55:
                found += 1
        assert found == 2, found

    def test_alignment_recovery_single_class(self):
        classes = make_class_images(1, seed=8)
        imgs, ctf, labels = make_dataset(classes, per_class=16, noise=0.2, seed=9)
        res = refine2d.classify2d(imgs, ctf, 1, PIXEL, iters=6,
                                  psi_step=10.0, high_res=3.0 * PIXEL)
        assert float(jnp.mean(res.scores)) > 0.3
        assert int(res.occupancy[0]) == 16


class TestClassify2DStaged:
    """The reference's staged class2d protocol ([tabs.class2d]): three EM
    phases over growing particle subsets, warm-started averages, optional
    reduced classification grid."""

    def test_staged_separates_classes(self):
        from pyp_tpu.config.params import defaults

        classes = make_class_images(2, seed=5)
        imgs, ctf, labels = make_dataset(classes, per_class=16, noise=0.25,
                                         seed=6)
        params = defaults()
        params.update({
            "class_num": 2, "class_rhcls": 3.0 * PIXEL,
            "class_rlcls": 100.0, "class_psi_step": 20.0,
            "class2d_iters_init": 4, "class2d_iters_seed": 3,
            "class2d_iters_refine": 2,
            "class2d_max_ab_initio": 16,   # phase 1 sees half the data
            "class2d_fraction": 1.0, "class_seed": 4,
        })
        res = refine2d.classify2d_staged(np.asarray(imgs), np.asarray(ctf),
                                         params, PIXEL)
        assert len(np.asarray(res.assignments)) == len(labels)
        purity = cluster_purity(np.asarray(res.assignments), labels, 2)
        assert purity > 0.75, purity

    def test_staged_reduced_grid(self):
        """class2d_bin classifies on a Fourier-cropped grid; assignments
        still cover every particle and the averages live on the small box."""
        from pyp_tpu.config.params import defaults

        classes = make_class_images(2, seed=7)
        imgs, ctf, labels = make_dataset(classes, per_class=10, noise=0.2,
                                         seed=8)
        params = defaults()
        params.update({
            "class_num": 2, "class_rhcls": 5.0 * PIXEL,
            "class2d_bin": 2, "class2d_rad": N * PIXEL * 0.4,
            "class2d_iters_init": 3, "class2d_iters_seed": 2,
            "class2d_iters_refine": 2, "class_seed": 4,
        })
        res = refine2d.classify2d_staged(np.asarray(imgs), np.asarray(ctf),
                                         params, PIXEL)
        # the working grid floors at 32 px (smaller boxes starve the polar
        # machinery): N=48 at bin 2 -> 32, not 24
        assert res.class_avgs.shape[-1] == max(32, N // 2)
        assert len(np.asarray(res.assignments)) == len(labels)

    def test_warm_start_keeps_averages(self):
        """classify2d(init_avgs=...) with zero-ish iterations returns
        assignments against the provided averages (no random re-seed)."""
        classes = make_class_images(2, seed=9)
        imgs, ctf, labels = make_dataset(classes, per_class=8, noise=0.15,
                                         seed=10)
        res = refine2d.classify2d(imgs, ctf, 2, PIXEL, iters=1,
                                  psi_step=20.0, high_res=3.0 * PIXEL,
                                  init_avgs=classes)
        purity = cluster_purity(np.asarray(res.assignments), labels, 2)
        assert purity > 0.9, purity
