"""Heterogeneity VAE test: two-state particles must separate in latent space
and decode into state-specific volumes."""

import numpy as np
import pytest

from pyp_tpu.models import heterogeneity as het
from tests.test_refine3d import make_particles, make_volume, N, PIXEL


@pytest.mark.slow
class TestHeterogeneity:
    def test_two_state_latent_separation(self):
        volA = make_volume(seed=0)
        volB = make_volume(seed=77)
        imgsA, cpA, truthA = make_particles(volA, n_particles=48, noise=0.05, seed=1)
        imgsB, cpB, truthB = make_particles(volB, n_particles=48, noise=0.05, seed=2)
        stack = np.concatenate([np.asarray(imgsA), np.asarray(imgsB)])
        ctf = np.concatenate([np.asarray(cpA), np.asarray(cpB)])
        labels = np.array([0] * 48 + [1] * 48)
        poses = np.concatenate([
            np.stack([truthA["phi"], truthA["theta"], truthA["psi"],
                      -truthA["shifts"][:, 0], -truthA["shifts"][:, 1]], 1),
            np.stack([truthB["phi"], truthB["theta"], truthB["psi"],
                      -truthB["shifts"][:, 0], -truthB["shifts"][:, 1]], 1),
        ]).astype(np.float32)

        model = het.train_heterogeneity(
            stack, poses, ctf, PIXEL, latent_dim=4, steps=400, batch=24,
            high_res=2.5 * PIXEL, kl_weight=1e-4, seed=0,
        )
        z = het.embed(model, stack)
        assert z.shape == (96, 4)

        # 2-means in latent space must separate the states
        pc, _, _ = het.latent_pca(z, 1)
        pred = (pc[:, 0] > np.median(pc[:, 0])).astype(int)
        agree = (pred == labels).mean()
        purity = max(agree, 1 - agree)
        assert purity > 0.8, purity

        # decoded volumes at the true state centers match their own state
        zA = z[labels == 0].mean(axis=0)
        zB = z[labels == 1].mean(axis=0)
        vA = het.decode_volume(model, zA)
        vB = het.decode_volume(model, zB)

        def cc(a, b):
            return np.corrcoef(a.ravel(), b.ravel())[0, 1]

        matched = cc(vA, volA) + cc(vB, volB)
        crossed = cc(vA, volB) + cc(vB, volA)
        assert matched > crossed, (matched, crossed)
        # coarse neural rendering from 48 particles / 400 steps: modest
        # absolute correlation; the state discrimination above is the signal
        assert cc(vA, volA) > 0.2, cc(vA, volA)
