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


def make_tilt_stacks(vol, n_particles, T=5, noise=0.05, seed=1):
    """Per-particle tilt stacks: particle orientation M_p observed through a
    tilt geometry R_t, each projection CTF-modulated at its tilt defocus."""
    import jax.numpy as jnp

    from pyp_tpu.ops import csp as csp_ops, fourier_slice as fs
    from pyp_tpu.ops.refine3d import _ctf_at_points
    from pyp_tpu.core.geometry import euler_to_matrix, matrix_to_euler

    rng = np.random.RandomState(seed)
    P = n_particles
    eulers = rng.uniform(0, 360, (P, 3)).astype(np.float32)
    tilt_angles = np.linspace(-45, 45, T).astype(np.float32)
    M = np.asarray(euler_to_matrix(eulers[:, 0], eulers[:, 1], eulers[:, 2]))
    Rt = np.asarray(csp_ops.tilt_rotation(jnp.asarray(tilt_angles),
                                          jnp.zeros(T)))
    R_eff = np.einsum("tij,pjk->tpik", Rt, M)

    Fv = fs.volume_to_fourier(jnp.asarray(vol))
    ky = (np.fft.fftfreq(N) * N).astype(np.float32)
    kx = np.arange(N // 2 + 1, dtype=np.float32)
    grid_pts = jnp.asarray(np.stack(np.meshgrid(ky, kx, indexing="ij"), -1))
    df = np.float32(15000.0)
    ctfv = _ctf_at_points(grid_pts[None], N, PIXEL, df, df, 0.0,
                          300.0, 2.7, 0.07, 0.0)

    stacks = np.zeros((P, T, N, N), dtype=np.float32)
    for t in range(T):
        F = fs.project(Fv, jnp.asarray(R_eff[t]), N)
        imgs = np.asarray(fs.fourier_to_image(F * ctfv, N))
        stacks[:, t] = imgs
    stacks += noise * np.abs(stacks).max() * rng.randn(*stacks.shape).astype(
        np.float32)

    phi, theta, psi = matrix_to_euler(jnp.asarray(R_eff))
    poses = np.zeros((P, T, 5), dtype=np.float32)
    poses[:, :, 0] = np.asarray(phi).T
    poses[:, :, 1] = np.asarray(theta).T
    poses[:, :, 2] = np.asarray(psi).T
    ctf = np.zeros((P, T, 4), dtype=np.float32)
    ctf[:, :, 0] = df
    ctf[:, :, 1] = df
    return stacks, poses, ctf


@pytest.mark.slow
class TestHeterogeneityTilt:
    def test_two_state_tilt_latents_separate(self):
        """tomoDRGN role: tilt stacks of two conformations must separate in
        the pooled latent space."""
        volA = make_volume(seed=0)
        volB = make_volume(seed=77)
        sA, pA, cA = make_tilt_stacks(volA, 24, seed=1)
        sB, pB, cB = make_tilt_stacks(volB, 24, seed=2)
        stacks = np.concatenate([sA, sB])
        poses = np.concatenate([pA, pB])
        ctf = np.concatenate([cA, cB])
        labels = np.array([0] * 24 + [1] * 24)

        model = het.train_heterogeneity_tilt(
            stacks, poses, ctf, PIXEL, latent_dim=4, steps=300, batch=8,
            high_res=2.5 * PIXEL, kl_weight=1e-4, seed=0)
        z = het.embed_tilt(model, stacks)
        assert z.shape == (48, 4)
        pc, _, _ = het.latent_pca(z, 1)
        pred = (pc[:, 0] > np.median(pc[:, 0])).astype(int)
        agree = (pred == labels).mean()
        purity = max(agree, 1 - agree)
        assert purity > 0.8, purity

        # decoded state volumes match their own conformation
        zA = z[labels == 0].mean(axis=0)
        zB = z[labels == 1].mean(axis=0)
        vA = het.decode_volume(model, zA)
        vB = het.decode_volume(model, zB)

        def cc(a, b):
            return np.corrcoef(a.ravel(), b.ravel())[0, 1]

        assert cc(vA, volA) + cc(vB, volB) > cc(vA, volB) + cc(vB, volA)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        """het_model.npz round-trips params and config; embeddings match
        exactly (heterogeneitytrain/eval role)."""
        vol = make_volume(seed=0)
        imgs, cp, truth = make_particles(vol, n_particles=8, noise=0.1,
                                         seed=1)
        poses = np.stack([truth["phi"], truth["theta"], truth["psi"],
                          -truth["shifts"][:, 0], -truth["shifts"][:, 1]],
                         1).astype(np.float32)
        model = het.train_heterogeneity(np.asarray(imgs), poses,
                                        np.asarray(cp), PIXEL,
                                        latent_dim=3, steps=5, batch=4)
        p = tmp_path / "het_model.npz"
        het.save_model(model, p)
        back = het.load_model(p)
        assert back.latent_dim == 3 and back.n == N
        assert abs(back.pixel_size - PIXEL) < 1e-9
        z1 = het.embed(model, np.asarray(imgs))
        z2 = het.embed(back, np.asarray(imgs))
        np.testing.assert_allclose(z1, z2, atol=1e-6)


class TestShiftConvention:
    def test_trainer_centering_matches_pose_convention(self):
        """The trainer multiplies data by exp(-i 2 pi k.s / n); with the
        repo pose convention (stored s = centering translation, content at
        -s) this must exactly recover the centered spectrum — the contract
        the csp -csp_save_stacks export relies on."""
        import jax.numpy as jnp

        from pyp_tpu.ops import fourier_slice as fs
        from pyp_tpu.ops import reconstruct as rec

        n, o = 32, np.array([3.0, -2.0], np.float32)
        rng = np.random.RandomState(0)
        img0 = rng.randn(n, n).astype(np.float32)
        F0 = np.fft.rfft2(img0)
        Fm = np.asarray(rec._shift_correct(
            jnp.asarray(F0)[None], jnp.asarray(o)[None], n))[0]
        img_shift = np.fft.irfft2(Fm, s=(n, n))      # content moved +o

        X = np.asarray(fs.image_to_fourier(jnp.asarray(img_shift)[None]))[0]
        ky = (np.fft.fftfreq(n) * n).astype(np.float32)
        kx = np.arange(n // 2 + 1, dtype=np.float32)
        s = -o                                        # pose convention
        ph = 2 * np.pi * (ky[:, None] * s[0] + kx[None, :] * s[1]) / n
        Xc = X * (np.cos(ph) - 1j * np.sin(ph))
        X0 = np.asarray(fs.image_to_fourier(jnp.asarray(img0)[None]))[0]
        err = np.abs(Xc - X0).max() / (np.abs(X0).max() + 1e-9)
        assert err < 1e-4, err
