"""Continuous heterogeneity analysis — a cryoDRGN-style Fourier-slice VAE.

TPU-native replacement for the reference's cryoDRGN/tomoDRGN integrations
(refine/heterogeneity/, SURVEY §2.1: external torch envs): given particles
with known poses (from consensus refinement), learn a latent-conditioned
neural volume

    encoder:  particle image -> q(z | x)            (CNN -> mu, logvar)
    decoder:  (gamma(k), z) -> F_vol(k)             (positional-encoded MLP)

trained by comparing decoded central-slice values at the particle's
pose-rotated frequency points (the same band-limited mask points the
refinement kernels use) against the particle's measured spectrum, CTF
applied on the model side. Everything is one jit-compiled training step;
no rendering of full volumes during training.

Analysis: embed all particles, cluster/PCA the latent space, decode any z on
the full Fourier grid -> real-space volume.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops.fourier_slice import image_to_fourier
from pyp_tpu.ops.refine3d import _ctf_at_points, make_mask_points


class Encoder(nn.Module):
    latent_dim: int = 8

    @nn.compact
    def __call__(self, x):  # (B, n, n, 1)
        for f in (16, 32, 64):
            x = nn.Conv(f, (3, 3), strides=(2, 2))(x)
            x = nn.silu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.silu(nn.Dense(128)(x))
        mu = nn.Dense(self.latent_dim)(x)
        logvar = nn.Dense(self.latent_dim)(x)
        return mu, logvar


class SliceDecoder(nn.Module):
    """Positional-encoded coordinate MLP: (k, z) -> (Re, Im) of F_vol(k)."""

    latent_dim: int = 8
    hidden: int = 128
    n_freqs: int = 6

    @nn.compact
    def __call__(self, coords, z):
        # coords: (..., 3) in cycles/pixel (|k| <= 0.5); z: (..., latent)
        scales = 2.0 ** jnp.arange(self.n_freqs) * jnp.pi * 2.0
        ang = coords[..., None] * scales  # (..., 3, n_freqs)
        enc = jnp.concatenate(
            [jnp.sin(ang).reshape(*coords.shape[:-1], -1),
             jnp.cos(ang).reshape(*coords.shape[:-1], -1),
             coords],
            axis=-1,
        )
        h = jnp.concatenate([enc, z], axis=-1)
        for _ in range(3):
            h = nn.silu(nn.Dense(self.hidden)(h))
        out = nn.Dense(2)(h)
        return out[..., 0] + 1j * out[..., 1]


class HetModel(NamedTuple):
    enc_params: dict
    dec_params: dict
    latent_dim: int
    n: int
    pixel_size: float
    mask_pts: np.ndarray
    hidden: int = 128


def _slice_coords(mask_pts, poses, n):
    """Pose-rotated 3D frequency coords (B, G, 3) xyz in cycles/pixel."""
    R = euler_to_matrix(poses[:, 0], poses[:, 1], poses[:, 2])
    q = (
        mask_pts[None, :, 1, None] * R[:, None, 0, :]
        + mask_pts[None, :, 0, None] * R[:, None, 1, :]
    )
    return q / n


def train_heterogeneity(
    stack, poses, ctf_params, pixel_size: float,
    latent_dim: int = 8, steps: int = 500, batch: int = 32,
    lr: float = 1e-3, low_res: float = 60.0, high_res: float = 8.0,
    kl_weight: float = 1e-3, seed: int = 0, hidden: int = 128,
    voltage_kv: float = 300.0, cs_mm: float = 2.7, w: float = 0.07,
) -> HetModel:
    stack = np.asarray(stack, dtype=np.float32)
    B, n, _ = stack.shape
    mask_pts = make_mask_points(n, pixel_size, low_res, high_res)
    G = len(mask_pts)
    rng = np.random.RandomState(seed)

    # precompute measured spectrum values + CTF at mask points (host side)
    from pyp_tpu.ops.fourier_slice import gather_2d_hermitian

    X = image_to_fourier(jnp.asarray(stack))
    xv = jax.vmap(lambda Xi: gather_2d_hermitian(Xi, jnp.asarray(mask_pts)))(X)
    # apply recorded shifts so particles are centered
    ph = 2.0 * jnp.pi * (
        jnp.asarray(mask_pts)[None, :, 0] * poses[:, 3, None]
        + jnp.asarray(mask_pts)[None, :, 1] * poses[:, 4, None]
    ) / n
    xv = xv * jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
    xv = xv / (jnp.sqrt(jnp.mean(jnp.abs(xv) ** 2, axis=1, keepdims=True)) + 1e-8)
    ctf = jax.vmap(
        lambda cp: _ctf_at_points(jnp.asarray(mask_pts), n, pixel_size,
                                  cp[0], cp[1], cp[2], voltage_kv, cs_mm, w, cp[3])
    )(jnp.asarray(ctf_params))
    coords = _slice_coords(jnp.asarray(mask_pts), jnp.asarray(poses), n)  # (B, G, 3)

    # normalized images for the encoder
    imgs = (stack - stack.mean(axis=(1, 2), keepdims=True)) / (
        stack.std(axis=(1, 2), keepdims=True) + 1e-6
    )
    imgs = jnp.asarray(imgs)[..., None]

    encoder = Encoder(latent_dim=latent_dim)
    decoder = SliceDecoder(latent_dim=latent_dim, hidden=hidden)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    enc_params = encoder.init(k1, imgs[:1])
    dec_params = decoder.init(
        k2, jnp.zeros((1, G, 3)), jnp.zeros((1, G, latent_dim))
    )
    tx = optax.adam(lr)
    opt_state = tx.init((enc_params, dec_params))

    @jax.jit
    def step(params, opt_state, key, idx):
        def loss_fn(ps):
            ep, dp = ps
            x = imgs[idx]
            mu, logvar = encoder.apply(ep, x)
            eps = jax.random.normal(key, mu.shape)
            z = mu + jnp.exp(0.5 * logvar) * eps
            zb = jnp.broadcast_to(z[:, None, :], (z.shape[0], G, latent_dim))
            pred = decoder.apply(dp, coords[idx], zb)  # (b, G) complex
            pred = pred * ctf[idx]
            resid = pred - xv[idx]
            recon = jnp.mean(jnp.abs(resid) ** 2)
            kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
            return recon + kl_weight * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = (enc_params, dec_params)
    for i in range(steps):
        key, sub = jax.random.split(key)
        idx = jnp.asarray(rng.randint(0, B, min(batch, B)))
        params, opt_state, loss = step(params, opt_state, sub, idx)
    enc_params, dec_params = params
    return HetModel(enc_params=enc_params, dec_params=dec_params,
                    hidden=hidden,
                    latent_dim=latent_dim, n=n, pixel_size=pixel_size,
                    mask_pts=mask_pts)


def _pool_gaussians(mu, logvar, axis=1):
    """Product of per-view Gaussian posteriors q(z|x_t) -> pooled (mu, var).

    Precision-weighted mean over the tilt axis — the tomoDRGN idea that all
    tilt images of one particle share a single latent, with each view
    contributing evidence proportional to its certainty."""
    prec = jnp.exp(-logvar)
    lam = jnp.sum(prec, axis=axis)
    mu_p = jnp.sum(mu * prec, axis=axis) / jnp.maximum(lam, 1e-8)
    return mu_p, 1.0 / jnp.maximum(lam, 1e-8)


def train_heterogeneity_tilt(
    stacks, poses, ctf_params, pixel_size: float,
    tilt_weights=None,
    latent_dim: int = 8, steps: int = 500, batch: int = 8,
    lr: float = 1e-3, low_res: float = 60.0, high_res: float = 8.0,
    kl_weight: float = 1e-3, seed: int = 0, hidden: int = 128,
    voltage_kv: float = 300.0, cs_mm: float = 2.7, w: float = 0.07,
) -> HetModel:
    """tomoDRGN-role trainer: per-particle TILT STACKS share one latent.

    stacks (P, T, n, n); poses (P, T, 5) per-tilt (phi, theta, psi, sx,
    sy); ctf_params (P, T, 4); tilt_weights (P, T) optional dose/exposure
    weights on the residuals. The encoder runs per tilt image and the
    per-view posteriors are pooled as a product of Gaussians
    (_pool_gaussians); the decoder is the same latent-conditioned neural
    volume, scored on every tilt's central slice. Replaces the reference's
    external tomoDRGN env (docs/guide/tomodrgn.rst, refine/heterogeneity)."""
    stacks = np.asarray(stacks, dtype=np.float32)
    P, T, n, _ = stacks.shape
    mask_pts = make_mask_points(n, pixel_size, low_res, high_res)
    G = len(mask_pts)
    rng = np.random.RandomState(seed)

    from pyp_tpu.ops.fourier_slice import gather_2d_hermitian

    poses = jnp.asarray(np.asarray(poses, dtype=np.float32))
    flatp = poses.reshape(P * T, 5)
    X = image_to_fourier(jnp.asarray(stacks.reshape(P * T, n, n)))
    xv = jax.vmap(lambda Xi: gather_2d_hermitian(Xi, jnp.asarray(mask_pts)))(X)
    ph = 2.0 * jnp.pi * (
        jnp.asarray(mask_pts)[None, :, 0] * flatp[:, 3, None]
        + jnp.asarray(mask_pts)[None, :, 1] * flatp[:, 4, None]
    ) / n
    xv = xv * jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
    xv = xv / (jnp.sqrt(jnp.mean(jnp.abs(xv) ** 2, axis=1, keepdims=True))
               + 1e-8)
    ctf = jax.vmap(
        lambda cp: _ctf_at_points(jnp.asarray(mask_pts), n, pixel_size,
                                  cp[0], cp[1], cp[2], voltage_kv, cs_mm, w,
                                  cp[3])
    )(jnp.asarray(np.asarray(ctf_params, np.float32).reshape(P * T, 4)))
    coords = _slice_coords(jnp.asarray(mask_pts), flatp, n)
    xv = xv.reshape(P, T, G)
    ctf = ctf.reshape(P, T, G)
    coords = coords.reshape(P, T, G, 3)
    tw = (jnp.ones((P, T)) if tilt_weights is None
          else jnp.asarray(np.asarray(tilt_weights, np.float32)))

    imgs = (stacks - stacks.mean(axis=(2, 3), keepdims=True)) / (
        stacks.std(axis=(2, 3), keepdims=True) + 1e-6)
    imgs = jnp.asarray(imgs)[..., None]             # (P, T, n, n, 1)

    encoder = Encoder(latent_dim=latent_dim)
    decoder = SliceDecoder(latent_dim=latent_dim, hidden=hidden)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    enc_params = encoder.init(k1, imgs[0, :1])
    dec_params = decoder.init(
        k2, jnp.zeros((1, G, 3)), jnp.zeros((1, G, latent_dim)))
    tx = optax.adam(lr)
    opt_state = tx.init((enc_params, dec_params))

    @jax.jit
    def step(params, opt_state, key, idx):
        def loss_fn(ps):
            ep, dp = ps
            x = imgs[idx]                            # (b, T, n, n, 1)
            b = x.shape[0]
            mu_t, lv_t = encoder.apply(ep, x.reshape(b * T, n, n, 1))
            mu_t = mu_t.reshape(b, T, latent_dim)
            lv_t = lv_t.reshape(b, T, latent_dim)
            mu, var = _pool_gaussians(mu_t, lv_t)
            eps = jax.random.normal(key, mu.shape)
            z = mu + jnp.sqrt(var) * eps
            zb = jnp.broadcast_to(z[:, None, None, :],
                                  (b, T, G, latent_dim))
            pred = decoder.apply(dp, coords[idx].reshape(b * T, G, 3),
                                 zb.reshape(b * T, G, latent_dim))
            pred = pred.reshape(b, T, G) * ctf[idx]
            resid = jnp.abs(pred - xv[idx]) ** 2 * tw[idx][..., None]
            recon = jnp.sum(resid) / jnp.maximum(
                jnp.sum(tw[idx]) * G, 1.0)
            logvar = jnp.log(var)
            kl = -0.5 * jnp.mean(1 + logvar - mu**2 - var)
            return recon + kl_weight * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = (enc_params, dec_params)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        idx = jnp.asarray(rng.randint(0, P, min(batch, P)))
        params, opt_state, loss = step(params, opt_state, sub, idx)
    enc_params, dec_params = params
    return HetModel(enc_params=enc_params, dec_params=dec_params,
                    hidden=hidden, latent_dim=latent_dim, n=n,
                    pixel_size=pixel_size, mask_pts=mask_pts)


def embed_tilt(model: HetModel, stacks):
    """Pooled latent means for tilt stacks (P, T, n, n) -> (P, latent)."""
    stacks = np.asarray(stacks, dtype=np.float32)
    P, T, n, _ = stacks.shape
    imgs = (stacks - stacks.mean(axis=(2, 3), keepdims=True)) / (
        stacks.std(axis=(2, 3), keepdims=True) + 1e-6)
    encoder = Encoder(latent_dim=model.latent_dim)
    mu_t, lv_t = encoder.apply(model.enc_params,
                               jnp.asarray(imgs.reshape(P * T, n, n))[..., None])
    mu, _ = _pool_gaussians(mu_t.reshape(P, T, -1), lv_t.reshape(P, T, -1))
    return np.asarray(mu)


def embed(model: HetModel, stack):
    """Latent means for every particle (B, latent_dim)."""
    stack = np.asarray(stack, dtype=np.float32)
    imgs = (stack - stack.mean(axis=(1, 2), keepdims=True)) / (
        stack.std(axis=(1, 2), keepdims=True) + 1e-6
    )
    encoder = Encoder(latent_dim=model.latent_dim)
    mu, _ = encoder.apply(model.enc_params, jnp.asarray(imgs)[..., None])
    return np.asarray(mu)


def decode_volume(model: HetModel, z, max_k: float = 0.4):
    """Decode one latent vector on the full Fourier grid -> (n, n, n) map."""
    n = model.n
    decoder = SliceDecoder(latent_dim=model.latent_dim,
                           hidden=getattr(model, 'hidden', 128))
    kz = np.fft.fftfreq(n)
    ky = np.fft.fftfreq(n)
    kx = np.fft.rfftfreq(n)
    grid = np.stack(np.meshgrid(kx, ky, kz, indexing="ij"), axis=-1)  # x,y,z order
    grid = np.transpose(grid, (2, 1, 0, 3))  # -> (kz, ky, kx, 3) with xyz comps
    pts = grid.reshape(-1, 3)
    r = np.linalg.norm(pts, axis=1)
    sel = r <= max_k
    out = np.zeros(len(pts), dtype=np.complex64)
    zb = jnp.broadcast_to(jnp.asarray(z)[None, :], (int(sel.sum()), model.latent_dim))
    vals = decoder.apply(model.dec_params, jnp.asarray(pts[sel]), zb)
    out[sel] = np.asarray(vals)
    F = out.reshape(n, n, n // 2 + 1)
    from pyp_tpu.ops.fourier_slice import _freq_checkerboard_3d

    vol = np.fft.irfftn(F * np.asarray(_freq_checkerboard_3d(n)),
                        s=(n, n, n), axes=(0, 1, 2))
    return vol.astype(np.float32)


def latent_pca(latents, n_components: int = 2):
    """PCA of the latent space (the cryoDRGN analyze step)."""
    z = np.asarray(latents, dtype=np.float64)
    zc = z - z.mean(axis=0, keepdims=True)
    u, s, vt = np.linalg.svd(zc, full_matrices=False)
    return zc @ vt[:n_components].T, vt[:n_components], s


def save_model(model: HetModel, path):
    """Checkpoint a trained heterogeneity model (heterogeneitytrain role:
    the reference keeps cryoDRGN/tomoDRGN weights for later eval)."""
    from pyp_tpu.models import io as mio

    mio.save_params(
        (model.enc_params, model.dec_params), path,
        hidden=model.hidden, latent_dim=model.latent_dim, n=model.n,
        pixel_size=model.pixel_size, mask_pts=np.asarray(model.mask_pts))
    return str(path)


def load_model(path) -> HetModel:
    """Load a checkpoint saved by save_model (heterogeneityeval role)."""
    import jax as _jax

    from pyp_tpu.models import io as mio

    with np.load(path) as z:
        meta = {k[6:]: z[k] for k in z.files if k.startswith("_meta_")}
    n = int(meta["n"])
    latent = int(meta["latent_dim"])
    hidden = int(meta["hidden"])
    mask_pts = np.asarray(meta["mask_pts"], dtype=np.float32)
    G = len(mask_pts)
    enc = Encoder(latent_dim=latent)
    dec = SliceDecoder(latent_dim=latent, hidden=hidden)
    key = _jax.random.PRNGKey(0)
    ep = enc.init(key, jnp.zeros((1, n, n, 1)))
    dp = dec.init(key, jnp.zeros((1, G, 3)), jnp.zeros((1, G, latent)))
    (ep, dp), _m = mio.load_params(path, (ep, dp))
    return HetModel(enc_params=ep, dec_params=dp, hidden=hidden,
                    latent_dim=latent, n=n,
                    pixel_size=float(meta["pixel_size"]), mask_pts=mask_pts)
