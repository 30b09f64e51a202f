"""Self-supervised micrograph quality assessment (prismPYP role).

The reference ships prismPYP (docs/guide/prismpyp.rst): label-free
classification of micrographs from real-space AND Fourier-space features,
used to select high-quality images ("consensus filtering") before
refinement. Here the same role is a native flax model:

* each micrograph becomes a 2-channel image — a downsampled real-space
  view and its log power spectrum (the two prismPYP branches),
* a small convolutional autoencoder learns the dataset's appearance
  self-supervised (reconstruction objective); the bottleneck is the
  embedding,
* quality score = negative whitened distance from the dataset's embedding
  centroid — images that don't look like the bulk of the data (ice
  contamination, empty holes, drift smear, aberrant power spectra) land
  far from it,
* scores flow into the item metadata scalars, so the Filters subsystem
  (`pyp_tpu filter -filter_criteria "prism_score>..."`) handles the
  consensus-filtering step.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class QualityAE(nn.Module):
    latent_dim: int = 16

    @nn.compact
    def __call__(self, x):                      # (B, s, s, 2)
        s = x.shape[1]
        h = x
        for f in (16, 32, 64):
            h = nn.Conv(f, (3, 3), strides=(2, 2))(h)
            h = nn.silu(h)
        shape = h.shape[1:]
        z = nn.Dense(self.latent_dim)(h.reshape(h.shape[0], -1))
        h = nn.silu(nn.Dense(int(np.prod(shape)))(z)).reshape(
            (-1,) + shape)
        for f in (32, 16):
            h = nn.ConvTranspose(f, (3, 3), strides=(2, 2))(h)
            h = nn.silu(h)
        h = nn.ConvTranspose(2, (3, 3), strides=(2, 2))(h)
        # conv-transpose stack can overshoot odd sizes; crop to input
        return z, h[:, :s, :s, :]


class QualityModel(NamedTuple):
    params: dict
    latent_dim: int
    size: int
    mu: np.ndarray        # embedding centroid
    sigma: np.ndarray     # embedding spread (per-dim std)


def featurize(mics, size: int = 128):
    """Micrographs (M, ny, nx) -> 2-channel (M, size, size, 2):
    bin-averaged real view + log power spectrum, each standardized."""
    mics = jnp.asarray(mics, dtype=jnp.float32)
    M, ny, nx = mics.shape
    by, bx = max(ny // size, 1), max(nx // size, 1)
    cy, cx = size * by, size * bx
    # CENTERED crops so the fftshifted DC stays at the crop center when
    # dims aren't multiples of size*bin
    oy, ox = (ny - cy) // 2, (nx - cx) // 2

    def crop_bin(a):
        return a[:, oy:oy + cy, ox:ox + cx].reshape(
            M, size, by, size, bx).mean((2, 4))

    real = crop_bin(mics)
    F = jnp.fft.fftshift(jnp.abs(jnp.fft.fft2(mics)) ** 2, axes=(1, 2))
    psc = crop_bin(jnp.log(F + 1e-6))

    def std2(a):
        m = jnp.mean(a, axis=(1, 2), keepdims=True)
        s = jnp.std(a, axis=(1, 2), keepdims=True) + 1e-6
        return (a - m) / s

    return jnp.stack([std2(real), std2(psc)], axis=-1)


def train_quality(mics, size: int = 128, latent_dim: int = 16,
                  steps: int = 300, batch: int = 16, lr: float = 1e-3,
                  seed: int = 0, momentum: float = 0.0,
                  weight_decay: float = 0.0, log_every: int = 0,
                  ) -> QualityModel:
    """Self-supervised training on the dataset's own micrographs.

    momentum > 0 switches to SGD+momentum (the reference prism trainer's
    torch default); weight_decay adds decoupled L2 (prism_train tab
    momentum/weight_decay); log_every mirrors prism_train print_freq."""
    feats = featurize(mics, size)
    M = feats.shape[0]
    model = QualityAE(latent_dim=latent_dim)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, feats[:1])
    if momentum > 0:
        tx = optax.sgd(lr, momentum=momentum)
    else:
        tx = optax.adam(lr)
    if weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    opt_state = tx.init(params)
    rng = np.random.RandomState(seed)

    @jax.jit
    def step(params, opt_state, idx):
        def loss_fn(p):
            _, rec = model.apply(p, feats[idx])
            return jnp.mean((rec - feats[idx]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        idx = jnp.asarray(rng.randint(0, M, min(batch, M)))
        params, opt_state, loss = step(params, opt_state, idx)
        if log_every and (i + 1) % log_every == 0:
            print(f"prism step {i + 1}/{steps}: loss {float(loss):.5f}",
                  flush=True)

    z, _ = model.apply(params, feats)
    z = np.asarray(z)
    return QualityModel(params=params, latent_dim=latent_dim, size=size,
                        mu=z.mean(0), sigma=z.std(0) + 1e-6)


def embed_quality(model: QualityModel, mics):
    feats = featurize(mics, model.size)
    z, _ = QualityAE(latent_dim=model.latent_dim).apply(model.params, feats)
    return np.asarray(z)


def quality_scores(model: QualityModel, mics):
    """Per-micrograph quality: negative whitened distance from the dataset
    centroid, shifted so the dataset median is ~0 (higher = more typical =
    better)."""
    z = embed_quality(model, mics)
    d = np.linalg.norm((z - model.mu) / model.sigma, axis=1)
    return -(d - np.median(d))
