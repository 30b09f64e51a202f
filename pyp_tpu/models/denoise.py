"""Noise2noise denoising for micrographs and tomograms.

TPU-native equivalent of the reference's cryoCARE / noise2map integrations
(detect/cryocare.py, SURVEY §2.1): train a U-Net to map one noisy
realization to another — for tomograms the two halves come from even/odd
frame reconstructions (merge/core.py:707 reconstruct_tomo_halves), for
micrographs from even/odd frame averages. No clean targets needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyp_tpu.models.unet import UNet2D


class DenoiseModel(NamedTuple):
    params: dict
    patch: int


def train_denoiser(
    noisy_a, noisy_b, patch: int = 64, steps: int = 300, batch: int = 16,
    lr: float = 3e-4, seed: int = 0, features=(16, 32, 64),
) -> DenoiseModel:
    """noisy_a/noisy_b: lists of paired 2D images (or 3D volumes treated as
    z-stacks of 2D slices) with independent noise of the same signal."""
    a_slices, b_slices = [], []
    for a, b in zip(noisy_a, noisy_b):
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        if a.ndim == 3:
            a_slices.extend(a)
            b_slices.extend(b)
        else:
            a_slices.append(a)
            b_slices.append(b)

    rng = np.random.RandomState(seed)
    model = UNet2D(features=features, out_channels=1)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, patch, patch, 1)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def sample():
        xs, ys = [], []
        for _ in range(batch):
            i = rng.randint(len(a_slices))
            img_a, img_b = a_slices[i], b_slices[i]
            if rng.rand() < 0.5:
                img_a, img_b = img_b, img_a
            ny, nx = img_a.shape
            y0 = rng.randint(0, max(ny - patch, 0) + 1)
            x0 = rng.randint(0, max(nx - patch, 0) + 1)
            xs.append(img_a[y0:y0 + patch, x0:x0 + patch])
            ys.append(img_b[y0:y0 + patch, x0:x0 + patch])
        x = np.stack(xs)[..., None]
        y = np.stack(ys)[..., None]
        mu = x.mean(axis=(1, 2), keepdims=True)
        sd = x.std(axis=(1, 2), keepdims=True) + 1e-6
        return jnp.asarray((x - mu) / sd), jnp.asarray((y - mu) / sd)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return jnp.mean((model.apply(p, x) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(steps):
        x, y = sample()
        params, opt_state, _loss = step(params, opt_state, x, y)
    return DenoiseModel(params=params, patch=patch)


def denoise_image(model: DenoiseModel, image, features=(16, 32, 64)):
    """Tiled inference with overlap blending; preserves input scale."""
    net = UNet2D(features=features, out_channels=1)
    img = np.asarray(image, dtype=np.float32)
    mu, sd = img.mean(), img.std() + 1e-6
    x = (img - mu) / sd
    ny, nx = x.shape
    p = model.patch
    stride = p // 2
    out = np.zeros_like(x)
    weight = np.zeros_like(x)
    apply = jax.jit(lambda t: net.apply(model.params, t))
    ys = list(range(0, max(ny - p, 0) + 1, stride)) or [0]
    xs = list(range(0, max(nx - p, 0) + 1, stride)) or [0]
    for y0 in ys:
        for x0 in xs:
            tile = x[y0:y0 + p, x0:x0 + p]
            pred = np.asarray(apply(jnp.asarray(tile)[None, ..., None]))[0, ..., 0]
            out[y0:y0 + p, x0:x0 + p] += pred
            weight[y0:y0 + p, x0:x0 + p] += 1.0
    return (out / np.maximum(weight, 1.0)) * sd + mu


def denoise_tomogram(model: DenoiseModel, tomogram):
    vol = np.asarray(tomogram)
    return np.stack([denoise_image(model, vol[z]) for z in range(vol.shape[0])])
