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
    lr_finish: float = 0.0,
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
    if lr_finish and lr_finish > 0:
        # cosine decay from lr to lr_finish over the run (reference
        # tomo_denoise learningrate_start/finish cards)
        sched = optax.cosine_decay_schedule(
            lr, max(steps, 1), alpha=lr_finish / lr)
        tx = optax.adam(sched)
    else:
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


# ---------------------------------------------------------------- isonet
# Missing-wedge restoration (the role of the reference's IsoNet integration,
# detect/isonet_tools.py, SURVEY §2.1). For a single-axis tilt series about
# the y axis the missing wedge occupies a fixed sector of every (kz, kx)
# plane, identically for all y — so restoration is exactly a 2D problem on
# (z, x) slices and reuses UNet2D. Training pairs are self-supervised, the
# IsoNet recipe: rotate a wedge-limited subvolume in the (z, x) plane (the
# existing wedge rotates away from the wedge axis), re-apply the wedge, and
# train the net to undo it.


def wedge_filter_2d(img_zx, tilt_max_deg: float):
    """Zero the missing-wedge sector of one (z, x) slice: frequencies whose
    direction is closer to the z axis than (90 - tilt_max) degrees were
    never measured by any tilt in [-tilt_max, tilt_max]."""
    img_zx = jnp.asarray(img_zx, dtype=jnp.float32)
    nz, nx = img_zx.shape[-2:]
    kz = jnp.fft.fftfreq(nz).reshape(-1, 1)
    kx = jnp.fft.rfftfreq(nx).reshape(1, -1)
    ang = jnp.degrees(jnp.arctan2(jnp.abs(kz), jnp.abs(kx)))
    keep = (ang <= tilt_max_deg) | ((kz == 0) & (kx == 0))
    return jnp.fft.irfft2(jnp.fft.rfft2(img_zx) * keep, s=(nz, nx))


def wedge_filter_3d(vol, tilt_max_deg: float):
    """Apply the single-axis missing wedge to a (z, y, x) volume (tilt axis
    = y): batched 2D wedge over the y slices."""
    vol = jnp.asarray(vol, dtype=jnp.float32)
    slices = jnp.moveaxis(vol, 1, 0)  # (y, z, x)
    out = jax.vmap(lambda s: wedge_filter_2d(s, tilt_max_deg))(slices)
    return jnp.moveaxis(out, 0, 1)


def _wedge_mask(shape, tilt_max_deg: float):
    nz, nx = shape
    kz = jnp.fft.fftfreq(nz).reshape(-1, 1)
    kx = jnp.fft.rfftfreq(nx).reshape(1, -1)
    ang = jnp.degrees(jnp.arctan2(jnp.abs(kz), jnp.abs(kx)))
    return (ang > tilt_max_deg) & ~((kz == 0) & (kx == 0))


def train_wedge_restorer(
    subvols, tilt_max_deg: float, patch: int = 32, steps: int = 300,
    batch: int = 16, lr: float = 1e-3, seed: int = 0, features=(16, 32),
) -> DenoiseModel:
    """Self-supervised missing-wedge restorer on (z, x) slices.

    subvols: list of (z, y, x) subvolumes cut from a wedge-limited
    tomogram. Each training sample: a random (z, x) slice rotated by a
    random in-plane angle (target — its wedge rotates with it) and the same
    slice with the axis wedge re-applied (input). The network predicts ONLY
    the missing-sector residual; the measured sector is passed through by a
    hard Fourier projection (data consistency), so the identity mapping is
    not a solution and all gradient signal drives inpainting.

    Note: like IsoNet this needs real data volume and (for best quality)
    iterative re-training on its own predictions; on tiny synthetic sets it
    learns the training distribution but generalizes weakly (STATUS.md).
    """
    import scipy.ndimage as ndi

    slices = []
    for v in subvols:
        v = np.asarray(v, dtype=np.float32)
        slices.extend(np.moveaxis(v, 1, 0))  # (z, x) planes
    rng = np.random.RandomState(seed)
    model = UNet2D(features=features, out_channels=1)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, patch, patch, 1)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    wedge = jax.jit(jax.vmap(lambda s: wedge_filter_2d(s, tilt_max_deg)))
    mask = _wedge_mask((patch, patch), tilt_max_deg)

    def sample():
        ys = []
        for _ in range(batch):
            s = slices[rng.randint(len(slices))]
            rot = ndi.rotate(s, rng.uniform(0, 360), reshape=False,
                             order=1, mode="reflect")
            nz, nx = rot.shape
            z0 = rng.randint(0, max(nz - patch, 0) + 1)
            x0 = rng.randint(0, max(nx - patch, 0) + 1)
            ys.append(rot[z0:z0 + patch, x0:x0 + patch])
        y = np.stack(ys)
        mu = y.mean(axis=(1, 2), keepdims=True)
        sd = y.std(axis=(1, 2), keepdims=True) + 1e-6
        y = (y - mu) / sd
        x = np.asarray(wedge(jnp.asarray(y)))
        return jnp.asarray(x)[..., None], jnp.asarray(y)[..., None]

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            raw = model.apply(p, x)[..., 0]
            fill = jnp.fft.irfft2(jnp.fft.rfft2(raw) * mask,
                                  s=(patch, patch))
            return jnp.mean((x[..., 0] + fill - y[..., 0]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    last = None
    for _ in range(steps):
        x, y = sample()
        params, opt_state, last = step(params, opt_state, x, y)
    m = DenoiseModel(params=params, patch=patch)
    return m._replace(params={"net": params, "tilt_max": tilt_max_deg,
                              "final_loss": float(last)})


def restore_wedge(model: DenoiseModel, tomogram, features=(16, 32)):
    """Apply a trained wedge restorer to a full (z, y, x) tomogram: per
    (z, x) slice, net prediction projected onto the missing sector and
    added to the input — measured frequencies are preserved exactly."""
    net = UNet2D(features=features, out_channels=1)
    params = model.params["net"]
    tilt_max = model.params["tilt_max"]
    vol = np.asarray(tomogram, dtype=np.float32)
    nz, ny, nx = vol.shape
    mask = _wedge_mask((nz, nx), tilt_max)
    apply = jax.jit(lambda t: net.apply(params, t))

    out = np.empty_like(vol)
    for y in range(ny):
        sl = vol[:, y, :]
        mu, sd = sl.mean(), sl.std() + 1e-6
        raw = np.asarray(apply(
            jnp.asarray((sl - mu) / sd)[None, ..., None]))[0, ..., 0]
        fill = np.asarray(jnp.fft.irfft2(jnp.fft.rfft2(jnp.asarray(raw))
                                         * mask, s=(nz, nx)))
        out[:, y, :] = sl + fill * sd
    return out
