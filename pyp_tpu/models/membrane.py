"""Membrane segmentation for tomograms — the MemBrain-seg role
(/root/reference/src/pyp/detect/core.py membrain dispatch: the reference
shells out to the membrain-seg container with pretrained torch weights).

Native flax equivalent with a self-synthesized training set: membranes in
cryo-ET are thin dark bilayer shells, so the segmenter is a 2D U-Net
trained per-slice on procedurally generated closed surfaces (spheres /
ellipsoids with low-order radial harmonics, plus open sheets) rendered at
matched contrast into correlated noise. No external weights are shipped:
`train_membrane_segmenter` builds the model in ~a minute on one chip and
the result is cached to disk like the picker models.

Inference tiles the tomogram per z-slice (batched, jitted once) and
returns a membrane probability volume; `detect_virions_from_segmentation`
runs the existing sphere Hough on the probability map so
`tomo_vir_method=nn` slots into the virion pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.models.unet import UNet2D


class MembraneModel(NamedTuple):
    params: dict
    features: tuple = (16, 32, 64)


def _synth_batch(rng, batch: int, n: int, thickness_px=(2.0, 5.0)):
    """Synthetic (image, mask) slice pairs: each sample draws 1-3 closed
    contours (circle radius + low-order angular harmonics) and sometimes an
    open sheet; membrane = dark ridge of the drawn thickness; background =
    correlated noise + slow illumination gradients."""
    yy, xx = np.mgrid[:n, :n].astype(np.float32)
    imgs = np.zeros((batch, n, n), np.float32)
    masks = np.zeros((batch, n, n), np.float32)
    for b in range(batch):
        dist = np.full((n, n), 1e9, np.float32)
        for _ in range(rng.randint(1, 4)):
            cy, cx = rng.uniform(0.2 * n, 0.8 * n, 2)
            r0 = rng.uniform(0.1 * n, 0.35 * n)
            th = np.arctan2(yy - cy, xx - cx)
            r = np.hypot(yy - cy, xx - cx)
            wob = sum(rng.uniform(-0.08, 0.08) * r0
                      * np.cos(k * th + rng.uniform(0, 2 * np.pi))
                      for k in (2, 3, 4))
            dist = np.minimum(dist, np.abs(r - (r0 + wob)))
        if rng.rand() < 0.3:  # open sheet: a gently curved line
            t = np.linspace(0, 1, n).astype(np.float32)
            y0, y1 = rng.uniform(0, n, 2)
            amp = rng.uniform(-0.2 * n, 0.2 * n)
            path_y = y0 + (y1 - y0) * t + amp * np.sin(np.pi * t)
            d_line = np.abs(yy - path_y[None, :])
            dist = np.minimum(dist, d_line)
        t_px = rng.uniform(*thickness_px)
        ridge = np.exp(-0.5 * (dist / t_px) ** 2)
        mask = (dist < 1.5 * t_px).astype(np.float32)
        # correlated background: white noise blurred in Fourier
        noise = rng.randn(n, n).astype(np.float32)
        k = np.fft.rfftfreq(n)[None, :] ** 2 + np.fft.fftfreq(n)[:, None] ** 2
        noise = np.fft.irfft2(np.fft.rfft2(noise)
                              * np.exp(-k * (2.0 * n)), s=(n, n))
        noise = noise / (noise.std() + 1e-6)
        grad = (rng.uniform(-1, 1) * (yy / n - 0.5)
                + rng.uniform(-1, 1) * (xx / n - 0.5))
        contrast = rng.uniform(0.8, 2.5)
        imgs[b] = (-contrast * ridge + noise
                   + grad + 0.6 * rng.randn(n, n))
        masks[b] = mask
    mu = imgs.mean(axis=(1, 2), keepdims=True)
    sd = imgs.std(axis=(1, 2), keepdims=True) + 1e-6
    return (imgs - mu) / sd, masks


def train_membrane_segmenter(steps: int = 400, batch: int = 16,
                             patch: int = 96, lr: float = 1e-3,
                             seed: int = 0,
                             features=(16, 32, 64)) -> MembraneModel:
    """Train the per-slice segmenter on procedural membranes (BCE loss)."""
    import optax

    rng = np.random.RandomState(seed)
    net = UNet2D(features=tuple(features), out_channels=1)
    key = jax.random.PRNGKey(seed)
    params = net.init(key, jnp.zeros((1, patch, patch, 1)))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = net.apply(p, x[..., None])[..., 0]
            z = jnp.clip(logits, -30, 30)
            bce = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
            # membranes are sparse: weight positives up
            w = 1.0 + 4.0 * y
            return jnp.mean(w * bce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(int(steps)):
        x, y = _synth_batch(rng, batch, patch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
    return MembraneModel(params=params, features=tuple(features))


def segment_tomogram(model: MembraneModel, tomogram, batch: int = 8):
    """Per-slice membrane probability volume (nz, ny, nx) in [0, 1]."""
    vol = np.asarray(tomogram, dtype=np.float32)
    nz, ny, nx = vol.shape
    # pad to the UNet's stride multiple
    s = 2 ** (len(model.features) - 1)
    py, px = (-ny) % s, (-nx) % s
    net = UNet2D(features=tuple(model.features), out_channels=1)

    @jax.jit
    def run(x):
        logits = net.apply(model.params, x[..., None])[..., 0]
        return jax.nn.sigmoid(logits)

    out = np.zeros_like(vol)
    for lo in range(0, nz, batch):
        sl = vol[lo:lo + batch]
        mu = sl.mean(axis=(1, 2), keepdims=True)
        sd = sl.std(axis=(1, 2), keepdims=True) + 1e-6
        x = np.pad((sl - mu) / sd, ((0, 0), (0, py), (0, px)), mode="reflect")
        prob = np.asarray(run(jnp.asarray(x)))
        out[lo:lo + batch] = prob[:, :ny, :nx]
    return out


def detect_virions_from_segmentation(prob, radii_px, n_peaks: int = 8):
    """Virion seeds from the probability map: the existing sphere Hough
    (template_match.detect_spheres) runs on the segmentation instead of the
    raw tomogram — the NN suppresses non-membrane edges, so the Hough votes
    are cleaner on crowded lamellae. Returns (centers, radii, scores,
    valid)."""
    from pyp_tpu.ops.template_match import detect_spheres

    # membranes are BRIGHT in the probability map: no contrast inversion
    return detect_spheres(jnp.asarray(np.asarray(prob, np.float32)),
                          radii_px, n_peaks=n_peaks, invert=False)
