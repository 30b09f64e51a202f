"""Learned particle picker: heatmap-regression U-Net.

TPU-native equivalent of the reference's NN picker (detect/joint.py
`sprtrain` :35 / `tomoeval` :522, and the topaz integration): train on
(micrograph patch, Gaussian-disk heatmap at labeled centers) pairs, infer a
full-micrograph heatmap, pick peaks. 3D tomogram picking runs the same 2D
model over z-slabs with cross-slab NMS (the reference's joint 2D/3D scheme).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyp_tpu.models.unet import UNet2D


class PickerModel(NamedTuple):
    params: dict
    patch: int
    radius_px: float


def make_heatmap(shape, coords, radius_px):
    """Gaussian-disk target heatmap for labeled particle centers."""
    ny, nx = shape
    heat = np.zeros((ny, nx), dtype=np.float32)
    yy, xx = np.mgrid[0:ny, 0:nx]
    for y, x in coords:
        heat = np.maximum(
            heat,
            np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * (radius_px / 2) ** 2)),
        )
    return heat


def _sample_patches(micrographs, heatmaps, patch, n_patches, rng):
    xs, ys = [], []
    for _ in range(n_patches):
        m = rng.randint(len(micrographs))
        mic, heat = micrographs[m], heatmaps[m]
        ny, nx = mic.shape
        y0 = rng.randint(0, ny - patch + 1)
        x0 = rng.randint(0, nx - patch + 1)
        xs.append(mic[y0:y0 + patch, x0:x0 + patch])
        ys.append(heat[y0:y0 + patch, x0:x0 + patch])
    x = np.stack(xs)[..., None]
    y = np.stack(ys)[..., None]
    # per-patch normalization
    x = (x - x.mean(axis=(1, 2), keepdims=True)) / (
        x.std(axis=(1, 2), keepdims=True) + 1e-6
    )
    return jnp.asarray(x), jnp.asarray(y)


def train_picker(
    micrographs, coords_per_micrograph, radius_px: float,
    patch: int = 128, steps: int = 300, batch: int = 16,
    lr: float = 3e-4, seed: int = 0, features=(16, 32, 64),
) -> PickerModel:
    """Train from labeled micrographs (the sprtrain entry)."""
    rng = np.random.RandomState(seed)
    heatmaps = [
        make_heatmap(m.shape, c, radius_px)
        for m, c in zip(micrographs, coords_per_micrograph)
    ]
    model = UNet2D(features=features, out_channels=1)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, patch, patch, 1)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply(p, x)
            # weighted BCE-ish: emphasize positives
            w = 1.0 + 9.0 * y
            return jnp.mean(w * (jax.nn.sigmoid(pred) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        x, y = _sample_patches(micrographs, heatmaps, patch, batch, rng)
        params, opt_state, loss = step(params, opt_state, x, y)
    return PickerModel(params=params, patch=patch, radius_px=radius_px)


def infer_heatmap(model: PickerModel, micrograph, features=(16, 32, 64)):
    """Full-micrograph heatmap via tiled inference with overlap blending."""
    net = UNet2D(features=features, out_channels=1)
    mic = np.asarray(micrograph, dtype=np.float32)
    mic = (mic - mic.mean()) / (mic.std() + 1e-6)
    ny, nx = mic.shape
    p = model.patch
    stride = p // 2
    heat = np.zeros((ny, nx), dtype=np.float32)
    weight = np.zeros((ny, nx), dtype=np.float32)

    apply = jax.jit(lambda x: jax.nn.sigmoid(net.apply(model.params, x)))
    ys = list(range(0, max(ny - p, 0) + 1, stride)) or [0]
    xs = list(range(0, max(nx - p, 0) + 1, stride)) or [0]
    for y0 in ys:
        for x0 in xs:
            tile = mic[y0:y0 + p, x0:x0 + p]
            out = np.asarray(apply(jnp.asarray(tile)[None, ..., None]))[0, ..., 0]
            heat[y0:y0 + p, x0:x0 + p] += out
            weight[y0:y0 + p, x0:x0 + p] += 1.0
    return heat / np.maximum(weight, 1.0)


def pick_from_heatmap(heat, radius_px, threshold: float = 0.3, max_picks: int = 1024):
    """Peaks of the heatmap with NMS — same contract as ops.pick."""
    import jax.numpy as jnp
    from pyp_tpu.ops.pick import _local_maxima

    h = jnp.asarray(heat)
    is_max = _local_maxima(h, int(radius_px))
    cand = jnp.where(is_max & (h > threshold), h, -jnp.inf)
    vals, idx = jax.lax.top_k(cand.reshape(-1), max_picks)
    ny, nx = heat.shape
    coords = jnp.stack([idx // nx, idx % nx], axis=1)
    return np.asarray(coords), np.asarray(vals), np.asarray(jnp.isfinite(vals))


def pick_tomogram(model: PickerModel, tomogram, radius_px,
                  threshold: float = 0.3, max_picks: int = 512):
    """3D picking: per-slab 2D heatmaps + 3D NMS (tomoeval equivalent)."""
    vol = np.asarray(tomogram)
    heats = np.stack([infer_heatmap(model, vol[z]) for z in range(vol.shape[0])])
    from pyp_tpu.ops.template_match import pick_peaks_3d

    coords, vals, valid = pick_peaks_3d(
        jnp.asarray(heats), max_picks, int(radius_px), threshold
    )
    return np.asarray(coords), np.asarray(vals), np.asarray(valid)
