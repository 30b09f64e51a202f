"""Local resolution estimation + local filtering.

The reference exposes RELION's ``relion_postprocess --locres`` from its
sharpen tab (postprocess/core.py:325-364, pyp_config.toml:9487-9525) and
shells out to the binary. Here the same contract is a TPU-native batched
windowed-FSC:

* sample points on a regular grid (``locres_sampling`` Å spacing) inside the
  map,
* cut one window per point from both half maps (batched dynamic slices),
  apply one shared soft spherical mask (radius ``locres_maskrad``, edge
  ``locres_edgwidth``),
* compute every window's FSC in one pass — the per-shell reductions are a
  single (W, V) x (V, S) one-hot matmul on the MXU instead of W independent
  scatter-reductions,
* mask-correction by phase randomization beyond ``locres_randomize_at``
  (the half maps are phase-randomized once globally; the randomized windows
  go through the same batched FSC and the standard part-FSC formula),
* per-point resolution = threshold crossing clamped to
  [2*pixel, ``locres_minres``], trilinearly interpolated back to the full
  grid.

Local filtering applies a per-voxel cosine lowpass at the local resolution
by scanning over a log-spaced resolution bank and hat-blending adjacent
members — two live volumes instead of a (bank, n³) buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core import fsc as fsc_mod
from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
from pyp_tpu.ops.extract import subvolume_gather


def _batched_window_fsc(w1, w2, n_bins: int):
    """FSC curves for paired window batches (W, w, w, w) -> (W, n_bins).

    One rfftn over the batch, then shell sums as one-hot matmuls (MXU)."""
    w = w1.shape[-1]
    F1 = jnp.fft.rfftn(w1, axes=(1, 2, 3)).reshape(w1.shape[0], -1)
    F2 = jnp.fft.rfftn(w2, axes=(1, 2, 3)).reshape(w2.shape[0], -1)
    onehot = jax.nn.one_hot(fsc_mod._shell_bins(w, n_bins), n_bins,
                            dtype=jnp.float32)                     # (V, S)
    num = (F1 * jnp.conj(F2)).real @ onehot
    d1 = (F1.real**2 + F1.imag**2) @ onehot
    d2 = (F2.real**2 + F2.imag**2) @ onehot
    return num / jnp.maximum(jnp.sqrt(d1 * d2), 1e-12)


def _resolutions_at_threshold(curves, pixel_size: float, threshold: float):
    """Vectorized first-crossing resolution (W, S) -> (W,) in Å."""
    n_bins = curves.shape[-1]
    freqs = (jnp.arange(n_bins) + 0.5) * (0.5 / n_bins)  # cycles/px
    below = curves < threshold
    below = below.at[:, 0].set(False)
    idx = jnp.argmax(below, axis=1)
    crossed = jnp.any(below, axis=1)
    i0 = jnp.maximum(idx - 1, 0)
    c0 = jnp.take_along_axis(curves, i0[:, None], 1)[:, 0]
    c1 = jnp.take_along_axis(curves, idx[:, None], 1)[:, 0]
    t = jnp.clip((c0 - threshold) / jnp.maximum(c0 - c1, 1e-9), 0.0, 1.0)
    f = freqs[i0] + t * (freqs[idx] - freqs[i0])
    f = jnp.where(crossed, f, 0.5)  # never crossed -> Nyquist
    return pixel_size / jnp.maximum(f, 1e-6)


def local_resolution(
    half1, half2, pixel_size: float,
    sampling_a: float = 25.0,
    maskrad_a: float = -1.0,
    edgwidth_a: float = -1.0,
    randomize_at_a: float = 25.0,
    minres_a: float = 50.0,
    threshold: float = 0.143,
    batch: int = 64,
):
    """Local resolution map from two half maps.

    Returns (locres_map (n³) in Å, points (G, 3) voxel coords,
    values (G,) Å). Defaults follow relion_postprocess: maskrad
    0.5*sampling, edge width = sampling."""
    half1 = jnp.asarray(half1, dtype=jnp.float32)
    half2 = jnp.asarray(half2, dtype=jnp.float32)
    n = half1.shape[-1]
    if maskrad_a <= 0:
        maskrad_a = 0.5 * sampling_a
    if edgwidth_a <= 0:
        edgwidth_a = sampling_a

    # window big enough for mask + soft edge; even for clean rfft shells
    w = int(np.ceil(2.0 * (maskrad_a + edgwidth_a) / pixel_size))
    w = min(max(w + (w % 2), 16), n)
    n_bins = w // 2
    mask = soft_spherical_mask(w, maskrad_a / pixel_size,
                               edgwidth_a / pixel_size)

    # sample grid (full coverage incl. borders clamps in the gather)
    step = max(1, int(round(sampling_a / pixel_size)))
    ax = np.arange(w // 2, n - w // 2 + step, step)
    ax = np.clip(ax, w // 2, max(n - w // 2, w // 2))[: max(1, len(ax))]
    ax = np.unique(ax)
    gz, gy, gx = np.meshgrid(ax, ax, ax, indexing="ij")
    points = np.stack([gz, gy, gx], -1).reshape(-1, 3).astype(np.int32)

    # one global phase randomization for the mask-correction term
    cutoff_bin_w = int(round(2.0 * n_bins * pixel_size / randomize_at_a))
    cutoff_bin_w = min(max(cutoff_bin_w, 2), n_bins - 2)
    r1 = _randomize_beyond(half1, pixel_size, randomize_at_a, seed=1)
    r2 = _randomize_beyond(half2, pixel_size, randomize_at_a, seed=2)

    values = []
    for lo in range(0, len(points), batch):
        pts = jnp.asarray(points[lo:lo + batch])
        w1 = subvolume_gather(half1, pts, w) * mask
        w2 = subvolume_gather(half2, pts, w) * mask
        curves = _batched_window_fsc(w1, w2, n_bins)
        wr1 = subvolume_gather(r1, pts, w) * mask
        wr2 = subvolume_gather(r2, pts, w) * mask
        rand = _batched_window_fsc(wr1, wr2, n_bins)
        # part-FSC correction beyond the randomization shell (+2 guard,
        # same convention as postprocess.masked_fsc)
        shell = jnp.arange(n_bins)[None, :]
        corr = (curves - rand) / jnp.maximum(1.0 - rand, 1e-6)
        curves = jnp.where(shell >= cutoff_bin_w + 2, corr, curves)
        values.append(np.asarray(
            _resolutions_at_threshold(curves, pixel_size, threshold)))
    values = np.concatenate(values)
    values = np.clip(values, 2.0 * pixel_size, minres_a)

    # trilinear interpolation of the coarse grid onto the full volume
    coarse = jnp.asarray(values.reshape(len(ax), len(ax), len(ax)),
                         dtype=jnp.float32)
    axf = jnp.asarray(ax, dtype=jnp.float32)
    vox = jnp.arange(n, dtype=jnp.float32)
    # map voxel index -> fractional coarse-grid index (clamped extrapolation)
    idx = jnp.interp(vox, axf, jnp.arange(len(ax), dtype=jnp.float32))
    zz, yy, xx = jnp.meshgrid(idx, idx, idx, indexing="ij")
    locres_map = jax.scipy.ndimage.map_coordinates(
        coarse, [zz, yy, xx], order=1, mode="nearest")
    return locres_map, points, values


def _randomize_beyond(vol, pixel_size: float, res_a: float, seed: int = 0):
    """Phase-randomize a volume beyond a resolution shell (host-seeded)."""
    n = vol.shape[-1]
    n_bins = n // 2
    F = jnp.fft.rfftn(jnp.asarray(vol))
    bins = fsc_mod._shell_bins(n, n_bins).reshape(F.shape)
    cutoff = int(round(2.0 * n_bins * pixel_size / res_a))
    cutoff = min(max(cutoff, 2), n_bins - 2)
    key = jax.random.PRNGKey(seed)
    phases = jax.random.uniform(key, F.shape, minval=0.0, maxval=2 * np.pi)
    rand = jnp.abs(F) * jnp.exp(1j * phases)
    return jnp.fft.irfftn(jnp.where(bins > cutoff, rand, F), s=vol.shape)


def local_filter(vol, locres_map, pixel_size: float, n_bank: int = 10):
    """Per-voxel cosine lowpass at the local resolution.

    Scans a log-spaced resolution bank between the sharpest and softest
    local values, hat-blending each voxel between its two adjacent bank
    members — memory stays at two volumes regardless of bank size."""
    vol = jnp.asarray(vol, dtype=jnp.float32)
    lr = jnp.asarray(locres_map, dtype=jnp.float32)
    lo = float(jnp.min(lr))
    hi = float(jnp.max(lr))
    if hi - lo < 1e-3:
        return lowpass_filter_3d(vol, pixel_size, 0.5 * (lo + hi))
    bank = np.geomspace(lo, hi, n_bank).astype(np.float32)
    # fractional bank position of each voxel's resolution
    pos = jnp.interp(lr, jnp.asarray(bank),
                     jnp.arange(n_bank, dtype=jnp.float32))

    out = jnp.zeros_like(vol)
    for k, res in enumerate(bank):  # unrolled: n_bank compiled lowpasses
        wk = jnp.clip(1.0 - jnp.abs(pos - k), 0.0, 1.0)
        out = out + wk * lowpass_filter_3d(vol, pixel_size, float(res))
    return out
