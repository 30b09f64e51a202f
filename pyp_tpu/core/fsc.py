"""Fourier shell correlation and derived statistics.

Equivalent of the reference's FSC layer (/root/reference/src/pyp/postprocess/
pyp_fsc.py:23 and the merge3d statistics of cistem2): shell-wise correlation
of two half maps, resolution-at-threshold, part-FSC mask correction, and
SSNR estimates used for refinement weighting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _shell_bins(n: int, n_bins: int):
    fz = np.fft.fftfreq(n).reshape(n, 1, 1)
    fy = np.fft.fftfreq(n).reshape(1, n, 1)
    fx = np.fft.rfftfreq(n).reshape(1, 1, -1)
    r = np.sqrt(fz**2 + fy**2 + fx**2)
    bins = np.clip((r / 0.5 * n_bins).astype(np.int32), 0, n_bins - 1)
    return jnp.asarray(bins.reshape(-1))


def fsc(map1, map2, n_bins: int | None = None):
    """FSC curve between two cubic volumes. Returns (freqs, fsc) where freqs
    are shell centers in cycles/pixel."""
    n = map1.shape[-1]
    if n_bins is None:
        n_bins = n // 2
    f1 = jnp.fft.rfftn(map1).reshape(-1)
    f2 = jnp.fft.rfftn(map2).reshape(-1)
    bins = _shell_bins(n, n_bins)
    num = jnp.zeros(n_bins).at[bins].add((f1 * jnp.conj(f2)).real)
    d1 = jnp.zeros(n_bins).at[bins].add(jnp.abs(f1) ** 2)
    d2 = jnp.zeros(n_bins).at[bins].add(jnp.abs(f2) ** 2)
    curve = num / jnp.maximum(jnp.sqrt(d1 * d2), 1e-12)
    freqs = (jnp.arange(n_bins) + 0.5) * (0.5 / n_bins)
    return freqs, curve


def resolution_at_threshold(freqs, curve, pixel_size, threshold=0.143):
    """First crossing of the threshold -> resolution in Å (linear interp).

    Returns 2*pixel_size (Nyquist) if the curve never drops below threshold.
    """
    freqs = jnp.asarray(freqs)
    curve = jnp.asarray(curve)
    below = curve < threshold
    # first index where curve drops below threshold (ignoring bin 0)
    idx = jnp.argmax(below.at[0].set(False))
    crossed = jnp.any(below.at[0].set(False))
    c0 = curve[jnp.maximum(idx - 1, 0)]
    c1 = curve[idx]
    f0 = freqs[jnp.maximum(idx - 1, 0)]
    f1 = freqs[idx]
    t = jnp.clip((c0 - threshold) / jnp.maximum(c0 - c1, 1e-9), 0.0, 1.0)
    f_cross = f0 + t * (f1 - f0)
    f_cross = jnp.where(crossed, f_cross, 0.5)
    return pixel_size / f_cross


def part_fsc(fsc_masked, fsc_unmasked_rand, randomization_bin: int):
    """High-resolution noise-substitution correction (Chen et al. 2013):
    true FSC = (masked - rand) / (1 - rand) beyond the randomization shell."""
    corrected = (fsc_masked - fsc_unmasked_rand) / jnp.maximum(1.0 - fsc_unmasked_rand, 1e-6)
    shells = jnp.arange(fsc_masked.shape[0])
    return jnp.where(shells <= randomization_bin, fsc_masked, corrected)


def fsc_to_ssnr(curve, eps=1e-6):
    """Shell SSNR from FSC of half maps: SSNR = 2 FSC / (1 - FSC)."""
    c = jnp.clip(curve, 0.0, 1.0 - eps)
    return 2.0 * c / (1.0 - c)


def fsc_weights(curve):
    """Cref figure-of-merit filter sqrt(2 FSC / (1 + FSC)) for map filtering
    (Rosenthal & Henderson 2003)."""
    c = jnp.clip(curve, 0.0, 1.0)
    return jnp.sqrt(2.0 * c / (1.0 + c))


def radial_shell_filter_3d(vol_shape, shell_values):
    """Expand per-shell values onto a 3D rfft grid (for FSC weighting /
    SSNR filtering of volumes)."""
    n = vol_shape[-1]
    n_bins = shell_values.shape[-1]
    bins = _shell_bins(n, n_bins)
    return shell_values[bins].reshape(vol_shape[:-3] + (n, n, n // 2 + 1))


def apply_fsc_filter(vol, curve):
    """Filter a volume by the Cref weights derived from its half-map FSC."""
    w = fsc_weights(curve)
    filt = radial_shell_filter_3d(vol.shape[-3:], w)
    return jnp.fft.irfftn(jnp.fft.rfftn(vol) * filt, s=vol.shape[-3:])


def amplitude_correlation_and_dpr(map1, map2, n_bins: int | None = None):
    """Per-shell amplitude correlation and differential phase residual —
    relion_postprocess --ampl_corr expert outputs (reference
    postprocess/core.py:336). Returns (freqs, ampl_corr, dpr_degrees);
    DPR is the amplitude-weighted RMS phase difference per shell."""
    n = map1.shape[-1]
    if n_bins is None:
        n_bins = n // 2
    f1 = jnp.fft.rfftn(jnp.asarray(map1)).reshape(-1)
    f2 = jnp.fft.rfftn(jnp.asarray(map2)).reshape(-1)
    bins = _shell_bins(n, n_bins)
    a1, a2 = jnp.abs(f1), jnp.abs(f2)

    def shell_sum(v):
        return jnp.zeros(n_bins).at[bins].add(v)

    cnt = shell_sum(jnp.ones_like(a1))
    m1 = shell_sum(a1) / jnp.maximum(cnt, 1.0)
    m2 = shell_sum(a2) / jnp.maximum(cnt, 1.0)
    num = shell_sum((a1 - m1[bins]) * (a2 - m2[bins]))
    d1 = shell_sum((a1 - m1[bins]) ** 2)
    d2 = shell_sum((a2 - m2[bins]) ** 2)
    ampl_corr = num / jnp.maximum(jnp.sqrt(d1 * d2), 1e-12)

    dphi = jnp.angle(f1 * jnp.conj(f2))           # [-pi, pi]
    w = a1 + a2
    dpr = jnp.sqrt(shell_sum(w * dphi**2)
                   / jnp.maximum(shell_sum(w), 1e-12))
    freqs = (jnp.arange(n_bins) + 0.5) * (0.5 / n_bins)
    return freqs, ampl_corr, jnp.degrees(dpr)
