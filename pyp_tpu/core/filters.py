"""Fourier filters: bandpass, B-factor, motion envelopes, masks.

JAX equivalents of the reference's numpy filter layer
(/root/reference/src/pyp/analysis/image.py:15 bandpass,
/root/reference/src/pyp/merge/weights.py motion/damage envelopes).
"""

from __future__ import annotations

import jax.numpy as jnp

from pyp_tpu.core.fft import radius_grid


def _smoothstep(x):
    x = jnp.clip(x, 0.0, 1.0)
    return 0.5 - 0.5 * jnp.cos(jnp.pi * x)


def bandpass_filter(shape, low_cut, high_cut, low_width=0.02, high_width=0.02, rfft=True):
    """Cosine-edged bandpass in cycles/pixel on an FFT-layout grid.

    Passes |f| in [low_cut, high_cut]; each edge rolls off over *_width.
    low_cut <= 0 disables the highpass edge; high_cut >= 0.5*sqrt(2) disables
    the lowpass edge.
    """
    ny, nx = shape
    r = radius_grid(ny, nx, rfft)
    f = jnp.ones_like(r)
    if low_cut > 0:
        f = f * _smoothstep((r - (low_cut - low_width)) / max(low_width, 1e-6))
    f = f * (1.0 - _smoothstep((r - high_cut) / max(high_width, 1e-6)))
    return f


def apply_bandpass(imgs, low_cut, high_cut, **kw):
    ny, nx = imgs.shape[-2], imgs.shape[-1]
    filt = bandpass_filter((ny, nx), low_cut, high_cut, **kw)
    return jnp.fft.irfft2(jnp.fft.rfft2(imgs) * filt, s=(ny, nx))


def bfactor_filter(shape, pixel_size, bfactor, rfft=True):
    """exp(-B g² / 4) envelope (B in Å²; sharpening for B < 0)."""
    ny, nx = shape
    r = radius_grid(ny, nx, rfft) / pixel_size
    return jnp.exp(-0.25 * bfactor * r * r)


def lowpass_filter_3d(vol, pixel_size, resolution, width=0.01):
    """Cosine lowpass of a volume to the given resolution (Å)."""
    nz, ny, nx = vol.shape[-3:]
    fz = jnp.fft.fftfreq(nz).reshape(nz, 1, 1)
    fy = jnp.fft.fftfreq(ny).reshape(1, ny, 1)
    fx = jnp.fft.rfftfreq(nx).reshape(1, 1, -1)
    r = jnp.sqrt(fz * fz + fy * fy + fx * fx)
    cut = pixel_size / resolution
    filt = 1.0 - _smoothstep((r - cut) / width)
    f = jnp.fft.rfftn(vol, axes=(-3, -2, -1))
    return jnp.fft.irfftn(f * filt, s=(nz, ny, nx), axes=(-3, -2, -1))


def motion_envelope(shape, pixel_size, shift_per_frame, rfft=True):
    """Per-frame motion-blur envelope: sinc attenuation from intra-frame
    drift (the reference's motion_weights, merge/weights.py:37).

    shift_per_frame: (n_frames, 2) drift during each frame in pixels.
    Returns (n_frames, ny, nxf) envelopes.
    """
    ny, nx = shape
    fy = jnp.fft.fftfreq(ny).reshape(ny, 1)
    fx = (jnp.fft.rfftfreq(nx) if rfft else jnp.fft.fftfreq(nx)).reshape(1, -1)
    dot = (
        fy[None] * shift_per_frame[:, 0, None, None]
        + fx[None] * shift_per_frame[:, 1, None, None]
    )
    return jnp.sinc(dot)


def soft_spherical_mask(n: int, radius_px: float, edge_px: float = 5.0):
    """3D soft-edged spherical mask of box size n (center at n//2)."""
    ax = jnp.arange(n) - n // 2
    r = jnp.sqrt(
        ax[:, None, None] ** 2 + ax[None, :, None] ** 2 + ax[None, None, :] ** 2
    )
    return 1.0 - _smoothstep((r - radius_px) / max(edge_px, 1e-6))


def soft_circular_mask(n: int, radius_px: float, edge_px: float = 5.0):
    ax = jnp.arange(n) - n // 2
    r = jnp.sqrt(ax[:, None] ** 2 + ax[None, :] ** 2)
    return 1.0 - _smoothstep((r - radius_px) / max(edge_px, 1e-6))


def normalize_images(imgs, mask=None, eps=1e-8):
    """Zero-mean / unit-variance normalization per image (optionally within a
    mask region, stats from outside the mask like cisTEM's normalize)."""
    axes = (-2, -1)
    if mask is None:
        mu = jnp.mean(imgs, axis=axes, keepdims=True)
        sd = jnp.std(imgs, axis=axes, keepdims=True)
    else:
        w = 1.0 - mask  # background region
        wsum = jnp.maximum(jnp.sum(w), eps)
        mu = jnp.sum(imgs * w, axis=axes, keepdims=True) / wsum
        var = jnp.sum(w * (imgs - mu) ** 2, axis=axes, keepdims=True) / wsum
        sd = jnp.sqrt(var)
    return (imgs - mu) / jnp.maximum(sd, eps)
