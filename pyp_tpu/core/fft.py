"""FFT helpers: frequency grids, Fourier-space shifts, crop/pad resampling.

All functions are jit-friendly (static shapes, no data-dependent control
flow) and operate batched over leading axes. Frequencies are in cycles per
pixel ("digital" units); multiply by 1/pixel_size for 1/Å.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def freq_grid_2d(ny: int, nx: int, rfft: bool = True):
    """Return (fy, fx) broadcastable frequency grids in cycles/pixel.

    fy: (ny, 1), fx: (1, nx//2+1) for rfft layout, else full fftfreq.
    """
    fy = jnp.fft.fftfreq(ny).reshape(ny, 1)
    fx = (jnp.fft.rfftfreq(nx) if rfft else jnp.fft.fftfreq(nx)).reshape(1, -1)
    return fy, fx


def freq_grid_3d(nz: int, ny: int, nx: int, rfft: bool = True):
    fz = jnp.fft.fftfreq(nz).reshape(nz, 1, 1)
    fy = jnp.fft.fftfreq(ny).reshape(1, ny, 1)
    fx = (jnp.fft.rfftfreq(nx) if rfft else jnp.fft.fftfreq(nx)).reshape(1, 1, -1)
    return fz, fy, fx


def radius_grid(ny: int, nx: int, rfft: bool = True):
    """|f| in cycles/pixel, shape (ny, nx//2+1) or (ny, nx)."""
    fy, fx = freq_grid_2d(ny, nx, rfft)
    return jnp.sqrt(fy * fy + fx * fx)


def fourier_shift(f_img, shift_yx, ny: int, nx: int, rfft: bool = True):
    """Apply a real-space translation as a Fourier phase ramp.

    f_img: (..., ny, nxf) complex spectrum; shift_yx: (..., 2) in pixels
    (positive = shift image content toward +y/+x).
    """
    fy, fx = freq_grid_2d(ny, nx, rfft)
    sy = shift_yx[..., 0][..., None, None]
    sx = shift_yx[..., 1][..., None, None]
    phase = -2.0 * jnp.pi * (fy * sy + fx * sx)
    return f_img * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def shift_images(imgs, shifts_yx):
    """Translate a batch of real images by sub-pixel shifts (periodic)."""
    ny, nx = imgs.shape[-2], imgs.shape[-1]
    f = jnp.fft.rfft2(imgs)
    f = fourier_shift(f, shifts_yx, ny, nx)
    return jnp.fft.irfft2(f, s=(ny, nx))


def _crop_indices(n_src: int, n_dst: int) -> np.ndarray:
    """FFT-layout index mapping for cropping/padding a full-FFT axis."""
    k_dst = np.fft.fftfreq(n_dst) * n_dst  # integer wavenumbers of dst
    return np.round(k_dst).astype(np.int64) % n_src


def fourier_crop(imgs, out_shape):
    """Fourier crop (downsample) or pad (upsample) real images to out_shape.

    Band-limited resampling identical in spirit to the reference's
    "Fourier binning" (/root/reference/src/pyp/analysis/image.py:71).
    Batched over leading axes. Energy normalization preserves mean intensity.
    """
    ny, nx = imgs.shape[-2], imgs.shape[-1]
    oy, ox = out_shape
    f = jnp.fft.fft2(imgs)
    iy = _crop_indices(ny, oy) if oy <= ny else None
    if oy <= ny and ox <= nx:
        idx_y = jnp.asarray(_crop_indices(ny, oy))
        idx_x = jnp.asarray(_crop_indices(nx, ox))
        fc = f[..., idx_y, :][..., :, idx_x]
    else:
        # pad: scatter existing coefficients into the larger grid
        fc = jnp.zeros(imgs.shape[:-2] + (oy, ox), dtype=f.dtype)
        idx_y = jnp.asarray(_crop_indices(oy, ny))
        idx_x = jnp.asarray(_crop_indices(ox, nx))
        fc = fc.at[..., idx_y[:, None], idx_x[None, :]].set(f)
    scale = (oy * ox) / (ny * nx)
    return jnp.fft.ifft2(fc).real * scale


def fourier_crop_3d(vol, out_shape):
    """3D Fourier crop/pad of a volume (band-limited resize)."""
    nz, ny, nx = vol.shape[-3:]
    oz, oy, ox = out_shape
    f = jnp.fft.fftn(vol, axes=(-3, -2, -1))
    if oz <= nz and oy <= ny and ox <= nx:
        iz = jnp.asarray(_crop_indices(nz, oz))
        iy = jnp.asarray(_crop_indices(ny, oy))
        ix = jnp.asarray(_crop_indices(nx, ox))
        fc = f[..., iz, :, :][..., :, iy, :][..., :, :, ix]
    else:
        fc = jnp.zeros(vol.shape[:-3] + (oz, oy, ox), dtype=f.dtype)
        iz = jnp.asarray(_crop_indices(oz, nz))
        iy = jnp.asarray(_crop_indices(oy, ny))
        ix = jnp.asarray(_crop_indices(ox, nx))
        fc = fc.at[..., iz[:, None, None], iy[None, :, None], ix[None, None, :]].set(f)
    scale = (oz * oy * ox) / (nz * ny * nx)
    return jnp.fft.ifftn(fc, axes=(-3, -2, -1)).real * scale


@functools.partial(jax.jit, static_argnums=(1,))
def bin_images(imgs, binning: int):
    """Integer Fourier binning of a batch of images."""
    ny, nx = imgs.shape[-2], imgs.shape[-1]
    return fourier_crop(imgs, (ny // binning, nx // binning))


def radial_average(power, n_bins: int, ny: int, nx: int, rfft: bool = True):
    """Rotational average of a (batched) 2D spectrum into n_bins radial bins.

    Returns (profile, counts). Bin i covers |f| in [i, i+1) * (0.5 / n_bins).
    """
    r = radius_grid(ny, nx, rfft)
    bins = jnp.clip((r / 0.5 * n_bins).astype(jnp.int32), 0, n_bins - 1)
    flat_bins = bins.reshape(-1)
    counts = jnp.zeros(n_bins).at[flat_bins].add(1.0)

    def one(p):
        sums = jnp.zeros(n_bins).at[flat_bins].add(p.reshape(-1))
        return sums / jnp.maximum(counts, 1.0)

    batched = power.reshape((-1, r.shape[0], r.shape[1]))
    prof = jax.vmap(one)(batched)
    return prof.reshape(power.shape[:-2] + (n_bins,)), counts
