"""Particle extraction: windowed crops + normalization, batched.

Equivalent of the reference's extract/core.py (`extract_particles_*` :29-514):
window particles out of a micrograph at given coordinates, optionally
Fourier-downsample, normalize against the background annulus, and invert
contrast. Implemented as one batched dynamic-slice gather per micrograph —
runs in a single fused XLA op instead of the reference's per-chunk worker
pool.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pyp_tpu.core.fft import fourier_crop
from pyp_tpu.core.filters import soft_circular_mask


@functools.partial(jax.jit, static_argnames=("boxsize",))
def window_particles(micrograph, coords, boxsize: int):
    """Crop boxsize² windows centered on integer coords (N, 2) = (y, x).

    Coordinates are clamped so windows stay in bounds (the reference skips
    out-of-bounds boxes; we clamp and let the validity mask upstream decide).
    """
    ny, nx = micrograph.shape
    half = boxsize // 2
    starts = jnp.clip(coords - half, 0, jnp.array([ny - boxsize, nx - boxsize]))

    def one(start):
        return jax.lax.dynamic_slice(micrograph, (start[0], start[1]), (boxsize, boxsize))

    return jax.vmap(one)(starts)


@functools.partial(
    jax.jit,
    static_argnames=("boxsize", "downsample_to", "invert", "normalize",
                     "subpixel"),
)
def extract_particles(
    micrograph,
    coords,
    boxsize: int,
    downsample_to: int | None = None,
    invert: bool = True,
    normalize: bool = True,
    subpixel: bool = False,
):
    """Extract, (optionally) Fourier-bin, normalize, and sign-flip particles.

    Normalization: zero mean / unit variance estimated from the corner
    background region outside the particle-radius circle (cisTEM semantics).
    With subpixel=True, float coords are honored: the window is cut at the
    rounded position and the fractional remainder is removed by a Fourier
    phase shift, so the particle lands exactly on the box center (the
    reference's sub-pixel re-extraction, extract/core.py:360-676).
    Returns (N, s, s) float32 where s = downsample_to or boxsize.
    """
    if subpixel:
        coords_f = jnp.asarray(coords, dtype=jnp.float32)
        ci = jnp.round(coords_f).astype(jnp.int32)
        frac = coords_f - ci
        stack = window_particles(micrograph, ci, boxsize)
        from pyp_tpu.core.fft import shift_images

        # content sits at +frac from the box center; shift it back
        stack = shift_images(stack, -frac)
    else:
        stack = window_particles(micrograph, jnp.asarray(coords).astype(jnp.int32),
                                 boxsize)
    if downsample_to is not None and downsample_to != boxsize:
        stack = fourier_crop(stack, (downsample_to, downsample_to))
        s = downsample_to
    else:
        s = boxsize
    if invert:
        stack = -stack
    if normalize:
        mask = soft_circular_mask(s, s * 0.375, edge_px=2.0)
        bg = 1.0 - mask
        wsum = jnp.maximum(jnp.sum(bg), 1.0)
        mu = jnp.sum(stack * bg, axis=(-2, -1), keepdims=True) / wsum
        var = jnp.sum(bg * (stack - mu) ** 2, axis=(-2, -1), keepdims=True) / wsum
        stack = (stack - mu) / jnp.sqrt(jnp.maximum(var, 1e-12))
    return stack


def extract_from_frames(frames, coords, boxsize: int, shifts=None, **kw):
    """Per-frame extraction for movie/polishing workflows: each particle is
    windowed from every frame (optionally at per-frame drift-corrected
    positions). Returns (N, n_frames, s, s).

    shifts: (n_frames, 2) global drift or (N, n_frames, 2) per-particle
    trajectories (pixels, same convention as motion.align_movie: the shift
    that aligns the frame to the average).
    """
    n_frames = frames.shape[0]
    n = coords.shape[0]
    if shifts is None:
        pos = jnp.broadcast_to(coords[:, None, :], (n, n_frames, 2)).astype(jnp.float32)
    else:
        shifts = jnp.asarray(shifts)
        if shifts.ndim == 2:
            shifts = jnp.broadcast_to(shifts[None], (n, n_frames, 2))
        # content of frame f appears at (coord - shift_f); window there
        pos = coords[:, None, :].astype(jnp.float32) - shifts
    posr = jnp.round(pos).astype(jnp.int32)

    def per_frame(f):
        return extract_particles(frames[f], posr[:, f, :], boxsize, **kw)

    out = jax.lax.map(per_frame, jnp.arange(n_frames))  # (n_frames, N, s, s)
    return jnp.transpose(out, (1, 0, 2, 3))


def subvolume_gather(volume, coords, boxsize: int):
    """Crop boxsize³ subvolumes at integer 3D coords (N, 3) = (z, y, x) —
    the reference's CutVolumes3DFromPositions (detect/tomo/core.py:285)."""
    nz, ny, nx = volume.shape
    half = boxsize // 2
    lim = jnp.array([nz - boxsize, ny - boxsize, nx - boxsize])
    starts = jnp.clip(coords - half, 0, lim)

    def one(s):
        return jax.lax.dynamic_slice(volume, (s[0], s[1], s[2]), (boxsize,) * 3)

    return jax.lax.map(one, starts)
