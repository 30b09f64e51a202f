"""Particle picking (2D) — size-matched blob detection.

JAX re-design of the reference's pure-numpy size-based picker
(/root/reference/src/pyp/detect/core.py:339-520 `pick_particles`): bandpass
the micrograph around the particle scale, mask contamination by intensity
outliers, find local maxima with a minimum-distance constraint, threshold by
robust z-score. Also provides gold-bead detection (high-contrast small blobs)
used for fiducial erasure (detect/core.py:73).

Everything static-shaped: returns a fixed-capacity coordinate array plus a
validity mask (TPU-friendly; no dynamic shapes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pyp_tpu.core.filters import apply_bandpass


class PickResult(NamedTuple):
    coords: jax.Array   # (max_picks, 2) (y, x) pixel coordinates
    scores: jax.Array   # (max_picks,)
    valid: jax.Array    # (max_picks,) bool


def _local_maxima(resp, radius: int):
    """Local-max mask via max pooling with an odd window of 2*radius+1."""
    k = 2 * radius + 1
    mx = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return resp >= mx


def _disk_mean(img, radius: int):
    """Mean over a square window approximating a particle-sized disk."""
    k = 2 * radius + 1
    s = jax.lax.reduce_window(img, 0.0, jax.lax.add, (k, k), (1, 1), "SAME")
    return s / (k * k)


@functools.partial(
    jax.jit,
    static_argnames=("particle_radius_px", "max_picks", "min_distance_px",
                     "threshold_sigma", "edge_px", "invert",
                     "mask_contamination", "band_low", "band_high",
                     "disk_frac", "cont_sigma", "cont_scale"),
)
def pick_particles(
    micrograph,
    particle_radius_px: int = 32,
    max_picks: int = 512,
    min_distance_px: int | None = None,
    threshold_sigma: float = 1.0,
    edge_px: int = 32,
    invert: bool = True,
    mask_contamination: bool = True,
    band_low: float = 6.0,
    band_high: float = 1.5,
    disk_frac: float = 0.5,
    cont_sigma: float = 8.0,
    cont_scale: float = 4.0,
) -> PickResult:
    """Size-matched picking on one micrograph.

    invert=True assumes particles are dark (standard cryo-EM contrast);
    the response is the band-limited, disk-averaged (inverted) density.
    """
    ny, nx = micrograph.shape
    img = -micrograph if invert else micrograph
    # band select the particle scale: pass 1/(band_low*r) .. 1/(band_high*r)
    low = 1.0 / (band_low * particle_radius_px)
    high = 1.0 / (band_high * particle_radius_px)
    band = apply_bandpass(img[None], low, high, low_width=low * 0.5, high_width=high * 0.3)[0]
    resp = _disk_mean(band, max(1, int(disk_frac * particle_radius_px)))

    # contamination mask: robust z of intensity at a much coarser scale than
    # the particle, so isolated particles dilute away and only large
    # ice/carbon patches trigger
    if mask_contamination:
        coarse = _disk_mean(img, int(cont_scale * particle_radius_px))
        med = jnp.median(coarse)
        mad = jnp.median(jnp.abs(coarse - med)) + 1e-6
        contamination = jnp.abs(coarse - med) > cont_sigma * 1.4826 * mad
    else:
        contamination = jnp.zeros_like(img, dtype=bool)

    if min_distance_px is None:
        min_distance_px = particle_radius_px
    is_max = _local_maxima(resp, int(min_distance_px))

    mu = jnp.mean(resp)
    sd = jnp.std(resp) + 1e-8
    score = (resp - mu) / sd

    yy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    in_bounds = (
        (yy >= edge_px) & (yy < ny - edge_px) & (xx >= edge_px) & (xx < nx - edge_px)
    )
    cand = is_max & in_bounds & (~contamination) & (score > threshold_sigma)
    flat_score = jnp.where(cand, score, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat_score, max_picks)
    coords = jnp.stack([top_idx // nx, top_idx % nx], axis=-1)
    valid = jnp.isfinite(top_scores)
    return PickResult(coords=coords, scores=top_scores, valid=valid)


@functools.partial(jax.jit, static_argnames=("bead_radius_px", "max_beads", "threshold_sigma"))
def detect_gold_beads(
    micrograph, bead_radius_px: int = 8, max_beads: int = 256,
    threshold_sigma: float = 5.0,
) -> PickResult:
    """High-contrast small-blob detection for gold fiducials (dark, round,
    much higher contrast than particles). Used for erasure and for tilt
    alignment seeding."""
    return pick_particles(
        micrograph,
        particle_radius_px=bead_radius_px,
        max_picks=max_beads,
        min_distance_px=2 * bead_radius_px,
        threshold_sigma=threshold_sigma,
        edge_px=bead_radius_px,
        invert=True,
        mask_contamination=False,
    )


def erase_blobs(micrograph, coords, valid, radius_px: float):
    """Replace disks around coords with local background noise statistics
    (the reference's gold erasure, preprocess/core.py:995). Deterministic:
    fills with the image median instead of random noise."""
    ny, nx = micrograph.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    med = jnp.median(micrograph)

    def body(i, img):
        cy, cx = coords[i, 0], coords[i, 1]
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        inside = (d2 <= radius_px * radius_px) & valid[i]
        return jnp.where(inside, med, img)

    return jax.lax.fori_loop(0, coords.shape[0], body, micrograph)


def remove_hot_pixels(frames, sigmas: float = 8.0):
    """X-ray / hot-pixel removal (the reference's preprocess/core.py:37-95):
    pixels deviating more than `sigmas` robust-sigma from the per-image
    median are replaced by a 3x3 local mean. frames: (F, ny, nx) or (ny, nx).
    """
    x = jnp.asarray(frames)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    med = jnp.median(x.reshape(x.shape[0], -1), axis=1)[:, None, None]
    mad = jnp.median(jnp.abs(x - med).reshape(x.shape[0], -1), axis=1)[:, None, None]
    thresh = sigmas * 1.4826 * mad + 1e-6
    bad = jnp.abs(x - med) > thresh
    # 3x3 mean of non-bad neighbors (approximate: plain box mean is fine
    # because isolated hot pixels contribute ~1/9 of the patch)
    local = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3), (1, 1, 1), "SAME") / 9.0
    out = jnp.where(bad, local, x)
    return out[0] if squeeze else out
