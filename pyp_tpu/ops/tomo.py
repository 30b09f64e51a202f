"""Tilt-series alignment and tomogram reconstruction.

TPU-native replacements for the reference's wrapped IMOD/AreTomo toolchain
(SURVEY §A.5: tiltxcorr pre-alignment align/core.py:1763-1816, tiltalign
projection-model solve :5726, `tilt` WBP merge/core.py:353):

  * `prealign_tilt_series` — cosine-stretch cross-correlation between
    adjacent tilts, accumulated outward from the zero-tilt image (tiltxcorr
    semantics), all correlations batched through one FFT pipeline;
  * `track_patches` / `solve_projection_model` — patch tracks across the
    series + alternating least-squares for per-tilt shifts, a global tilt
    axis angle, and 3D patch positions (the core of tiltalign's model);
  * `wbp_reconstruct` — ramp-filtered weighted backprojection: each output
    z-slab is a batched bilinear gather over all tilts (single-axis tilt
    about y), optionally dose/lowpass weighted;
  * `ctf_correct_tilts` — strip-free per-pixel phase flipping with the
    defocus gradient along the tilt direction (ctfphaseflip equivalent,
    ctf/core.py:1110).

Geometry: tilt angle theta rotates the specimen about the image y axis;
a voxel at centered coords (z, y, x) projects to image coords
(y, x cos(theta) + z sin(theta)) — consistent with project(F, Ry(theta)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core import ctf as ctf_model
from pyp_tpu.core.filters import apply_bandpass


# ---------------------------------------------------------------------------
# pre-alignment (tiltxcorr)
# ---------------------------------------------------------------------------

def _xcorr_shift(a, b, bp_low=0.01, bp_high=0.25):
    """Shift of b relative to a via phase-weighted cross-correlation with
    parabolic sub-pixel refinement. Returns (dy, dx) such that shifting b by
    (dy, dx) aligns it to a."""
    ny, nx = a.shape[-2], a.shape[-1]
    A = jnp.fft.rfft2(apply_bandpass(a, bp_low, bp_high))
    Bf = jnp.fft.rfft2(apply_bandpass(b, bp_low, bp_high))
    cc = jnp.fft.irfft2(A * jnp.conj(Bf), s=(ny, nx))
    from pyp_tpu.ops.motion import _subpixel_peak

    return _subpixel_peak(cc)


def _stretch_x(img, factor):
    """Stretch an image along x about its center by `factor` (cosine
    stretching: the higher-tilt image is compressed in x by cos(theta), so
    stretching by cos(t_ref)/cos(t) matches adjacent tilts)."""
    n = img.shape[-1]
    c = n // 2
    xs = (jnp.arange(n, dtype=jnp.float32) - c) / factor + c
    ys = jnp.arange(img.shape[-2], dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jax.scipy.ndimage.map_coordinates(img, [yy, xx], order=1, mode="constant")


def prealign_tilt_series(tilts, tilt_angles, bp_low=0.01, bp_high=0.2):
    """tiltxcorr-equivalent: pairwise adjacent alignment, accumulated from
    the lowest-|angle| tilt outward.

    tilts: (T, ny, nx); tilt_angles: (T,) degrees (monotonic order).
    Returns shifts (T, 2): shifting tilt t by shifts[t] aligns the series.
    """
    tilts = jnp.asarray(tilts)
    angles = np.asarray(tilt_angles, dtype=np.float64)
    T = tilts.shape[0]
    ref_idx = int(np.argmin(np.abs(angles)))

    rel = np.zeros((T, 2), dtype=np.float32)
    # walk outward in both directions
    order = []
    for t in range(ref_idx + 1, T):
        order.append((t, t - 1))
    for t in range(ref_idx - 1, -1, -1):
        order.append((t, t + 1))
    for t, prev in order:
        stretch = np.cos(np.radians(angles[prev])) / np.cos(np.radians(angles[t]))
        stretched = _stretch_x(tilts[t], float(stretch))
        d = np.asarray(_xcorr_shift(tilts[prev][None], stretched[None])[0])
        rel[t] = d

    shifts = np.zeros((T, 2), dtype=np.float32)
    for t in range(ref_idx + 1, T):
        shifts[t] = shifts[t - 1] + rel[t]
    for t in range(ref_idx - 1, -1, -1):
        shifts[t] = shifts[t + 1] + rel[t]
    return jnp.asarray(shifts)


# ---------------------------------------------------------------------------
# patch tracking + projection-model solve (tiltalign)
# ---------------------------------------------------------------------------

def track_patches(tilts, shifts, tilt_angles, patch_centers, patch_size: int = 64):
    """Track patches (defined on the zero-tilt image) through the series.

    Returns measured positions (T, P, 2) in pixel coords (y, x) of each
    patch center in each tilt (NaN-free; low-confidence tracks keep the
    predicted position).
    """
    from pyp_tpu.ops.extract import window_particles

    tilts = jnp.asarray(tilts)
    T = tilts.shape[0]
    angles = np.asarray(tilt_angles, dtype=np.float64)
    ref_idx = int(np.argmin(np.abs(angles)))
    centers = np.asarray(patch_centers, dtype=np.float32)  # (P, 2) (y, x)
    ny, nx = tilts.shape[-2], tilts.shape[-1]
    c = np.array([ny // 2, nx // 2], dtype=np.float32)

    ref_patches = window_particles(
        tilts[ref_idx], jnp.asarray(np.round(centers).astype(np.int32)), patch_size
    )

    measured = np.zeros((T, len(centers), 2), dtype=np.float32)
    for t in range(T):
        # predicted position: x compresses by cos(theta) about center; the
        # series shift moves content by shifts[t] -> patch appears at -shift
        cos_t = np.cos(np.radians(angles[t])) / np.cos(np.radians(angles[ref_idx]))
        pred = centers.copy()
        pred[:, 1] = (centers[:, 1] - c[1]) * cos_t + c[1]
        pred = pred - np.asarray(shifts[t])
        cur = window_particles(
            tilts[t], jnp.asarray(np.round(pred).astype(np.int32)), patch_size
        )
        d = np.asarray(_xcorr_shift(ref_patches, cur))
        measured[t] = np.round(pred) - d  # content found shifted by -d
    return jnp.asarray(measured)


class ProjectionModel(NamedTuple):
    shifts: jax.Array       # (T, 2) per-tilt shifts (y, x)
    axis_angle: jax.Array   # scalar, in-plane tilt-axis rotation (deg)
    points3d: jax.Array     # (P, 3) fiducial/patch positions (z, y, x), centered
    residual: jax.Array     # rms residual (pixels)


def solve_projection_model(measured, tilt_angles, image_shape, iters: int = 5):
    """Alternating least squares for the single-axis projection model:

        m(t, p) ~= Rz2(axis) @ [ y_p,  x_p cos(th_t) + z_p sin(th_t) ] - d_t

    (centered coords). Solves per-tilt shifts d_t, global axis angle, and 3D
    points. Equivalent role to IMOD tiltalign (align/core.py:5726)."""
    m = np.asarray(measured, dtype=np.float64).copy()
    T, P, _ = m.shape
    ny, nx = image_shape
    center = np.array([ny // 2, nx // 2], dtype=np.float64)
    m -= center
    th = np.radians(np.asarray(tilt_angles, dtype=np.float64))

    A_x = np.stack([np.cos(th), np.sin(th)], axis=1)

    def project(pts, alpha, d):
        ca, sa = np.cos(np.radians(alpha)), np.sin(np.radians(alpha))
        xr = pts[None, :, 2] * np.cos(th)[:, None] + pts[None, :, 0] * np.sin(th)[:, None]
        yr = np.broadcast_to(pts[None, :, 1], (T, P)).copy()
        x2 = ca * xr - sa * yr
        y2 = sa * xr + ca * yr
        return np.stack([y2, x2], axis=-1) - d[:, None, :]

    def solve_given_alpha(alpha):
        """Closed-form inner solve at fixed axis angle: centering the
        measurements over points cancels the per-tilt shifts exactly (with
        the gauge constraint mean(points) = 0), so points come from one
        least-squares solve and shifts from the mean residual. The axis
        angle is searched on the OUTSIDE: a joint descent lets the points
        absorb most of an in-plane rotation and stalls."""
        ca, sa = np.cos(np.radians(alpha)), np.sin(np.radians(alpha))
        mc = m - m.mean(axis=1, keepdims=True)  # center over points: d cancels
        # un-rotate by R(-alpha): x = ca*mx + sa*my ; y = ca*my - sa*mx
        ym = ca * mc[..., 0] - sa * mc[..., 1]
        ym_x = ca * mc[..., 1] + sa * mc[..., 0]
        pts = np.zeros((P, 3))
        for p in range(P):
            sol, *_ = np.linalg.lstsq(A_x, ym_x[:, p], rcond=None)
            pts[p, 2], pts[p, 0] = sol
            pts[p, 1] = ym[:, p].mean()
        pts -= pts.mean(axis=0, keepdims=True)  # gauge: centered point cloud
        pred = project(pts, alpha, np.zeros((T, 2)))
        d = (pred - m).mean(axis=1)
        r = project(pts, alpha, d) - m
        return float(np.sqrt((r**2).mean())), pts, d

    best = (1e18, 0.0, None, None)
    for alpha in np.arange(-10.0, 10.01, 1.0):
        rms, pts, d = solve_given_alpha(alpha)
        if rms < best[0]:
            best = (rms, alpha, pts, d)
    for alpha in np.arange(best[1] - 1.0, best[1] + 1.01, 0.1):
        rms, pts, d = solve_given_alpha(alpha)
        if rms < best[0]:
            best = (rms, alpha, pts, d)
    rms, alpha, pts, d = best[0], best[1], best[2], best[3]
    return ProjectionModel(
        shifts=jnp.asarray(d.astype(np.float32)),
        axis_angle=jnp.asarray(np.float32(alpha)),
        points3d=jnp.asarray(pts.astype(np.float32)),
        residual=jnp.asarray(np.float32(rms)),
    )


# ---------------------------------------------------------------------------
# gold-fiducial tracking + robust projection solve (RAPTOR + tiltalign role,
# reference align/core.py:5679-5726 — the primary alignment path for
# fiducialized series)
# ---------------------------------------------------------------------------

def _bead_template(box: int, radius_px: float):
    """Zero-mean dark Gaussian disk matching a gold bead's appearance (the
    same at every tilt, unlike specimen patches — that's why bead tracking
    survives low-contrast specimens)."""
    c = box // 2
    yy, xx = np.meshgrid(
        np.arange(box, dtype=np.float32) - c,
        np.arange(box, dtype=np.float32) - c,
        indexing="ij",
    )
    t = -np.exp(-(yy**2 + xx**2) / (2.0 * (radius_px / 1.5) ** 2))
    t -= t.mean()
    return jnp.asarray(t.astype(np.float32))


def track_beads(tilts, shifts, tilt_angles, bead_yx, bead_radius_px: float = 8.0,
                box: int | None = None):
    """Track gold fiducials through the series by template matching.

    bead_yx: (P, 2) bead centers on the lowest-|angle| tilt (pixel coords).
    Returns (measured (T, P, 2) positions, confidence (T, P) normalized
    correlation peaks in [−1, 1]).
    """
    from pyp_tpu.ops.extract import window_particles
    from pyp_tpu.ops.motion import _subpixel_peak

    tilts = jnp.asarray(tilts)
    T, ny, nx = tilts.shape
    angles = np.asarray(tilt_angles, dtype=np.float64)
    ref_idx = int(np.argmin(np.abs(angles)))
    centers = np.asarray(bead_yx, dtype=np.float32)
    P = centers.shape[0]
    if box is None:
        box = int(max(32, 6 * bead_radius_px))
    tpl = _bead_template(box, bead_radius_px)
    c = np.array([ny // 2, nx // 2], dtype=np.float32)

    @jax.jit
    def match(windows):
        W = windows - windows.mean(axis=(-2, -1), keepdims=True)
        cc = jnp.fft.irfft2(
            jnp.fft.rfft2(W) * jnp.conj(jnp.fft.rfft2(tpl))[None],
            s=(box, box),
        )
        denom = jnp.sqrt(
            (W**2).sum(axis=(-2, -1)) * (tpl**2).sum()
        ) + 1e-6
        d = _subpixel_peak(cc)
        peak = cc.max(axis=(-2, -1)) / denom
        return d, peak

    measured = np.zeros((T, P, 2), dtype=np.float32)
    conf = np.zeros((T, P), dtype=np.float32)
    half = box // 2
    for t in range(T):
        cos_t = np.cos(np.radians(angles[t])) / np.cos(np.radians(angles[ref_idx]))
        pred = centers.copy()
        pred[:, 1] = (centers[:, 1] - c[1]) * cos_t + c[1]
        pred = pred - np.asarray(shifts[t])
        ci = np.round(pred).astype(np.int32)
        wins = window_particles(tilts[t], jnp.asarray(ci), box)
        d, pk = match(wins)
        # window_particles clamps near edges: recover the actual window center
        ci_eff = np.clip(ci - half, 0, [ny - box, nx - box]) + half
        measured[t] = ci_eff + np.asarray(d)
        conf[t] = np.asarray(pk)
        # beads predicted off the image can't be measured
        off = (pred[:, 0] < 0) | (pred[:, 0] > ny - 1) | \
              (pred[:, 1] < 0) | (pred[:, 1] > nx - 1)
        conf[t][off] = 0.0
    return jnp.asarray(measured), jnp.asarray(conf)


def _solve_alpha_weighted(m, th, w, alpha, n_inner: int = 4):
    """Weighted inner solve of the single-axis projection model at fixed
    axis angle: alternate (points | shifts) weighted least squares. m is
    centered (T, P, 2); w (T, P) >= 0. Returns (weighted rms, points (P,3),
    shifts (T,2), per-measurement residual norms (T,P))."""
    T, P, _ = m.shape
    ca, sa = np.cos(np.radians(alpha)), np.sin(np.radians(alpha))
    A = np.stack([np.cos(th), np.sin(th)], axis=1)  # (T, 2)
    d = np.zeros((T, 2))
    pts = np.zeros((P, 3))
    pred = np.zeros_like(m)
    for _ in range(n_inner):
        my = m[..., 0] + d[:, None, 0]
        mx = m[..., 1] + d[:, None, 1]
        yprime = ca * my - sa * mx   # R(-alpha) applied to (m + d)
        xprime = ca * mx + sa * my
        for p in range(P):
            wp = w[:, p]
            ws = max(wp.sum(), 1e-9)
            Aw = A * wp[:, None]
            sol, *_ = np.linalg.lstsq(Aw, xprime[:, p] * wp, rcond=None)
            pts[p, 2], pts[p, 0] = sol
            pts[p, 1] = (yprime[:, p] * wp).sum() / ws
        # gauge: weighted point-cloud centroid at origin
        wc = np.maximum(w.sum(axis=0), 1e-9)
        pts -= (pts * wc[:, None]).sum(axis=0) / wc.sum()
        xr = pts[None, :, 2] * np.cos(th)[:, None] + pts[None, :, 0] * np.sin(th)[:, None]
        yr = np.broadcast_to(pts[None, :, 1], (T, P))
        pred = np.stack([sa * xr + ca * yr, ca * xr - sa * yr], axis=-1)
        wsum = np.maximum(w.sum(axis=1), 1e-9)
        d = ((pred - m) * w[..., None]).sum(axis=1) / wsum[:, None]
    r = pred - d[:, None, :] - m
    rn = np.sqrt((r**2).sum(axis=-1))
    rms = float(np.sqrt(((rn**2) * w).sum() / max(w.sum(), 1e-9)))
    return rms, pts, d, rn


def solve_projection_model_robust(measured, tilt_angles, image_shape,
                                  confidence=None, rounds: int = 3,
                                  tukey_factor: float = 1.0,
                                  fixed_alpha=None):
    """Projection-model solve with IRLS outlier rejection (tiltalign's robust
    fitting role): Tukey-biweight reweighting of bead measurements on top of
    the tracker's confidence, with the axis angle grid-searched outside the
    weighted inner solve. Returns (ProjectionModel, final weights (T, P)).

    tukey_factor scales the biweight cutoff (reference
    tomo_ali_robust_fitting_factor: smaller values downweight more
    points)."""
    m = np.asarray(measured, dtype=np.float64).copy()
    T, P, _ = m.shape
    ny, nx = image_shape
    m -= np.array([ny // 2, nx // 2], dtype=np.float64)
    th = np.radians(np.asarray(tilt_angles, dtype=np.float64))
    w0 = (
        np.clip(np.asarray(confidence, dtype=np.float64), 0.0, None)
        if confidence is not None else np.ones((T, P))
    )
    w = w0.copy()

    def best_alpha(w, coarse):
        if fixed_alpha is not None:
            # calibrated tilt axis (reference ctf_tilt_axis_known): no
            # axis search, solve shifts/points at the given angle
            rms, *_ = _solve_alpha_weighted(m, th, w, float(fixed_alpha))
            return (rms, float(fixed_alpha))
        grid = (np.arange(-10.0, 10.01, 1.0) if coarse
                else np.arange(best[1] - 1.0, best[1] + 1.01, 0.1))
        out = (1e18, 0.0)
        for alpha in grid:
            rms, *_ = _solve_alpha_weighted(m, th, w, alpha)
            if rms < out[0]:
                out = (rms, alpha)
        return out

    best = best_alpha(w, coarse=True)
    best = best_alpha(w, coarse=False)
    rms, pts, d, rn = _solve_alpha_weighted(m, th, w, best[1])
    for _ in range(rounds):
        active = w > 1e-6
        sigma = 1.4826 * np.median(rn[active]) + 1e-6
        cthr = 4.685 * sigma * max(float(tukey_factor), 1e-3)
        wt = np.where(rn < cthr, (1.0 - (rn / cthr) ** 2) ** 2, 0.0)
        w = w0 * wt
        best = best_alpha(w, coarse=False)
        rms, pts, d, rn = _solve_alpha_weighted(m, th, w, best[1])
    # report the unweighted rms over surviving (inlier) measurements
    inl = w > 0.2 * np.maximum(w0, 1e-9)
    rms_in = float(np.sqrt((rn[inl] ** 2).mean())) if inl.any() else rms
    model = ProjectionModel(
        shifts=jnp.asarray(d.astype(np.float32)),
        axis_angle=jnp.asarray(np.float32(best[1])),
        points3d=jnp.asarray(pts.astype(np.float32)),
        residual=jnp.asarray(np.float32(rms_in)),
    )
    return model, jnp.asarray(w.astype(np.float32))


def align_tilt_series_fiducial(tilts, tilt_angles, bead_radius_px: float = 8.0,
                               max_beads: int = 40, min_beads: int = 4,
                               tukey_factor: float = 1.0, fixed_alpha=None):
    """Full gold-fiducial alignment: xcorr prealign -> bead detection on the
    zero-tilt image -> template tracking -> robust projection solve.

    Returns (ProjectionModel, bead coords (P, 2), tracks (T, P, 2),
    weights (T, P)). Raises ValueError when fewer than min_beads beads are
    found (caller falls back to patch tracking)."""
    from pyp_tpu.ops.pick import detect_gold_beads

    tilts = jnp.asarray(tilts)
    T, ny, nx = tilts.shape
    angles = np.asarray(tilt_angles, dtype=np.float64)
    ref_idx = int(np.argmin(np.abs(angles)))

    shifts0 = prealign_tilt_series(tilts, angles)
    picks = detect_gold_beads(
        tilts[ref_idx], bead_radius_px=int(round(bead_radius_px)),
        max_beads=max_beads, threshold_sigma=4.0,
    )
    valid = np.asarray(picks.valid)
    coords = np.asarray(picks.coords)[valid].astype(np.float32)
    if coords.shape[0] < min_beads:
        raise ValueError(
            f"only {coords.shape[0]} gold beads found (need >= {min_beads})"
        )
    measured, conf = track_beads(
        tilts, shifts0, angles, coords, bead_radius_px=bead_radius_px
    )
    model, w = solve_projection_model_robust(
        measured, angles, (ny, nx), confidence=np.asarray(conf),
        tukey_factor=tukey_factor, fixed_alpha=fixed_alpha,
    )
    return model, coords, measured, w


# ---------------------------------------------------------------------------
# weighted backprojection (the IMOD `tilt` equivalent)
# ---------------------------------------------------------------------------

def ramp_filter(nx: int, cutoff: float = 0.35, falloff: float = 0.05):
    """R-weighting along x: |f| up to cutoff, cosine rolloff after
    (IMOD -RADIAL semantics, merge/core.py:201)."""
    f = np.abs(np.fft.rfftfreq(nx))
    w = np.where(f <= cutoff, f, 0.0)
    roll = (f > cutoff) & (f <= cutoff + falloff)
    w = np.where(roll, cutoff * 0.5 * (1 + np.cos(np.pi * (f - cutoff) / falloff)), w)
    w[0] = 0.25 / nx  # keep a small DC term so means survive
    return jnp.asarray(w.astype(np.float32))


def fake_sirt_filter(nx: int, iterations: int, cutoff: float = 0.35,
                     falloff: float = 0.05):
    """Radial filter equivalent to `iterations` of SIRT (IMOD's
    -FakeSIRTiterations, merge/core.py:201-213): Landweber iteration on the
    normal equations has per-frequency response 1 - (1 - mu/f)^k relative
    to the exact (ramp) inverse, so low frequencies converge first and the
    result keeps SIRT's high contrast without any iterating."""
    f = np.abs(np.fft.rfftfreq(nx))
    ramp = np.asarray(ramp_filter(nx, cutoff, falloff))
    mu = max(f[1], 1.0 / (iterations + 1) * 0.5)
    conv = 1.0 - (1.0 - np.clip(mu / np.maximum(f, f[1]), 0.0, 1.0)) ** iterations
    w = ramp * conv
    w[0] = ramp[0]
    return jnp.asarray(w.astype(np.float32))


def filter_window(nx: int, window: str):
    """Apodization atop the ramp (the IMOD/AreTomo filter family:
    shepp-logan, hamming, hann — merge/core.py radial filter options).
    Returns (nx//2+1,) multiplicative weights."""
    f = np.abs(np.fft.rfftfreq(nx))  # 0..0.5
    if window == "shepp":
        w = np.sinc(f)  # sin(pi f)/(pi f)
    elif window == "hamming":
        w = 0.54 + 0.46 * np.cos(2 * np.pi * f)
    elif window == "hann":
        w = 0.5 * (1 + np.cos(2 * np.pi * f))
    else:
        w = np.ones_like(f)
    return jnp.asarray(w.astype(np.float32))


def _filter_tilts(tilts, cutoff, falloff, fake_sirt: int = 0,
                  window: str = "none"):
    if fake_sirt > 0:
        w = fake_sirt_filter(tilts.shape[-1], fake_sirt, cutoff, falloff)
    else:
        w = ramp_filter(tilts.shape[-1], cutoff, falloff)
    if window != "none":
        w = w * filter_window(tilts.shape[-1], window)
    return jnp.fft.irfft(jnp.fft.rfft(tilts, axis=-1) * w[None, None, :],
                         n=tilts.shape[-1], axis=-1)


@functools.partial(jax.jit, static_argnames=("thickness", "slab", "cutoff",
                                             "falloff", "fake_sirt",
                                             "window", "z_shift"))
def wbp_reconstruct(
    tilts, tilt_angles, shifts=None, thickness: int = 128,
    cutoff: float = 0.35, falloff: float = 0.05,
    tilt_weights=None, slab: int = 8, fake_sirt: int = 0,
    window: str = "none", z_shift: float = 0.0,
):
    """Weighted backprojection of an aligned tilt series.

    tilts: (T, ny, nx); tilt_angles (T,) degrees; shifts (T, 2) applied to
    the images before backprojection (alignment). Returns (thickness, ny, nx)
    with z centered (z=0 plane at thickness//2).

    Implementation: ramp-filter along x, then for each z-slab gather
    bilinearly from every tilt at x' = x cos(th) + z sin(th) (the tilt axis
    is y: rows are independent) and sum — one fused gather per (slab, tilt).
    The accumulator stays in the GATHER layout (slab, nx, ny) through the
    tilt scan and is transposed ONCE per slab: a transpose inside the scan
    body re-streams the whole accumulator per tilt and was the measured
    bottleneck (7.3e8 -> 14.3e8 vox/s on v5e at 41x1024x1024, slab 8).
    """
    tilts = jnp.asarray(tilts)
    T, ny, nx = tilts.shape
    angles = jnp.deg2rad(jnp.asarray(tilt_angles, dtype=jnp.float32))
    if shifts is not None:
        from pyp_tpu.core.fft import shift_images

        tilts = shift_images(tilts, jnp.asarray(shifts))
    filt = _filter_tilts(tilts, cutoff, falloff, fake_sirt, window)
    if tilt_weights is not None:
        # (T,) exposure/cosine weights, e.g. cos(theta) thickness correction
        filt = filt * jnp.asarray(tilt_weights)[:, None, None]

    cx = nx // 2
    cz = thickness // 2 + z_shift  # +z_shift: volume slides up in z (IMOD SHIFT)
    xs = jnp.arange(nx, dtype=jnp.float32) - cx
    # transpose once so the inner gather pulls CONTIGUOUS rows (a column
    # of (ny, nx) is strided; gathering (nx, ny) rows is a 4 KB sequential
    # read per index — measurably faster on HBM)
    filt_T = jnp.swapaxes(filt, 1, 2)  # (T, nx, ny)

    def one_slab(z0):
        zs = z0 + jnp.arange(slab, dtype=jnp.float32) - cz  # (slab,)

        def one_tilt(carry, t):
            acc = carry
            xprime = xs[None, :] * jnp.cos(angles[t]) + zs[:, None] * jnp.sin(angles[t]) + cx
            xp = jnp.clip(xprime, 0.0, nx - 1.000001)
            x0 = jnp.floor(xp).astype(jnp.int32)
            fx = xp - x0
            imgT = filt_T[t]  # (nx, ny)
            # out[z, y, x] = img[y, xprime(z, x)]: gather rows of imgT
            v0 = imgT[x0.reshape(-1)].reshape(slab, nx, ny)
            v1 = imgT[jnp.minimum(x0 + 1, nx - 1).reshape(-1)].reshape(slab, nx, ny)
            inb = ((xprime >= 0) & (xprime <= nx - 1)).astype(filt.dtype)
            acc = acc + (v0 * ((1 - fx) * inb)[..., None]
                         + v1 * (fx * inb)[..., None])
            return acc, None

        acc0 = jnp.zeros((slab, nx, ny), dtype=filt.dtype)
        acc, _ = jax.lax.scan(one_tilt, acc0, jnp.arange(T))
        return jnp.transpose(acc, (0, 2, 1)) * (jnp.pi / (2.0 * T))

    slabs = []
    for z0 in range(0, thickness, slab):
        slabs.append(one_slab(z0))
    return jnp.concatenate(slabs, axis=0)


# ---------------------------------------------------------------------------
# per-tilt CTF correction (ctfphaseflip)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "n_bands"),
)
def _ctf_correct_tilts_jit(tilts, tilt_angles, defoci, pixel_size,
                           voltage_kv, cs_mm, amplitude_contrast,
                           n_bands: int):
    T, ny, nx = tilts.shape
    xs = (jnp.arange(nx, dtype=jnp.float32) - nx // 2) * pixel_size

    def per_tilt(args):
        img, theta_deg, df0 = args
        theta = jnp.deg2rad(theta_deg)
        df_per_col = df0 + xs * jnp.tan(theta)  # (nx,)
        lo = df_per_col.min()
        hi = df_per_col.max() + 1.0
        edges = lo + (hi - lo) * jnp.arange(n_bands + 1, dtype=jnp.float32) / n_bands
        band_of_col = jnp.clip(
            ((df_per_col - lo) / (hi - lo) * n_bands).astype(jnp.int32),
            0, n_bands - 1,
        )
        F = jnp.fft.rfft2(img)

        def band_step(acc, b):
            df_mid = 0.5 * (edges[b] + edges[b + 1])
            c = ctf_model.ctf_2d(
                (ny, nx), pixel_size, df_mid, df_mid, 0.0, voltage_kv,
                cs_mm, w=amplitude_contrast,
            )
            flipped = jnp.fft.irfft2(F * jnp.sign(c), s=(ny, nx))
            mask = (band_of_col == b).astype(img.dtype)
            return acc + flipped * mask[None, :], None

        acc, _ = jax.lax.scan(
            band_step, jnp.zeros((ny, nx), img.dtype), jnp.arange(n_bands))
        return acc

    # scan over tilts bounds peak memory to one (ny, nx) spectrum at a time
    return jax.lax.map(per_tilt, (tilts, tilt_angles, defoci))


def ctf_correct_tilts(
    tilts, tilt_angles, defoci, pixel_size,
    voltage_kv=300.0, cs_mm=2.7, amplitude_contrast=0.07, axis_angle=0.0,
    n_bands: int = 20,
):
    """Phase-flip each tilt with the defocus gradient along the tilt
    direction (IMOD ctfphaseflip role): defocus(x) = df_t + x * pixel *
    tan(theta) (x measured from the tilt axis). Strip-free: per-column
    defocus is rounded to `n_bands` defocus bands; each band's phase-flip
    is one batched FFT pair, and the bands are combined with a one-hot
    column mask — the whole series is a single jitted scan (no host loop;
    a K3-sized 41-tilt series corrects in well under a second warm).

    defoci: (T,) nominal defocus (Å) at the tilt axis, per tilt.
    """
    tilts = jnp.asarray(tilts, dtype=jnp.float32)
    angles = jnp.asarray(tilt_angles, dtype=jnp.float32)
    dfs = jnp.asarray(defoci, dtype=jnp.float32)
    return _ctf_correct_tilts_jit(
        tilts, angles, dfs, float(pixel_size), float(voltage_kv),
        float(cs_mm), float(amplitude_contrast), int(n_bands),
    )


@functools.partial(
    jax.jit,
    static_argnames=("tile", "pixel_size", "voltage_kv", "cs_mm", "w",
                     "df_range", "df_step", "min_res", "max_res"),
)
def _half_defoci_jit(halves, defoci_rep, tile: int, pixel_size,
                     voltage_kv, cs_mm, w, df_range, df_step,
                     min_res, max_res):
    """Batched per-half defocus estimate: (2T, ny, nxh) half-images ->
    (2T,) best defocus by correlating the background-normalized radial
    power profile with |CTF|^2 over a candidate grid centered on each
    half's nominal defocus. One fused pass — no per-tilt host loop."""
    from pyp_tpu.ops.ctf_fit import (
        _gaussian_smooth_1d, _periodogram_pass, _radial_profile,
    )

    n_bins = 192
    powers = jax.vmap(lambda m: _periodogram_pass(m, tile, 0, 0))(halves)
    profiles = jax.vmap(lambda p: _radial_profile(p, n_bins))(powers)  # (2T, R)
    # background-subtract + zero-mean inside the fitting band
    bg = jax.vmap(lambda r: _gaussian_smooth_1d(r, 6.0))(profiles)
    prof = profiles - bg
    g_bins = (jnp.arange(n_bins, dtype=jnp.float32) + 0.5) / n_bins * 0.5
    g_phys = g_bins / pixel_size  # cycles/Å
    band = ((g_phys >= 1.0 / min_res) & (g_phys <= 1.0 / max_res)).astype(
        prof.dtype)
    prof = prof * band[None]
    prof = prof - (prof.sum(1, keepdims=True) / jnp.maximum(band.sum(), 1.0))
    prof = prof * band[None]
    prof = prof / jnp.sqrt(jnp.sum(prof * prof, axis=1, keepdims=True) + 1e-12)

    deltas = jnp.arange(-df_range, df_range + df_step, df_step,
                        dtype=jnp.float32)                      # (D,)
    df_cand = defoci_rep[:, None] + deltas[None, :]             # (2T, D)
    c = ctf_model.ctf_1d(
        g_phys[None, None, :], df_cand[..., None], voltage_kv, cs_mm, w)
    m = c * c * band[None, None, :]                             # (2T, D, R)
    m = m - (m.sum(-1, keepdims=True) / jnp.maximum(band.sum(), 1.0)) * band
    m = m / jnp.sqrt(jnp.sum(m * m, axis=-1, keepdims=True) + 1e-12)
    scores = jnp.einsum("br,bdr->bd", prof, m)                  # (2T, D)
    best = jnp.argmax(scores, axis=1)
    return jnp.take_along_axis(df_cand, best[:, None], axis=1)[:, 0]


def detect_handedness(tilts, tilt_angles, defoci, pixel_size,
                      voltage_kv=300.0, cs_mm=2.7, w=0.07,
                      min_tilt: float = 20.0, df_range: float = 8000.0,
                      df_step: float = 250.0, max_tilt: float = 90.0):
    """Defocus handedness detection (ctf/core.py:1935 `detect_handedness`):
    estimate defocus separately on the left and right halves of every tilt;
    the defocus gradient across the tilt axis must match +tan(theta) for
    one handedness and -tan(theta) for the other. All halves of all tilts
    are scored in one batched jitted pass (periodogram -> radial profile ->
    |CTF|^2 grid correlation). Returns +1 or -1 (the sign to apply to the
    defocus gradient) and the per-tilt gradient measurements."""
    tilts = np.asarray(tilts)
    T, ny, nx = tilts.shape
    half = nx // 2
    angles = np.asarray(tilt_angles, dtype=np.float32)
    # gradient too small below min_tilt; half-spectra too smeared above
    # max_tilt (reference ctf_handedness_mintilt/maxtilt)
    keep = (np.abs(angles) >= min_tilt) & (np.abs(angles) <= max_tilt)
    if not keep.any():
        return 0, np.array([])
    halves = jnp.asarray(np.concatenate(
        [tilts[keep][:, :, :half], tilts[keep][:, :, half:2 * half]], axis=0,
    ), dtype=jnp.float32)  # (2K, ny, half) — left block then right block
    df_rep = jnp.asarray(np.tile(np.asarray(defoci, np.float32)[keep], 2))
    fits = np.asarray(_half_defoci_jit(
        halves, df_rep, int(min(256, ny, half)), float(pixel_size),
        float(voltage_kv), float(cs_mm), float(w), float(df_range),
        float(df_step), 30.0, 8.0,
    ))
    K = int(keep.sum())
    measured = (fits[K:] - fits[:K]) / (half * pixel_size)  # d(df)/dx
    grads = measured * np.tan(np.radians(angles[keep]))
    return (1 if np.median(grads) > 0 else -1), np.asarray(grads)


def _forward_project(vol, angle, nx: int):
    """Parallel-beam forward projection of (tz, ny, nx) about the y tilt
    axis — the adjoint of wbp_reconstruct's gather: proj[y, x'] integrates
    vol along the ray x = (x' - z sin) / cos. Gathers along x per z plane
    (rows independent), one fused gather per z like the WBP kernel."""
    tz, ny, _ = vol.shape
    cx = nx // 2
    cz = tz // 2
    cos_t, sin_t = jnp.cos(angle), jnp.sin(angle)
    xs = jnp.arange(nx, dtype=jnp.float32) - cx      # x' (detector)
    zs = jnp.arange(tz, dtype=jnp.float32) - cz

    def one_z(carry, zi):
        acc = carry
        x_src = (xs - zs[zi] * sin_t) / cos_t + cx   # (nx,)
        xp = jnp.clip(x_src, 0.0, nx - 1.000001)
        x0 = jnp.floor(xp).astype(jnp.int32)
        fx = xp - x0
        plane = vol[zi]                               # (ny, nx)
        v0 = plane[:, x0]
        v1 = plane[:, jnp.minimum(x0 + 1, nx - 1)]
        vals = v0 * (1 - fx)[None, :] + v1 * fx[None, :]
        inb = ((x_src >= 0) & (x_src <= nx - 1)).astype(vol.dtype)
        return acc + vals * inb[None, :], None

    acc0 = jnp.zeros((ny, nx), dtype=vol.dtype)
    proj, _ = jax.lax.scan(one_z, acc0, jnp.arange(tz))
    # 1/cos: ray path length per z sample
    return proj / jnp.maximum(cos_t, 0.2)


def _backproject_one(img, angle, thickness: int, ny: int, nx: int):
    """Unfiltered backprojection of a single (ny, nx) image (same geometry
    as wbp_reconstruct's inner gather)."""
    cx = nx // 2
    cz = thickness // 2
    xs = jnp.arange(nx, dtype=jnp.float32) - cx
    zs = jnp.arange(thickness, dtype=jnp.float32) - cz
    xprime = xs[None, :] * jnp.cos(angle) + zs[:, None] * jnp.sin(angle) + cx
    xp = jnp.clip(xprime, 0.0, nx - 1.000001)
    x0 = jnp.floor(xp).astype(jnp.int32)
    fx = xp - x0
    v0 = img[:, x0.reshape(-1)].reshape(ny, thickness, nx)
    v1 = img[:, jnp.minimum(x0 + 1, nx - 1).reshape(-1)].reshape(ny, thickness, nx)
    vals = v0 * (1 - fx)[None] + v1 * fx[None]
    inb = ((xprime >= 0) & (xprime <= nx - 1)).astype(img.dtype)
    return jnp.transpose(vals, (1, 0, 2)) * inb[:, None, :]


@functools.partial(jax.jit, static_argnames=("thickness", "iterations",
                                             "subsets"))
def sart_reconstruct(
    tilts, tilt_angles, shifts=None, thickness: int = 128,
    iterations: int = 10, relax: float = 1.0, subsets: int = 4,
    tilt_weights=None,
):
    """SART/SIRT iterative tomogram reconstruction (the AreTomo `-Sart`
    option the reference exposes, align/core.py:4993-5200; reference CLI
    `tomo_rec_method=sart`).

    Ordered-subset Landweber: per subset, forward-project the current
    volume along its tilts, backproject the normalized residual, and take a
    relaxed step. subsets=1 is plain SIRT; more subsets converge faster per
    pass (AreTomo uses ~5 angular subsets). Initialized from the
    subsets are angularly interleaved so each update sees full coverage;
    starts from zero. Returns (thickness, ny, nx)."""
    tilts = jnp.asarray(tilts, dtype=jnp.float32)
    T, ny, nx = tilts.shape
    angles = jnp.deg2rad(jnp.asarray(tilt_angles, dtype=jnp.float32))
    if shifts is not None:
        from pyp_tpu.core.fft import shift_images

        tilts = shift_images(tilts, jnp.asarray(shifts))
    if tilt_weights is not None:
        tilts = tilts * jnp.asarray(tilt_weights)[:, None, None]

    # ray-length normalization per tilt: backprojection of ones
    def bp_subset(imgs, angs):
        def one(carry, i):
            return carry + _backproject_one(imgs[i], angs[i], thickness,
                                            ny, nx), None
        acc, _ = jax.lax.scan(one, jnp.zeros((thickness, ny, nx)),
                              jnp.arange(imgs.shape[0]))
        return acc

    # interleaved subsets keep angular coverage per update
    order = np.arange(T)
    subs = [jnp.asarray(order[s::subsets]) for s in range(subsets)]

    vol = jnp.zeros((thickness, ny, nx), dtype=jnp.float32)
    # SIRT normalizations x += λ C Aᵀ R (p − A x): R = 1/ray length
    # (forward projection of a ones volume, per tilt) and C = 1/voxel ray
    # count (backprojection of ones). Without R the update overshoots by
    # ~thickness/T and the iteration oscillates to divergence.
    ones_vol = jnp.ones((thickness, ny, nx), dtype=jnp.float32)

    def fp_subset(v, sub):
        def fp(carry, i):
            return carry, _forward_project(v, angles[i], nx)
        _, projs = jax.lax.scan(fp, None, sub)
        return projs

    raylen_cache = [fp_subset(ones_vol, sub) + 1e-3 for sub in subs]
    count_cache = [bp_subset(jnp.ones_like(tilts)[sub], angles[sub]) + 1e-3
                   for sub in subs]

    def one_pass(vol, _):
        for sub, raylen, count in zip(subs, raylen_cache, count_cache):
            projs = fp_subset(vol, sub)
            resid = (tilts[sub] - projs) / raylen
            upd = bp_subset(resid, angles[sub]) / count
            vol = vol + relax * upd
        return vol, None

    vol, _ = jax.lax.scan(one_pass, vol, jnp.arange(iterations))
    return vol


def wbp_reconstruct_halves(tilts, tilt_angles, shifts=None, thickness: int = 128,
                           **kw):
    """Even/odd-tilt half tomograms for noise2noise denoising training
    (reference reconstruct_tomo_halves, merge/core.py:707). Returns
    (half_even, half_odd)."""
    tilts = jnp.asarray(tilts)
    angles = jnp.asarray(tilt_angles)
    idx = np.arange(tilts.shape[0])
    halves = []
    for par in (0, 1):
        sel = idx[idx % 2 == par]
        sh = None if shifts is None else jnp.asarray(shifts)[sel]
        halves.append(wbp_reconstruct(tilts[sel], angles[sel], shifts=sh,
                                      thickness=thickness, **kw))
    return halves[0], halves[1]


# ---------------------------------------------------------------------------
# CTF deconvolution (IsoNet `deconv` / Warp deconvolution filter role)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("pixel_size", "voltage_kv", "cs_mm", "w",
                     "snr_falloff", "deconv_strength", "highpass_nyquist",
                     "phase_flipped"),
)
def _ctf_deconvolve_jit(vol, defocus, pixel_size, voltage_kv, cs_mm, w,
                        snr_falloff, deconv_strength, highpass_nyquist,
                        phase_flipped):
    nz, ny, nx = vol.shape
    F = jnp.fft.rfftn(vol)
    gz = jnp.fft.fftfreq(nz)[:, None, None]
    gy = jnp.fft.fftfreq(ny)[None, :, None]
    gx = jnp.fft.rfftfreq(nx)[None, None, :]
    # |g| as a fraction of Nyquist (cycles/px * 2); reaches sqrt(3) in corners
    fnyq = 2.0 * jnp.sqrt(gz * gz + gy * gy + gx * gx)
    g_abs = fnyq / (2.0 * pixel_size)  # cycles/Å for the CTF model

    c = ctf_model.ctf_1d(g_abs, jnp.asarray(defocus, jnp.float32),
                         voltage_kv, cs_mm, w=w)
    c = jnp.where(phase_flipped, jnp.abs(c), c)

    # assumed SSNR model: exponential falloff with frequency, scaled by the
    # deconvolution strength, rolled off to zero at DC by a cosine highpass
    # (suppresses gradient/illumination blowup where the CTF is ~0 at g=0)
    hp = 1.0 - jnp.cos(jnp.minimum(fnyq / highpass_nyquist, 1.0) * jnp.pi)
    snr = (jnp.exp(-100.0 * snr_falloff * fnyq / pixel_size)
           * (10.0 ** (3.0 * deconv_strength)) * hp)
    wiener = c / (c * c + 1.0 / jnp.maximum(snr, 1e-12))
    return jnp.fft.irfftn(F * wiener, s=(nz, ny, nx))


def ctf_deconvolve(vol, defocus, pixel_size,
                   voltage_kv: float = 300.0, cs_mm: float = 2.7,
                   w: float = 0.07, snr_falloff: float = 1.0,
                   deconv_strength: float = 1.0,
                   highpass_nyquist: float = 0.02,
                   phase_flipped: bool = False):
    """Wiener CTF deconvolution of a tomogram (or a stack of 2D images).

    The IsoNet pre-processing step the reference shells out for
    (isonet.py deconv, /root/reference/src/pyp/detect/isonet_tools.py:64:
    snrfalloff/deconvstrength/highpassnyquist parameters) — restores low-
    resolution contrast for visualization, segmentation, and picking. The
    filter is radial: CTF(|g|) / (CTF^2 + 1/SSNR(|g|)) with an assumed
    exponentially-falling SSNR; everything evaluates analytically per rfft
    voxel (one fused elementwise pass between two FFTs — no profile
    interpolation table needed on TPU).

    vol: (nz, ny, nx) tomogram — or (ny, nx) single image.
    defocus: mean defocus in Å (underfocus positive).
    phase_flipped: the input was already CTF-corrected by phase flipping,
        so deconvolve with |CTF| (reference ctfphaseflip + deconv order).
    """
    vol = jnp.asarray(vol, jnp.float32)
    squeeze = vol.ndim == 2
    if squeeze:
        vol = vol[None]
    out = _ctf_deconvolve_jit(
        vol, float(defocus), float(pixel_size), float(voltage_kv),
        float(cs_mm), float(w), float(snr_falloff), float(deconv_strength),
        float(highpass_nyquist), bool(phase_flipped))
    return out[0] if squeeze else out
