"""CTF estimation from micrograph power spectra (CTFFIND4/5 equivalent).

Replaces the reference's wrapped ctffind4/ctffind5/ctffind_tilt binaries
(stdin contract /root/reference/src/pyp/ctf/core.py:204-271; periodogram
averaging semantics :1216). TPU-first design:

  1. tiled periodogram: overlapping tiles -> batched rFFT -> mean power;
  2. background removal via radial rolling-minimum/Gaussian smoothing;
  3. the spectrum is resampled once to polar coordinates P(g, theta); the
     astigmatic model CTF^2(g; df(theta)) is separable in azimuth, so scoring
     a (df, astig, angle, phase) candidate is a batch of 1-D correlations —
     the whole search grid is evaluated as one einsum on the MXU instead of
     materializing 2-D model spectra;
  4. coarse global grid -> two rounds of local grid refinement;
  5. outputs df1/df2/angast/phase/CC plus a CTFFIND-style goodness-of-fit
     resolution (correlation per shell crossing 0.3) and 1-D avgrot profiles.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core import ctf as ctf_model


class CtfFit(NamedTuple):
    df1: jax.Array        # Å (df1 >= df2)
    df2: jax.Array        # Å
    angast: jax.Array     # degrees
    phase_shift: jax.Array  # radians
    cc: jax.Array         # correlation score of the best fit
    fit_res: jax.Array    # Å: resolution to which the fit holds (CC_shell > 0.3)


@functools.partial(jax.jit, static_argnames=("tile", "oy", "ox"))
def _periodogram_pass(micrograph, tile: int, oy: int, ox: int):
    """Mean tile power for one tiling offset — reshape-based (no per-tile
    dynamic slices: 225 gather-tiles of a K3 micrograph cost ~4.5 s on a
    v5e; two reshaped batched-FFT passes cost ~0.1 s)."""
    ny, nx = micrograph.shape
    sub = jax.lax.dynamic_slice(
        micrograph, (oy, ox),
        (((ny - oy) // tile) * tile, ((nx - ox) // tile) * tile),
    )
    gy, gx = sub.shape[0] // tile, sub.shape[1] // tile
    tiles = sub.reshape(gy, tile, gx, tile).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(gy * gx, tile, tile)
    tiles = tiles - jnp.mean(tiles, axis=(1, 2), keepdims=True)
    return jnp.mean(jnp.abs(jnp.fft.rfft2(tiles)) ** 2, axis=0)


def periodogram(micrograph, tile: int = 512, overlap: float = 0.5):
    """Average power spectrum over (half-)overlapping tiles:
    (tile, tile//2+1). Two reshape-tiled passes offset by tile/2 give the
    50%-overlap average as batched FFTs."""
    ny, nx = micrograph.shape
    if ny < tile or nx < tile:
        tile_eff = min(ny, nx)
        return _periodogram_pass(micrograph, tile_eff, 0, 0)
    acc = _periodogram_pass(micrograph, tile, 0, 0)
    n_pass = 1
    if overlap > 0 and ny >= tile * 3 // 2 and nx >= tile * 3 // 2:
        acc = acc + _periodogram_pass(micrograph, tile, tile // 2, tile // 2)
        n_pass += 1
    return acc / n_pass


def _radial_profile(power, n_bins):
    ny, nxf = power.shape
    nx = (nxf - 1) * 2
    fy = np.fft.fftfreq(ny).reshape(ny, 1)
    fx = np.fft.rfftfreq(nx).reshape(1, nxf)
    r = np.sqrt(fy**2 + fx**2)
    bins = jnp.asarray(np.clip((r / 0.5 * n_bins).astype(np.int32), 0, n_bins - 1).reshape(-1))
    counts = jnp.zeros(n_bins).at[bins].add(1.0)
    sums = jnp.zeros(n_bins).at[bins].add(power.reshape(-1))
    return sums / jnp.maximum(counts, 1.0)


def _gaussian_smooth_1d(x, sigma):
    n = int(max(3, round(sigma * 6)) | 1)
    k = np.exp(-0.5 * ((np.arange(n) - n // 2) / sigma) ** 2)
    k = jnp.asarray(k / k.sum(), dtype=x.dtype)
    pad = n // 2
    xp = jnp.pad(x, pad, mode="edge")
    return jnp.convolve(xp, k, mode="valid")


def polar_resample(power, n_g: int = 256, n_theta: int = 64, g_max: float = 0.5):
    """Bilinear resample of an rfft-layout power spectrum to polar (g, theta).

    theta spans [0, pi) (Friedel symmetry); g in cycles/pixel up to g_max.
    Returns (P_polar (n_g, n_theta), g_axis (n_g,), theta_axis (n_theta,)).
    """
    ny, nxf = power.shape
    nx = (nxf - 1) * 2
    g = jnp.linspace(0.0, g_max, n_g)
    th = jnp.linspace(0.0, np.pi, n_theta, endpoint=False)
    gy = g[:, None] * jnp.sin(th)[None, :]
    gx = g[:, None] * jnp.cos(th)[None, :]
    # map to rfft grid indices; gx >= 0 always since theta in [0, pi) maps
    # negative gx to the Friedel mate (-gx, -gy)
    neg = gx < 0
    gx = jnp.where(neg, -gx, gx)
    gy = jnp.where(neg, -gy, gy)
    iy = gy * ny  # cycles/pixel * n = index in fft layout (fractional)
    ix = gx * nx
    iy = jnp.where(iy < 0, iy + ny, iy)
    y0 = jnp.floor(iy).astype(jnp.int32)
    x0 = jnp.floor(ix).astype(jnp.int32)
    wy = iy - y0
    wx = ix - x0
    y1 = (y0 + 1) % ny
    x1 = jnp.minimum(x0 + 1, nxf - 1)
    y0 = y0 % ny
    x0 = jnp.minimum(x0, nxf - 1)
    P = (
        power[y0, x0] * (1 - wy) * (1 - wx)
        + power[y1, x0] * wy * (1 - wx)
        + power[y0, x1] * (1 - wy) * wx
        + power[y1, x1] * wy * wx
    )
    return P, g, th


def _normalize_spectrum(P_polar, g_axis, bg_sigma: float = 6.0):
    """Subtract a smooth radial background and variance-normalize per ring."""
    radial = jnp.mean(P_polar, axis=1)
    bg = _gaussian_smooth_1d(radial, bg_sigma)
    P = P_polar - bg[:, None]
    # per-ring scale: robust against steep low-freq falloff
    scale = jnp.sqrt(jnp.mean(P * P, axis=1, keepdims=True) + 1e-12)
    return P / scale


def _model_polar(g_axis, theta_axis, df_mean, astig, angast_rad, phase,
                 pixel_size, voltage_kv, cs_mm, w, ring_mask=None):
    """CTF^2, zero-mean per ring, unit norm within the fit annulus, for a
    batch of parameter tuples. Returns (B, n_g, n_theta)."""
    g = g_axis[None, :, None] / pixel_size  # 1/Å
    df = df_mean[:, None, None] + astig[:, None, None] * jnp.cos(
        2.0 * (theta_axis[None, None, :] - angast_rad[:, None, None])
    )
    x = ctf_model.chi(g, df, voltage_kv, cs_mm, phase[:, None, None])
    amp = jnp.arctan2(w, jnp.sqrt(max(1.0 - w * w, 0.0)))
    c2 = jnp.sin(x + amp) ** 2
    # center over the radial fit band per azimuth (NOT over azimuth — that
    # would null the model entirely at zero astigmatism)
    if ring_mask is not None:
        m = ring_mask[None, :, None]
        band_mean = jnp.sum(c2 * m, axis=1, keepdims=True) / jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True), 1.0
        )
        c2 = (c2 - band_mean) * m
    norm = jnp.sqrt(jnp.mean(c2 * c2, axis=(1, 2), keepdims=True) + 1e-12)
    return c2 / norm


def _score_grid(P_norm, g_axis, theta_axis, ring_mask, params,
                pixel_size, voltage_kv, cs_mm, w, chunk=256):
    """NCC score for each (df_mean, astig, angast, phase) row of `params`."""
    m = ring_mask[:, None]
    band_mean = jnp.sum(P_norm * m, axis=0, keepdims=True) / jnp.maximum(
        jnp.sum(m, axis=0, keepdims=True), 1.0
    )
    Pm = (P_norm - band_mean) * m

    def score_chunk(p):
        model = _model_polar(
            g_axis, theta_axis, p[:, 0], p[:, 1], p[:, 2], p[:, 3],
            pixel_size, voltage_kv, cs_mm, w, ring_mask,
        )
        return jnp.einsum("gt,bgt->b", Pm, model)

    n = params.shape[0]
    pad = (-n) % chunk
    padded = jnp.concatenate([params, jnp.zeros((pad, 4), params.dtype)], axis=0)
    scores = jax.lax.map(score_chunk, padded.reshape(-1, chunk, 4))
    return scores.reshape(-1)[:n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "pixel_size", "voltage_kv", "cs_mm", "amplitude_contrast",
        "dfmin", "dfmax", "dfstep", "min_res", "max_res",
        "fit_astigmatism", "max_astig", "fit_phase",
        "n_g", "n_theta", "lowres_1d",
        "phase_min", "phase_max", "phase_steps", "bg_sigma",
        "known_astig", "known_astig_angle",
    ),
)
def fit_ctf(
    power,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    dfmin: float = 3000.0,
    dfmax: float = 50000.0,
    dfstep: float = 200.0,
    min_res: float = 30.0,
    max_res: float = 5.0,
    fit_astigmatism: bool = True,
    max_astig: float = 4000.0,
    fit_phase: bool = False,
    n_g: int = 384,
    n_theta: int = 64,
    lowres_1d: float = 8.0,
    phase_min: float = 0.0,
    phase_max: float = 3.1416,
    phase_steps: int = 14,
    bg_sigma: float = 6.0,
    known_astig: float | None = None,
    known_astig_angle: float = 0.0,
) -> CtfFit:
    """Fit CTF parameters to an averaged power spectrum (rfft layout).

    known_astig/known_astig_angle (Å / deg): pin astigmatism to calibrated
    values and fit only defocus/phase (reference ctf tab known_ast /
    known_ast_angle; ctffind --known-astigmatism role)."""
    P_polar, g_axis, theta_axis = polar_resample(power, n_g, n_theta)
    P_norm = _normalize_spectrum(P_polar, g_axis, bg_sigma=bg_sigma)
    g_inv_a = g_axis / pixel_size
    ring_mask = ((g_inv_a > 1.0 / min_res) & (g_inv_a < 1.0 / max_res)).astype(P_norm.dtype)

    w = amplitude_contrast
    # ---- stage 1: 1D exhaustive defocus scan (no astig) -------------------
    # restricted to a low-resolution sub-band: with astigmatism present the
    # azimuth-averaged rings dephase at high frequency, so a full-band 1D
    # score is misleading (same reason ctffind's 1D stage is band-limited)
    lowres_cut = max(max_res, lowres_1d)
    mask1 = ((g_inv_a > 1.0 / min_res) & (g_inv_a < 1.0 / lowres_cut)).astype(P_norm.dtype)
    n_df = int(max(2, round((dfmax - dfmin) / dfstep)))
    dfs = jnp.linspace(dfmin, dfmax, n_df)
    ph1 = (jnp.linspace(phase_min, phase_max, phase_steps, endpoint=False)
           if fit_phase else jnp.zeros(1))
    dd, pp = jnp.meshgrid(dfs, ph1, indexing="ij")
    dd, pp = dd.reshape(-1), pp.reshape(-1)
    params1 = jnp.stack([dd, jnp.zeros_like(dd), jnp.zeros_like(dd), pp], axis=1)
    s1 = _score_grid(P_norm, g_axis, theta_axis, mask1, params1,
                     pixel_size, voltage_kv, cs_mm, w)
    ibest = jnp.argmax(s1)
    df_best = dd[ibest]
    phase_best = pp[ibest]

    # ---- stage 2: astig grid around best defocus --------------------------
    if known_astig is not None:
        # pinned astigmatism: search defocus only, astig/angle fixed
        d_offsets = jnp.linspace(-6.0 * dfstep, 6.0 * dfstep, 13)
        ka = jnp.full_like(d_offsets, float(known_astig) / 2.0)
        kt = jnp.full_like(d_offsets, np.radians(float(known_astig_angle)))
        params2 = jnp.stack(
            [df_best + d_offsets, ka, kt,
             jnp.full_like(d_offsets, phase_best)], axis=1)
        s2 = _score_grid(P_norm, g_axis, theta_axis, ring_mask, params2,
                         pixel_size, voltage_kv, cs_mm, w)
        best2 = params2[jnp.argmax(s2)]
        fit_astigmatism = False  # stage 3 keeps a/t frozen
    elif fit_astigmatism:
        d_offsets = jnp.linspace(-6.0 * dfstep, 6.0 * dfstep, 13)
        astigs = jnp.linspace(0.0, max_astig, 11)
        angs = jnp.linspace(0.0, np.pi, 12, endpoint=False)
        phases = (jnp.linspace(-0.25, 0.25, 3) if fit_phase else jnp.zeros(1))
        grid = jnp.stack(
            [x.reshape(-1) for x in jnp.meshgrid(d_offsets, astigs, angs, phases, indexing="ij")],
            axis=1,
        )
        params2 = jnp.stack(
            [df_best + grid[:, 0], grid[:, 1], grid[:, 2], phase_best + grid[:, 3]], axis=1
        )
        s2 = _score_grid(P_norm, g_axis, theta_axis, ring_mask, params2,
                         pixel_size, voltage_kv, cs_mm, w)
        best2 = params2[jnp.argmax(s2)]
    else:
        best2 = jnp.stack([df_best, jnp.asarray(0.0), jnp.asarray(0.0), phase_best])

    # ---- stage 3: two rounds of local refinement --------------------------
    best = best2
    astig_free = known_astig is None
    for shrink in (0.25, 0.06):
        d_off = jnp.linspace(-dfstep * 4 * shrink, dfstep * 4 * shrink, 7)
        a_off = (jnp.linspace(-max_astig * 0.2 * shrink * 4,
                              max_astig * 0.2 * shrink * 4, 7)
                 if astig_free else jnp.zeros(1))
        t_off = (jnp.linspace(-np.pi / 12 * shrink * 4,
                              np.pi / 12 * shrink * 4, 7)
                 if astig_free else jnp.zeros(1))
        p_off = jnp.linspace(-0.3, 0.3, 5) if fit_phase else jnp.zeros(1)
        grid = jnp.stack(
            [x.reshape(-1) for x in jnp.meshgrid(d_off, a_off, t_off, p_off, indexing="ij")],
            axis=1,
        )
        cand = jnp.stack(
            [
                best[0] + grid[:, 0],
                jnp.maximum(best[1] + grid[:, 1], 0.0),
                best[2] + grid[:, 2],
                jnp.clip(best[3] + grid[:, 3], 0.0, np.pi),
            ],
            axis=1,
        )
        sc = _score_grid(P_norm, g_axis, theta_axis, ring_mask, cand,
                         pixel_size, voltage_kv, cs_mm, w)
        best = cand[jnp.argmax(sc)]
        best_score = jnp.max(sc)

    df_mean, astig, angast_rad, phase = best[0], best[1], best[2], best[3]
    df1 = df_mean + astig
    df2 = df_mean - astig
    angast_deg = jnp.rad2deg(jnp.mod(angast_rad, np.pi))

    # ---- goodness-of-fit resolution ---------------------------------------
    # sliding radial-window correlation between data and fitted model
    # (ctffind-style "fit quality vs resolution")
    model = _model_polar(
        g_axis, theta_axis, df_mean[None], astig[None], angast_rad[None],
        phase[None], pixel_size, voltage_kv, cs_mm, w, ring_mask,
    )[0]
    m = ring_mask[:, None]
    band_mean = jnp.sum(P_norm * m, axis=0, keepdims=True) / jnp.maximum(
        jnp.sum(m, axis=0, keepdims=True), 1.0
    )
    Pc = (P_norm - band_mean) * m
    win = 9
    kern = jnp.ones(win) / win

    def smooth_g(x):  # moving average along g for each azimuth
        return jax.vmap(lambda col: jnp.convolve(col, kern, mode="same"), in_axes=1, out_axes=1)(x)

    num = jnp.sum(smooth_g(Pc * model), axis=1)
    den = jnp.sqrt(
        jnp.sum(smooth_g(Pc * Pc), axis=1) * jnp.sum(smooth_g(model * model), axis=1) + 1e-12
    )
    ring_cc = num / den
    ring_cc_s = _gaussian_smooth_1d(ring_cc, 3.0)
    good = (ring_cc_s > 0.3) & (ring_mask > 0)
    # highest frequency bin that is still good
    idx = jnp.max(jnp.where(good, jnp.arange(n_g), 0))
    fit_res = pixel_size / jnp.maximum(g_axis[idx], 1e-6)

    return CtfFit(
        df1=df1, df2=df2, angast=angast_deg, phase_shift=phase,
        cc=best_score, fit_res=fit_res,
    )


def fit_ctf_micrograph(micrograph, pixel_size, tile: int = 512,
                       tile_overlap: float = 0.5, **kw) -> CtfFit:
    """Periodogram averaging + fit, end-to-end for one micrograph."""
    power = periodogram(micrograph, tile=tile, overlap=tile_overlap)
    return fit_ctf(power, pixel_size, **kw)


def fit_ctf_tilt_series(tilt_images, pixel_size, **kw):
    """Per-tilt CTF fits (the reference's ctffind_tilt path,
    /root/reference/src/pyp/ctf/core.py:1625): each tilt image gets its own
    periodogram + fit; vmapped-over-tilts where shapes allow."""
    fits = []
    for i in range(tilt_images.shape[0]):
        fits.append(fit_ctf_micrograph(tilt_images[i], pixel_size, **kw))
    return CtfFit(
        df1=jnp.stack([f.df1 for f in fits]),
        df2=jnp.stack([f.df2 for f in fits]),
        angast=jnp.stack([f.angast for f in fits]),
        phase_shift=jnp.stack([f.phase_shift for f in fits]),
        cc=jnp.stack([f.cc for f in fits]),
        fit_res=jnp.stack([f.fit_res for f in fits]),
    )


def avgrot(power, pixel_size, fit: CtfFit, voltage_kv=300.0, cs_mm=2.7, w=0.07, n_bins=256):
    """CTFFIND-style _avgrot table: (g, radial average, normalized average,
    fitted CTF^2, quality) as numpy arrays for plotting / .ctf output."""
    P_polar, g_axis, theta_axis = polar_resample(power, n_bins, 64)
    radial = jnp.mean(P_polar, axis=1)
    P_norm = _normalize_spectrum(P_polar, g_axis)
    norm_radial = jnp.mean(P_norm, axis=1)
    df_mean = 0.5 * (fit.df1 + fit.df2)
    model = ctf_model.ctf_1d(
        g_axis / pixel_size, df_mean, voltage_kv, cs_mm, w, fit.phase_shift
    ) ** 2
    return (
        np.asarray(g_axis / pixel_size),
        np.asarray(radial),
        np.asarray(norm_radial),
        np.asarray(model),
    )


def fit_ctf_local(micrograph, pixel_size, grid=(2, 2), tile: int = 512, **kw):
    """Per-region CTF fits + defocus plane fit.

    Equivalent of the reference's quadrant/local defocus estimation
    (ctf/core.py:571 `ctffind4_quad`, :715 `ctffind_spr_local_estimate`):
    the micrograph is split into a grid of regions, each fit independently;
    a plane df(x, y) is least-squares fit through the per-region means for
    per-particle defocus interpolation.

    Returns (fits: list[CtfFit] row-major, plane: (3,) [df0, ddf/dy, ddf/dx]
    in Å and Å/px)."""
    import numpy as np

    mic = np.asarray(micrograph)
    ny, nx = mic.shape
    gy, gx = grid
    fits = []
    centers = []
    for iy in range(gy):
        for ix in range(gx):
            sub = mic[iy * ny // gy:(iy + 1) * ny // gy,
                      ix * nx // gx:(ix + 1) * nx // gx]
            t = min(tile, min(sub.shape))
            fits.append(fit_ctf_micrograph(jnp.asarray(sub), pixel_size, tile=t, **kw))
            centers.append(((iy + 0.5) * ny / gy, (ix + 0.5) * nx / gx))
    dfs = np.array([0.5 * (float(f.df1) + float(f.df2)) for f in fits])
    # center the design matrix: with collinear region centers (e.g. a 1x2
    # grid) the raw lstsq min-norm solution leaks the CONSTANT defocus into
    # the degenerate gradient column; centering maps it cleanly to df0 and
    # zeroes the unconstrained direction instead
    cen = np.asarray(centers, dtype=np.float64)
    mean_c = cen.mean(axis=0)
    C = np.column_stack([np.ones(len(cen)), cen - mean_c])
    sol, *_ = np.linalg.lstsq(C, dfs, rcond=None)
    df0 = sol[0] - sol[1] * mean_c[0] - sol[2] * mean_c[1]
    plane = np.array([df0, sol[1], sol[2]])
    return fits, plane


def defocus_at_positions(plane, positions):
    """Evaluate the local-defocus plane at particle positions (N, 2) (y, x)."""
    import numpy as np

    pos = np.asarray(positions, dtype=np.float64)
    return plane[0] + plane[1] * pos[:, 0] + plane[2] * pos[:, 1]


def _model_polar_thickness(g_axis, theta_axis, df_mean, astig, angast_rad,
                           phase, thickness, pixel_size, voltage_kv, cs_mm,
                           w, ring_mask):
    """CTF^2 averaged over sample depth `thickness` (Å):

        <CTF^2>_t = 1/2 - 1/2 cos(2 chi) sinc(lambda g^2 t)

    (sinc normalized: sin(pi x)/(pi x)) — the CTFFIND5 sample-thickness model
    whose nodes sit where the sinc vanishes. thickness: (B,)."""
    g = g_axis[None, :, None] / pixel_size
    df = df_mean[:, None, None] + astig[:, None, None] * jnp.cos(
        2.0 * (theta_axis[None, None, :] - angast_rad[:, None, None])
    )
    x = ctf_model.chi(g, df, voltage_kv, cs_mm, phase[:, None, None])
    amp = jnp.arctan2(w, jnp.sqrt(max(1.0 - w * w, 0.0)))
    lam = ctf_model.wavelength(voltage_kv)
    node = jnp.sinc(lam * g * g * thickness[:, None, None])
    c2 = 0.5 - 0.5 * jnp.cos(2.0 * (x + amp)) * node
    m = ring_mask[None, :, None]
    band_mean = jnp.sum(c2 * m, axis=1, keepdims=True) / jnp.maximum(
        jnp.sum(m, axis=1, keepdims=True), 1.0
    )
    c2 = (c2 - band_mean) * m
    norm = jnp.sqrt(jnp.mean(c2 * c2, axis=(1, 2), keepdims=True) + 1e-12)
    return c2 / norm


def fit_thickness(power, pixel_size, fit: CtfFit,
                  voltage_kv: float = 300.0, cs_mm: float = 2.7,
                  amplitude_contrast: float = 0.07,
                  min_res: float = 30.0, max_res: float = 5.0,
                  t_max: float = 1000.0, n_steps: int = 51):
    """Sample-thickness estimation given a converged CTF fit (the CTFFIND5
    node-fitting step, SURVEY §A.4 `ctf_determine_thickness`): sweep
    thickness, re-score the depth-averaged model, parabolic-refine the peak.

    Returns (thickness_A, score_curve (n_steps,))."""
    n_g, n_theta = 384, 64
    P_polar, g_axis, theta_axis = polar_resample(power, n_g, n_theta)
    P_norm = _normalize_spectrum(P_polar, g_axis)
    g_inv_a = g_axis / pixel_size
    ring_mask = ((g_inv_a > 1.0 / min_res) & (g_inv_a < 1.0 / max_res)).astype(P_norm.dtype)
    m = ring_mask[:, None]
    band_mean = jnp.sum(P_norm * m, axis=0, keepdims=True) / jnp.maximum(
        jnp.sum(m, axis=0, keepdims=True), 1.0
    )
    Pm = (P_norm - band_mean) * m

    df_mean = 0.5 * (fit.df1 + fit.df2)
    astig = 0.5 * (fit.df1 - fit.df2)
    ang = jnp.deg2rad(fit.angast)
    # joint (defocus, thickness) sweep: the thin-sample fit absorbs part of
    # the node structure into a defocus bias, so df must be re-searched
    # together with t (CTFFIND5 does the same joint node fit)
    ts = jnp.linspace(0.0, t_max, n_steps)
    d_offs = jnp.linspace(-800.0, 800.0, 17)
    tt, dd = jnp.meshgrid(ts, d_offs, indexing="ij")
    tt, dd = tt.reshape(-1), dd.reshape(-1)
    model = _model_polar_thickness(
        g_axis, theta_axis,
        df_mean + dd, jnp.broadcast_to(astig, dd.shape),
        jnp.broadcast_to(ang, dd.shape),
        jnp.broadcast_to(fit.phase_shift, dd.shape),
        tt, pixel_size, voltage_kv, cs_mm, amplitude_contrast, ring_mask,
    )
    scores2d = jnp.einsum("gt,bgt->b", Pm, model).reshape(n_steps, 17)
    scores = jnp.max(scores2d, axis=1)  # best over df per thickness
    i = int(jnp.argmax(scores))
    j = int(jnp.argmax(scores2d[i]))
    df_best = float(df_mean + d_offs[j])
    if 0 < i < n_steps - 1:
        s0, s1, s2 = float(scores[i - 1]), float(scores[i]), float(scores[i + 1])
        denom = s0 + s2 - 2 * s1
        frac = 0.5 * (s0 - s2) / denom if abs(denom) > 1e-9 else 0.0
        t_best = float(ts[i]) + frac * float(ts[1] - ts[0])
    else:
        t_best = float(ts[i])
    return t_best, np.asarray(scores)


def diagnostic_image(power, pixel_size, fit: CtfFit, voltage_kv=300.0,
                     cs_mm=2.7, w=0.07, size: int = 512):
    """CTFFIND-style diagnostic: fftshifted power spectrum with the fitted
    CTF^2 model rendered in the upper-left half (the `power.mrc` output the
    reference parses/publishes, ctf/core.py stdin contract §A.4).
    Returns (size, size) float32."""
    import numpy as np

    from pyp_tpu.core.fft import fourier_crop

    ny, nxf = power.shape
    n = ny
    # full-plane spectrum by Friedel mirroring, shifted to center
    full = np.zeros((n, n), dtype=np.float32)
    p = np.asarray(power)
    full[:, : nxf] = p[:, ::-1]
    full[1:, nxf - 1:] = p[1:, 1:][::-1, :]
    full[0, nxf - 1:] = p[0, 1:]
    full = np.fft.fftshift(full, axes=0)
    if n != size:
        full = np.asarray(fourier_crop(jnp.asarray(full)[None], (size, size))[0])
    # contrast-equalize the data half per radial ring
    c = np.asarray(ctf_model.ctf_2d(
        (size, size), pixel_size * n / size, float(fit.df1), float(fit.df2),
        float(fit.angast), voltage_kv, cs_mm, w, float(fit.phase_shift),
        rfft=False,
    ))
    model = np.fft.fftshift(c**2)
    lo, hi = np.percentile(full, [2, 98])
    data = np.clip((full - lo) / max(hi - lo, 1e-9), 0, 1)
    yy, xx = np.mgrid[0:size, 0:size]
    upper_left = (yy + xx) < size
    out = np.where(upper_left, model, data)
    return out.astype(np.float32)
