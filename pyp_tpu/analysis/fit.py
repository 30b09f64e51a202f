"""Trajectory regularization: smoothing of per-frame / per-tilt parameter
tracks.

Equivalent of the reference's analysis/fit.py (fit_spline_trajectory_1D
:122, regularize :873) — the smoothing that stabilizes per-frame CSP/movie
refinement. Implemented as cubic smoothing splines via scipy plus a
spatially-coupled Gaussian regularizer over particle neighborhoods.
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import UnivariateSpline


def fit_spline_trajectory(values, smoothing: float | None = None, k: int = 3):
    """Smooth a 1-D trajectory (n_frames,) with a smoothing spline; returns
    the smoothed values on the same grid."""
    values = np.asarray(values, dtype=np.float64)
    n = len(values)
    if n <= k + 1:
        return values.copy()
    t = np.arange(n, dtype=np.float64)
    if smoothing is None:
        smoothing = n * np.var(values) * 0.1
    spl = UnivariateSpline(t, values, k=min(k, n - 1), s=smoothing)
    return spl(t)


def regularize_trajectories(tracks, positions=None, time_sigma: float = 21.0,
                            spatial_sigma: float = 500.0):
    """Regularize per-particle trajectories (P, T, D) by Gaussian smoothing
    in time and (optionally) averaging over spatial neighbors weighted by a
    Gaussian of inter-particle distance — the reference's csp_spatial_sigma /
    csp_time_sigma semantics (pyp_config §A.3).

    positions: (P, 2 or 3) particle positions in unbinned pixels.
    """
    tracks = np.asarray(tracks, dtype=np.float64)
    P, T, D = tracks.shape

    # temporal Gaussian smoothing
    t = np.arange(T)
    w = np.exp(-0.5 * ((t[:, None] - t[None, :]) / max(time_sigma, 1e-3)) ** 2)
    w /= w.sum(axis=1, keepdims=True)
    smoothed = np.einsum("ts,psd->ptd", w, tracks)

    if positions is not None and P > 1:
        pos = np.asarray(positions, dtype=np.float64)
        d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
        sw = np.exp(-0.5 * d2 / max(spatial_sigma, 1e-3) ** 2)
        sw /= sw.sum(axis=1, keepdims=True)
        smoothed = np.einsum("pq,qtd->ptd", sw, smoothed)
    return smoothed
