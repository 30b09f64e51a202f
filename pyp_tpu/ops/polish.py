"""Per-particle movie refinement ("polishing").

Rebuild of the reference's local frame alignment (align/core.py:279
`align_spr_local` / :438 `align_spr_local_inner`, and the per-frame CSP
FIND axis): refine a per-particle, per-frame 2D trajectory against
CTF-weighted projections of the current reference, with temporal smoothness
regularization, then produce dose-weighted polished particle images.

Design: one differentiable loss over all (particle, frame) windows — the
trajectory tensor (P, F, 2) is optimized jointly by gradient ascent with a
second-difference penalty along frames (the reference's spline
regularization, analysis/fit.py) — then frames are summed with
Grant-Grigorieff dose weights (ops.motion.dose_weighted_average semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core.ctf import dose_weight_2d
from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops.fourier_slice import (
    gather_2d_hermitian,
    gather_3d_hermitian,
    image_to_fourier,
)
from pyp_tpu.ops.refine3d import _ctf_at_points, make_mask_points


@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "iters", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "spatial_sigma"),
)
def refine_trajectories(
    windows,            # (P, F, n, n) per-frame particle windows
    poses,              # (P, 5) refined poses (phi, theta, psi, sy, sx)
    ctf_params,         # (P, 4)
    Fref,               # padded reference spectrum
    mask_pts,           # (G, 2)
    n: int,
    pixel_size: float,
    iters: int = 30,
    lr: float = 0.15,
    reg_weight: float = 2.0,
    spatial_sigma: float = 0.0,
    coords=None,
    init_traj=None,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
):
    """Returns (traj (P, F, 2) per-frame shifts to ADD to the global shift,
    final mean score).

    spatial_sigma > 0 (pixels; needs coords (P, 2)) adds the reference's
    spatial coupling (csp_spatial_sigma, pyp_config.toml:6480): beam-induced
    motion is locally coherent, so each particle's per-frame shift is pulled
    toward the Gaussian-weighted mean of its neighbours' — per-particle
    NCC alone cannot constrain trajectories of faint particles."""
    P, F = windows.shape[0], windows.shape[1]
    vol_pad = Fref.shape[0] // n
    X = image_to_fourier(windows)  # (P, F, n, nxf)
    mask = jnp.asarray(mask_pts)
    G = mask.shape[0]

    R = euler_to_matrix(poses[:, 0], poses[:, 1], poses[:, 2])
    q = (
        mask[None, :, 1, None] * R[:, None, 0, :]
        + mask[None, :, 0, None] * R[:, None, 1, :]
    )
    u = gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))  # (P, G)
    c = jax.vmap(
        lambda cp: _ctf_at_points(mask, n, pixel_size, cp[0], cp[1], cp[2],
                                  voltage_kv, cs_mm, amplitude_contrast, cp[3])
    )(ctf_params)  # (P, G)
    cu = c * u  # model per particle
    cu_norm = jnp.sqrt(jnp.sum(jnp.abs(cu) ** 2, axis=1) + 1e-12)  # (P,)

    xv = jax.vmap(jax.vmap(lambda Fi: gather_2d_hermitian(Fi, mask)))(X)  # (P, F, G)
    x_norm = jnp.sqrt(jnp.sum(jnp.abs(xv) ** 2, axis=2) + 1e-12)  # (P, F)

    base_shift = poses[:, 3:5][:, None, :]  # (P, 1, 2)

    W_sp = None
    if spatial_sigma and spatial_sigma > 0 and coords is not None and P > 1:
        cc = jnp.asarray(coords, dtype=jnp.float32)
        d2c = jnp.sum((cc[:, None, :] - cc[None, :, :]) ** 2, axis=-1)
        W_sp = jnp.exp(-0.5 * d2c / (spatial_sigma ** 2))
        W_sp = W_sp - jnp.diag(jnp.diag(W_sp))      # neighbours only
        W_sp = W_sp / (jnp.sum(W_sp, axis=1, keepdims=True) + 1e-9)

    def score_fn(traj):
        s = base_shift + traj  # (P, F, 2)
        ph = 2.0 * jnp.pi * (
            mask[None, None, :, 0] * s[..., 0:1]
            + mask[None, None, :, 1] * s[..., 1:2]
        ) / n
        phasor = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
        num = jnp.sum(jnp.real(jnp.conj(xv) * phasor * cu[:, None, :]), axis=2)
        ncc = num / (x_norm * cu_norm[:, None])
        d2 = traj[:, 2:] - 2 * traj[:, 1:-1] + traj[:, :-2]
        score = jnp.mean(ncc) - reg_weight * jnp.mean(d2 * d2)
        if W_sp is not None:
            resid = traj - jnp.einsum("pq,qfc->pfc", W_sp, traj)
            score = score - reg_weight * jnp.mean(resid * resid)
        return score

    grad_fn = jax.grad(score_fn)
    traj0 = jnp.zeros((P, F, 2)) if init_traj is None else jnp.asarray(init_traj)

    def step(carry, t):
        traj, m = carry
        g = grad_fn(traj)
        gn = g / (jnp.linalg.norm(g) + 1e-9)
        m = 0.7 * m + gn
        decay = 0.5 * (1 + jnp.cos(jnp.pi * t / iters))
        return (traj + lr * decay * m, m), None

    (traj, _), _ = jax.lax.scan(step, (traj0, jnp.zeros_like(traj0)),
                                jnp.arange(iters))
    better = score_fn(traj) >= score_fn(traj0)
    traj = jnp.where(better, traj, traj0)
    return traj, score_fn(traj)


@functools.partial(jax.jit, static_argnames=("pixel_size",))
def polished_average(windows, traj, doses, pixel_size: float = 1.0):
    """Dose-weighted per-particle frame sum at the refined trajectory.

    windows: (P, F, n, n); traj: (P, F, 2); doses: (F,). -> (P, n, n)."""
    P, F, n, _ = windows.shape
    Xf = jnp.fft.rfft2(windows)
    ky = jnp.fft.fftfreq(n).reshape(n, 1)
    kx = jnp.fft.rfftfreq(n).reshape(1, -1)
    ph = -2.0 * jnp.pi * (
        ky[None, None] * traj[..., 0, None, None]
        + kx[None, None] * traj[..., 1, None, None]
    )
    Xs = Xf * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    w = dose_weight_2d((n, n), pixel_size, doses)  # (F, n, nxf)
    return jnp.fft.irfft2(jnp.sum(Xs * w[None], axis=1), s=(n, n)) / F


def polish(
    frames, coords, poses, ctf_params, ref_volume, pixel_size: float,
    boxsize: int, doses=None, global_shifts=None, **kw,
):
    """Full polishing pass for one micrograph movie: window every particle
    from every frame (at drift-corrected positions), refine trajectories,
    return (polished stack (P, n, n), traj (P, F, 2))."""
    from pyp_tpu.ops.extract import extract_from_frames
    from pyp_tpu.ops.fourier_slice import volume_to_fourier

    F = frames.shape[0]
    windows = extract_from_frames(
        jnp.asarray(frames), jnp.asarray(coords), boxsize,
        shifts=global_shifts, invert=False, normalize=False,
    )  # (P, F, n, n)
    Fref = volume_to_fourier(jnp.asarray(ref_volume))
    mask_pts = make_mask_points(boxsize, pixel_size, 60.0, 3.0 * pixel_size)
    kw.setdefault("coords", jnp.asarray(coords, dtype=jnp.float32))
    traj, score = refine_trajectories(
        windows, jnp.asarray(poses), jnp.asarray(ctf_params), Fref,
        jnp.asarray(mask_pts), boxsize, pixel_size, **kw,
    )
    if doses is None:
        doses = jnp.arange(1, F + 1, dtype=jnp.float32)
    stack = polished_average(windows, traj, jnp.asarray(doses), pixel_size)
    return stack, traj
