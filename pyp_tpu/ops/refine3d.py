"""Projection-matching 3D refinement — the refine3d-equivalent kernel.

Replaces the reference's wrapped cisTEM2 `refine3d` binary (stdin contract
/root/reference/src/pyp/refine/frealign/frealign.py:3916-4010; SURVEY §A.1).
TPU-first design:

  * **global search**: reference projections are sliced once per search
    direction (phi, theta) at band-limited mask points; in-plane psi is
    handled by sampling the *particle* spectrum at rotated mask points (a 2D
    gather) so projections are not recomputed per psi; shifts are scored with
    separable phasors. The whole (particle x psi) x direction x shift score
    tensor reduces to a loop of complex matmuls on the MXU — no CC-map FFTs;
  * **local refinement**: the score is a differentiable function of
    (phi, theta, psi, sy, sx) through the trilinear Fourier-slice gather, so
    poses are polished with a few vmapped gradient-ascent steps instead of
    the reference's per-particle Powell searches;
  * scoring is FREALIGN-style CTF-weighted normalized cross-correlation in an
    annulus, with optional per-shell SSNR weights.

Outputs per particle: pose, shifts, score (x100), logp/sigma proxies — the
columns the .par/.cistem tables carry (SURVEY §A.1/§A.6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core import ctf as ctf_model
from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops.fourier_slice import (
    gather_2d_hermitian,
    gather_3d_hermitian,
    image_to_fourier,
    volume_to_fourier,
)


class RefineResult(NamedTuple):
    phi: jax.Array
    theta: jax.Array
    psi: jax.Array
    shift_y: jax.Array   # pixels
    shift_x: jax.Array
    score: jax.Array     # FREALIGN-style score (NCC * 100)
    logp: jax.Array
    sigma: jax.Array


# ---------------------------------------------------------------------------
# search geometry (host-side constants)
# ---------------------------------------------------------------------------

def make_directions(angular_step_deg: float, symmetry: str = "C1") -> np.ndarray:
    """(D, 2) array of (phi, theta) projection directions covering the
    asymmetric unit of `symmetry` quasi-uniformly."""
    from pyp_tpu.core.geometry import apply_symmetry_matrices

    thetas = np.arange(0.0, 180.0 + 1e-6, angular_step_deg)
    dirs = []
    for t in thetas:
        st = np.sin(np.radians(max(t, 1e-3)))
        n_phi = max(1, int(round(360.0 * st / angular_step_deg)))
        if t < 1e-6 or t > 180 - 1e-6:
            n_phi = 1
        for p in np.arange(n_phi) * (360.0 / n_phi):
            dirs.append((p, t))
    dirs = np.asarray(dirs, dtype=np.float32)
    sym_mats = apply_symmetry_matrices(symmetry)
    if len(sym_mats) == 1:
        return dirs
    # keep directions whose viewing axis is the canonical representative of
    # its symmetry orbit (lexicographic max of rotated z-axes)
    keep = []
    for phi, theta in dirs:
        R = np.asarray(euler_to_matrix(phi, theta, 0.0))
        v = R[2, :]  # viewing axis in volume frame
        orbit = np.einsum("sij,j->si", sym_mats, v)
        key = np.round(orbit @ np.array([1.0, 1e3, 1e6]), 4)
        if np.argmax(key) == 0:
            keep.append((phi, theta))
    return np.asarray(keep, dtype=np.float32)


def make_mask_points(n: int, pixel_size: float, low_res: float, high_res: float) -> np.ndarray:
    """(G, 2) integer wavenumber points (ky, kx) of the rfft half-plane inside
    the resolution annulus (static host-side constant)."""
    ky = (np.fft.fftfreq(n) * n).astype(np.float32)
    kx = np.arange(n // 2 + 1, dtype=np.float32)
    gy, gx = np.meshgrid(ky, kx, indexing="ij")
    g = np.sqrt(gy**2 + gx**2) / (n * pixel_size)  # 1/Å
    sel = (g > 1.0 / low_res) & (g < 1.0 / high_res) & (g < 0.5 / pixel_size)
    # drop the redundant kx==0, ky<0 half-line (Friedel duplicate)
    sel &= ~((gx == 0) & (gy < 0))
    pts = np.stack([gy[sel], gx[sel]], axis=-1)
    return pts.astype(np.float32)


def focus_mask_2d(poses, focus, n: int, pixel_size: float,
                  edge_px: float = 4.0):
    """Per-particle soft 2D masks selecting the PROJECTION of a focus
    sphere — the cisTEM refine3d focus-mask sphere + "apply 2D masking"
    cards (reference stdin lines 29-32/44, frealign.py:3958; enabled by
    class_focusmask). focus = (x, y, z, radius) in Å relative to the box
    center in volume coordinates; the sphere center projects through each
    particle's pose (a sphere projects to a circle of the same radius),
    and the particle's centering shift moves the content by -shift.
    Returns (B, n, n) masks in [0, 1] with a cosine-soft edge."""
    poses = jnp.asarray(poses)
    fx, fy, fz, fr = (float(v) for v in focus)
    R = euler_to_matrix(poses[:, 0], poses[:, 1], poses[:, 2])
    p = jnp.asarray([fx, fy, fz], dtype=jnp.float32) / pixel_size
    c = R @ p                       # (B, 3) image coords (x, y, z) in px
    # pose shifts are the CENTERING translation: raw content sits at
    # projected position minus the stored shift
    cx = c[:, 0] - poses[:, 4]
    cy = c[:, 1] - poses[:, 3]
    ax = jnp.arange(n, dtype=jnp.float32) - n // 2
    d2 = ((ax[None, :, None] - cy[:, None, None]) ** 2
          + (ax[None, None, :] - cx[:, None, None]) ** 2)
    t = (jnp.sqrt(d2) - fr / pixel_size) / max(edge_px, 1e-3)
    return 1.0 - jnp.clip(t, 0.0, 1.0)


def parse_focus_mask(value) -> tuple | None:
    """class_focusmask string "x,y,z,r" (or colon-separated) -> tuple of
    floats, None when empty/zero-radius (reference semantics: 0 = off)."""
    s = str(value or "").strip()
    if not s:
        return None
    parts = [float(v) for v in s.replace(":", ",").split(",")]
    if len(parts) != 4 or parts[3] <= 0:
        return None
    return tuple(parts)


def _rotate_points_2d(pts, psi_deg):
    """Rotate (ky, kx) points by Rz(psi): output point = Rz(psi) @ p."""
    a = jnp.deg2rad(psi_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    ky, kx = pts[..., 0], pts[..., 1]
    # (x', y') = (c*x - s*y, s*x + c*y)
    kx2 = c * kx - s * ky
    ky2 = s * kx + c * ky
    return jnp.stack([ky2, kx2], axis=-1)


def _ctf_at_points(pts, n, pixel_size, df1, df2, angast, voltage_kv, cs_mm, w, phase):
    """Evaluate the CTF at wavenumber points (..., 2) = (ky, kx)."""
    gy = pts[..., 0] / (n * pixel_size)
    gx = pts[..., 1] / (n * pixel_size)
    g = jnp.sqrt(gy * gy + gx * gx)
    azim = jnp.arctan2(gy, gx)
    df = ctf_model.defocus_at_azimuth(df1, df2, angast, azim)
    x = ctf_model.chi(g, df, voltage_kv, cs_mm, phase)
    amp = jnp.arctan2(w, jnp.sqrt(max(1.0 - w * w, 0.0)))
    return -jnp.sin(x + amp)


def _shift_phasors(pts, shifts, n):
    """exp(+2*pi*i (g . s) / n): (G, S) for points (G,2) and shifts (S,2)."""
    dot = pts[:, 0:1] * shifts[None, :, 0] + pts[:, 1:2] * shifts[None, :, 1]
    ph = 2.0 * jnp.pi * dot / n
    return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def make_shift_grid(extent_px: float, step_px: float) -> np.ndarray:
    """(S, 2) disk of candidate shifts (rotation-invariant so the rotated
    frame trick is exact)."""
    r = np.arange(-extent_px, extent_px + 1e-6, step_px)
    sy, sx = np.meshgrid(r, r, indexing="ij")
    sel = sy**2 + sx**2 <= extent_px**2 + 1e-6
    return np.stack([sy[sel], sx[sel]], axis=-1).astype(np.float32)


def shell_weights_from_fsc(fsc_curve, mask_pts, n: int):
    """Per-frequency-point scoring weights from a half-map FSC curve: the
    Cref figure of merit sqrt(2C/(1+C)) interpolated at each mask point's
    |g| — FREALIGN's SSNR/statistics weighting (refine_fssnr, SURVEY §A.1
    line 6). Host-side; pass the result as `weights` to local_refine."""
    curve = np.clip(np.asarray(fsc_curve, dtype=np.float64), 0.0, 1.0)
    n_bins = len(curve)
    r = np.sqrt((np.asarray(mask_pts) ** 2).sum(axis=1)) / n  # cycles/px
    idx = np.clip((r / 0.5 * n_bins).astype(int), 0, n_bins - 1)
    cref = np.sqrt(2.0 * curve / (1.0 + curve))
    return cref[idx].astype(np.float32)


# ---------------------------------------------------------------------------
# global search
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "topk", "use_pallas"),
)
def global_search(
    stack,
    ctf_params,          # (B, 4): df1, df2, angast_deg, phase_shift
    Fref,                # (n, n, n/2+1) centered reference spectrum
    directions,          # (D, 2) phi, theta
    psis,                # (P,) in-plane angles
    mask_pts,            # (G, 2) wavenumber points
    shift_grid,          # (S, 2) candidate shifts (pixels)
    n: int,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    topk: int = 4,
    use_pallas: bool = False,
):
    """Exhaustive orientation/shift search. Returns (poses (B, K, 5),
    scores (B, K)) of the top-K candidates (by in-plane angle), each with
    pose = (phi, theta, psi, sy, sx). The K candidates feed local
    refinement, which keeps the best (FREALIGN refines its top-20 hits the
    same way, frealign.py:3953)."""
    B = stack.shape[0]
    D = directions.shape[0]
    P = psis.shape[0]
    G = mask_pts.shape[0]
    vol_pad = Fref.shape[0] // n
    img_pad = 2  # oversample particle spectra so psi-rotated gathers are accurate

    X = image_to_fourier(stack, pad=img_pad)  # (B, img_pad*n, ...)

    # --- reference side: slice each direction at the mask points -----------
    Rd = euler_to_matrix(directions[:, 0], directions[:, 1], jnp.zeros(D))
    ex = Rd[:, 0, :]
    ey = Rd[:, 1, :]
    q = (
        mask_pts[None, :, 1, None] * ex[:, None, :]
        + mask_pts[None, :, 0, None] * ey[:, None, :]
    )  # (D, G, 3) xyz
    u = gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))  # (D, G)
    u2 = jnp.abs(u) ** 2

    # --- particle side: gather at psi-rotated points -----------------------
    rot_pts = jax.vmap(lambda p: _rotate_points_2d(mask_pts, p))(psis)  # (P, G, 2)

    def particle_values(Xi, cp):
        def per_psi(pts):
            xv = gather_2d_hermitian(Xi, pts, scale=float(img_pad))
            c = _ctf_at_points(
                pts, n, pixel_size, cp[0], cp[1], cp[2],
                voltage_kv, cs_mm, amplitude_contrast, cp[3],
            )
            return jnp.conj(xv) * c, c * c, jnp.abs(xv) ** 2
        return jax.vmap(per_psi)(rot_pts)  # tuples of (P, G)

    v, c2, x2 = jax.vmap(particle_values)(X, ctf_params)  # (B, P, G)
    v = v.reshape(B * P, G)
    c2 = c2.reshape(B * P, G)
    xnorm = jnp.sqrt(jnp.sum(x2.reshape(B * P, G), axis=1) + 1e-12)  # (BP,)

    cnorm = jnp.sqrt(c2 @ u2.T + 1e-12)  # (BP, D)
    E = _shift_phasors(jnp.asarray(mask_pts), jnp.asarray(shift_grid), n)  # (G, S)

    # best score over shifts for every (row, direction): fused Pallas kernel
    # on TPU (keeps u-tiles in VMEM across the shift loop), XLA scan
    # elsewhere — numerically identical (tests/test_pallas_kernels.py)
    from pyp_tpu.ops import pallas_kernels as pk

    ninv = 1.0 / (cnorm * xnorm[:, None])
    if jax.default_backend() in ("tpu", "axon") and use_pallas:
        best_ds, sidx_ds = pk.shift_scored_match(v, u.T, E, ninv)
    else:
        best_ds, sidx_ds = pk.shift_scored_match_xla(v, u.T, E, ninv)
    d_bp = jnp.argmax(best_ds, axis=1)                     # (BP,)
    score_bp = jnp.take_along_axis(best_ds, d_bp[:, None], axis=1)[:, 0]
    s_bp = jnp.take_along_axis(sidx_ds, d_bp[:, None], axis=1)[:, 0]

    score_bp = score_bp.reshape(B, P)
    k = min(topk, P)
    top_scores, psi_idx = jax.lax.top_k(score_bp, k)  # (B, K)
    flat = psi_idx + jnp.arange(B)[:, None] * P       # (B, K)
    d_best = d_bp[flat]
    s_best = s_bp[flat]

    dirs = jnp.asarray(directions)
    phi = dirs[d_best, 0]
    theta = dirs[d_best, 1]
    psi = jnp.asarray(psis)[psi_idx]
    sgrid = jnp.asarray(shift_grid)
    s_rot = sgrid[s_best]  # (B, K, 2) shift in the rotated frame
    # rotate back to image frame: s = Rz(psi) s'
    a = jnp.deg2rad(psi)
    c, s = jnp.cos(a), jnp.sin(a)
    sx = c * s_rot[..., 1] - s * s_rot[..., 0]
    sy = s * s_rot[..., 1] + c * s_rot[..., 0]
    pose = jnp.stack([phi, theta, psi, sy, sx], axis=-1)  # (B, K, 5)
    return pose, top_scores


# ---------------------------------------------------------------------------
# local (continuous) refinement
# ---------------------------------------------------------------------------

def _pose_score(pose, Xi, cp, Fref, mask_pts, n, pixel_size, voltage_kv, cs_mm, w):
    """Differentiable CTF-weighted NCC of one particle at one pose."""
    phi, theta, psi, sy, sx = pose[0], pose[1], pose[2], pose[3], pose[4]
    vol_pad = Fref.shape[0] // n
    R = euler_to_matrix(phi, theta, psi)
    ex = R[0, :]
    ey = R[1, :]
    q = mask_pts[:, 1, None] * ex[None, :] + mask_pts[:, 0, None] * ey[None, :]
    u = gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))  # (G,)
    c = _ctf_at_points(mask_pts, n, pixel_size, cp[0], cp[1], cp[2],
                       voltage_kv, cs_mm, w, cp[3])
    xv = gather_2d_hermitian(Xi, mask_pts)
    ph = 2.0 * jnp.pi * (mask_pts[:, 0] * sy + mask_pts[:, 1] * sx) / n
    phasor = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    num = jnp.sum(jnp.real(jnp.conj(xv) * phasor * c * u))
    den = jnp.sqrt(jnp.sum(jnp.abs(xv) ** 2) * jnp.sum(c * c * jnp.abs(u) ** 2) + 1e-12)
    return num / den


@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "iters"),
)
def local_refine(
    stack,
    ctf_params,
    Fref,
    poses,               # (B, 5) initial (phi, theta, psi, sy, sx)
    mask_pts,
    n: int,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    iters: int = 24,
    lr_angles: float = 2.0,
    lr_shifts: float = 0.4,
    weights=None,
    pose_mask=(1.0, 1.0, 1.0, 1.0, 1.0),
):
    """Gradient-ascent pose polishing, vmapped over particles. Angles in
    degrees, shifts in pixels; per-parameter learning rates with cosine decay.

    Perf note: the particle-side spectrum samples and the CTF are
    pose-INVARIANT, so they are gathered/evaluated once per particle and
    closed over by the per-step score — the gradient loop only re-gathers
    the reference slice and the shift phasors (halves the gather traffic
    and removes all CTF trig from the hot loop)."""
    X = image_to_fourier(stack)
    mask_pts = jnp.asarray(mask_pts)
    vol_pad = Fref.shape[0] // n
    # pose_mask (psi, theta, phi, shy, shx) freezes parameters the caller
    # excludes (cisTEM refine_mask, SURVEY §A.1 lines 38-42); our pose
    # layout is (phi, theta, psi, sy, sx)
    pm = jnp.asarray(pose_mask, dtype=jnp.float32)
    scale = jnp.array([lr_angles, lr_angles, lr_angles,
                       lr_shifts, lr_shifts]) * pm
    w = jnp.ones(mask_pts.shape[0]) if weights is None else jnp.asarray(weights)

    def precompute(Xi, cp):
        xv = gather_2d_hermitian(Xi, mask_pts)
        c = _ctf_at_points(mask_pts, n, pixel_size, cp[0], cp[1], cp[2],
                           voltage_kv, cs_mm, amplitude_contrast, cp[3])
        xnorm2 = jnp.sum(w * jnp.abs(xv) ** 2)
        return w * jnp.conj(xv) * c, w * c * c, xnorm2

    def score_cached(pose, xc, c2, xnorm2):
        phi, theta, psi, sy, sx = pose[0], pose[1], pose[2], pose[3], pose[4]
        R = euler_to_matrix(phi, theta, psi)
        q = (mask_pts[:, 1, None] * R[0, None, :]
             + mask_pts[:, 0, None] * R[1, None, :])
        u = gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))
        ph = 2.0 * jnp.pi * (mask_pts[:, 0] * sy + mask_pts[:, 1] * sx) / n
        phasor = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
        num = jnp.sum(jnp.real(xc * phasor * u))
        den = jnp.sqrt(xnorm2 * jnp.sum(c2 * jnp.abs(u) ** 2) + 1e-12)
        return num / den

    grad_fn = jax.grad(score_cached)

    def refine_one(pose0, Xi, cp):
        xc, c2, xnorm2 = precompute(Xi, cp)

        def step(carry, t):
            pose, m = carry
            g = grad_fn(pose, xc, c2, xnorm2)
            gn = g / (jnp.linalg.norm(g) + 1e-8)
            m = 0.7 * m + gn
            decay = 0.5 * (1 + jnp.cos(jnp.pi * t / iters))
            pose = pose + scale * decay * m
            return (pose, m), None

        # zeros_like keeps the carry's sharding/varying type equal to pose0's
        # (required under shard_map's varying-manual-axes check)
        (pose, _), _ = jax.lax.scan(step, (pose0, jnp.zeros_like(pose0)), jnp.arange(iters))
        sc0 = score_cached(pose0, xc, c2, xnorm2)
        sc1 = score_cached(pose, xc, c2, xnorm2)
        better = sc1 >= sc0
        return jnp.where(better, pose, pose0), jnp.where(better, sc1, sc0)

    poses_out, scores = jax.vmap(refine_one)(poses, X, ctf_params)
    return poses_out, scores


# ---------------------------------------------------------------------------
# top-level refinement driver
# ---------------------------------------------------------------------------

def refine_batch(
    stack,
    ctf_params,
    ref_volume,
    pixel_size: float,
    angular_step: float = 15.0,
    psi_step: float = 10.0,
    low_res: float = 40.0,
    high_res_search: float = 8.0,
    high_res_refine: float = 5.0,
    shift_extent: float = 6.0,
    shift_step: float = 2.0,
    symmetry: str = "C1",
    mode: str = "global",      # "global" | "local"
    init_poses=None,
    topk: int = 4,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    local_iters: int = 24,
    lr_angles: float = 2.0,
    lr_shifts: float = 0.4,
    shell_weights=None,
) -> RefineResult:
    """Full refine3d-equivalent on one batch of particles. `shell_weights`
    (G,) weights matching make_mask_points(low_res, high_res_refine) apply
    SSNR weighting to the local-refinement score (shell_weights_from_fsc)."""
    n = stack.shape[-1]
    Fref = volume_to_fourier(jnp.asarray(ref_volume))

    pts_refine = make_mask_points(n, pixel_size, low_res, high_res_refine)
    if mode == "global" or init_poses is None:
        directions = make_directions(angular_step, symmetry)
        psis = np.arange(0.0, 360.0, psi_step, dtype=np.float32)
        pts_search = make_mask_points(n, pixel_size, low_res, high_res_search)
        shift_grid = make_shift_grid(shift_extent, shift_step)
        cand, _ = global_search(
            jnp.asarray(stack), jnp.asarray(ctf_params), Fref,
            jnp.asarray(directions), jnp.asarray(psis), jnp.asarray(pts_search),
            jnp.asarray(shift_grid), n, pixel_size, voltage_kv, cs_mm,
            amplitude_contrast, topk=topk,
        )  # (B, K, 5)
        B, K = cand.shape[0], cand.shape[1]
        stack_rep = jnp.repeat(jnp.asarray(stack), K, axis=0)
        ctf_rep = jnp.repeat(jnp.asarray(ctf_params), K, axis=0)
        poses_k, scores_k = local_refine(
            stack_rep, ctf_rep, Fref, cand.reshape(B * K, 5),
            jnp.asarray(pts_refine), n, pixel_size, voltage_kv, cs_mm,
            amplitude_contrast, iters=local_iters, lr_angles=lr_angles,
            lr_shifts=lr_shifts, weights=shell_weights,
        )
        scores_k = scores_k.reshape(B, K)
        poses_k = poses_k.reshape(B, K, 5)
        best = jnp.argmax(scores_k, axis=1)
        poses = jnp.take_along_axis(poses_k, best[:, None, None], axis=1)[:, 0]
        scores = jnp.take_along_axis(scores_k, best[:, None], axis=1)[:, 0]
    else:
        poses, scores = local_refine(
            jnp.asarray(stack), jnp.asarray(ctf_params), Fref,
            jnp.asarray(init_poses), jnp.asarray(pts_refine), n, pixel_size,
            voltage_kv, cs_mm, amplitude_contrast, iters=local_iters,
            lr_angles=lr_angles, lr_shifts=lr_shifts, weights=shell_weights,
        )

    # FREALIGN-compatible output statistics: SCORE = 100*NCC; SIGMA = rms
    # residual proxy; LOGP = Gaussian log-likelihood proxy
    G = pts_refine.shape[0]
    sigma = jnp.sqrt(jnp.maximum(1.0 - scores**2, 1e-6))
    logp = -0.5 * G * jnp.log(jnp.maximum(sigma, 1e-6))
    return RefineResult(
        phi=jnp.mod(poses[:, 0], 360.0),
        theta=jnp.mod(poses[:, 1], 360.0),
        psi=jnp.mod(poses[:, 2], 360.0),
        shift_y=poses[:, 3],
        shift_x=poses[:, 4],
        score=scores * 100.0,
        logp=logp,
        sigma=sigma,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "n_steps"),
)
def refine_defocus(
    stack,
    ctf_params,
    Fref,
    poses,
    mask_pts,
    n: int,
    pixel_size: float,
    search_range: float = 500.0,
    n_steps: int = 21,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
):
    """Per-particle defocus refinement at fixed pose — the cisTEM
    `refine_ctf` equivalent (SURVEY §2.2; reference frealign.py:4350):
    score a symmetric defocus-offset grid for every particle (one batched
    sweep) and apply a parabolic sub-step refinement. df1/df2 move together
    (astigmatism fixed). Returns (new_ctf_params, best_scores)."""
    X = image_to_fourier(stack)
    mask_pts = jnp.asarray(mask_pts)
    vol_pad = Fref.shape[0] // n
    offsets = jnp.linspace(-search_range, search_range, n_steps)

    def particle_sweep(pose, Xi, cp):
        # pose is fixed across the sweep: gather the reference slice and the
        # shifted particle values ONCE; only the CTF varies with defocus
        phi, theta, psi, sy, sx = pose[0], pose[1], pose[2], pose[3], pose[4]
        R = euler_to_matrix(phi, theta, psi)
        q = (mask_pts[:, 1, None] * R[0, None, :]
             + mask_pts[:, 0, None] * R[1, None, :])
        u = gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))
        xv = gather_2d_hermitian(Xi, mask_pts)
        ph = 2.0 * jnp.pi * (mask_pts[:, 0] * sy + mask_pts[:, 1] * sx) / n
        xu = jnp.conj(xv) * jax.lax.complex(jnp.cos(ph), jnp.sin(ph)) * u
        xnorm2 = jnp.sum(jnp.abs(xv) ** 2)
        u2 = jnp.abs(u) ** 2

        def score_one(d_off):
            c = _ctf_at_points(mask_pts, n, pixel_size, cp[0] + d_off,
                               cp[1] + d_off, cp[2], voltage_kv, cs_mm,
                               amplitude_contrast, cp[3])
            num = jnp.sum(jnp.real(xu) * c)
            den = jnp.sqrt(xnorm2 * jnp.sum(c * c * u2) + 1e-12)
            return num / den

        scores = jax.vmap(score_one)(offsets)
        i = jnp.argmax(scores)
        # parabolic refinement between neighboring grid points
        im = jnp.clip(i, 1, n_steps - 2)
        s0, s1, s2 = scores[im - 1], scores[im], scores[im + 1]
        denom = s0 + s2 - 2.0 * s1
        frac = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (s0 - s2) / denom, 0.0)
        frac = jnp.clip(frac, -1.0, 1.0)
        step = offsets[1] - offsets[0]
        best = offsets[im] + frac * step
        best = jnp.where((i == 0) | (i == n_steps - 1), offsets[i], best)
        return best, jnp.max(scores)

    d_best, scores = jax.vmap(particle_sweep)(poses, X, ctf_params)
    new_cp = ctf_params.at[:, 0].add(d_best).at[:, 1].add(d_best)
    return new_cp, scores


# ---------------------------------------------------------------------------
# beam tilt (refine_ctf parity: the cisTEM beam-tilt axis)
# ---------------------------------------------------------------------------

def beam_tilt_phase(n: int, pixel_size: float, tilt_x: float, tilt_y: float,
                    voltage_kv: float = 300.0, cs_mm: float = 2.7):
    """Beam-tilt phase field on the rfft grid (radians):

        dphi(g) = 2 pi * Cs * lambda^2 * |g|^2 * (gx tx + gy ty)

    with g in 1/Å, Cs in Å, lambda in Å, and (tx, ty) the beam tilt in
    radians — the antisymmetric coma term cisTEM's refine_ctf estimates
    (SURVEY §2.2 refine_ctf row; axis previously unimplemented here)."""
    lam = ctf_model.wavelength(voltage_kv)
    cs_A = cs_mm * 1e7
    gy = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)[:, None]
    gx = jnp.arange(n // 2 + 1, dtype=jnp.float32)[None, :]
    gy = gy / (n * pixel_size)
    gx = gx / (n * pixel_size)
    g2 = gx * gx + gy * gy
    return (2.0 * jnp.pi * cs_A * lam * lam) * g2 * (gx * tilt_x + gy * tilt_y)


@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "low_res", "high_res"),
)
def estimate_beam_tilt(
    stack, ctf_params, Fref, poses,
    n: int, pixel_size: float,
    voltage_kv: float = 300.0, cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    low_res: float = 20.0, high_res: float = 4.0,
):
    """Estimate (tilt_x, tilt_y) in radians from the dataset-averaged
    cross-phase between data and model projections.

    D(g) = sum_b conj(CTF_b * slice_b * phasor_b) * X_b accumulates the
    residual phase; where |D| is significant, arg D(g) ~ dphi(g). The
    antisymmetric cubic model is linear in (tx, ty), so a |D|-weighted
    least-squares on sin(arg D) solves a 2x2 system (cisTEM refine_ctf's
    beam-tilt search role, frealign.py:4350)."""
    from pyp_tpu.ops import reconstruct as rec

    X = image_to_fourier(stack)
    R = euler_to_matrix(poses[:, 0], poses[:, 1], poses[:, 2])
    from pyp_tpu.ops.fourier_slice import project

    U = project(Fref, R, n)                               # (B, n, nxf)
    ctfs = rec._ctf_grids(n, pixel_size, ctf_params, voltage_kv, cs_mm,
                          amplitude_contrast)
    U = rec._shift_correct(U * ctfs, poses[:, 3:5], n)
    D = jnp.sum(jnp.conj(U) * X, axis=0)                  # (n, nxf)

    gy = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)[:, None]
    gx = jnp.arange(n // 2 + 1, dtype=jnp.float32)[None, :]
    gphys = jnp.sqrt(gy * gy + gx * gx) / (n * pixel_size)
    band = ((gphys >= 1.0 / low_res) & (gphys <= 1.0 / high_res))
    wgt = jnp.abs(D) * band
    # small-angle: sin(arg D) ~ dphi; basis fields per unit tilt
    ph_x = beam_tilt_phase(n, pixel_size, 1.0, 0.0, voltage_kv, cs_mm)
    ph_y = beam_tilt_phase(n, pixel_size, 0.0, 1.0, voltage_kv, cs_mm)
    s = jnp.imag(D) / jnp.maximum(jnp.abs(D), 1e-12)      # sin(arg D)
    # weighted normal equations for s = tx*ph_x + ty*ph_y
    axx = jnp.sum(wgt * ph_x * ph_x)
    axy = jnp.sum(wgt * ph_x * ph_y)
    ayy = jnp.sum(wgt * ph_y * ph_y)
    bx = jnp.sum(wgt * ph_x * s)
    by = jnp.sum(wgt * ph_y * s)
    det = axx * ayy - axy * axy
    tx = jnp.where(jnp.abs(det) > 1e-20, (bx * ayy - by * axy) / det, 0.0)
    ty = jnp.where(jnp.abs(det) > 1e-20, (by * axx - bx * axy) / det, 0.0)
    return tx, ty


def correct_beam_tilt(stack, tilt_x: float, tilt_y: float, pixel_size: float,
                      voltage_kv: float = 300.0, cs_mm: float = 2.7):
    """Remove an estimated beam tilt from a particle stack (multiply the
    spectra by e^{-i dphi})."""
    n = stack.shape[-1]
    ph = beam_tilt_phase(n, pixel_size, tilt_x, tilt_y, voltage_kv, cs_mm)
    X = image_to_fourier(jnp.asarray(stack))
    corr = jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
    from pyp_tpu.ops.fourier_slice import fourier_to_image

    return fourier_to_image(X * corr, n)
