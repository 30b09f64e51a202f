"""Constrained single-particle tomography (CSP/CSPT) refinement.

Replaces the reference's wrapped CSP binary (argv contract
/root/reference/src/pyp/system/local_run.py:363-463; modes
align/core.py:1015-1023; SURVEY §A.3): joint refinement of per-tilt-series
geometry and per-particle pose against projections of the current reference.

Model. A particle p sits in the tomogram at position pos_p (centered voxel
coords) with orientation M_p = R(phi_p, theta_p, psi_p) (reference -> tomogram).
Tilt t maps tomogram to image: R_t = Rz(axis_t) @ Ry(tilt_t), plus per-tilt
image shift d_t. The particle's projection in tilt t therefore has pose
R_eff = R_t @ M_p and lands at image position proj(R_t pos_p) + d_t; its
defocus is the tilt defocus plus the particle's depth along the beam.

TPU-first design. The CSP binary runs a Powell optimizer per parameter block
per tilt-series (mode -2/0/1/2/3/4 select blocks); here ALL blocks are
continuous inputs to one differentiable CTF-weighted correlation loss
(through the Fourier-slice gather), so each mode is just a gradient mask.
One tilt-series' full refinement is a handful of vmapped/jitted Adam steps;
tilt-series are data-parallel across chips; the trajectory regularization
(csp_transreg, pyp_config §A.3) is a quadratic penalty inside the same loss.

Reconstruction reuses ops.reconstruct with per-(particle, tilt) poses
(R_eff) and 2D windows — subtomogram averaging becomes the same gridding
insertion as SPA.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core.geometry import euler_to_matrix, rot_y, rot_z
from pyp_tpu.ops.fourier_slice import (
    gather_2d_hermitian,
    gather_3d_hermitian,
    image_to_fourier,
)
from pyp_tpu.ops.refine3d import _ctf_at_points, make_mask_points


class CspParams(NamedTuple):
    """All refinable quantities for one tilt-series (static shapes)."""
    tilt_angles: jax.Array    # (T,) degrees
    axis_angles: jax.Array    # (T,) degrees (in-plane tilt axis)
    tilt_shifts: jax.Array    # (T, 2) pixels (y, x) image shifts
    particle_eulers: jax.Array  # (P, 3) (phi, theta, psi) degrees
    particle_pos: jax.Array   # (P, 3) (z, y, x) centered tomogram voxels
    defocus_offsets: jax.Array  # (T,) Å added to the nominal tilt defocus


def make_params(tilt_angles, axis_angles, tilt_shifts, particle_eulers,
                particle_pos, defocus_offsets=None) -> "CspParams":
    import jax.numpy as _jnp

    if defocus_offsets is None:
        defocus_offsets = _jnp.zeros(_jnp.asarray(tilt_angles).shape[0])
    return CspParams(
        _jnp.asarray(tilt_angles), _jnp.asarray(axis_angles),
        _jnp.asarray(tilt_shifts), _jnp.asarray(particle_eulers),
        _jnp.asarray(particle_pos), _jnp.asarray(defocus_offsets),
    )


# mode -> which blocks get gradients (reference mode table align/core.py:1015)
MODE_BLOCKS = {
    0: ("tilt_angles", "axis_angles"),          # tilt geometry angles
    1: ("particle_eulers",),                    # particle rotations
    2: ("particle_pos",),                       # particle shifts (3D)
    3: ("tilt_shifts",),                        # micrograph shifts
    4: ("defocus_offsets",),                    # per-tilt defocus
    5: ("tilt_shifts",),                        # patch micrograph variant
    6: ("particle_pos",),                       # patch particle-shift variant
    7: ("particle_eulers",),                    # patch particle-rotation variant
}

# which axis a mode's searched block varies over: per-tilt blocks reduce the
# score over particles (and vice versa) so one full evaluation scores EVERY
# tilt's (or particle's) candidate at once — the csp_GS exhaustive build
# (align/core.py:696-701) becomes K batched evaluations
MODE_AXIS = {0: "tilt", 3: "tilt", 4: "tilt", 5: "tilt",
             1: "particle", 2: "particle", 6: "particle", 7: "particle"}

# modes whose searched block does NOT move the reference-slice gather
# points (translations are Fourier phase ramps, defocus is an analytic
# CTF): candidates/iterations reuse one _csp_model_gather
SHIFT_MODES = (2, 3, 4, 5, 6)

# modes whose searched block moves neither particle depth (= tilt-frame z
# of R_t @ pos) nor the defocus offsets: the (T, P, G) CTF is constant
# across candidates/iterations and is computed ONCE (particle eulers set
# M_p, not R_t, so depth is euler-invariant; micrograph shifts are pure
# translations)
CTF_CONST_MODES = (1, 3, 5, 7)


def tilt_rotation(tilt_deg, axis_deg):
    """R_t = Rz(axis) @ Ry(tilt): tomogram -> image frame (batched)."""
    return rot_z(axis_deg) @ rot_y(tilt_deg)


def project_positions(params: CspParams):
    """Predicted image positions (T, P, 2) = (y, x), centered coords."""
    R = tilt_rotation(params.tilt_angles, params.axis_angles)  # (T, 3, 3)
    pos_xyz = params.particle_pos[:, ::-1]  # (P, 3) -> (x, y, z)
    proj = jnp.einsum("tij,pj->tpi", R, pos_xyz)  # (T, P, 3) image-frame xyz
    xy = proj[..., :2]
    yx = xy[..., ::-1]
    return yx + params.tilt_shifts[:, None, :]


def particle_depth(params: CspParams):
    """Depth along the beam (z of the image frame) per (T, P) — defocus
    offset in pixels (DefocusOffsetFromCenter, geometry/core.py:686)."""
    R = tilt_rotation(params.tilt_angles, params.axis_angles)
    pos_xyz = params.particle_pos[:, ::-1]
    proj = jnp.einsum("tij,pj->tpi", R, pos_xyz)
    return proj[..., 2]


def effective_rotations(params: CspParams):
    """(T, P, 3, 3) pose of each particle's projection: R_t @ M_p."""
    R_t = tilt_rotation(params.tilt_angles, params.axis_angles)
    M_p = euler_to_matrix(
        params.particle_eulers[:, 0],
        params.particle_eulers[:, 1],
        params.particle_eulers[:, 2],
    )
    return jnp.einsum("tij,pjk->tpik", R_t, M_p)


@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "xv_precomputed"),
)
def csp_score(
    params: CspParams,
    windows_f,           # (T, P, n, nxf) centered spectra OR precomputed
                         # (T, P, G) gathered values (xv) when xv_precomputed
    window_centers,      # (T, P, 2) centered image coords where windows were cut
    tilt_defocus,        # (T, 2): (df1+df2)/2 mean defocus and astig ignored
    mask_pts,            # (G, 2)
    Fref,                # padded reference spectrum
    tilt_weights,        # (T,) exposure weights
    valid,               # (T, P) 1/0 particle visible in tilt
    n: int,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    xv_precomputed: bool = False,
    u=None,
    c=None,
):
    """Mean CTF-weighted NCC over all (tilt, particle) projections.

    Perf: the window-spectrum gather is parameter-independent; the
    optimizer precomputes it once (xv_precomputed=True) so the gradient
    loop only re-gathers the reference slice — and for shift/defocus
    modes the reference gather is ALSO precomputed (u), for depth-
    invariant modes the CTF likewise (c)."""
    if xv_precomputed:
        xv = windows_f  # already (T, P, G)
    else:
        xv = gather_2d_hermitian_batched(windows_f, jnp.asarray(mask_pts))
    ncc = _csp_ncc(params, xv, window_centers, tilt_defocus, mask_pts, Fref,
                   n, pixel_size, voltage_kv, cs_mm, amplitude_contrast,
                   u=u, c=c)
    w = tilt_weights[:, None] * valid
    return jnp.sum(ncc * w) / jnp.maximum(jnp.sum(w), 1.0)


def _csp_model_gather(params, mask_pts, Fref, n):
    """Reference central-slice values at the mask points for the current
    GEOMETRY ANGLES — the only gather in the scoring path. Shifts,
    positions, and defocus do not move these points (translations are
    phase ramps; defocus is an analytic CTF), so shift/defocus modes
    compute this ONCE and sweep candidates gather-free."""
    vol_pad = Fref.shape[0] // n
    R_eff = effective_rotations(params)  # (T, P, 3, 3)
    mask = jnp.asarray(mask_pts)
    q = (
        mask[None, None, :, 1, None] * R_eff[..., None, 0, :]
        + mask[None, None, :, 0, None] * R_eff[..., None, 1, :]
    )  # (T, P, G, 3) xyz
    return gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))


def _csp_ctf(params, tilt_defocus, mask_pts, n, pixel_size,
             voltage_kv, cs_mm, amplitude_contrast):
    """(T, P, G) CTF at the mask points for the current geometry (mean
    tilt defocus + per-tilt offset + particle-depth defocus gradient)."""
    depth = particle_depth(params)        # (T, P)
    mask = jnp.asarray(mask_pts)
    df = (tilt_defocus[:, None, 0] + params.defocus_offsets[:, None]
          + depth * pixel_size)  # (T, P) Å
    return _ctf_at_points(
        mask[None, None], n, pixel_size, df[..., None], df[..., None], 0.0,
        voltage_kv, cs_mm, amplitude_contrast, 0.0,
    )


def _csp_ncc(params, xv, window_centers, tilt_defocus, mask_pts, Fref,
             n, pixel_size, voltage_kv, cs_mm, amplitude_contrast,
             u=None, c=None):
    """Per-(tilt, particle) CTF-weighted NCC map (T, P); xv precomputed.
    `u` optionally carries precomputed reference slice values (shift/
    defocus modes — see _csp_model_gather); `c` precomputed CTF values
    (modes whose block moves neither depth nor defocus —
    CTF_CONST_MODES)."""
    pred_pos = project_positions(params)  # (T, P, 2)

    # residual shift between predicted position and window center
    dshift = pred_pos - window_centers    # (T, P, 2)

    mask = jnp.asarray(mask_pts)

    if u is None:
        u = _csp_model_gather(params, mask_pts, Fref, n)  # (T, P, G)
    if c is None:
        c = _csp_ctf(params, tilt_defocus, mask_pts, n, pixel_size,
                     voltage_kv, cs_mm, amplitude_contrast)  # (T, P, G)

    # model window = projection whose content sits at +dshift from the
    # window center: M = u * exp(-2*pi*i g.dshift/n); num = Re<X, M>
    ph = -2.0 * jnp.pi * (
        mask[None, None, :, 0] * dshift[..., 0:1]
        + mask[None, None, :, 1] * dshift[..., 1:2]
    ) / n
    phasor = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    num = jnp.sum(jnp.real(jnp.conj(xv) * phasor * c * u), axis=-1)
    den = jnp.sqrt(
        jnp.sum(jnp.abs(xv) ** 2, axis=-1)
        * jnp.sum(c * c * jnp.abs(u) ** 2, axis=-1)
        + 1e-12
    )
    return num / den  # (T, P)


def gather_2d_hermitian_batched(F, pts):
    """gather_2d_hermitian vmapped over two leading axes of F."""
    fn = jax.vmap(jax.vmap(lambda Fi: gather_2d_hermitian(Fi, pts)))
    return fn(F)


def _smoothness_penalty(x):
    """Second-difference penalty along the tilt axis (the reference's
    spline/Gaussian trajectory regularization, csp_transreg §A.3)."""
    d2 = x[2:] - 2 * x[1:-1] + x[:-2]
    return jnp.mean(d2 * d2)


def _apply_mode_offset(params: CspParams, mode: int, off) -> CspParams:
    """Add a candidate offset to the block a mode searches. `off` is (d,)
    (same offset for every tilt/particle — used while scoring candidates) or
    (E, d) (per-entity best offsets — used to apply the winners)."""
    if mode in (0,):
        return params._replace(
            tilt_angles=params.tilt_angles + off[..., 0],
            axis_angles=params.axis_angles + off[..., 1])
    if mode in (3, 5):
        return params._replace(tilt_shifts=params.tilt_shifts + off[..., 0:2])
    if mode in (4,):
        return params._replace(
            defocus_offsets=params.defocus_offsets + off[..., 0])
    if mode in (1, 7):
        return params._replace(
            particle_eulers=params.particle_eulers + off[..., 0:3])
    if mode in (2, 6):
        return params._replace(particle_pos=params.particle_pos + off[..., 0:3])
    raise ValueError(f"mode {mode} has no searchable block")


def make_mode_offsets(mode: int, tol, steps: int = 9,
                      random_iters: int = 0) -> np.ndarray:
    """Candidate offset grid for a mode (the csp_GS uniform build,
    pyp_config csp_GridSearch/csp_Tolerance*): (K, d) covering ±tol.

    tol may be a scalar or a per-dimension tuple (e.g. mode 0 takes
    (ToleranceMicrographTiltAngles, ToleranceMicrographTiltAxisAngles);
    mode 1/7 take (Psi, Theta, Phi)).

    random_iters: the reference's csp_NumberOfRandomIterations — that many
    additional random candidates drawn uniformly within the tolerance
    region (deterministic seed), the random-search alternative to the
    uniform grid (SURVEY §A.3)."""
    out = _make_mode_offsets_grid(mode, tol, steps)
    if random_iters and random_iters > 0:
        rng = np.random.RandomState(0)
        tols = np.atleast_1d(np.asarray(tol, dtype=np.float32))
        d = out.shape[1]
        tvec = np.array([tols[min(i, len(tols) - 1)] for i in range(d)],
                        dtype=np.float32)
        rand = rng.uniform(-1.0, 1.0, (int(random_iters), d)).astype(
            np.float32) * tvec
        if mode in (2, 3, 5, 6):
            # shift modes search a disk of radius tol
            nrm = np.linalg.norm(rand, axis=1, keepdims=True)
            lim = tvec[0]
            rand = np.where(nrm > lim, rand * (lim / (nrm + 1e-9)), rand)
        out = np.concatenate([out, rand], axis=0)
    return out


def _make_mode_offsets_grid(mode: int, tol, steps: int = 9) -> np.ndarray:
    tols = np.atleast_1d(np.asarray(tol, dtype=np.float32))

    def axis(i, n_steps=steps):
        t = tols[min(i, len(tols) - 1)]
        return np.linspace(-t, t, n_steps, dtype=np.float32)

    if mode in (4,):
        return axis(0)[:, None]
    if mode in (0,):
        # joint (tilt angle, axis angle) grid; fewer axis steps — the axis
        # angle is shared across the series and better-conditioned. Axis
        # tol 0 (the default) collapses to the tilt-angle-only search:
        # per-tilt axis freedom overfits unperturbed geometry (measured).
        if len(tols) > 1 and tols[1] > 0:
            ax2 = axis(1, max(3, steps // 2))
        else:
            ax2 = np.zeros(1, dtype=np.float32)
        g = np.stack(np.meshgrid(axis(0), ax2, indexing="ij"), -1)
        return g.reshape(-1, 2)
    if mode in (3, 5):
        t = tols[0]
        g = np.stack(np.meshgrid(axis(0), axis(0), indexing="ij"), -1).reshape(-1, 2)
        return g[(g**2).sum(1) <= t**2 + 1e-6]
    if mode in (1, 7):
        g = np.stack(np.meshgrid(axis(0), axis(1), axis(2), indexing="ij"), -1)
        return g.reshape(-1, 3)
    if mode in (2, 6):
        t = tols[0]
        g = np.stack(np.meshgrid(axis(0), axis(0), axis(0), indexing="ij"), -1).reshape(-1, 3)
        return g[(g**2).sum(1) <= t**2 + 1e-6]
    raise ValueError(f"mode {mode} has no searchable block")


def make_spin_offsets(step_deg: float) -> np.ndarray:
    """Full in-plane spin ring for orientation-prior initialization.

    Surface-constrained picks carry (theta, psi) from the membrane normal
    (detect_particles_from_surface role); phi — the first-applied Rz, the
    spin about the particle's own symmetry axis — is unconstrained. A
    360-degree candidate ring over the phi column alone (theta/psi zero)
    escapes the gradient basin regardless of the starting spin; follow with
    a mode-1 gradient polish."""
    phis = np.arange(-180.0, 180.0, float(step_deg), dtype=np.float32)
    off = np.zeros((len(phis), 3), dtype=np.float32)
    off[:, 0] = phis
    return off


def _grid_search_xv(
    params, xv, window_centers, tilt_defocus, mask_pts, Fref,
    tilt_weights, valid, offsets, mode, n, pixel_size,
    voltage_kv, cs_mm, amplitude_contrast,
):
    """Grid-search body on precomputed window samples xv (T, P, G)."""
    axis = MODE_AXIS[mode]
    w = tilt_weights[:, None] * valid  # (T, P)
    # shift/defocus candidates don't move the reference gather points:
    # gather once, sweep candidates with phase ramps / CTF re-evaluation
    u0 = (_csp_model_gather(params, mask_pts, Fref, n)
          if mode in SHIFT_MODES else None)
    # depth-invariant candidates share one CTF evaluation
    c0 = (_csp_ctf(params, tilt_defocus, mask_pts, n, pixel_size,
                   voltage_kv, cs_mm, amplitude_contrast)
          if mode in CTF_CONST_MODES else None)

    def score_candidate(off):
        p2 = _apply_mode_offset(params, mode, off)
        ncc = _csp_ncc(p2, xv, window_centers, tilt_defocus, mask_pts, Fref,
                       n, pixel_size, voltage_kv, cs_mm, amplitude_contrast,
                       u=u0, c=c0)
        if axis == "tilt":
            return jnp.sum(ncc * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-6)
        return jnp.sum(ncc * w, axis=0) / jnp.maximum(jnp.sum(w, axis=0), 1e-6)

    # lax.map bounds peak memory to one candidate's evaluation
    scores = jax.lax.map(score_candidate, jnp.asarray(offsets))  # (K, E)
    best = jnp.argmax(scores, axis=0)                            # (E,)
    off_best = jnp.asarray(offsets)[best]                        # (E, d)
    return _apply_mode_offset(params, mode, off_best), jnp.max(scores, axis=0)


def _refine_mode_xv(
    params, xv, window_centers, tilt_defocus, mask_pts, Fref,
    tilt_weights, valid, mode, n, pixel_size, iters, lr, reg_weight,
    voltage_kv, cs_mm, amplitude_contrast,
    step_tol: float = 0.0, value_tol: float = 0.0,
):
    """Gradient-ascent body on precomputed window samples xv (T, P, G).

    step_tol / value_tol: the reference optimizer's termination criteria
    (csp_OptimizerStepTolerance / csp_OptimizerValueTolerance, pyp_config
    :6289-6312) as update-freezing under jit: once the parameter step norm
    or the score improvement falls below its tolerance, later scan steps
    stop moving the parameters (same trip count — lax.scan is static — but
    the optimizer's answer matches an early-terminated run). 0 = off."""
    blocks = MODE_BLOCKS[mode]
    # per-block step scales (degrees / pixels)
    scales = CspParams(
        tilt_angles=jnp.asarray(0.2), axis_angles=jnp.asarray(0.2),
        tilt_shifts=jnp.asarray(0.5), particle_eulers=jnp.asarray(1.0),
        particle_pos=jnp.asarray(0.5), defocus_offsets=jnp.asarray(100.0),
    )

    # shift/defocus blocks leave the reference gather points fixed (the
    # frozen angle blocks are identical across iterations), so the whole
    # gradient loop reuses one reference gather
    u0 = (_csp_model_gather(params, mask_pts, Fref, n)
          if mode in SHIFT_MODES else None)
    # depth-invariant iterations share one CTF evaluation (see _csp_ctf)
    c0 = (_csp_ctf(params, tilt_defocus, mask_pts, n, pixel_size,
                   voltage_kv, cs_mm, amplitude_contrast)
          if mode in CTF_CONST_MODES else None)

    def loss_fn(p):
        score = csp_score(
            p, xv, window_centers, tilt_defocus, mask_pts, Fref,
            tilt_weights, valid, n, pixel_size, voltage_kv, cs_mm,
            amplitude_contrast, xv_precomputed=True, u=u0, c=c0,
        )
        reg = _smoothness_penalty(p.tilt_shifts) + _smoothness_penalty(
            p.tilt_angles[:, None]
        )
        return score - reg_weight * reg

    use_tols = (step_tol > 0.0) or (value_tol > 0.0)
    grad_fn = jax.value_and_grad(loss_fn) if use_tols else jax.grad(loss_fn)

    def step(carry, t):
        p, m, done, prev = carry
        if use_tols:
            loss, g = grad_fn(p)
        else:
            loss, g = prev, grad_fn(p)
        # zero gradients of frozen blocks
        g = CspParams(*(
            gi if name in blocks else jnp.zeros_like(gi)
            for name, gi in zip(CspParams._fields, g)
        ))
        gnorm = jnp.sqrt(sum(jnp.sum(gi * gi) for gi in g) + 1e-12)
        g = jax.tree.map(lambda gi: gi / gnorm, g)
        m = jax.tree.map(lambda mi, gi: 0.7 * mi + gi, m, g)
        decay = 0.5 * (1 + jnp.cos(jnp.pi * t / iters))
        gate = 1.0 - done
        upd = CspParams(*(
            gate * lr * decay * si * mi for si, mi in zip(scales, m)
        ))
        p = CspParams(*(pi + ui for pi, ui in zip(p, upd)))
        if use_tols:
            unorm = jnp.sqrt(sum(jnp.sum(ui * ui) for ui in upd) + 1e-18)
            stalled = jnp.where(
                t > 0,
                ((loss - prev < value_tol) if value_tol > 0.0 else False)
                | ((unorm < step_tol) if step_tol > 0.0 else False),
                False)
            done = jnp.maximum(done, stalled.astype(jnp.float32))
            prev = loss
        return (p, m, done, prev), None

    m0 = jax.tree.map(jnp.zeros_like, params)
    carry0 = (params, m0, jnp.asarray(0.0), jnp.asarray(-jnp.inf))
    (p_out, _, _, _), _ = jax.lax.scan(step, carry0, jnp.arange(iters))
    s0 = loss_fn(params)
    s1 = loss_fn(p_out)
    better = s1 >= s0
    p_final = jax.tree.map(
        lambda a, b: jnp.where(better, b, a), params, p_out
    )
    return p_final, jnp.where(better, s1, s0)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "n", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast"),
)
def csp_grid_search_mode(
    params: CspParams,
    windows_f, window_centers, tilt_defocus, mask_pts, Fref,
    tilt_weights, valid,
    offsets,             # (K, d) candidate offsets (make_mode_offsets)
    mode: int,
    n: int,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
):
    """Exhaustive discrete search of one mode's block — the csp_GS role
    (local_run.py:363-463, align/core.py:696-701). The score separates over
    the searched axis (per-tilt blocks are independent given the rest, and
    per-particle blocks likewise), so every candidate offset is scored for
    ALL tilts (or particles) in one batched NCC evaluation; the per-entity
    argmax picks each entity's winner. Escapes initialization errors larger
    than the gradient basin; follow with csp_refine_mode to polish."""
    xv = gather_2d_hermitian_batched(windows_f, jnp.asarray(mask_pts))
    return _grid_search_xv(
        params, xv, window_centers, tilt_defocus, mask_pts, Fref,
        tilt_weights, valid, offsets, mode, n, pixel_size,
        voltage_kv, cs_mm, amplitude_contrast)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "iters", "n", "pixel_size", "voltage_kv",
                     "cs_mm", "amplitude_contrast", "step_tol",
                     "value_tol"),
)
def csp_refine_mode(
    params: CspParams,
    windows_f, window_centers, tilt_defocus, mask_pts, Fref,
    tilt_weights, valid,
    mode: int,
    n: int,
    pixel_size: float,
    iters: int = 20,
    lr: float = 0.3,
    reg_weight: float = 0.1,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    step_tol: float = 0.0,
    value_tol: float = 0.0,
):
    """Refine one parameter block (a CSP mode) by masked gradient ascent."""
    xv = gather_2d_hermitian_batched(windows_f, jnp.asarray(mask_pts))
    return _refine_mode_xv(
        params, xv, window_centers, tilt_defocus, mask_pts, Fref,
        tilt_weights, valid, mode, n, pixel_size, iters, lr, reg_weight,
        voltage_kv, cs_mm, amplitude_contrast, step_tol=step_tol,
        value_tol=value_tol)


def _schedule_core(
    params, xv, window_centers, tilt_defocus, mask_pts, Fref,
    tilt_weights, valid, offsets_by_mode, spin_offsets, modes, n,
    pixel_size, iters_per_mode, lr, reg_weight, voltage_kv, cs_mm,
    amplitude_contrast, step_tol=0.0, value_tol=0.0,
):
    """One tilt-series' ENTIRE mode schedule as a single traced program:
    optional spin ring, then per mode an optional grid search (csp_GS)
    followed by the gradient polish. The Python loop over `modes` unrolls
    at trace time — the whole pass compiles to ONE XLA program, so a full
    CSP pass costs one dispatch instead of 2 x len(modes) (the round-3
    bottleneck: ~3.3 s of dispatch latency per mode through the tunnel)."""
    if spin_offsets is not None:
        params, _ = _grid_search_xv(
            params, xv, window_centers, tilt_defocus, mask_pts, Fref,
            tilt_weights, valid, spin_offsets, 1, n, pixel_size,
            voltage_kv, cs_mm, amplitude_contrast)
    scores = []
    for i, mode in enumerate(modes):
        off = offsets_by_mode[i] if offsets_by_mode is not None else None
        if off is not None:
            params, _ = _grid_search_xv(
                params, xv, window_centers, tilt_defocus, mask_pts, Fref,
                tilt_weights, valid, off, mode, n, pixel_size,
                voltage_kv, cs_mm, amplitude_contrast)
        params, s = _refine_mode_xv(
            params, xv, window_centers, tilt_defocus, mask_pts, Fref,
            tilt_weights, valid, mode, n, pixel_size, iters_per_mode, lr,
            reg_weight, voltage_kv, cs_mm, amplitude_contrast,
            step_tol=step_tol, value_tol=value_tol)
        scores.append(s)
    mode_scores = (jnp.stack(scores) if scores
                   else jnp.zeros((0,), jnp.float32))
    # final per-particle CTF-weighted NCC (the SCORE column)
    ncc = _csp_ncc(params, xv, window_centers, tilt_defocus, mask_pts, Fref,
                   n, pixel_size, voltage_kv, cs_mm, amplitude_contrast)
    w = tilt_weights[:, None] * valid
    pscores = (jnp.sum(ncc * w, axis=0)
               / jnp.maximum(jnp.sum(w, axis=0), 1e-6))
    return params, mode_scores, pscores


@functools.partial(
    jax.jit,
    static_argnames=("modes", "n", "pixel_size", "iters_per_mode",
                     "voltage_kv", "cs_mm", "amplitude_contrast",
                     "step_tol", "value_tol"),
)
def csp_refine_schedule(
    params: CspParams,
    xv, window_centers, tilt_defocus, mask_pts, Fref,
    tilt_weights, valid,
    offsets_by_mode,     # tuple aligned with modes: (K_i, d_i) array or None
    spin_offsets,        # (K, 3) array or None
    modes: tuple,
    n: int,
    pixel_size: float,
    iters_per_mode: int = 20,
    lr: float = 0.3,
    reg_weight: float = 0.1,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    step_tol: float = 0.0,
    value_tol: float = 0.0,
):
    """Fused single-series CSP pass (see _schedule_core)."""
    return _schedule_core(
        params, xv, window_centers, tilt_defocus, mask_pts, Fref,
        tilt_weights, valid, offsets_by_mode, spin_offsets, modes, n,
        pixel_size, iters_per_mode, lr, reg_weight, voltage_kv, cs_mm,
        amplitude_contrast, step_tol=step_tol, value_tol=value_tol)


@functools.partial(
    jax.jit,
    static_argnames=("modes", "n", "pixel_size", "iters_per_mode",
                     "voltage_kv", "cs_mm", "amplitude_contrast",
                     "step_tol", "value_tol", "series_vmap"),
)
def _csp_refine_batch_chunk(
    params_b: CspParams,  # every leaf carries a leading series axis S
    xv_b,                 # (S, T, P, G) precomputed window samples
    window_centers_b,     # (S, T, P, 2)
    tilt_defocus_b,       # (S, T, 2)
    mask_pts, Fref,       # shared across series
    tilt_weights_b,       # (S, T)
    valid_b,              # (S, T, P)
    offsets_by_mode,
    spin_offsets,
    modes: tuple,
    n: int,
    pixel_size: float,
    iters_per_mode: int = 20,
    lr: float = 0.3,
    reg_weight: float = 0.1,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    step_tol: float = 0.0,
    value_tol: float = 0.0,
    series_vmap: bool = False,
):
    """Batched CSP kernel: a chunk of tilt-series through the full fused
    mode schedule in ONE dispatch. Series are padded to common (T, P)
    with valid=0 rows; shorter series simply carry zero weight.

    series_vmap=False runs a sequential lax.map over the series axis —
    single-series activation memory (vmapping multiplies every gradient-
    step activation by the chunk size; S=4 x 41 x 128 at box 64 blew HBM
    on the round-4 v5e measurements). series_vmap=True vectorizes the
    chunk's series instead — S x the activation memory, but the chip
    pipelines S independent gather/NCC streams where the sequential map
    leaves it latency-bound between tiny kernels; use it when the chunk
    fits (small T*P*G or few series).

    Use `csp_refine_batch` (the host wrapper) rather than calling this
    directly: whole-batch single dispatches exceed the ~60 s RPC budget
    of shared-tunnel runtimes (measured: S=2 x 41 x 128 @ 20 iters = 30 s
    OK, S=4 = ~60 s kills the TPU worker), so the wrapper bounds series
    per dispatch."""
    def one(args):
        p, xv, c, d, tw, v = args
        return _schedule_core(
            p, xv, c, d, mask_pts, Fref, tw, v, offsets_by_mode,
            spin_offsets, modes, n, pixel_size, iters_per_mode, lr,
            reg_weight, voltage_kv, cs_mm, amplitude_contrast,
            step_tol=step_tol, value_tol=value_tol)

    leaves = (params_b, xv_b, window_centers_b,
              tilt_defocus_b, tilt_weights_b, valid_b)
    if series_vmap:
        return jax.vmap(one)(leaves)
    return jax.lax.map(one, leaves)


def csp_refine_batch(
    params_b: CspParams,
    xv_b, window_centers_b, tilt_defocus_b, mask_pts, Fref,
    tilt_weights_b, valid_b,
    offsets_by_mode, spin_offsets,
    modes: tuple,
    n: int,
    pixel_size: float,
    iters_per_mode: int = 20,
    lr: float = 0.3,
    reg_weight: float = 0.1,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    step_tol: float = 0.0,
    value_tol: float = 0.0,
    series_per_dispatch: int = 2,
    series_vmap: bool = False,
):
    """Batched CSP: S tilt-series refined in ceil(S/chunk) dispatches of
    one compiled program (the reference fans one cspswarm array task per
    series; here a chip runs whole chunks and series batches are
    data-parallel across chips).

    series_per_dispatch bounds single-dispatch wall time: long-running
    dispatches trip RPC deadlines on shared-tunnel runtimes (~60 s on the
    axon v5e path — see _csp_refine_batch_chunk). The final short chunk is
    padded to the chunk size (valid=0) so every chunk reuses ONE compiled
    program. series_vmap vectorizes the series within each chunk instead
    of mapping them sequentially (see _csp_refine_batch_chunk)."""
    S = int(valid_b.shape[0])
    c = max(1, min(int(series_per_dispatch), S))
    if S <= c:
        return _csp_refine_batch_chunk(
            params_b, xv_b, window_centers_b, tilt_defocus_b, mask_pts,
            Fref, tilt_weights_b, valid_b, offsets_by_mode, spin_offsets,
            modes, n, pixel_size, iters_per_mode, lr, reg_weight,
            voltage_kv, cs_mm, amplitude_contrast, step_tol, value_tol,
            series_vmap)

    def pad(x, lo, hi):
        sl = x[lo:hi]
        short = c - (hi - lo)
        if short:
            sl = jnp.concatenate([sl, jnp.repeat(sl[-1:], short, axis=0)])
        return sl

    outs = []
    for lo in range(0, S, c):
        hi = min(lo + c, S)
        p_c = CspParams(*(pad(leaf, lo, hi) for leaf in params_b))
        v_c = pad(valid_b, lo, hi)
        if hi - lo < c:  # padded rows carry zero weight
            v_c = v_c.at[hi - lo:].set(0.0)
        out = _csp_refine_batch_chunk(
            p_c, pad(xv_b, lo, hi), pad(window_centers_b, lo, hi),
            pad(tilt_defocus_b, lo, hi), mask_pts, Fref,
            pad(tilt_weights_b, lo, hi), v_c, offsets_by_mode,
            spin_offsets, modes, n, pixel_size, iters_per_mode, lr,
            reg_weight, voltage_kv, cs_mm, amplitude_contrast, step_tol,
            value_tol, series_vmap)
        keep = hi - lo
        outs.append(jax.tree.map(lambda a: a[:keep], out))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def prepare_series_windows(tilt_images, params: CspParams, n: int, mask_pts):
    """Window every particle from every tilt at its predicted position and
    sample the window spectra at the mask points — vectorized over tilts
    (one dispatch, not T).

    Returns (xv (T, P, G) complex, window_centers (T, P, 2) float32 centered
    coords, valid (T, P) float32)."""
    from pyp_tpu.ops.extract import window_particles

    tilt_images = jnp.asarray(tilt_images)
    T, ny, nx = tilt_images.shape
    pred = np.asarray(project_positions(params))  # (T, P, 2) centered
    center = np.array([ny // 2, nx // 2])
    ci = np.round(pred + center).astype(np.int32)
    inb = (
        (ci[..., 0] >= n // 2) & (ci[..., 0] < ny - n // 2)
        & (ci[..., 1] >= n // 2) & (ci[..., 1] < nx - n // 2)
    )
    ci = np.clip(ci, n // 2, [ny - n // 2 - 1, nx - n // 2 - 1])

    @functools.partial(jax.jit, static_argnames=("box",))
    def cut_and_sample(imgs, coords, pts, box):
        wins = jax.vmap(lambda im, c: window_particles(im, c, box))(
            imgs, coords)
        wf = image_to_fourier(wins)
        return gather_2d_hermitian_batched(wf, pts)

    xv = cut_and_sample(tilt_images, jnp.asarray(ci), jnp.asarray(mask_pts),
                        n)
    w_centers = (ci - center).astype(np.float32)
    return xv, w_centers, inb.astype(np.float32)


def csp_refine(
    params: CspParams,
    tilt_images,         # (T, ny, nx) aligned tilt series
    tilt_defocus,        # (T, 2)
    ref_volume,          # (n, n, n) current reference
    pixel_size: float,
    boxsize: int,
    modes=(0, 3, 1, 2),
    iters_per_mode: int = 20,
    lr: float = 0.3,
    low_res: float = 60.0,
    high_res: float = 12.0,
    reg_weight: float = 0.1,
    tilt_weights=None,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    grid_tols: dict | None = None,
    grid_steps: int = 9,
    spin_step: float = 0.0,
    return_particle_scores: bool = False,
    angle_step: float = 0.0,
    shift_step: float = 0.0,
    random_iters: int = 0,
    step_tol: float = 0.0,
    value_tol: float = 0.0,
):
    """Full CSP pass on one tilt-series: extract windows at predicted
    positions, then refine each mode block in sequence (the reference runs
    the same mode schedule, align/core.py:978-1005).

    grid_tols: optional {mode: tolerance} — modes listed run a coarse
    discrete search (csp_grid_search_mode, the csp_GS role) before the
    gradient polish, recovering from initialization errors outside the
    gradient basin (reference csp_GridSearch + csp_Tolerance*, §A.3).

    spin_step: if > 0, an exhaustive in-plane spin ring (make_spin_offsets)
    runs once before the mode schedule — pairs with surface-normal
    orientation priors whose phi is a free parameter."""
    from pyp_tpu.ops.fourier_slice import volume_to_fourier

    tilt_images = jnp.asarray(tilt_images)
    T = tilt_images.shape[0]
    n = boxsize
    Fref = volume_to_fourier(jnp.asarray(ref_volume))
    mask_pts = jnp.asarray(make_mask_points(n, pixel_size, low_res, high_res))
    if tilt_weights is None:
        tilt_weights = jnp.ones(T)

    xv, w_centers, valid = prepare_series_windows(
        tilt_images, params, n, mask_pts)

    offsets_by_mode, spin_offsets = build_mode_offsets(
        modes, grid_tols, grid_steps, spin_step, angle_step=angle_step,
        shift_step=shift_step, random_iters=random_iters)

    params, mode_scores, pscores = csp_refine_schedule(
        params, xv, jnp.asarray(w_centers), jnp.asarray(tilt_defocus),
        mask_pts, Fref, jnp.asarray(tilt_weights), jnp.asarray(valid),
        offsets_by_mode, spin_offsets, tuple(modes), n, pixel_size,
        iters_per_mode=iters_per_mode, lr=lr, reg_weight=reg_weight,
        voltage_kv=voltage_kv, cs_mm=cs_mm,
        amplitude_contrast=amplitude_contrast,
        step_tol=step_tol, value_tol=value_tol,
    )
    scores = [float(s) for s in np.asarray(mode_scores)]
    if not return_particle_scores:
        return params, scores
    # the final per-particle CTF-weighted NCC (the SCORE column of the
    # reference's parameter files — feeds cleaning, ArtiaX colormaps, and
    # class selection) is computed inside the fused schedule
    return params, scores, np.asarray(pscores)


def build_mode_offsets(modes, grid_tols, grid_steps: int = 9,
                       spin_step: float = 0.0, angle_step: float = 0.0,
                       shift_step: float = 0.0, random_iters: int = 0):
    """Assemble the static candidate-offset pytrees for a mode schedule:
    (offsets_by_mode tuple aligned with modes, spin_offsets or None).

    angle_step / shift_step (degrees / pixels): explicit grid spacings
    (the reference's csp AngleStep/ShiftStep block fields) — when set they
    derive each mode's step count as ceil(2*tol/step)+1 instead of the
    uniform grid_steps. random_iters adds csp_NumberOfRandomIterations
    random candidates within the tolerance region."""

    def steps_for(m):
        sp = angle_step if m in (0, 1, 7, 4) else shift_step
        if m == 4:
            sp = 0.0  # defocus keeps the uniform count
        if sp and sp > 0 and grid_tols and m in grid_tols:
            t = float(np.max(np.atleast_1d(grid_tols[m])))
            return int(np.clip(round(2.0 * t / sp) + 1, 3, 21))
        return grid_steps

    offsets_by_mode = tuple(
        jnp.asarray(make_mode_offsets(m, grid_tols[m], steps_for(m),
                                      random_iters=random_iters))
        if grid_tols and m in grid_tols and np.max(grid_tols[m]) > 0
        else None
        for m in modes
    )
    spin_offsets = (jnp.asarray(make_spin_offsets(spin_step))
                    if spin_step and spin_step > 0 else None)
    return offsets_by_mode, spin_offsets


def csp_particles_for_reconstruction(params: CspParams, windows_f_shape=None):
    """Convert refined CSP params to per-(tilt, particle) reconstruction
    poses: returns (R_eff (T, P, 3, 3), shifts (T, P, 2) residual image
    shifts, defocus offsets (T, P) in pixels)."""
    R = effective_rotations(params)
    pos = project_positions(params)
    depth = particle_depth(params)
    return R, pos, depth
