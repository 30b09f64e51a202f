"""Legacy subvolume averaging (StA) — the reference's sva* entry points
(bin/run/sva, bin/run/pyp `svaswarm`/`svamerge`/`svarun` env modes wrapping
the TOMO 3DAVG binaries). The production subtomogram path is CSPT
(pipeline/csp.py: constrained refinement against raw tilt projections);
this mode covers the classic workflow — align extracted SUBVOLUMES to a
reference and average — which remains useful for quick looks and for data
whose tilt series are gone.

TPU-first design: the reference volume is rotated ONCE per candidate angle
(a bank shared by every subvolume, like the FRM direction bank), the
translational search is an FFT cross-correlation evaluated for all
subvolume x angle pairs in batched irfftns (no per-pose gathers), and the
average back-rotates each subvolume with a single trilinear resample while
accumulating rotated missing-wedge masks for per-voxel compensation
(the 3DAVG wedge-normalized average).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.ops.template_match import rotate_volume


class SvaResult(NamedTuple):
    angles: jax.Array   # (B, 3) ZYZ degrees (reference -> subvolume)
    shifts: jax.Array   # (B, 3) voxels (z, y, x)
    scores: jax.Array   # (B,) normalized correlation
    average: jax.Array  # (n, n, n) wedge-compensated aligned average


def wedge_mask(n: int, half_angle_deg: float):
    """Binary missing-wedge mask on the fftshifted full Fourier grid:
    |kz| <= tan(half_angle) * |kx| passes (tilt axis = y, beam = z).
    half_angle_deg is the maximum tilt (e.g. 60 -> +/-60 deg wedge)."""
    if half_angle_deg >= 90.0:
        return np.ones((n, n, n), dtype=np.float32)
    ax = np.fft.fftshift(np.fft.fftfreq(n))
    kz = ax[:, None, None]
    kx = ax[None, None, :]
    t = np.tan(np.deg2rad(half_angle_deg))
    m = (np.abs(kz) <= t * np.abs(kx) + 1e-9).astype(np.float32)
    return np.broadcast_to(m, (n, n, n)).copy()  # (z, y, x) full grid


def _sphere(n: int, frac: float = 0.45, radius_px: float = 0.0,
            sigma_px: float = 0.0):
    """Spherical alignment mask (reference sva mask/mask_sigma): hard
    radius (default 0.45n) with an optional soft cosine edge."""
    ax = np.arange(n) - n // 2
    r = np.sqrt(ax[:, None, None] ** 2 + ax[None, :, None] ** 2
                + ax[None, None, :] ** 2)
    rad = radius_px if radius_px > 0 else frac * n
    if sigma_px <= 0:
        return (r <= rad).astype(np.float32)
    t = np.clip((r - rad) / sigma_px, 0.0, 1.0)
    return (0.5 * (1 + np.cos(np.pi * t))).astype(np.float32)


def _band_filter(n: int, lowpass=(0.25, 0.05), highpass=(0.0, 0.0)):
    """Radial band weight on the rfftn grid. Cutoffs/decays follow the
    reference's sva convention: 0 = DC, 1 = Nyquist (error-function-free
    cosine rolloffs)."""
    fz = np.fft.fftfreq(n)[:, None, None]
    fy = np.fft.fftfreq(n)[None, :, None]
    fx = np.fft.rfftfreq(n)[None, None, :]
    f = np.sqrt(fz * fz + fy * fy + fx * fx) / 0.5  # 0..1 at Nyquist
    w = np.ones_like(f, dtype=np.float32)
    lc, ld = (float(lowpass[0]), float(max(lowpass[1], 1e-4)))
    if 0 < lc < 1:
        t = np.clip((f - lc) / ld, 0.0, 1.0)
        w *= 0.5 * (1 + np.cos(np.pi * t))
    hc, hd = (float(highpass[0]), float(max(highpass[1], 1e-4)))
    if hc > 0:
        t = np.clip((hc - f) / hd, 0.0, 1.0)
        w *= 0.5 * (1 + np.cos(np.pi * t))
    return w.astype(np.float32)


def _local_grid(tol_angle: float, step: float):
    """Rotations within `tol_angle` degrees of the identity: directions on
    the cap theta <= tol plus in-plane psi in [-tol, tol], ZYZ degrees."""
    out = [(0.0, 0.0, 0.0)]
    psis = np.arange(-tol_angle, tol_angle + 1e-6, max(step, 1.0))
    thetas = np.arange(step, tol_angle + 1e-6, max(step, 1.0))
    for p in psis:
        if abs(p) > 1e-6:
            out.append((0.0, 0.0, float(p)))
    for t in thetas:
        n_phi = max(1, int(round(360.0 * np.sin(np.deg2rad(t)) / step)))
        for phi in np.arange(0.0, 360.0, 360.0 / n_phi):
            for p in psis:
                # phi rotates the tilt axis; -phi brings it back so the
                # net rotation stays within the cap
                out.append((float(phi), float(t), float(p - phi)))
    return np.asarray(out, dtype=np.float32)


@functools.partial(jax.jit, static_argnames=("extent",))
def _score_block(SubF, bank, sub_norm, extent: int):
    """cc of every (subvolume, bank angle) pair over the shift window.

    SubF: (B, n, n, nf) rfftn of subvolumes; bank: (A, n, n, n) rotated
    zero-mean unit-norm references. Returns (best_cc (B,), a_idx (B,),
    shift (B, 3)) for THIS bank block."""
    B = SubF.shape[0]
    n = bank.shape[-1]
    BankF = jnp.fft.rfftn(bank, axes=(-3, -2, -1))

    # shift window mask (wraparound indexing: keep |shift| <= extent)
    ax = jnp.arange(n)
    d = jnp.minimum(ax, n - ax)
    win = ((d[:, None, None] <= extent) & (d[None, :, None] <= extent)
           & (d[None, None, :] <= extent))

    def per_angle(a):
        cc = jnp.fft.irfftn(SubF * jnp.conj(BankF[a])[None],
                            s=(n, n, n), axes=(-3, -2, -1))
        cc = jnp.where(win[None], cc, -jnp.inf)
        flat = cc.reshape(B, -1)
        idx = jnp.argmax(flat, axis=-1)
        val = jnp.take_along_axis(flat, idx[:, None], axis=-1)[:, 0]
        return val, idx

    vals, idxs = jax.lax.map(per_angle, jnp.arange(bank.shape[0]))
    a_best = jnp.argmax(vals, axis=0)                      # (B,)
    cc_best = jnp.take_along_axis(vals, a_best[None], axis=0)[0]
    flat_best = jnp.take_along_axis(idxs, a_best[None], axis=0)[0]
    z = flat_best // (n * n)
    y = (flat_best // n) % n
    x = flat_best % n
    signed = lambda v: jnp.where(v > n // 2, v - n, v)  # noqa: E731
    shift = jnp.stack([signed(z), signed(y), signed(x)], -1).astype(jnp.float32)
    return cc_best / jnp.maximum(sub_norm, 1e-6), a_best, shift


def align_subvolumes(subvols, reference, angular_step: float = 30.0,
                     symmetry: str = "C1", shift_extent: int = 8,
                     wedge_deg: float = 90.0, angle_block: int = 16,
                     lowpass=(0.25, 0.05), highpass=(0.0, 0.0),
                     mask_rad: float = 0.0, mask_sigma: float = 0.0,
                     grid=None):
    """One alignment pass: best (ZYZ angle, integer shift) per subvolume.

    The angle grid comes from refine3d.make_directions x in-plane psi at the
    same step (symmetry-reduced), unless an explicit (A, 3) `grid` is
    given (local refinement). Scoring is band-limited by the radial
    lowpass/highpass (cutoff, decay) pairs in 0..1-of-Nyquist units (the
    reference's sva lowpass/highpass), and the reference is soft-masked
    (sva mask/mask_sigma). Returns (angles (B,3), shifts (B,3),
    scores (B,))."""
    from pyp_tpu.ops.refine3d import make_directions

    subvols = jnp.asarray(subvols, dtype=jnp.float32)
    B, n = subvols.shape[0], subvols.shape[-1]
    if grid is None:
        dirs = np.asarray(make_directions(angular_step, symmetry))
        psis = np.arange(0.0, 360.0, angular_step, dtype=np.float32)
        grid = np.array([(d[0], d[1], p) for d in dirs for p in psis],
                        dtype=np.float32)                  # (A, 3)

    sph = jnp.asarray(_sphere(n, radius_px=mask_rad, sigma_px=mask_sigma))
    band = jnp.asarray(_band_filter(n, lowpass, highpass))
    ref = jnp.asarray(reference, dtype=jnp.float32)
    ref = (ref - jnp.mean(ref)) * sph
    # the band filter is isotropic, so it commutes with the bank rotations
    # — filter the reference once instead of every rotated copy
    ref = jnp.fft.irfftn(jnp.fft.rfftn(ref) * band, s=(n, n, n))
    wm = wedge_mask(n, wedge_deg)

    sub = subvols - jnp.mean(subvols, axis=(-3, -2, -1), keepdims=True)
    SubF = jnp.fft.rfftn(sub, axes=(-3, -2, -1)) * band[None]
    subf = jnp.fft.irfftn(SubF, s=(n, n, n), axes=(-3, -2, -1))
    sub_norm = jnp.sqrt(jnp.sum(subf * subf, axis=(-3, -2, -1)))

    best_cc = jnp.full((B,), -jnp.inf)
    best_a = jnp.zeros((B,), jnp.int32)
    best_s = jnp.zeros((B, 3), jnp.float32)
    for lo in range(0, len(grid), angle_block):
        blk = grid[lo:lo + angle_block]
        bank = []
        for phi, theta, psi in blk:
            r = rotate_volume(ref, float(phi), float(theta), float(psi))
            if wedge_deg < 90.0:
                # compare inside the subvolume's wedge support only
                R = np.fft.ifftshift(wm)
                r = jnp.fft.irfftn(
                    jnp.fft.rfftn(r) * jnp.asarray(
                        R[..., : n // 2 + 1]), s=(n, n, n))
            r = r - jnp.mean(r)
            bank.append(r / jnp.maximum(
                jnp.sqrt(jnp.sum(r * r)), 1e-6))
        cc, a_idx, shift = _score_block(SubF, jnp.stack(bank), sub_norm,
                                        int(shift_extent))
        better = cc > best_cc
        best_cc = jnp.where(better, cc, best_cc)
        best_a = jnp.where(better, a_idx + lo, best_a)
        best_s = jnp.where(better[:, None], shift, best_s)
    return jnp.asarray(grid)[best_a], best_s, best_cc


def refine_subvolumes(subvols, reference, prev_angles, prev_shifts,
                      tol_angle: float, step: float, **kw):
    """Local refinement around known poses (reference sva tol_angle /
    tol_shifts): each subvolume is pre-shifted and back-rotated by its
    current pose, a SMALL rotation grid within `tol_angle` of identity is
    searched (one shared bank again), and the result composes with the
    prior pose. Returns (angles, shifts, scores) in the original frame."""
    from pyp_tpu.core.geometry import euler_to_matrix, matrix_to_euler

    subvols = np.asarray(subvols, dtype=np.float32)
    prev_angles = np.asarray(prev_angles, dtype=np.float64)
    prev_shifts = np.asarray(prev_shifts, dtype=np.float64)
    B = len(subvols)
    pre = []
    for b in range(B):
        phi, theta, psi = (float(v) for v in prev_angles[b])
        v = jnp.roll(jnp.asarray(subvols[b]),
                     tuple(-int(round(s)) for s in prev_shifts[b]),
                     (0, 1, 2))
        pre.append(np.asarray(rotate_volume(v, -psi, -theta, -phi)))
    grid = _local_grid(tol_angle, step)
    d_ang, d_shift, scores = align_subvolumes(
        np.stack(pre), reference, grid=grid, **kw)
    d_ang = np.asarray(d_ang, dtype=np.float64)
    d_shift = np.asarray(d_shift, dtype=np.float64)
    out_ang = np.zeros((B, 3), np.float32)
    out_shift = np.zeros((B, 3), np.float32)
    for b in range(B):
        Rp = np.asarray(euler_to_matrix(*prev_angles[b]), dtype=np.float64)
        Rd = np.asarray(euler_to_matrix(*d_ang[b]), dtype=np.float64)
        out_ang[b] = np.asarray(matrix_to_euler(Rp @ Rd), dtype=np.float64)
        # shift composes through the prior rotation (shifts are (z,y,x);
        # R acts on xyz column vectors)
        s_xyz = d_shift[b][::-1]
        out_shift[b] = prev_shifts[b] + (Rp @ s_xyz)[::-1]
    return (jnp.asarray(out_ang), jnp.asarray(out_shift),
            jnp.asarray(scores))


def center_subvolumes(subvols, iters: int = 2, shift_extent: int = 8,
                      wedge_deg: float = 90.0, **kw):
    """Translation-only pre-centering against the running average (the
    reference's sva centering mode 0): identity-angle bank, a few rounds.
    Returns (shifts (B, 3), centered average)."""
    subvols = np.asarray(subvols, dtype=np.float32)
    B = len(subvols)
    shifts = np.zeros((B, 3), np.float32)
    ref = subvols.mean(axis=0)
    ident = np.zeros((1, 3), np.float32)
    for _ in range(max(1, int(iters))):
        _, s, _ = align_subvolumes(subvols, ref, grid=ident,
                                   shift_extent=shift_extent,
                                   wedge_deg=wedge_deg, **kw)
        shifts = np.asarray(s, dtype=np.float32)
        ref = np.asarray(average_subvolumes(
            subvols, np.zeros((B, 3)), shifts, wedge_deg=wedge_deg))
    return shifts, ref


def classify_subvolumes(subvols, angles, shifts, n_classes: int,
                        wedge_deg: float = 90.0, lowpass_frac: float = 0.3,
                        seed: int = 0, iters: int = 12):
    """Aligned-frame k-means classification (the reference's sva
    classification / MPI_Classification role): back-transform every
    subvolume into the reference frame, lowpass, k-means on the flattened
    volumes (k-means++ seeding), and return (labels, per-class
    wedge-compensated averages)."""
    from pyp_tpu.core.geometry import euler_to_matrix  # noqa: F401

    subvols = np.asarray(subvols, dtype=np.float32)
    angles = np.asarray(angles)
    shifts = np.asarray(shifts)
    B, n = subvols.shape[0], subvols.shape[-1]
    band = _band_filter(n, (lowpass_frac, 0.05))
    feats = []
    backs = []
    for b in range(B):
        phi, theta, psi = (float(v) for v in angles[b])
        v = jnp.roll(jnp.asarray(subvols[b]),
                     tuple(-int(round(s)) for s in shifts[b]), (0, 1, 2))
        vr = rotate_volume(v, -psi, -theta, -phi)
        backs.append(np.asarray(vr))
        f = np.asarray(jnp.fft.irfftn(jnp.fft.rfftn(vr) * band,
                                      s=(n, n, n)), dtype=np.float32)
        f = (f - f.mean()) / (f.std() + 1e-6)
        feats.append(f.ravel())
    X = np.stack(feats)
    rng = np.random.RandomState(seed)
    K = max(1, int(n_classes))
    # k-means++ seeding
    centers = [X[rng.randint(B)]]
    for _ in range(1, K):
        d2 = np.min([np.sum((X - c) ** 2, axis=1) for c in centers], axis=0)
        p = d2 / max(d2.sum(), 1e-9)
        centers.append(X[rng.choice(B, p=p)])
    C = np.stack(centers)
    labels = np.zeros(B, np.int32)
    for _ in range(int(iters)):
        d = ((X[:, None] - C[None]) ** 2).sum(-1)
        labels = np.argmin(d, axis=1).astype(np.int32)
        for k in range(K):
            if np.any(labels == k):
                C[k] = X[labels == k].mean(axis=0)
    class_avgs = []
    for k in range(K):
        sel = labels == k
        if not np.any(sel):
            class_avgs.append(np.zeros((n, n, n), np.float32))
            continue
        class_avgs.append(np.asarray(average_subvolumes(
            subvols[sel], angles[sel], shifts[sel], wedge_deg=wedge_deg)))
    return labels, class_avgs


def average_subvolumes(subvols, angles, shifts, wedge_deg: float = 90.0,
                       score_weights=None):
    """Wedge-compensated aligned average: each subvolume is shifted, rotated
    INTO the reference frame (inverse ZYZ), and accumulated in FOURIER
    space together with its rotated wedge mask; the average divides each
    Fourier coefficient by the per-frequency wedge coverage (the 3DAVG
    normalization — compensation lives in Fourier space, where the wedge
    is defined, not in real space)."""
    subvols = np.asarray(subvols, dtype=np.float32)
    angles = np.asarray(angles)
    shifts = np.asarray(shifts)
    B, n = subvols.shape[0], subvols.shape[-1]
    wm = wedge_mask(n, wedge_deg)  # fftshifted layout, center n//2
    num = jnp.zeros((n, n, n), jnp.complex64)
    den = jnp.zeros((n, n, n), jnp.float32)
    w = (np.ones(B, np.float32) if score_weights is None
         else np.asarray(score_weights, np.float32))
    for b in range(B):
        phi, theta, psi = (float(v) for v in angles[b])
        v = jnp.roll(jnp.asarray(subvols[b]),
                     tuple(-int(round(s)) for s in shifts[b]), (0, 1, 2))
        # inverse of R(phi, theta, psi) in ZYZ is R(-psi, -theta, -phi);
        # rotation commutes with the FT, so the rotated volume's wedge
        # support is the rotated mask (both rotate about center n//2)
        vr = rotate_volume(v, -psi, -theta, -phi)
        mr = jnp.fft.ifftshift(
            rotate_volume(jnp.asarray(wm), -psi, -theta, -phi))
        num = num + w[b] * jnp.fft.fftn(vr) * mr
        den = den + w[b] * mr
    avg = jnp.fft.ifftn(num / jnp.maximum(den, 0.05 * jnp.max(den)))
    return jnp.real(avg)


def sva_iterate(subvols, reference=None, iters: int = 3,
                angular_step: float = 30.0, symmetry: str = "C1",
                shift_extent: int = 8, wedge_deg: float = 90.0,
                refine_factor: float = 0.5,
                lowpass=(0.25, 0.05), highpass=(0.0, 0.0),
                mask_rad: float = 0.0, mask_sigma: float = 0.0,
                centering_iters: int = 0, keep_fraction: float = 1.0,
                local_refine: bool = True) -> SvaResult:
    """Full legacy loop: (optional translation pre-centering) -> global
    align -> wedge-average -> LOCAL refinement rounds at halving angular
    steps (each round searches only within the previous round's step of
    the current pose, so late rounds are cheap and fine). keep_fraction
    drops the worst-scoring tail from each average (reference
    pre_selection_fraction); reference=None seeds from the raw unaligned
    average (reference-free start)."""
    subvols = np.asarray(subvols, dtype=np.float32)
    band_kw = dict(lowpass=lowpass, highpass=highpass,
                   mask_rad=mask_rad, mask_sigma=mask_sigma)
    if centering_iters > 0 and reference is None:
        _, ref = center_subvolumes(subvols, iters=centering_iters,
                                   shift_extent=shift_extent,
                                   wedge_deg=wedge_deg, **band_kw)
    else:
        ref = (np.mean(subvols, axis=0) if reference is None
               else np.asarray(reference, dtype=np.float32))

    def weights(sc):
        w = np.clip(np.asarray(sc), 0.0, None)
        if keep_fraction < 1.0:
            cut = np.percentile(np.asarray(sc),
                                100.0 * (1.0 - keep_fraction))
            w = np.where(np.asarray(sc) >= cut, w, 0.0)
        return w

    step = float(angular_step)
    angles = shifts = scores = None
    for it in range(max(1, int(iters))):
        if it == 0 or not local_refine:
            angles, shifts, scores = align_subvolumes(
                subvols, ref, angular_step=step, symmetry=symmetry,
                shift_extent=shift_extent, wedge_deg=wedge_deg, **band_kw)
            prev_step = step
        else:
            step = max(step * refine_factor, 7.5)
            angles, shifts, scores = refine_subvolumes(
                subvols, ref, np.asarray(angles), np.asarray(shifts),
                tol_angle=prev_step, step=step,
                shift_extent=max(2, shift_extent // 2),
                wedge_deg=wedge_deg, **band_kw)
            prev_step = step
        ref = np.asarray(average_subvolumes(
            subvols, np.asarray(angles), np.asarray(shifts),
            wedge_deg=wedge_deg, score_weights=weights(scores)))
        if not local_refine:
            step = max(step * refine_factor, 7.5)
    return SvaResult(angles=jnp.asarray(angles), shifts=jnp.asarray(shifts),
                     scores=jnp.asarray(scores), average=jnp.asarray(ref))
