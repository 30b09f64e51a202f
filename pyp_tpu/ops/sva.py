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


def _sphere(n: int, frac: float = 0.45):
    ax = np.arange(n) - n // 2
    r = np.sqrt(ax[:, None, None] ** 2 + ax[None, :, None] ** 2
                + ax[None, None, :] ** 2)
    return (r <= frac * n).astype(np.float32)


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
                     wedge_deg: float = 90.0, angle_block: int = 16):
    """One alignment pass: best (ZYZ angle, integer shift) per subvolume.

    The angle grid comes from refine3d.make_directions x in-plane psi at the
    same step (symmetry-reduced). Returns (angles (B,3), shifts (B,3),
    scores (B,))."""
    from pyp_tpu.ops.refine3d import make_directions

    subvols = jnp.asarray(subvols, dtype=jnp.float32)
    B, n = subvols.shape[0], subvols.shape[-1]
    dirs = np.asarray(make_directions(angular_step, symmetry))
    psis = np.arange(0.0, 360.0, angular_step, dtype=np.float32)
    grid = np.array([(d[0], d[1], p) for d in dirs for p in psis],
                    dtype=np.float32)                      # (A, 3)

    sph = jnp.asarray(_sphere(n))
    ref = jnp.asarray(reference, dtype=jnp.float32)
    ref = (ref - jnp.mean(ref)) * sph
    wm = wedge_mask(n, wedge_deg)

    sub = subvols - jnp.mean(subvols, axis=(-3, -2, -1), keepdims=True)
    SubF = jnp.fft.rfftn(sub, axes=(-3, -2, -1))
    sub_norm = jnp.sqrt(jnp.sum(sub * sub, axis=(-3, -2, -1)))

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
                refine_factor: float = 0.5) -> SvaResult:
    """Full legacy loop: (seed) -> align -> wedge-average -> re-align with a
    finer angular step (x refine_factor per iteration). reference=None
    seeds from the raw unaligned average (reference-free start)."""
    subvols = np.asarray(subvols, dtype=np.float32)
    ref = (np.mean(subvols, axis=0) if reference is None
           else np.asarray(reference, dtype=np.float32))
    step = float(angular_step)
    angles = shifts = scores = None
    for _ in range(max(1, int(iters))):
        angles, shifts, scores = align_subvolumes(
            subvols, ref, angular_step=step, symmetry=symmetry,
            shift_extent=shift_extent, wedge_deg=wedge_deg)
        ref = np.asarray(average_subvolumes(
            subvols, np.asarray(angles), np.asarray(shifts),
            wedge_deg=wedge_deg,
            score_weights=np.clip(np.asarray(scores), 0.0, None)))
        step = max(step * refine_factor, 7.5)
    return SvaResult(angles=jnp.asarray(angles), shifts=jnp.asarray(shifts),
                     scores=jnp.asarray(scores), average=jnp.asarray(ref))
