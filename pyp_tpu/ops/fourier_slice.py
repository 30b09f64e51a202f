"""Central-slice Fourier operators: projection (slice gather) and insertion
(slice scatter) with Hermitian-symmetric rfft layouts.

These are the primitive operators under both the refine3d-equivalent
(projection matching) and the reconstruct3d/merge3d-equivalent (gridding
insertion) kernels — the roles played by the reference's wrapped cisTEM2
binaries (SURVEY §2.2; stdin contracts at /root/reference/src/pyp/refine/
frealign/frealign.py:3916, :1780).

Conventions:
  * volumes/images are "centered": the phase origin sits at the center sample
    (index n//2), achieved by multiplying raw FFT output with the frequency
    checkerboard (-1)^(sum of indices) (= ifftshift of the object);
  * interpolation accuracy: spectra sampled at the native grid oscillate too
    fast for trilinear interpolation, so volumes (and, in the search path,
    particle images) are zero-padded by `pad` (default 2) before the FFT —
    the same oversampling trick cisTEM's iblow/RELION's pad factor use. All
    gather/scatter coordinates here are given in *unpadded* image wavenumber
    units and scaled by `pad` internally;
  * poses are ZYZ Euler angles (phi, theta, psi): R = Rz(psi)Ry(theta)Rz(phi)
    maps volume coords to image coords; F_image(g) = F_vol(R^T [gx, gy, 0]);
  * shifts (sy, sx) in pixels translate image content toward +y/+x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PAD = 2


def _freq_checkerboard_2d(n: int):
    # built from device iota, NOT host numpy: inside jit a host array this
    # size becomes a serialized HLO literal (O(n^2-n^3) bytes per call
    # site), which at production boxes overflows remote-compile transports
    # and bloats the executable; iota folds to cheap elementwise work
    i = (jnp.arange(n)[:, None] + jnp.arange(n // 2 + 1)[None, :]) % 2
    return 1.0 - 2.0 * i.astype(jnp.float32)


def _freq_checkerboard_3d(n: int):
    s = (jnp.arange(n).reshape(n, 1, 1) + jnp.arange(n).reshape(1, n, 1)
         + jnp.arange(n // 2 + 1).reshape(1, 1, -1)) % 2
    return 1.0 - 2.0 * s.astype(jnp.float32)


def pad_image(imgs, pad: int):
    """Zero-pad (..., n, n) images to (..., pad*n, pad*n) keeping the object
    centered (center n//2 -> center pad*n//2)."""
    if pad == 1:
        return imgs
    n = imgs.shape[-1]
    off = (pad * n) // 2 - n // 2
    widths = [(0, 0)] * (imgs.ndim - 2) + [(off, pad * n - n - off)] * 2
    return jnp.pad(imgs, widths)


def pad_volume(vol, pad: int):
    if pad == 1:
        return vol
    n = vol.shape[-1]
    off = (pad * n) // 2 - n // 2
    widths = [(0, 0)] * (vol.ndim - 3) + [(off, pad * n - n - off)] * 3
    return jnp.pad(vol, widths)


def image_to_fourier(imgs, pad: int = 1):
    """Centered 2D spectra; optionally oversampled by zero padding.

    Accepts bfloat16 input (the resident-stack layout at production
    scale keeps 49k x 256^2 images at half the HBM): the upcast happens
    here, per batch, inside the caller's jit — never on the whole stack."""
    x = pad_image(imgs, pad)
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    n = x.shape[-1]
    return jnp.fft.rfft2(x) * _freq_checkerboard_2d(n)


def fourier_to_image(F, n: int):
    """Inverse of image_to_fourier for pad=1 spectra."""
    return jnp.fft.irfft2(F * _freq_checkerboard_2d(n), s=(n, n))


def volume_to_fourier(vol, pad: int = DEFAULT_PAD):
    """Centered, `pad`-times oversampled 3D spectrum of a cubic volume."""
    v = pad_volume(vol, pad)
    n = v.shape[-1]
    return jnp.fft.rfftn(v) * _freq_checkerboard_3d(n)


def fourier_to_volume(F, n: int, pad: int = 1):
    """Inverse: padded spectrum -> cropped central (n, n, n) volume.

    HBM- and FLOP-lean form: the padded grid has pad^3 x more points than
    the n-crop we keep, so a monolithic irfftn wastes most of its work and
    needs full-cube workspace (the box-256 e2e OOM series, rounds 4-5).
    Instead transform ONE AXIS AT A TIME and crop that axis to n before
    touching the next: ifft(F)[x] = ifft(F * (-1)^k)[x - pn/2], so the
    centered n-window lives at wrapped corner rows of the raw transform —
    gather them (no checkerboard constant, no c64 product temp) and move
    on. Peak extra memory is ONE full-length axis transform (~2 half-
    spectrum cubes, ~8 B per padded-grid point vs ~26 monolithic); the y/x
    passes then run on n/pn and (n/pn)^2 of the data. The last axis is the
    rfft-reduced one: after the z/y passes each spatial (z, y) row still
    holds the 1D half-spectrum of a real signal, so a plain irfft
    finishes it."""
    pn = n * pad
    idx = (jnp.arange(n) + (pn - n // 2)) % pn
    v = jnp.fft.ifft(F, n=pn, axis=-3)
    v = jnp.take(v, idx, axis=-3)
    v = jnp.fft.ifft(v, n=pn, axis=-2)
    v = jnp.take(v, idx, axis=-2)
    # each inverse pass folds in one 1/pn — together the 1/pn^3 of irfftn
    v = jnp.fft.irfft(v, n=pn, axis=-1)
    return jnp.take(v, idx, axis=-1)


# ---------------------------------------------------------------------------
# Hermitian-aware gathers
# ---------------------------------------------------------------------------

def gather_3d_hermitian(Fvol, q, scale: float = 1.0):
    """Trilinear interpolation of a 3D rfft-layout spectrum at continuous
    wavenumber coordinates q (..., 3) ordered (qz, qy, qx). `scale`
    multiplies coordinates first (pad-factor oversampling). Friedel mates
    are used for qx < 0; points beyond the Nyquist sphere return 0."""
    n = Fvol.shape[0]
    nxf = Fvol.shape[2]
    q = q * scale
    flip = q[..., 2] < 0
    qs = jnp.where(flip[..., None], -q, q)
    q0 = jnp.floor(qs)
    frac = qs - q0
    q0 = q0.astype(jnp.int32)

    out = jnp.zeros(q.shape[:-1], dtype=Fvol.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (frac[..., 0] if dz else 1 - frac[..., 0])
                    * (frac[..., 1] if dy else 1 - frac[..., 1])
                    * (frac[..., 2] if dx else 1 - frac[..., 2])
                )
                kz = q0[..., 0] + dz
                ky = q0[..., 1] + dy
                kx = q0[..., 2] + dx
                neg = kx < 0
                kzz = jnp.where(neg, -kz, kz) % n
                kyy = jnp.where(neg, -ky, ky) % n
                kxx = jnp.where(neg, -kx, kx)
                valid = kxx <= nxf - 1
                kxx = jnp.clip(kxx, 0, nxf - 1)
                vals = Fvol[kzz, kyy, kxx]
                vals = jnp.where(neg, jnp.conj(vals), vals)
                out = out + jnp.where(valid, w, 0.0) * vals
    out = jnp.where(flip, jnp.conj(out), out)
    r2 = jnp.sum(q * q, axis=-1)
    return jnp.where(r2 <= (n // 2) ** 2, out, 0.0)


def gather_2d_hermitian(Fimg, p, scale: float = 1.0):
    """Bilinear interpolation of a 2D rfft-layout spectrum at continuous
    wavenumber coords p (..., 2) ordered (ky, kx). Friedel-aware."""
    n = Fimg.shape[-2]
    nxf = Fimg.shape[-1]
    p = p * scale
    flip = p[..., 1] < 0
    ps = jnp.where(flip[..., None], -p, p)
    p0 = jnp.floor(ps)
    frac = ps - p0
    p0 = p0.astype(jnp.int32)

    out = jnp.zeros(p.shape[:-1], dtype=Fimg.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            w = (frac[..., 0] if dy else 1 - frac[..., 0]) * (
                frac[..., 1] if dx else 1 - frac[..., 1]
            )
            ky = p0[..., 0] + dy
            kx = p0[..., 1] + dx
            neg = kx < 0
            kyy = jnp.where(neg, -ky, ky) % n
            kxx = jnp.where(neg, -kx, kx)
            valid = kxx <= nxf - 1
            kxx = jnp.clip(kxx, 0, nxf - 1)
            vals = Fimg[kyy, kxx]
            vals = jnp.where(neg, jnp.conj(vals), vals)
            out = out + jnp.where(valid, w, 0.0) * vals
    return jnp.where(flip, jnp.conj(out), out)


# ---------------------------------------------------------------------------
# projection / insertion
# ---------------------------------------------------------------------------

def slice_coords(R, n: int):
    """3D wavenumber coords of the central slice for rotation(s) R, in
    unpadded image wavenumber units. R: (..., 3, 3). Returns
    q (..., n, n//2+1, 3) ordered (qz, qy, qx)."""
    ky = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)
    kx = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    gy = ky[:, None]
    gx = kx[None, :]
    ex = R[..., 0, :]  # image x axis in volume coords
    ey = R[..., 1, :]
    q_xyz = (
        gx[..., None] * ex[..., None, None, :] + gy[..., None] * ey[..., None, None, :]
    )
    return q_xyz[..., ::-1]


def project(Fvol, R, n: int):
    """Central slice(s) of a padded volume spectrum: returns (..., n, n//2+1)
    spectra of projections at the unpadded image resolution."""
    pad = Fvol.shape[0] // n
    q = slice_coords(R, n)
    return gather_3d_hermitian(Fvol, q, scale=float(pad))


def project_ewald(Fvol, R, n: int, ewald_c: float):
    """Curved-sphere projection spectra: the PHYSICAL image formation on
    the Ewald sphere mixes both branches, X(g) = (F(s+) + F*(s-)) / 2 with
    s± = ±g.e + c g² ez — hermitian by construction, and reducing exactly
    to `project` at ewald_c = 0. Used to predict the opposite-branch
    contamination for the reference-based IEWALD=±2 correction and to
    synthesize validation data."""
    pad = Fvol.shape[0] // n
    q = slice_coords(R, n)
    ky = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)
    kx = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    g2 = ky[:, None] ** 2 + kx[None, :] ** 2
    ez = R[..., 2, :][..., ::-1]
    curve = ewald_c * g2[None, :, :, None] * ez[:, None, None, :]
    Fp = gather_3d_hermitian(Fvol, q + curve, scale=float(pad))
    Fm = gather_3d_hermitian(Fvol, -q + curve, scale=float(pad))
    return 0.5 * (Fp + jnp.conj(Fm))


def project_real(vol, phi, theta, psi, pad: int = DEFAULT_PAD):
    """Real-space projection images for Euler angle arrays (batched)."""
    from pyp_tpu.core.geometry import euler_to_matrix

    n = vol.shape[-1]
    Fvol = volume_to_fourier(vol, pad)
    R = euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta), jnp.asarray(psi))
    F = project(Fvol, R, n)
    return fourier_to_image(F, n)


def insert_slices(F_parts, ctfs, R, n: int, pad: int = DEFAULT_PAD,
                  weights=None):
    """CTF-weighted gridding insertion of particle spectra into an
    oversampled 3D accumulator pair.

    F_parts: (B, n, n//2+1) centered unpadded particle spectra
    (shift-corrected); ctfs: (B, n, n//2+1); R: (B, 3, 3).
    Returns (num (pn, pn, pn//2+1) complex, den real), pn = pad*n:
      num += w * CTF * F_part, den += w * CTF^2, trilinear-spread at pad*q.

    TPU scatter notes (measured on v5e): multi-dimensional-index scatters
    are pathologically slow and complex-dtype scatters cost ~7x a float
    one, while a flat 1D float scatter-add runs at ~60M points/s. So the
    8 trilinear corners are concatenated into ONE flattened index/value
    list and accumulated with three f32 scatters (Re, Im, den) — ~50x the
    naive formulation.
    """
    pn = pad * n
    nxf = pn // 2 + 1
    q = slice_coords(R, n) * pad  # (B, n, n//2+1, 3) padded units
    vals = F_parts * ctfs
    c2 = ctfs * ctfs
    if weights is not None:
        vals = vals * weights[:, None, None]
        c2 = c2 * weights[:, None, None]

    flip = q[..., 2] < 0
    qs = jnp.where(flip[..., None], -q, q)
    vals = jnp.where(flip, jnp.conj(vals), vals)
    q0 = jnp.floor(qs)
    frac = qs - q0
    q0 = q0.astype(jnp.int32)

    r2 = jnp.sum(q * q, axis=-1)
    in_sphere = r2 <= (pn // 2) ** 2

    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    size = pn * pn * nxf
    num_re = jnp.zeros(size, jnp.float32).at[idx].add(wre)
    num_im = jnp.zeros(size, jnp.float32).at[idx].add(wim)
    den = jnp.zeros(size, jnp.float32).at[idx].add(wc2)
    num = jax.lax.complex(num_re, num_im).reshape(pn, pn, nxf)
    return num, den.reshape(pn, pn, nxf)


def _corner_lists(qs, vals, c2, q0, frac, in_sphere, pn, nxf, corners=None):
    """Flattened (index, Re, Im, CTF^2) lists over the gridding corners
    (the 8 trilinear offsets by default)."""
    if corners is None:
        corners = [(dz, dy, dx) for dz in (0, 1) for dy in (0, 1)
                   for dx in (0, 1)]
    idx_all, wv_re, wv_im, wc2 = [], [], [], []
    for dz, dy, dx in corners:
        w = (
            (frac[..., 0] if dz else 1 - frac[..., 0])
            * (frac[..., 1] if dy else 1 - frac[..., 1])
            * (frac[..., 2] if dx else 1 - frac[..., 2])
        )
        w = jnp.where(in_sphere, w, 0.0)
        kz = q0[..., 0] + dz
        ky = q0[..., 1] + dy
        kx = q0[..., 2] + dx
        neg = kx < 0
        kzz = jnp.where(neg, -kz, kz) % pn
        kyy = jnp.where(neg, -ky, ky) % pn
        kxx = jnp.where(neg, -kx, kx)
        valid = kxx <= nxf - 1
        kxx = jnp.clip(kxx, 0, nxf - 1)
        w = jnp.where(valid, w, 0.0)
        v = jnp.where(neg, jnp.conj(vals), vals)
        flat = (kzz * pn + kyy) * nxf + kxx
        idx_all.append(flat.reshape(-1))
        wv_re.append((w * jnp.real(v)).reshape(-1))
        wv_im.append((w * jnp.imag(v)).reshape(-1))
        wc2.append((w * c2).reshape(-1))
    return (jnp.concatenate(idx_all), jnp.concatenate(wv_re),
            jnp.concatenate(wv_im), jnp.concatenate(wc2))


def insert_slices_halves(F_parts, ctfs, R, subset, weights, n: int,
                         pad: int = DEFAULT_PAD, gridding: str = "trilinear",
                         ewald_c: float = 0.0, ref_fourier=None, chi=None):
    """insert_slices for both half-sets in ONE scatter pass: the half id
    offsets the flat index into a doubled buffer, so the even/odd split
    costs nothing extra. (A nearest-neighbour kernel was measured and
    rejected: ~8x fewer scatter points but visibly worse truth recovery at
    sparse coverage.) Returns (num1, den1, num2, den2).

    ewald_c: Ewald-sphere curvature in index units (lambda / (2 n pixel),
    signed by handedness; FREALIGN IEWALD=+-1 "simple insertion", Wolf/
    DeRosier/Grigorieff 2006). Each measured sample lands on the Ewald
    SPHERE — z-offset ewald_c*|g|^2 along the beam axis. The curvature is
    even in g, so the stored half-plane's Friedel mates are no longer the
    volume-hermitian mirrors of the stored points: both sides insert
    explicitly (X(g) at g.e + c g^2 ez, X*(g) at -g.e + c g^2 ez), doubling
    the scatter work only when enabled.

    ref_fourier + chi: padded reference volume spectrum and per-particle
    total aberration phase grids (B, n, n//2+1) -> REFERENCE-BASED Ewald
    correction (FREALIGN IEWALD=+-2, reconstruct3d stdin card frealign.py:
    1780-1824; Wolf/DeRosier/Grigorieff 2006). The physical curved-sphere
    image formation carries a branch-dependent COMPLEX transfer factor,
        X(g) = ctf+ F(s+) + conj(ctf+) F*(s-),   ctf+ = (i/2) e^{i chi},
    with s± = ±g.e + c g² ez (and ctf+ + conj(ctf+) = -sin chi = the flat
    CTF, so the model collapses to the standard one at c = 0). The
    reference predicts the opposite branch, which is subtracted from the
    measured mixture; the corrected value is matched-filtered by conj(ctf+)
    (den += |ctf+|² = 1/4 — the aberration phase carries no amplitude
    zeros, which is exactly why Ewald correction recovers information at
    CTF zeros). The e^{±i chi} phases make this mode handedness-SENSITIVE,
    unlike the simple ±1 insertion (provably invariant under c -> -c by
    Friedel symmetry). Any dose/B-factor envelope folded into `ctfs` is
    not applied on this path (aberration phase only)."""
    pn = pad * n
    nxf = pn // 2 + 1
    q_u = slice_coords(R, n)
    q = q_u * pad
    vals = F_parts * ctfs * weights[:, None, None]
    c2 = ctfs * ctfs * weights[:, None, None]
    if ewald_c:
        ky = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)
        kx = jnp.arange(n // 2 + 1, dtype=jnp.float32)
        g2 = (ky[:, None] ** 2 + kx[None, :] ** 2)           # (n, nxf_img)
        ez = R[..., 2, :][..., ::-1]                         # beam, zyx
        curve_u = ewald_c * g2[None, :, :, None] * ez[:, None, None, :]
        curve = curve_u * pad
        if ref_fourier is not None and chi is not None:
            # reference-based unmixing (IEWALD magnitude 2): sample the
            # reference on BOTH curved branches, subtract the opposite
            # branch's predicted contribution, matched-filter by the
            # branch's complex transfer factor conj(ctf+)
            pad_ref = ref_fourier.shape[0] // n
            Rp = gather_3d_hermitian(ref_fourier, q_u + curve_u,
                                     scale=float(pad_ref))
            Rm = gather_3d_hermitian(ref_fourier, -q_u + curve_u,
                                     scale=float(pad_ref))
            w3 = weights[:, None, None]
            ctfp = 0.5j * jnp.exp(jax.lax.complex(jnp.zeros_like(chi), chi))
            ctfp_c = jnp.conj(ctfp)
            Yp = F_parts - ctfp_c * jnp.conj(Rm)   # remove F*(s-) term
            Ym = jnp.conj(F_parts) - ctfp_c * jnp.conj(Rp)  # remove F*(s+)
            vals = jnp.concatenate([ctfp_c * Yp * w3, ctfp_c * Ym * w3],
                                   axis=0)
            c2b = 0.25 * w3 * jnp.ones_like(chi)   # |ctf+|^2 = 1/4
            c2 = jnp.concatenate([c2b, c2b], axis=0)
        else:
            vals = jnp.concatenate([vals, jnp.conj(vals)], axis=0)
            c2 = jnp.concatenate([c2, c2], axis=0)
        q = jnp.concatenate([q + curve, -q + curve], axis=0)
        subset = jnp.concatenate([subset, subset], axis=0)
    flip = q[..., 2] < 0
    qs = jnp.where(flip[..., None], -q, q)
    vals = jnp.where(flip, jnp.conj(vals), vals)
    q0 = jnp.floor(qs)
    frac = qs - q0
    q0 = q0.astype(jnp.int32)
    in_sphere = jnp.sum(q * q, axis=-1) <= (pn // 2) ** 2

    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    size = pn * pn * nxf
    B = vals.shape[0]   # = particle count, x2 under Ewald doubling
    per = idx.shape[0] // (8 * B)
    half = jnp.tile(jnp.repeat(jnp.clip(subset.astype(jnp.int32), 0, 1), per), 8)
    idx2 = idx + half * size
    num_re = jnp.zeros(2 * size, jnp.float32).at[idx2].add(wre)
    num_im = jnp.zeros(2 * size, jnp.float32).at[idx2].add(wim)
    den = jnp.zeros(2 * size, jnp.float32).at[idx2].add(wc2)
    num = jax.lax.complex(num_re, num_im).reshape(2, pn, pn, nxf)
    den = den.reshape(2, pn, pn, nxf)
    return num[0], den[0], num[1], den[1]


def gridding_correction(n: int, pad: int = DEFAULT_PAD, power: int = 2):
    """Real-space correction over the cropped n-box for the gridding kernel
    on the padded grid: divide by sinc^power((x - c)/pn) per axis
    (power=2 for the trilinear kernel, power=1 for nearest/box)."""
    pn = n * pad
    ax = (jnp.arange(n, dtype=jnp.float32) - n // 2) / pn
    s = jnp.sinc(ax) ** power  # device iota: see _freq_checkerboard_2d
    c = s[:, None, None] * s[None, :, None] * s[None, None, :]
    return jnp.maximum(c, 1e-3)


@functools.partial(jax.jit, static_argnames=("n", "pad", "gridding"))
def reconstruct_from_accumulators(num, den, n: int, pad: int = DEFAULT_PAD,
                                  wiener: float = 1.0,
                                  gridding: str = "trilinear"):
    """num/den -> real-space n-box map with Wiener-style regularization and
    kernel-matched gridding correction.

    The Wiener division and the first (z) inverse pass run COLUMN-CHUNKED
    along the reduced x axis: a full-grid `num/(den+wiener)` temp plus a
    full-length ifft output is ~18 B per padded-grid point (measured,
    pn 576) — the term that kept box-256 finalize within an ace of HBM.
    Chunking fuses the division into each slab and frees it before the
    next, so the peak extra is the (n, pn, nxf) z-cropped grid (4/pad
    B/point) + two slabs (~2-3 B/point total at pad 4)."""
    pn = n * pad
    nxf = num.shape[-1]
    idx = (jnp.arange(n) + (pn - n // 2)) % pn
    n_chunks = min(8, nxf)
    bounds = [round(c * nxf / n_chunks) for c in range(n_chunks + 1)]
    parts = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        Fc = num[..., lo:hi] / (den[..., lo:hi] + wiener)
        vc = jnp.fft.ifft(Fc, n=pn, axis=-3)
        parts.append(jnp.take(vc, idx, axis=-3))
    v = jnp.concatenate(parts, axis=-1)            # (n, pn, nxf)
    v = jnp.fft.ifft(v, n=pn, axis=-2)
    v = jnp.take(v, idx, axis=-2)
    v = jnp.fft.irfft(v, n=pn, axis=-1)
    vol = jnp.take(v, idx, axis=-1)
    # padded irfftn spreads the inverse-transform normalization over pn^3
    # samples; rescale so amplitudes match the unpadded convention
    vol = vol * (pad ** 3)
    return vol / gridding_correction(
        n, pad, power=1 if gridding == "nearest" else 2)
