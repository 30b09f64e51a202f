"""FRM-style projection matching: MXU-shaped orientation search.

This is the TPU speed-of-light redesign of the refine3d scoring core
(reference role: wrapped cisTEM2 refine3d, frealign.py:3916-4010). The
per-pose Fourier-slice gather that dominates the gather-based path
(ops/refine3d.py) runs at only a few million points/sec on TPU — XLA
lowers random gathers to scalar loads, and the hardware has no vector
gather. This module removes per-pose-evaluation gathers entirely:

  1. **Polar resampling as a dense matmul.** Each particle spectrum is
     resampled onto rings (r, psi) by ONE fixed interpolation matrix
     applied on the MXU. Because the matrix is dense anyway, it uses the
     exact Dirichlet (periodic-sinc) kernel — exact interpolation of a
     finite-support image's spectrum, strictly more accurate than the
     2x-padded trilinear interpolation the gather path (and cisTEM) use.
  2. **Direction bank.** Reference central slices for a direction lattice
     are gathered once per refinement iteration (amortized over every
     particle in the dataset) and stored in the same polar layout.
  3. **CTF restored on the grid, not modeled off-grid.** The particle's
     samples are (CTF x slice); interpolating that product between samples
     is wrong wherever the CTF oscillates near the sampling rate. So the
     CTF is Wiener-divided out on the Cartesian grid BEFORE resampling
     (every interpolation stays on the data side), the model is the
     CTF-free slice, and the restored-band confidence C^2/(C^2+w) enters
     as per-particle ring weights.
  4. **All in-plane rotations at once.** With both sides polar, an
     in-plane rotation is a circular shift along psi, so the score for
     ALL psi values is a cross-correlation along the ring angle —
     computed by FFT along psi and a ring-contraction einsum (batched
     matmul on the MXU). With radial weights the NCC denominator is
     psi-independent (full-circle power sums are roll-invariant): one
     small matmul, no second correlation.
  5. Shifts: the first match marginalizes over a coarse shift grid (max
     over joint (shift, direction, psi)), then a per-particle fine grid is
     scored at the matched orientation via one batched (rings*psi, shifts)
     contraction, alternating with orientation rounds.

Cost per batch: O(B * D * R * n_psi) MXU flops — for 1024 particles
against a 7.5-degree lattice (~750 directions x 256 psis) about 50 TFLOP,
a fraction of a second — versus minutes for the per-pose gather loop.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core import ctf as ctf_model
from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops.fourier_slice import gather_3d_hermitian


# ---------------------------------------------------------------------------
# geometry (host-side constants)
# ---------------------------------------------------------------------------

def make_rings(n: int, pixel_size: float, low_res: float, high_res: float):
    """Integer ring radii (unpadded wavenumber units) inside the band."""
    r_min = max(2, int(np.ceil(n * pixel_size / low_res)))
    r_max = min(n // 2 - 2, int(np.floor(n * pixel_size / high_res)))
    if r_max < r_min:
        raise ValueError(f"empty band: rings [{r_min}, {r_max}]")
    return np.arange(r_min, r_max + 1, dtype=np.float32)


def default_n_psi(radii) -> int:
    """Power-of-two psi count >= the outer ring's Nyquist rate (2*pi*r)."""
    need = 2.0 * np.pi * float(np.max(radii))
    return int(2 ** np.ceil(np.log2(max(need, 32.0))))


def ring_weights(radii) -> np.ndarray:
    """Per-ring quadrature weights: ring area element ~ r (so the ring sum
    approximates the 2D band integral the gather path's annulus mask uses)."""
    r = np.asarray(radii, dtype=np.float32)
    return r / r.sum()


def _dirichlet_kernel(t, n):
    """Exact interpolation kernel for a centered n-support image spectrum:
    X(g) = sum_k X[k] K(k - g) with
    K(t) = (1/n) sin(pi t)/sin(pi t / n) * exp(-i pi t / n)
    (derived from DFT inversion over the sample window m - n/2, m in
    [0, n)). |t| < n always holds here (grid nodes and polar points live
    inside one period), so the only removable singularity is t = 0."""
    t = np.asarray(t, dtype=np.float64)
    small = np.abs(t) < 1e-9
    denom = np.where(small, 1.0, np.sin(np.pi * t / n))
    mag = np.where(small, 1.0, np.sin(np.pi * t) / (n * denom))
    return mag * np.exp(-1j * np.pi * t / n)


def polar_matrix(n: int, radii, n_psi: int):
    """Dense complex interpolation matrix W (R*P, n*n): polar samples of a
    centered full-grid spectrum, X_polar = W @ vec(X_full).

    Polar point p = (ring r, angle a_j = 2*pi*j/n_psi) samples the spectrum
    at (gy, gx) = r*(sin a, cos a). Exact (Dirichlet kernel) for n-support
    images. Returns (W_re, W_im) float32 of shape (R*P, n*n); columns in
    full-fft layout ((ky-major) with ky, kx in np.fft.fftfreq order).
    """
    radii = np.asarray(radii, dtype=np.float64)
    R, P = len(radii), n_psi
    ang = 2.0 * np.pi * np.arange(P) / P
    gy = radii[:, None] * np.sin(ang)[None, :]   # (R, P)
    gx = radii[:, None] * np.cos(ang)[None, :]
    ky = np.fft.fftfreq(n) * n                   # (n,)
    kx = np.fft.fftfreq(n) * n
    Ky = _dirichlet_kernel(ky[None, :] - gy.reshape(-1)[:, None], n)  # (RP, n)
    Kx = _dirichlet_kernel(kx[None, :] - gx.reshape(-1)[:, None], n)  # (RP, n)
    W = Ky[:, :, None] * Kx[:, None, :]          # (RP, n, n) complex
    W = W.reshape(R * P, n * n)
    return (np.ascontiguousarray(W.real.astype(np.float32)),
            np.ascontiguousarray(W.imag.astype(np.float32)))


def image_to_fourier_full(imgs):
    """Centered FULL-grid 2D spectra (..., n, n) complex (cf.
    fourier_slice.image_to_fourier which returns the rfft half grid)."""
    n = imgs.shape[-1]
    i = np.add.outer(np.arange(n), np.arange(n))
    cb = jnp.asarray(np.where(i % 2 == 0, 1.0, -1.0).astype(np.float32))
    return jnp.fft.fft2(imgs) * cb


@functools.partial(jax.jit, static_argnames=())
def polar_transform(stack, W_re, W_im):
    """(B, n, n) real images -> (B, R*P) complex polar spectrum samples,
    via 4 real matmuls on the MXU (W complex, X complex)."""
    X = image_to_fourier_full(stack)
    B = X.shape[0]
    Xr = jnp.real(X).reshape(B, -1)
    Xi = jnp.imag(X).reshape(B, -1)
    out_re = Xr @ W_re.T - Xi @ W_im.T
    out_im = Xr @ W_im.T + Xi @ W_re.T
    return jax.lax.complex(out_re, out_im)


def _oversampled_spectra(stack, os: int):
    """Centered full-grid spectra of `os`-times zero-padded images:
    (B, os*n, os*n) c64. The integer node os*q equals the n-grid centered
    spectrum at wavenumber q; intermediate nodes sample the band-limited
    interpolant exactly (the image has n-pixel support), so bilinear
    interpolation between them is accurate to O((pi/2/os)^2)."""
    n = stack.shape[-1]
    N = os * n
    off = (N - n) // 2
    x = jnp.pad(stack.astype(jnp.float32),
                ((0, 0), (off, N - n - off), (off, N - n - off)))
    i = np.add.outer(np.arange(N), np.arange(N))
    cb = jnp.asarray(np.where(i % 2 == 0, 1.0, -1.0).astype(np.float32))
    return jnp.fft.fft2(x) * cb


def _keys_cubic_weights(t):
    """Catmull-Rom (Keys, a=-0.5) cubic kernel weights for taps
    (-1, 0, +1, +2) at fractional position t in [0, 1)."""
    t2 = t * t
    t3 = t2 * t
    return (-0.5 * t3 + t2 - 0.5 * t,
            1.5 * t3 - 2.5 * t2 + 1.0,
            -1.5 * t3 + 2.0 * t2 + 0.5 * t,
            0.5 * t3 - 0.5 * t2)


def _bicubic_wrap_take(Y, p):
    """Bicubic (Keys) interpolation of (B, N, N) periodic full-fft grids
    at wavenumber points p (..., 2) = (gy, gx) SHARED across the batch.
    Cubic, not bilinear: at 2x spectrum oversampling a window-filling
    image rotates the inter-node phase by up to pi/2, where linear
    interpolation of e^{i theta} loses tens of percent (measured ~1.0
    mean rel err on white noise) while the C^1 cubic stays at the few-
    percent level. The flattened 16-tap indices are identical for every
    particle, so each tap lowers to one take along the flattened axis."""
    N = Y.shape[-1]
    p0 = jnp.floor(p)
    f = p - p0
    p0 = p0.astype(jnp.int32)
    wys = _keys_cubic_weights(f[..., 0])
    wxs = _keys_cubic_weights(f[..., 1])
    Yf = Y.reshape(Y.shape[0], -1)
    out = None
    for dy in (-1, 0, 1, 2):
        wy = wys[dy + 1]
        iy = (p0[..., 0] + dy) % N
        for dx in (-1, 0, 1, 2):
            wx = wxs[dx + 1]
            ix = (p0[..., 1] + dx) % N
            v = jnp.take(Yf, (iy * N + ix).reshape(-1), axis=1)
            v = v.reshape((Y.shape[0],) + p.shape[:-1])
            term = (wy * wx)[None] * v
            out = term if out is None else out + term
    return out


def polar_sample_gather(stack, ctf_params, pts, n, pixel_size, voltage_kv,
                        cs_mm, amplitude_contrast, wiener, os: int = 2):
    """Wiener-restored polar spectra WITHOUT the dense Dirichlet matrix:
    oversampled-FFT + 4-tap interpolation of the raw spectrum, then exact
    ANALYTIC CTF restoration at each polar point.

    Why it exists: the matmul path's W is (R*n_psi, n_crop^2) — exact and
    MXU-perfect at small crops, but its size/FLOPs scale with the band.
    At box 256 the rhref schedule grows W from 0.85 GiB (iteration 2) to
    41 GiB (rhref 3 A, crop 224) and the polar matmuls alone dominate the
    iteration wall (measured: ~113 s of iteration 2's 118 s at crop 128).
    This path is O(n^2 log n) + O(R K) per particle with no resident
    matrix, and the CTF needs no gridding at all (the matmul path must
    restore on the grid before interpolating; here the raw data spectrum
    is interpolated and the exact point CTF divides after).

    Returns (Xp (B, R, K) c64 restored samples,
             conf_mean (B, R) ring-mean restored confidence in [0, 1])."""
    from pyp_tpu.ops.refine3d import _ctf_at_points

    pts = jnp.asarray(pts)
    # Wiener-restore ON THE n-GRID first, exactly like the matmul path:
    # the data nodes are C[k]*S[k], and their band-limited interpolant at
    # off-node points looks nothing like C(pt)*S(pt) once the CTF
    # oscillates near the grid rate (measured: interpolate-then-divide
    # decorrelated ring ncc to 0.41 at box 48 / 15k A defocus while
    # restore-then-interpolate held 0.99). Restoration is pointwise in
    # frequency, so it runs in the cheap rfft layout; the restored
    # spectrum of a real image is again Hermitian, so the round trip
    # stays real and the oversampled FFT interpolates the restored field.
    Cr = ctf_model.ctf_2d(
        (n, n), pixel_size, ctf_params[:, 0], ctf_params[:, 1],
        ctf_params[:, 2], voltage_kv, cs_mm, w=amplitude_contrast,
        phase_shift_rad=ctf_params[:, 3], rfft=True)          # (B, n, nxf)
    xw = jnp.fft.irfft2(
        jnp.fft.rfft2(stack.astype(jnp.float32))
        * (Cr / (Cr * Cr + wiener)), s=(n, n))
    Y = _oversampled_spectra(xw, os)
    Xp = _bicubic_wrap_take(Y, pts * float(os))               # (B, R, K)
    C = _ctf_at_points(
        pts[None], n, pixel_size,
        ctf_params[:, 0, None, None], ctf_params[:, 1, None, None],
        ctf_params[:, 2, None, None], voltage_kv, cs_mm,
        amplitude_contrast, ctf_params[:, 3, None, None])     # (B, R, K)
    conf = C * C / (C * C + wiener)
    return Xp, jnp.clip(jnp.mean(conf, axis=-1), 0.0, 1.0)


# ---------------------------------------------------------------------------
# polar-domain physics factors
# ---------------------------------------------------------------------------

def polar_points(radii, n_psi):
    """(R, P, 2) float32 (gy, gx) wavenumber coordinates of the polar grid."""
    radii = np.asarray(radii, dtype=np.float32)
    ang = 2.0 * np.pi * np.arange(n_psi, dtype=np.float32) / n_psi
    gy = radii[:, None] * np.sin(ang)[None, :]
    gx = radii[:, None] * np.cos(ang)[None, :]
    return np.stack([gy, gx], axis=-1)


def shift_phasor_polar(pts, shifts, n):
    """exp(+2 pi i (gy sy + gx sx) / n) at polar points: (B, R, P) complex
    for shifts (B, 2) = (sy, sx)."""
    ph = (2.0 * jnp.pi / n) * (
        pts[None, ..., 0] * shifts[:, 0, None, None]
        + pts[None, ..., 1] * shifts[:, 1, None, None]
    )
    return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


# ---------------------------------------------------------------------------
# direction bank
# ---------------------------------------------------------------------------

def direction_bank(Fref, directions, radii, n_psi: int, n: int):
    """Central-slice ring values for every lattice direction: (D, R, P)
    complex. U[d, r, j] = F_vol(r cos(a_j) ex0(d) + r sin(a_j) ey0(d))
    with ex0/ey0 the in-plane axes of R(phi, theta, psi=0). Gathered once
    per refinement iteration (trilinear from the 2x-oversampled volume)."""
    directions = jnp.asarray(directions)
    D = directions.shape[0]
    vol_pad = Fref.shape[0] // n
    R0 = euler_to_matrix(directions[:, 0], directions[:, 1],
                         jnp.zeros(D))                       # (D, 3, 3)
    ex = R0[:, 0, :]
    ey = R0[:, 1, :]
    pts = jnp.asarray(polar_points(radii, n_psi))            # (R, P, 2)
    q = (pts[None, ..., 1, None] * ex[:, None, None, :]
         + pts[None, ..., 0, None] * ey[:, None, None, :])   # (D, R, P, 3) xyz
    return gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))


class FrmBank:
    """Per-(reference, iteration) scoring tables, all built inside one jit
    (eager complex ops are unsupported through the axon TPU tunnel)."""

    def __init__(self, Fref, directions, radii, n_psi: int, n: int):
        self.directions = np.asarray(directions, dtype=np.float32)
        self.radii = np.asarray(radii, dtype=np.float32)
        self.n_psi = int(n_psi)
        self.n = int(n)
        pts = jnp.asarray(polar_points(radii, n_psi))
        # only the psi-FFT table is resident: U is exactly recoverable as
        # conj(ifft(conj(FUc))) for the few selected rows that need ring
        # values, and NOT storing it halves bank HBM — the binding
        # constraint at production boxes (box 256 / late-iteration bands
        # OOMed a v5e with both tables live)
        self.FUc, self.u2sum = _bank_tables(
            Fref, jnp.asarray(self.directions), pts, n)
        R0 = euler_to_matrix(self.directions[:, 0], self.directions[:, 1],
                             np.zeros(len(self.directions)))
        self.axes = np.asarray(R0[:, 2, :])                    # (D, 3)


@functools.partial(jax.jit, static_argnames=("n",))
def _bank_tables(Fref, directions, pts, n: int):
    """U (D, R, P) ring values + the FFT table for the psi correlation
    s(j) = sum_a A(a) B(a-j) = ifft_j[ fft(A)_k * conj(fft(conj(B)))_k ]
    + per-ring power sums (the NCC denominator: psi-independent because a
    full-circle sum is invariant under circular shifts).

    Built in DIRECTION BLOCKS via lax.map: the monolithic build held the
    (D, R, K, 3) coordinate grid, the full U, and the full FUc live at
    once (~2.5 GiB at box-256 late-iteration bands) — at the worst
    possible moment, right after an iteration's reconstruction. Blocked,
    the peak is the FUc output plus one block's temps."""
    D = directions.shape[0]
    vol_pad = Fref.shape[0] // n
    R0 = euler_to_matrix(directions[:, 0], directions[:, 1], jnp.zeros(D))
    ex = R0[:, 0, :]
    ey = R0[:, 1, :]
    blk = 128
    pad_d = (-D) % blk
    ex_p = jnp.pad(ex, ((0, pad_d), (0, 0)))
    ey_p = jnp.pad(ey, ((0, pad_d), (0, 0)))

    def one_block(args):
        ex_b, ey_b = args
        q = (pts[None, ..., 1, None] * ex_b[:, None, None, :]
             + pts[None, ..., 0, None] * ey_b[:, None, None, :])
        U = gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))
        return (jnp.conj(jnp.fft.fft(jnp.conj(U), axis=-1)),
                jnp.sum(jnp.abs(U) ** 2, axis=-1))

    nb = (D + pad_d) // blk
    FUc_b, u2_b = jax.lax.map(
        one_block, (ex_p.reshape(nb, blk, 3), ey_p.reshape(nb, blk, 3)))
    FUc = FUc_b.reshape(nb * blk, *FUc_b.shape[2:])[:D]      # (D, R, K)
    u2sum = u2_b.reshape(nb * blk, *u2_b.shape[2:])[:D]      # (D, R)
    return FUc, u2sum


# ---------------------------------------------------------------------------
# matching + shifts (single jitted round)
# ---------------------------------------------------------------------------

def _upsampled_ifft(h, upsample: int):
    """Real part of the inverse fft along psi, trigonometrically
    interpolated onto an `upsample`-times finer psi grid."""
    if upsample == 1:
        return jnp.real(jnp.fft.ifft(h, axis=-1))
    K = h.shape[-1]
    lo = h[..., : K // 2]
    hi = h[..., K // 2:]
    mid = jnp.zeros(h.shape[:-1] + (K * (upsample - 1),), dtype=h.dtype)
    return jnp.real(jnp.fft.ifft(
        jnp.concatenate([lo, mid, hi], axis=-1), axis=-1)) * upsample


def _match(Xp_shift_cands, ring_w, FUc, u2sum, dir_mask, d_block: int,
           upsample: int, psi_mask=None):
    """Best (shift candidate, direction, psi) per particle.

    Xp_shift_cands: (S, B, R, P) — CTF-restored particle polar spectra with
    each of S candidate shift phasors applied (shift marginalization:
    orientation scoring takes the max over the joint (s, d, psi) grid, as
    the gather path's global search does over its shift disk).
    ring_w: (B, R) per-particle ring weights (quadrature x restored-CTF
    confidence). The NCC denominator is both shift- and psi-independent
    (|phasor| = 1; full-circle power sums are roll-invariant), so it is one
    small matmul and only the num einsum repeats per candidate.

    Returns (score, shift cand idx, dir idx, psi idx on the upsampled
    grid), each (B,)."""
    A = jnp.conj(Xp_shift_cands) * ring_w[None, :, :, None]
    FA = jnp.fft.fft(A, axis=-1)                      # (S, B, R, K)
    xnorm2 = jnp.sum(ring_w[:, :, None]
                     * jnp.abs(Xp_shift_cands[0]) ** 2, axis=(1, 2))
    return _match_core(FA, xnorm2, ring_w, FUc, u2sum, dir_mask, d_block,
                       upsample, psi_mask)


def _match_harmonics(FA, ring_w, Xp0, FUc, u2sum, dir_mask, d_block: int,
                     upsample: int, psi_mask=None):
    """_match with a precomputed (possibly harmonic-truncated) FA
    (S, B, R, K'); Xp0 supplies the (shift-invariant) data norm."""
    xnorm2 = jnp.sum(ring_w[:, :, None] * jnp.abs(Xp0) ** 2, axis=(1, 2))
    return _match_core(FA, xnorm2, ring_w, FUc, u2sum, dir_mask, d_block,
                       upsample, psi_mask)


def _num_hat(FA_s, fu):
    """Ring-contraction einsum num[b,d,k] = sum_r FA[b,r,k] fu[d,r,k].

    The contraction dominates the engine's FLOPs; scores are NCCs in
    [-1, 1] selected by argmax, so bf16 inputs with f32 accumulation
    (preferred_element_type) trade ~4e-3 score noise for ~2x MXU rate —
    split into the four real einsums to stay on the bf16 MXU path."""
    ar, ai = jnp.real(FA_s).astype(jnp.bfloat16), jnp.imag(FA_s).astype(jnp.bfloat16)
    br, bi = jnp.real(fu).astype(jnp.bfloat16), jnp.imag(fu).astype(jnp.bfloat16)

    def ein(a, b):
        return jnp.einsum("brk,drk->bdk", a, b,
                          preferred_element_type=jnp.float32)

    return jax.lax.complex(ein(ar, br) - ein(ai, bi),
                           ein(ar, bi) + ein(ai, br))


def _match_core(FA, xnorm2, ring_w, FUc, u2sum, dir_mask, d_block: int,
                upsample: int, psi_mask=None):
    S, B, R, K = FA.shape
    D = FUc.shape[0]
    Ku = K * upsample

    def one_block(d0):
        fu = jax.lax.dynamic_slice_in_dim(FUc, d0, d_block, axis=0)
        u2 = jax.lax.dynamic_slice_in_dim(u2sum, d0, d_block, axis=0)
        m = jax.lax.dynamic_slice_in_dim(dir_mask, d0, d_block, axis=1)
        # psi-independent NCC denominator: full-circle power sums
        den = jnp.sqrt(jnp.maximum(ring_w @ u2.T, 1e-20)
                       * xnorm2[:, None])             # (B, d)
        best = jnp.full((B,), -jnp.inf)
        idx = jnp.zeros((B,), jnp.int32)
        for s in range(S):  # static unroll; running max bounds memory
            num = _upsampled_ifft(_num_hat(FA[s], fu), upsample)
            v = (num / den[..., None]) + m[..., None]
            if psi_mask is not None:  # local mode: psi prior (B, Ku)
                v = v + psi_mask[:, None, :]
            v = v.reshape(B, -1)
            i = jnp.argmax(v, axis=1)
            val = jnp.take_along_axis(v, i[:, None], 1)[:, 0]
            upd = val > best
            idx = jnp.where(upd, s * (d_block * Ku) + i, idx)
            best = jnp.maximum(best, val)
        return best, idx

    n_blocks = D // d_block
    scores, idxs = jax.lax.map(
        lambda i: one_block(i * d_block), jnp.arange(n_blocks))
    blk = jnp.argmax(scores, axis=0)                      # (B,)
    best = jnp.take_along_axis(scores, blk[None], 0)[0]
    flat = jnp.take_along_axis(idxs, blk[None], 0)[0]
    s_idx = flat // (d_block * Ku)
    rem = flat % (d_block * Ku)
    return best, s_idx, blk * d_block + rem // Ku, rem % Ku


def _roll_psi(U, psi_deg):
    """out(a) = U(a - psi): continuous circular shift along the psi axis
    via harmonic phases."""
    K = U.shape[-1]
    k = jnp.asarray(np.fft.fftfreq(K) * K, dtype=jnp.float32)
    ph = -2.0 * jnp.pi * k[None, None, :] * (psi_deg[:, None, None] / 360.0)
    rot = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    return jnp.fft.ifft(jnp.fft.fft(U, axis=-1) * rot, axis=-1)


def _refine_shifts(Xp_raw, ring_w, U_best, u2_best, psi_deg, pts,
                   shift_grids, n: int):
    """Best absolute shift per particle at the matched (direction, psi):
    a batched (R*P) x (S) contraction over per-particle candidate grids
    shift_grids (B, S, 2) (centered on each particle's current estimate).
    ring_w: (B, R); u2_best: (B, R) ring power sums of the matched U."""
    w = ring_w[:, :, None]
    M = _roll_psi(U_best, psi_deg)                        # (B, R, P)
    A = jnp.conj(Xp_raw) * M * w
    B_ = A.shape[0]
    # content shifted by +s carries spectrum phase e^{-2 pi i g.s / n}
    # (empirically matched against reconstruct._shift_correct): removing it
    # multiplies conj(Xp) by e^{-i ph}, so num = Re(A)cos(ph) + Im(A)sin(ph)
    gy = pts[..., 0].reshape(-1)
    gx = pts[..., 1].reshape(-1)
    ph = (2.0 * jnp.pi / n) * (
        gy[None, :, None] * shift_grids[:, None, :, 0]
        + gx[None, :, None] * shift_grids[:, None, :, 1])  # (B, RP, S)
    num = (jnp.einsum("bg,bgs->bs", jnp.real(A).reshape(B_, -1), jnp.cos(ph))
           + jnp.einsum("bg,bgs->bs", jnp.imag(A).reshape(B_, -1),
                        jnp.sin(ph)))                      # (B, S)
    den = jnp.sqrt(
        jnp.sum(w * jnp.abs(Xp_raw) ** 2, axis=(1, 2))
        * jnp.sum(ring_w * u2_best, axis=1) + 1e-20)
    s = num / den[:, None]
    idx = jnp.argmax(s, axis=1)
    best_shift = jnp.take_along_axis(
        shift_grids, idx[:, None, None], axis=1)[:, 0]
    return best_shift, jnp.take_along_axis(s, idx[:, None], 1)[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_psi", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "rounds", "d_block", "upsample",
                     "cone_deg", "coarse_step", "wiener", "polar_gather"),
)
def _frm_refine_jit(
    stack, ctf_params, W_re, W_im, pts, ring_w, FUc, u2sum, dir_table,
    bank_axes, shift_grid, coarse_shifts, init_shifts, init_axes,
    init_psi_deg, ring_cref,
    n: int, n_psi: int, pixel_size: float, voltage_kv: float, cs_mm: float,
    amplitude_contrast: float, rounds: int, d_block: int, upsample: int,
    cone_deg, coarse_step: float = 0.0, wiener: float = 0.1,
    polar_gather: bool = False,
):
    B = stack.shape[0]
    R = pts.shape[0]
    # --- CTF restoration on the sampled grid -----------------------------
    # The particle spectrum samples are (CTF * slice); interpolating that
    # product between samples does NOT equal CTF(g) * slice(g) where the
    # CTF oscillates near the sampling rate. Wiener-dividing the CTF out
    # ON THE GRID keeps every interpolation on the data side consistent,
    # and the model side becomes the CTF-free slice U. The restored-band
    # confidence C^2/(C^2+wiener) enters as per-particle ring weights.
    if polar_gather:
        # band-scalable path (see polar_sample_gather): no dense W, raw
        # spectrum interpolated from the 2x-oversampled FFT, exact CTF at
        # the polar points
        Xp, conf_mean = polar_sample_gather(
            stack, ctf_params, pts, n, pixel_size, voltage_kv, cs_mm,
            amplitude_contrast, wiener)
        wr = (ring_w * ring_cref)[None, :] * conf_mean
    else:
        X = image_to_fourier_full(stack)                   # (B, n, n)
        Cg = ctf_model.ctf_2d(
            (n, n), pixel_size, ctf_params[:, 0], ctf_params[:, 1],
            ctf_params[:, 2], voltage_kv, cs_mm, w=amplitude_contrast,
            phase_shift_rad=ctf_params[:, 3], rfft=False)  # (B, n, n)
        conf = Cg * Cg / (Cg * Cg + wiener)
        Xw = X * (Cg / (Cg * Cg + wiener))
        Xr = jnp.real(Xw).reshape(B, -1)
        Xi = jnp.imag(Xw).reshape(B, -1)
        Xp = jax.lax.complex(
            Xr @ W_re.T - Xi @ W_im.T,
            Xr @ W_im.T + Xi @ W_re.T).reshape(B, R, n_psi)
        # per-particle ring weights: quadrature x ring-mean restored
        # confidence (real part of the complex-kernel interpolation of a
        # real array)
        conf_rings = (conf.reshape(B, -1) @ W_re.T).reshape(B, R, n_psi)
        wr = (ring_w * ring_cref)[None, :] * jnp.clip(
            jnp.mean(conf_rings, axis=-1), 0.0, 1.0)

    D = FUc.shape[0]
    if cone_deg is None:
        dir_mask = jnp.zeros((B, D))
    else:
        cosim = init_axes @ bank_axes.T
        dir_mask = jnp.where(
            cosim >= np.cos(np.radians(cone_deg)), 0.0, -jnp.inf)

    def psi_prior(Ku):
        # local mode restricts psi too: the full-360 in-plane search would
        # let a spurious rotation overfit (breaks 3D classification, where
        # the per-class score must be a LOCAL fit quality; the gather
        # engine's gradient search has this locality built in)
        if cone_deg is None:
            return None
        win = max(float(cone_deg), 2.0 * 360.0 / Ku)
        ang = jnp.arange(Ku, dtype=jnp.float32) * (360.0 / Ku)
        d = (ang[None, :] - init_psi_deg[:, None] + 180.0) % 360.0 - 180.0
        return jnp.where(jnp.abs(d) <= win, 0.0, -jnp.inf)
    pad = (-D) % d_block
    if pad:
        FUc = jnp.pad(FUc, ((0, pad), (0, 0), (0, 0)))
        u2sum = jnp.pad(u2sum, ((0, pad), (0, 0)))
        dir_mask = jnp.pad(dir_mask, ((0, 0), (0, pad)),
                           constant_values=-jnp.inf)

    shifts = init_shifts
    scores = d_idx = psi_deg = None
    radii_dev = pts[:, 0, 1]  # (R,) ring radii (gx at angle 0)
    # low-harmonic tables for the coarse round: a ring of radius r only
    # carries ~2*pi*r meaningful psi harmonics, and the damped coarse match
    # doesn't use the outer rings' detail — truncating the psi spectrum
    # cuts the (S x D)-sized round-0 einsum several-fold
    k0 = min(n_psi, 64)
    FUc0 = jnp.concatenate([FUc[..., : k0 // 2], FUc[..., -k0 // 2:]],
                           axis=-1)
    # local mode starts from table shifts that are already sub-pixel (the
    # previous iteration's _refine_shifts), so the coarse absolute-shift
    # marginalization is pure waste there — and its (S, B, R, K) candidate
    # temps are the match program's HBM peak (measured 5.6 GiB at box 256
    # iteration 3, S=29: the round-5 e2e OOM #7). _refine_shifts' per-
    # particle grid still covers the full +/- shift_extent each round.
    first_round = 1 if (cone_deg is not None and rounds > 1) else 0
    for rnd in range(first_round, rounds):
        if rnd == 0:
            # unknown shift: marginalize the match over a coarse absolute
            # shift grid (exactly what the gather path's global search does
            # over its shift disk) + mild ring damping for the residual
            # within one coarse cell
            cand = coarse_shifts[:, None, :] + shifts[None]     # (S, B, 2)
            step = max(float(coarse_step), 1e-3)
            damp = jnp.exp(-0.5 * (2.0 * jnp.pi * radii_dev
                                   * (step / 2.0) / n) ** 2)
            w_round = wr * jnp.maximum(damp, 1e-4)[None, :]
            fuc, k_round, up_round = FUc0, k0, 1
        else:
            cand = shifts[None]                                 # (1, B, 2)
            w_round = wr
            fuc, k_round, up_round = FUc, n_psi, upsample
        # content shift s puts phase e^{-2 pi i g.s/n} on the spectrum;
        # multiply by the +phasor to undo each candidate
        phas = jax.vmap(lambda s: shift_phasor_polar(pts, s, n))(cand)
        Xc = Xp[None] * phas
        if k_round < n_psi:
            FX = jnp.fft.fft(jnp.conj(Xc) * w_round[None, :, :, None],
                             axis=-1)
            FA = jnp.concatenate(
                [FX[..., : k_round // 2], FX[..., -k_round // 2:]], axis=-1)
            scores, s_idx, d_idx, psi_idx = _match_harmonics(
                FA, w_round, Xc[0], fuc, u2sum, dir_mask, d_block, up_round,
                psi_prior(k_round * up_round))
        else:
            scores, s_idx, d_idx, psi_idx = _match(
                Xc, w_round, fuc, u2sum, dir_mask, d_block, up_round,
                psi_prior(k_round * up_round))
        shifts = jnp.take_along_axis(
            cand, s_idx[None, :, None], axis=0)[0]              # (B, 2)
        psi_deg = psi_idx.astype(jnp.float32) * (360.0 / (k_round * up_round))
        # ring values for the selected directions, recovered from the
        # psi-FFT table (U = conj(ifft(conj(FUc))); exact)
        U_sel = jnp.conj(jnp.fft.ifft(jnp.conj(FUc[d_idx]), axis=-1))
        shifts, scores = _refine_shifts(
            Xp, wr, U_sel, u2sum[d_idx], psi_deg, pts,
            shift_grid[None] + shifts[:, None, :], n)
    dirs = dir_table[d_idx]                               # (B, 2)
    poses = jnp.stack([
        dirs[:, 0], dirs[:, 1], psi_deg, shifts[:, 0], shifts[:, 1],
    ], axis=-1)
    return poses, scores


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

class FrmConfig:
    """Static search geometry + the (cached) polar interpolation matrix.

    Band-limited auto-crop: the search band only needs wavenumbers up to
    r_max, so particles are Fourier-cropped to n_crop ~ 2 (r_max + margin)
    before the polar transform — integer wavenumbers (and hence the ring
    radii) are preserved by the crop, the polar matrix is built on the
    cropped grid (without this a 256-px box needs a ~14 GB matrix), and
    shifts convert by n_crop/n. The reference volume stays full size (the
    bank gathers by wavenumber)."""

    def __init__(self, n, pixel_size, low_res=25.0, high_res=8.0,
                 angular_step=7.5, symmetry="C1", n_psi=None,
                 shift_extent=6.0, shift_step=1.0, rounds=3,
                 voltage_kv=300.0, cs_mm=2.7, amplitude_contrast=0.07,
                 upsample=4, wiener=0.1, crop_margin=8):
        from pyp_tpu.ops.refine3d import make_directions, make_shift_grid

        self.n_data = int(n)
        self.radii = make_rings(n, pixel_size, low_res, high_res)
        r_max = int(np.max(self.radii))
        self.n = min(int(n), int(np.ceil(
            (2 * r_max + max(0, int(crop_margin))) / 16.0)) * 16)
        self.crop = self.n / float(n)          # shift scale: data px -> crop px
        self.pixel_size = float(pixel_size) / self.crop
        self.n_psi = int(n_psi or default_n_psi(self.radii))
        self.ring_w = jnp.asarray(ring_weights(self.radii))
        self.directions = np.asarray(make_directions(angular_step, symmetry),
                                     dtype=np.float32)
        self.shift_grid = jnp.asarray(
            make_shift_grid(shift_extent, shift_step) * self.crop)
        self.rounds = int(rounds)
        self.upsample = int(upsample)
        # coarse shift-marginalization grid for the first match round
        self.coarse_step = max(float(shift_step), float(shift_extent) / 3.0)             * self.crop
        self.coarse_shifts = jnp.asarray(
            make_shift_grid(shift_extent, self.coarse_step / self.crop)
            * self.crop)
        self.wiener = float(wiener)
        self.voltage_kv = float(voltage_kv)
        self.cs_mm = float(cs_mm)
        self.amplitude_contrast = float(amplitude_contrast)
        # polar-transform mode: the dense Dirichlet matmul is exact and
        # MXU-perfect while W = (R*n_psi, n_crop^2) stays small, but both
        # its resident bytes and its FLOPs scale with the search band —
        # at box 256 the rhref schedule takes W from 0.85 GiB to 41 GiB
        # (and the host-side build to ~25 GB of c128 temps). Above the
        # threshold, switch to the oversampled-FFT gather sampler
        # (polar_sample_gather: no W at all). PYP_TPU_FRM_POLAR overrides
        # (matmul | gather | auto) for A/Bs.
        w_bytes = len(self.radii) * self.n_psi * self.n * self.n * 8
        mode = os.environ.get("PYP_TPU_FRM_POLAR", "auto").lower()
        self.polar_gather = (w_bytes > 512 * 2**20 if mode == "auto"
                             else mode == "gather")
        if self.polar_gather:
            self.W_re = jnp.zeros((1, 1), jnp.float32)
            self.W_im = jnp.zeros((1, 1), jnp.float32)
        else:
            W_re, W_im = polar_matrix(self.n, self.radii, self.n_psi)
            self.W_re = jnp.asarray(W_re)
            self.W_im = jnp.asarray(W_im)
        self.pts = jnp.asarray(polar_points(self.radii, self.n_psi))

    def crop_stack(self, stack):
        """Fourier-crop data images to the band-limited internal box."""
        if self.n == self.n_data:
            return jnp.asarray(stack)
        return _crop_jit(jnp.asarray(stack), self.n)

    def bank(self, Fref) -> FrmBank:
        # vol_pad inside the bank derives from the FULL volume box
        return FrmBank(Fref, self.directions, self.radii, self.n_psi,
                       self.n_data)


@functools.partial(jax.jit, static_argnames=("n_out",))
def _crop_jit(stack, n_out: int):
    from pyp_tpu.core.fft import fourier_crop

    return fourier_crop(stack, (n_out, n_out))


def frm_refine(stack, ctf_params, Fref, cfg: FrmConfig, bank: FrmBank = None,
               init_poses=None, prior_cone_deg=None, d_block: int = None,
               fsc_curve=None):
    """Full orientation + shift search for one particle batch.

    Returns (poses (B, 5) = (phi, theta, psi, sy, sx), scores (B,)).
    Alternates exhaustive orientation matching (all directions x all psi,
    MXU) with grid shift refinement. With init_poses + prior_cone_deg this
    is the 'local' mode (the reference's refine3d local search); without,
    the exhaustive global mode. The bank should be built once per
    refinement iteration and reused across batches. fsc_curve (optional)
    applies Cref SSNR ring weighting."""
    if bank is None:
        bank = cfg.bank(Fref)
    stack = cfg.crop_stack(stack)
    B = stack.shape[0]
    if d_block is None:
        # bound the (B, d_block, K*upsample) f32 score block to ~128 MB
        # (the complex _upsampled_ifft temps are ~4x that). The previous
        # formula divided by B*K*up//4 — 16x off its stated budget — which
        # let the block hit 256 MB+ and stacked multi-GiB complex temps at
        # box-256 late iterations.
        budget = 128 * 2 ** 20
        d_block = max(8, min(64, budget // max(1, 4 * B * cfg.n_psi
                                               * cfg.upsample)))
    if init_poses is not None:
        init_poses = jnp.asarray(init_poses)
        # pose convention stores the CENTERING translation s (content sits
        # at -s; what reconstruct._shift_correct and the gather engine
        # consume); the engine's internal shift variables are +content
        # offsets (the phase the search undoes) — negate at this boundary
        init_shifts = -init_poses[:, 3:5] * cfg.crop
        R_i = euler_to_matrix(init_poses[:, 0], init_poses[:, 1],
                              init_poses[:, 2])
        init_axes = R_i[:, 2, :]
        init_psi_deg = init_poses[:, 2]  # pose angles are degrees
        cone = float(prior_cone_deg) if prior_cone_deg is not None else None
    else:
        init_shifts = jnp.zeros((B, 2))
        init_axes = jnp.zeros((B, 3))
        init_psi_deg = jnp.zeros((B,))
        cone = None
    if fsc_curve is not None:
        ring_cref = jnp.asarray(
            ring_weights_from_fsc(fsc_curve, cfg.radii, cfg.n_data))
    else:
        ring_cref = jnp.ones(len(cfg.radii), dtype=jnp.float32)
    _args = (
        stack, jnp.asarray(ctf_params), cfg.W_re, cfg.W_im, cfg.pts,
        cfg.ring_w, bank.FUc, bank.u2sum,
        jnp.asarray(bank.directions), jnp.asarray(bank.axes),
        cfg.shift_grid, cfg.coarse_shifts, init_shifts, init_axes,
        init_psi_deg, ring_cref,
        cfg.n, cfg.n_psi, cfg.pixel_size, cfg.voltage_kv, cfg.cs_mm,
        cfg.amplitude_contrast, cfg.rounds, int(d_block), cfg.upsample,
        cone, cfg.coarse_step, cfg.wiener,
        bool(getattr(cfg, "polar_gather", False)),
    )
    from pyp_tpu.utils import memwatch

    memwatch.observe("frm_match", _frm_refine_jit, _args)
    poses, scores = _frm_refine_jit(*_args)
    # internal shifts are +content offsets; flip to the pose convention
    # (centering translation = -content) and rescale crop -> data pixels.
    # Before this boundary flip the FRM->reconstruction path doubled every
    # particle's displacement (measured: 64-particle probe, FRM poses into
    # rec.reconstruct, cc 0.08 as-was vs 0.83 flipped) — the "15 A
    # intermediate-iteration plateau" in docs/BENCH_E2E.md was largely this,
    # not lattice quantization.
    poses = poses.at[:, 3:5].multiply(-1.0 / cfg.crop)
    return poses, scores


@functools.partial(jax.jit, static_argnames=("d_block",))
def _score_directions_jit(Xp_cands, wr, FUc, u2sum, d_block: int):
    """Per-(particle, direction) best-over-(psi, shift-candidate) scores.

    Xp_cands: (S, B, R, P) polar spectra with each candidate shift phasor
    applied (S=1 when shifts are known). Returns (scores (B, D),
    psi_idx (B, D), s_idx (B, D)) — the marginal score matrix the
    soft-assignment paths (ab initio / classification) consume, with each
    entry maximized over in-plane angle AND the shift grid."""
    S, B, R, K = Xp_cands.shape
    A = jnp.conj(Xp_cands) * wr[None, :, :, None]
    FA = jnp.fft.fft(A, axis=-1)                         # (S, B, R, K)
    xnorm2 = jnp.sum(wr[:, :, None] * jnp.abs(Xp_cands[0]) ** 2,
                     axis=(1, 2))
    D = FUc.shape[0]

    def one_block(d0):
        fu = jax.lax.dynamic_slice_in_dim(FUc, d0, d_block, axis=0)
        u2 = jax.lax.dynamic_slice_in_dim(u2sum, d0, d_block, axis=0)
        den = jnp.sqrt(jnp.maximum(wr @ u2.T, 1e-20) * xnorm2[:, None])
        best = jnp.full((B, d_block), -jnp.inf)
        pidx = jnp.zeros((B, d_block), jnp.int32)
        sidx = jnp.zeros((B, d_block), jnp.int32)
        for s in range(S):  # static unroll; running max bounds memory
            num = jnp.real(jnp.fft.ifft(
                jnp.einsum("brk,drk->bdk", FA[s], fu), axis=-1))
            sc = num / den[..., None]                    # (B, d, K)
            pi = jnp.argmax(sc, axis=-1)
            val = jnp.take_along_axis(sc, pi[..., None], -1)[..., 0]
            upd = val > best
            pidx = jnp.where(upd, pi.astype(jnp.int32), pidx)
            sidx = jnp.where(upd, s, sidx)
            best = jnp.maximum(best, val)
        return best, pidx, sidx

    n_blocks = D // d_block
    scores, psis, sids = jax.lax.map(
        lambda i: one_block(i * d_block), jnp.arange(n_blocks))
    # (n_blocks, B, d_block) -> (B, D)
    scores = jnp.moveaxis(scores, 0, 1).reshape(B, D)
    psis = jnp.moveaxis(psis, 0, 1).reshape(B, D)
    sids = jnp.moveaxis(sids, 0, 1).reshape(B, D)
    return scores, psis, sids


def frm_score_directions(stack, ctf_params, cfg: FrmConfig, bank: FrmBank,
                         shifts=None, fsc_curve=None, d_block: int = 64,
                         marginalize_shifts: bool = False):
    """Score every particle against every bank direction (best psi each):
    (scores (B, D), psi_deg (B, D), shifts_best (B, D, 2)). The
    soft-assignment primitive for marginalized ab initio / classification.

    shifts: known per-particle estimates applied before scoring.
    marginalize_shifts: additionally maximize each (b, d) entry over the
    config's coarse shift grid — for unaligned picks where shift estimates
    don't exist yet (early ab initio rounds); shifts_best then carries the
    winning candidate per direction (data pixels)."""
    stack = cfg.crop_stack(stack)
    B = stack.shape[0]
    D = bank.FUc.shape[0]
    Xp, wr = _restore_polar(
        stack, jnp.asarray(ctf_params), cfg.W_re, cfg.W_im, cfg.pts,
        cfg.ring_w, cfg.n, cfg.n_psi, cfg.pixel_size, cfg.voltage_kv,
        cfg.cs_mm, cfg.amplitude_contrast, cfg.wiener,
        bool(getattr(cfg, "polar_gather", False)))
    if fsc_curve is not None:
        wr = wr * jnp.asarray(
            ring_weights_from_fsc(fsc_curve, cfg.radii, cfg.n_data))[None]
    # incoming shifts use the pose convention (centering translation);
    # internal candidates are +content offsets — negate at the boundary
    base = jnp.zeros((B, 2)) if shifts is None \
        else -jnp.asarray(shifts) * cfg.crop
    if marginalize_shifts:
        cand = cfg.coarse_shifts[:, None, :] + base[None]    # (S, B, 2)
    else:
        cand = base[None]                                    # (1, B, 2)
    phas = jax.vmap(lambda s: shift_phasor_polar(cfg.pts, s, cfg.n))(cand)
    Xp_cands = Xp[None] * phas
    d_block = min(d_block, D)
    pad = (-D) % d_block
    FUc, u2sum = bank.FUc, bank.u2sum
    if pad:
        FUc = jnp.pad(FUc, ((0, pad), (0, 0), (0, 0)))
        u2sum = jnp.pad(u2sum, ((0, pad), (0, 0)))
    scores, psis, sids = _score_directions_jit(Xp_cands, wr, FUc, u2sum,
                                               d_block)
    sids = sids[:, :D]                                       # (B, D)
    # winning absolute shift per (particle, direction), data pixels, in
    # the POSE convention (internal candidates are +content offsets)
    cand_bd = jnp.transpose(cand, (1, 0, 2))                 # (B, S, 2)
    shifts_best = -jnp.take_along_axis(
        cand_bd, sids[..., None], axis=1) / cfg.crop         # (B, D, 2)
    return (scores[:, :D],
            psis[:, :D].astype(jnp.float32) * (360.0 / cfg.n_psi),
            shifts_best)


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_psi", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "wiener", "polar_gather"),
)
def _restore_polar(stack, ctf_params, W_re, W_im, pts, ring_w, n: int,
                   n_psi: int, pixel_size: float, voltage_kv: float,
                   cs_mm: float, amplitude_contrast: float, wiener: float,
                   polar_gather: bool = False):
    """Wiener-restored polar spectra + per-particle ring weights (the
    shared front half of _frm_refine_jit, exposed for the scoring path)."""
    if polar_gather:
        Xp, conf_mean = polar_sample_gather(
            stack, ctf_params, pts, n, pixel_size, voltage_kv, cs_mm,
            amplitude_contrast, wiener)
        return Xp, ring_w[None, :] * conf_mean
    B = stack.shape[0]
    X = image_to_fourier_full(stack)
    Cg = ctf_model.ctf_2d(
        (n, n), pixel_size, ctf_params[:, 0], ctf_params[:, 1],
        ctf_params[:, 2], voltage_kv, cs_mm, w=amplitude_contrast,
        phase_shift_rad=ctf_params[:, 3], rfft=False)
    conf = Cg * Cg / (Cg * Cg + wiener)
    Xw = X * (Cg / (Cg * Cg + wiener))
    Xr = jnp.real(Xw).reshape(B, -1)
    Xi = jnp.imag(Xw).reshape(B, -1)
    R = ring_w.shape[0]
    Xp = jax.lax.complex(
        Xr @ W_re.T - Xi @ W_im.T,
        Xr @ W_im.T + Xi @ W_re.T).reshape(B, R, n_psi)
    conf_rings = (conf.reshape(B, -1) @ W_re.T).reshape(B, R, n_psi)
    wr = ring_w[None, :] * jnp.clip(jnp.mean(conf_rings, axis=-1), 0.0, 1.0)
    return Xp, wr


def ring_weights_from_fsc(fsc_curve, radii, n: int):
    """Cref = sqrt(2C/(1+C)) SSNR weights at the ring radii (FREALIGN's
    statistics weighting, the polar analog of
    refine3d.shell_weights_from_fsc).

    n MUST be the grid the curve was measured on (the DATA box, not the
    auto-crop box): ring radii are data wavenumbers — preserved by Fourier
    crop — so indexing the curve as a fraction of the crop grid read shells
    a crop-factor too high (measured: in-band rings got Cref 0.24 instead
    of 1.0 at 256 -> 80 crop)."""
    curve = np.clip(np.asarray(fsc_curve, dtype=np.float64), 0.0, 1.0)
    n_bins = len(curve)
    r = np.asarray(radii, dtype=np.float64) / n  # cycles/px
    idx = np.clip((r / 0.5 * n_bins).astype(int), 0, n_bins - 1)
    cref = np.sqrt(2.0 * curve / (1.0 + curve))
    return cref[idx].astype(np.float32)


_CFG_CACHE: dict = {}


def get_config(n, pixel_size, **kw) -> FrmConfig:
    """FrmConfig factory with caching — the polar matrix build is an
    O(n^2 * R * n_psi) host computation worth reusing across refinement
    iterations with the same geometry."""
    key = (int(n), float(pixel_size),
           tuple(sorted((k, float(v) if isinstance(v, (int, float)) else v)
                        for k, v in kw.items())))
    if key not in _CFG_CACHE:
        if len(_CFG_CACHE) > 8:  # bound host+device memory
            _CFG_CACHE.clear()
        _CFG_CACHE[key] = FrmConfig(n, pixel_size, **kw)
    return _CFG_CACHE[key]


def to_refine_result(poses, scores, n_band_points: int = 1024):
    """Adapt (poses, scores) to the RefineResult record the table layer
    consumes (FREALIGN-compatible SCORE/LOGP/SIGMA columns)."""
    from pyp_tpu.ops.refine3d import RefineResult

    scores = jnp.clip(scores, -1.0, 1.0)
    sigma = jnp.sqrt(jnp.maximum(1.0 - scores**2, 1e-6))
    logp = -0.5 * n_band_points * jnp.log(jnp.maximum(sigma, 1e-6))
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
