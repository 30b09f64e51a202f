"""2D classification / alignment — refine2d + merge2d equivalents.

Replaces the reference's wrapped frealignx `refine2d`/`merge2d` binaries
(stdin contracts /root/reference/src/pyp/refine/frealign/frealign.py:4066-4095,
:4284; used by the streaming 2D daemon, stream/fyp_daemon.py:406). Iterative
multi-reference alignment:

  E-step (engine="polar", default): the ops/frm machinery — particles are
  CTF-Wiener-restored and polar-transformed once per classification, class
  averages become polar tables by two matmuls per iteration, and all
  (class, psi, shift) scores come from FFT correlation along the ring angle
  (no spectrum gathers). engine="gather" keeps the original formulation:
  the particle spectrum sampled at psi-rotated band-limited points, scores
  as matmuls, shifts as separable phasors.

  M-step: best-aligned particles are rotated/shifted in real space and
  accumulated into CTF-weighted class sums:
      avg_k = sum_i w_ik CTF_i X_i / (sum_i w_ik CTF_i^2 + wiener)

Everything is batched and jit-compiled; class count and grids are static.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.ops.fourier_slice import (
    fourier_to_image,
    gather_2d_hermitian,
    image_to_fourier,
)
from pyp_tpu.ops.refine3d import (
    _ctf_at_points,
    _rotate_points_2d,
    _shift_phasors,
    make_mask_points,
    make_shift_grid,
)
from pyp_tpu.ops.reconstruct import _ctf_grids, _shift_correct


class Classify2DResult(NamedTuple):
    class_avgs: jax.Array    # (K, n, n)
    assignments: jax.Array   # (B,) int
    psi: jax.Array           # (B,) degrees
    shift_y: jax.Array       # (B,) pixels
    shift_x: jax.Array
    scores: jax.Array        # (B,)
    occupancy: jax.Array     # (K,) particles per class


def _rotate_images(imgs, psi_deg):
    """Rotate images by psi (degrees, about the center pixel n//2) with
    bilinear interpolation. Positive psi matches the projection convention
    (a particle aligned at psi is rotated by -psi to match the reference)."""
    n = imgs.shape[-1]
    c = n // 2
    yy, xx = jnp.meshgrid(jnp.arange(n, dtype=jnp.float32) - c,
                          jnp.arange(n, dtype=jnp.float32) - c, indexing="ij")
    a = jnp.deg2rad(psi_deg)
    co, si = jnp.cos(a), jnp.sin(a)

    def one(img, co1, si1):
        xs = co1 * xx - si1 * yy + c
        ys = si1 * xx + co1 * yy + c
        return jax.scipy.ndimage.map_coordinates(img, [ys, xs], order=1, mode="constant")

    return jax.vmap(one)(imgs, co, si)


@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "voltage_kv", "cs_mm", "amplitude_contrast"),
)
def align_to_classes(
    stack, ctf_params, class_avgs, psis, mask_pts, shift_grid,
    n: int, pixel_size: float,
    voltage_kv: float = 300.0, cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
):
    """E-step: best (class, psi, shift) per particle.

    Returns (assignment (B,), psi (B,), shifts (B, 2), score (B,))."""
    B = stack.shape[0]
    P = psis.shape[0]
    G = mask_pts.shape[0]
    K = class_avgs.shape[0]
    img_pad = 2

    X = image_to_fourier(stack, pad=img_pad)
    Favg = image_to_fourier(class_avgs)  # (K, n, nxf)
    u = jax.vmap(lambda F: gather_2d_hermitian(F, jnp.asarray(mask_pts)))(Favg)  # (K, G)
    u2 = jnp.abs(u) ** 2

    rot_pts = jax.vmap(lambda p: _rotate_points_2d(jnp.asarray(mask_pts), p))(psis)

    def particle_values(Xi, cp):
        def per_psi(pts):
            xv = gather_2d_hermitian(Xi, pts, scale=float(img_pad))
            c = _ctf_at_points(pts, n, pixel_size, cp[0], cp[1], cp[2],
                               voltage_kv, cs_mm, amplitude_contrast, cp[3])
            return jnp.conj(xv) * c, c * c, jnp.abs(xv) ** 2
        return jax.vmap(per_psi)(rot_pts)

    v, c2, x2 = jax.vmap(particle_values)(X, ctf_params)
    v = v.reshape(B * P, G)
    c2 = c2.reshape(B * P, G)
    xnorm = jnp.sqrt(jnp.sum(x2.reshape(B * P, G), axis=1) + 1e-12)
    cnorm = jnp.sqrt(c2 @ u2.T + 1e-12)  # (BP, K)
    E = _shift_phasors(jnp.asarray(mask_pts), jnp.asarray(shift_grid), n)

    uT = u.T

    def scan_shift(carry, s_idx):
        best_score, best_k, best_s = carry
        vs = v * E[:, s_idx][None, :]
        score = jnp.real(vs @ uT) / (cnorm * xnorm[:, None])
        k_idx = jnp.argmax(score, axis=1)
        sc = jnp.take_along_axis(score, k_idx[:, None], axis=1)[:, 0]
        better = sc > best_score
        return (
            jnp.where(better, sc, best_score),
            jnp.where(better, k_idx, best_k),
            jnp.where(better, s_idx, best_s),
        ), None

    S = shift_grid.shape[0]
    init = (jnp.full((B * P,), -jnp.inf), jnp.zeros((B * P,), jnp.int32),
            jnp.zeros((B * P,), jnp.int32))
    (score_bp, k_bp, s_bp), _ = jax.lax.scan(scan_shift, init, jnp.arange(S))

    score_bp = score_bp.reshape(B, P)
    psi_idx = jnp.argmax(score_bp, axis=1)
    best_score = jnp.take_along_axis(score_bp, psi_idx[:, None], axis=1)[:, 0]
    flat = psi_idx + jnp.arange(B) * P
    k_best = k_bp[flat]
    s_best = s_bp[flat]
    psi = jnp.asarray(psis)[psi_idx]
    s_rot = jnp.asarray(shift_grid)[s_best]
    a = jnp.deg2rad(psi)
    co, si = jnp.cos(a), jnp.sin(a)
    sx = co * s_rot[:, 1] - si * s_rot[:, 0]
    sy = si * s_rot[:, 1] + co * s_rot[:, 0]
    return k_best, psi, jnp.stack([sy, sx], 1), best_score


class Polar2D:
    """Cached polar-matching tables for 2D classification (the 2D analog of
    ops/frm: exact-kernel polar resampling on the MXU + psi-FFT correlation
    — no per-(particle, psi) spectrum gathers in the E-step)."""

    _CACHE: dict = {}

    def __init__(self, n, pixel_size, low_res, high_res, shift_extent,
                 shift_step, voltage_kv, cs_mm, amplitude_contrast,
                 wiener: float = 0.1):
        from pyp_tpu.ops import frm
        from pyp_tpu.ops.refine3d import make_shift_grid

        self.n = int(n)
        self.pixel_size = float(pixel_size)
        self.radii = frm.make_rings(n, pixel_size, low_res, high_res)
        self.n_psi = frm.default_n_psi(self.radii)
        self.ring_w = jnp.asarray(frm.ring_weights(self.radii))
        W_re, W_im = frm.polar_matrix(n, self.radii, self.n_psi)
        self.W_re = jnp.asarray(W_re)
        self.W_im = jnp.asarray(W_im)
        self.pts = jnp.asarray(frm.polar_points(self.radii, self.n_psi))
        self.coarse_step = max(float(shift_step), float(shift_extent) / 3.0)
        self.coarse_shifts = jnp.asarray(
            make_shift_grid(shift_extent, self.coarse_step))
        self.fine_shifts = jnp.asarray(
            make_shift_grid(self.coarse_step, float(shift_step)))
        self.voltage_kv = float(voltage_kv)
        self.cs_mm = float(cs_mm)
        self.amplitude_contrast = float(amplitude_contrast)
        self.wiener = float(wiener)

    @classmethod
    def get(cls, *key):
        if key not in cls._CACHE:
            if len(cls._CACHE) > 8:
                cls._CACHE.clear()
            cls._CACHE[key] = cls(*key)
        return cls._CACHE[key]

    def restore(self, stack, ctf_params):
        """Wiener CTF-restored polar spectra + ring weights — computed ONCE
        per classification (class averages change per iteration, particles don't)."""
        from pyp_tpu.ops import frm

        return frm._restore_polar(
            jnp.asarray(stack), jnp.asarray(ctf_params), self.W_re,
            self.W_im, self.pts, self.ring_w, self.n, self.n_psi,
            self.pixel_size, self.voltage_kv, self.cs_mm,
            self.amplitude_contrast, self.wiener)


@functools.partial(jax.jit, static_argnames=("n_rings",))
def _class_polar_tables(class_avgs, W_re, W_im, n_rings: int):
    """Polar tables of the (CTF-free) class averages: FUc for the psi
    correlation + per-ring power sums."""
    from pyp_tpu.ops.frm import image_to_fourier_full

    K = class_avgs.shape[0]
    Xa = image_to_fourier_full(class_avgs)
    Xr = jnp.real(Xa).reshape(K, -1)
    Xi = jnp.imag(Xa).reshape(K, -1)
    Up = jax.lax.complex(
        Xr @ W_re.T - Xi @ W_im.T,
        Xr @ W_im.T + Xi @ W_re.T).reshape(K, n_rings, -1)
    FUc = jnp.conj(jnp.fft.fft(jnp.conj(Up), axis=-1))
    u2sum = jnp.sum(jnp.abs(Up) ** 2, axis=-1)
    return Up, FUc, u2sum


def align_to_classes_polar(Xp, wr, class_avgs, p2d: Polar2D):
    """E-step on the polar machinery: all (class, psi, shift) at once.

    Xp/wr from Polar2D.restore (particle side, computed once per
    classification). Returns (assignment, psi_deg, shifts (B, 2), score)
    in the same conventions as align_to_classes."""
    from pyp_tpu.ops import frm

    B = Xp.shape[0]
    Up, FUc, u2sum = _class_polar_tables(
        jnp.asarray(class_avgs), p2d.W_re, p2d.W_im, len(p2d.radii))
    K = Up.shape[0]
    d_block = K  # class counts are small; one block
    # coarse shift marginalization (same scheme as frm round 0)
    cand = jnp.broadcast_to(p2d.coarse_shifts[:, None, :],
                            (p2d.coarse_shifts.shape[0], B, 2))
    phas = jax.vmap(lambda s: frm.shift_phasor_polar(p2d.pts, s, p2d.n))(cand)
    scores, s_idx, k_idx, psi_idx = frm._match(
        Xp[None] * phas, wr, FUc, u2sum, jnp.zeros((B, K)), d_block,
        upsample=4)
    shifts = jnp.take_along_axis(cand, s_idx[None, :, None], axis=0)[0]
    psi_deg = psi_idx.astype(jnp.float32) * (360.0 / (p2d.n_psi * 4))
    # fine shift grid around the coarse winner
    shifts, scores = frm._refine_shifts(
        Xp, wr, Up[k_idx], u2sum[k_idx], psi_deg, p2d.pts,
        p2d.fine_shifts[None] + shifts[:, None, :], p2d.n)
    # frm's shift is the content displacement; the M-step's _shift_correct
    # expects the correction to APPLY, i.e. the negation
    return k_idx, psi_deg, -shifts, scores


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_classes", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast"),
)
def update_class_averages(
    stack, ctf_params, assignments, psi, shifts, weights,
    n: int, n_classes: int, pixel_size: float,
    voltage_kv: float = 300.0, cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07, wiener: float = 10.0,
):
    """M-step (merge2d): CTF-weighted class sums from aligned particles."""
    # align: apply recorded shift, then resample in the class frame:
    # class(y) = particle_shifted(Rz(psi) y)  (see E-step derivation)
    X = image_to_fourier(stack)
    X = _shift_correct(X, shifts, n)
    aligned = fourier_to_image(X, n)
    aligned = _rotate_images(aligned, psi)
    Xa = image_to_fourier(aligned)
    ctfs = _ctf_grids(n, pixel_size, ctf_params, voltage_kv, cs_mm,
                      amplitude_contrast)
    num = jnp.zeros((n_classes,) + Xa.shape[1:], dtype=Xa.dtype)
    den = jnp.zeros((n_classes,) + Xa.shape[1:], dtype=jnp.float32)
    num = num.at[assignments].add(weights[:, None, None] * ctfs * Xa)
    den = den.at[assignments].add(weights[:, None, None] * ctfs * ctfs)
    avgs = fourier_to_image(num / (den + wiener), n)
    occ = jnp.zeros(n_classes).at[assignments].add(weights)
    return avgs, occ


def classify2d(
    stack, ctf_params, n_classes: int, pixel_size: float,
    iters: int = 10, psi_step: float = 15.0,
    low_res: float = 100.0, high_res: float = 10.0,
    shift_extent: float = 5.0, shift_step: float = 2.0,
    voltage_kv: float = 300.0, cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07, seed: int = 0,
    engine: str = "polar", wiener: float = 10.0,
    init_avgs=None,
) -> Classify2DResult:
    """Full 2D classification: random init -> alternating E/M steps.

    init_avgs: warm-start class averages (K, n, n) — skips random seeding
    (the staged class2d protocol's seeded/refinement stages and the
    streaming daemon's incremental updates).

    engine="polar" (default) runs the E-step on the MXU polar machinery
    (particle polar transform once, class tables per iteration, all psi by
    FFT correlation); engine="gather" keeps the per-(particle, psi)
    spectrum-gather path."""
    stack = jnp.asarray(stack)
    ctf_params = jnp.asarray(ctf_params)
    B, n, _ = stack.shape
    rng = np.random.RandomState(seed)
    weights = jnp.ones(B)
    if init_avgs is not None:
        avgs = jnp.asarray(init_avgs)
        init_assign = jnp.zeros(B, dtype=jnp.int64)
    else:
        # seed each class from a small disjoint random subset (a symmetric
        # everyone-everywhere init would make all averages identical and EM
        # could never break the tie — cisTEM seeds from random particles too)
        perm = rng.permutation(B)
        seeds_per_class = max(1, min(3, B // n_classes))
        init_assign = np.full(B, -1, dtype=np.int64)
        for k in range(n_classes):
            init_assign[perm[k * seeds_per_class:(k + 1) * seeds_per_class]] = k
        seed_mask = init_assign >= 0
        avgs, occ = update_class_averages(
            stack, ctf_params, jnp.asarray(np.maximum(init_assign, 0)),
            jnp.zeros(B), jnp.zeros((B, 2)),
            jnp.asarray(seed_mask.astype(np.float32)), n, n_classes, pixel_size,
            voltage_kv, cs_mm, amplitude_contrast, wiener=wiener,
        )
        init_assign = jnp.asarray(np.maximum(init_assign, 0))
    psis = np.arange(0.0, 360.0, psi_step, dtype=np.float32)
    mask_pts = make_mask_points(n, pixel_size, low_res, high_res)
    shift_grid = make_shift_grid(shift_extent, shift_step)

    assign = init_assign
    psi = jnp.zeros(B)
    shifts = jnp.zeros((B, 2))
    scores = jnp.zeros(B)
    if engine == "polar":
        p2d = Polar2D.get(n, pixel_size, low_res, high_res, shift_extent,
                          shift_step, voltage_kv, cs_mm, amplitude_contrast)
        Xp, wr = p2d.restore(stack, ctf_params)
    for _ in range(iters):
        if engine == "polar":
            assign, psi, shifts, scores = align_to_classes_polar(
                Xp, wr, avgs, p2d)
        else:
            assign, psi, shifts, scores = align_to_classes(
                stack, ctf_params, avgs, jnp.asarray(psis), mask_pts,
                shift_grid, n, pixel_size, voltage_kv, cs_mm,
                amplitude_contrast,
            )
        avgs, occ = update_class_averages(
            stack, ctf_params, assign, psi, shifts, weights, n, n_classes,
            pixel_size, voltage_kv, cs_mm, amplitude_contrast, wiener=wiener,
        )
    return Classify2DResult(
        class_avgs=avgs, assignments=assign, psi=psi,
        shift_y=shifts[:, 0], shift_x=shifts[:, 1], scores=scores,
        occupancy=occ,
    )


def classify2d_staged(
    stack, ctf_params, params: dict, pixel_size: float,
    voltage_kv: float = 300.0, cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
) -> Classify2DResult:
    """The reference's staged class2d protocol (pyp_config [tabs.class2d],
    driven by fyp_daemon): three EM phases over growing particle subsets —
    ab initio on up to class2d_max_ab_initio particles at class2d_rhini,
    a seeded phase on up to class2d_max_seeded at the intermediate band,
    and a refinement phase on up to class2d_max_refinement at class_rhcls —
    each warm-starting from the previous phase's class averages.
    class2d_fraction caps the random subset per phase; class2d_bin /
    class2d_box classify on a reduced grid (Fourier crop) for speed, with
    the final E-step assignment computed on the reduced grid too (the
    averages are what matter downstream)."""
    import jax.numpy as jnp

    from pyp_tpu.core.fft import fourier_crop

    stack = np.asarray(stack, dtype=np.float32)
    B, n_full, _ = stack.shape
    n_classes = int(params.get("class_num") or 20)
    rhini = float(params.get("class2d_rhini") or 40.0)
    rhref = float(params.get("class_rhcls") or 8.0)
    rlref = float(params.get("class_rlcls") or 100.0)
    frac = float(params.get("class2d_fraction") or 1.0)
    seed = int(params.get("class_seed") or 0)
    rng = np.random.RandomState(seed)

    # classification grid: class2d_box/class2d_bin pick the working box
    box = int(params.get("class2d_box") or 0)
    binf = int(params.get("class2d_bin") or 1)
    n_work = n_full
    if box and box < n_full:
        n_work = box
    elif binf > 1:
        n_work = max(32, n_full // binf)
    n_work -= n_work % 2
    if n_work < n_full:
        work_stack = np.asarray(
            fourier_crop(jnp.asarray(stack), (n_work, n_work)),
            dtype=np.float32)
        pixel_work = pixel_size * n_full / n_work
    else:
        work_stack, pixel_work = stack, pixel_size

    # mask radius (class2d_rad, Å)
    rad = float(params.get("class2d_rad") or 0.0)
    if rad > 0:
        from pyp_tpu.core.filters import soft_circular_mask

        m = np.asarray(soft_circular_mask(n_work, rad / pixel_work, 4.0))
        work_stack = work_stack * m[None]

    stages = (
        (int(params.get("class2d_max_ab_initio") or 10000),
         int(params.get("class2d_iters_init") or 15), rhini),
        (int(params.get("class2d_max_seeded") or 50000),
         int(params.get("class2d_iters_seed") or 10),
         0.5 * (rhini + rhref)),
        (int(params.get("class2d_max_refinement") or 100000),
         int(params.get("class2d_iters_refine") or 3), rhref),
    )
    avgs = None
    res = None
    for cap, iters, band in stages:
        n_use = min(B, cap, max(n_classes * 2, int(round(B * frac))))
        idx = (np.arange(B) if n_use >= B
               else rng.choice(B, size=n_use, replace=False))
        res = classify2d(
            work_stack[idx], np.asarray(ctf_params)[idx], n_classes,
            pixel_work, iters=iters, low_res=rlref,
            high_res=max(band, 2.5 * pixel_work),
            psi_step=float(params.get("class_psi_step") or 15.0),
            shift_extent=float(params.get("class_shift") or 5.0),
            shift_step=float(params.get("class_shift_step") or 2.0),
            voltage_kv=voltage_kv, cs_mm=cs_mm,
            amplitude_contrast=amplitude_contrast, seed=seed,
            engine=str(params.get("class_engine") or "polar"),
            wiener=float(params.get("class_wiener") or 10.0),
            init_avgs=avgs)
        avgs = res.class_avgs
    if len(np.asarray(res.assignments)) != B:
        # final pass assigned a subset: run ONE assignment E-step over all
        # particles against the final averages
        res = classify2d(
            work_stack, np.asarray(ctf_params), n_classes, pixel_work,
            iters=1, low_res=rlref, high_res=max(rhref, 2.5 * pixel_work),
            psi_step=float(params.get("class_psi_step") or 15.0),
            shift_extent=float(params.get("class_shift") or 5.0),
            shift_step=float(params.get("class_shift_step") or 2.0),
            voltage_kv=voltage_kv, cs_mm=cs_mm,
            amplitude_contrast=amplitude_contrast, seed=seed,
            engine=str(params.get("class_engine") or "polar"),
            wiener=float(params.get("class_wiener") or 10.0),
            init_avgs=avgs)
    return res
