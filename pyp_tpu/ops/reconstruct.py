"""Fourier-gridding insertion reconstruction — reconstruct3d/merge3d
equivalents.

Replaces the reference's wrapped cisTEM2 `reconstruct3d` (stdin contract
/root/reference/src/pyp/refine/frealign/frealign.py:1780-1824) and
`merge3d`/`local_merge3d` (frealign.py:1879, :1975): particle spectra are
CTF-weighted and spread onto the central slice of a 3D Fourier accumulator
pair (numerator, CTF^2 denominator); shards accumulate independently (the
reference's per-job "dump files") and merge by summation — on a device mesh
this is one psum over ICI (pyp_tpu.parallel), across hosts it is an
accumulator file merge. Half maps come from even/odd particle splits; the
Wiener-regularized quotient with trilinear gridding correction yields the
map; FSC/SSNR statistics come from pyp_tpu.core.fsc.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core import fsc as fsc_mod
from pyp_tpu.core.geometry import apply_symmetry_matrices, euler_to_matrix
from pyp_tpu.ops.fourier_slice import (
    DEFAULT_PAD,
    image_to_fourier,
    reconstruct_from_accumulators,
)
from pyp_tpu.ops.refine3d import _ctf_at_points  # CTF on arbitrary points


class Accumulators(NamedTuple):
    num1: jax.Array  # (n, n, n//2+1) complex — half 1 numerator
    den1: jax.Array  # (n, n, n//2+1) real
    num2: jax.Array
    den2: jax.Array


class Reconstruction(NamedTuple):
    volume: jax.Array      # combined map (n, n, n)
    half1: jax.Array
    half2: jax.Array
    fsc: jax.Array         # (n_shells,)
    freqs: jax.Array       # shell centers (cycles/pixel)


def _ctf_grids(n, pixel_size, ctf_params, voltage_kv, cs_mm, w):
    """Full-plane CTF images for a batch of particles: (B, n, n//2+1)."""
    ky = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)
    kx = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    pts = jnp.stack(jnp.meshgrid(ky, kx, indexing="ij"), axis=-1)  # (n, nxf, 2)

    def one(cp):
        return _ctf_at_points(pts, n, pixel_size, cp[0], cp[1], cp[2],
                              voltage_kv, cs_mm, w, cp[3])

    return jax.vmap(one)(ctf_params)


def _chi_grids(n, pixel_size, ctf_params, voltage_kv, cs_mm, w):
    """Total aberration phase grids chi_tot (B, n, n//2+1) such that
    CTF = -sin(chi_tot) — the branch phase for the reference-based Ewald
    insertion (insert_slices_halves chi argument)."""
    from pyp_tpu.core import ctf as ctf_model

    ky = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)
    kx = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    pts = jnp.stack(jnp.meshgrid(ky, kx, indexing="ij"), axis=-1)
    amp = float(np.arctan2(w, np.sqrt(max(1.0 - w * w, 0.0))))

    def one(cp):
        gy = pts[..., 0] / (n * pixel_size)
        gx = pts[..., 1] / (n * pixel_size)
        g = jnp.sqrt(gy * gy + gx * gx)
        azim = jnp.arctan2(gy, gx)
        df = ctf_model.defocus_at_azimuth(cp[0], cp[1], cp[2], azim)
        return ctf_model.chi(g, df, voltage_kv, cs_mm, cp[3]) + amp

    return jax.vmap(one)(ctf_params)


def _shift_correct(X, shifts, n):
    """Apply refined shifts: X * exp(-2*pi*i g.s / n) (centers particles)."""
    ky = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32).reshape(n, 1)
    kx = jnp.arange(n // 2 + 1, dtype=jnp.float32).reshape(1, -1)
    ph = (
        -2.0 * jnp.pi
        * (ky[None] * shifts[:, 0, None, None] + kx[None] * shifts[:, 1, None, None])
        / n
    )
    return X * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "symmetry", "pad", "gridding",
                     "iewald", "lblur"),
    donate_argnames=("prev",),
)
def accumulate(
    stack,               # (B, n, n) particle images
    poses,               # (B, 5) (phi, theta, psi, sy, sx)
    ctf_params,          # (B, 4) (df1, df2, angast, phase)
    subset,              # (B,) int: 0 -> half 1, 1 -> half 2
    weights,             # (B,) per-particle weight (occ/100 * score weight)
    n: int,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    symmetry: str = "C1",
    pad: int = DEFAULT_PAD,
    prev: Accumulators | None = None,
    doses=None,
    gridding: str = "trilinear",
    iewald: int = 0,
    lblur=None,
    ref_fourier=None,
) -> Accumulators:
    """Insert a batch of particles into (possibly pre-existing) accumulators.

    `doses` (B,) cumulative exposures (e-/Å²) apply the Grant-Grigorieff
    damage envelope to each particle's CTF weight — the reconstruct3d dose
    weighting block (SURVEY §A.2).

    `iewald`: FREALIGN Ewald-sphere correction (reference reconstruct tab,
    frealign.py IEWALD card). +-1 = simple curved insertion (handedness-
    invariant: both branches insert explicitly); +-2 = reference-based
    unmixing (requires `ref_fourier`, the padded spectrum of the current
    reference map; sign = handedness, which now matters). +-2 without a
    reference degrades to the simple mode.

    `lblur`: likelihood blurring (the reference's reconstruct3d `blurring`
    card, frealign.py:1772 / reconstruct_lblur + lblur_nrot params): a
    (offsets_deg, rel_weights) pair — each particle inserts at every psi
    offset around its refined in-plane angle with the given relative
    weight (cisTEM blurs over the orientation likelihood; here the weights
    are a Gaussian over the blur window, which matches cisTEM's behaviour
    in the well-converged regime where the likelihood is unimodal)."""
    X = image_to_fourier(stack)
    X = _shift_correct(X, poses[:, 3:5], n)
    ctfs = _ctf_grids(n, pixel_size, ctf_params, voltage_kv, cs_mm, amplitude_contrast)
    if doses is not None:
        from pyp_tpu.core.ctf import dose_weight

        ky = jnp.asarray(np.fft.fftfreq(n, d=pixel_size)).reshape(n, 1)
        kx = jnp.asarray(np.fft.rfftfreq(n, d=pixel_size)).reshape(1, -1)
        g = jnp.sqrt(ky * ky + kx * kx)
        env = dose_weight(g[None], jnp.asarray(doses)[:, None, None])
        ctfs = ctfs * env
    R = euler_to_matrix(poses[:, 0], poses[:, 1], poses[:, 2])

    sym_mats = jnp.asarray(apply_symmetry_matrices(symmetry))
    n_sym = sym_mats.shape[0]

    pn = pad * n
    nxf = pn // 2 + 1
    if prev is None:
        zc = jnp.zeros((pn, pn, nxf), dtype=jnp.complex64)
        zr = jnp.zeros((pn, pn, nxf), dtype=jnp.float32)
        prev = Accumulators(zc, zr, zc, zr)

    from pyp_tpu.ops.fourier_slice import insert_slices_halves

    ewald_c = 0.0
    if iewald:
        from pyp_tpu.core.ctf import wavelength_host

        # curvature in index units: dz_idx = lambda * k^2 / (2 n pixel);
        # voltage_kv is a static argname -> host-scalar wavelength
        ewald_c = (float(np.sign(iewald)) * wavelength_host(voltage_kv)
                   / (2.0 * n * pixel_size))

    # likelihood blurring: a bank of (in-plane offset, weight) insertions
    if lblur is not None:
        offsets_deg, rel_w = lblur
        blur_terms = [
            (euler_to_matrix(poses[:, 0], poses[:, 1],
                             poses[:, 2] + float(off)),
             weights * float(w))
            for off, w in zip(np.asarray(offsets_deg), np.asarray(rel_w))
        ]
    else:
        blur_terms = [(R, weights)]

    chi = None
    if abs(iewald) >= 2 and ref_fourier is not None and ewald_c:
        chi = _chi_grids(n, pixel_size, ctf_params, voltage_kv, cs_mm,
                         amplitude_contrast)
    num1, den1, num2, den2 = prev
    for Rb, wb in blur_terms:
        for k in range(n_sym):
            Rk = Rb @ sym_mats[k][None]
            a1, b1, a2, b2 = insert_slices_halves(
                X, ctfs, Rk, subset, wb, n, pad=pad, gridding=gridding,
                ewald_c=ewald_c,
                ref_fourier=(ref_fourier if chi is not None else None),
                chi=chi)
            num1, den1 = num1 + a1, den1 + b1
            num2, den2 = num2 + a2, den2 + b2
    return Accumulators(num1, den1, num2, den2)


def lblur_bank(lblur_nrot: int, lblur_range: float = 20.0):
    """Likelihood-blurring (offsets, weights) bank, or None when disabled:
    nrot psi offsets across lblur_range degrees centered on the refined
    in-plane angle (reference lblur_start=-10, step=1, nrot=21 defaults =>
    the same [-10, +10] window), Gaussian weights with FWHM = half the
    window, normalized to unit mass."""
    if not lblur_nrot or lblur_nrot <= 1:
        return None
    offs = np.linspace(-lblur_range / 2.0, lblur_range / 2.0,
                       int(lblur_nrot))
    sigma = max((lblur_range / 2.0) / 2.355, 1e-3)
    rw = np.exp(-0.5 * (offs / sigma) ** 2)
    rw = rw / rw.sum()
    # tuples: the bank is a STATIC argument of the jitted accumulate (a
    # handful of python floats, hashable, baked into the trace)
    return tuple(float(o) for o in offs), tuple(float(w) for w in rw)


def merge_accumulators(accs) -> Accumulators:
    """Sum a list of shard accumulators (the merge3d 'dump file' merge)."""
    out = accs[0]
    for a in accs[1:]:
        out = Accumulators(*(x + y for x, y in zip(out, a)))
    return out


@functools.partial(jax.jit, static_argnames=("n", "pad", "gridding"),
                   donate_argnums=(0, 1))
def _rfa_donated(num, den, n: int, pad: int, wiener: float, gridding: str):
    return reconstruct_from_accumulators(num, den, n, pad, wiener, gridding)


@functools.partial(jax.jit, static_argnames=("n", "pad", "gridding"))
def _rfa_jit(num, den, n: int, pad: int, wiener: float, gridding: str):
    """Non-donating twin of _rfa_donated for the half-map dispatches: the
    half grids must SURVIVE their reconstruction so the combined map can
    sum them in place afterwards (donation-ordered finalize, OOM #8)."""
    return reconstruct_from_accumulators(num, den, n, pad, wiener, gridding)


@jax.jit
def _scalar_probe(z):
    """One-scalar readback target used to drain the dispatch queue (module
    level so jit caches the program; complex slicing must stay inside jit
    on the axon tunnel)."""
    return jnp.real(z[0, 0, 0])


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _add_donated(a, b):
    """Sum two accumulator grids in place (output aliases an input): at
    production boxes each padded num grid is ~1 GB and a functional add
    while all four half-set grids are live tips HBM over."""
    return a + b


def _rfa_peak_estimate(n: int, pad: int) -> int:
    """Conservative HBM bound for one reconstruct_from_accumulators
    dispatch at grid pn = n*pad, BEYOND the argument grids (which alias
    live buffers). With the column-chunked fused-Wiener z-pass the extra
    is the (n, pn, nxf) z-cropped grid (4/pad B/point of pn^3) plus two
    column slabs — ~8 B/point covers every pad with slack. (History: the
    monolithic irfftn was ~26, the unchunked axis-at-a-time form measured
    ~18.6 — each in turn the wall of a 49k x box-256 attempt.)"""
    return 8 * (n * pad) ** 3


_DL_CHUNK_BYTES = 64 * 2**20


def _download_chunked(g) -> np.ndarray:
    """Device -> host in <=64 MB leading-axis slabs: the axon tunnel's
    transfer path rejects large single messages with RESOURCE_EXHAUSTED
    (a 765 MB f32 plane killed e2e attempt 3; the error is the RPC
    resource limit, not HBM). Slabs use a clamped dynamic_slice with one
    static size so there is exactly one compiled slicer per grid shape."""
    g = jnp.asarray(g)
    if g.nbytes <= _DL_CHUNK_BYTES or g.ndim == 0:
        return np.asarray(g)
    per_row = max(1, g.nbytes // max(1, g.shape[0]))
    rows = max(1, int(_DL_CHUNK_BYTES // per_row))
    rows = min(rows, g.shape[0])

    @functools.partial(jax.jit, static_argnames=("rows",))
    def _slab(x, lo, rows):
        return jax.lax.dynamic_slice_in_dim(x, lo, rows, axis=0)

    out = np.empty(g.shape, dtype=g.dtype)
    for lo in range(0, g.shape[0], rows):
        lo = min(lo, g.shape[0] - rows)  # clamp: overlapped rows rewrite
        out[lo:lo + rows] = np.asarray(
            _slab(g, jnp.asarray(lo, jnp.int32), rows))
    return out


def _finalize_host(acc: Accumulators, n: int, pad: int, wiener: float,
                   gridding: str) -> Reconstruction:
    """Whole finalize on the host CPU backend: four grid downloads, zero
    TPU allocations. The escape hatch when the device-side estimate says
    the padded-grid iFFT pipelines cannot fit next to the resident state
    (measured: 49k x box-256, iteration 3, pn 576, ~7.7 GiB live on a
    16 GiB v5e — docs/e2e_box256.log round 4/5)."""
    cpu = jax.devices("cpu")[0]
    # plain numpy downloads: inside the default_device(cpu) scope the jit
    # places them on the CPU backend (jnp.asarray here would re-upload).
    # Complex grids are downloaded as jitted real/imag f32 planes — the
    # axon tunnel cannot transfer complex arrays host<->device (verify
    # SKILL gotcha; a direct np.asarray of the c64 numerator killed the
    # round-5 attempt-2 e2e at exactly this line)
    def _download(g):
        if np.issubdtype(np.dtype(getattr(g, "dtype", np.float32)),
                         np.complexfloating):
            parts = [_download_chunked(jax.jit(jnp.real)(g)),
                     _download_chunked(jax.jit(jnp.imag)(g))]
            return (parts[0] + 1j * parts[1]).astype(np.complex64)
        return _download_chunked(g)

    grids = [_download(g) for g in acc]
    with jax.default_device(cpu):
        half1 = reconstruct_from_accumulators(grids[0], grids[1], n, pad,
                                              wiener, gridding)
        half2 = reconstruct_from_accumulators(grids[2], grids[3], n, pad,
                                              wiener, gridding)
        freqs, curve = fsc_mod.fsc(half1, half2)
        combined = reconstruct_from_accumulators(
            grids[0] + grids[2], grids[1] + grids[3], n, pad, wiener,
            gridding)
        combined = fsc_mod.apply_fsc_filter(
            combined, jnp.clip(curve, 0.0, 1.0))
    return Reconstruction(volume=np.asarray(combined),
                          half1=np.asarray(half1), half2=np.asarray(half2),
                          fsc=np.asarray(curve), freqs=np.asarray(freqs))


def finalize(acc: Accumulators, n: int, pad: int = DEFAULT_PAD,
             wiener: float = 0.5,
             gridding: str = "trilinear") -> Reconstruction:
    """Accumulators -> half maps, FSC-filtered combined map, FSC curve.

    Deliberately NOT one fused jit: a single program holds all three
    padded-grid inverse-FFT pipelines (and the summed accumulators) live
    at once, which exhausts HBM at production boxes (measured: box 256 /
    pad-scaled crop grid, OOM on a v5e). Sequential dispatches free each
    reconstruction's workspace before the next; the half-set sums are
    computed FIRST so every reconstruction dispatch can donate its grids
    as scratch. When even that cannot fit next to the resident state
    (live bytes + analytic estimate vs the device's HBM), the whole
    finalize falls back to the host CPU backend instead of dying."""
    from pyp_tpu.utils import memwatch

    # drain the dispatch queue before the budget check AND before the
    # first dispatch: jax enqueues asynchronously and ALLOCATES each
    # program's output/workspace at enqueue, so the accumulate pipeline's
    # multi-GiB workspace can still be resident (and invisible to
    # live_arrays) when finalize's first program asks for its own —
    # measured: iteration 3 of the 49k x box-256 run OOMed at a ~2 GiB
    # dispatch with ~4 GiB of nominal headroom (OOM #9). A one-scalar
    # readback of the newest grid orders behind everything in flight.
    _drain = np.asarray(_scalar_probe(acc.num1))
    live = memwatch.live_device_bytes()
    limit = memwatch.hbm_limit_bytes()
    est = _rfa_peak_estimate(n, pad)
    # 0.92: the estimate is tight now (chunked z-pass, measured), so a
    # thin reserve suffices — an over-eager host reroute costs minutes of
    # chunked tunnel downloads per iteration
    if live + est > 0.92 * limit:
        import logging

        logging.getLogger("pyp_tpu.reconstruct").warning(
            "finalize: %.2f GiB live + %.2f GiB estimated iFFT peak vs "
            "%.1f GiB HBM — running finalize on the host CPU backend",
            live / 2**30, est / 2**30, limit / 2**30)
        return _finalize_host(acc, n, pad, wiener, gridding)
    memwatch.observe("reconstruct_finalize", _rfa_jit,
                     (acc.num1, acc.den1, n, pad, wiener, gridding))
    # Allocation-free ordering (the round-4 "sums first" order allocated
    # two fresh grids — +1.5 GiB transient at pn 624 — and OOMed iteration
    # 3 of the 49k x box-256 run): reconstruct the halves WITHOUT donating
    # so the grids survive, then sum them with in-place donated adds (the
    # output aliases an input buffer — zero new accumulator-sized
    # allocations), then let the combined reconstruction consume the sums.
    num1, den1, num2, den2 = acc
    acc = None  # finalize owns the grids (all call sites hand them off)
    half1 = _rfa_jit(num1, den1, n, pad, wiener, gridding)
    # scalar readback between the big dispatches: allocation-at-enqueue
    # would otherwise hold both reconstructions' workspaces at once
    _drain = np.asarray(half1[0, 0, 0])
    half2 = _rfa_jit(num2, den2, n, pad, wiener, gridding)
    _drain = np.asarray(half2[0, 0, 0])
    num = _add_donated(num1, num2)
    num1 = num2 = None
    den = _add_donated(den1, den2)
    den1 = den2 = None
    # FSC on the host CPU backend: the half maps are tiny (n^3) but the
    # summed grids are still live, and at box 256 even compiling the
    # small FSC program on the TPU failed with ResourceExhausted
    # (round-4 49k x 256 e2e — iteration 3 died exactly here).
    h1_np, h2_np = np.asarray(half1), np.asarray(half2)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            freqs, curve = fsc_mod.fsc(jnp.asarray(h1_np), jnp.asarray(h2_np))
        freqs, curve = np.asarray(freqs), np.asarray(curve)
    else:
        freqs, curve = fsc_mod.fsc(half1, half2)
    combined = _rfa_donated(num, den, n, pad, wiener, gridding)
    combined = fsc_mod.apply_fsc_filter(
        combined, jnp.clip(jnp.asarray(curve), 0.0, 1.0))
    return Reconstruction(volume=combined, half1=half1, half2=half2,
                          fsc=curve, freqs=freqs)


def reconstruct(
    stack, poses, ctf_params, pixel_size,
    subset=None, weights=None, symmetry: str = "C1",
    voltage_kv: float = 300.0, cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07, wiener: float = 0.5,
    batch: int = 256, pad: int = DEFAULT_PAD, gridding: str = "trilinear",
    crop_to: int = None, iewald: int = 0,
    lblur_nrot: int = 0, lblur_range: float = 20.0,
    ref_volume=None,
) -> Reconstruction:
    """Single-call reconstruction of a full particle stack (batched insert).

    crop_to: band-limited reconstruction grid — each batch is Fourier-
    cropped ON DEVICE after the (unavoidable) host transfer, so the scatter
    work shrinks by (crop_to/n)^2 with no extra host round-trips (host-side
    pre-cropping measured SLOWER through the axon tunnel: the second
    transfer of the stack dominates). Shifts/pixel size rescale internally;
    the returned maps live on the crop grid."""
    n = stack.shape[-1]
    B = stack.shape[0]
    if subset is None:
        subset = jnp.arange(B) % 2
    if weights is None:
        weights = jnp.ones(B)
    n_rec, ratio = n, 1.0
    if crop_to is not None and crop_to < n:
        from pyp_tpu.ops.frm import _crop_jit

        n_rec = int(crop_to)
        ratio = n_rec / float(n)
        # Scale pad by n/n_rec: the crop accumulator then has node
        # spacing n_rec/(n*pad) of a data wavenumber — FINER than the
        # full grid's 1/pad — and the 3-seed replicated e2e shows the
        # finer gridding kernel on intermediates is worth ~1.5 A of
        # final resolution (median FSC 6.5 A with pad-2-on-crop vs
        # 4.94 A pad-scaled vs 5.83 A full-size; docs/BENCH_E2E.md).
        # Scatter-point count is pad-independent, so the (n_rec/n)^2
        # scatter saving survives; only accumulator memory returns to
        # ~the full-grid size. The crop map therefore does NOT exactly
        # equal the full pad-2 map in-band (it is sharper) — the
        # framework test asserts ground-truth quality, not similarity.
        # round(), not ceil(): the ceil grid at awkward ratios is up to
        # (ceil/exact)^3 larger — at box 256 iteration 3 (n_rec 160)
        # that was pn 640 vs 480, 2.9 vs 1.2 GiB of grids on a ~12 GiB
        # usable tunnel budget — for a node spacing already finer than
        # the full grid's.
        pad = max(2, int(round(pad * n / float(n_rec))))
    pixel_rec = pixel_size / ratio
    lblur = lblur_bank(lblur_nrot, lblur_range)
    ref_fourier = None
    if abs(iewald) >= 2 and ref_volume is not None:
        # reference-based Ewald unmixing: one padded spectrum of the
        # current map, shared by every batch (Fourier-cropped with the
        # stack when reconstructing on the band-limited grid)
        from pyp_tpu.ops.fourier_slice import volume_to_fourier

        rv = jnp.asarray(ref_volume, dtype=jnp.float32)
        if n_rec < n:
            from pyp_tpu.core.fft import fourier_crop_3d

            rv = fourier_crop_3d(rv, out_shape=(n_rec, n_rec, n_rec))
        ref_fourier = volume_to_fourier(rv, pad=2)
    from pyp_tpu.utils import memwatch

    # grid-size-aware batch: the insertion program's scratch (tap values +
    # indices per inserted point) measures ~190 B * batch * n_rec^2
    # (calibrated: 1.91 GiB at batch 512 / n_rec 144; 2.35 at n_rec 160).
    # Cap it at ~1.8 GiB so production grids fit beside the resident
    # stack on the ~12 GiB usable tunnel budget.
    eff_batch = max(64, min(batch, int(1.8e9 / (190.0 * n_rec * n_rec))))
    batch = eff_batch
    acc = None
    for i in range(0, B, batch):
        sl = slice(i, min(i + batch, B))
        xb = jnp.asarray(stack[sl])
        pb = jnp.asarray(poses[sl])
        if n_rec < n:
            xb = _crop_jit(xb, n_rec)
            pb = pb.at[:, 3:5].multiply(ratio)
        if i == 0:
            memwatch.observe(
                "reconstruct_accumulate", accumulate,
                (xb, pb, jnp.asarray(ctf_params[sl]),
                 jnp.asarray(subset[sl]), jnp.asarray(weights[sl]),
                 n_rec, pixel_rec, voltage_kv, cs_mm, amplitude_contrast,
                 symmetry, pad),
                dict(prev=acc, gridding=gridding, iewald=iewald,
                     lblur=lblur, ref_fourier=ref_fourier))
        acc = accumulate(
            xb, pb,
            jnp.asarray(ctf_params[sl]), jnp.asarray(subset[sl]),
            jnp.asarray(weights[sl]), n_rec, pixel_rec, voltage_kv, cs_mm,
            amplitude_contrast, symmetry, pad, prev=acc, gridding=gridding,
            iewald=iewald, lblur=lblur, ref_fourier=ref_fourier,
        )
        if (i // batch) % 8 == 7:
            # periodic queue drain: enqueue-time allocation means many
            # batches' scatter workspaces can be in flight at once at
            # production grid sizes (the OOM #9 mechanism, see finalize)
            np.asarray(_scalar_probe(acc.num1))
    return finalize(acc, n_rec, pad, wiener, gridding)


def save_accumulators(acc: Accumulators, path):
    """Persist shard accumulators (the reference's *_map?_n*.mrc dump files,
    frealign.py:1822) as one npz."""
    np.savez_compressed(
        path,
        num1=np.asarray(acc.num1), den1=np.asarray(acc.den1),
        num2=np.asarray(acc.num2), den2=np.asarray(acc.den2),
    )


def load_accumulators(path) -> Accumulators:
    with np.load(path) as z:
        return Accumulators(
            jnp.asarray(z["num1"]), jnp.asarray(z["den1"]),
            jnp.asarray(z["num2"]), jnp.asarray(z["den2"]),
        )


@functools.partial(
    jax.jit,
    static_argnames=("n", "pixel_size", "voltage_kv", "cs_mm",
                     "amplitude_contrast", "pad", "iewald"),
    donate_argnames=("prev",),
)
def accumulate_matrices(
    windows,             # (B, n, n) particle projections (e.g. CSP windows)
    rotations,           # (B, 3, 3) full projection rotations (R_eff)
    shifts,              # (B, 2) residual shifts to apply (pixels)
    defoci,              # (B,) mean defocus per projection (Å)
    subset,              # (B,) 0/1 half assignment
    weights,             # (B,) weights (exposure * occupancy)
    n: int,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    pad: int = DEFAULT_PAD,
    prev: Accumulators | None = None,
    iewald: int = 0,
    ref_fourier=None,
) -> Accumulators:
    """Insertion with explicit rotation matrices — the CSPT path: each
    (tilt, particle) projection window contributes a slice at pose
    R_eff = R_tilt @ M_particle (SURVEY §3.4; ops.csp produces these).
    iewald: Ewald-sphere correction (see `accumulate`; magnitude 2 +
    ref_fourier = reference-based unmixing)."""
    X = image_to_fourier(windows)
    X = _shift_correct(X, shifts, n)
    cp = jnp.stack([defoci, defoci, jnp.zeros_like(defoci), jnp.zeros_like(defoci)], 1)
    ctfs = _ctf_grids(n, pixel_size, cp, voltage_kv, cs_mm, amplitude_contrast)
    pn = pad * n
    nxf = pn // 2 + 1
    if prev is None:
        zc = jnp.zeros((pn, pn, nxf), dtype=jnp.complex64)
        zr = jnp.zeros((pn, pn, nxf), dtype=jnp.float32)
        prev = Accumulators(zc, zr, zc, zr)
    from pyp_tpu.ops.fourier_slice import insert_slices_halves

    ewald_c = 0.0
    if iewald:
        from pyp_tpu.core.ctf import wavelength_host

        # curvature in index units: dz_idx = lambda * k^2 / (2 n pixel);
        # voltage_kv is a static argname -> host-scalar wavelength
        ewald_c = (float(np.sign(iewald)) * wavelength_host(voltage_kv)
                   / (2.0 * n * pixel_size))
    chi = None
    if abs(iewald) >= 2 and ref_fourier is not None and ewald_c:
        chi = _chi_grids(n, pixel_size, cp, voltage_kv, cs_mm,
                         amplitude_contrast)
    a1, b1, a2, b2 = insert_slices_halves(
        X, ctfs, rotations, subset, weights, n, pad=pad, ewald_c=ewald_c,
        ref_fourier=(ref_fourier if chi is not None else None), chi=chi)
    return Accumulators(prev.num1 + a1, prev.den1 + b1,
                        prev.num2 + a2, prev.den2 + b2)
