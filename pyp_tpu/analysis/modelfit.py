"""Model-map fit evaluation (the reference's Model-fitting tab,
pyp_config.toml [tabs.model]: "Fit a set of pdb coordinates after each
refinement iteration").

TPU-first design: atomic structure factors are evaluated directly on the
map's rfft grid as chunked complex-exponential sums —

    F_model(k) = sum_a w_a e^{-B_a |k|^2 / 4} e^{-2 pi i k . x_a}

computed as (grid-block, 3) @ (3, atoms) phase matmuls under lax.scan (two
MXU matmuls per block for cos/sin), so no density is ever gridded. Fit
quality is the band-limited Fourier correlation between F_model and the
map's spectrum (a model-map FSC), and the optimal rigid translation falls
out of one inverse FFT of F_map . conj(F_model)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n",))
def _structure_factors(coords_px, weights, bfac_px2, n: int):
    """F_model on the rfftn grid of an n³ box. coords_px (N, 3) in PIXEL
    units (z, y, x) relative to the box origin."""
    kz = jnp.fft.fftfreq(n).astype(jnp.float32)
    ky = jnp.fft.fftfreq(n).astype(jnp.float32)
    kx = jnp.fft.rfftfreq(n).astype(jnp.float32)
    KZ, KY, KX = jnp.meshgrid(kz, ky, kx, indexing="ij")
    K = jnp.stack([KZ, KY, KX], axis=-1).reshape(-1, 3)     # (G, 3)
    G = K.shape[0]
    block = 16384
    n_blocks = -(-G // block)
    pad = n_blocks * block - G
    Kp = jnp.pad(K, ((0, pad), (0, 0))).reshape(n_blocks, block, 3)

    def one_block(_, Kb):
        ph = -2.0 * jnp.pi * (Kb @ coords_px.T)              # (block, N)
        k2b = jnp.sum(Kb * Kb, axis=1)                       # (block,)
        w = weights[None, :] * jnp.exp(
            -0.25 * bfac_px2[None, :] * k2b[:, None])
        re = jnp.sum(w * jnp.cos(ph), axis=1)
        im = jnp.sum(w * jnp.sin(ph), axis=1)
        return None, (re, im)

    _, (re, im) = jax.lax.scan(one_block, None, Kp)
    F = jax.lax.complex(re.reshape(-1)[:G], im.reshape(-1)[:G])
    return F.reshape(n, n, n // 2 + 1)


def model_structure_factors(model: dict, pixel_size: float, n: int,
                            extra_bfactor_a2: float = 100.0,
                            center_a=None):
    """PDB model dict (io.pdb.read_pdb) -> F_model on the map grid.

    Coordinates map Å -> box pixels with the model centroid (or
    `center_a`) placed at the box center; per-atom B-factors (plus a
    resolution-matched extra B) shape the Gaussian-atom envelope."""
    xyz = np.asarray(model["coords"], dtype=np.float32)       # (N, 3) xyz Å
    center = (np.mean(xyz, axis=0) if center_a is None
              else np.asarray(center_a, np.float32))
    zyx = (xyz - center)[:, ::-1] / pixel_size               # (N, 3) zyx px
    zyx = zyx + n // 2
    bf_px2 = (np.asarray(model["bfactors"], np.float32)
              + float(extra_bfactor_a2)) / (pixel_size ** 2)
    return _structure_factors(jnp.asarray(zyx),
                              jnp.asarray(model["weights"]),
                              jnp.asarray(bf_px2), n)


def model_map_fit(model: dict, vol, pixel_size: float,
                  low_res: float = 100.0, high_res: float = 8.0,
                  extra_bfactor_a2: float = 100.0):
    """Score a PDB model against a map.

    Returns dict with `cc` (band-limited Fourier correlation at the
    translation-optimal placement), `shift_px` (z, y, x) of the model's
    best rigid translation, and `fsc` (per-shell model-map correlation
    after shifting)."""
    from pyp_tpu.core import fsc as fsc_mod

    vol = jnp.asarray(vol, dtype=jnp.float32)
    n = vol.shape[-1]
    Fmap = jnp.fft.rfftn(vol)
    Fmod = model_structure_factors(model, pixel_size, n,
                                   extra_bfactor_a2=extra_bfactor_a2)

    # band mask in cycles/px
    kz = np.fft.fftfreq(n)
    ky = np.fft.fftfreq(n)
    kx = np.fft.rfftfreq(n)
    r = np.sqrt(kz[:, None, None]**2 + ky[None, :, None]**2
                + kx[None, None, :]**2)
    lo, hi = pixel_size / low_res, pixel_size / high_res
    band = jnp.asarray(((r >= lo) & (r <= hi)).astype(np.float32))

    # translation-optimal placement: peak of the phase-correlation map
    cc_map = jnp.fft.irfftn(Fmap * jnp.conj(Fmod) * band, s=vol.shape)
    peak = jnp.argmax(cc_map)
    shift = jnp.stack(jnp.unravel_index(peak, cc_map.shape))
    shift = (shift + n // 2) % n - n // 2                    # wrap to +-n/2
    # apply the shift to the model spectrum
    KZ = jnp.asarray(kz)[:, None, None]
    KY = jnp.asarray(ky)[None, :, None]
    KX = jnp.asarray(kx)[None, None, :]
    ph = 2.0 * jnp.pi * (KZ * shift[0] + KY * shift[1] + KX * shift[2])
    Fmod_s = Fmod * jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))

    num = jnp.sum((Fmap * jnp.conj(Fmod_s)).real * band)
    den = jnp.sqrt(jnp.sum(jnp.abs(Fmap)**2 * band)
                   * jnp.sum(jnp.abs(Fmod_s)**2 * band) + 1e-12)
    cc = float(num / den)

    n_bins = n // 2
    bins = fsc_mod._shell_bins(n, n_bins)
    bflat = band.reshape(-1)
    a = (Fmap * jnp.conj(Fmod_s)).real.reshape(-1) * bflat
    p1 = (jnp.abs(Fmap)**2).reshape(-1) * bflat
    p2 = (jnp.abs(Fmod_s)**2).reshape(-1) * bflat
    snum = jnp.zeros(n_bins).at[bins].add(a)
    sp1 = jnp.zeros(n_bins).at[bins].add(p1)
    sp2 = jnp.zeros(n_bins).at[bins].add(p2)
    fsc = np.asarray(snum / jnp.maximum(jnp.sqrt(sp1 * sp2), 1e-12))
    return {"cc": cc, "shift_px": np.asarray(shift, np.int32),
            "fsc": fsc}
