"""Map postprocessing: auto-masking, corrected FSC, B-factor sharpening.

Replaces the reference's postprocess layer (/root/reference/src/pyp/
postprocess/core.py:230 `cistem_postprocess` wrapping cistem2 sharpen_map /
relion_postprocess; pyp_fsc.py): all in JAX —

  * auto_mask: lowpass -> threshold -> dilation -> soft cosine edge;
  * masked FSC with high-resolution noise substitution (phase randomization
    beyond a shell, Chen et al. 2013) -> "part FSC";
  * Guinier-fit automatic B-factor (Rosenthal & Henderson 2003) +
    FSC-weighted sharpening and lowpass at the measured resolution.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core import fsc as fsc_mod
from pyp_tpu.utils import get_logger

logger = get_logger("postprocess")


def auto_mask(vol, lowpass_a=15.0, pixel_size=1.0, threshold_sigmas=1.0,
              dilation_px=3, soft_px=6, mw_kda=0.0, threshold_abs=0.0,
              volume_fraction=0.0):
    """Shape mask from a lowpassed map: threshold, dilate, soften.

    The threshold follows the reference's sharpen-tab strategies
    (masking_threshold_method intensity/volume/sigma): `threshold_abs`
    (absolute density), `volume_fraction` (densest fraction of voxels),
    or the default `threshold_sigmas` stds-above-mean rule. mw_kda > 0
    picks the threshold enclosing the expected molecular volume
    (~1210 Å³/kDa at 1.35 g/cm³ protein density — the reference feeds
    particle_mw to cisTEM for the same purpose, SURVEY §A.1 line 16)."""
    from pyp_tpu.core.filters import lowpass_filter_3d

    lp = lowpass_filter_3d(jnp.asarray(vol), pixel_size, lowpass_a)
    vox = int(1210.0 * (mw_kda or 0.0) / pixel_size ** 3)
    if threshold_abs:
        thr = jnp.asarray(threshold_abs, dtype=lp.dtype)
    elif volume_fraction and 0.0 < volume_fraction < 1.0:
        thr = jnp.quantile(lp.ravel(), 1.0 - volume_fraction)
    elif 0 < vox < lp.size * 0.3:  # MW inconsistent with the box -> sigma
        thr = jnp.sort(lp.ravel())[-max(vox, 1)]
    else:
        thr = jnp.mean(lp) + threshold_sigmas * jnp.std(lp)
    binary = (lp > thr).astype(jnp.float32)
    # dilation via box max-pool
    k = 2 * dilation_px + 1
    dil = jax.lax.reduce_window(binary, 0.0, jax.lax.max, (k, k, k),
                                (1, 1, 1), "SAME")
    # soft edge via normalized box blur applied twice
    kk = 2 * soft_px + 1
    blur = jax.lax.reduce_window(dil, 0.0, jax.lax.add, (kk, kk, kk),
                                 (1, 1, 1), "SAME") / (kk ** 3)
    return jnp.clip(blur * 1.2, 0.0, 1.0)


def _phase_randomize(F, bins, cutoff_bin, seed=0):
    """Randomize phases beyond a shell (for mask-correction FSC)."""
    key = jax.random.PRNGKey(seed)
    phases = jax.random.uniform(key, F.shape, minval=0.0, maxval=2 * np.pi)
    rand = jnp.abs(F) * jnp.exp(1j * phases)
    return jnp.where(bins[..., :] > cutoff_bin, rand, F)


def masked_fsc(half1, half2, mask, pixel_size, rand_res_a=10.0, seed=0):
    """Mask-corrected FSC ("part FSC"): masked FSC with noise substitution
    beyond the randomization shell. Returns (freqs, corrected_curve).
    `seed` offsets the randomization (relion --random_seed role)."""
    n = half1.shape[-1]
    n_bins = n // 2
    freqs, fsc_masked = fsc_mod.fsc(half1 * mask, half2 * mask, n_bins)
    cutoff_bin = int(round((pixel_size / rand_res_a) / 0.5 * n_bins))
    cutoff_bin = min(max(cutoff_bin, 2), n_bins - 2)

    bins3 = fsc_mod._shell_bins(n, n_bins).reshape(n, n, n // 2 + 1)
    F1 = jnp.fft.rfftn(jnp.asarray(half1))
    F2 = jnp.fft.rfftn(jnp.asarray(half2))
    r1 = jnp.fft.irfftn(_phase_randomize(F1, bins3, cutoff_bin,
                                         1 + 2 * int(seed)), s=half1.shape)
    r2 = jnp.fft.irfftn(_phase_randomize(F2, bins3, cutoff_bin,
                                         2 + 2 * int(seed)), s=half2.shape)
    _, fsc_rand = fsc_mod.fsc(r1 * mask, r2 * mask, n_bins)
    corrected = fsc_mod.part_fsc(fsc_masked, fsc_rand, cutoff_bin + 2)
    return freqs, corrected


def guinier_bfactor(vol, pixel_size, min_res=10.0, max_res=None):
    """Automatic B-factor from the Guinier plot slope: fit
    ln|F|(g^2) in [1/min_res, 1/max_res]; B = 4 * slope."""
    n = vol.shape[-1]
    if max_res is None:
        max_res = 2.5 * pixel_size
    F = jnp.fft.rfftn(jnp.asarray(vol))
    amps2 = jnp.abs(F) ** 2
    n_bins = n // 2
    bins = fsc_mod._shell_bins(n, n_bins)
    sums = jnp.zeros(n_bins).at[bins].add(amps2.reshape(-1))
    counts = jnp.zeros(n_bins).at[bins].add(1.0)
    amp = jnp.sqrt(sums / jnp.maximum(counts, 1.0))
    g = (jnp.arange(n_bins) + 0.5) * 0.5 / n_bins / pixel_size
    sel = (g > 1.0 / min_res) & (g < 1.0 / max_res) & (amp > 0)
    g2 = g * g
    w = sel.astype(jnp.float32)
    x = g2
    y = jnp.log(jnp.maximum(amp, 1e-12))
    xm = jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)
    ym = jnp.sum(y * w) / jnp.maximum(jnp.sum(w), 1.0)
    slope = jnp.sum(w * (x - xm) * (y - ym)) / jnp.maximum(
        jnp.sum(w * (x - xm) ** 2), 1e-12
    )
    return 4.0 * slope  # negative for falling amplitudes


def guinier_curve(vol, pixel_size):
    """Spherically averaged (1/d², ln|F|) table for Guinier plotting
    (reference guinier_plot, analysis/plot/core.py:60)."""
    n = vol.shape[-1]
    F = jnp.fft.rfftn(jnp.asarray(vol))
    amps2 = jnp.abs(F) ** 2
    n_bins = n // 2
    bins = fsc_mod._shell_bins(n, n_bins)
    sums = jnp.zeros(n_bins).at[bins].add(amps2.reshape(-1))
    counts = jnp.zeros(n_bins).at[bins].add(1.0)
    amp = jnp.sqrt(sums / jnp.maximum(counts, 1.0))
    g = (jnp.arange(n_bins) + 0.5) * 0.5 / n_bins / pixel_size
    return np.asarray(g * g), np.asarray(
        jnp.log(jnp.maximum(amp, 1e-12)))


def read_mtf_curve(path):
    """Detector MTF curve as (freqs cycles/pixel, values).

    Accepts a RELION MTF star (_rlnResolutionInversePixel/_rlnMtfValue —
    relion_postprocess --mtf, reference postprocess/core.py:317) or a
    2-column text table."""
    p = str(path)
    if p.endswith(".star"):
        from pyp_tpu.io import star as star_mod

        blocks = star_mod.read(p)
        loop = next(b["loop"] for b in blocks.values() if b["loop"])
        f = np.asarray(loop["rlnResolutionInversePixel"], dtype=np.float64)
        v = np.asarray(loop["rlnMtfValue"], dtype=np.float64)
    else:
        table = np.loadtxt(p)
        f, v = table[:, 0], table[:, 1]
    order = np.argsort(f)
    return f[order], v[order]


def mtf_correct(vol, pixel_size, mtf_path, mtf_angpix: float = 0.0):
    """Divide the map's Fourier amplitudes by the detector MTF.

    The curve's frequency axis is cycles per ORIGINAL detector pixel
    (`mtf_angpix`, defaulting to the map pixel); the map may be binned or
    Fourier-cropped relative to acquisition."""
    vol = jnp.asarray(vol, dtype=jnp.float32)
    n = vol.shape[-1]
    if not mtf_angpix or mtf_angpix <= 0:
        mtf_angpix = pixel_size
    f_tab, v_tab = read_mtf_curve(mtf_path)
    fz = np.fft.fftfreq(n).reshape(n, 1, 1)
    fy = np.fft.fftfreq(n).reshape(1, n, 1)
    fx = np.fft.rfftfreq(n).reshape(1, 1, -1)
    r = np.sqrt(fz * fz + fy * fy + fx * fx)       # cycles per map pixel
    f_orig = r * mtf_angpix / pixel_size           # cycles per detector px
    mtf = np.interp(f_orig, f_tab, v_tab)
    mtf = np.maximum(mtf, 1e-2).astype(np.float32)  # guard the division
    F = jnp.fft.rfftn(vol)
    return jnp.fft.irfftn(F / jnp.asarray(mtf), s=vol.shape)


def sharpen_map(vol, pixel_size, bfactor=None, resolution=None,
                fsc_curve=None, guinier_min_res: float = 10.0,
                guinier_max_res=None, bfactor_low=None, flatten_res=None,
                edge_width_px: float = 0.0, fsc_filter: str = "cref"):
    """Sharpen: apply -B (auto if None), optional Cref FSC weighting, and a
    cosine lowpass at `resolution`.

    bfactor_low + flatten_res: cisTEM sharpen_map's split-B card
    (low_res_bfactor applied below the flattening resolution,
    high_res_bfactor = `bfactor` beyond it). edge_width_px: cosine lowpass
    edge width in Fourier pixels (sharpen_cistem filter_edge_width role)."""
    from pyp_tpu.core.filters import lowpass_filter_3d

    vol = jnp.asarray(vol)
    n = vol.shape[-1]
    if bfactor is None:
        bfactor = float(guinier_bfactor(vol, pixel_size,
                                        min_res=guinier_min_res,
                                        max_res=guinier_max_res))
        logger.info("auto B-factor: %.1f Å²", bfactor)
    F = jnp.fft.rfftn(vol)
    fz = jnp.fft.fftfreq(n, d=pixel_size).reshape(n, 1, 1)
    fy = jnp.fft.fftfreq(n, d=pixel_size).reshape(1, n, 1)
    fx = jnp.fft.rfftfreq(n, d=pixel_size).reshape(1, 1, -1)
    g2 = fz * fz + fy * fy + fx * fx
    if bfactor_low is not None and flatten_res:
        B = jnp.where(g2 < (1.0 / float(flatten_res)) ** 2,
                      float(bfactor_low), float(bfactor))
        F = F * jnp.exp(-0.25 * B * g2)
    else:
        F = F * jnp.exp(-0.25 * bfactor * g2)  # bfactor < 0 -> sharpening
    if fsc_curve is not None:
        c = jnp.clip(jnp.asarray(fsc_curve), 0.0, 1.0)
        # 'cref' = sqrt(2C/(1+C)) (Rosenthal & Henderson); 'fsc2' = C^2
        # (reference sharpen tab apply_fsc2)
        w = c * c if fsc_filter == "fsc2" else fsc_mod.fsc_weights(c)
        F = F * fsc_mod.radial_shell_filter_3d((n, n, n), w)
    out = jnp.fft.irfftn(F, s=vol.shape)
    if resolution is not None:
        width = (edge_width_px / n) if edge_width_px else 0.01
        out = lowpass_filter_3d(out, pixel_size, resolution, width=width)
    return out, bfactor


def postprocess_latest(dataset: str, params: dict, work_dir=".") -> dict:
    """Find the newest half maps in maps/, run the full postprocess, write
    <dataset>_sharpened.mrc + FSC table. The CLI `postprocess` mode."""
    from pyp_tpu.io import mrc

    maps_dir = Path(work_dir) / "maps"
    # explicit half-map inputs (sharpen_relion first/second_half role) win
    # over the newest maps/ pair; a single-map input (sharpen_cistem
    # input_map) postprocesses without an FSC
    h1_user = str(params.get("sharpen_first_half") or "")
    h2_user = str(params.get("sharpen_second_half") or "")
    single = str(params.get("sharpen_input_map") or "")
    if single and Path(single).exists():
        h1p = h2p = Path(single)
    elif h1_user and h2_user and Path(h1_user).exists() \
            and Path(h2_user).exists():
        h1p, h2p = Path(h1_user), Path(h2_user)
    else:
        halves = sorted(maps_dir.glob(f"{dataset}_r??_??_half1.mrc"))
        if not halves:
            raise FileNotFoundError(f"no half maps under {maps_dir}")
        h1p = halves[-1]
        h2p = Path(str(h1p).replace("half1", "half2"))
    maps_dir.mkdir(parents=True, exist_ok=True)
    half1 = mrc.read(h1p).astype(np.float32)
    half2 = mrc.read(h2p).astype(np.float32)
    have_halves = str(h1p) != str(h2p)
    pixel = mrc.read_header(h1p).pixel_size

    # detector MTF division ahead of everything downstream (--mtf role)
    mtf_path = str(params.get("sharpen_mtf") or "")
    if mtf_path and Path(mtf_path).exists():
        angpix = float(params.get("sharpen_mtf_angpix") or 0.0)
        half1 = np.asarray(mtf_correct(half1, pixel, mtf_path, angpix),
                           dtype=np.float32)
        half2 = np.asarray(mtf_correct(half2, pixel, mtf_path, angpix),
                           dtype=np.float32)
        logger.info("MTF-corrected halves with %s", mtf_path)

    user_mask = str(params.get("sharpen_mask") or "")
    outer_rad = float(params.get("sharpen_outer_mask_radius") or 0.0)
    # explicit strategy selection (reference sharpen tab masking_method
    # auto/external); unset keeps the inference: file if given, sphere if
    # an outer radius is set, else auto
    mask_method = str(params.get("sharpen_masking_method") or "")
    if mask_method == "external" and not user_mask:
        logger.warning("masking_method=external but no sharpen_mask given; "
                       "falling back to auto-masking")
        mask_method = "auto"
    if mask_method == "auto":
        user_mask, outer_rad = "", 0.0
    if user_mask and Path(user_mask).exists():
        mask = jnp.asarray(mrc.read(user_mask).astype(np.float32))
    elif outer_rad > 0:
        # spherical (shell) mask in Å (sharpen_cistem inner/outer mask
        # radius cards)
        from pyp_tpu.core.filters import soft_spherical_mask

        n_box = half1.shape[-1]
        mask = soft_spherical_mask(n_box, outer_rad / pixel, 4.0)
        inner_rad = float(params.get("sharpen_inner_mask_radius") or 0.0)
        if inner_rad > 0:
            mask = mask * (1.0 - soft_spherical_mask(
                n_box, inner_rad / pixel, 4.0))
    else:
        # threshold strategy (sharpen tab masking_threshold_method):
        # intensity = absolute automask_threshold, volume = densest
        # automask_fraction of voxels, sigma = automask_sigma stds
        tm = str(params.get("sharpen_masking_threshold_method") or "")
        thr_abs = (float(params.get("sharpen_automask_threshold") or 0.0)
                   if tm in ("", "intensity") else 0.0)
        frac = (float(params.get("sharpen_automask_fraction") or 0.0)
                if tm in ("", "volume") else 0.0)
        sigmas = float(params.get("sharpen_automask_sigma") or 0.0) \
            if tm in ("", "sigma") else 0.0
        mask = auto_mask(
            half1 + half2, pixel_size=pixel,
            lowpass_a=float(params.get("sharpen_mask_lowpass") or 15.0),
            threshold_sigmas=sigmas or float(
                params.get("sharpen_mask_threshold") or 1.0),
            dilation_px=int(params.get("sharpen_mask_dilation") or 3),
            soft_px=int(params.get("sharpen_mask_soft") or 6),
            mw_kda=float(params.get("particle_mw") or 0.0),
            threshold_abs=thr_abs, volume_fraction=frac,
        )
    hard_limit = float(params.get("sharpen_high_res_limit") or 0.0)
    if have_halves:
        rand_res = float(params.get("sharpen_rand_res") or 10.0)
        rand_fsc = float(params.get("sharpen_randomize_at_fsc") or 0.0)
        # randomize_method (sharpen tab): 'fsc' crosses the unmasked FSC
        # (default value 0.8), 'resolution' uses the fixed Å shell
        rmeth = str(params.get("sharpen_randomize_method") or "")
        if rmeth == "fsc" and rand_fsc <= 0:
            rand_fsc = 0.8
        elif rmeth == "resolution":
            rand_fsc = 0.0
        if rand_fsc > 0:
            # randomize where the UNMASKED FSC first crosses the value
            # (relion --randomize_at_fsc role)
            f0, c0 = fsc_mod.fsc(half1, half2)
            rand_res = float(fsc_mod.resolution_at_threshold(
                f0, c0, pixel, rand_fsc))
        freqs, curve = masked_fsc(
            half1, half2, mask, pixel, rand_res_a=rand_res,
            seed=int(params.get("sharpen_random_seed") or 0))
        res = float(fsc_mod.resolution_at_threshold(
            freqs, curve, pixel,
            float(params.get("sharpen_fsc_cut") or 0.143)))
    else:  # single-map input: no FSC; the hard limit is the lowpass
        freqs = jnp.arange(half1.shape[-1] // 2) / half1.shape[-1]
        curve = jnp.ones_like(freqs)
        res = hard_limit or 2.5 * pixel
    if hard_limit > 0:
        res = max(res, hard_limit)
    combined = (half1 + half2) * 0.5
    bfac_user = float(params.get("sharpen_bfactor") or 0.0)
    if str(params.get("sharpen_bfactor_method") or "") == "auto":
        bfac_user = 0.0  # explicit auto overrides an adhoc leftover
    bfac_low = params.get("sharpen_low_res_bfactor")
    bfac_high = params.get("sharpen_high_res_bfactor")
    if bfac_high not in (None, "") and float(bfac_high) and not bfac_user:
        bfac_user = float(bfac_high)
    fsc_w = (curve if params.get("sharpen_fsc_weight", True)
             and have_halves else None)
    fsc_filter = "fsc2" if params.get("sharpen_apply_fsc2") else "cref"
    sharp, bfac = sharpen_map(
        combined, pixel,
        resolution=(res if params.get("sharpen_final_lowpass", True)
                    else None),
        fsc_curve=fsc_w, fsc_filter=fsc_filter,
        bfactor=bfac_user if bfac_user else None,
        guinier_min_res=float(params.get("sharpen_bfac_lowres") or 10.0),
        guinier_max_res=(float(params.get("sharpen_bfac_highres"))
                         if params.get("sharpen_bfac_highres") else None),
        bfactor_low=(float(bfac_low)
                     if bfac_low not in (None, "", 0, 0.0) else None),
        flatten_res=float(params.get("sharpen_flatten_res") or 0.0) or None,
        edge_width_px=float(params.get("sharpen_edge_width") or 0.0))
    if params.get("plot_per_item", True):
        # Guinier panel of the pre-sharpen map with the applied B line
        try:
            from pyp_tpu.analysis.plots import plot_guinier

            g2, ln_amp = guinier_curve(combined, pixel)
            lo = 1.0 / float(params.get("sharpen_bfac_lowres") or 10.0)
            band = (g2 > lo * lo) & np.isfinite(ln_amp)
            slope = float(bfac) / 4.0
            icpt = (float(np.mean(ln_amp[band] - slope * g2[band]))
                    if band.any() else 0.0)
            plot_guinier(g2[band], ln_amp[band], slope, icpt,
                         maps_dir / f"{dataset}_guinier.png")
        except (OSError, ValueError) as e:
            logger.warning("guinier plot skipped: %s", e)
    if params.get("sharpen_gaussian"):
        # gaussian-falloff lowpass reaching 0.5 at the measured resolution
        # instead of the cosine edge (sharpen tab gaussian): equivalent to
        # a B-factor blur with B = 4 ln2 res^2
        nb = sharp.shape[-1]
        fz = jnp.fft.fftfreq(nb, d=pixel).reshape(nb, 1, 1)
        fy = jnp.fft.fftfreq(nb, d=pixel).reshape(1, nb, 1)
        fx = jnp.fft.rfftfreq(nb, d=pixel).reshape(1, 1, -1)
        g2 = fz * fz + fy * fy + fx * fx
        gauss = jnp.exp(-float(np.log(2.0)) * g2 * res * res)
        sharp = jnp.fft.irfftn(jnp.fft.rfftn(sharp) * gauss,
                               s=sharp.shape[-3:])
    hp = float(params.get("sharpen_highpass") or -1.0)
    if hp > 0:
        # high-pass (sharpen tab highpass; -1 = off)
        from pyp_tpu.core.filters import lowpass_filter_3d

        sharp = sharp - lowpass_filter_3d(sharp, pixel, hp)
    out_map = maps_dir / f"{dataset}_sharpened.mrc"
    out_vol = sharp * mask if params.get("sharpen_apply_mask", True) else sharp
    if params.get("sharpen_invert_handedness"):
        # mirror through the xy plane (cisTEM invert_handedness card)
        out_vol = jnp.asarray(out_vol)[::-1]
    # per-axis handedness flips (sharpen tab flip_x/flip_y/flip_z;
    # volume axes are (z, y, x))
    for key, ax in (("sharpen_flip_z", 0), ("sharpen_flip_y", 1),
                    ("sharpen_flip_x", 2)):
        if params.get(key):
            out_vol = jnp.flip(jnp.asarray(out_vol), axis=ax)
    mrc.write(np.asarray(out_vol, dtype=np.float32), out_map, pixel_size=pixel)
    np.savetxt(
        maps_dir / f"{dataset}_fsc_masked.txt",
        np.stack([np.asarray(freqs) / pixel, np.asarray(curve)], 1),
        header="freq_1_per_A fsc_corrected",
    )
    if params.get("sharpen_ampl_corr"):
        # expert validation curves (relion_postprocess --ampl_corr role)
        fa, ac, dpr = fsc_mod.amplitude_correlation_and_dpr(
            half1 * mask, half2 * mask)
        np.savetxt(
            maps_dir / f"{dataset}_ampl_corr.txt",
            np.stack([np.asarray(fa) / pixel, np.asarray(ac),
                      np.asarray(dpr)], 1),
            header="freq_1_per_A amplitude_correlation dpr_deg",
        )
        out_extra_ampl = str(maps_dir / f"{dataset}_ampl_corr.txt")
    else:
        out_extra_ampl = None
    out = {
        "resolution_A": res,
        "bfactor": float(bfac),
        "map": str(out_map),
        "halves": [str(h1p), str(h2p)],
    }
    if out_extra_ampl:
        out["ampl_corr"] = out_extra_ampl

    if params.get("sharpen_half_maps"):
        # postprocessed half maps for validation (--half_maps role)
        for tag, h in (("half1", half1), ("half2", half2)):
            sh, _ = sharpen_map(
                jnp.asarray(h), pixel, bfactor=float(bfac),
                resolution=(res if params.get("sharpen_final_lowpass", True)
                            else None),
                fsc_curve=(curve if params.get("sharpen_fsc_weight", True)
                           else None))
            hp = maps_dir / f"{dataset}_{tag}_postprocessed.mrc"
            mrc.write(np.asarray(
                sh * mask if params.get("sharpen_apply_mask", True) else sh,
                dtype=np.float32), hp, pixel_size=pixel)
            out[f"{tag}_postprocessed"] = str(hp)

    if params.get("sharpen_locres"):
        # local resolution + locally-filtered map (relion_postprocess
        # --locres role, reference postprocess/core.py:325-364)
        from pyp_tpu.postprocess.locres import local_filter, local_resolution

        locres_map, _pts, vals = local_resolution(
            half1, half2, pixel,
            sampling_a=float(params.get("sharpen_locres_sampling") or 25.0),
            maskrad_a=float(params.get("sharpen_locres_maskrad") or -1.0),
            edgwidth_a=float(params.get("sharpen_locres_edgwidth") or -1.0),
            randomize_at_a=float(
                params.get("sharpen_locres_randomize_at") or 25.0),
            minres_a=float(params.get("sharpen_locres_minres") or 50.0),
            threshold=float(params.get("sharpen_fsc_cut") or 0.143),
        )
        max_res = float(params.get("sharpen_resmap_max_res") or 0.0)
        if max_res > 0:
            # resmap max-resolution clamp (sharpen tab resmap_max_res)
            locres_map = jnp.maximum(jnp.asarray(locres_map), max_res)
            vals = np.maximum(np.asarray(vals), max_res)
        locres_path = maps_dir / f"{dataset}_locres.mrc"
        mrc.write(np.asarray(locres_map, dtype=np.float32), locres_path,
                  pixel_size=pixel)
        out["locres_map"] = str(locres_path)
        out["locres_median_A"] = float(np.median(vals))
        if params.get("sharpen_locfilt", True):
            filt = local_filter(sharp, locres_map, pixel)
            if params.get("sharpen_apply_mask", True):
                filt = filt * mask
            locfilt_path = maps_dir / f"{dataset}_locfilt.mrc"
            mrc.write(np.asarray(filt, dtype=np.float32), locfilt_path,
                      pixel_size=pixel)
            out["locfilt_map"] = str(locfilt_path)
        logger.info("locres: median %.2f Å over %d samples",
                    out["locres_median_A"], len(vals))

    logger.info("postprocess: %.2f Å, B=%.0f", res, bfac)
    return out
