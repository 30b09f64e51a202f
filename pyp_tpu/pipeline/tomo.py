"""Tilt-series (TOMO) preprocessing pipeline.

Rebuild of the reference's `tomo_swarm` worker (call stack SURVEY §3.2,
bin/run/pyp:1734): per tilt-series — per-tilt frame alignment, tilt-series
alignment (xcorr prealign + patch-track model solve), per-tilt CTF, tomogram
reconstruction by WBP, 3D particle picking — with metadata-driven resume.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pyp_tpu.io.metadata import ItemMetadata
from pyp_tpu.utils import Timer, get_logger

logger = get_logger("tomo")


def assemble_tilt_series(mdoc_path, params: dict) -> dict:
    """Assemble a tilt series from raw per-tilt movies listed in a SerialEM
    .mdoc (the reference's read_tilt_series preprocess/core.py:176 +
    tomo_swarm per-tilt frame alignment, bin/run/pyp:1741-1756): each tilt
    movie is frame-aligned with the motion kernel, averages are stacked in
    tilt-angle order, and cumulative exposure follows acquisition (ZValue)
    order. Returns an item dict for process_tilt_series:
    {"name", "tilts", "angles", "doses", "order"}."""
    import jax.numpy as jnp
    from pathlib import Path

    from pyp_tpu.io import mdoc as mdoc_io
    from pyp_tpu.ops import motion
    from pyp_tpu.pipeline.spr import apply_gain, load_movie

    mdoc_path = Path(mdoc_path)
    md = mdoc_io.read(mdoc_path)
    angles = np.asarray(mdoc_io.tilt_angles(md), dtype=np.float32)
    doses = np.asarray(mdoc_io.exposure_doses(md), dtype=np.float32)
    if not doses.any():
        doses = np.full(len(angles),
                        float(params.get("scope_dose_rate") or 1.0),
                        dtype=np.float32)
    paths = mdoc_io.subframe_paths(md)
    pixel = float(params["scope_pixel"])
    base = mdoc_path.parent

    avgs = []
    for rel in paths:
        f = None
        for cand in (base / str(rel), base / Path(str(rel)).name):
            if cand.exists():
                f = cand
                break
        if f is None:
            raise FileNotFoundError(
                f"tilt movie {rel!r} from {mdoc_path.name} not found in {base}"
            )
        frames = apply_gain(load_movie(f, params), params)
        if frames.shape[0] == 1:
            avgs.append(frames[0].astype(np.float32))
            continue
        fj = jnp.asarray(frames)
        if fj.size > 300_000_000:  # same HBM guard as the SPA path
            res = motion.align_movie_large(
                fj, pixel_size=pixel, binning=2,
                bfactor=float(params.get("movie_bfactor") or 1500.0),
                max_iters=int(params.get("movie_iters") or 8),
                smooth_order=int(params.get("movie_smooth_order") or 3),
            )
        else:
            res = motion.align_movie(
                fj, pixel_size=pixel,
                bfactor=float(params.get("movie_bfactor") or 1500.0),
                max_iters=int(params.get("movie_iters") or 8),
                search_radius=float(params.get("movie_search") or 48.0),
                smooth_order=int(params.get("movie_smooth_order") or 3),
            )
        avgs.append(np.asarray(res.average, dtype=np.float32))

    cum = np.cumsum(doses).astype(np.float32)  # acquisition order
    order = np.argsort(angles, kind="stable")
    return {
        "name": mdoc_path.name.replace(".mrc.mdoc", "").replace(".mdoc", ""),
        "tilts": np.stack(avgs)[order],
        "angles": angles[order],
        "doses": cum[order],
        # acquisition rank per sorted tilt (for dose-symmetric bookkeeping):
        # sorted tilt i came from acquisition index order[i]
        "order": order.astype(np.int64),
    }


def process_tilt_series(item, params: dict, work_dir=".") -> dict:
    """`item`: {"name", "tilts": (T, ny, nx) array or path, "angles": (T,)}"""
    import jax.numpy as jnp

    from pyp_tpu.core.fft import bin_images
    from pyp_tpu.ops import ctf_fit, pick, tomo

    name = item["name"]
    meta = ItemMetadata(name, work_dir, mode="tomo").load()
    meta.refresh(params)
    pixel = float(params["scope_pixel"])
    summary = {"name": name}

    tilts = item.get("tilts")
    if tilts is None:
        from pyp_tpu.io import mrc

        tilts = mrc.read(item["path"]).astype(np.float32)
    tilts = np.asarray(tilts, dtype=np.float32)
    angles = np.asarray(item["angles"], dtype=np.float32)
    tiltoff = float(params.get("tomo_ali_tiltoff") or 0.0)
    if tiltoff:
        # constant stage-angle offset applied before alignment (reference
        # tomo_ali tiltoff / AreTomo -TiltCor role)
        angles = angles + tiltoff
        summary["tilt_offset_deg"] = tiltoff

    # tilt exclusion (the reference's tomoedit mode: drop bad tilts); indices
    # come from the item, a prior edit, or params "tomo_ali_exclude" ("3:7")
    excl = item.get("exclude")
    if excl is None and "exclude" in meta:
        excl = meta["exclude"].astype(int).tolist()
    if excl is None:
        raw = str(params.get("tomo_ali_exclude") or "").strip()
        excl = [int(x) for x in raw.split(":") if x] if raw else []
    # angular exclusion window (reference tilt range controls)
    lo_a = float(params.get("tomo_min_tilt", -90.0))
    hi_a = float(params.get("tomo_max_tilt", 90.0))
    if lo_a > -90.0 or hi_a < 90.0:
        excl = sorted(set(excl) | {
            int(i) for i in np.where((angles < lo_a) | (angles > hi_a))[0]})
    dark_tol = float(params.get("tomo_ali_aretomo_dark_tol") or 0.0)
    if dark_tol > 0:
        # auto-drop dark tilts (AreTomo -DarkTol role): mean intensity
        # below tol x the median tilt mean counts as dark
        means = tilts.reshape(tilts.shape[0], -1).mean(axis=1)
        means = means - means.min() + 1e-6  # tolerate negative-mean data
        dark = np.where(means < dark_tol * np.median(means))[0]
        if dark.size:
            logger.info("%s: dropping %d dark tilts (dark_tol %.2f)",
                        name, dark.size, dark_tol)
            excl = sorted(set(excl) | set(map(int, dark)))
    if excl:
        keep = np.setdiff1d(np.arange(len(angles)), np.asarray(excl, dtype=int))
        tilts = tilts[keep]
        angles = angles[keep]
        for k in ("doses", "order"):
            if item.get(k) is not None:
                item[k] = np.asarray(item[k])[keep]
        meta["exclude"] = np.asarray(excl, dtype=np.int64)
        summary["excluded_tilts"] = list(map(int, excl))
    meta["tlt"] = angles

    if params.get("tomo_ali_square") and tilts.shape[-2] != tilts.shape[-1]:
        # pad rectangular detectors to square before processing (etomo
        # square role): keeps FFT shapes uniform across the pipeline
        side = max(tilts.shape[-2:])
        py, px = side - tilts.shape[-2], side - tilts.shape[-1]
        tilts = np.pad(tilts, ((0, 0), (py // 2, py - py // 2),
                               (px // 2, px - px // 2)), mode="reflect")
        summary["squared_to"] = side
    binning = int(params.get("tomo_ali_bin") or 4)
    binning = max(1, min(binning, tilts.shape[-1] // 128 or 1))
    tilts_b = np.asarray(bin_images(jnp.asarray(tilts), binning)) if binning > 1 else tilts
    pixel_b = pixel * binning

    # ---- tilt-series alignment -------------------------------------------
    import_xf = str(params.get("tomo_ali_import_path") or "")
    if not meta.is_done("xf") and (params.get("tomo_ali_method") == "import"
                                   or import_xf):
        # external alignment import (reference tomo_ali import role):
        # read the IMOD .xf next to the series (or the explicit path)
        from pyp_tpu.io.imod import read_xf

        xf_path = Path(import_xf) if import_xf else None
        if xf_path is not None and xf_path.is_dir():
            xf_path = xf_path / f"{name}.xf"
        if xf_path is None or not xf_path.exists():
            cand = Path(item.get("path") or ".").with_suffix(".xf")
            xf_path = cand if cand.exists() else None
        if xf_path is None:
            logger.warning("%s: no .xf found to import — aligning natively",
                           name)
        else:
            sh_xf, rot_xf = read_xf(xf_path)
            if sh_xf.shape[0] != len(angles):
                raise ValueError(
                    f"{xf_path}: {sh_xf.shape[0]} transforms for "
                    f"{len(angles)} tilts")
            meta["xf"] = np.concatenate(
                [sh_xf, rot_xf[:, None]], axis=1).astype(np.float32)
            summary["align_imported"] = str(xf_path)
    if not meta.is_done("xf") and params.get("tomo_ali_method") not in (
            "skip", "import"):
        with Timer("tilt-series alignment"):
            shifts = tomo.prealign_tilt_series(
                jnp.asarray(tilts_b), angles,
                bp_low=float(params.get("tomo_ali_bp_low") or 0.01),
                bp_high=float(params.get("tomo_ali_bp_high") or 0.2))
            # gold-fiducial path (primary when beads are present, reference
            # align/core.py:5679-5726): bead tracking + robust model solve
            fid_nm = float(params.get("tomo_ali_fiducial") or 0.0)
            fid_done = False
            # nominal axis from the microscope config: the fallback when
            # neither beads nor patches constrain it
            axis_angle = float(params.get("scope_tilt_axis") or 0.0)
            if fid_nm > 0:
                bead_radius_px = max(2.0, fid_nm * 10.0 / (2.0 * pixel_b))
                try:
                    model, coords, tracks, w = tomo.align_tilt_series_fiducial(
                        jnp.asarray(tilts_b), angles,
                        bead_radius_px=bead_radius_px,
                        max_beads=int(params.get("tomo_ali_fiducial_n") or 40),
                        min_beads=int(params.get("tomo_ali_min_beads") or 4),
                        tukey_factor=float(
                            params.get("tomo_ali_robust_fitting_factor")
                            or 1.0),
                        fixed_alpha=(axis_angle
                                     if params.get("ctf_tilt_axis_known")
                                     else None),
                    )
                    shifts = -np.asarray(model.shifts)
                    axis_angle = float(model.axis_angle)
                    summary["align_residual_px"] = float(model.residual) * binning
                    summary["align_beads"] = int(coords.shape[0])
                    meta["fid"] = np.asarray(coords) * binning
                    fid_done = True
                except ValueError as e:
                    logger.warning("%s: %s — falling back to patch tracking",
                                   name, e)
            # patch-track + projection model refinement
            npatch = int(params.get("tomo_ali_patches") or 0)
            if fid_done:
                pass
            elif npatch > 0:
                ny, nx = tilts_b.shape[-2:]
                ps = int(params.get("tomo_ali_patch_size") or 64)
                g = max(2, int(np.sqrt(npatch)))
                ys = np.linspace(ny * 0.25, ny * 0.75, g)
                xs = np.linspace(nx * 0.25, nx * 0.75, g)
                centers = np.array([(y, x) for y in ys for x in xs], dtype=np.float32)
                tracks = tomo.track_patches(jnp.asarray(tilts_b), shifts, angles,
                                            centers, patch_size=ps)
                if params.get("tomo_ali_robust_fitting", True):
                    # tiltalign robust-fitting role on the patch tracks
                    model, _w = tomo.solve_projection_model_robust(
                        tracks, angles, (ny, nx),
                        tukey_factor=float(
                            params.get("tomo_ali_robust_fitting_factor")
                            or 1.0),
                        fixed_alpha=(axis_angle
                                     if params.get("ctf_tilt_axis_known")
                                     else None))
                else:
                    model = tomo.solve_projection_model(
                        tracks, angles, (ny, nx),
                        iters=int(params.get("tomo_ali_model_iters") or 5))
                shifts = -np.asarray(model.shifts)
                axis_angle = float(model.axis_angle)
                summary["align_residual_px"] = float(model.residual) * binning
            meta["xf"] = np.concatenate(
                [np.asarray(shifts) * binning,
                 np.full((len(angles), 1), axis_angle)], axis=1,
            )
    if meta.is_done("xf"):
        summary["axis_angle"] = float(meta["xf"][0, 2])

    # ---- per-tilt CTF -----------------------------------------------------
    if not meta.is_done("ctf"):
        with Timer("per-tilt CTF"):
            fits = ctf_fit.fit_ctf_tilt_series(
                jnp.asarray(tilts), pixel,
                tile=min(int(params.get("ctf_tile") or 512), min(tilts.shape[-2:])),
                dfmin=float(params["ctf_min_def"]),
                dfmax=float(params["ctf_max_def"]),
                dfstep=float(params["ctf_fstep"]),
                min_res=float(params["ctf_min_res"]),
                max_res=max(float(params["ctf_max_res"]), 8.0),
            )
            meta["ctf"] = np.stack([
                np.asarray(fits.df1), np.asarray(fits.df2),
                np.asarray(fits.angast), np.asarray(fits.cc),
                np.asarray(fits.fit_res),
            ], axis=1)
    summary["mean_defocus"] = float(np.mean(meta["ctf"][:, :2]))

    # ---- tomogram reconstruction ------------------------------------------
    rec_bin = int(params.get("tomo_rec_binning") or 8)
    rec_bin = max(1, rec_bin // binning)
    thickness = max(32, int(params.get("tomo_rec_thickness") or 2048) // (binning * rec_bin))
    if not meta.is_done("rec_done") or params.get("tomo_rec_force"):
        with Timer("tomogram reconstruction"):
            t2 = (
                np.asarray(bin_images(jnp.asarray(tilts_b), rec_bin))
                if rec_bin > 1 else tilts_b
            )
            # gold-fiducial erasure before backprojection (the reference's
            # ccderaser pass, merge/core.py:251-320): bright/dark bead disks
            # streak across the whole tomogram otherwise
            if params.get("tomo_rec_erase_fiducials"):
                rad_px = max(2.0, float(params.get("tomo_rec_gold_rad") or 100.0)
                             / (pixel * binning * rec_bin))
                # erase disk = factor x bead radius (reference erase_factor)
                er_f = float(params.get("tomo_rec_erase_factor") or 1.5)
                erased = []
                for t in t2:
                    beads = pick.detect_gold_beads(
                        jnp.asarray(t), bead_radius_px=max(2, int(rad_px)))
                    erased.append(np.asarray(pick.erase_blobs(
                        jnp.asarray(t), beads.coords, beads.valid,
                        er_f * rad_px)))
                t2 = np.asarray(erased, dtype=np.float32)
                summary["fiducials_erased"] = True
            # cumulative-dose weighting per tilt (the reference's mtffilter
            # dose filter, merge/core.py:219-249); acquisition order defaults
            # to dose-symmetric (|angle| rank) when the item gives no order
            if params.get("tomo_rec_dose_weighting"):
                from pyp_tpu.core.ctf import dose_weight_2d

                cum = item.get("doses")  # true cumulative e/Å² (mdoc)
                if cum is None:
                    order = item.get("order")
                    if order is None:
                        order = np.argsort(np.argsort(np.abs(angles)))
                    dose_per = float(params.get("scope_dose_rate") or 1.0)
                    cum = (float(params.get("scope_init_dose") or 0.0)
                           + (np.asarray(order, dtype=np.float32) + 1.0)
                           * dose_per)
                cum = np.asarray(cum, dtype=np.float32)
                w = dose_weight_2d(t2.shape[-2:], pixel * binning * rec_bin,
                                   jnp.asarray(cum))
                t2 = np.asarray(jnp.fft.irfft2(
                    jnp.fft.rfft2(jnp.asarray(t2)) * w, s=t2.shape[-2:]),
                    dtype=np.float32)
                summary["dose_weighted"] = True
            erase_a = float(params.get("tomo_rec_erase_rad") or 0.0)
            if erase_a > 0:
                # gold erasure before backprojection (the reference's
                # ccderaser pass, merge/core.py:309): detect beads per
                # tilt and median-fill their disks
                from pyp_tpu.ops import pick as _pick

                er_px = max(2, int(erase_a / (pixel * binning * rec_bin)))
                t2 = np.stack([np.asarray(_pick.erase_blobs(
                    jnp.asarray(t2[i]),
                    *(lambda g: (g.coords, g.valid))(_pick.detect_gold_beads(
                        jnp.asarray(t2[i]), bead_radius_px=er_px)),
                    float(params.get("tomo_rec_erase_factor") or 1.5)
                    * er_px)) for i in range(t2.shape[0])])
            # defocus handedness + depth-dependent CTF correction (IMOD
            # ctfphaseflip / reference ctf/core.py:1935 detect_handedness):
            # both consume the per-tilt CTF fits; tilts here are already
            # rotated so the tilt axis is vertical -> axis_angle = 0
            if meta.is_done("ctf") and np.asarray(meta["ctf"]).ndim == 2:
                ctf_t = np.asarray(meta["ctf"], dtype=np.float32)
                df_axis = 0.5 * (ctf_t[:, 0] + ctf_t[:, 1])
                eff_px = pixel * binning * rec_bin
                if params.get("tomo_hand_detect"):
                    hand, grads = tomo.detect_handedness(
                        t2, angles, df_axis, eff_px,
                        voltage_kv=float(params["scope_voltage"]),
                        cs_mm=float(params["scope_cs"]),
                        w=float(params["scope_wgh"]),
                        min_tilt=float(params.get("tomo_hand_min_tilt")
                                       or 20.0),
                        max_tilt=float(params.get("tomo_hand_max_tilt")
                                       or 90.0),
                        df_range=float(params.get("tomo_hand_df_range")
                                       or 8000.0),
                        df_step=float(params.get("tomo_hand_df_step")
                                      or 250.0))
                    summary["handedness"] = int(hand)
                if params.get("tomo_rec_ctf_correct"):
                    t2 = np.asarray(tomo.ctf_correct_tilts(
                        jnp.asarray(t2), jnp.asarray(angles),
                        jnp.asarray(df_axis), eff_px,
                        voltage_kv=float(params["scope_voltage"]),
                        cs_mm=float(params["scope_cs"]),
                        amplitude_contrast=float(params["scope_wgh"]),
                        n_bands=int(params.get("tomo_rec_ctf_bands") or 20),
                    ), dtype=np.float32)
                    summary["ctf_corrected"] = True
            xf = meta["xf"] if meta.is_done("xf") else np.zeros((len(angles), 3))
            shifts_r = xf[:, :2] / (binning * rec_bin)
            if str(params.get("tomo_rec_method") or "wbp") == "sart":
                # iterative SART/SIRT (the reference's AreTomo -Sart path)
                recon = tomo.sart_reconstruct(
                    jnp.asarray(t2), jnp.asarray(angles),
                    shifts=jnp.asarray(shifts_r.astype(np.float32)),
                    thickness=thickness,
                    iterations=int(params.get("tomo_rec_sart_iters") or 10),
                    relax=float(params.get("tomo_rec_sart_relax") or 0.25),
                    subsets=int(params.get("tomo_rec_sart_subsets") or 4),
                )
            else:
                recon = tomo.wbp_reconstruct(
                    jnp.asarray(t2), jnp.asarray(angles),
                    shifts=jnp.asarray(shifts_r.astype(np.float32)),
                    thickness=thickness,
                    cutoff=float(params.get("tomo_rec_filter_cutoff") or 0.35),
                    falloff=float(params.get("tomo_rec_filter_falloff") or 0.05),
                    slab=min(int(params.get("tomo_rec_slab") or 16), thickness),
                    fake_sirt=int(params.get("tomo_rec_fake_sirt") or 0),
                    window=str(params.get("tomo_rec_filter_window")
                               or "none"),
                    z_shift=float(params.get("tomo_rec_zshift") or 0.0),
                )
            from pyp_tpu.io import mrc

            rec_path = f"{work_dir}/{name}.rec.mrc"
            rec_dtype = (np.float16 if params.get("tomo_rec_float16")
                         else np.float32)
            mrc.write(np.asarray(recon, dtype=rec_dtype), rec_path,
                      pixel_size=pixel * binning * rec_bin)
            meta["rec_done"] = np.array([1])
            summary["tomogram"] = rec_path
            if params.get("tomo_rec_generate_halves"):
                # even/odd-tilt half tomograms beside the reconstruction
                # (reference tomo_rec generate_halves: denoiser training /
                # validation inputs)
                h1, h2 = tomo.wbp_reconstruct_halves(
                    jnp.asarray(t2), jnp.asarray(angles),
                    shifts=jnp.asarray(shifts_r.astype(np.float32)),
                    thickness=thickness,
                    slab=min(int(params.get("tomo_rec_slab") or 16),
                             thickness))
                for tag, h in (("half1", h1), ("half2", h2)):
                    mrc.write(np.asarray(h, dtype=rec_dtype),
                              f"{work_dir}/{name}.rec_{tag}.mrc",
                              pixel_size=pixel * binning * rec_bin)
                summary["tomogram_halves"] = True

            # optional denoising (cryoCARE/IsoNet roles, native models):
            # n2n trains on even/odd-tilt half tomograms of THIS series
            method_dn = str(params.get("denoise_method") or "none")
            if method_dn == "none" and params.get("denoise_enable"):
                method_dn = "bm4d"  # reference denoise tab default method
            if method_dn != "none":
                with Timer(f"tomogram denoising ({method_dn})"):
                    from pyp_tpu.models import denoise as dn

                    steps = int(params.get("denoise_epochs") or 60)
                    lr = float(params.get("denoise_lr") or 1e-3)
                    if method_dn == "deconv":
                        # Wiener CTF deconvolution (IsoNet deconv role,
                        # reference detect/isonet_tools.py:64) — analytic,
                        # no training; uses the series' mean fitted defocus
                        df_mean = float(np.mean(np.asarray(
                            meta["ctf"])[:, :2]))
                        den = tomo.ctf_deconvolve(
                            np.asarray(recon, dtype=np.float32), df_mean,
                            pixel * binning * rec_bin,
                            voltage_kv=float(params["scope_voltage"]),
                            cs_mm=float(params["scope_cs"]),
                            w=float(params["scope_wgh"]),
                            snr_falloff=float(
                                params.get("denoise_deconv_snr") or 1.0),
                            deconv_strength=float(
                                params.get("denoise_deconv_strength") or 1.0),
                            highpass_nyquist=float(
                                params.get("denoise_deconv_highpass") or 0.02),
                            phase_flipped=bool(
                                params.get("tomo_rec_ctf_correct")),
                        )
                    elif method_dn == "n2n":
                        h1, h2 = tomo.wbp_reconstruct_halves(
                            jnp.asarray(t2), jnp.asarray(angles),
                            shifts=jnp.asarray(shifts_r.astype(np.float32)),
                            thickness=thickness,
                            slab=min(int(params.get("tomo_rec_slab") or 16),
                                     thickness),
                        )
                        model = dn.train_denoiser(
                            [np.asarray(h1)], [np.asarray(h2)],
                            steps=steps, lr=lr,
                            lr_finish=float(
                                params.get("denoise_lr_finish") or 0.0),
                            batch=int(params.get("denoise_batch") or 16),
                            seed=int(params.get("denoise_seed") or 0),
                            patch=min(int(params.get("denoise_patch") or 64),
                                      thickness, int(t2.shape[-1])),
                        )
                        den = dn.denoise_tomogram(model, np.asarray(recon))
                    elif method_dn in ("bm4d", "nad", "imod-nad"):
                        # classical training-free denoisers (reference
                        # [tabs.denoise] bm4d/imod-nad roles) as single
                        # XLA programs
                        from pyp_tpu.ops.denoise_classic import denoise_map

                        den = np.asarray(denoise_map(
                            np.asarray(recon, dtype=np.float32),
                            method=method_dn,
                            patch_size=int(
                                params.get("denoise_patch_size") or 4),
                            nsearch=int(params.get("denoise_nsearch") or 11),
                            sigma=float(params.get("denoise_sigma") or 0.25),
                            iters=int(params.get("denoise_iters") or 1)))
                    else:  # missing-wedge restoration
                        model = dn.train_wedge_restorer(
                            [np.asarray(recon)],
                            tilt_max_deg=float(np.abs(angles).max()),
                            steps=steps, lr=lr,
                            batch=int(params.get("denoise_batch") or 16),
                            seed=int(params.get("denoise_seed") or 0),
                            patch=min(32, thickness),
                        )
                        den = dn.restore_wedge(model, np.asarray(recon))
                    lp_a = float(params.get("denoise_lowpass") or 0.0)
                    if lp_a > 0:
                        # tomo_denoise lowpass card: smooth the denoised
                        # volume to the requested resolution
                        from pyp_tpu.core.filters import lowpass_filter_3d

                        den = np.asarray(lowpass_filter_3d(
                            jnp.asarray(np.asarray(den, dtype=np.float32)),
                            pixel * binning * rec_bin, lp_a),
                            dtype=np.float32)
                    den_path = f"{work_dir}/{name}.den.mrc"
                    mrc.write(np.asarray(den, dtype=np.float32), den_path,
                              pixel_size=pixel * binning * rec_bin)
                    summary["denoised"] = den_path

    # ---- open-membrane segmentation (MemBrain-Seg role, sheet half) ------
    if params.get("tomo_seg_open"):
        with Timer("membrane segmentation"):
            from pyp_tpu.io import mrc
            from pyp_tpu.ops.filament import segment_membranes

            recon = mrc.read(f"{work_dir}/{name}.rec.mrc")
            effp = pixel * binning * rec_bin
            mask_vol, _S, _normals = segment_membranes(
                recon,
                thickness_px=float(params.get("tomo_seg_thickness") or 30.0)
                / effp,
                threshold=float(params.get("tomo_seg_thresh") or 0.3))
            seg_path = f"{work_dir}/{name}.seg.mrc"
            mrc.write(mask_vol.astype(np.float32), seg_path,
                      pixel_size=effp)
            summary["segmentation"] = seg_path
            summary["membrane_fraction"] = round(float(mask_vol.mean()), 5)

    # ---- 3D particle picking ---------------------------------------------
    method = params.get("tomo_spk_method", "none")
    if not meta.is_done("box") and method == "import" and params.get(
            "tomo_pick_files"):
        # coordinate import ([tabs.tomo_pick] files/files_flip cards):
        # <dir>/<name>.{spk,box,mod,cbox} per series, optional z flip
        with Timer("3D pick import"):
            from pyp_tpu.io import boxfiles

            base = Path(str(params["tomo_pick_files"]))
            rows = None
            for ext in (".spk", ".box", ".mod", ".cbox", ".next"):
                cand = (base / f"{name}{ext}") if base.is_dir() else base
                if cand.exists() and str(cand).endswith(ext):
                    rows = np.asarray(boxfiles.read_coords(str(cand)),
                                      dtype=np.float32)
                    break
            if rows is not None and len(rows):
                coords3 = rows[:, :3]
                if params.get("tomo_pick_files_flip"):
                    nz = float(params.get("tomo_rec_thickness")
                               or coords3[:, 0].max() + 1)
                    coords3 = coords3.copy()
                    coords3[:, 0] = nz - coords3[:, 0]
                box4 = np.concatenate(
                    [coords3, np.ones((len(coords3), 1), np.float32)], 1)
                meta["box"] = box4
                summary["particles"] = len(box4)
            else:
                logger.warning("tomo_pick import: no coordinate file for "
                               "%s under %s", name, base)
    elif not meta.is_done("box") and method in ("auto", "surface",
                                                "template", "filament"):
        with Timer("3D particle picking"):
            from pyp_tpu.io import mrc

            recon = mrc.read(f"{work_dir}/{name}.rec.mrc")
            pick_vol = recon
            if params.get("tomo_mem_use_denoised") and summary.get(
                    "denoised"):
                # pick on the denoised tomogram (tomo_mem use_denoised)
                pick_vol = mrc.read(summary["denoised"]).astype(np.float32)
            box, vir, spk_eulers = pick_particles_3d(
                pick_vol, params, pixel * binning * rec_bin)
            meta["box"] = box
            if spk_eulers is not None:
                # surface-normal orientation priors for CSPT init
                meta["spk_eulers"] = spk_eulers
            if vir is not None:
                meta["vir"] = vir
                summary["virions"] = len(vir)
            summary["particles"] = len(box)

    if params.get("plot_per_item", True):
        # per-series diagnostics sheet (the reference renders webp panels
        # per tilt-series for the web UI; here a png the report embeds)
        try:
            from pyp_tpu.analysis.plots import plot_tilt_series_panel

            plot_tilt_series_panel(
                meta["tlt"],
                meta["xf"] if meta.is_done("xf") else None,
                meta["ctf"] if meta.is_done("ctf") else None,
                f"{work_dir}/{name}_tilts.png")
        except (OSError, ValueError, KeyError) as e:
            logger.warning("per-series plot skipped: %s", e)

    meta.scalars.update({"pixel": pixel, "binning": binning * rec_bin})
    meta.save()
    return summary


def pick_particles_3d(recon, params: dict, eff_pixel: float):
    """3D picking dispatch on a reconstructed tomogram — the role of the
    reference's detect/tomo/core.py mode switch (tomo_spk_method):

    * "auto": per-slab intensity picking (size-based, detect/core.py style).
    * "surface": Hough sphere detection -> spherical-harmonics membrane
      refinement (`ops/template_match.refine_surface_sh`) -> surface points
      as picks (virus_segment_membrane + detect_particles_from_surface).
    * "template": exhaustive 3D template matching against a reference map
      (TOMO Correlation3DNew).

    Returns (box (N, 4) float32 rows (z, y, x, score),
    vir (V, 5) rows (z, y, x, radius_px, score) or None).
    """
    import jax.numpy as jnp

    from pyp_tpu.ops import pick
    from pyp_tpu.ops import template_match as tm

    method = params.get("tomo_spk_method", "auto")
    rad_px = max(2, int(float(params["tomo_spk_rad"]) / eff_pixel))
    recon = np.asarray(recon, dtype=np.float32)
    coords = []
    euler_rows = []
    vir = None

    if method == "surface":
        vir_rad_px = max(4.0, float(params.get("tomo_vir_rad") or 0)
                         / eff_pixel or 3.0 * rad_px)
        radii = np.linspace(0.75 * vir_rad_px, 1.25 * vir_rad_px, 5)
        # detection band: lowpass the tomogram before the sphere Hough so
        # the edge map sees the membrane, not high-frequency noise
        # (reference detect band, detect/tomo/core.py:579)
        det_vol = recon
        band_a = float(params.get("tomo_vir_detect_band") or 0.0)
        if band_a > 0:
            from pyp_tpu.core.filters import lowpass_filter_3d

            det_vol = np.asarray(lowpass_filter_3d(
                jnp.asarray(recon), eff_pixel, band_a))
        det_tol_px = (float(params.get("tomo_vir_det_tol") or 0.0)
                      / eff_pixel) or None
        vbin = int(params.get("tomo_vir_binn") or 1)
        if vbin > 1:
            # detection binning (tomo_pick vir_binn): the sphere Hough on a
            # Fourier-binned volume, seeds scaled back up
            from pyp_tpu.core.fft import fourier_crop_3d

            small = tuple(max(16, d // vbin) for d in det_vol.shape)
            det_vol = np.asarray(fourier_crop_3d(
                jnp.asarray(det_vol), out_shape=small), dtype=np.float32)
            radii = radii / vbin
            if det_tol_px:
                det_tol_px /= vbin
        vir_method = str(params.get("tomo_vir_method") or "none")
        if vir_method == "template":
            # spherical-shell NCC template instead of the Canny+Hough-style
            # edge detector (reference Correlation3DNew virion seeding)
            centers, rads, scores, valid = tm.detect_spheres_template(
                jnp.asarray(det_vol), radii,
                n_peaks=int(params.get("tomo_vir_detect_max") or 8),
                min_distance=det_tol_px)
        elif vir_method == "nn":
            # MemBrain-seg role: per-slice membrane segmentation NN, then
            # the sphere Hough votes on the (clean) probability map
            from pathlib import Path as _Path

            from pyp_tpu.models import io as mio
            from pyp_tpu.models import membrane as mem

            mpath = _Path(str(params.get("tomo_mem_model") or "")
                          or str(params.get("tomo_vir_nn_model") or "")
                          or "membrane_model.npz")
            feats = (16, 32, 64)
            if mpath.exists():
                like = mem.train_membrane_segmenter(steps=0, features=feats)
                loaded, _meta = mio.load_params(mpath, like.params)
                model = mem.MembraneModel(params=loaded, features=feats)
            else:
                model = mem.train_membrane_segmenter(
                    steps=int(params.get("tomo_vir_nn_steps") or 400),
                    seed=int(params.get("train_seed") or 0),
                    patch=int(params.get("tomo_mem_patch_pxl") or 96),
                    features=feats)
                mio.save_params(model.params, mpath)
            # the segmenter was trained on raw-contrast slices and handles
            # noise itself — the Hough detection band is NOT applied here
            prob = mem.segment_tomogram(model, recon)
            seg_thres = float(params.get("tomo_mem_seg_thres") or 0.0)
            if seg_thres > 0:
                # probability floor (tomo_mem seg_thres): weak responses
                # don't vote in the sphere Hough
                prob = np.where(np.asarray(prob) >= seg_thres, prob, 0.0)
            if params.get("tomo_mem_store_probabilities"):
                from pyp_tpu.io import mrc as _mrc2

                _mrc2.write(np.asarray(prob, dtype=np.float32),
                            "membrane_prob.mrc")
            centers, rads, scores, valid = \
                mem.detect_virions_from_segmentation(
                    prob, radii,
                    n_peaks=int(params.get("tomo_vir_detect_max") or 8))
        else:
            centers, rads, scores, valid = tm.detect_spheres(
                jnp.asarray(det_vol), radii,
                n_peaks=int(params.get("tomo_vir_detect_max") or 8),
                min_distance=det_tol_px)
        centers, rads, scores = (np.asarray(centers), np.asarray(rads),
                                 np.asarray(scores))
        if vbin > 1:
            centers = centers * float(vbin)
            rads = rads * float(vbin)
        vir_rows = []
        n_pts = int(params.get("tomo_vir_points") or 200)
        margin = 2.0
        for c, r, s, v in zip(centers, rads, scores, np.asarray(valid)):
            if not v:
                continue
            # skip seeds whose search shell leaves the volume
            if (np.any(c - 1.3 * r < margin)
                    or np.any(c + 1.3 * r > np.asarray(recon.shape) - margin)):
                continue
            search_band = float(params.get("tomo_vir_search_band") or 0.3)
            tol_px = float(params.get("tomo_sphere_seg_tol_px") or 0.0)
            if tol_px > 0:  # tomo_sphere seg_tol card: band given in px
                search_band = min(0.6, tol_px / max(float(r), 1.0))
            pts, normals, rr = tm.refine_surface_sh(
                recon, c, float(r), n_points=n_pts,
                l_max=int(params.get("tomo_vir_lmax") or 4),
                iters=int(params.get("tomo_vir_sh_iters") or 80),
                lr=float(params.get("tomo_vir_sh_lr") or 0.3),
                smoothness=float(params.get("tomo_vir_sh_smoothness")
                                 or 0.05),
                search=search_band,
                n_radial=int(params.get("tomo_vir_radial_samples") or 31))
            off_px = float(params.get("tomo_srf_offset") or 0.0) / eff_pixel
            if off_px:
                # tomo_srf detect_offset: spikes sit a protein length above
                # the membrane — displace picks along the outward normal
                pts = pts + off_px * np.asarray(normals)
            vir_rows.append((*c, float(np.mean(rr)), float(s)))
            # surface-normal orientation priors (the reference's
            # detect_particles_from_surface euler initialization: spikes
            # sit perpendicular to the membrane) — normals are (z, y, x)
            from pyp_tpu.core.geometry import normal_to_euler

            nrm = np.asarray(normals)
            phi_n, theta_n, psi_n = normal_to_euler(
                jnp.asarray(nrm[:, 2]), jnp.asarray(nrm[:, 1]),
                jnp.asarray(nrm[:, 0]))
            for p, ph, th, ps in zip(pts, np.asarray(phi_n),
                                     np.asarray(theta_n),
                                     np.asarray(psi_n)):
                coords.append((p[0], p[1], p[2], float(s)))
                euler_rows.append((float(ph), float(th), float(ps)))
        vir = np.asarray(vir_rows, dtype=np.float32).reshape(-1, 5)
    elif method == "filament":
        # MemBrain-Seg / TARDIS role (docs/guide/segmentation.rst "Open
        # surfaces and filaments"): native Frangi vesselness + tracing;
        # tangent eulers become CSPT orientation priors like surface picks
        from pyp_tpu.ops.filament import pick_filaments

        spacing = float(params.get("tomo_spk_fil_spacing") or 0.0)
        spacing_px = (spacing / eff_pixel) if spacing > 0 else 2.0 * rad_px
        fil_coords, fil_eulers, fil_id = pick_filaments(
            recon, radius_px=float(rad_px), spacing_px=float(spacing_px),
            threshold=float(params.get("tomo_spk_fil_thresh") or 0.3),
            max_points=int(params.get("tomo_spk_max") or 200) * 20,
            min_points=int(params.get("tomo_spk_fil_min_points") or 4))
        for c, e in zip(fil_coords, fil_eulers):
            coords.append(tuple(c))
            euler_rows.append(tuple(e))
    elif method == "template":
        from pyp_tpu.io import mrc as _mrc
        from pyp_tpu.ops.refine3d import make_directions

        ref_path = params.get("tomo_pick_ref") or ""
        if not ref_path:
            raise ValueError(
                "tomo_spk_method=template requires -tomo_pick_ref <map.mrc>")
        template = _prepare_pick_template(
            _mrc.read(ref_path), params, eff_pixel)
        # tomogram conditioning (pytom low/high pass + whitening roles)
        vol = recon
        lp = float(params.get("tomo_pick_low_pass") or 0.0)
        hp = float(params.get("tomo_pick_high_pass") or 0.0)
        if lp > 0 or hp > 0:
            from pyp_tpu.core.filters import apply_bandpass

            lo_frac = (eff_pixel / hp) if hp > 0 else 0.0
            hi_frac = (eff_pixel / lp) if lp > 0 else 0.5
            # per-slab 2D bandpass keeps HBM bounded on big tomograms
            vol = np.asarray(apply_bandpass(
                jnp.asarray(vol), lo_frac, hi_frac), dtype=np.float32)
        if params.get("tomo_pick_spectral_whitening"):
            vol = _whiten_volume(vol)
        step = float(params.get("tomo_pick_ang") or 30.0)
        dirs = make_directions(step, params.get("particle_sym", "C1"))
        psis = np.arange(0.0, 360.0, step, dtype=np.float32)
        angles = np.array([(d[0], d[1], p) for d in dirs for p in psis],
                          dtype=np.float32)
        score, _ = tm.match_template_3d(jnp.asarray(vol),
                                        jnp.asarray(template), angles)
        score = np.asarray(score)
        if params.get("tomo_pick_random_phase_correction"):
            # background estimate from a phase-randomized template scored
            # at a single rotation (pytom random-phase correction): the
            # randomized template has the same spectrum but no structure,
            # so its score map is the match's noise floor
            rng_t = np.random.RandomState(0)
            Ft = np.fft.rfftn(np.asarray(template))
            Ft = np.abs(Ft) * np.exp(
                1j * rng_t.uniform(0, 2 * np.pi, Ft.shape))
            t_rand = np.fft.irfftn(Ft, s=template.shape).astype(np.float32)
            bg, _ = tm.match_template_3d(jnp.asarray(vol),
                                         jnp.asarray(t_rand),
                                         np.zeros((1, 3), np.float32))
            score = score - np.asarray(bg)
        thresh = float(params.get("tomo_spk_thresh") or 0.0)
        if params.get("tomo_pick_estimate_cutoff") and not thresh:
            thresh = _score_cutoff_from_fp(
                score,
                float(params.get("tomo_pick_n_false_positives") or 1.0))
        elif float(params.get("tomo_pick_cutoff") or 0.0) and not thresh:
            thresh = float(params["tomo_pick_cutoff"])
        pk, vals, valid = tm.pick_peaks_3d(
            jnp.asarray(score), int(params.get("tomo_spk_max") or 200),
            min_distance=rad_px, threshold=thresh)
        for (z, y, x), s, v in zip(np.asarray(pk), np.asarray(vals),
                                   np.asarray(valid)):
            if v:
                coords.append((z, y, x, float(s)))
    else:  # "auto": slab-wise intensity picking
        det = recon
        if params.get("tomo_pick_gaussian_3d"):
            # pre-smoothing ahead of detection (tomo_pick gaussian_3d /
            # sigma_3d cards): suppresses voxel noise before peak finding
            import scipy.ndimage as _ndi

            det = _ndi.gaussian_filter(
                recon, float(params.get("tomo_pick_sigma_3d") or 15.0) / 10.0)
        thr_sig = float(params.get("tomo_pick_stdtimes_filt_3d") or 0.0) \
            or float(params.get("tomo_spk_slab_thresh") or 4.0)
        edge = (2 * rad_px if params.get("tomo_pick_remove_edge_3d")
                else rad_px)
        for z in range(det.shape[0]):
            res = pick.pick_particles(
                jnp.asarray(det[z]), particle_radius_px=rad_px,
                max_picks=int(params.get("tomo_spk_slab_max") or 64),
                threshold_sigma=thr_sig,
                edge_px=edge,
                invert=False,
            )
            valid = np.asarray(res.valid)
            for (y, x), s in zip(np.asarray(res.coords)[valid],
                                 np.asarray(res.scores)[valid]):
                coords.append((z, y, x, s))
    box = np.asarray(coords, dtype=np.float32).reshape(-1, 4)
    # min-distance NMS across all picks (slab picking produces
    # near-duplicates at adjacent z): greedy by score, the reference's
    # detect dist behavior in 3D. Surface points are a mesh, not
    # duplicates — NMS only when explicitly requested there.
    dist_px = float(params.get("tomo_spk_dist") or 0.0) / eff_pixel
    rt = float(params.get("tomo_pick_radiustimes_3d") or 0.0)
    if dist_px <= 0 and rt > 0:
        dist_px = rt * rad_px          # tomo_pick radiustimes_3d card
    if dist_px <= 0 and method == "auto":
        dist_px = 2.0 * rad_px
    eulers = (np.asarray(euler_rows, dtype=np.float32)
              if euler_rows else None)
    if len(box) > 1 and dist_px > 0:
        from pyp_tpu.analysis.scores import remove_duplicates

        keep = remove_duplicates(box[:, :3], box[:, 3], dist_px)
        box = box[keep]
        if eulers is not None:
            eulers = eulers[keep]
    return box, vir, eulers


def tomo_merge(results: dict, missing: list, work_dir=".") -> dict:
    ok = [r for r in results.values() if r]
    out = {
        "tilt_series": len(ok),
        "missing": list(missing),
        "particles": int(sum(r.get("particles", 0) for r in ok)),
    }
    logger.info("merged %d tilt-series (%d missing)", len(ok), len(missing))
    return out


def _prepare_pick_template(template, params, eff_pixel: float):
    """Template conditioning for 3D matching (the pytom_* template cards of
    [tabs.tomo_pick]): optional resize to tomo_pick_template_size, contrast
    inversion, mirror, and masking (auto sphere / gaussian / file)."""
    import jax.numpy as jnp

    from pyp_tpu.core.fft import fourier_crop_3d
    from pyp_tpu.core.filters import soft_spherical_mask

    t = np.asarray(template, dtype=np.float32)
    size = int(params.get("tomo_pick_template_size") or 0)
    if size and size != t.shape[-1]:
        t = np.asarray(fourier_crop_3d(jnp.asarray(t),
                                       out_shape=(size, size, size)),
                       dtype=np.float32)
    if params.get("tomo_pick_template_invert"):
        t = -t
    if params.get("tomo_pick_template_mirror"):
        t = t[::-1].copy()
    mm = str(params.get("tomo_pick_mask_method") or "auto")
    n_t = t.shape[-1]
    if mm == "file" and params.get("tomo_pick_mask_file"):
        from pyp_tpu.io import mrc as _mrc

        t = t * np.asarray(_mrc.read(str(params["tomo_pick_mask_file"])),
                           dtype=np.float32)
    elif mm == "gaussian":
        sig = float(params.get("tomo_pick_mask_sigma") or 1.0) * n_t / 6.0
        ax = np.arange(n_t) - n_t // 2
        g = np.exp(-0.5 * (ax / max(sig, 1e-3)) ** 2).astype(np.float32)
        t = t * g[:, None, None] * g[None, :, None] * g[None, None, :]
    elif mm == "auto":
        t = t * np.asarray(soft_spherical_mask(n_t, n_t * 0.45, 3.0))
    return t


def _whiten_volume(vol):
    """Spectral whitening: divide the volume's Fourier coefficients by the
    radial amplitude profile (pytom_spectral_whitening role) — flattens the
    power spectrum so matching is not dominated by low-frequency contrast."""
    import jax.numpy as jnp

    from pyp_tpu.core import fsc as fsc_mod

    v = jnp.asarray(vol, dtype=jnp.float32)
    n = v.shape[-1]
    F = jnp.fft.rfftn(v)
    n_bins = n // 2
    bins = fsc_mod._shell_bins(n, n_bins)
    amp2 = jnp.zeros(n_bins).at[bins].add(jnp.abs(F.reshape(-1)) ** 2)
    cnt = jnp.zeros(n_bins).at[bins].add(1.0)
    prof = jnp.sqrt(jnp.maximum(amp2 / jnp.maximum(cnt, 1.0), 1e-12))
    w = (1.0 / prof)[jnp.clip(bins, 0, n_bins - 1)].reshape(F.shape)
    return np.asarray(jnp.fft.irfftn(F * w, s=v.shape), dtype=np.float32)


def _score_cutoff_from_fp(score_map, n_false_positives: float):
    """Threshold from a Gaussian background model: pick the value whose
    upper-tail expectation over the search volume equals the allowed
    false-positive count (pytom_estimate_cutoff role)."""
    import math

    s = np.asarray(score_map, dtype=np.float32).ravel()
    mu, sd = float(s.mean()), float(s.std() + 1e-9)
    n_vox = s.size
    # P(X > mu + k sd) = erfc(k/sqrt(2))/2 = n_fp / n_vox
    target = max(float(n_false_positives), 1e-3) / n_vox
    # invert erfc by bisection (k in [0, 8])
    lo, hi = 0.0, 8.0
    for _ in range(60):
        k = 0.5 * (lo + hi)
        if 0.5 * math.erfc(k / math.sqrt(2.0)) > target:
            lo = k
        else:
            hi = k
    return mu + 0.5 * (lo + hi) * sd
