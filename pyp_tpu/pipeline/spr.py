"""Single-particle (SPA) preprocessing pipeline.

The rebuild of the reference's `spr_swarm` worker (call stack SURVEY §3.1,
bin/run/pyp:1433): per micrograph — frame alignment, CTF estimation, particle
picking, extraction bookkeeping — with metadata-driven `is_done` resume
(pyp_metadata semantics) and a merge step that assembles the dataset-level
particle table. Each numerical stage calls the jit-compiled TPU kernels in
pyp_tpu.ops instead of shelling out to unblur/ctffind/binaries.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pyp_tpu.io import cistem, mrc
from pyp_tpu.io.metadata import ItemMetadata
from pyp_tpu.utils import Timer, get_logger

logger = get_logger("spr")

# per-process n2n model reuse across micrographs (see denoise_spr)
_spr_denoiser_cache: dict = {}


def load_movie(path, params=None):
    """Read a movie stack into (n_frames, ny, nx) float32. Dispatches every
    camera format the io layer decodes — MRC, TIFF, EER, DM3/DM4 (reference
    readMoviefileandsave, inout/image/core.py:913) — including bz2/gz
    compressed variants (the reference's pbzip2 transfer compression,
    inout/image/core.py:1338)."""
    path = str(path)
    params = params or {}
    if path.endswith((".bz2", ".gz")):
        import bz2
        import gzip
        import tempfile

        opener = bz2.open if path.endswith(".bz2") else gzip.open
        inner = path.rsplit(".", 1)[0]
        suffix = "." + inner.rsplit(".", 1)[-1]
        with opener(path, "rb") as f, tempfile.NamedTemporaryFile(
                suffix=suffix) as tmp:
            tmp.write(f.read())
            tmp.flush()
            return load_movie(tmp.name, params)
    if path.endswith((".tif", ".tiff")):
        from pyp_tpu.io.tiff import read as tiff_read

        return np.asarray(tiff_read(path), dtype=np.float32)
    if path.endswith(".eer"):
        from pyp_tpu.io import eer

        groups = int(params.get("movie_eer_frames") or 40)
        return eer.read(
            path, frame_groups=groups,
            upsampling=int(params.get("data_eer_upsampling") or 1),
        ).astype(np.float32)
    if path.endswith((".dm3", ".dm4")):
        from pyp_tpu.io import dm

        data = np.asarray(dm.read(path), dtype=np.float32)
        return data[None] if data.ndim == 2 else data
    data = mrc.read(path)
    if data.ndim == 2:
        data = data[None]
    return data.astype(np.float32)


def apply_gain(frames, params):
    if params.get("data_flipy"):
        frames = frames[:, ::-1]
    defects = str(params.get("gain_defects_file") or "")
    if defects:
        # camera defect list: rows "x y [w h]" (SerialEM/IMOD defect text);
        # defect pixels are unusable counts — replace with the per-frame
        # median so they neither bias the gain nor trip the hot-pixel pass
        med = np.median(frames, axis=(1, 2))
        for line in open(defects):
            row = line.split()
            if not row or row[0].startswith("#"):
                continue
            x, y = int(float(row[0])), int(float(row[1]))
            w = int(float(row[2])) if len(row) > 2 else 1
            h = int(float(row[3])) if len(row) > 3 else 1
            frames[:, y:y + h, x:x + w] = med[:, None, None]
    gain_path = params.get("gain_reference") or ""
    if not gain_path:
        return frames
    gain = mrc.read(gain_path).astype(np.float32)
    if gain.ndim == 3:
        gain = gain[0]
    rot = int(params.get("gain_rotation") or 0)
    if rot:
        gain = np.rot90(gain, rot)
    if params.get("gain_fliph"):
        gain = gain[:, ::-1]
    if params.get("gain_flipv"):
        gain = gain[::-1]
    frames = frames * gain[None]
    if params.get("movie_force_integer"):
        # counting cameras: round gain-corrected values back to integer
        # counts (reference movie tab force_integer)
        frames = np.rint(frames)
    return frames


def process_micrograph(item, params: dict, work_dir=".") -> dict:
    """Full per-micrograph preprocessing. `item` is {"name", "path"} or
    {"name", "frames": array}. Returns a summary dict; detailed arrays land
    in the ItemMetadata bundle."""
    import jax.numpy as jnp

    from pyp_tpu.ops import ctf_fit, motion, pick

    name = item["name"]
    meta = ItemMetadata(name, work_dir, mode="spr").load()
    meta.refresh(params)
    pixel = float(params["scope_pixel"]) * int(params.get("data_bin") or 1)
    summary = {"name": name}
    if params.get("scope_mag"):
        # nominal magnification: display metadata for the web/db pushes
        summary["mag"] = float(params["scope_mag"])

    frames = None
    average_dev = None  # device-resident average when freshly computed

    def get_frames():
        nonlocal frames
        if frames is None:
            raw = item.get("frames")
            if raw is None:
                raw = load_movie(item["path"], params)
            frames = apply_gain(np.asarray(raw, dtype=np.float32), params)
            if params.get("movie_magcorr"):
                # anisotropic-magnification correction ahead of alignment
                # (movie tab magcorr; scope mag_major/minor/distort_ang)
                import jax.numpy as _jnp

                from pyp_tpu.ops.motion import correct_mag_distortion

                frames = np.asarray(correct_mag_distortion(
                    _jnp.asarray(frames),
                    float(params.get("scope_mag_major") or 1.0),
                    float(params.get("scope_mag_minor") or 1.0),
                    float(params.get("scope_distort_ang") or 0.0)))
            if params.get("data_remove_xrays", True):
                import jax.numpy as _jnp

                from pyp_tpu.ops.pick import remove_hot_pixels

                frames = np.asarray(remove_hot_pixels(
                    _jnp.asarray(frames),
                    sigmas=float(params.get("data_hot_sigma") or 8.0)))
            first = int(params.get("movie_first") or 0)
            last = int(params.get("movie_last") or -1)
            if last < 0:
                last = frames.shape[0]
            frames = frames[first:last]
            grp = int(params.get("movie_group") or 1)
            if grp > 1:  # frame grouping (dose fractionation rebinning)
                nf = (frames.shape[0] // grp) * grp
                frames = frames[:nf].reshape(-1, grp, *frames.shape[1:]).mean(1)
            if params.get("data_invert"):
                frames = -frames
        return frames

    # ---- motion correction ------------------------------------------------
    if not meta.is_done("drift") and params.get("movie_ali") != "skip":
        with Timer("movie alignment"):
            f = jnp.asarray(get_frames())
            dose = float(params.get("scope_dose_rate") or 1.0)
            doses = (float(params.get("scope_init_dose") or 0.0)
                     + jnp.arange(1, f.shape[0] + 1) * dose)
            # camera-sized movies (K3: 40x4096^2) exceed the 16 GB chip with
            # the whole-stack FFT pipeline; switch to the binned+scan path
            large = f.size > int(params.get(
                "movie_large_threshold_mpix") or 300) * 1_000_000
            if large:
                res = motion.align_movie_large(
                    f, pixel_size=pixel,
                    binning=int(params.get("movie_align_bin") or 2),
                    doses=doses,
                    dose_weighted=bool(params.get("movie_weights")),
                    bfactor=float(params["movie_bfactor"]),
                    max_iters=int(params["movie_iters"]),
                    smooth_order=int(params["movie_smooth_order"]),
                )
                avg = res.average
            elif int(params.get("movie_patches") or 0) > 1:
                # MotionCor-style local motion (reference movie_ali patch
                # path, align/core.py:4083): global pass + per-patch
                # residual tracking
                p = int(params["movie_patches"])
                res, patch_shifts, centers = motion.align_movie_patches(
                    f,
                    patch_grid=(p, p),
                    pixel_size=pixel,
                    bfactor=float(params.get("movie_patch_bfactor") or 500.0),
                    max_iters=int(params.get("movie_patch_iters") or 6),
                    search_radius=float(params["movie_search"]),
                    smooth_order=int(params.get("movie_patch_smooth") or 3),
                )
                meta["patch_shifts"] = np.asarray(patch_shifts)
                if params.get("movie_weights"):
                    avg = motion.dose_weighted_average(f, res.shifts, doses, pixel)
                else:
                    avg = res.average
            else:
                res = motion.align_movie(
                    f,
                    pixel_size=pixel,
                    bfactor=float(params["movie_bfactor"]),
                    max_iters=int(params["movie_iters"]),
                    search_radius=float(params["movie_search"]),
                    smooth_order=int(params["movie_smooth_order"]),
                    ref=str(params.get("movie_ref") or "average"),
                    phase_only=bool(params.get("movie_phase_only")),
                    tol=float(params.get("movie_tol") or 0.0),
                )
                if params.get("movie_weights"):
                    avg = motion.dose_weighted_average(f, res.shifts, doses, pixel)
                else:
                    avg = res.average
            meta["drift"] = np.asarray(res.shifts)
            average_dev = avg  # keep the device-resident average: the CTF
            # periodogram below would otherwise pay a host->device
            # round-trip of the full micrograph (~130 ms via the tunnel)
            meta["average"] = np.asarray(avg, dtype=np.float32)
    elif not meta.is_done("average"):
        f = get_frames()
        meta["drift"] = np.zeros((f.shape[0], 2), dtype=np.float32)
        meta["average"] = f.mean(axis=0)
    average = meta["average"]
    summary["drift_px"] = float(np.abs(np.diff(meta["drift"], axis=0)).sum())

    # ---- micrograph denoising (the topaz-denoise/cryoCARE SPR role) ------
    # noise2noise on aligned even/odd frame averages; one model per process
    # (train on the first micrograph, reuse for the rest — the reference
    # trains once per dataset, then applies everywhere). The denoised image
    # feeds PICKING only; CTF and extraction stay on the raw average.
    pick_image = average
    if (str(params.get("denoise_spr") or "none") == "n2n"
            and "drift" in meta and meta["drift"].shape[0] >= 4):
        import jax.numpy as jnp

        from pyp_tpu.models import denoise as dn

        if not meta.is_done("denoised"):
            with Timer("micrograph denoise"):
                f = jnp.asarray(get_frames())
                sh = jnp.asarray(meta["drift"])
                F = jnp.fft.rfft2(f) * motion._phase_ramp(
                    sh, f.shape[1], f.shape[2])
                aligned = jnp.fft.irfft2(F, s=f.shape[1:])
                even = np.asarray(aligned[0::2].mean(axis=0))
                odd = np.asarray(aligned[1::2].mean(axis=0))
                model = _spr_denoiser_cache.get("model")
                if model is None:
                    model = dn.train_denoiser(
                        [even], [odd],
                        steps=int(params.get("denoise_epochs") or 60),
                        lr=float(params.get("denoise_lr") or 1e-3),
                        patch=int(params.get("denoise_patch") or 64),
                        batch=int(params.get("denoise_batch") or 16),
                        seed=int(params.get("denoise_seed") or 0),
                        features=(16, 32))
                    _spr_denoiser_cache["model"] = model
                meta["denoised"] = np.asarray(
                    dn.denoise_image(model, average, features=(16, 32)),
                    dtype=np.float32)
        pick_image = meta["denoised"]
        summary["denoised"] = True

    # ---- CTF estimation ---------------------------------------------------
    if not meta.is_done("ctf"):
        with Timer("CTF estimation"):
            import jax.numpy as jnp

            power = ctf_fit.periodogram(
                average_dev if average_dev is not None
                else jnp.asarray(average),
                tile=min(int(params["ctf_tile"]), min(average.shape)),
                overlap=float(params.get("ctf_tile_overlap") or 0.5),
            )
            fit = ctf_fit.fit_ctf(
                power, pixel,
                dfmin=float(params["ctf_min_def"]),
                dfmax=float(params["ctf_max_def"]),
                dfstep=float(params["ctf_fstep"]),
                min_res=float(params["ctf_min_res"]),
                max_res=float(params["ctf_max_res"]),
                fit_astigmatism=bool(params["ctf_use_ast"]),
                max_astig=float(params["ctf_dast"]),
                fit_phase=bool(params["ctf_use_phs"]),
                phase_min=float(params.get("ctf_phase_min") or 0.0),
                phase_max=float(params.get("ctf_phase_max") or 3.1416),
                phase_steps=int(params.get("ctf_phase_steps") or 14),
                n_g=int(params.get("ctf_polar_rings") or 384),
                n_theta=int(params.get("ctf_polar_angles") or 64),
                lowres_1d=float(params.get("ctf_lowres_1d") or 8.0),
                bg_sigma=float(params.get("ctf_bg_sigma") or 6.0),
                # calibrated-astigmatism pinning (ctf tab known_ast)
                known_astig=(float(params["ctf_known_ast"])
                             if params.get("ctf_known_ast") else None),
                known_astig_angle=float(
                    params.get("ctf_known_ast_angle") or 0.0),
            )
            meta["ctf"] = np.array([
                float(fit.df1), float(fit.df2), float(fit.angast),
                float(fit.phase_shift), float(fit.cc), float(fit.fit_res),
            ])
            # CTFFIND-style diagnostics (reference ctf/core.py avgrot/.ctf
            # outputs): 1D rotational average table + fitted model
            g, radial, norm_radial, model = ctf_fit.avgrot(
                power, pixel, fit,
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"]),
                w=float(params["scope_wgh"]),
                n_bins=int(params.get("ctf_avgrot_bins") or 256))
            meta["ctf_avgrot"] = np.stack([g, radial, norm_radial, model])
            if params.get("ctf_determine_thickness"):
                # sample-thickness node fit (ctffind5 role)
                t, t_cc = ctf_fit.fit_thickness(
                    power, pixel, fit,
                    voltage_kv=float(params["scope_voltage"]),
                    cs_mm=float(params["scope_cs"]),
                    amplitude_contrast=float(params["scope_wgh"]),
                    min_res=float(params["ctf_min_res"]),
                    max_res=float(params["ctf_max_res"]),
                    t_max=float(params.get("ctf_thickness_max") or 1000.0),
                    n_steps=int(params.get("ctf_thickness_steps") or 51))
                meta["ctf_thickness"] = np.array(
                    [float(t), float(np.max(np.asarray(t_cc)))])
            if params.get("ctf_use_lcl"):
                # per-region fits -> defocus plane for per-particle defocus
                # interpolation at extraction (ctf/core.py:715)
                g = max(2, int(params.get("ctf_lcl_grid") or 2))
                _fits, plane = ctf_fit.fit_ctf_local(
                    average, pixel, grid=(g, g),
                    tile=min(int(params["ctf_tile"]) // 2,
                             min(average.shape) // g),
                    dfmin=float(params["ctf_min_def"]),
                    dfmax=float(params["ctf_max_def"]),
                    dfstep=float(params["ctf_fstep"]),
                    min_res=float(params["ctf_min_res"]),
                    max_res=float(params["ctf_max_res"]))
                meta["ctf_plane"] = np.asarray(plane, dtype=np.float64)
            diag = ctf_fit.diagnostic_image(
                power, pixel, fit,
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"]),
                w=float(params["scope_wgh"]),
                size=int(params.get("ctf_diag_size") or 512))
            meta["ctf_diag"] = np.asarray(diag, dtype=np.float32)
    ctf_vec = meta["ctf"]
    summary["df1"], summary["df2"] = float(ctf_vec[0]), float(ctf_vec[1])
    summary["ctf_fit_res"] = float(ctf_vec[5])

    # ---- particle picking -------------------------------------------------
    method = params.get("detect_method", "auto")
    if not meta.is_done("box") and method == "nn":
        # learned picker: weights trained by models.picker.train_picker and
        # saved to picker_model.npz in the project dir (sprtrain equivalent)
        with Timer("NN particle picking"):
            from pathlib import Path as _Path

            import jax
            import jax.numpy as jnp

            from pyp_tpu.models import io as mio
            from pyp_tpu.models import picker as nn_picker
            from pyp_tpu.models.unet import UNet2D

            radius_px = max(4, int(float(params["detect_rad"]) / pixel))
            model_path = _Path(str(params.get("detect_nn_model") or "")
                               or _Path(work_dir) / "picker_model.npz")
            net = UNet2D(features=(8, 16, 32), out_channels=1)
            patch = 128
            template = net.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, patch, patch, 1)))
            weights, meta_np = mio.load_params(model_path, template)
            model = nn_picker.PickerModel(params=weights,
                                          patch=int(meta_np.get("patch", patch)),
                                          radius_px=radius_px)
            heat = nn_picker.infer_heatmap(model, pick_image, features=(8, 16, 32))
            coords, vals, valid = nn_picker.pick_from_heatmap(
                heat, radius_px,
                threshold=float(params.get("detect_nn_threshold") or 0.3),
                max_picks=int(params["detect_max"]))
            coords, vals = coords[valid], vals[valid]
            meta["box"] = np.concatenate([coords, vals[:, None]], axis=1)
    elif not meta.is_done("box") and method not in ("none", "manual"):
        with Timer("particle picking"):
            import jax.numpy as jnp

            radius_px = max(4, int(float(params["detect_rad"]) / pixel))
            if params.get("detect_gold_erase"):
                # gold fiducials outshine particles; erase before picking
                # (reference erase_gold_beads, preprocess/core.py:995)
                gold_px = max(2, int(float(params.get("detect_gold_rad")
                                           or 50.0) / pixel))
                g = pick.detect_gold_beads(
                    jnp.asarray(pick_image), bead_radius_px=gold_px,
                    max_beads=int(params.get("detect_gold_max") or 256),
                    threshold_sigma=float(params.get("detect_gold_thresh")
                                          or 5.0))
                pick_image = np.asarray(pick.erase_blobs(
                    jnp.asarray(pick_image), g.coords, g.valid,
                    1.5 * gold_px))
            res = pick.pick_particles(
                jnp.asarray(pick_image),
                particle_radius_px=radius_px,
                max_picks=int(params["detect_max"]),
                min_distance_px=int(float(params["detect_dist"]) or radius_px),
                threshold_sigma=float(params["detect_thresh"]),
                edge_px=int(params.get("detect_edge") or 0)
                or int(params["extract_box"]) // 2,
                invert=bool(params.get("detect_invert", True)),
                mask_contamination=bool(
                    params.get("detect_contamination", True)),
                band_low=float(params.get("detect_band_low") or 6.0),
                band_high=float(params.get("detect_band_high") or 1.5),
                disk_frac=float(params.get("detect_disk_frac") or 0.5),
                cont_sigma=float(params.get("detect_cont_sigma") or 8.0),
                cont_scale=float(params.get("detect_cont_scale") or 4.0),
            )
            valid = np.asarray(res.valid)
            coords = np.asarray(res.coords)[valid]
            scores = np.asarray(res.scores)[valid]
            meta["box"] = np.concatenate([coords, scores[:, None]], axis=1)
    if meta.is_done("box"):
        summary["particles"] = int(len(meta["box"]))
    else:
        summary["particles"] = 0

    if params.get("plot_per_item", True):
        # per-micrograph diagnostics (reference: webp CTF/drift panels per
        # item for the web UI; here pngs the HTML report embeds)
        try:
            from types import SimpleNamespace

            from pyp_tpu.analysis import plots as _plots

            if meta.is_done("drift"):
                _plots.plot_drift(meta["drift"],
                                  f"{work_dir}/{name}_drift.png")
            if meta.is_done("ctf_avgrot") and meta.is_done("ctf"):
                g, radial, norm_radial, model = np.asarray(
                    meta["ctf_avgrot"])
                c = np.asarray(meta["ctf"])
                _plots.plot_ctf_fit(
                    g, radial, norm_radial, model,
                    SimpleNamespace(df1=c[0], df2=c[1], angast=c[2],
                                    fit_res=c[5]),
                    f"{work_dir}/{name}_ctf.png")
        except (OSError, ValueError, KeyError) as e:
            logger.warning("per-item plots skipped: %s", e)

    meta.scalars.update(
        {"pixel": pixel, "voltage": float(params["scope_voltage"])}
    )
    meta.save()
    return summary


def extract_stack(items, params, work_dir=".", out_stack="stack.mrc"):
    """Dataset-level extraction: windows every picked particle from its
    micrograph average into one stack + a .cistem parameter table (what the
    reference assembles via per-micrograph .boxx + stacks, extract/core.py)."""
    import jax.numpy as jnp

    from pyp_tpu.ops import extract as ex

    box = int(params["extract_box"])
    # extract_bin: window at box*bin full-res pixels, Fourier-crop to box
    # (the reference's binned extraction, extract/core.py:600)
    ebin = max(1, int(params.get("extract_bin") or 1))
    pixel = float(params["scope_pixel"]) * int(params.get("data_bin") or 1) * ebin
    all_imgs = []
    rows = []
    film = 0
    for item in items:
        name = item["name"] if isinstance(item, dict) else item
        meta = ItemMetadata(name, work_dir, mode="spr").load()
        if not (meta.is_done("box") and meta.is_done("average")):
            continue
        coords = meta["box"][:, :2].astype(np.float32)
        if len(coords) == 0:
            film += 1
            continue
        stack = ex.extract_particles(
            jnp.asarray(meta["average"]), jnp.asarray(coords), box * ebin,
            invert=bool(params.get("extract_inv", True)),
            normalize=bool(params.get("extract_norm", True)),
            subpixel=bool(params.get("extract_subpixel", True)),
        )
        if ebin > 1:
            from pyp_tpu.core.fft import fourier_crop

            stack = fourier_crop(stack, (box, box))
        all_imgs.append(np.asarray(stack, dtype=np.float32))
        ctf_vec = meta["ctf"] if meta.is_done("ctf") else np.zeros(6)
        if meta.is_done("ctf_plane"):
            # per-particle defocus from the local plane fit (ctf_use_lcl):
            # offset df1/df2 by (plane(y,x) - plane mean defocus)
            from pyp_tpu.ops.ctf_fit import defocus_at_positions

            d_local = defocus_at_positions(meta["ctf_plane"], coords)
            d_off = d_local - 0.5 * (ctf_vec[0] + ctf_vec[1])
        else:
            d_off = np.zeros(len(coords))
        for c, do in zip(coords, d_off):
            rows.append((film, c[0], c[1], ctf_vec[0] + do, ctf_vec[1] + do,
                         ctf_vec[2]))
        film += 1
    if not all_imgs:
        return None, None
    stack = np.concatenate(all_imgs, axis=0)
    if str(params.get("extract_fmt") or "mrc") == "mrcs" and \
            out_stack.endswith(".mrc"):
        out_stack += "s"  # RELION-style stack naming
    if params.get("extract_float16"):
        stack = stack.astype(np.float16)
    mrc.write(stack, Path(work_dir) / out_stack, pixel_size=pixel)

    n = len(rows)
    table = cistem.Table.zeros(n)
    arr = np.asarray(rows, dtype=np.float64)
    table["position_in_stack"] = np.arange(1, n + 1)
    table["image_is_active"] = np.ones(n)
    table["particle_group"] = arr[:, 0] + 1
    table["original_y_position"] = arr[:, 1]
    table["original_x_position"] = arr[:, 2]
    table["defocus_1"] = arr[:, 3]
    table["defocus_2"] = arr[:, 4]
    table["defocus_angle"] = arr[:, 5]
    table["pixel_size"] = np.full(n, pixel)
    table["microscope_voltage"] = np.full(n, float(params["scope_voltage"]))
    table["microscope_cs"] = np.full(n, float(params["scope_cs"]))
    table["amplitude_contrast"] = np.full(n, float(params["scope_wgh"]))
    table["occupancy"] = np.full(n, 100.0)
    table["assigned_subset"] = np.arange(n) % 2 + 1
    cistem.write_parameters(
        table, Path(work_dir) / Path(out_stack).with_suffix(".cistem"))
    return stack, table


def spr_merge(results: dict, missing: list, work_dir=".") -> dict:
    """Dataset merge: aggregate per-micrograph summaries (the reference's
    spr_merge, bin/run/pyp:735) and report missing items."""
    ok = [r for r in results.values() if r]
    out = {
        "micrographs": len(ok),
        "missing": list(missing),
        "particles": int(sum(r.get("particles", 0) for r in ok)),
        "mean_ctf_fit_res": float(np.mean([r["ctf_fit_res"] for r in ok]))
        if ok else 0.0,
    }
    logger.info(
        "merged %d micrographs (%d missing), %d particles",
        out["micrographs"], len(missing), out["particles"],
    )
    from pyp_tpu.stream.web import Web

    web = Web()
    if web.exists:
        for r in ok:
            web.write_micrograph(r["name"], r)
    return out


def estimate_gain(movie_paths, max_movies: int = 10):
    """Estimate a multiplicative gain reference from raw counting movies
    (the reference's `pypgain` driver mode): gain = mean(all frames) over
    many movies, normalized to unit mean, inverted — flat-field estimate."""
    acc = None
    count = 0
    for path in list(movie_paths)[:max_movies]:
        frames = load_movie(path)
        s = frames.sum(axis=0, dtype=np.float64)
        acc = s if acc is None else acc + s
        count += frames.shape[0]
    if acc is None or count == 0:
        raise ValueError("no movies found for gain estimation")
    mean_img = acc / count
    mean_img = np.maximum(mean_img, 1e-6 * mean_img.mean())
    gain = mean_img.mean() / mean_img
    return gain.astype(np.float32)
