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
        return eer.read(path, frame_groups=groups).astype(np.float32)
    if path.endswith((".dm3", ".dm4")):
        from pyp_tpu.io import dm

        data = np.asarray(dm.read(path), dtype=np.float32)
        return data[None] if data.ndim == 2 else data
    data = mrc.read(path)
    if data.ndim == 2:
        data = data[None]
    return data.astype(np.float32)


def apply_gain(frames, params):
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
    return frames * gain[None]


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

    def get_frames():
        nonlocal frames
        if frames is None:
            raw = item.get("frames")
            if raw is None:
                raw = load_movie(item["path"], params)
            frames = apply_gain(np.asarray(raw, dtype=np.float32), params)
            if params.get("data_remove_xrays", True):
                import jax.numpy as _jnp

                from pyp_tpu.ops.pick import remove_hot_pixels

                frames = np.asarray(remove_hot_pixels(_jnp.asarray(frames)))
            first = int(params.get("movie_first") or 0)
            last = int(params.get("movie_last") or -1)
            if last < 0:
                last = frames.shape[0]
            frames = frames[first:last]
            if params.get("data_invert"):
                frames = -frames
        return frames

    # ---- motion correction ------------------------------------------------
    if not meta.is_done("drift") and params.get("movie_ali") != "skip":
        with Timer("movie alignment"):
            f = jnp.asarray(get_frames())
            dose = float(params.get("scope_dose_rate") or 1.0)
            doses = jnp.arange(1, f.shape[0] + 1) * dose
            # camera-sized movies (K3: 40x4096^2) exceed the 16 GB chip with
            # the whole-stack FFT pipeline; switch to the binned+scan path
            large = f.size > 300_000_000
            if large:
                res = motion.align_movie_large(
                    f, pixel_size=pixel, binning=2, doses=doses,
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
                    bfactor=float(params["movie_bfactor"]),
                    max_iters=int(params["movie_iters"]),
                    search_radius=float(params["movie_search"]),
                    smooth_order=int(params["movie_smooth_order"]),
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
                )
                if params.get("movie_weights"):
                    avg = motion.dose_weighted_average(f, res.shifts, doses, pixel)
                else:
                    avg = res.average
            meta["drift"] = np.asarray(res.shifts)
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

            fit = ctf_fit.fit_ctf_micrograph(
                jnp.asarray(average), pixel,
                tile=min(int(params["ctf_tile"]), min(average.shape)),
                dfmin=float(params["ctf_min_def"]),
                dfmax=float(params["ctf_max_def"]),
                dfstep=float(params["ctf_fstep"]),
                min_res=float(params["ctf_min_res"]),
                max_res=float(params["ctf_max_res"]),
                fit_astigmatism=bool(params["ctf_use_ast"]),
                max_astig=float(params["ctf_dast"]),
                fit_phase=bool(params["ctf_use_phs"]),
            )
            meta["ctf"] = np.array([
                float(fit.df1), float(fit.df2), float(fit.angast),
                float(fit.phase_shift), float(fit.cc), float(fit.fit_res),
            ])
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
            model_path = _Path(work_dir) / "picker_model.npz"
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
                heat, radius_px, threshold=0.3,
                max_picks=int(params["detect_max"]))
            coords, vals = coords[valid], vals[valid]
            meta["box"] = np.concatenate([coords, vals[:, None]], axis=1)
    elif not meta.is_done("box") and method not in ("none", "manual"):
        with Timer("particle picking"):
            import jax.numpy as jnp

            radius_px = max(4, int(float(params["detect_rad"]) / pixel))
            res = pick.pick_particles(
                jnp.asarray(pick_image),
                particle_radius_px=radius_px,
                max_picks=int(params["detect_max"]),
                min_distance_px=int(float(params["detect_dist"]) or radius_px),
                threshold_sigma=float(params["detect_thresh"]),
                edge_px=int(params["extract_box"]) // 2,
            )
            valid = np.asarray(res.valid)
            coords = np.asarray(res.coords)[valid]
            scores = np.asarray(res.scores)[valid]
            meta["box"] = np.concatenate([coords, scores[:, None]], axis=1)
    if meta.is_done("box"):
        summary["particles"] = int(len(meta["box"]))
    else:
        summary["particles"] = 0

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
            subpixel=True,
        )
        if ebin > 1:
            from pyp_tpu.core.fft import fourier_crop

            stack = fourier_crop(stack, (box, box))
        all_imgs.append(np.asarray(stack, dtype=np.float32))
        ctf_vec = meta["ctf"] if meta.is_done("ctf") else np.zeros(6)
        for c in coords:
            rows.append((film, c[0], c[1], ctf_vec[0], ctf_vec[1], ctf_vec[2]))
        film += 1
    if not all_imgs:
        return None, None
    stack = np.concatenate(all_imgs, axis=0)
    if str(params.get("extract_fmt") or "mrc") == "mrcs" and \
            out_stack.endswith(".mrc"):
        out_stack += "s"  # RELION-style stack naming
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
