"""Declarative parameter schema.

The rebuild's equivalent of the reference's 11.4k-line TOML schema
(/root/reference/config/pyp_config.toml: ~1,540 parameter definitions in 70
`tabs.*` groups; parameter id = "<tab>_<name>"). Same id convention so
project files and muscle memory transfer; the set here covers the parameters
the TPU kernels actually consume plus orchestration knobs — it grows with
the framework.

Schema -> argparse CLI (config.params.build_parser), web forms, and project
state files. Values support per-iteration schedules with colon syntax
("8:7:6:4:3", resolved by config.params.param()).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ParamDef:
    name: str                 # full id, e.g. "movie_ali"
    type: type                # float, int, str, bool
    default: object = None
    help: str = ""
    enum: tuple = ()
    schedule: bool = False    # may carry an iteration schedule "a:b:c"


def P(name, type, default=None, help="", enum=(), schedule=False):  # noqa: A002
    return ParamDef(name, type, default, help, tuple(enum), schedule)


SCHEMA: dict[str, list[ParamDef]] = {
    # ------------------------------------------------------------------ scope
    "scope": [
        P("scope_pixel", float, 1.0, "pixel size (Å)"),
        P("scope_voltage", float, 300.0, "acceleration voltage (kV)"),
        P("scope_cs", float, 2.7, "spherical aberration (mm)"),
        P("scope_wgh", float, 0.07, "amplitude contrast"),
        P("scope_dose_rate", float, 1.0, "dose per frame (e-/Å²)"),
        P("scope_mag", float, 10000.0, "nominal magnification"),
    ],
    # ------------------------------------------------------------------- data
    "data": [
        P("data_mode", str, "spr", "processing mode", enum=("spr", "tomo")),
        P("model_path", str, "", "initial/reference model path (MRC)"),
        P("data_path", str, "", "glob for raw movies / tilt series"),
        P("data_set", str, "", "dataset name"),
        P("data_bin", int, 1, "binning applied on import"),
        P("data_invert", bool, False, "invert contrast on import"),
        P("data_remove_xrays", bool, True, "remove x-ray/hot pixels on import"),
    ],
    "gain": [
        P("gain_reference", str, "", "gain reference image path"),
        P("gain_rotation", int, 0, "gain rotation (multiples of 90°)"),
        P("gain_fliph", bool, False, "flip gain horizontally"),
        P("gain_flipv", bool, False, "flip gain vertically"),
        P("gain_movies", int, 10, "movies to average for gain estimation"),
    ],
    # ----------------------------------------------------------------- stream
    "stream": [
        P("stream_poll_interval", float, 5.0, "session daemon poll period (s)"),
        P("stream_classify_every", int, 0,
          "re-classify 2D after this many new micrographs (0 = off)"),
        P("stream_max_iterations", int, 0, "bound daemon poll loop (0 = run forever)"),
        P("stream_idle_exit", int, 0, "exit after N idle polls (0 = never)"),
        P("stream_metadb", str, "",
          "metadb store: mongodb:// uri or a JSON file path (metadb role)"),
        P("stream_group", str, "group", "metadb group id"),
    ],
    # ------------------------------------------------------------- selection
    "select": [
        P("keep_classes", str, "", "comma list of class ids to keep (kselection)"),
    ],
    # ------------------------------------------------------------------ movie
    "movie": [
        P("movie_ali", str, "tpu", "frame alignment engine",
          enum=("tpu", "skip")),
        P("movie_eer_frames", int, 40,
          "EER fractionation: raw event frames summed into this many groups"),
        P("movie_bfactor", float, 1500.0, "B-factor for frame xcorr weighting (Å²)"),
        P("movie_iters", int, 8, "alignment iterations"),
        P("movie_search", float, 48.0, "max shift search radius (px)"),
        P("movie_smooth_order", int, 3, "polynomial order for trajectory smoothing"),
        P("movie_patches", int, 0, "local motion patch grid (0 = global only)"),
        P("movie_weights", bool, True, "dose-weighted average output"),
        P("movie_force", bool, False, "force re-run of frame alignment"),
        P("movie_first", int, 0, "first frame used"),
        P("movie_last", int, -1, "last frame used (-1 = all)"),
    ],
    # -------------------------------------------------------------------- ctf
    "ctf": [
        P("ctf_tile", int, 512, "power spectrum tile size"),
        P("ctf_min_res", float, 30.0, "lowest resolution of fit (Å)"),
        P("ctf_max_res", float, 5.0, "highest resolution of fit (Å)"),
        P("ctf_min_def", float, 3000.0, "minimum defocus (Å)"),
        P("ctf_max_def", float, 50000.0, "maximum defocus (Å)"),
        P("ctf_fstep", float, 250.0, "defocus search step (Å)"),
        P("ctf_use_ast", bool, True, "fit astigmatism"),
        P("ctf_dast", float, 4000.0, "max astigmatism (Å)"),
        P("ctf_use_phs", bool, False, "fit phase shift (phase plate)"),
        P("ctf_force", bool, False, "force re-run of CTF estimation"),
    ],
    # ----------------------------------------------------------------- detect
    "detect": [
        P("detect_method", str, "auto", "particle picking method",
          enum=("auto", "nn", "all", "manual", "import", "none")),
        P("detect_rad", float, 80.0, "particle radius (Å)"),
        P("detect_thresh", float, 1.0, "picking threshold (sigma)"),
        P("detect_dist", float, 0.0, "min distance between picks (px, 0=auto)"),
        P("detect_max", int, 1024, "max picks per micrograph"),
        P("detect_force", bool, False, "force re-run of picking"),
    ],
    "particle": [
        P("particle_rad", float, 80.0, "particle radius (Å)"),
        P("particle_mw", float, 100.0, "molecular weight (kDa)"),
        P("particle_sym", str, "C1", "point-group symmetry"),
    ],
    # ---------------------------------------------------------------- extract
    "extract": [
        P("extract_box", int, 128, "box size (px)"),
        P("extract_bin", int, 1, "extraction binning"),
        P("extract_fmt", str, "mrc", "stack format"),
        P("extract_inv", bool, True, "invert contrast on extraction"),
    ],
    # --------------------------------------------------------------- tomo_ali
    "tomo_ali": [
        P("tomo_ali_method", str, "tpu", "tilt alignment engine",
          enum=("tpu", "import", "skip")),
        P("tomo_ali_bin", int, 4, "binning for alignment"),
        P("tomo_ali_patches", int, 12, "patches tracked for the model solve"),
        P("tomo_ali_patch_size", int, 64, "patch size (px, binned)"),
        P("tomo_ali_fiducial", float, 0.0,
          "gold fiducial diameter (nm); >0 selects bead tracking over patches "
          "(reference tomo_ali_fiducial, align/core.py:5679)"),
        P("tomo_ali_fiducial_n", int, 40, "max beads tracked"),
        P("tomo_ali_force", bool, False, "force re-run of tilt alignment"),
        P("tomo_ali_exclude", str, "", "tilt indices to exclude, colon-separated"),
    ],
    # --------------------------------------------------------------- tomo_rec
    "tomo_rec": [
        P("tomo_rec_thickness", int, 2048, "tomogram thickness (unbinned px)"),
        P("tomo_rec_binning", int, 8, "reconstruction binning"),
        P("tomo_rec_method", str, "wbp", "reconstruction method",
          enum=("wbp", "sart")),
        P("tomo_rec_sart_iters", int, 10, "SART passes over all subsets"),
        P("tomo_rec_sart_relax", float, 1.0, "SART relaxation step"),
        P("tomo_rec_sart_subsets", int, 4,
          "SART angular subsets (interleaved; 1 = plain SIRT)"),
        P("tomo_rec_fake_sirt", int, 0,
          "WBP radial filter equivalent to N SIRT iterations "
          "(IMOD -FakeSIRTiterations; 0 = plain ramp)"),
        P("tomo_rec_filter_cutoff", float, 0.35, "ramp filter cutoff (cyc/px)"),
        P("tomo_rec_filter_falloff", float, 0.05, "ramp filter falloff"),
        P("tomo_rec_erase_fiducials", bool, False, "erase gold beads first"),
        P("tomo_rec_gold_rad", float, 100.0, "gold bead radius for erasure (Å)"),
        P("tomo_rec_dose_weighting", bool, False,
          "dose-weight tilts by cumulative exposure before reconstruction"),
    ],
    "tomo_vir": [
        P("tomo_vir_method", str, "none", "virion detection", enum=("none", "template", "auto")),
        P("tomo_vir_rad", float, 500.0, "virion radius (Å)"),
        P("tomo_vir_detect_band", float, 800.0, "detection band (Å)"),
        P("tomo_vir_detect_max", int, 8, "max virions per tomogram"),
        P("tomo_vir_points", int, 200, "surface mesh points per virion"),
        P("tomo_vir_lmax", int, 4, "spherical-harmonics degree for membrane refinement"),
    ],
    "tomo_spk": [
        P("mine_patch", int, 16, "miner subvolume size (voxels)"),
        P("mine_steps", int, 300, "miner contrastive training steps"),
        P("mine_clusters", int, 8, "miner k-means clusters"),
        P("mine_embed_dim", int, 32, "miner embedding dimension"),
        P("tomo_spk_method", str, "none", "3D particle picking",
          enum=("none", "auto", "template", "surface", "import")),
        P("tomo_spk_rad", float, 100.0, "particle radius (Å)"),
        P("tomo_spk_max", int, 2048, "max picks per tomogram"),
        P("tomo_spk_thresh", float, 0.0, "3D template-match score threshold"),
        P("tomo_pick_ref", str, "", "3D template reference map (MRC)"),
        P("tomo_pick_ang", float, 30.0, "3D template-match angular step (deg)"),
    ],
    # ------------------------------------------------------------------ class
    "class": [
        P("class_num", int, 1, "number of classes"),
        P("class_rhcls", float, 10.0, "classification high-res limit (Å)"),
        P("class_rlcls", float, 100.0, "classification low-res limit (Å)"),
        P("class_2d_iters", int, 10, "2D classification iterations"),
        P("class_shift", float, 5.0, "2D alignment shift extent (px)"),
        P("class_engine", str, "polar", "2D E-step engine",
          enum=("polar", "gather")),
    ],
    # ----------------------------------------------------------------- refine
    "refine": [
        P("refine_maxiter", int, 5, "number of refinement iterations"),
        P("refine_iter", int, 2, "first iteration (resume point)"),
        P("refine_mode", str, "local", "search mode", enum=("global", "local")),
        P("refine_engine", str, "frm", "pose-search engine: frm (polar "
          "matmul, MXU) or gather (per-pose Fourier-slice gathers)",
          enum=("frm", "gather")),
        P("refine_frm_cone", float, 20.0,
          "frm local mode: direction prior cone around the current pose (deg)"),
        P("refine_abinit", bool, False,
          "no initial model: generate one by marginalized ab initio"),
        P("refine_rlref", float, 100.0, "low-res limit (Å)"),
        P("refine_rhref", str, "8:7:6:4:3", "high-res limit schedule (Å)",
          schedule=True),
        P("refine_dang", str, "15", "angular lattice step schedule (deg)",
          schedule=True),
        P("refine_psi_step", float, 10.0, "in-plane angular step (deg)"),
        P("refine_searchx", float, 6.0, "shift search extent x (px)"),
        P("refine_searchy", float, 6.0, "shift search extent y (px)"),
        P("refine_topk", int, 4, "global-search candidates refined per particle"),
        P("refine_local_iters", int, 24, "local refinement gradient steps"),
        P("refine_skip", bool, False, "reconstruction-only iteration"),
        P("refine_bsc", float, 0.0, "score-based particle weighting factor"),
        P("refine_frm_wiener", float, 0.1,
          "frm engine: CTF Wiener restoration constant"),
        P("refine_frm_rounds", int, 3, "frm engine: match/shift rounds"),
        P("refine_frm_npsi", int, 0, "frm engine: psi samples (0 = auto)"),
        P("refine_frm_polish", str, "final",
          "sub-lattice gradient polish after FRM: never/final/always",
          enum=("never", "final", "always")),
        P("refine_goldstandard", bool, False,
          "align each half-set only against its own half map (unbiased FSC)"),
        P("refine_beamtilt", bool, False,
          "estimate + correct dataset beam tilt once poses are warm"),
    ],
    # ------------------------------------------------------------ reconstruct
    "reconstruct": [
        P("reconstruct_pad", int, 2,
          "gridding oversampling of the insertion grid (kernel node "
          "spacing 1/(pad*n); memory ~ (pad*n)^3)"),
        P("reconstruct_crop", bool, True,
          "band-limited intermediate reconstructions (Fourier-crop to the "
          "matching band; final iteration always full-size)"),
        P("reconstruct_rrec", float, 0.0, "reconstruction res limit (Å, 0=Nyquist)"),
        P("reconstruct_wiener", float, 0.5, "Wiener regularization constant"),
        P("reconstruct_norm", bool, True, "normalize particles"),
        P("reconstruct_dose_weighting_enable", bool, False, "dose weighting"),
    ],
    # -------------------------------------------------------------------- csp
    "csp": [
        P("csp_UseImagesForRefinementMin", int, 0, "first tilt used"),
        P("csp_UseImagesForRefinementMax", int, -1, "last tilt used (-1=all)"),
        P("csp_refine_modes", str, "3:0:2:1", "mode schedule per pass (positions before angles: measured, angle refinement against stale positions absorbs the position error into the eulers)"),
        P("csp_OptimizerIters", int, 20, "gradient steps per mode"),
        P("csp_transreg", float, 0.1, "trajectory smoothness regularization"),
        P("csp_time_sigma", float, 21.0,
          "temporal sigma (frames) for trajectory regularization"),
        P("csp_spatial_sigma", float, 500.0,
          "spatial coupling sigma (unbinned px) across particle trajectories"),
        P("csp_transreg_method", str, "spline",
          "trajectory regularizer: variance-weighted spline with outlier "
          "rejection, or plain gaussian kernel",
          enum=("spline", "gaussian")),
        P("csp_reg_outlier_mads", float, 5.0,
          "spline outlier rejection threshold (x MAD of residuals)"),
        P("csp_Grid", str, "1:1:1", "patch grid (x:y:z)"),
        P("csp_GridSearch", bool, False,
          "coarse discrete search before the gradient polish (csp_GS role)"),
        P("csp_GridSearchSteps", int, 9, "grid points per searched axis"),
        P("csp_ToleranceMicrographTiltAngles", float, 10.0,
          "tilt-angle search tolerance (deg)"),
        P("csp_ToleranceMicrographShifts", float, 20.0,
          "micrograph-shift search tolerance (px)"),
        P("csp_ToleranceMicrographDefocus1", float, 2000.0,
          "per-tilt defocus search tolerance (Å)"),
        P("csp_ToleranceParticlesPsi", float, 10.0,
          "particle-angle search tolerance (deg)"),
        P("csp_ToleranceParticlesShifts", float, 10.0,
          "particle-shift search tolerance (voxels)"),
        P("csp_box", int, 64, "projection window size (px)"),
        P("csp_rlref", float, 60.0, "low-res limit (Å)"),
        P("csp_rhref", str, "12", "high-res limit schedule (Å)", schedule=True),
    ],
    # ------------------------------------------------------------------ slurm
    "slurm": [
        P("slurm_tasks", int, 1, "tasks per swarm job"),
        P("slurm_memory", int, 16, "memory per task (GB)"),
        P("slurm_walltime", str, "24:00:00", "walltime"),
        P("slurm_merge_walltime", str, "48:00:00", "merge job walltime"),
        P("slurm_queue", str, "", "partition/queue"),
        P("slurm_merge_retries", int, 2, "merge retry budget for missing items"),
        P("slurm_bundle", int, 1, "array-task bundling factor"),
        P("slurm_gres", str, "", "generic resources, e.g. tpu:1"),
        P("slurm_host", str, "", "submission host (submit via ssh when set)"),
        P("slurm_submit", bool, False, "actually sbatch the emitted scripts"),
        P("slurm_nodes", int, 1,
          "ranks for multi-host refinement (jax.distributed mesh spanning "
          "nodes; sched.bridge.write_distributed_refine_script)"),
        P("slurm_script_dir", str, "swarm", "where sbatch scripts/payloads go"),
    ],
    # ---------------------------------------------------------------- abinit
    "abinit": [
        P("abinit_rounds", int, 10, "marginalized (soft) ab-initio rounds"),
        P("abinit_start_res", float, 40.0, "resolution ladder start (Å)"),
        P("abinit_end_res", float, 12.0, "resolution ladder end (Å)"),
        P("abinit_angular_step", float, 15.0, "direction lattice step (deg)"),
        P("abinit_top_t", int, 8, "poses per particle in soft reconstruction"),
        P("abinit_beta0", float, 20.0, "initial posterior inverse temperature"),
        P("abinit_beta_growth", float, 1.4, "beta growth per round"),
        P("abinit_soft_shifts", str, "zero",
          "soft-round shift handling: zero (centered picks) | track "
          "(marginalize around running estimate + insert at winning shift; "
          "for picks off by >1 px)"),
        P("abinit_hard_rounds", int, 3, "hard refinement rounds after the ladder"),
    ],
    # ----------------------------------------------------------------- polish
    "polish": [
        P("polish_iters", int, 30, "trajectory refinement gradient steps"),
        P("polish_spatial_sigma", float, 500.0,
          "spatial coherence scale of particle trajectories (Å)"),
        P("polish_reg", float, 0.1, "temporal smoothness regularization"),
    ],
    # ------------------------------------------------------------------ mask
    "mask": [
        P("mask_method", str, "auto", "mask construction",
          enum=("auto", "sphere", "file")),
        P("mask_file", str, "", "mask volume path (mask_method=file)"),
        P("mask_radius", float, 0.0, "sphere radius (Å, 0 = 0.4*box)"),
        P("mask_edge_width", float, 6.0, "soft edge width (px)"),
        P("mask_threshold", float, 1.0, "auto-mask threshold (sigma)"),
        P("mask_dilation", int, 3, "auto-mask dilation (px)"),
        P("mask_lowpass", float, 15.0, "auto-mask lowpass (Å)"),
        P("mask_invert", bool, False, "invert the mask"),
    ],
    # ------------------------------------------------------------------ edit
    "edit": [
        P("edit_name", str, "", "item (micrograph/tilt-series) to edit"),
        P("edit_exclude_tilts", str, "",
          "tomoedit: tilt indices to remove, colon/comma separated"),
        P("edit_drop_virions", bool, False, "tomoedit: clear virion picks"),
        P("edit_import_box", str, "", "boxedit: replace picks from .box file"),
        P("edit_remove_circle", str, "",
          "boxedit: remove picks inside cy:cx:radius (px)"),
        P("edit_min_score", float, 0.0, "boxedit: drop picks below score"),
    ],
    # ----------------------------------------------------------------- train
    "train": [
        P("train_steps", int, 300, "NN picker training steps"),
        P("train_batch", int, 16, "NN picker batch size"),
        P("train_lr", float, 3e-4, "NN picker learning rate"),
        P("train_patch", int, 128, "NN picker training patch (px)"),
    ],
    # ---------------------------------------------------------------- sharpen
    "sharpen": [
        P("sharpen_bfactor", float, 0.0, "B-factor (0 = automatic Guinier fit)"),
        P("sharpen_mask_lowpass", float, 15.0, "auto-mask lowpass (Å)"),
        P("sharpen_mask_threshold", float, 1.0, "auto-mask threshold (sigma)"),
        P("sharpen_mask_dilation", int, 3, "auto-mask dilation (px)"),
        P("sharpen_mask_soft", int, 6, "auto-mask soft edge (px)"),
    ],
    # ---------------------------------------------------------------- denoise
    "denoise": [
        P("denoise_spr", str, "none",
          "micrograph denoising for picking: none | n2n (noise2noise on "
          "aligned even/odd frame averages, model shared per process)"),
        P("denoise_method", str, "none", "tomogram denoising",
          enum=("none", "n2n", "wedge")),
        P("denoise_epochs", int, 60, "denoiser training epochs"),
        P("denoise_lr", float, 1e-3, "denoiser learning rate"),
    ],
    # ----------------------------------------------------------------- notify
    "notify": [
        P("notify_email", str, "", "email address for completion/failure mail"),
        P("notify_smtp", str, "localhost", "SMTP host for notifications"),
        P("notify_mongo_uri", str, "",
          "mongo URI (or JSONL spool path) mirroring all log records"),
        P("notify_webid", str, "", "web session id attached to log documents"),
    ],
}


def all_params() -> dict[str, ParamDef]:
    out = {}
    for tab, defs in SCHEMA.items():
        for d in defs:
            out[d.name] = d
    return out


def defaults() -> dict:
    return {d.name: d.default for d in all_params().values()}
