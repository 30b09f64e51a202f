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
        P("scope_init_dose", float, 0.0,
          "pre-exposure before the first frame/tilt (e-/Å²)"),
        P("scope_mag", float, 10000.0, "nominal magnification"),
        P("scope_tilt_axis", float, 0.0,
          "nominal tilt-axis angle (deg, tomo alignment prior/fallback)"),
        P("scope_dose_symmetric", bool, True,
          "tilt scheme: dose-symmetric (|angle| rank = acquisition order) "
          "vs sequential"),
    ],
    # ------------------------------------------------------------------- dose
    "dose": [
        P("dose_critical_a", float, 0.24499,
          "Grant-Grigorieff critical-exposure a (Ne = a*g^b + c)"),
        P("dose_critical_b", float, -1.6649, "critical-exposure exponent b"),
        P("dose_critical_c", float, 2.8141, "critical-exposure offset c"),
        P("dose_weight_global", bool, False,
          "dataset-global acquisition order for the damage envelope "
          "(vs per-series |angle| re-ranking)"),
        P("dose_weight_weights", str, "",
          "external per-tilt weight table (one scalar per tilt)"),
        P("dose_weight_method", str, "grant",
          "per-tilt/frame damage envelope: grant (critical-exposure "
          "model) or frame (data-driven rank falloff, merge/weights.py:76)",
          enum=("grant", "frame")),
        P("dose_weight_fraction", float, 4.0,
          "frame envelope: frequency-falloff steepness"),
        P("dose_weight_transition", float, 0.75,
          "frame envelope: rank-falloff scale"),
        P("dose_weight_multiply", bool, True,
          "frame envelope: scale transition by the frame count"),
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
        P("data_hot_sigma", float, 8.0, "hot-pixel threshold (sigma)"),
        P("data_eer_upsampling", int, 1,
          "EER rendering: 1 = 4k, 2 = 8k, 4 = 16k sub-pixel"),
        P("data_flipy", bool, False,
          "flip raw frames vertically on import (camera orientation)"),
        P("data_parent", str, "",
          "parent project/session directory (export_session source; "
          "project chaining)"),
        P("data_suffix", str, "",
          "only process items whose filename contains this substring"),
        P("data_first_item", int, 0, "process items from this index"),
        P("data_last_item", int, -1, "process items up to this index (-1=all)"),
    ],
    "gain": [
        P("gain_defects_file", str, "",
          "camera defect list (text rows 'x y [w h]'); defect pixels are "
          "replaced by the frame median on load"),
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
        P("stream_transfer_dir", str, "",
          "move arriving files here before processing (microscope-side "
          "watch dir stays clean; reference pyp_daemon transfer step)"),
        P("stream_compress", bool, False,
          "bz2-compress raw movies after successful processing"),
        P("stream_settle_polls", int, 1,
          "polls a file's size must be stable before processing"),
        P("stream_min_free_gb", float, 0.0,
          "pause ingesting new items when the work dir has less free "
          "disk than this (0 = no guard)"),
        P("stream_transfer_verify", bool, False,
          "verify file size after the transfer move before processing"),
        P("stream_classes", int, 0,
          "classes in the daemon's incremental 2D classification "
          "(0 = class_num)"),
    ],
    # -------------------------------------------------------------------- web
    "web": [
        P("web_host", str, "", "nextPYP web server RPC endpoint"),
        P("web_token", str, "", "web RPC auth token"),
        P("plot_per_item", bool, True,
          "render per-item diagnostic panels (drift/CTF/tilt trajectories, "
          "iteration changes, occupancies) for the HTML report"),
    ],
    # ------------------------------------------------------------- selection
    "select": [
        P("keep_classes", str, "", "comma list of class ids to keep (kselection)"),
        P("expand_symmetry", str, "",
          "kselection: symmetry-expand the particle table over this point "
          "group (relion_particle_symmetry_expand role)"),
        P("clean_particles", bool, False,
          "clean mode also deactivates bad particles in stack.cistem"),
        P("clean_mode", str, "otsu", "score threshold rule",
          enum=("otsu", "percentile", "fixed", "shape")),
        P("clean_min_score", float, 0.0, "fixed score cutoff (clean_mode=fixed)"),
        P("clean_percentile", float, 20.0,
          "drop this score percentile (clean_mode=percentile)"),
        P("clean_min_occ", float, 0.0, "occupancy floor (percent)"),
        P("clean_dist", float, 0.0,
          "duplicate removal min distance (Å; 0 = off)"),
        P("clean_shape_angles", int, 25,
          "shape-score marginalization: angular samples"),
        P("clean_shape_defocuses", int, 25,
          "shape-score marginalization: defocus samples"),
        P("clean_spr_auto", bool, False,
          "automatic score threshold from the bimodal score distribution "
          "(reference tabs.clean.spr_auto)"),
        P("clean_mintilt", float, -90.0,
          "only keep projections with tilt-angles above this limit"),
        P("clean_maxtilt", float, 90.0,
          "only keep projections with tilt-angles below this limit"),
        P("clean_min_num_projections", int, 1,
          "remove particles left with fewer active projections than this"),
        P("clean_check_reconstruction", bool, False,
          "rebuild a reconstruction from the cleaned table for inspection"),
        P("clean_discard", bool, False,
          "permanently drop deactivated rows from the table (default "
          "keeps them at occupancy 0, FREALIGN semantics)"),
        P("clean_export_clean", bool, False,
          "write cleaned particle coordinates to frealign/selected_particles/"),
        P("clean_cluster_stacks", bool, False,
          "write per-(view, defocus) group particle stacks + a group-mean "
          "montage to clusters/ for inspection"),
        P("filter_criteria", str, "",
          "item filter clauses, e.g. 'ctf_res<8 drift<60 particles>10' "
          "(filter mode; metrics from the metadata bundles)"),
        P("filter_name", str, "filter1", "name of the saved selection"),
        P("filter_sel", str, "",
          "apply a saved filter selection (name or path) when discovering "
          "items in any per-item mode"),
        P("filter_include", str, "",
          "comma list of item names to force-include"),
        P("filter_exclude", str, "",
          "comma list of item names to force-exclude"),
        P("prism_enable", bool, False,
          "run quality assessment as part of preprocessing"),
        P("prism_size", int, 128,
          "quality model input size (real + power-spectrum channels)"),
        P("prism_latent", int, 16, "quality embedding dimensions"),
        P("prism_steps", int, 300, "quality model training steps"),
        P("prism_batch", int, 16, "quality model batch size"),
        P("prism_lr", float, 1e-3, "quality model learning rate"),
        P("prism_seed", int, 0, "quality model training seed"),
        P("convert_scaling", float, 1.0,
          "byp cbox interop: scaling of the cryolo tomogram vs the pyp "
          "binned tomogram (pyp_convert_coord -scaling)"),
        P("convert_z", int, 256,
          "byp cbox interop: z height of the cryolo tomogram (px)"),
        P("convert_depth", int, 256,
          "byp cbox interop: z depth of the pyp binned tomogram (px)"),
        P("to_cbox", bool, False,
          "byp: convert an IMOD model to a crYOLO .cbox file"),
        P("fsc_mask", str, "",
          "fsc mode: mask map for phase-randomization-corrected FSC"),
        P("fsc_out", str, "fsc",
          "fsc mode: output basename (<out>.txt + <out>.png)"),
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
        P("movie_group", int, 1, "average groups of N raw frames before alignment"),
        P("movie_align_bin", int, 2,
          "Fourier binning for the HBM-frugal large-movie alignment path"),
        P("movie_large_threshold_mpix", int, 300,
          "movies above this many Mpixels use the binned+scan path"),
        P("movie_tol", float, 0.0,
          "alignment convergence tolerance (px; 0 = fixed iterations)"),
        P("movie_phase_only", bool, False,
          "phase-only correlation (unit-magnitude cross spectra)"),
        P("movie_ref", str, "average", "xcorr reference",
          enum=("average", "middle")),
        P("movie_patch_bfactor", float, 500.0,
          "B-factor for local patch xcorr weighting (Å²)"),
        P("movie_patch_iters", int, 6, "local patch alignment iterations"),
        P("movie_patch_smooth", int, 3,
          "polynomial order for patch trajectory smoothing"),
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
        P("ctf_polar_rings", int, 384, "radial samples of the polar spectrum"),
        P("ctf_polar_angles", int, 64, "azimuthal samples of the polar spectrum"),
        P("ctf_lowres_1d", float, 8.0,
          "band floor (Å) of the 1D exhaustive defocus stage"),
        P("ctf_tile_overlap", float, 0.5, "periodogram tile overlap fraction"),
        P("ctf_phase_min", float, 0.0, "phase-shift search floor (rad)"),
        P("ctf_phase_max", float, 3.1416, "phase-shift search ceiling (rad)"),
        P("ctf_phase_steps", int, 14, "phase-shift search samples"),
        P("ctf_determine_thickness", bool, False,
          "fit sample thickness from CTF node modulation (ctffind5 role)"),
        P("ctf_thickness_max", float, 1000.0, "max thickness searched (Å)"),
        P("ctf_thickness_steps", int, 51, "thickness search samples"),
        P("ctf_avgrot_bins", int, 256, "1D rotational-average bins (avgrot)"),
        P("ctf_use_lcl", bool, False,
          "per-region CTF fits + defocus plane for per-particle defocus "
          "(ctffind_spr_local_estimate role)"),
        P("ctf_lcl_grid", int, 2, "local-CTF region grid (g x g)"),
        P("ctf_bg_sigma", float, 6.0,
          "background-subtraction smoothing of the polar spectrum (rings)"),
        P("ctf_diag_size", int, 512, "CTF diagnostic image size (px)"),
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
        P("detect_invert", bool, True,
          "particles are dark (standard cryo contrast)"),
        P("detect_contamination", bool, True,
          "mask high-variance contamination before picking"),
        P("detect_gold_erase", bool, False,
          "detect + erase gold beads before picking"),
        P("detect_gold_rad", float, 50.0, "gold bead radius (Å)"),
        P("detect_gold_thresh", float, 5.0, "gold detection threshold (sigma)"),
        P("detect_gold_max", int, 256, "max gold beads erased"),
        P("detect_nn_threshold", float, 0.3, "NN picker heatmap threshold"),
        P("detect_nn_model", str, "",
          "NN picker weights path (default picker_model.npz)"),
        P("detect_band_low", float, 6.0,
          "blob band-select low cutoff factor (1/(f*radius) cycles/px)"),
        P("detect_band_high", float, 1.5,
          "blob band-select high cutoff factor"),
        P("detect_disk_frac", float, 0.5,
          "matched-disk response radius as a fraction of particle radius"),
        P("detect_cont_sigma", float, 8.0,
          "contamination mask threshold (robust z over the coarse scale)"),
        P("detect_cont_scale", float, 4.0,
          "contamination disk scale (x particle radius)"),
        P("detect_edge", int, 0,
          "edge exclusion margin (px; 0 = extract_box/2)"),
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
        P("extract_float16", bool, False,
          "write the particle stack as float16 (halves disk)"),
        P("extract_norm", bool, True,
          "normalize windows to zero mean / unit background variance"),
        P("extract_subpixel", bool, True,
          "honor float pick coordinates with Fourier sub-pixel shifts"),
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
        P("tomo_ali_bp_low", float, 0.01,
          "prealignment bandpass low cutoff (cycles/px)"),
        P("tomo_ali_bp_high", float, 0.2,
          "prealignment bandpass high cutoff (cycles/px)"),
        P("tomo_ali_model_iters", int, 5,
          "projection-model alternating solve iterations"),
        P("tomo_ali_min_beads", int, 4,
          "fewest tracked beads accepted before falling back to patches"),
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
        P("tomo_rec_erase_rad", float, 0.0,
          "erase gold fiducials of this radius (Å) before reconstruction"),
        P("tomo_rec_float16", bool, False, "write tomograms as float16"),
        P("tomo_min_tilt", float, -90.0, "exclude tilts below this angle"),
        P("tomo_max_tilt", float, 90.0, "exclude tilts above this angle"),
        P("tomo_rec_filter_cutoff", float, 0.35, "ramp filter cutoff (cyc/px)"),
        P("tomo_rec_filter_falloff", float, 0.05, "ramp filter falloff"),
        P("tomo_rec_erase_fiducials", bool, False, "erase gold beads first"),
        P("tomo_rec_gold_rad", float, 100.0, "gold bead radius for erasure (Å)"),
        P("tomo_rec_dose_weighting", bool, False,
          "dose-weight tilts by cumulative exposure before reconstruction"),
        P("tomo_rec_slab", int, 16,
          "backprojection z-slab height (HBM working-set control)"),
        P("tomo_rec_filter_window", str, "none",
          "apodization window on the WBP ramp filter (IMOD filter family)",
          enum=("none", "hamming", "hann", "shepp")),
        P("tomo_rec_zshift", float, 0.0,
          "reconstruction center z offset (px, + = toward the beam)"),
        P("tomo_rec_ctf_correct", bool, False,
          "depth-dependent CTF correction of tilts before reconstruction "
          "(IMOD ctfphaseflip role, strip-free band version)"),
        P("tomo_rec_ctf_bands", int, 20,
          "depth bands for per-tilt CTF correction"),
        P("tomo_hand_detect", bool, False,
          "estimate defocus handedness from tilt geometry (detect_handedness)"),
        P("tomo_hand_min_tilt", float, 20.0,
          "handedness vote: only tilts above this |angle| (deg)"),
        P("tomo_hand_df_range", float, 8000.0,
          "handedness vote: defocus search range (Å)"),
        P("tomo_hand_df_step", float, 250.0,
          "handedness vote: defocus search step (Å)"),
    ],
    "tomo_vir": [
        P("tomo_vir_method", str, "none", "virion detection",
          enum=("none", "template", "auto", "nn")),
        P("tomo_vir_nn_steps", int, 400,
          "membrane segmenter training steps (nn method; the model is "
          "trained once on procedural membranes and cached)"),
        P("tomo_vir_nn_model", str, "",
          "membrane segmenter weights path (default membrane_model.npz)"),
        P("tomo_srf_offset", float, 0.0,
          "surface picks: displacement along the outward normal (Å)"),
        P("tomo_sphere_seg_tol_px", float, 0.0,
          "SH membrane refinement search band in px (0 = fractional "
          "tomo_vir_search_band)"),
        P("tomo_vir_det_tol", float, 0.0,
          "virion seed minimum separation (Å; 0 = default)"),
        P("tomo_vir_binn", int, 1,
          "virion detection binning (sphere Hough on a binned volume)"),
        P("tomo_vir_rad", float, 500.0, "virion radius (Å)"),
        P("tomo_vir_detect_band", float, 800.0, "detection band (Å)"),
        P("tomo_vir_detect_max", int, 8, "max virions per tomogram"),
        P("tomo_vir_points", int, 200, "surface mesh points per virion"),
        P("tomo_vir_lmax", int, 4, "spherical-harmonics degree for membrane refinement"),
        P("tomo_vir_sh_iters", int, 80, "SH surface refinement gradient steps"),
        P("tomo_vir_sh_lr", float, 0.3, "SH surface refinement step size"),
        P("tomo_vir_sh_smoothness", float, 0.05,
          "SH surface curvature regularization"),
        P("tomo_vir_search_band", float, 0.3,
          "radial search band around the nominal radius (fraction)"),
        P("tomo_vir_radial_samples", int, 31,
          "radial profile samples of the membrane edge detector"),
    ],
    "tomo_spk": [
        P("mine_patch", int, 16, "miner subvolume size (voxels)"),
        P("mine_steps", int, 300, "miner contrastive training steps"),
        P("mine_clusters", int, 8, "miner k-means clusters"),
        P("mine_embed_dim", int, 32, "miner embedding dimension"),
        P("tomo_spk_slab_max", int, 64, "auto picking: peaks per z-slab"),
        P("tomo_spk_slab_thresh", float, 4.0,
          "auto picking: slab peak threshold (sigma)"),
        P("tomo_spk_method", str, "none", "3D particle picking",
          enum=("none", "auto", "template", "surface", "import",
                "filament")),
        P("tomo_spk_fil_spacing", float, 0.0,
          "filament picking: particle spacing along traced filaments "
          "(Å; 0 = 2x radius)"),
        P("tomo_spk_fil_thresh", float, 0.3,
          "filament picking: vesselness threshold (fraction of max)"),
        P("tomo_spk_fil_min_points", int, 4,
          "filament picking: minimum traced ridge points per filament"),
        P("tomo_seg_open", bool, False,
          "segment open membranes (sheetness) and write <name>.seg.mrc"),
        P("tomo_seg_thickness", float, 30.0,
          "open-membrane segmentation: expected membrane thickness (Å)"),
        P("tomo_seg_thresh", float, 0.3,
          "open-membrane segmentation: sheetness threshold (fraction of "
          "max)"),
        P("tomo_spk_rad", float, 100.0, "particle radius (Å)"),
        P("tomo_spk_dist", float, 0.0,
          "min 3D distance between picks (Å; 0 = 2x radius)"),
        P("tomo_spk_max", int, 2048, "max picks per tomogram"),
        P("tomo_spk_thresh", float, 0.0, "3D template-match score threshold"),
        P("tomo_pick_ref", str, "", "3D template reference map (MRC)"),
        P("tomo_pick_ang", float, 30.0, "3D template-match angular step (deg)"),
        P("mine_lr", float, 1e-3, "miner learning rate"),
        P("mine_temperature", float, 0.2, "miner contrastive temperature"),
        P("mine_batch", int, 64, "miner training batch size"),
        P("mine_seed", int, 0, "miner training seed"),
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
        P("class_psi_step", float, 15.0, "2D in-plane angle step (deg)"),
        P("class_shift_step", float, 2.0, "2D shift grid step (px)"),
        P("class_seed", int, 0, "classification random seed"),
        P("class3d_iters", int, 8, "3D classification iterations"),
        P("class3d_tau", float, 1.0, "occupancy mixing prior weight"),
        P("class3d_occ_floor", float, 1.0, "occupancy floor (percent)"),
        P("class_focusmask", str, "",
          "focused classification sphere x,y,z,radius (Å; empty = off)"),
        P("class3d_force_init", bool, False,
          "discard a previous classification table instead of resuming "
          "occupancies from it"),
        P("class3d_refineeulers", int, 3,
          "classification blocks: particle-angle passes per iteration "
          "(composes the csp mode schedule)"),
        P("class3d_refineshifts", int, 2,
          "classification blocks: particle-shift passes per iteration"),
        P("class_wiener", float, 10.0,
          "class-average Wiener restoration constant"),
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
        P("refine_score_weighting", bool, False,
          "tomo classification: weight per-tilt class evidence by dataset "
          "score averages instead of the tilt-angle Gaussian "
          "(pyp_config [tabs.refine.score_weighting])"),
        P("refine_frm_wiener", float, 0.1,
          "frm engine: CTF Wiener restoration constant"),
        P("refine_frm_rounds", int, 3, "frm engine: match/shift rounds"),
        P("refine_frm_npsi", int, 0, "frm engine: psi samples (0 = auto)"),
        P("refine_frm_upsample", int, 4,
          "FRM psi-correlation FFT upsampling"),
        P("refine_frm_shift_step", float, 0.0,
          "FRM fine shift grid step (px; 0 = searchx/12)"),
        P("refine_frm_dblock", int, 0,
          "FRM direction block size (0 = auto from HBM budget)"),
        P("refine_frm_crop_margin", int, 8,
          "FRM band-limited auto-crop: wavenumber margin over r_max"),
        P("refine_maskrad", float, 0.0,
          "alignment mask radius override (Å; 0 = particle_rad)"),
        P("model_fit", str, "",
          "PDB model evaluated against the map after each iteration "
          "(Model-fitting tab; writes maps/<dataset>_model_fit.txt)"),
        P("model_fit_bfactor", float, 100.0,
          "extra B-factor applied to the Gaussian-atom model (Å²)"),
        P("refine_frm_polish", str, "final",
          "sub-lattice gradient polish after FRM: never/final/always",
          enum=("never", "final", "always")),
        P("refine_goldstandard", bool, False,
          "align each half-set only against its own half map (unbiased FSC)"),
        P("refine_beamtilt", bool, False,
          "estimate + correct dataset beam tilt once poses are warm"),
        P("refine_iblow", int, 2,
          "reference-volume Fourier oversampling (cisTEM iblow)"),
        P("refine_fmatch", bool, False,
          "write matching projections <dataset>_match.mrc after refinement"),
        P("refine_mask", str, "1,1,1,1,1",
          "refine psi,theta,phi,shx,shy flags (cisTEM refine_mask)"),
        P("refine_fsc_threshold", float, 0.143, "FSC resolution criterion"),
        P("refine_fboost", bool, False,
          "boost weights of shells below fboostlim (signed-CC boost)"),
        P("refine_fboostlim", float, 0.0, "signed-CC boost resolution (Å)"),
        P("refine_fssnr", bool, True,
          "weight matching shells by the half-map FSC (SSNR statistics "
          "role; off = unweighted band)"),
        P("refine_priors", bool, True,
          "restrict the FRM local search to a cone prior around the "
          "current pose (off = full-lattice local search)"),
        P("refine_masking_method", str, "spherical",
          "reference-map masking before matching",
          enum=("spherical", "auto", "file")),
        P("refine_maskth", str, "",
          "mask volume path (refine_masking_method=file)"),
        P("refine_srad", float, 0.0,
          "global-search mask radius (Å; 0 = particle_rad)"),
        P("refine_lr_angles", float, 2.0,
          "local gradient polish: angular step size (deg-scale)"),
        P("refine_lr_shifts", float, 0.4,
          "local gradient polish: shift step size (px-scale)"),
        P("refine_fdef", bool, False,
          "per-particle defocus refinement once poses are warm "
          "(cisTEM refine_ctf role)"),
        P("refine_def_range", float, 500.0,
          "per-particle defocus search range (Å)"),
        P("refine_def_steps", int, 21, "per-particle defocus search samples"),
        P("refine_beamtilt_rlref", float, 20.0,
          "beam-tilt estimation low-res limit (Å)"),
        P("refine_beamtilt_rhref", float, 4.0,
          "beam-tilt estimation high-res limit (Å)"),
        P("refine_shift_step", float, 2.0,
          "global-search shift grid step (px, gather engine)"),
        P("refine_pbc", float, 0.0,
          "FREALIGN PBC: score->weight conversion sharpness for "
          "reconstruction (0 = off; weight = exp(pbc*(score-boff)/100))"),
        P("refine_boff", float, 0.0,
          "FREALIGN BOFF: score offset of the PBC weighting "
          "(0 = dataset mean score)"),
        P("refine_rbfact", float, 0.0,
          "B-factor envelope applied to the matching filter (Å²; "
          "downweights high-res shells during alignment only)"),
    ],
    # ------------------------------------------------------------ reconstruct
    "reconstruct": [
        P("reconstruct_iewald", int, 0,
          "Ewald sphere correction (FREALIGN IEWALD: 0 off, +-1 simple "
          "curved insertion, sign = handedness; +-2 maps to simple)"),
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
        P("reconstruct_batch", int, 256,
          "particles per insertion step (HBM working-set control)"),
        P("reconstruct_score_threshold", float, 0.0,
          "zero-weight particles under this score percentile"),
        P("reconstruct_per_particle_splitting", bool, True,
          "half-set split per particle; False = split by micrograph "
          "(beam-induced correlations stay inside one half)"),
        P("reconstruct_gridding", str, "trilinear",
          "Fourier gridding kernel (nearest: 8x fewer scatter points, "
          "worse sparse-coverage recovery)",
          enum=("trilinear", "nearest")),
        P("reconstruct_fbfact", bool, False,
          "determine (Guinier) and apply a B-factor to the final "
          "reconstruction (FREALIGN fbfact card)"),
        P("reconstruct_lblur", bool, False,
          "likelihood blurring: insert each particle over a psi-offset "
          "bank around its refined in-plane angle (cisTEM blurring card)"),
        P("reconstruct_lblur_nrot", int, 21,
          "rotations used for likelihood blurring"),
        P("reconstruct_lblur_range", float, 20.0,
          "blur window width (degrees) for likelihood blurring"),
        # score-shaping windows (reference tabs.reconstruct.* spellings,
        # pyp_config.toml:5909-5980, applied via shape_phase_residuals
        # before every reconstruct3d)
        P("reconstruct_minazh", float, 0.0,
          "min azimuth (deg, mod(theta,180)) used for reconstruction"),
        P("reconstruct_maxazh", float, 180.0,
          "max azimuth (deg) used for reconstruction"),
        P("reconstruct_mindef", float, 0.0,
          "min defocus (Å) used for reconstruction"),
        P("reconstruct_maxdef", float, 100000.0,
          "max defocus (Å) used for reconstruction"),
        P("reconstruct_minscore", float, 0.0,
          "min score window; <1 = fraction of each group's score range"),
        P("reconstruct_maxscore", float, 1.0,
          "max score window; <=1 = fraction of each group's score range"),
        P("reconstruct_mintilt", float, -90.0,
          "min tilt-angle (deg) used for reconstruction"),
        P("reconstruct_maxtilt", float, 90.0,
          "max tilt-angle (deg) used for reconstruction"),
        P("reconstruct_firstframe", int, 0,
          "first frame/exposure index used for reconstruction"),
        P("reconstruct_lastframe", int, -1,
          "last frame/exposure index used for reconstruction (-1=all)"),
        P("reconstruct_score_fraction", float, 1.0,
          "keep this fraction of best scores inside each (view, defocus) "
          "group (0=automatic bimodal threshold)"),
        P("reconstruct_shapr", str, "none",
          "score shaping: reverse polarity, or consistency selection vs "
          "the previous iteration's angles/shifts",
          enum=("none", "reverse", "consistency")),
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
        P("csp_OptimizerStepLength", float, 0.3,
          "gradient step length for csp modes"),
        P("csp_rotreg", bool, False,
          "regularize per-tilt geometry angles across the series (spline)"),
        P("csp_ToleranceMicrographTiltAxisAngles", float, 0.0,
          "grid-search range: tilt-axis angle (deg; 0 = don't search — "
          "per-tilt axis freedom overfits unperturbed geometry, measured "
          "+0.9 deg tilt-angle error on the synthetic e2e)"),
        P("csp_ToleranceParticlesPhi", float, 10.0,
          "grid-search range: particle phi (deg)"),
        P("csp_ToleranceParticlesTheta", float, 10.0,
          "grid-search range: particle theta (deg)"),
        P("csp_UseImagesForReconstructionMin", int, 0,
          "first tilt inserted into the reconstruction"),
        P("csp_UseImagesForReconstructionMax", int, -1,
          "last tilt inserted (-1 = all)"),
        P("csp_ctf_handedness", float, 1.0,
          "defocus handedness sign (RELION tomo export, detect_handedness)"),
        P("csp_frames", bool, False,
          "per-tilt movie-frame refinement pass (FIND axis)"),
        P("csp_Grid", str, "1:1:1", "patch grid (x:y:z)"),
        P("csp_GridSearch", bool, False,
          "coarse discrete search before the gradient polish (csp_GS role)"),
        P("csp_GridSearchSteps", int, 9, "grid points per searched axis"),
        P("csp_batch_series", int, 8,
          "tilt-series refined per fused TPU dispatch (csp_refine_batch; "
          "1 = per-series jobs)"),
        P("csp_ToleranceMicrographTiltAngles", float, 10.0,
          "tilt-angle search tolerance (deg)"),
        P("csp_ToleranceMicrographShifts", float, 20.0,
          "micrograph-shift search tolerance (px)"),
        P("csp_ToleranceMicrographDefocus1", float, 2000.0,
          "per-tilt defocus search tolerance (Å)"),
        P("csp_ToleranceParticlesPsi", float, 10.0,
          "particle-angle search tolerance (deg, psi)"),
        P("csp_ToleranceParticlesShifts", float, 10.0,
          "particle-shift search tolerance (voxels)"),
        P("csp_save_stacks", bool, False,
          "export per-particle tilt stacks at the refined geometry "
          "(stacks/<name>_stack.npz) for tilt-aware heterogeneity"),
        P("csp_spin_search", float, 0.0,
          "in-plane spin ring search step (deg, 0 = off; auto-enabled when "
          "surface-normal orientation priors seed the particle eulers)"),
        P("csp_box", int, 64, "projection window size (px)"),
        P("csp_rlref", float, 60.0, "low-res limit (Å)"),
        P("csp_rhref", str, "12", "high-res limit schedule (Å)", schedule=True),
        P("csp_ToleranceMicrographDefocus2", float, 0.0,
          "defocus-2 search tolerance (Å); mode 4 searches the wider of "
          "the two axis tolerances"),
        P("csp_ToleranceMicrographAstigmatism", float, 0.0,
          "per-tilt astigmatism tolerance (deg) — accepted for project-"
          "file compatibility; not a refinable block (warned)"),
        P("csp_NumberOfRandomIterations", int, 0,
          "random-search candidates added inside the tolerance region "
          "(the csp random-search alternative to the uniform grid)"),
        P("csp_OptimizerStepTolerance", float, 0.0,
          "optimizer termination: freeze updates once the parameter step "
          "norm falls below this (0 = off)"),
        P("csp_OptimizerValueTolerance", float, 0.0,
          "optimizer termination: freeze updates once the score "
          "improvement per step falls below this (0 = off)"),
        P("csp_AngleStep", float, 0.0,
          "grid-search spacing for angle modes (deg; 0 = uniform "
          "csp_GridSearchSteps count)"),
        P("csp_ShiftStep", float, 0.0,
          "grid-search spacing for shift modes (px; 0 = uniform count)"),
        P("csp_parfile", str, "",
          "external parameter table (<dir>/<series>.cistem or one file) "
          "whose eulers seed this pass"),
        P("csp_parfile_tomo", str, "",
          "tomography parameter table (csp_tomo_free import) — fallback "
          "for csp_parfile"),
        P("csp_resume", bool, False,
          "reuse per-series accumulator dumps that already exist"),
        P("csp_reference_model", str, "",
          "reference map path override (default initial_model.mrc)"),
        P("csp_RefineProjectionCutoff", int, 0,
          "refine against only the N lowest-|angle| projections "
          "(0 = all in the exposure window)"),
        P("csp_block", str, "",
          "UI block whose tab overrides the engine namespace "
          "(csp_tomo_init/coarse/reference/movie/movie_after/"
          "classification/free)"),
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
        P("slurm_account", str, "", "sbatch --account"),
        P("slurm_qos", str, "", "sbatch --qos"),
        P("slurm_spr_walltime", str, "", "spr swarm walltime override"),
        P("slurm_spr_tasks", int, 0, "spr swarm cpus override (0 = generic)"),
        P("slurm_spr_memory", int, 0, "spr swarm memory GB override"),
        P("slurm_tomo_walltime", str, "", "tomo swarm walltime override"),
        P("slurm_tomo_tasks", int, 0, "tomo swarm cpus override"),
        P("slurm_tomo_memory", int, 0, "tomo swarm memory GB override"),
        P("slurm_csp_walltime", str, "", "csp swarm walltime override"),
        P("slurm_csp_tasks", int, 0, "csp swarm cpus override"),
        P("slurm_csp_memory", int, 0, "csp swarm memory GB override"),
        P("slurm_merge_tasks", int, 0, "merge job cpus override (0 = generic)"),
        P("slurm_merge_memory", int, 0, "merge job memory GB override"),
        P("slurm_train_walltime", str, "", "NN training job walltime override"),
        P("slurm_train_gres", str, "", "NN training job gres, e.g. tpu:1"),
        P("slurm_class_walltime", str, "",
          "classification job walltime override"),
        P("slurm_class_tasks", int, 0, "classification job cpus override"),
        P("slurm_class_memory", int, 0,
          "classification job memory GB override"),
        P("slurm_local_tasks", int, 0,
          "local executor worker threads (0 = slurm_tasks)"),
        P("slurm_retries", int, 2, "swarm leaf-job retry budget"),
    ],
    # --------------------------------------------------------------- parallel
    "parallel": [
        P("parallel_data", int, 0,
          "data-parallel mesh axis size (0 = all devices / parallel_model)"),
        P("parallel_model", int, 1, "model-parallel mesh axis size"),
    ],
    # ----------------------------------------------------------------- export
    "export": [
        P("export_location", str, "",
          "directory for exported star files (reference csp "
          "-export_location)"),
        P("import_format", str, "none",
          "declared import format; content detection wins, a mismatch is "
          "surfaced (csp_tomo_free format field)",
          enum=("none", "relion", "relion5", "star", "warp")),
        P("import_refine_star", str, "",
          "RELION refinement star to import (reference rlp flag)"),
        P("import_tomo_star", str, "",
          "RELION tomograms star to import (reference rlp flag)"),
        P("import_motion_star", str, "",
          "RELION corrected-micrographs star to import (reference rlp "
          "flag)"),
        P("to_hdf", bool, False,
          "byp: convert an .mrc/.mrcs stack to EMAN2 HDF"),
        P("export_optics_group", int, 1,
          "rlnOpticsGroup id written to exported star files"),
        P("export_image_fmt", str, "{i}@stack.mrcs",
          "rlnImageName format ({i} = 1-based particle index)"),
        P("export_artiax", bool, True,
          "write per-tilt-series ArtiaX ministar files during CSPT "
          "(artiax/<name>_K1.star, reference generate_ministar)"),
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
        P("abinit_polish_rounds", int, 2,
          "continuous-shift polish rounds after the hard rounds"),
        P("abinit_seed", int, 0, "ab-initio random seed"),
        P("abinit_skip", bool, False,
          "skip ab initio even when no initial model exists "
          "(csp_tomo_init InitialSkip: fall back to the sphere model)"),
        P("abinit_random_particles", int, 8,
          "particles seeding the lumpy random-pose start model"),
        P("abinit_random_skip_ratio", float, 0.0,
          "fraction of particles randomly dropped from each soft "
          "reconstruction round (decorrelates early wrong assignments)"),
        P("abinit_engine", str, "frm",
          "ab-initio engine: frm (marginalized polar matmul) or classic "
          "(stochastic subset common-lines-free annealing)",
          enum=("frm", "classic")),
        P("abinit_subset_frac", float, 0.5,
          "classic engine: particle subset per round"),
        P("abinit_anneal", float, 0.0,
          "classic engine: pose perturbation annealing scale"),
    ],
    # ----------------------------------------------------------------- polish
    "polish": [
        P("polish_iters", int, 30, "trajectory refinement gradient steps"),
        P("polish_lr", float, 0.15, "trajectory refinement step size"),
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
        P("mask_mw", float, 0.0,
          "target molecular weight (kDa): pick the auto-mask threshold so "
          "the enclosed volume matches (0 = sigma threshold)"),
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
        P("train_bin", int, 1,
          "training binning: Fourier-crop inputs + scale picks "
          "(detect_nn2d bin / detect_nn3d down_ratio)"),
        P("detect_nn3d_num_epochs", int, None,
          "tomogram picker training epochs (~100 patches each; overrides "
          "train_steps)"),
        P("detect_nn3d_use_denoised", bool, True,
          "train/evaluate on the denoised tomogram when one exists"),
        P("train_batch", int, 16, "NN picker batch size"),
        P("train_lr", float, 3e-4, "NN picker learning rate"),
        P("train_patch", int, 128, "NN picker training patch (px)"),
        P("train_seed", int, 0, "NN picker training seed"),
    ],
    # -------------------------------------------------------------------- sva
    "sva": [
        P("sva_box", int, 48, "subvolume box gathered from tomograms (vx)"),
        P("sva_iters", int, 3, "align/average iterations"),
        P("sva_ang", float, 30.0,
          "initial angular step (deg; halves per iteration, floor 7.5)"),
        P("sva_shift", int, 8, "translational search extent (vx)"),
        P("sva_wedge", float, 60.0,
          "missing-wedge half angle = max |tilt| (deg; 90 = no wedge)"),
        P("sva_ref", str, "",
          "starting reference map (empty = reference-free raw average)"),
        P("sva_lowpass", str, "0.25,0.05",
          "alignment low-pass 'cutoff,decay' (0-1 of Nyquist)"),
        P("sva_highpass", str, "0,0",
          "alignment high-pass 'cutoff,decay' (0-1 of Nyquist)"),
        P("sva_mask_rad", float, 0.0,
          "reference mask radius (vx; 0 = 0.45 box)"),
        P("sva_mask_sigma", float, 4.0, "reference mask soft edge (vx)"),
        P("sva_centering_iters", int, 0,
          "translation-only pre-centering rounds (reference-free start)"),
        P("sva_keep_fraction", float, 1.0,
          "keep this best-scoring fraction in each average"),
        P("sva_classes", int, 1,
          "aligned-frame k-means classes (1 = no classification)"),
        P("sva_local", bool, True,
          "later rounds refine locally around the current pose"),
    ],
    # ---------------------------------------------------------- heterogeneity
    "het": [
        P("het_latent", int, 8, "latent dimensions (cryoDRGN role)"),
        P("het_eval", bool, False,
          "evaluate with the saved het_model.npz checkpoint instead of "
          "training (heterogeneityeval role)"),
        P("het_input", str, "",
          "tilt-stack bundles glob for the tomoDRGN-role branch (default "
          "stacks/*_stack.npz when no stack.mrc is present)"),
        P("het_steps", int, 500, "training steps"),
        P("het_batch", int, 32, "training batch size"),
        P("het_lr", float, 1e-3, "learning rate"),
        P("het_rlref", float, 60.0, "low-res limit (Å)"),
        P("het_rhref", float, 8.0, "high-res limit (Å)"),
        P("het_kl", float, 1e-3, "KL regularization weight"),
        P("het_seed", int, 0, "training seed"),
        P("het_volumes", int, 5,
          "decoded volumes written along the first latent PC"),
        P("het_pc", int, 1, "latent principal component to traverse"),
        P("het_hidden", int, 128, "decoder hidden width"),
    ],
    # ---------------------------------------------------------------- sharpen
    "sharpen": [
        P("sharpen_bfactor", float, 0.0, "B-factor (0 = automatic Guinier fit)"),
        P("sharpen_rand_res", float, 10.0,
          "phase-randomization cutoff for mask-corrected FSC (Å)"),
        P("sharpen_fsc_cut", float, 0.143,
          "FSC threshold reported/used for the final lowpass"),
        P("sharpen_fsc_weight", bool, True,
          "apply Cref figure-of-merit weighting from the masked FSC"),
        P("sharpen_final_lowpass", bool, True,
          "cosine lowpass the sharpened map at the FSC resolution"),
        P("sharpen_apply_mask", bool, True,
          "multiply the written map by the auto-mask"),
        P("sharpen_bfac_lowres", float, 10.0,
          "Guinier auto-B-factor fit: low-res bound (Å)"),
        P("sharpen_mask_lowpass", float, 15.0, "auto-mask lowpass (Å)"),
        P("sharpen_mask_threshold", float, 1.0, "auto-mask threshold (sigma)"),
        P("sharpen_mask_dilation", int, 3, "auto-mask dilation (px)"),
        P("sharpen_mask_soft", int, 6, "auto-mask soft edge (px)"),
        P("sharpen_locres", bool, False,
          "local resolution estimation (relion_postprocess --locres role)"),
        P("sharpen_locres_sampling", float, 25.0,
          "local-resolution sample grid spacing (Å)"),
        P("sharpen_locres_maskrad", float, -1.0,
          "window mask radius (Å; -1 = 0.5*sampling)"),
        P("sharpen_locres_edgwidth", float, -1.0,
          "window mask soft-edge width (Å; -1 = sampling)"),
        P("sharpen_locres_randomize_at", float, 25.0,
          "phase-randomize beyond this resolution for mask correction (Å)"),
        P("sharpen_locres_minres", float, 50.0,
          "lowest local resolution allowed (Å)"),
        P("sharpen_locfilt", bool, True,
          "write a locally-filtered map alongside the local-resolution map"),
        P("sharpen_mask", str, "",
          "user-provided mask volume (overrides auto-masking; pair with "
          "the standalone mask mode)"),
        P("sharpen_mtf", str, "",
          "detector MTF curve to divide out (RELION MTF star or 2-col "
          "text)"),
        P("sharpen_mtf_angpix", float, -1.0,
          "original detector pixel size for the MTF axis (Å; -1 = map "
          "pixel)"),
        P("sharpen_input_map", str, "",
          "postprocess this single map instead of the newest half pair "
          "(no FSC; cisTEM sharpen_map input card)"),
        P("sharpen_first_half", str, "",
          "explicit half-map 1 path (relion --i role)"),
        P("sharpen_second_half", str, "", "explicit half-map 2 path"),
        P("sharpen_inner_mask_radius", float, 0.0,
          "spherical shell mask: inner radius (Å; 0 = solid sphere)"),
        P("sharpen_outer_mask_radius", float, 0.0,
          "spherical mask outer radius (Å; 0 = auto/user mask instead)"),
        P("sharpen_low_res_bfactor", float, 0.0,
          "split-B: B-factor below the flattening resolution (Å²)"),
        P("sharpen_high_res_bfactor", float, 0.0,
          "split-B: B-factor beyond the flattening resolution (Å²)"),
        P("sharpen_flatten_res", float, 0.0,
          "split-B transition resolution (Å; 0 = single B)"),
        P("sharpen_high_res_limit", float, 0.0,
          "hard final lowpass (Å; 0 = FSC resolution)"),
        P("sharpen_edge_width", float, 0.0,
          "final lowpass cosine edge width (Fourier px; 0 = default)"),
        P("sharpen_invert_handedness", bool, False,
          "mirror the written map through the xy plane"),
        P("sharpen_bfac_highres", float, 0.0,
          "Guinier auto-B fit: high-res bound (Å; 0 = 2.5 px)"),
        P("sharpen_randomize_at_fsc", float, 0.0,
          "randomize phases where the unmasked FSC crosses this value "
          "(overrides sharpen_rand_res)"),
        P("sharpen_random_seed", int, 0,
          "phase-randomization seed offset"),
        P("sharpen_half_maps", bool, False,
          "also write postprocessed half maps for validation"),
        P("sharpen_ampl_corr", bool, False,
          "write amplitude-correlation + DPR validation curves "
          "(relion_postprocess --ampl_corr role)"),
    ],
    # ---------------------------------------------------------------- denoise
    "denoise": [
        P("denoise_spr", str, "none",
          "micrograph denoising for picking: none | n2n (noise2noise on "
          "aligned even/odd frame averages, model shared per process)"),
        P("denoise_method", str, "none", "tomogram denoising",
          enum=("none", "n2n", "wedge", "deconv")),
        P("denoise_deconv_snr", float, 1.0,
          "deconv: SNR falloff rate (IsoNet snrfalloff role)"),
        P("denoise_deconv_strength", float, 1.0,
          "deconv: Wiener deconvolution strength (IsoNet deconvstrength)"),
        P("denoise_deconv_highpass", float, 0.02,
          "deconv: cosine highpass width as a fraction of Nyquist "
          "(IsoNet highpassnyquist)"),
        P("denoise_epochs", int, 60, "denoiser training epochs"),
        P("denoise_lowpass", float, 0.0,
          "lowpass applied to the denoised tomogram (Å; 0 = off)"),
        P("denoise_lr", float, 1e-3, "denoiser learning rate"),
        P("denoise_patch", int, 64, "denoiser training patch (px)"),
        P("denoise_batch", int, 16, "denoiser training batch size"),
        P("denoise_seed", int, 0, "denoiser training seed"),
    ],
    # ----------------------------------------------------------------- notify
    "notify": [
        P("notify_email", str, "", "email address for completion/failure mail"),
        P("notify_smtp", str, "localhost", "SMTP host for notifications"),
        P("notify_mongo_uri", str, "",
          "mongo URI (or JSONL spool path) mirroring all log records"),
        P("notify_webid", str, "", "web session id attached to log documents"),
        P("notify_on", str, "always", "when to email",
          enum=("always", "fail", "never")),
    ],
    # ------------------------------------------------------------- tomo_pick
    # 3D picking surface ([tabs.tomo_pick]): direct knobs; the pytom_*/
    # vir_* reference spellings alias onto these + the engine ids
    "tomo_pick": [
        P("tomo_pick_files", str, "",
          "coordinate import: <dir>/<series>.{spk,box,mod,cbox} or a file"),
        P("tomo_pick_files_flip", bool, False,
          "flip imported z against tomo_rec_thickness"),
        P("tomo_pick_rand", bool, True,
          "random particle eulers when no orientation priors exist "
          "(off = zero eulers)"),
        P("tomo_pick_gaussian_3d", bool, False,
          "gaussian pre-smoothing before intensity picking"),
        P("tomo_pick_sigma_3d", float, 15.0, "pre-smoothing sigma"),
        P("tomo_pick_stdtimes_filt_3d", float, 0.0,
          "picking threshold in background sigmas (0 = engine default)"),
        P("tomo_pick_remove_edge_3d", bool, False,
          "widen the excluded edge band to 2 particle radii"),
        P("tomo_pick_radiustimes_3d", float, 0.0,
          "duplicate-removal distance in particle radii (0 = default)"),
        P("tomo_pick_template_size", int, 0,
          "resize the template to this box (px; 0 = as-is)"),
        P("tomo_pick_template_invert", bool, False,
          "invert template contrast"),
        P("tomo_pick_template_mirror", bool, False,
          "mirror the template through z"),
        P("tomo_pick_mask_method", str, "auto", "template masking",
          enum=("auto", "gaussian", "file", "none")),
        P("tomo_pick_mask_sigma", float, 1.0,
          "gaussian template mask width (fractions of box/6)"),
        P("tomo_pick_mask_file", str, "", "template mask volume path"),
        P("tomo_pick_low_pass", float, 0.0,
          "tomogram lowpass before matching (Å; 0 = off)"),
        P("tomo_pick_high_pass", float, 0.0,
          "tomogram highpass before matching (Å; 0 = off)"),
        P("tomo_pick_spectral_whitening", bool, False,
          "flatten the tomogram's radial power spectrum before matching"),
        P("tomo_pick_random_phase_correction", bool, False,
          "subtract the phase-randomized template's score map "
          "(matched-filter noise floor)"),
        P("tomo_pick_estimate_cutoff", bool, False,
          "derive the score threshold from the false-positive budget"),
        P("tomo_pick_cutoff", float, 0.0,
          "explicit score threshold (0 = off)"),
        P("tomo_pick_n_false_positives", float, 1.0,
          "allowed false positives per tomogram for cutoff estimation"),
    ],
    # -------------------------------------------------------------- class2d
    # staged 2D classification protocol ([tabs.class2d]; fyp_daemon roles)
    "class2d": [
        P("class2d_staged", bool, False,
          "run the three-phase protocol (ab initio -> seeded -> "
          "refinement over growing subsets) instead of one EM run"),
        P("class2d_enable", bool, False,
          "streaming: incremental 2D classification in the session daemon"),
        P("class2d_min", int, 5000,
          "streaming: particles required before the first classification"),
        P("class2d_inc", int, 5000,
          "streaming: new particles between re-classifications"),
        P("class2d_num", int, None, "number of classes (alias of class_num)"),
        P("class2d_box", int, 0,
          "classification box (px; 0 = class2d_bin or full box)"),
        P("class2d_bin", int, 1, "classification binning factor"),
        P("class2d_rad", float, 0.0, "mask radius (Å; 0 = none)"),
        P("class2d_fraction", float, 1.0,
          "random fraction of particles classified per phase"),
        P("class2d_rlref", float, None,
          "low-res limit (Å; alias of class_rlcls)"),
        P("class2d_rhini", float, 40.0, "ab-initio phase high-res limit (Å)"),
        P("class2d_rhref", float, None,
          "refinement-phase high-res limit (Å; alias of class_rhcls)"),
        P("class2d_iters_init", int, 15, "ab-initio phase EM iterations"),
        P("class2d_iters_seed", int, 10, "seeded phase EM iterations"),
        P("class2d_iters_refine", int, 3, "refinement phase EM iterations"),
        P("class2d_max_ab_initio", int, 10000,
          "particle cap for the ab-initio phase"),
        P("class2d_max_seeded", int, 50000,
          "particle cap for the seeded phase"),
        P("class2d_max_refinement", int, 100000,
          "particle cap for the refinement phase"),
    ],
}


def _alias_tabs():
    """Schema tabs for the reference-spelled alias ids (metric,
    sharpen_cistem, sharpen_relion, dose_weighting — config.blocks
    REFERENCE_ALIASES): default None so an unset alias never clobbers its
    engine target; types follow the target definition."""
    from pyp_tpu.config.blocks import REFERENCE_ALIASES

    flat = {d.name: d for defs in SCHEMA.values() for d in defs}
    tabs = ("metric", "sharpen_cistem", "sharpen_relion", "dose_weighting",
            "tomo_pick", "class2d", "detect_nn2d", "detect_nn3d",
            "tomo_denoise", "tomo_srf", "tomo_sphere", "tomo_ext", "prism",
            "movie")
    existing = {d.name for defs in SCHEMA.values() for d in defs}
    for tab in tabs:
        entries = []
        for src, (targets, fn) in REFERENCE_ALIASES.items():
            if not src.startswith(tab + "_") or src in existing:
                continue
            t0 = targets if isinstance(targets, str) else targets[0]
            td = flat.get(t0)
            typ = str if fn is not None else (td.type if td else str)
            if fn is not None and fn.__name__ in ("_neg", "_auto_b"):
                typ = bool
            elif fn is not None and fn.__name__ == "_x16":
                typ = int
            t_names = targets if isinstance(targets, tuple) else (targets,)
            entries.append(P(src, typ, None,
                             f"nextPYP spelling of {'/'.join(t_names)}"))
        if entries:
            SCHEMA.setdefault(tab, [])
            SCHEMA[tab] = list(SCHEMA[tab]) + entries


_alias_tabs()

# Per-block stage tabs mirroring the reference's [tabs.csp_tomo_*] groups
# (pyp_config.toml): each field overrides its engine-namespace target via
# config.blocks.apply_block_overrides when the block is selected
# (-csp_block). Defaults follow the reference block defaults, so selecting
# a block applies its documented stage configuration.
from pyp_tpu.config.blocks import BLOCK_FIELDS  # noqa: E402

_BLOCK_FIELD_TYPES: dict[str, tuple] = {
    # field -> (python type, engine-wide default, help)
    "parfile": (str, "", "seed parameter table (<dir>/<series>.cistem)"),
    "parfile_tomo": (str, "", "tomography seed parameter table"),
    "model": (str, "", "reference map for this block"),
    "format": (str, "none", "declared import format"),
    "resume": (bool, True, "reuse per-series results that already exist"),
    "first_iter": (int, 2, "first iteration (resume point)"),
    "iter": (int, 2, "current iteration"),
    "maxiter": (int, 2, "iterations to run"),
    "refine_micrographs": (bool, False,
                           "refine tilt geometry (modes 3 then 0)"),
    "refine_particles": (bool, False,
                         "refine particle poses (modes 2 then 1)"),
    "refine_ctf": (bool, False, "refine per-tilt defocus (mode 4)"),
    "ToleranceMicrographTiltAngles": (float, 1.5,
                                      "tilt-angle tolerance (deg)"),
    "ToleranceMicrographTiltAxisAngles": (float, 1.0,
                                          "tilt-axis tolerance (deg)"),
    "ToleranceMicrographShifts": (float, 100.0,
                                  "micrograph shift tolerance (px)"),
    "ToleranceParticlesPhi": (float, 30.0, "particle phi tolerance (deg)"),
    "ToleranceParticlesPsi": (float, 30.0, "particle psi tolerance (deg)"),
    "ToleranceParticlesTheta": (float, 30.0,
                                "particle theta tolerance (deg)"),
    "ToleranceParticlesShifts": (float, 20.0,
                                 "particle shift tolerance (px)"),
    "ToleranceMicrographAstigmatism": (float, 90.0,
                                       "astigmatism tolerance (deg)"),
    "ToleranceMicrographDefocus1": (float, 750.0,
                                    "defocus-1 tolerance (Å)"),
    "ToleranceMicrographDefocus2": (float, 750.0,
                                    "defocus-2 tolerance (Å)"),
    "Grid": (str, "1,1,1", "spatial patch grid x,y,z"),
    "GridSearch": (bool, False, "coarse discrete search before gradients"),
    "AngleStep": (float, 10.0, "angular grid spacing (deg)"),
    "ShiftStep": (float, 5.0, "shift grid spacing (px)"),
    "NumberOfRandomIterations": (int, 0, "random-search candidates"),
    "OptimizerMaxIter": (int, 5, "optimizer iterations (Powell units)"),
    "OptimizerStepLength": (float, 20.0,
                            "optimizer step length (Powell units)"),
    "OptimizerStepTolerance": (float, 0.01, "step-size termination"),
    "OptimizerValueTolerance": (float, 1e-4, "score-change termination"),
    "transreg": (bool, True, "trajectory-smoothness regularization"),
    "spatial_sigma": (float, 500.0, "trajectory spatial sigma (unbinned px)"),
    "time_sigma": (int, 21, "trajectory temporal sigma (frames)"),
    "num": (int, 1, "number of classes"),
    "rhcls": (float, 8.0, "classification resolution limit (Å)"),
    "focusmask": (str, "0,0,0,0", "focus sphere x,y,z,r (Å; 0 radius = off)"),
    "force_init": (bool, False, "discard previous classification state"),
    "bin": (int, 2, "classification binning"),
    "refineeulers": (int, 3, "particle-angle passes per iteration"),
    "refineshifts": (int, 2, "particle-shift passes per iteration"),
    "InitialResolution": (float, 60.0, "starting resolution (Å)"),
    "ResolutionLimit": (float, 16.0, "final resolution limit (Å)"),
    "InitialSkip": (bool, False, "skip ab initio (use sphere model)"),
    "RandomSkipRatio": (float, 0.0, "random particle dropout per round"),
    "RandomParticles": (int, 10, "random-pose particles seeding the model"),
}
_BLOCK_TAB_DEFAULTS: dict[tuple, object] = {
    # per-tab departures from the engine-wide field defaults (reference)
    ("csp_tomo_init", "maxiter"): 20,
    ("csp_tomo_init", "num"): 5,
    ("csp_tomo_init", "rhcls"): 12.0,
    ("csp_tomo_coarse", "ToleranceParticlesShifts"): 20.0,
    ("csp_tomo_classification", "num"): 1,
}

for _tab, _fields in BLOCK_FIELDS.items():
    SCHEMA[_tab] = [
        P(f"{_tab}_{_f}",
          _BLOCK_FIELD_TYPES[_f][0],
          _BLOCK_TAB_DEFAULTS.get((_tab, _f), _BLOCK_FIELD_TYPES[_f][1]),
          _BLOCK_FIELD_TYPES[_f][2])
        for _f in _fields
    ]


def all_params() -> dict[str, ParamDef]:
    out = {}
    for tab, defs in SCHEMA.items():
        for d in defs:
            out[d.name] = d
    return out


def defaults() -> dict:
    return {d.name: d.default for d in all_params().values()}
