"""CSPT pipeline: per-tilt-series constrained refinement + subtomogram
averaging reconstruction.

Rebuild of the reference's csp call stack (SURVEY §3.4: csp_split ->
cspswarm per tilt-series -> csp refinement modes -> per-series
reconstruction dumps -> cspmerge global merge): each tilt-series runs
ops.csp joint refinement (region patch grids supported via
geometry.divide_regions), its particle projections are inserted into
reconstruction accumulators with full R_eff matrices, and series-level
accumulators merge with a sum (psum across chips / file merge across hosts).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pyp_tpu.config.params import param
from pyp_tpu.io.metadata import ItemMetadata
from pyp_tpu.utils import Timer, get_logger

logger = get_logger("csp")


def series_params_from_metadata(meta: ItemMetadata, coords_zyx, eulers):
    """Build CspParams for one tilt-series from its metadata bundle +
    particle table (positions in binned tomogram voxels, centered)."""
    import jax.numpy as jnp

    from pyp_tpu.ops.csp import make_params

    angles = np.asarray(meta["tlt"], dtype=np.float32)
    T = len(angles)
    xf = meta["xf"] if "xf" in meta else np.zeros((T, 3), dtype=np.float32)
    return make_params(
        angles,
        np.full(T, xf[0, 2] if xf.shape[1] > 2 else 0.0, dtype=np.float32),
        xf[:, :2].astype(np.float32),
        np.asarray(eulers, dtype=np.float32),
        np.asarray(coords_zyx, dtype=np.float32),
    )


def csp_swarm_one(
    item: dict, params: dict, ref_volume, work_dir=".", iteration: int = 2,
    prev_acc=None,
):
    """One tilt-series CSP pass: refine geometry/poses, then insert all
    particle projections into reconstruction accumulators.

    item: {"name", "tilts" (T,ny,nx), "coords" (P,3) centered voxels,
           "eulers" (P,3)}.
    Returns (refined CspParams, accumulators, scores).
    """
    import jax.numpy as jnp

    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.ops.extract import window_particles

    name = item["name"]
    meta = ItemMetadata(name, work_dir, mode="tomo").load()
    tilts = np.asarray(item["tilts"], dtype=np.float32)
    T, ny, nx = tilts.shape
    pixel = float(params["scope_pixel"])
    box = int(params.get("csp_box") or 64)

    cp = series_params_from_metadata(meta, item["coords"], item["eulers"])
    defocus = (
        meta["ctf"][:, :2].astype(np.float32)
        if "ctf" in meta else np.full((T, 2), 20000.0, dtype=np.float32)
    )

    # exposure window (csp_UseImagesForRefinementMin/Max)
    t_lo = int(params.get("csp_UseImagesForRefinementMin") or 0)
    t_hi = int(params.get("csp_UseImagesForRefinementMax") or -1)
    if t_hi < 0:
        t_hi = T - 1
    tilt_weights = _tilt_window_weights(cp.tilt_angles, params, t_lo, t_hi)

    # shared schedule config — the batched path reads the same dict, so the
    # two paths cannot drift (default mode order: micrograph shifts -> tilt
    # geometry -> particle POSITIONS -> particle angles; measured rationale
    # in _csp_config/docs)
    cfg = _csp_config(params, iteration, pixel)
    modes = cfg["modes"]
    grid_tols = cfg["grid_tols"]

    # region/patch grid (csp_Grid "x,y,z"): patch modes 5/6/7 refine local
    # copies of the tilt geometry per spatial region
    grid_str = str(params.get("csp_Grid") or "").strip()
    patch_grid = None
    if grid_str and any(m in (5, 6, 7) for m in modes):
        patch_grid = tuple(int(v) for v in grid_str.replace(",", ":").split(":"))
        if np.prod(patch_grid) <= 1:
            patch_grid = None

    with Timer(f"csp refinement {name}"):
        if patch_grid is not None:
            per_region, region = csp_refine_regions(
                cp, jnp.asarray(tilts), jnp.asarray(defocus), ref_volume,
                pixel, box, grid=patch_grid,
                modes=tuple(m for m in modes if m in (5, 6, 7)),
                iters_per_mode=cfg["iters"],
                low_res=cfg["low_res"], high_res=cfg["high_res"],
                reg_weight=cfg["reg_weight"],
                tilt_weights=jnp.asarray(tilt_weights),
                voltage_kv=cfg["voltage_kv"], cs_mm=cfg["cs_mm"],
                amplitude_contrast=cfg["amplitude_contrast"],
            )
            # stitch: every particle takes its region's refined copy
            cp = _stitch_regions(cp, per_region, region)
            modes = tuple(m for m in modes if m not in (5, 6, 7))
        refined, scores, particle_scores = csp_ops.csp_refine(
            cp, jnp.asarray(tilts), jnp.asarray(defocus), ref_volume, pixel,
            box, modes=modes,
            iters_per_mode=cfg["iters"], lr=cfg["lr"],
            low_res=cfg["low_res"], high_res=cfg["high_res"],
            reg_weight=cfg["reg_weight"],
            tilt_weights=jnp.asarray(tilt_weights),
            voltage_kv=cfg["voltage_kv"], cs_mm=cfg["cs_mm"],
            amplitude_contrast=cfg["amplitude_contrast"],
            grid_tols=grid_tols, grid_steps=cfg["grid_steps"],
            spin_step=cfg["spin_step"],
            angle_step=cfg["angle_step"], shift_step=cfg["shift_step"],
            random_iters=cfg["random_iters"],
            step_tol=cfg["step_tol"], value_tol=cfg["value_tol"],
            return_particle_scores=True,
        )
        if params.get("csp_rotreg"):
            # per-tilt geometry angle regularization across the series
            # (the reference's csp_rotreg, analysis/fit.py:330): smooth
            # tilt/axis angle tracks per csp_rotreg_method so one bad
            # tilt cannot kink the geometry
            refined = refined._replace(
                tilt_angles=_rotreg_track(refined.tilt_angles, params),
                axis_angles=_rotreg_track(refined.axis_angles, params))

    # per-tilt movie-frame refinement (csp_frames, the FIND axis): refine
    # per-(particle, frame) trajectories and insert dose-weighted polished
    # windows instead of the plain tilt-average windows
    polished = None
    if params.get("csp_frames") and item.get("tilt_movies") is not None:
        polished, _traj = csp_polish_frames(
            item["tilt_movies"], refined, defocus, ref_volume, params,
            doses=item.get("frame_doses"))

    # ---- insert projections into accumulators (per-series "dump") ---------
    with Timer(f"csp reconstruction {name}"):
        acc = _reconstruct_series(
            tilts, refined, defocus, params, t_lo, t_hi,
            polished=polished, prev_acc=prev_acc, ref_volume=ref_volume)

    # persist refined geometry back to metadata (resume + interop)
    meta["csp_scores"] = np.asarray(particle_scores, dtype=np.float32)
    meta["xf"] = np.concatenate([
        np.asarray(refined.tilt_shifts),
        np.asarray(refined.axis_angles)[:, None],
    ], axis=1)
    meta["tlt"] = np.asarray(refined.tilt_angles)
    meta.save()
    return refined, acc, scores


def _tilt_window_weights(tilt_angles, params, t_lo, t_hi):
    """Exposure-window tilt weights + metric RefineProjectionCutoff: keep
    only the N lowest-|angle| (least-dosed, highest-SNR) projections for
    refinement when the cutoff is set (reference metric tab)."""
    T = len(np.asarray(tilt_angles))
    tw = np.zeros(T, dtype=np.float32)
    tw[t_lo:t_hi + 1] = 1.0
    cutoff = int(params.get("csp_RefineProjectionCutoff") or 0)
    if 0 < cutoff < int(tw.sum()):
        order = np.argsort(np.abs(np.asarray(tilt_angles)))
        keep = [t for t in order if tw[t] > 0][:cutoff]
        tw2 = np.zeros(T, dtype=np.float32)
        tw2[keep] = 1.0
        tw = tw2
    return tw


def _dose_envelope(refined, params, box: int, pixel: float):
    """Reconstruction dose weighting (reference reconstruct3d dose block,
    frealign.py:1731-1753): Grant-Grigorieff envelope per tilt in dose
    order (|angle| rank approximates acquisition order). Returns (T, box,
    box//2+1) weights or None."""
    import jax.numpy as jnp

    if not params.get("reconstruct_dose_weighting_enable"):
        return None
    from pyp_tpu.core.ctf import dose_weight_2d

    if params.get("dose_weight_global"):
        # dataset-global frame weighting (dose_weighting_global role):
        # acquisition order taken as-is across the dataset rather than
        # re-ranked per series
        order = np.arange(len(np.asarray(refined.tilt_angles)))
    elif params.get("scope_dose_symmetric", True):
        # dose-symmetric scheme: |angle| rank = acquisition order
        order = np.argsort(np.argsort(np.abs(
            np.asarray(refined.tilt_angles))))
    else:  # sequential acquisition (-60 -> +60)
        order = np.arange(len(np.asarray(refined.tilt_angles)))
    wpath = str(params.get("dose_weight_weights") or "")
    if wpath:
        # external per-tilt weight table (reconstruct3d dose block's
        # weight-file card, frealign.py:1731-1753): one scalar per tilt
        from pathlib import Path as _Path

        if _Path(wpath).exists():
            wtab = np.loadtxt(wpath, dtype=np.float32).reshape(-1)
            T_here = len(np.asarray(refined.tilt_angles))
            if len(wtab) >= T_here:
                env = np.ones((T_here, box, box // 2 + 1), dtype=np.float32)
                env *= wtab[:T_here, None, None]
                return jnp.asarray(env)
        logger.warning("dose_weight_weights %s unusable — falling back to "
                       "the analytic envelope", wpath)
    if str(params.get("dose_weight_method") or "grant") == "frame":
        # data-driven rank-falloff envelope (reference
        # dose_weighting_fraction/transition/multiply family)
        from pyp_tpu.core.ctf import frame_damage_weights

        ranks = order.astype(np.float32) / max(len(order) - 1, 1)
        return frame_damage_weights(
            (box, box), ranks,
            fraction=float(params.get("dose_weight_fraction") or 4.0),
            transition=float(params.get("dose_weight_transition") or 0.75),
            multiply=bool(params.get("dose_weight_multiply", True)))
    cum = ((order + 1.0)
           * float(params.get("scope_dose_rate") or 1.0)
           + float(params.get("scope_init_dose") or 0.0))
    return dose_weight_2d((box, box), pixel,
                          jnp.asarray(cum.astype(np.float32)))


def _reconstruct_series(tilts, refined, defocus, params, t_lo, t_hi,
                        polished=None, prev_acc=None, ref_volume=None):
    """Insert one refined series' projections into reconstruction
    accumulators — windowing vectorized over tilts (one cut dispatch + one
    accumulate dispatch, not T each)."""
    import jax
    import jax.numpy as jnp

    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.ops.extract import window_particles

    T, ny, nx = np.asarray(tilts).shape[-3:]
    box = int(params.get("csp_box") or 64)
    pixel = float(params["scope_pixel"])
    R_eff = np.asarray(csp_ops.effective_rotations(refined))  # (T, P, 3, 3)
    pred = np.asarray(csp_ops.project_positions(refined))     # (T, P, 2)
    depth = np.asarray(csp_ops.particle_depth(refined))       # (T, P)
    P = pred.shape[1]
    center = np.array([ny // 2, nx // 2])

    dose_env = _dose_envelope(refined, params, box, pixel)

    r_lo = int(params.get("csp_UseImagesForReconstructionMin") or 0)
    r_hi = int(params.get("csp_UseImagesForReconstructionMax") or -1)
    r_lo, r_hi = max(t_lo, r_lo), (t_hi if r_hi < 0 else min(t_hi, r_hi))
    ts = np.arange(r_lo, r_hi + 1)
    Tr = len(ts)

    pred_s = pred[ts]                                       # (Tr, P, 2)
    ci = np.round(pred_s + center).astype(np.int32)
    inb = (
        (ci[..., 0] >= box // 2) & (ci[..., 0] < ny - box // 2)
        & (ci[..., 1] >= box // 2) & (ci[..., 1] < nx - box // 2)
    )
    ci = np.clip(ci, box // 2, [ny - box // 2 - 1, nx - box // 2 - 1])

    if polished is not None:
        wins = jnp.asarray(np.asarray(polished)[ts])
    else:
        wins = jax.vmap(
            lambda im, c: window_particles(im, c, box)
        )(jnp.asarray(np.asarray(tilts)[ts]), jnp.asarray(ci))
    if dose_env is not None:
        wins = jnp.fft.irfft2(
            jnp.fft.rfft2(wins) * jnp.asarray(dose_env)[ts][:, None],
            s=(box, box))
    windows = jnp.reshape(wins, (Tr * P, box, box))

    # residual shift: content sits at pred - window_center; the stored
    # shift centers it
    rows_shift = (-(pred_s + center - ci)).reshape(Tr * P, 2).astype(np.float32)
    rows_R = R_eff[ts].reshape(Tr * P, 3, 3)
    rows_df = (defocus[ts, :2].mean(axis=1, keepdims=True)
               + depth[ts] * pixel).reshape(Tr * P).astype(np.float32)
    rows_sub = np.tile(np.arange(P) % 2, Tr)
    rows_w = inb.reshape(Tr * P).astype(np.float32)

    from pyp_tpu.parallel import pipeline_mesh, sharded_accumulate_matrices

    mesh = pipeline_mesh(params)
    kw = dict(
        voltage_kv=float(params["scope_voltage"]),
        cs_mm=float(params["scope_cs"]),
        amplitude_contrast=float(params["scope_wgh"]),
        prev=prev_acc,
        iewald=int(params.get("reconstruct_iewald") or 0),
    )
    if abs(kw["iewald"]) >= 2 and ref_volume is not None:
        # reference-based Ewald (IEWALD ±2): predict the opposite sphere
        # branch from the current map (cropped to the window box if needed)
        from pyp_tpu.ops.fourier_slice import volume_to_fourier

        rv = jnp.asarray(np.asarray(ref_volume), dtype=jnp.float32)
        if rv.shape[-1] > box:
            from pyp_tpu.core.fft import fourier_crop_3d

            rv = fourier_crop_3d(rv, out_shape=(box, box, box))
        if rv.shape[-1] == box:
            kw["ref_fourier"] = volume_to_fourier(rv, pad=2)
    if mesh is not None:
        # shard the (tilt x particle) projection rows across chips; one
        # psum merges the accumulators (the cspmerge reduction, §3.4)
        return sharded_accumulate_matrices(
            mesh, np.asarray(windows), rows_R, rows_shift, rows_df,
            rows_sub, rows_w, box, pixel, **kw)
    return rec.accumulate_matrices(
        windows, jnp.asarray(rows_R), jnp.asarray(rows_shift),
        jnp.asarray(rows_df), jnp.asarray(rows_sub), jnp.asarray(rows_w),
        box, pixel, **kw)


def _rotreg_track(values, params: dict):
    """Smooth one per-tilt angle track per csp_rotreg_method: AB1 = the
    first-order Gaussian kernel, AB2 (default) = outlier-rejecting spline,
    XD = the wrap-aware angular spline (reference rotreg enum)."""
    from pyp_tpu.analysis.fit import (fit_angular_trajectory,
                                      fit_spline_trajectory,
                                      regularize_trajectories)

    import jax.numpy as jnp

    method = str(params.get("csp_rotreg_method") or "AB2")
    mads = float(params.get("csp_reg_outlier_mads") or 5.0)
    v = np.asarray(values)
    if method == "AB1":
        out = regularize_trajectories(
            v[None, :, None], method="gaussian",
            time_sigma=float(params.get("csp_time_sigma") or 21.0))[0, :, 0]
    elif method == "XD":
        out = fit_angular_trajectory(v, outlier_mads=mads)
    else:
        out = fit_spline_trajectory(v, outlier_mads=mads)
    return jnp.asarray(out.astype(np.float32))


def _csp_config(params: dict, iteration: int, pixel: float):
    """Shared mode-schedule configuration for a CSP pass (modes, band,
    grid-search tolerances) — one place so the single-series and batched
    paths cannot drift."""
    switches = [params.get(k) for k in ("csp_refine_micrographs",
                                        "csp_refine_particles",
                                        "csp_refine_ctf")]
    if any(s is not None for s in switches):
        # reference top-level refine switches (align/core.py:1015-1023
        # builds the mode list from them) — win over an explicit schedule
        from pyp_tpu.config.blocks import block_mode_schedule

        modes_str = block_mode_schedule(bool(switches[0]), bool(switches[1]),
                                        bool(switches[2]))
    else:
        modes_str = str(params.get("csp_refine_modes") or "3:0:2:1")
    modes = tuple(int(m) for m in modes_str.split(":"))
    rhref = float(param(params.get("csp_rhref") or "12", iteration))
    grid_tols = None
    if params.get("csp_GridSearch"):
        grid_tols = {
            0: (float(params.get("csp_ToleranceMicrographTiltAngles") or 10.0),
                float(params.get("csp_ToleranceMicrographTiltAxisAngles")
                      or 0.0)),
            3: float(params.get("csp_ToleranceMicrographShifts") or 20.0),
            5: float(params.get("csp_ToleranceMicrographShifts") or 20.0),
            # mode 4 refines one per-tilt defocus OFFSET (applied to both
            # df1/df2): the search radius covers whichever axis tolerance
            # is wider
            4: max(float(params.get("csp_ToleranceMicrographDefocus1")
                         or 2000.0),
                   float(params.get("csp_ToleranceMicrographDefocus2")
                         or 0.0)),
            1: (float(params.get("csp_ToleranceParticlesPsi") or 10.0),
                float(params.get("csp_ToleranceParticlesTheta") or 10.0),
                float(params.get("csp_ToleranceParticlesPhi") or 10.0)),
            7: (float(params.get("csp_ToleranceParticlesPsi") or 10.0),
                float(params.get("csp_ToleranceParticlesTheta") or 10.0),
                float(params.get("csp_ToleranceParticlesPhi") or 10.0)),
            2: float(params.get("csp_ToleranceParticlesShifts") or 10.0),
            6: float(params.get("csp_ToleranceParticlesShifts") or 10.0),
        }
        if float(params.get("csp_ToleranceMicrographAstigmatism") or 0) > 0:
            # the joint model refines a scalar per-tilt defocus offset;
            # per-tilt astigmatism is not a refinable block (the CTF here
            # uses the mean defocus per tilt) — surface that instead of
            # silently accepting the tolerance
            logger.warning(
                "csp_ToleranceMicrographAstigmatism set, but per-tilt "
                "astigmatism is not a refinable CSP block (defocus offset "
                "only); value ignored")
    return dict(
        modes=modes,
        rhref=rhref,
        low_res=float(params.get("csp_rlref") or 60.0),
        high_res=max(rhref, 2.5 * pixel),
        iters=int(params.get("csp_OptimizerIters") or 20),
        lr=float(params.get("csp_OptimizerStepLength") or 0.3),
        reg_weight=float(params.get("csp_transreg") or 0.1),
        grid_tols=grid_tols,
        grid_steps=int(params.get("csp_GridSearchSteps") or 9),
        # csp_InitialSkip (reference: skip initialization during ab-initio)
        # suppresses the spin-ring init pass
        spin_step=(0.0 if params.get("csp_InitialSkip")
                   else float(params.get("csp_spin_search") or 0.0)),
        # explicit grid spacings + random search (reference AngleStep/
        # ShiftStep/NumberOfRandomIterations block fields, SURVEY §A.3)
        angle_step=float(params.get("csp_AngleStep") or 0.0),
        shift_step=float(params.get("csp_ShiftStep") or 0.0),
        random_iters=int(params.get("csp_NumberOfRandomIterations") or 0),
        # optimizer termination (csp_OptimizerStepTolerance /
        # csp_OptimizerValueTolerance): update freezing under jit
        step_tol=float(params.get("csp_OptimizerStepTolerance") or 0.0),
        value_tol=float(params.get("csp_OptimizerValueTolerance") or 0.0),
        voltage_kv=float(params["scope_voltage"]),
        cs_mm=float(params["scope_cs"]),
        amplitude_contrast=float(params["scope_wgh"]),
        # dispatch-duration bound (csp_series_per_dispatch): shared-tunnel
        # runtimes kill single dispatches past ~60 s (ops/csp measured)
        series_per_dispatch=int(params.get("csp_series_per_dispatch") or 2),
    )


def _pad_edge(a, n_target, axis=0):
    """Pad along axis to n_target by edge replication."""
    a = np.asarray(a)
    pad = n_target - a.shape[axis]
    if pad <= 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return np.pad(a, widths, mode="edge")


def csp_swarm_batch(
    items: list, params: dict, ref_volume, work_dir=".", iteration: int = 2,
    prev_acc=None,
):
    """Batched cspswarm: refine S tilt-series in ONE fused dispatch
    (ops.csp.csp_refine_batch) and chain their reconstruction accumulators.

    The reference fans one SLURM array element per tilt-series
    (launch_csp, slurm.py:600); a TPU chip is itself massively parallel, so
    a chip processes a whole batch of series per dispatch and batches are
    data-parallel across chips. Series are padded to common (T, P) with
    zero validity weights.

    items: list of dicts as csp_swarm_one takes. Returns (refined list of
    CspParams, chained accumulators, mode-score lists, per-particle-score
    list)."""
    import jax.numpy as jnp

    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops.fourier_slice import volume_to_fourier
    from pyp_tpu.ops.refine3d import make_mask_points

    pixel = float(params["scope_pixel"])
    box = int(params.get("csp_box") or 64)
    cfg = _csp_config(params, iteration, pixel)
    Fref = volume_to_fourier(jnp.asarray(ref_volume))
    mask_pts = jnp.asarray(make_mask_points(
        box, pixel, cfg["low_res"], cfg["high_res"]))

    # ---- per-series setup + window sampling (cheap dispatches) ------------
    setups = []
    for item in items:
        meta = ItemMetadata(item["name"], work_dir, mode="tomo").load()
        tilts = np.asarray(item["tilts"], dtype=np.float32)
        T = tilts.shape[0]
        cp = series_params_from_metadata(meta, item["coords"], item["eulers"])
        defocus = (
            meta["ctf"][:, :2].astype(np.float32)
            if "ctf" in meta else np.full((T, 2), 20000.0, dtype=np.float32)
        )
        t_lo = int(params.get("csp_UseImagesForRefinementMin") or 0)
        t_hi = int(params.get("csp_UseImagesForRefinementMax") or -1)
        if t_hi < 0:
            t_hi = T - 1
        tw = _tilt_window_weights(cp.tilt_angles, params, t_lo, t_hi)
        xv, w_centers, valid = csp_ops.prepare_series_windows(
            tilts, cp, box, mask_pts)
        setups.append(dict(
            meta=meta, tilts=tilts, cp=cp, defocus=defocus, tw=tw,
            xv=np.asarray(xv), w_centers=w_centers, valid=valid,
            t_lo=t_lo, t_hi=t_hi, name=item["name"],
        ))

    # ---- pad to common (T, P) and stack ------------------------------------
    Tm = max(s["tilts"].shape[0] for s in setups)
    Pm = max(s["cp"].particle_pos.shape[0] for s in setups)
    G = setups[0]["xv"].shape[-1]
    S = len(setups)

    def pad_series(s):
        cp = s["cp"]
        T = s["tilts"].shape[0]
        P = np.asarray(cp.particle_pos).shape[0]
        cp_p = csp_ops.CspParams(
            tilt_angles=jnp.asarray(_pad_edge(cp.tilt_angles, Tm)),
            axis_angles=jnp.asarray(_pad_edge(cp.axis_angles, Tm)),
            tilt_shifts=jnp.asarray(_pad_edge(cp.tilt_shifts, Tm)),
            particle_eulers=jnp.asarray(_pad_edge(cp.particle_eulers, Pm)),
            particle_pos=jnp.asarray(_pad_edge(cp.particle_pos, Pm)),
            defocus_offsets=jnp.asarray(_pad_edge(cp.defocus_offsets, Tm)),
        )
        xv = np.zeros((Tm, Pm, G), dtype=s["xv"].dtype)
        xv[:s["xv"].shape[0], :s["xv"].shape[1]] = s["xv"]
        wc = np.zeros((Tm, Pm, 2), dtype=np.float32)
        wc[:T, :P] = s["w_centers"]
        va = np.zeros((Tm, Pm), dtype=np.float32)
        va[:T, :P] = s["valid"]
        # random particle subsampling (reference csp RandomParticles /
        # RandomSkipRatio): skipped particles carry zero weight for this
        # pass (they do not drive geometry or scoring) and keep their
        # previous parameters; deterministic per series name
        skip_ratio = float(params.get("csp_RandomSkipRatio") or 0.0)
        rand_n = (int(params.get("csp_RandomParticles") or 0)
                  if params.get("refine_abinit") else 0)
        if skip_ratio > 0.0 or 0 < rand_n < P:
            srng = np.random.RandomState(abs(hash(s["name"])) % (2 ** 31))
            keep = np.arange(P)
            if 0 < rand_n < P:
                keep = srng.choice(P, size=rand_n, replace=False)
            if skip_ratio > 0.0:
                keep = srng.choice(
                    keep, size=max(1, int(round(len(keep)
                                                * (1 - skip_ratio)))),
                    replace=False)
            mask = np.zeros(Pm, dtype=np.float32)
            mask[keep] = 1.0
            va *= mask[None, :]
        df = _pad_edge(s["defocus"], Tm)
        tw = np.zeros(Tm, dtype=np.float32)
        tw[:T] = s["tw"]
        return cp_p, xv, wc, va, df, tw

    import jax as _jax

    padded = [pad_series(s) for s in setups]
    cp_b = _jax.tree.map(lambda *xs: jnp.stack(xs), *[p[0] for p in padded])
    xv_b = jnp.asarray(np.stack([p[1] for p in padded]))
    wc_b = jnp.asarray(np.stack([p[2] for p in padded]))
    va_b = jnp.asarray(np.stack([p[3] for p in padded]))
    df_b = jnp.asarray(np.stack([p[4] for p in padded]).astype(np.float32))
    tw_b = jnp.asarray(np.stack([p[5] for p in padded]))

    offsets_by_mode, spin_offsets = csp_ops.build_mode_offsets(
        cfg["modes"], cfg["grid_tols"], cfg["grid_steps"], cfg["spin_step"],
        angle_step=cfg["angle_step"], shift_step=cfg["shift_step"],
        random_iters=cfg["random_iters"])

    from pyp_tpu.parallel import csp_refine_batch_sharded, pipeline_mesh

    mesh = pipeline_mesh(params)
    with Timer(f"csp batch refinement ({S} series)"):
        if mesh is not None and S > 1:
            # series are data-parallel across chips (SURVEY §2.3.1: the
            # reference fans one cspswarm array task per series; here the
            # mesh takes the series axis and each chip runs whole series)
            refined_b, mode_scores_b, pscores_b = csp_refine_batch_sharded(
                mesh, cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
                offsets_by_mode, spin_offsets, cfg["modes"], box, pixel,
                iters_per_mode=cfg["iters"], lr=cfg["lr"],
                reg_weight=cfg["reg_weight"], voltage_kv=cfg["voltage_kv"],
                cs_mm=cfg["cs_mm"],
                amplitude_contrast=cfg["amplitude_contrast"],
                step_tol=cfg["step_tol"], value_tol=cfg["value_tol"],
            )
        else:
            refined_b, mode_scores_b, pscores_b = csp_ops.csp_refine_batch(
                cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
                offsets_by_mode, spin_offsets, cfg["modes"], box, pixel,
                iters_per_mode=cfg["iters"], lr=cfg["lr"],
                reg_weight=cfg["reg_weight"], voltage_kv=cfg["voltage_kv"],
                cs_mm=cfg["cs_mm"],
                amplitude_contrast=cfg["amplitude_contrast"],
                step_tol=cfg["step_tol"], value_tol=cfg["value_tol"],
                series_per_dispatch=cfg["series_per_dispatch"],
            )
        mode_scores_b = np.asarray(mode_scores_b)
        pscores_b = np.asarray(pscores_b)

    # ---- unpad, persist, reconstruct ---------------------------------------
    refined_list, scores_list, pscore_list = [], [], []
    acc = prev_acc
    for i, s in enumerate(setups):
        T = s["tilts"].shape[0]
        P = np.asarray(s["cp"].particle_pos).shape[0]
        r = _jax.tree.map(lambda x: x[i], refined_b)
        r = r._replace(
            tilt_angles=r.tilt_angles[:T], axis_angles=r.axis_angles[:T],
            tilt_shifts=r.tilt_shifts[:T],
            particle_eulers=r.particle_eulers[:P],
            particle_pos=r.particle_pos[:P],
            defocus_offsets=r.defocus_offsets[:T],
        )
        if params.get("csp_rotreg"):
            r = r._replace(
                tilt_angles=_rotreg_track(r.tilt_angles, params),
                axis_angles=_rotreg_track(r.axis_angles, params))
        acc = _reconstruct_series(
            s["tilts"], r, s["defocus"], params, s["t_lo"], s["t_hi"],
            prev_acc=acc, ref_volume=ref_volume)
        meta = s["meta"]
        meta["csp_scores"] = pscores_b[i, :P].astype(np.float32)
        meta["xf"] = np.concatenate([
            np.asarray(r.tilt_shifts),
            np.asarray(r.axis_angles)[:, None],
        ], axis=1)
        meta["tlt"] = np.asarray(r.tilt_angles)
        meta.save()
        refined_list.append(r)
        scores_list.append([float(v) for v in mode_scores_b[i]])
        pscore_list.append(pscores_b[i, :P])
    return refined_list, acc, scores_list, pscore_list


def csp_merge(accumulators, box: int, params: dict, work_dir=".",
              dataset="dataset", iteration: int = 2):
    """Global merge: sum per-series accumulators, finalize half maps + FSC,
    write outputs (the cspmerge job, SURVEY §3.4)."""
    from pyp_tpu.core import fsc as fsc_mod
    from pyp_tpu.io import mrc
    from pyp_tpu.ops import reconstruct as rec

    acc = rec.merge_accumulators(accumulators)
    out = rec.finalize(acc, box)
    pixel = float(params["scope_pixel"])
    maps_dir = Path(work_dir) / "maps"
    maps_dir.mkdir(parents=True, exist_ok=True)
    mrc.write(np.asarray(out.volume, dtype=np.float32),
              maps_dir / f"{dataset}_csp_{iteration:02d}.mrc", pixel_size=pixel)
    mrc.write(np.asarray(out.half1, dtype=np.float32),
              maps_dir / f"{dataset}_csp_{iteration:02d}_half1.mrc", pixel_size=pixel)
    mrc.write(np.asarray(out.half2, dtype=np.float32),
              maps_dir / f"{dataset}_csp_{iteration:02d}_half2.mrc", pixel_size=pixel)
    res = float(fsc_mod.resolution_at_threshold(out.freqs, out.fsc, pixel, 0.143))
    logger.info("csp merge: FSC(0.143) = %.2f Å", res)
    return out, res


def _stitch_regions(full, per_region, region):
    """Merge per-region refined CspParams back into one record: particle
    blocks scatter to their rows; per-tilt geometry takes the particle-
    weighted mean over regions (each region refined a LOCAL copy — the
    global record keeps the consensus, the local residual lives in the
    particle blocks)."""
    import numpy as np

    eulers = np.array(np.asarray(full.particle_eulers), copy=True)
    pos = np.array(np.asarray(full.particle_pos), copy=True)
    tilt_fields = {"tilt_angles": 0.0, "axis_angles": 0.0,
                   "tilt_shifts": 0.0, "defocus_offsets": 0.0}
    total = 0
    for r, sub in enumerate(per_region):
        if sub is None:
            continue
        sel = np.where(np.asarray(region) == r)[0]
        eulers[sel] = np.asarray(sub.particle_eulers)
        pos[sel] = np.asarray(sub.particle_pos)
        for k in tilt_fields:
            tilt_fields[k] = tilt_fields[k] + len(sel) * np.asarray(
                getattr(sub, k))
        total += len(sel)
    if total == 0:
        return full
    import jax.numpy as jnp

    return full._replace(
        particle_eulers=jnp.asarray(eulers), particle_pos=jnp.asarray(pos),
        **{k: jnp.asarray(v / total) for k, v in tilt_fields.items()})


def csp_refine_regions(
    params_in, tilt_images, tilt_defocus, ref_volume, pixel_size, boxsize,
    grid=(2, 2, 1), modes=(5, 6), bounds=None, **kw,
):
    """Patch-based CSP (reference modes 5/6/7 and csp_Grid, SURVEY §2.3.7):
    particles are partitioned into a spatial grid of regions; each region
    refines its own copy of the per-tilt geometry (local deformations), with
    particle blocks refined within the region subset.

    Returns (per_region_params: list[CspParams or None], region_of_particle
    (P,)). Regions with no particles return None.
    """
    from pyp_tpu.core.geometry import region_of
    from pyp_tpu.ops import csp as csp_ops

    pos = np.asarray(params_in.particle_pos)  # (P, 3) (z, y, x)
    if bounds is None:
        lo = pos.min(axis=0) - 1.0
        hi = pos.max(axis=0) + 1.0
    else:
        lo, hi = bounds
    # grid given as (x, y, z) like csp_Grid; positions are (z, y, x)
    grid_zyx = np.asarray(grid[::-1], dtype=np.int64)
    region = region_of(pos, lo, hi, grid_zyx)

    out = []
    for r in range(int(np.prod(grid_zyx))):
        sel = np.where(region == r)[0]
        if len(sel) == 0:
            out.append(None)
            continue
        sub = params_in._replace(
            particle_eulers=params_in.particle_eulers[sel],
            particle_pos=params_in.particle_pos[sel],
        )
        refined, _scores = csp_ops.csp_refine(
            sub, tilt_images, tilt_defocus, ref_volume, pixel_size, boxsize,
            modes=tuple(modes), **kw,
        )
        out.append(refined)
    return out, region


def csp_classify(
    items_refined, params: dict, references, work_dir=".", iteration: int = 2,
):
    """Subtomogram classification (the reference's tomo classification +
    per-class classmerge, SURVEY §2.3.6 / particle_cspt.py:1682): given
    refined per-series CspParams and K reference volumes, score every
    particle against every reference (mean CTF-weighted NCC over its tilt
    projections), convert to occupancies, and reconstruct each class with
    occupancy-weighted matrix-pose insertion.

    items_refined: list of dicts {"name", "tilts", "params": CspParams,
    "defocus" (T, 2)}. Returns (per-class Reconstruction list, occupancies
    list per item, resolutions).
    """
    import jax.numpy as jnp

    from pyp_tpu.analysis import occupancies as occ_mod
    from pyp_tpu.core import fsc as fsc_mod
    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.ops.extract import window_particles
    from pyp_tpu.ops.fourier_slice import image_to_fourier, volume_to_fourier
    from pyp_tpu.ops.refine3d import make_mask_points

    K = len(references)
    pixel = float(params["scope_pixel"])
    box = int(params.get("csp_box") or 64)
    rhref = float(param(params.get("csp_rhref") or "12", iteration))
    mask_pts = jnp.asarray(make_mask_points(
        box, pixel, float(params.get("csp_rlref") or 60.0),
        max(rhref, 2.5 * pixel)))
    Frefs = [volume_to_fourier(jnp.asarray(r)) for r in references]

    accs = [None] * K
    occ_per_item = []
    voltage = float(params["scope_voltage"])
    cs = float(params["scope_cs"])
    w_amp = float(params["scope_wgh"])
    for item in items_refined:
        cp = item["params"]
        tilts = np.asarray(item["tilts"], dtype=np.float32)
        defocus = np.asarray(item["defocus"], dtype=np.float32)
        T, ny, nx = tilts.shape
        P = cp.particle_pos.shape[0]
        pred = np.asarray(csp_ops.project_positions(cp))
        depth = np.asarray(csp_ops.particle_depth(cp))
        R_eff = np.asarray(csp_ops.effective_rotations(cp))  # (T, P, 3, 3)
        center = np.array([ny // 2, nx // 2])

        def tilt_geometry(t):
            ci = np.round(pred[t] + center).astype(np.int32)
            inb = ((ci[:, 0] >= box // 2) & (ci[:, 0] < ny - box // 2)
                   & (ci[:, 1] >= box // 2) & (ci[:, 1] < nx - box // 2))
            ci = np.clip(ci, box // 2, [ny - box // 2 - 1, nx - box // 2 - 1])
            dshift = (pred[t] + center - ci).astype(np.float32)
            df_t = (defocus[t, :2].mean() + np.asarray(cp.defocus_offsets)[t]
                    + depth[t] * pixel).astype(np.float32)
            return ci, inb.astype(np.float32), dshift, df_t

        # ---- pass 1: per-particle per-class scores, streamed over tilts.
        # HBM holds one tilt's windows at a time (the reference classifies
        # EMPIAR-10304-scale sets: thousands of subtomos x 41 tilts do not
        # fit as one (T*P, box, box) block).
        scores = np.zeros((T, P, K), np.float64)
        valid = np.zeros((T, P), np.float64)
        for t in range(T):
            ci, valid_t, dshift, df_t = tilt_geometry(t)
            wins_t = window_particles(jnp.asarray(tilts[t]), jnp.asarray(ci),
                                      box)
            xv = _gather_windows(wins_t, mask_pts)  # (P, G)
            for k in range(K):
                ncc = _tilt_class_scores(
                    xv, jnp.asarray(R_eff[t]), jnp.asarray(dshift),
                    jnp.asarray(df_t), mask_pts, Frefs[k], box, pixel,
                    voltage, cs, w_amp,
                )
                scores[t, :, k] = np.asarray(ncc)
            valid[t] = valid_t
        # per-particle LogP = tilt-weighted score average (the reference's
        # tomo occupancy weighting, occupancies.py:154-168: score-average
        # weights under refine_score_weighting, tilt-angle Gaussian
        # otherwise — NOT a uniform mean; high tilts are thicker/noisier)
        tilt_deg = np.asarray(cp.tilt_angles)
        logp = occ_mod.aggregate_tilt_logp(
            scores, valid, tilt_deg,
            score_weighting=bool(params.get("refine_score_weighting")))
        G = mask_pts.shape[0]
        occ = occ_mod.occupancies_from_logp(logp * G * 0.5)  # sharpen by band size
        occ_per_item.append(occ)

        # ---- pass 2: occupancy-weighted reconstruction, streamed the same
        # way (windows re-gathered per tilt; accumulators chain via prev=)
        sub = np.arange(P) % 2
        for t in range(T):
            ci, valid_t, dshift, df_t = tilt_geometry(t)
            wins_t = window_particles(jnp.asarray(tilts[t]), jnp.asarray(ci),
                                      box)
            for k in range(K):
                accs[k] = rec.accumulate_matrices(
                    wins_t,
                    jnp.asarray(R_eff[t]),
                    jnp.asarray(-dshift),
                    jnp.asarray(df_t),
                    jnp.asarray(sub),
                    jnp.asarray(valid_t * occ[:, k].astype(np.float32) / 100.0),
                    box, pixel,
                    voltage_kv=voltage, cs_mm=cs, amplitude_contrast=w_amp,
                    prev=accs[k],
                )

    outs, resolutions = [], []
    for k in range(K):
        out = rec.finalize(accs[k], box)
        outs.append(out)
        resolutions.append(float(fsc_mod.resolution_at_threshold(
            out.freqs, out.fsc, pixel, 0.143)))
    return outs, occ_per_item, resolutions


def _gather_windows(wins, mask_pts):
    """(P, box, box) windows -> (P, G) spectrum samples at mask points."""
    import jax

    from pyp_tpu.ops.fourier_slice import (
        gather_2d_hermitian, image_to_fourier,
    )

    F = image_to_fourier(wins)
    return jax.vmap(lambda Fi: gather_2d_hermitian(Fi, mask_pts))(F)


def _tilt_class_scores(xv, R_t, dshift_t, df_t, mask_pts, Fref, n, pixel,
                       voltage, cs, w):
    """Per-particle CTF-weighted NCC against one class reference for one
    tilt: xv (P, G) window samples, R_t (P, 3, 3) effective rotations,
    dshift_t (P, 2) residual shifts, df_t (P,) defocus. Returns (P,)."""
    import jax
    import jax.numpy as jnp

    from pyp_tpu.ops.fourier_slice import gather_3d_hermitian
    from pyp_tpu.ops.refine3d import _ctf_at_points

    vol_pad = Fref.shape[0] // n
    mask = jnp.asarray(mask_pts)
    q = (mask[None, :, 1, None] * R_t[:, None, 0, :]
         + mask[None, :, 0, None] * R_t[:, None, 1, :])        # (P, G, 3)
    u = gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))
    c = _ctf_at_points(mask[None], n, pixel, df_t[:, None], df_t[:, None],
                       0.0, voltage, cs, w, 0.0)               # (P, G)
    ph = -2.0 * jnp.pi * (mask[None, :, 0] * dshift_t[:, 0:1]
                          + mask[None, :, 1] * dshift_t[:, 1:2]) / n
    phasor = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    num = jnp.sum(jnp.real(jnp.conj(xv) * phasor * c * u), axis=-1)
    den = jnp.sqrt(jnp.sum(jnp.abs(xv) ** 2, -1)
                   * jnp.sum(c * c * jnp.abs(u) ** 2, -1) + 1e-12)
    return num / den


def csp_polish_frames(tilt_movies, cp, defocus, ref_volume, params,
                      doses=None):
    """Per-tilt movie-frame refinement — the reference's CSPT frame axis
    (FIND column, cistem_star_file.py:70; csp frame mode local_run.py:363):
    for each tilt movie, window every particle from every raw frame at its
    CSP-projected position, jointly refine per-(particle, frame) 2D
    trajectories against CTF-weighted projections of the reference at the
    CSP effective rotations (ops.polish.refine_trajectories), and rebuild
    dose-weighted particle windows.

    tilt_movies: list of T arrays (F_t, ny, nx) raw frames per tilt;
    cp: refined CspParams; defocus: (T, 2). Returns (windows (T, P, box,
    box) polished, trajectories list of (P, F_t, 2))."""
    import jax.numpy as jnp

    from pyp_tpu.core.geometry import matrix_to_euler
    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops import polish as polish_ops
    from pyp_tpu.ops.extract import extract_from_frames
    from pyp_tpu.ops.fourier_slice import volume_to_fourier
    from pyp_tpu.ops.refine3d import make_mask_points

    pixel = float(params["scope_pixel"])
    box = int(params.get("csp_box") or 64)
    Fref = volume_to_fourier(jnp.asarray(ref_volume))
    mask_pts = jnp.asarray(make_mask_points(
        box, pixel, float(params.get("csp_rlref") or 60.0),
        max(float(param(params.get("csp_rhref") or "12", 2)), 2.5 * pixel)))

    R_eff = np.asarray(csp_ops.effective_rotations(cp))   # (T, P, 3, 3)
    pred = np.asarray(csp_ops.project_positions(cp))      # (T, P, 2)
    depth = np.asarray(csp_ops.particle_depth(cp))        # (T, P)
    T = len(tilt_movies)
    P = pred.shape[1]
    out_windows = []
    out_traj = []
    for t in range(T):
        frames = np.asarray(tilt_movies[t], dtype=np.float32)
        F_t, ny, nx = frames.shape
        center = np.array([ny // 2, nx // 2])
        ci = np.round(pred[t] + center).astype(np.int32)
        ci = np.clip(ci, box // 2, [ny - box // 2 - 1, nx - box // 2 - 1])
        windows = extract_from_frames(jnp.asarray(frames), jnp.asarray(ci),
                                      box, invert=False, normalize=False)
        phi, theta, psi = matrix_to_euler(jnp.asarray(R_eff[t]))
        dsh = (pred[t] + center - ci).astype(np.float32)
        poses = jnp.stack([
            jnp.asarray(phi), jnp.asarray(theta), jnp.asarray(psi),
            jnp.asarray(dsh[:, 0]), jnp.asarray(dsh[:, 1]),
        ], axis=1)
        df_t = (defocus[t, :2].mean() + depth[t] * pixel).astype(np.float32)
        ctf_t = np.stack([df_t, df_t, np.zeros(P), np.zeros(P)],
                         axis=1).astype(np.float32)
        traj, _score = polish_ops.refine_trajectories(
            windows, poses, jnp.asarray(ctf_t), Fref, mask_pts, box, pixel,
            iters=int(params.get("polish_iters") or 30),
            voltage_kv=float(params["scope_voltage"]),
            cs_mm=float(params["scope_cs"]),
            amplitude_contrast=float(params["scope_wgh"]),
        )
        # spline-with-outlier-weights regularization across frames +
        # spatial coupling across particles (reference regularize family,
        # analysis/fit.py:873; csp_time/spatial_sigma pyp_config §A.3) —
        # the per-particle NCC trajectories of faint particles are noisy
        # and occasionally wild; the plain Gaussian smoother averages the
        # wild frames IN, the spline rejects them
        from pyp_tpu.analysis.fit import regularize_trajectories

        traj = jnp.asarray(regularize_trajectories(
            np.asarray(traj), positions=ci.astype(np.float64),
            time_sigma=float(params.get("csp_time_sigma") or 21.0),
            spatial_sigma=float(params.get("csp_spatial_sigma") or 500.0),
            method=str(params.get("csp_transreg_method") or "spline"),
            outlier_mads=float(params.get("csp_reg_outlier_mads") or 5.0),
        ).astype(np.float32))
        d = (jnp.asarray(doses[t]) if doses is not None
             else jnp.arange(1, F_t + 1, dtype=jnp.float32))
        out_windows.append(np.asarray(polish_ops.polished_average(
            windows, traj, d, pixel)))
        out_traj.append(np.asarray(traj))
        logger.info("csp frame refinement tilt %d: %d particles x %d frames",
                    t, P, F_t)
    return np.stack(out_windows), out_traj
