"""Iterative 3D refinement loop — the frealign_iterate equivalent.

Rebuild of the reference's refinement driver (call stack SURVEY §3.3,
refine/frealign/frealign.py:1422): per iteration — (optional) occupancy
update, pose refinement over particle ranges, reconstruction of half maps,
FSC/resolution bookkeeping, durable per-iteration state
(maps/<dataset>_r01_02.mrc + .cistem tables) so `refine_iter` resumes.
Particle-range sharding is a batch loop on one chip and shard_map across
chips (pyp_tpu.parallel); classes refine independently.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pyp_tpu.config.params import param
from pyp_tpu.io import cistem, mrc
from pyp_tpu.utils import Timer, get_logger

logger = get_logger("refine")


def table_to_ctf_params(table: cistem.Table) -> np.ndarray:
    return np.stack([
        table["defocus_1"], table["defocus_2"], table["defocus_angle"],
        table["phase_shift"] if "phase_shift" in table else np.zeros(table.n_rows),
    ], axis=1).astype(np.float32)


def table_to_poses(table: cistem.Table, pixel: float) -> np.ndarray:
    """Pose array from a .cistem table; shifts stored in Å -> pixels."""
    return np.stack([
        table["phi"], table["theta"], table["psi"],
        table["y_shift"] / pixel, table["x_shift"] / pixel,
    ], axis=1).astype(np.float32)


def poses_into_table(table: cistem.Table, result, pixel: float,
                     freeze: set | None = None):
    """freeze: per-DOF toggles OFF keep the previous table value — the
    reference's refine3d stdin per-parameter refine switches
    (refine_refine_angle_{phi,theta,psi}, refine_refine_shift{x,y};
    frealign.py refine3d card 'parameters to refine')."""
    freeze = freeze or set()
    if "phi" not in freeze:
        table["phi"] = np.asarray(result.phi)
    if "theta" not in freeze:
        table["theta"] = np.asarray(result.theta)
    if "psi" not in freeze:
        table["psi"] = np.asarray(result.psi)
    if "shifty" not in freeze:
        table["y_shift"] = np.asarray(result.shift_y) * pixel
    if "shiftx" not in freeze:
        table["x_shift"] = np.asarray(result.shift_x) * pixel
    table["score"] = np.asarray(result.score)
    table["logp"] = np.asarray(result.logp)
    table["sigma"] = np.asarray(result.sigma)
    return table


def _dof_freeze(params: dict) -> set:
    """DOFs whose refine_refine_* switch is explicitly OFF."""
    frozen = set()
    for dof, key in (("phi", "refine_refine_angle_phi"),
                     ("theta", "refine_refine_angle_theta"),
                     ("psi", "refine_refine_angle_psi"),
                     ("shiftx", "refine_refine_shiftx"),
                     ("shifty", "refine_refine_shifty")):
        if params.get(key) is not None and not params.get(key):
            frozen.add(dof)
    return frozen


def reconstruct_banded(stack, poses, ctf_params, pixel, high_res, rc_kwargs,
                       mesh=None, batch: int = 256):
    """Reconstruction on the band-limited auto-crop grid (wavenumbers
    preserved, same rule as the FRM matcher), Fourier-padded back to the
    data box with the FSC remapped shell-for-shell onto the data axis.

    Fourier insertion is scatter-bound (points ~ box^2 per slice); an
    intermediate map only needs fidelity to the matching band `high_res`,
    so cropping cuts the scatter work by (n_rec/n)^2. Returns a
    Reconstruction whose maps live on the data box."""
    import functools

    import jax
    import jax.numpy as jnp

    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.parallel import reconstruct_sharded

    n_data = int(stack.shape[-1])
    n_total = len(stack)
    r_max = n_data * pixel / max(high_res, 2.0 * pixel)
    n_rec = min(n_data, int(np.ceil((2.0 * r_max + 8.0) / 16.0)) * 16)
    if n_rec >= 0.9 * n_data:  # negligible saving: skip crop+upsample
        if mesh is not None:
            return reconstruct_sharded(
                mesh, np.asarray(stack), poses, ctf_params, pixel, **rc_kwargs)
        return rec.reconstruct(
            np.asarray(stack) if isinstance(stack, np.ndarray) else stack,
            poses, ctf_params, pixel, **rc_kwargs)

    from pyp_tpu.core.fft import fourier_crop_3d

    host_np = isinstance(stack, np.ndarray)
    if mesh is not None:
        out = reconstruct_sharded(
            mesh, np.asarray(stack), poses, ctf_params, pixel,
            crop_to=n_rec, **rc_kwargs)
    else:
        # crop happens ON DEVICE inside reconstruct (host-side pre-crop
        # measured slower through the axon tunnel: extra stack transfer);
        # device-resident stacks pass straight through
        out = rec.reconstruct(
            np.asarray(stack) if host_np else stack,
            poses, ctf_params, pixel, crop_to=n_rec,
            **rc_kwargs)
    # shell k on the crop grid IS data wavenumber k: remap the FSC onto the
    # data shell axis (zero beyond the band) and upsample the maps by
    # centered Fourier pad
    fsc_full = np.zeros(n_data // 2, dtype=np.float32)
    fsc_full[:n_rec // 2] = np.asarray(out.fsc)
    up = jax.jit(functools.partial(
        fourier_crop_3d, out_shape=(n_data, n_data, n_data)))
    return out._replace(
        volume=up(out.volume), half1=up(out.half1), half2=up(out.half2),
        fsc=jnp.asarray(fsc_full),
        freqs=jnp.asarray(np.arange(n_data // 2, dtype=np.float32) / n_data))


def _shaping_requested(params) -> bool:
    """True when any reconstruct-tab shaping window departs from its
    no-op default (reference call_shape_phase_residuals gate)."""
    defaults = {
        "reconstruct_minazh": 0.0, "reconstruct_maxazh": 180.0,
        "reconstruct_mindef": 0.0, "reconstruct_maxdef": 100000.0,
        "reconstruct_minscore": 0.0, "reconstruct_maxscore": 1.0,
        "reconstruct_mintilt": -90.0, "reconstruct_maxtilt": 90.0,
        "reconstruct_firstframe": 0.0, "reconstruct_lastframe": -1.0,
        "reconstruct_score_fraction": 1.0,
    }
    for key, dv in defaults.items():
        v = params.get(key)
        if v not in (None, "") and float(v) != dv:
            return True
    return str(params.get("reconstruct_shapr") or "none") != "none"


def pixel_hint(table, params):
    return float(table["pixel_size"][0]) if "pixel_size" in table else float(
        params["scope_pixel"])


def refinement_iteration(
    stack, table: cistem.Table, ref_volume, params: dict, iteration: int,
    batch: int = 256, fsc_curve=None, ref_halves=None, prev_table=None,
):
    """One iteration: refine poses (batched over particle ranges), then
    reconstruct half maps + FSC. Returns (table, Reconstruction).

    ref_halves: optional (half1, half2) maps from the previous iteration —
    with refine_goldstandard, each half-set's particles align only against
    their own half map (RELION/cisTEM gold-standard separation, which keeps
    the FSC free of alignment model bias)."""
    import jax.numpy as jnp

    from pyp_tpu.core import fsc as fsc_mod
    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.ops import refine3d

    pixel = float(table["pixel_size"][0]) if "pixel_size" in table else float(
        params["scope_pixel"]
    )
    rhref = float(param(params["refine_rhref"], iteration))
    mode = params.get("refine_mode", "local")
    if (fsc_curve is not None and params.get("refine_fboost")
            and float(params.get("refine_fboostlim") or 0.0) > 0):
        # signed-CC boost (cisTEM refine3d line 21, SURVEY §A.1): shells
        # coarser than fboostlim keep full weight regardless of FSC
        n_sh = len(np.asarray(fsc_curve))
        box_sh = stack.shape[-1]
        sh_res = box_sh * pixel_hint(table, params) / np.maximum(
            np.arange(n_sh), 1)
        fsc_curve = np.where(sh_res >= float(params["refine_fboostlim"]),
                             np.maximum(np.asarray(fsc_curve), 0.999),
                             np.asarray(fsc_curve))
    n_total = table.n_rows
    ctf_params = table_to_ctf_params(table)
    has_poses = np.any(np.abs(table_to_poses(table, pixel)[:, :3]) > 1e-6)
    global_search = mode == "global" or not has_poses

    # device-resident stacks (production problem sizes: 49k x 256^2 does
    # not want a host round-trip per batch per iteration — callers may
    # jnp.device_put the whole stack, bf16 or f32, and every per-batch
    # transform below then runs on device)
    on_device = not isinstance(stack, np.ndarray)

    # outer mask radius (particle_rad, Å — cisTEM refine3d line 18,
    # SURVEY §A.1): matching sees the soft-masked particle; reconstruction
    # keeps the raw images
    rad_a = float(params.get("refine_maskrad") or 0.0) or float(
        params.get("particle_rad") or 0.0)
    if global_search and float(params.get("refine_srad") or 0.0) > 0:
        # global-search mask radius (metric srad / cisTEM line 23): wider
        # than the particle radius so rotational search sees full context
        rad_a = float(params["refine_srad"])
    m2d = None
    if rad_a > 0:
        from pyp_tpu.core.filters import soft_circular_mask

        m2d = soft_circular_mask(stack.shape[-1], rad_a / pixel, 4.0)

    # focused refinement (cisTEM refine3d focus sphere + "apply 2D
    # masking", SURVEY §A.1 lines 29-32/44, class_focusmask): in local
    # mode each particle's matching image is masked to the projection of
    # the focus sphere at its current pose; the reconstruction keeps the
    # full images
    focus = refine3d.parse_focus_mask(params.get("class_focusmask"))
    fmasks = None
    if focus is not None and not global_search:
        fmasks = refine3d.focus_mask_2d(
            table_to_poses(table, pixel), focus, stack.shape[-1], pixel)

    if on_device:
        def match_batch(lo, hi):
            xs = jnp.asarray(stack[lo:hi], dtype=jnp.float32)
            if m2d is not None:
                xs = xs * jnp.asarray(m2d)[None]
            if fmasks is not None:
                xs = xs * jnp.asarray(fmasks[lo:hi])
            return xs
    else:
        match_stack = stack
        if m2d is not None:
            match_stack = np.asarray(stack) * np.asarray(m2d)[None]
        if fmasks is not None:
            match_stack = np.asarray(match_stack) * np.asarray(fmasks)

        def match_batch(lo, hi):
            return np.asarray(match_stack[lo:hi])

    # reference-map masking ahead of matching (metric tab masking_method:
    # spherical is the projection-side default; "auto" automasks the
    # reference; "file" multiplies a user mask volume — cisTEM refine3d's
    # input-3D masking cards)
    mm = str(params.get("refine_masking_method") or "spherical")
    if mm in ("auto", "file"):
        import jax.numpy as _jnp

        if mm == "auto":
            from pyp_tpu.postprocess.core import auto_mask

            m3 = auto_mask(np.asarray(ref_volume, dtype=np.float32),
                           pixel_size=pixel)
        else:
            from pyp_tpu.io import mrc as _mrc

            m3 = _jnp.asarray(_mrc.read(
                str(params["refine_maskth"])).astype(np.float32))
        ref_volume = np.asarray(ref_volume, dtype=np.float32) * np.asarray(
            m3, dtype=np.float32)
        if ref_halves is not None:
            ref_halves = tuple(
                _jnp.asarray(np.asarray(h, dtype=np.float32)
                             * np.asarray(m3, dtype=np.float32))
                for h in ref_halves)

    shell_w = None
    if fsc_curve is not None and params.get("refine_fssnr", True):
        from pyp_tpu.ops.refine3d import make_mask_points, shell_weights_from_fsc

        n_box = stack.shape[-1]
        rhref_pts = make_mask_points(
            n_box, pixel, float(params["refine_rlref"]), max(rhref * 0.8, 2.1 * pixel)
        )
        shell_w = shell_weights_from_fsc(fsc_curve, rhref_pts, n_box)
        rbfact = float(params.get("refine_rbfact") or 0.0)
        if rbfact > 0:
            # alignment-only B-factor envelope (FREALIGN RBFACT): exp(-B g²/4)
            # over the matching band; the reconstruction stays unweighted
            g2 = np.sum(np.asarray(rhref_pts, dtype=np.float64) ** 2, axis=1)
            g2 = g2 / (n_box * pixel) ** 2  # (cycles/Å)²
            shell_w = shell_w * jnp.asarray(
                np.exp(-rbfact * g2 / 4.0), dtype=shell_w.dtype)

    from pyp_tpu.parallel import pipeline_mesh, reconstruct_sharded, sharded_refine_batch

    mesh = pipeline_mesh(params)
    engine = str(params.get("refine_engine") or "frm")
    if engine != "frm" and n_total * stack.shape[-1] ** 2 > 2**27:
        # production-size guardrail: the gather engine is the autodiff /
        # verification twin, measured ~15x slower per particle than the
        # FRM engine on TPU (BENCH_r03: 168 vs 2487 p/s at box 128) —
        # deliberate small-job use (tests, polish) stays silent
        logger.warning(
            "refine_engine=%s selected for %d particles at box %d: the "
            "gather engine runs ~15x slower than the default FRM engine "
            "on production-size jobs (measured 168 vs 2487 particles/s "
            "at box 128 on one v5e chip); set refine_engine=frm unless "
            "you need the autodiff verification path",
            engine, n_total, stack.shape[-1])
    dang = float(param(params["refine_dang"], iteration))
    rb_kwargs = dict(
        angular_step=dang,
        psi_step=float(params["refine_psi_step"]),
        low_res=float(params["refine_rlref"]),
        high_res_search=max(rhref, 2.5 * pixel),
        high_res_refine=max(rhref * 0.8, 2.1 * pixel),
        shift_extent=float(params["refine_searchx"]),
        shift_step=float(params.get("refine_shift_step") or 2.0),
        symmetry=str(params["particle_sym"]),
        mode="global" if global_search else "local",
        topk=int(params.get("refine_topk") or 4),
        local_iters=int(params.get("refine_local_iters") or 24),
        lr_angles=float(params.get("refine_lr_angles") or 2.0),
        lr_shifts=float(params.get("refine_lr_shifts") or 0.4),
        voltage_kv=float(params["scope_voltage"]),
        cs_mm=float(params["scope_cs"]),
        amplitude_contrast=float(params["scope_wgh"]),
    )
    # superbatch size: `batch` particles per chip per dispatch
    step = batch * (1 if mesh is None else int(np.prod(list(mesh.shape.values()))))

    results = []
    if not params.get("refine_skip"):
        with Timer(f"refinement iteration {iteration}"):
            if engine == "frm":
                # MXU engine (ops/frm.py): direction bank built once per
                # iteration, shared across all particle batches
                from pyp_tpu.ops import frm
                from pyp_tpu.ops.fourier_slice import volume_to_fourier

                n_box = stack.shape[-1]
                # local iterations refine shifts AROUND the table estimate
                # (already sub-pixel after the global iteration), so the
                # candidate disk shrinks to +/-2 px — the full searchx disk
                # at fine step is ~450 trig-heavy candidates per polar
                # point and would dominate late box-256 iteration walls
                se = float(params["refine_searchx"])
                if not global_search:
                    se = min(se, 2.0)
                cfg = frm.get_config(
                    n_box, pixel,
                    low_res=float(params["refine_rlref"]),
                    high_res=max(rhref * 0.8, 2.1 * pixel),
                    angular_step=dang,
                    symmetry=str(params["particle_sym"]),
                    shift_extent=se,
                    shift_step=float(params.get("refine_frm_shift_step") or 0)
                    or max(0.5, float(params["refine_searchx"]) / 12.0),
                    voltage_kv=float(params["scope_voltage"]),
                    cs_mm=float(params["scope_cs"]),
                    amplitude_contrast=float(params["scope_wgh"]),
                    wiener=float(params.get("refine_frm_wiener") or 0.1),
                    rounds=int(params.get("refine_frm_rounds") or 3),
                    n_psi=int(params.get("refine_frm_npsi") or 0) or None,
                    upsample=int(params.get("refine_frm_upsample") or 4),
                    crop_margin=int(params.get("refine_frm_crop_margin")
                                    or 8),
                )
                frm_dblock = int(params.get("refine_frm_dblock") or 0) or None
                iblow = int(params.get("refine_iblow") or 2)
                gold = bool(params.get("refine_goldstandard")) and \
                    ref_halves is not None
                # drain the dispatch queue before the bank build: the
                # previous iteration's finalize/upsample programs may
                # still hold their workspace (enqueue-time allocation —
                # the attempt-10 iteration-6 OOM happened exactly here)
                if ref_halves is not None:
                    np.asarray(jnp.asarray(ref_halves[0])[0, 0, 0])
                if gold:
                    banks = [cfg.bank(volume_to_fourier(jnp.asarray(h),
                                                        pad=iblow))
                             for h in ref_halves]
                else:
                    bank = cfg.bank(volume_to_fourier(jnp.asarray(ref_volume),
                                                      pad=iblow))
                # bank telemetry: D x R x n_psi is the matmul's inner
                # structure AND the resident HBM term that killed box-256
                # runs — log it every iteration so superlinear wall/HBM
                # growth under the rhref schedule is measurable, not
                # archaeological (VERDICT r4 weak #1/#3)
                from pyp_tpu.utils import memwatch as _mw

                _fu = (banks[0] if gold else bank).FUc
                logger.info(
                    "FRM bank iter %d: D=%d R=%d n_psi=%d -> %.2f GiB x %d "
                    "bank(s); polar=%s; live HBM %.2f GiB", iteration,
                    _fu.shape[0], _fu.shape[1], _fu.shape[2],
                    _fu.nbytes / 2**30, 2 if gold else 1,
                    "gather" if getattr(cfg, "polar_gather", False)
                    else "matmul", _mw.live_device_bytes() / 2**30)
                # refine_priors (metric tab): pose priors restrict the
                # local search to a cone around the current pose; without
                # priors the local mode still searches the full lattice
                cone = (None if global_search
                        or not params.get("refine_priors", True)
                        else float(params.get("refine_frm_cone") or 20.0))
                G_pts = len(cfg.radii) * cfg.n_psi
                ndev = (1 if mesh is None
                        else int(np.prod(list(mesh.shape.values()))))
                halves_now = _half_subsets(table) if gold else None
                # sub-lattice polish: FRM directions snap to the lattice
                # (~step/2 quantization); a short autodiff gradient polish
                # (the gather engine's continuous refiner) removes it where
                # precision matters — default on the final iteration only
                # (the gather pass is ~10x the FRM cost per particle)
                polish_when = str(params.get("refine_frm_polish") or "final")
                do_polish = polish_when == "always" or (
                    polish_when == "final" and "refine_maxiter" in params
                    and iteration >= int(params["refine_maxiter"]) + 1)
                frm_poses, frm_scores = [], []
                for lo in range(0, n_total, step):
                    hi = min(lo + step, n_total)
                    xs = match_batch(lo, hi)
                    cp = ctf_params[lo:hi]
                    init = (None if global_search
                            else table_to_poses(table, pixel)[lo:hi])
                    b0 = hi - lo
                    padb = (-b0) % ndev
                    if padb:  # pad so the batch shards evenly; trim after
                        xp = jnp if on_device else np
                        xs = xp.concatenate(
                            [xs, xp.repeat(xs[-1:], padb, axis=0)])
                        cp = np.concatenate([cp, cp[-1:].repeat(padb, 0)])
                        if init is not None:
                            init = np.concatenate(
                                [init, init[-1:].repeat(padb, 0)])
                    if mesh is not None:
                        # pure data parallelism: shard the batch over every
                        # mesh axis; GSPMD partitions the jitted engine
                        import jax
                        from jax.sharding import NamedSharding, PartitionSpec

                        sh = NamedSharding(
                            mesh, PartitionSpec(tuple(mesh.axis_names)))
                        xs = jax.device_put(xs, sh)
                        cp = jax.device_put(cp.astype(np.float32), sh)
                        if init is not None:
                            init = jax.device_put(
                                init.astype(np.float32), sh)
                    if gold:
                        # gold standard: each half aligns against its own
                        # half map; run the batch through both banks and
                        # select per row (both runs share all compiled
                        # machinery, so cost is 2x matmuls, no recompiles)
                        outs = [frm.frm_refine(
                            xs, cp, None, cfg, bank=b, init_poses=init,
                            prior_cone_deg=cone, fsc_curve=fsc_curve,
                            d_block=frm_dblock)
                            for b in banks]
                        hsel = halves_now[lo:hi]
                        if padb:
                            hsel = np.concatenate(
                                [hsel, hsel[-1:].repeat(padb, 0)])
                        hs = jnp.asarray(hsel)[:, None]
                        poses = jnp.where(hs == 0, outs[0][0], outs[1][0])
                        scores = jnp.where(hs[:, 0] == 0, outs[0][1],
                                           outs[1][1])
                    else:
                        poses, scores = frm.frm_refine(
                            xs, cp, None, cfg, bank=bank,
                            init_poses=init, prior_cone_deg=cone,
                            fsc_curve=fsc_curve, d_block=frm_dblock,
                        )
                    if padb:
                        poses = poses[:b0]
                        scores = scores[:b0]
                    frm_poses.append(np.asarray(poses))
                    frm_scores.append(np.asarray(scores))
                # FRM matching done: free the direction banks BEFORE the
                # polish pass — bank + polish reference spectra + autodiff
                # activations co-resident OOM the chip at production boxes
                banks = bank = None
                all_poses = np.concatenate(frm_poses)
                all_scores = np.concatenate(frm_scores)
                if do_polish:
                    # polish reference spectra are built HERE, after the
                    # bank free — constructing them before the match loop
                    # kept banks + polish spectra + match temps co-resident
                    # and OOMed the box-256 final iteration (attempt 10)
                    polish_pts = jnp.asarray(refine3d.make_mask_points(
                        stack.shape[-1], pixel, float(params["refine_rlref"]),
                        max(rhref * 0.8, 2.1 * pixel)))
                    if gold:
                        polish_refs = [volume_to_fourier(jnp.asarray(h),
                                                          pad=iblow)
                                       for h in ref_halves]
                    else:
                        polish_refs = [volume_to_fourier(
                            jnp.asarray(ref_volume), pad=iblow)]
                    # cisTEM refine_mask order (psi,theta,phi,shx,shy)
                    # -> our pose layout (phi,theta,psi,sy,sx)
                    rm = [float(v) for v in str(
                        params.get("refine_mask") or "1,1,1,1,1"
                    ).replace(":", ",").split(",")]
                    pose_mask = (rm[2], rm[1], rm[0], rm[4], rm[3])
                    # gradient-polish activation memory scales with
                    # batch x band points: shrink the chunk as the box
                    # grows past the 128-px tuning point
                    pstep = max(64, step // max(1, (stack.shape[-1]
                                                    // 128) ** 2))
                    for lo in range(0, n_total, pstep):
                        hi = min(lo + pstep, n_total)
                        xs = match_batch(lo, hi)
                        cp = ctf_params[lo:hi]
                        p0 = jnp.asarray(all_poses[lo:hi])
                        pol = [refine3d.local_refine(
                            jnp.asarray(xs), jnp.asarray(cp), F,
                            p0, polish_pts,
                            stack.shape[-1], pixel, pose_mask=pose_mask,
                            voltage_kv=float(params["scope_voltage"]),
                            cs_mm=float(params["scope_cs"]),
                            amplitude_contrast=float(params["scope_wgh"]),
                            iters=int(params.get("refine_local_iters")
                                      or 24),
                            lr_angles=float(params.get("refine_lr_angles")
                                            or 2.0),
                            lr_shifts=float(params.get("refine_lr_shifts")
                                            or 0.4),
                            weights=shell_w) for F in polish_refs]
                        if gold:
                            hs = jnp.asarray(halves_now[lo:hi])[:, None]
                            pp = jnp.where(hs == 0, pol[0][0], pol[1][0])
                            ss = jnp.where(hs[:, 0] == 0, pol[0][1],
                                           pol[1][1])
                        else:
                            pp, ss = pol[0]
                        all_poses[lo:hi] = np.asarray(pp)
                        all_scores[lo:hi] = np.asarray(ss)
                    polish_refs = polish_pts = None  # noqa: F841
                results.append(frm.to_refine_result(
                    jnp.asarray(all_poses), jnp.asarray(all_scores),
                    n_band_points=G_pts))
            else:
                for lo in range(0, n_total, step):
                    hi = min(lo + step, n_total)
                    init = None if global_search else table_to_poses(table, pixel)[lo:hi]
                    if mesh is not None:
                        res = sharded_refine_batch(
                            mesh, np.asarray(match_batch(lo, hi)),
                            ctf_params[lo:hi],
                            np.asarray(ref_volume), pixel,
                            init_poses=init, shell_weights=shell_w, **rb_kwargs,
                        )
                    else:
                        res = refine3d.refine_batch(
                            jnp.asarray(match_batch(lo, hi)),
                            jnp.asarray(ctf_params[lo:hi]),
                            jnp.asarray(ref_volume), pixel,
                            init_poses=init, shell_weights=shell_w, **rb_kwargs,
                        )
                    results.append(res)
            merged = refine3d.RefineResult(*(
                jnp.concatenate([getattr(r, f) for r in results])
                for f in refine3d.RefineResult._fields
            ))
            table = poses_into_table(table, merged, pixel,
                                     freeze=_dof_freeze(params))
            # release matcher state before reconstruction: the FRM
            # direction bank + polish references are GBs of HBM at
            # production boxes and nothing below needs them (measured:
            # box 256 finalize OOMs with them alive)
            results = merged = None
            banks = bank = polish_refs = polish_pts = None  # noqa: F841

    with Timer(f"reconstruction iteration {iteration}"):
        poses = table_to_poses(table, pixel)
        if not params.get("reconstruct_per_particle_splitting", True) and \
                "particle_group" in table:
            # half-set split by micrograph/film: beam-induced correlations
            # within a micrograph stay inside one half (reference
            # reconstruct_per_particle_splitting=False, SURVEY §A.2)
            subset = (np.asarray(table["particle_group"]).astype(int) % 2)
        else:
            subset = (
                _half_subsets(table)
                if "assigned_subset" in table else np.arange(n_total) % 2
            )
        weights = (
            np.asarray(table["occupancy"]) / 100.0
            if "occupancy" in table else np.ones(n_total)
        )
        # score-based particle weighting (refine_bsc, SURVEY §A.2): weight
        # exp(bsc * (score - mean)/std) caps reconstruction influence of
        # low-scoring particles
        bsc = float(params.get("refine_bsc") or 0.0)
        if bsc > 0 and "score" in table:
            sc = np.asarray(table["score"])
            glob = params.get("refine_global_stat",
                              params.get("metric_global_stat", True))
            if not glob and "particle_group" in table:
                # per-micrograph score statistics (metric tab global_stat
                # OFF): z-score within each film so ice-thickness and dose
                # differences between micrographs don't skew the weights
                grp = np.asarray(table["particle_group"]).astype(int)
                z = np.zeros_like(sc)
                for g in np.unique(grp):
                    m = grp == g
                    z[m] = (sc[m] - sc[m].mean()) / (sc[m].std() + 1e-6)
            else:
                z = (sc - sc.mean()) / (sc.std() + 1e-6)
            weights = weights * np.exp(np.clip(bsc * z, -4.0, 1.0))
        # FREALIGN PBC/BOFF weighting (refine/frealign card contract):
        # weight = exp(pbc * (score - boff)/100), boff defaults to the
        # dataset mean score; capped at 1 so it only downweights
        pbc = float(params.get("refine_pbc") or 0.0)
        if pbc > 0 and "score" in table:
            sc = np.asarray(table["score"])
            boff = float(params.get("refine_boff") or 0.0) or float(sc.mean())
            weights = weights * np.exp(
                np.clip(pbc * (sc - boff) / 100.0, -5.0, 0.0))
        # score threshold (reconstruct3d score window, SURVEY §A.2):
        # particles under the percentile contribute weight 0
        thr_pct = float(params.get("reconstruct_score_threshold") or 0.0)
        if thr_pct > 0 and "score" in table:
            sc = np.asarray(table["score"])
            weights = np.where(sc >= np.percentile(sc, thr_pct), weights, 0.0)
        # reference-parity score shaping (shape_phase_residuals role,
        # reference analysis/scores.py:300 via frealign.py:1731): group-local
        # cutoffs + defocus/azimuth/tilt/frame windows + shapr
        # reverse/consistency, folded into reconstruction weights
        if _shaping_requested(params) and "score" in table:
            from pyp_tpu.analysis import scores as _scores

            keep_mask = _scores.shaping_mask_from_params(
                table, params, previous=prev_table)
            weights = np.where(keep_mask, weights, 0.0)
        batch = int(params.get("reconstruct_batch") or batch)
        min_occ = float(params.get("reconstruct_min_occ") or 0.0)
        if min_occ > 0 and "occupancy" in table:
            # occupancy floor (FREALIGN reconstruct min_occ): particles
            # under it contribute weight 0
            weights = np.where(
                np.asarray(table["occupancy"]) >= min_occ, weights, 0.0)
        rc_kwargs = dict(
            subset=subset.astype(np.int32), weights=weights.astype(np.float32),
            # reconstruct_apply_symmetry=False inserts asymmetrically even
            # when the refinement symmetry is higher (reference
            # reconstruct3d card)
            symmetry=(str(params["particle_sym"])
                      if params.get("reconstruct_apply_symmetry", True)
                      else "C1"),
            voltage_kv=float(params["scope_voltage"]),
            cs_mm=float(params["scope_cs"]),
            amplitude_contrast=float(params["scope_wgh"]),
            wiener=float(params.get("reconstruct_wiener") or 0.5),
            batch=batch,
            pad=int(params.get("reconstruct_pad") or 2),
            gridding=str(params.get("reconstruct_gridding") or "trilinear"),
            iewald=int(params.get("reconstruct_iewald") or 0),
        )
        if abs(rc_kwargs["iewald"]) >= 2:
            # reference-based Ewald (IEWALD ±2): the CURRENT map predicts
            # the opposite sphere branch during insertion
            rc_kwargs["ref_volume"] = np.asarray(ref_volume,
                                                 dtype=np.float32)
        if params.get("reconstruct_lblur"):
            # likelihood blurring (reconstruct3d blurring card,
            # frealign.py:1772): insert over a psi-offset bank
            rc_kwargs["lblur_range"] = float(
                params.get("reconstruct_lblur_range") or 20.0)
            step_deg = float(params.get("reconstruct_lblur_step") or 0.0)
            rc_kwargs["lblur_nrot"] = (
                # psi step spelling of the bank density (lblur_step)
                max(3, int(round(rc_kwargs["lblur_range"] / step_deg)) | 1)
                if step_deg > 0
                else int(params.get("reconstruct_lblur_nrot") or 21))
        # reconstruct_norm: per-particle normalization ahead of insertion
        # (cisTEM reconstruct3d "normalize particles", SURVEY §A.2)
        rec_stack = stack
        if params.get("reconstruct_norm"):
            from pyp_tpu.core.filters import normalize_images

            rec_stack = (normalize_images(jnp.asarray(stack)) if on_device
                         else np.asarray(normalize_images(
                             jnp.asarray(stack))))
        # reconstruct_rrec: hard reconstruction resolution limit (Å) — the
        # reference's "rec resolution limit" (frealign.py:1794); wins over
        # the band-limited auto-crop band when coarser
        rrec = float(params.get("reconstruct_rrec") or 0.0)
        # band-limited intermediate reconstruction (reconstruct_banded);
        # the FINAL iteration always reconstructs full-size
        is_final = ("refine_maxiter" in params
                    and iteration >= int(params["refine_maxiter"]) + 1)
        if rrec > 2.0 * pixel:
            out = reconstruct_banded(
                rec_stack, poses, ctf_params, pixel, rrec,
                rc_kwargs, mesh=mesh, batch=batch)
        elif bool(params.get("reconstruct_crop", True)) and not is_final:
            try:  # cover this iteration's band, the next one's, and polish
                rhref_next = float(param(params["refine_rhref"], iteration + 1))
            except Exception:
                rhref_next = rhref
            # 0.7 margin factor: the next iteration MATCHES at
            # rhref_next*0.8 — reconstruct a slightly wider band so the
            # matching band never sits at the map's hard cutoff
            out = reconstruct_banded(
                rec_stack, poses, ctf_params, pixel,
                max(min(rhref, rhref_next) * 0.7, 2.0 * pixel),
                rc_kwargs, mesh=mesh, batch=batch)
        elif mesh is not None:
            out = reconstruct_sharded(
                mesh, np.asarray(rec_stack), poses, ctf_params, pixel,
                **rc_kwargs
            )
        else:
            out = rec.reconstruct(
                rec_stack if on_device else np.asarray(rec_stack),
                poses, ctf_params, pixel, **rc_kwargs
            )
    res_a = float(fsc_mod.resolution_at_threshold(
        out.freqs, out.fsc, pixel,
        float(params.get("refine_fsc_threshold") or 0.143)))
    from pyp_tpu.utils import memwatch as _mw

    logger.info("iteration %d: FSC(0.143) resolution %.2f Å; "
                "live HBM %.2f GiB", iteration, res_a,
                _mw.live_device_bytes() / 2**30)
    return table, out, res_a


def refine_loop(stack, table, initial_model, params, work_dir=".",
                dataset="dataset", cls: int = 1):
    """Multi-iteration refinement with durable per-iteration state
    (maps/<dataset>_r{cls:02d}_{it:02d}.mrc/.cistem — resume at refine_iter)."""
    maps_dir = Path(work_dir) / "maps"
    maps_dir.mkdir(parents=True, exist_ok=True)
    pixel = float(params["scope_pixel"])
    start = int(params.get("refine_iter") or 2)
    maxiter = int(params["refine_maxiter"])
    ref = np.asarray(initial_model)

    # resume: load the latest finished iteration's FULL durable state —
    # map + table + half maps (-> the FSC/SSNR weighting the next
    # iteration would have seen) + prior history, so a killed-and-resumed
    # loop is numerically identical to an uninterrupted one (the
    # reference's equivalent durable state is maps + .par + per-iteration
    # statistics_rNN.txt, frealign.py:4660; proven by
    # tests/test_cli_resume.py's exact-match control)
    history = []
    fsc_curve = None  # previous iteration's half-map FSC -> SSNR weighting
    ref_halves = None
    for it in range(maxiter + 1, start - 1, -1):
        m = maps_dir / f"{dataset}_r{cls:02d}_{it:02d}.mrc"
        t = maps_dir / f"{dataset}_r{cls:02d}_{it:02d}.cistem"
        if m.exists() and t.exists():
            ref = mrc.read(m).astype(np.float32)
            table = cistem.read_parameters(t)
            h1p = maps_dir / f"{dataset}_r{cls:02d}_{it:02d}_half1.mrc"
            h2p = maps_dir / f"{dataset}_r{cls:02d}_{it:02d}_half2.mrc"
            if h1p.exists() and h2p.exists():
                import jax.numpy as jnp

                from pyp_tpu.core import fsc as fsc_mod

                h1 = mrc.read(h1p).astype(np.float32)
                h2 = mrc.read(h2p).astype(np.float32)
                ref_halves = (h1, h2)
                _, curve = fsc_mod.fsc(jnp.asarray(h1), jnp.asarray(h2))
                fsc_curve = np.asarray(curve)
            hist_p = maps_dir / f"{dataset}_r{cls:02d}_history.json"
            if hist_p.exists():
                import json as _json

                try:
                    history = [e for e in _json.loads(hist_p.read_text())
                               if int(e.get("iteration", 0)) <= it]
                except ValueError:
                    history = []
            start = it + 1
            logger.info("resuming at iteration %d", start)
            break
    beam_tilt_done = False
    bt0 = (float(params.get("scope_beam_tilt_x") or 0.0),
           float(params.get("scope_beam_tilt_y") or 0.0))
    if any(bt0):
        # calibrated microscope beam tilt (scope tab beam_tilt_x/y, mRad):
        # correct the working stack up front; refine_beamtilt can still
        # re-estimate the residual later
        import jax.numpy as jnp

        from pyp_tpu.ops import refine3d as _r3

        stack = np.asarray(_r3.correct_beam_tilt(
            jnp.asarray(np.asarray(stack, dtype=np.float32)), bt0[0], bt0[1],
            pixel, voltage_kv=float(params["scope_voltage"]),
            cs_mm=float(params["scope_cs"])))
        logger.info("applied calibrated beam tilt (%.3f, %.3f) mRad", *bt0)
    for it in range(start, maxiter + 2):
        if (maps_dir / "wait").exists():
            # interactive pause (frealign.py:1425): drop a `wait` file in
            # maps/ to hold the loop between iterations; remove to resume
            import time as _time

            logger.info("maps/wait present: pausing before iteration %d", it)
            while (maps_dir / "wait").exists():
                _time.sleep(5.0)
            logger.info("maps/wait removed: resuming")
        prev_table = (table.copy()
                      if _shaping_requested(params) and "score" in table
                      else None)
        prev_poses = (table_to_poses(table, pixel)
                      if params.get("plot_per_item", True) else None)
        table, recon, res_a = refinement_iteration(
            stack, table, ref, params, it, fsc_curve=fsc_curve,
            ref_halves=ref_halves, prev_table=prev_table)
        # keep the next iteration's references DEVICE-resident: a host
        # round-trip of three maps per iteration costs real wall time
        # (brutally so through the axon tunnel); numpy copies are made only
        # where the durable files are written below
        ref_halves = (recon.half1, recon.half2)
        if params.get("refine_beamtilt") and not beam_tilt_done and it > start:
            # one-shot dataset beam-tilt estimate once poses are warm
            # (cisTEM refine_ctf beam-tilt axis); corrects the working stack
            import jax.numpy as jnp

            from pyp_tpu.ops import refine3d as r3
            from pyp_tpu.ops.fourier_slice import volume_to_fourier

            rhref = float(param(params["refine_rhref"], it))
            tx, ty = r3.estimate_beam_tilt(
                jnp.asarray(np.asarray(stack)),
                jnp.asarray(table_to_ctf_params(table)),
                volume_to_fourier(jnp.asarray(np.asarray(recon.volume,
                                                         dtype=np.float32))),
                jnp.asarray(table_to_poses(table, pixel)),
                stack.shape[-1], pixel,
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"]),
                amplitude_contrast=float(params["scope_wgh"]),
                low_res=float(params.get("refine_beamtilt_rlref") or 20.0),
                high_res=max(rhref, 2.5 * pixel,
                             float(params.get("refine_beamtilt_rhref")
                                   or 4.0)),
            )
            stack = np.asarray(r3.correct_beam_tilt(
                np.asarray(stack), float(tx), float(ty), pixel,
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"])), dtype=np.float32)
            table["beam_tilt_x"] = np.full(table.n_rows, float(tx))
            table["beam_tilt_y"] = np.full(table.n_rows, float(ty))
            beam_tilt_done = True
            logger.info("beam tilt: (%.2e, %.2e) rad estimated and corrected",
                        float(tx), float(ty))
        if params.get("refine_fdef") and it > start:
            # per-particle defocus refinement at fixed pose (cisTEM
            # refine_ctf, reference frealign.py:4350): symmetric defocus
            # sweep + parabolic sub-step, batched to bound HBM
            import jax.numpy as jnp

            from pyp_tpu.ops import refine3d as r3
            from pyp_tpu.ops.fourier_slice import volume_to_fourier

            rhref = float(param(params["refine_rhref"], it))
            Fref_d = volume_to_fourier(jnp.asarray(
                np.asarray(recon.volume, dtype=np.float32)))
            pts_d = r3.make_mask_points(
                stack.shape[-1], pixel, float(params["refine_rlref"]),
                max(rhref, 2.5 * pixel))
            cp_all = table_to_ctf_params(table)
            poses_all = table_to_poses(table, pixel)
            bsz = int(params.get("reconstruct_batch") or 256)
            new_cp = []
            for lo in range(0, len(stack), bsz):
                hi = min(lo + bsz, len(stack))
                cp_b, _sc = r3.refine_defocus(
                    jnp.asarray(np.asarray(stack[lo:hi])),
                    jnp.asarray(cp_all[lo:hi]), Fref_d,
                    jnp.asarray(poses_all[lo:hi]), pts_d,
                    stack.shape[-1], pixel,
                    search_range=float(params.get("refine_def_range")
                                       or 500.0),
                    n_steps=int(params.get("refine_def_steps") or 21),
                    voltage_kv=float(params["scope_voltage"]),
                    cs_mm=float(params["scope_cs"]),
                    amplitude_contrast=float(params["scope_wgh"]))
                new_cp.append(np.asarray(cp_b))
            new_cp = np.concatenate(new_cp, axis=0)
            d_off = new_cp[:, 0] - np.asarray(cp_all)[:, 0]
            table["defocus_1"] = np.asarray(table["defocus_1"]) + d_off
            table["defocus_2"] = np.asarray(table["defocus_2"]) + d_off
            logger.info("defocus refinement: median |Δdf| %.1f Å",
                        float(np.median(np.abs(d_off))))
        fsc_curve = np.asarray(recon.fsc)
        ref = recon.volume
        mrc.write(np.asarray(ref, dtype=np.float32),
                  maps_dir / f"{dataset}_r{cls:02d}_{it:02d}.mrc", pixel_size=pixel)
        mrc.write(np.asarray(recon.half1), maps_dir / f"{dataset}_r{cls:02d}_{it:02d}_half1.mrc", pixel_size=pixel)
        mrc.write(np.asarray(recon.half2), maps_dir / f"{dataset}_r{cls:02d}_{it:02d}_half2.mrc", pixel_size=pixel)
        cistem.write_parameters(table, maps_dir / f"{dataset}_r{cls:02d}_{it:02d}.cistem")
        if params.get("reconstruct_fbfact") and it == maxiter + 1:
            # determine-and-apply B-factor on the FINAL reconstruction
            # (reference tabs.reconstruct.fbfact, pyp_config.toml:5902):
            # Guinier fit over the refined band, negated sharpen, written
            # alongside the unsharpened map
            from pyp_tpu.postprocess.core import (guinier_bfactor,
                                                  sharpen_map)

            bfac = float(guinier_bfactor(
                np.asarray(ref, dtype=np.float32), pixel,
                max_res=max(res_a, 2.2 * pixel)))
            sharp, _ = sharpen_map(
                np.asarray(ref, dtype=np.float32), pixel, bfactor=-abs(bfac),
                resolution=res_a)
            mrc.write(np.asarray(sharp, dtype=np.float32),
                      maps_dir / f"{dataset}_r{cls:02d}_{it:02d}_sharp.mrc",
                      pixel_size=pixel)
            logger.info("fbfact: Guinier B %.1f Å² applied to final map",
                        bfac)
        np.savetxt(
            maps_dir / f"{dataset}_r{cls:02d}_{it:02d}_fsc.txt",
            np.stack([np.asarray(recon.freqs), np.asarray(recon.fsc)], 1),
            header="freq_cyc_per_px fsc",
        )
        entry = {"iteration": it, "resolution": res_a}
        if prev_poses is not None:
            # per-iteration change panels (reference generate_plots,
            # analysis/plot/core.py:557: pose deltas between consecutive
            # .par files + score histogram) + occupancy tracking
            try:
                import jax.numpy as _jnp

                from pyp_tpu.analysis import plots as _plots
                from pyp_tpu.core.geometry import euler_to_matrix as _e2m

                now = table_to_poses(table, pixel)
                Ra = np.asarray(_e2m(_jnp.asarray(prev_poses[:, 0]),
                                     _jnp.asarray(prev_poses[:, 1]),
                                     _jnp.asarray(prev_poses[:, 2])))
                Rb = np.asarray(_e2m(_jnp.asarray(now[:, 0]),
                                     _jnp.asarray(now[:, 1]),
                                     _jnp.asarray(now[:, 2])))
                tr = np.einsum("bij,bij->b", Ra, Rb)
                d_ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
                d_sh = np.hypot(now[:, 3] - prev_poses[:, 3],
                                now[:, 4] - prev_poses[:, 4])
                sc = (np.asarray(table["score"])
                      if "score" in table else np.zeros(table.n_rows))
                _plots.plot_iteration_changes(
                    d_ang, d_sh, sc,
                    maps_dir / f"{dataset}_r{cls:02d}_{it:02d}_changes.png",
                    iteration=it)
                entry["median_angular_change_deg"] = round(
                    float(np.median(d_ang)), 3)
                entry["median_shift_change_px"] = round(
                    float(np.median(d_sh)), 3)
            except (ValueError, OSError) as e:
                logger.warning("iteration-change plot skipped: %s", e)
        if "occupancy" in table:
            entry["occupancies"] = [round(
                float(np.mean(np.asarray(table["occupancy"]))), 2)]
        if params.get("model_fit"):
            # Model-fitting tab: evaluate the PDB against this iteration's
            # map (pyp_config.toml [tabs.model]); appended to
            # maps/<dataset>_model_fit.txt per iteration
            from pyp_tpu.analysis.modelfit import model_map_fit
            from pyp_tpu.io.pdb import read_pdb

            try:
                rhref_fit = float(param(params["refine_rhref"], it))
                # fit-evaluation map preparation (reference [tabs.model]
                # clip/flip/pixel/res/scale)
                fit_map = np.asarray(ref, dtype=np.float32)
                fit_pixel = float(params.get("model_pixel") or 0.0) or pixel
                if params.get("model_scale") not in (None, "", 0, 1, 1.0):
                    fit_map = fit_map * float(params["model_scale"])
                if params.get("model_flip"):
                    fit_map = fit_map[::-1].copy()
                clip = int(params.get("model_clip") or 0)
                if 0 < clip < fit_map.shape[-1]:
                    c = fit_map.shape[-1] // 2
                    lo = max(c - clip // 2, 0)
                    fit_map = fit_map[lo:lo + clip, lo:lo + clip,
                                      lo:lo + clip].copy()
                res_cap = float(params.get("model_res") or 0.0)
                fit = model_map_fit(
                    read_pdb(str(params["model_fit"])),
                    fit_map, fit_pixel,
                    low_res=float(params.get("refine_rlref") or 100.0),
                    high_res=max(rhref_fit, res_cap, 2.5 * fit_pixel),
                    extra_bfactor_a2=float(
                        params.get("model_fit_bfactor") or 100.0))
                entry["model_cc"] = round(fit["cc"], 4)
                with open(maps_dir / f"{dataset}_model_fit.txt", "a") as f:
                    f.write(f"{it} {fit['cc']:.4f} "
                            f"{' '.join(str(int(s)) for s in fit['shift_px'])}\n")
                logger.info("model fit (iter %d): cc %.3f shift %s", it,
                            fit["cc"], fit["shift_px"].tolist())
            except (OSError, ValueError) as e:
                logger.warning("model fit skipped: %s", e)
        history.append(entry)
        import json as _json

        (maps_dir / f"{dataset}_r{cls:02d}_history.json").write_text(
            _json.dumps(history))
        from pyp_tpu.stream.web import Web

        web = Web()
        if web.exists:
            web.write_reconstruction(dataset, it, res_a,
                                     fsc=np.asarray(recon.fsc).tolist())
    if params.get("refine_fmatch"):
        # matching projections at the final poses (cisTEM refine3d
        # fmatch output, SURVEY §A.1 line 43) — visual pose QC
        from pyp_tpu.ops.fourier_slice import project_real

        poses_f = table_to_poses(table, pixel)
        match = []
        for lo in range(0, table.n_rows, 512):
            hi = min(lo + 512, table.n_rows)
            match.append(np.asarray(project_real(
                np.asarray(ref, dtype=np.float32),
                poses_f[lo:hi, 0], poses_f[lo:hi, 1], poses_f[lo:hi, 2]),
                dtype=np.float32))
        mrc.write(np.concatenate(match), maps_dir / f"{dataset}_match.mrc",
                  pixel_size=pixel)
        logger.info("matching projections written to %s",
                    maps_dir / f"{dataset}_match.mrc")
    return table, ref, history


def _half_subsets(table) -> np.ndarray:
    """Half-set ids (0/1) from the table's 1-based assigned_subset column;
    rows with subset <= 0 (zero-initialized tables) get a deterministic
    even/odd assignment — a silent all-unassigned table would otherwise
    zero-weight BOTH halves and reconstruct nothing."""
    sub = np.asarray(table["assigned_subset"]).astype(np.int64) - 1
    fallback = np.arange(table.n_rows) % 2
    return np.where(sub < 0, fallback, sub)
