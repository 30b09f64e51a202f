"""Multi-reference (K-class) 3D refinement with occupancy updates.

Rebuild of the reference's 3D classification path (frealign_iterate loop
over classes r01..rNN, frealign.py:1491; occupancy updates from per-class
LogP, analysis/occupancies.py:70; per-class reconstruction / classmerge,
particle_cspt.py:1682): each iteration refines every particle against every
class reference, converts per-class scores to soft occupancies (softmax with
mixing-proportion prior), and reconstructs each class from occupancy-weighted
particles. Class axis is embarrassingly parallel (the reference runs one
classmerge job per class; here classes batch on one chip or shard across
chips).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from pyp_tpu.analysis import occupancies as occ_mod
from pyp_tpu.io import cistem, mrc
from pyp_tpu.utils import Timer, get_logger

logger = get_logger("classify3d")


def classify3d_iteration(
    stack, table: cistem.Table, references, occ, params: dict, iteration: int,
    batch: int = 256,
):
    """One K-class iteration. references: list of (n,n,n); occ: (B, K).

    Returns (table, new_references, new_occ, per-class resolutions)."""
    import jax.numpy as jnp

    from pyp_tpu.core import fsc as fsc_mod
    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.ops import refine3d
    from pyp_tpu.pipeline.refine import (
        _half_subsets,
        param, table_to_ctf_params, table_to_poses, poses_into_table,
    )

    K = len(references)
    B = table.n_rows
    pixel = float(table["pixel_size"][0]) if "pixel_size" in table else float(
        params["scope_pixel"])
    rhref = float(param(params["refine_rhref"], iteration))
    ctf_params = table_to_ctf_params(table)
    init_poses = table_to_poses(table, pixel)

    # --- refine against each class (FRM engine by default: one bank per
    # class, shared across all particle batches; the per-pose gather path
    # stays selectable with refine_engine=gather) ---------------------------
    engine = str(params.get("refine_engine") or "frm")
    # focused classification (class_focusmask "x,y,z,r" in Å — cisTEM
    # refine3d focus sphere, SURVEY §A.1 lines 29-32): classes share the
    # consensus density outside the sphere, so only the focus region
    # drives the per-class scores; reconstruction keeps the raw classes
    fm = str(params.get("class_focusmask") or "").strip()
    score_refs = references
    if fm and K > 1:
        import numpy as _np

        fx, fy, fz, fr = (float(v) for v in fm.replace(",", ":").split(":"))
        n_box = references[0].shape[-1]
        ax = _np.arange(n_box) - n_box // 2
        r2 = ((ax[:, None, None] - fz / pixel) ** 2
              + (ax[None, :, None] - fy / pixel) ** 2
              + (ax[None, None, :] - fx / pixel) ** 2)
        t = (_np.sqrt(r2) - fr / pixel) / 4.0
        sph = (1.0 - _np.clip(t, 0.0, 1.0)).astype(_np.float32)
        consensus = _np.mean(_np.stack([_np.asarray(r)
                                        for r in references]), axis=0)
        score_refs = [consensus * (1 - sph) + _np.asarray(r) * sph
                      for r in references]
    focus = refine3d.parse_focus_mask(fm) if K > 1 else None
    focused_scoring = focus is not None and bool(
        np.any(np.abs(init_poses[:, :3]) > 1e-6))
    per_class = []
    if focused_scoring:
        # focused E-step ("apply 2D masking", SURVEY §A.1 line 44): poses
        # stay at the consensus; per-class scores are masked NCCs between
        # the particle and each class's projection, BOTH cut to the
        # projection of the focus sphere — so only the density inside the
        # sphere drives the assignment. (Refining poses per class against
        # masked images is unstable — the off-center mask starves the
        # polar rings — and defeats the point: the consensus alignment is
        # the fixed frame focused classification compares classes in.)
        with Timer(f"focused classification iteration {iteration} "
                   f"({K} classes)"):
            per_class = _focused_class_scores(
                stack, init_poses, ctf_params, score_refs, focus, pixel,
                params, batch=batch)
    with Timer(f"classification iteration {iteration} ({K} classes)"):
        if focused_scoring:
            pass  # scored above at fixed poses
        elif engine == "frm":
            from pyp_tpu.ops import frm
            from pyp_tpu.ops.fourier_slice import volume_to_fourier

            n_box = stack.shape[-1]
            cfg = frm.get_config(
                n_box, pixel,
                low_res=float(params["refine_rlref"]),
                high_res=max(float(params.get("class_rhcls") or rhref),
                             2.1 * pixel),
                angular_step=float(param(
                    params.get("refine_dang") or 15.0, iteration)),
                symmetry=str(params["particle_sym"]),
                shift_extent=float(params.get("refine_searchx") or 6.0),
                shift_step=1.0,
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"]),
                amplitude_contrast=float(params["scope_wgh"]),
                wiener=float(params.get("refine_frm_wiener") or 0.1),
            )
            has_poses = bool(np.any(np.abs(init_poses[:, :3]) > 1e-6))
            cone = (float(params.get("refine_frm_cone") or 20.0)
                    if has_poses else None)
            G_pts = len(cfg.radii) * cfg.n_psi
            for k in range(K):
                bank = cfg.bank(volume_to_fourier(jnp.asarray(score_refs[k])))
                res_parts = []
                for lo in range(0, B, batch):
                    hi = min(lo + batch, B)
                    poses_k, scores_k = frm.frm_refine(
                        np.asarray(stack[lo:hi]), ctf_params[lo:hi],
                        None,
                        cfg, bank=bank,
                        init_poses=init_poses[lo:hi] if has_poses else None,
                        prior_cone_deg=cone)
                    res_parts.append(frm.to_refine_result(
                        poses_k, scores_k, n_band_points=G_pts))
                per_class.append(refine3d.RefineResult(*(
                    jnp.concatenate([getattr(r, f) for r in res_parts])
                    for f in refine3d.RefineResult._fields)))
        else:
            for k in range(K):
                res_parts = []
                for lo in range(0, B, batch):
                    hi = min(lo + batch, B)
                    res = refine3d.refine_batch(
                        jnp.asarray(stack[lo:hi]),
                        jnp.asarray(ctf_params[lo:hi]),
                        jnp.asarray(score_refs[k]), pixel,
                        mode="local", init_poses=init_poses[lo:hi],
                        low_res=float(params["refine_rlref"]),
                        high_res_refine=max(
                            float(params.get("class_rhcls") or rhref), 2.1 * pixel),
                        local_iters=int(params.get("refine_local_iters") or 16),
                        symmetry=str(params["particle_sym"]),
                        voltage_kv=float(params["scope_voltage"]),
                        cs_mm=float(params["scope_cs"]),
                        amplitude_contrast=float(params["scope_wgh"]),
                    )
                    res_parts.append(res)
                per_class.append(refine3d.RefineResult(*(
                    jnp.concatenate([getattr(r, f) for r in res_parts])
                    for f in refine3d.RefineResult._fields)))

    # --- occupancies from per-class log-likelihood proxies -----------------
    logp = np.stack([np.asarray(r.logp) for r in per_class], axis=1)  # (B, K)
    prior = occ_mod.update_average_occupancies(occ)
    occ = occ_mod.occupancies_from_logp(
        logp, prior_occ=prior,
        temperature=float(params.get("class3d_tau") or 1.0))
    # occupancy floor: keep every class minimally populated so a class
    # cannot die in one bad iteration (reference class-merge control)
    floor = float(params.get("class3d_occ_floor") or 0.0)
    if floor > 0:
        occ = np.maximum(occ, floor)
        occ = occ / occ.sum(axis=1, keepdims=True) * 100.0
    assign = occ_mod.hard_assignments(occ)

    # particle keeps the pose refined against its best class
    best = refine3d.RefineResult(*(
        jnp.stack([getattr(per_class[assign[i]], f)[i] for i in range(B)])
        for f in refine3d.RefineResult._fields
    ))
    table = poses_into_table(table, best, pixel)
    table["occupancy"] = occ[np.arange(B), assign]
    table["best_2d_class"] = assign + 1

    # --- per-class reconstruction (the classmerge jobs) --------------------
    poses = table_to_poses(table, pixel)
    subset = (
        _half_subsets(table)
        if "assigned_subset" in table else np.arange(B) % 2
    )
    from pyp_tpu.pipeline.refine import reconstruct_banded

    new_refs, resolutions = [], []
    for k in range(K):
        # band-limited per-class maps (reconstruct_banded): classification
        # only matches up to class_rhcls, and the class axis multiplies the
        # scatter-bound insertion cost K-fold
        out = reconstruct_banded(
            np.asarray(stack), poses, ctf_params, pixel,
            (max(float(params.get("class_rhcls") or rhref) * 0.8, 2.0 * pixel)
             if bool(params.get("reconstruct_crop", True)) else 2.0 * pixel),
            dict(
                subset=subset.astype(np.int32),
                weights=(occ[:, k] / 100.0).astype(np.float32),
                symmetry=str(params["particle_sym"]),
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"]),
                amplitude_contrast=float(params["scope_wgh"]),
                batch=batch,
                iewald=int(params.get("reconstruct_iewald") or 0),
            ),
            batch=batch,
        )
        new_refs.append(np.asarray(out.volume, dtype=np.float32))
        resolutions.append(float(fsc_mod.resolution_at_threshold(
            out.freqs, out.fsc, pixel, 0.143)))
    logger.info("iteration %d: class occupancies %s, resolutions %s",
                iteration, np.round(prior, 1).tolist(),
                np.round(resolutions, 2).tolist())
    return table, new_refs, occ, resolutions


def _focused_class_scores(stack, init_poses, ctf_params, score_refs, focus,
                          pixel, params, batch: int = 256):
    """Fixed-pose focused per-class scoring (cisTEM refine3d focus sphere
    + "apply 2D masking", SURVEY §A.1 lines 29-32/44): particles are
    Fourier-centered by their stored shifts, each class reference is
    projected with CTF at the consensus pose, and BOTH are cut to the
    projection of the focus sphere before a masked NCC. LogP uses the mask
    area as the effective sample count (the focused analog of the FRM
    band-point count). Returns a list of RefineResult (poses unchanged)."""
    import jax
    import jax.numpy as jnp

    from pyp_tpu.core.geometry import euler_to_matrix
    from pyp_tpu.ops import refine3d
    from pyp_tpu.ops.fourier_slice import (fourier_to_image,
                                           image_to_fourier, project,
                                           volume_to_fourier)
    from pyp_tpu.ops.reconstruct import _ctf_grids, _shift_correct

    n = stack.shape[-1]
    B = len(stack)
    K = len(score_refs)
    Frefs = [volume_to_fourier(jnp.asarray(np.asarray(r, dtype=np.float32)))
             for r in score_refs]
    # classification band (class_rlcls/class_rhcls): the masked NCC compares
    # only the resolution shells the classes are judged on — same band the
    # unfocused FRM E-step matches in
    lo_res = float(params.get("class_rlcls") or params.get("refine_rlref")
                   or 100.0)
    hi_res = max(float(params.get("class_rhcls") or 8.0), 2.1 * pixel)
    ky = np.fft.fftfreq(n) * n
    kx = np.arange(n // 2 + 1)
    kr = np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    r_lo = n * pixel / lo_res
    r_hi = n * pixel / hi_res
    band = jnp.asarray(((kr >= r_lo) & (kr <= r_hi)).astype(np.float32))
    # masks in the CENTERED frame (shifts zeroed: the images are centered
    # below, so the mask follows only the pose rotation)
    poses_c = np.asarray(init_poses, dtype=np.float32).copy()
    poses_c[:, 3:5] = 0.0

    @jax.jit
    def _score(xs, cp, poses_b, Fref, masks):
        Xc = _shift_correct(image_to_fourier(xs), poses_b[:, 3:5], n)
        imgs_c = fourier_to_image(Xc * band, n)
        R = euler_to_matrix(poses_b[:, 0], poses_b[:, 1], poses_b[:, 2])
        ctfs = _ctf_grids(n, pixel, cp,
                          float(params["scope_voltage"]),
                          float(params["scope_cs"]),
                          float(params["scope_wgh"]))
        proj = fourier_to_image(project(Fref, R, n) * ctfs * band, n)
        xm = imgs_c * masks
        pm = proj * masks
        area = jnp.sum(masks, axis=(1, 2)) + 1e-6
        xm = xm - (jnp.sum(xm, axis=(1, 2)) / area)[:, None, None] * masks
        pm = pm - (jnp.sum(pm, axis=(1, 2)) / area)[:, None, None] * masks
        num = jnp.sum(xm * pm, axis=(1, 2))
        den = (jnp.sqrt(jnp.sum(xm * xm, axis=(1, 2)))
               * jnp.sqrt(jnp.sum(pm * pm, axis=(1, 2))) + 1e-9)
        return num / den, area

    out = []
    for k in range(K):
        sc_parts, ar_parts = [], []
        for lo in range(0, B, batch):
            hi = min(lo + batch, B)
            masks = refine3d.focus_mask_2d(poses_c[lo:hi], focus, n, pixel)
            s, a = _score(jnp.asarray(np.asarray(stack[lo:hi])),
                          jnp.asarray(ctf_params[lo:hi]),
                          jnp.asarray(np.asarray(init_poses[lo:hi],
                                                 dtype=np.float32)),
                          Frefs[k], masks)
            sc_parts.append(np.asarray(s))
            ar_parts.append(np.asarray(a))
        scores = np.clip(np.concatenate(sc_parts), -1.0, 1.0)
        area = np.concatenate(ar_parts)
        sigma = np.sqrt(np.maximum(1.0 - scores**2, 1e-6))
        logp = -0.5 * area * np.log(np.maximum(sigma, 1e-6))
        p = np.asarray(init_poses, dtype=np.float32)
        out.append(refine3d.RefineResult(
            phi=jnp.asarray(np.mod(p[:, 0], 360.0)),
            theta=jnp.asarray(np.mod(p[:, 1], 360.0)),
            psi=jnp.asarray(np.mod(p[:, 2], 360.0)),
            shift_y=jnp.asarray(p[:, 3]), shift_x=jnp.asarray(p[:, 4]),
            score=jnp.asarray(scores * 100.0),
            logp=jnp.asarray(logp),
            sigma=jnp.asarray(sigma)))
    return out


def classify3d_loop(stack, table, initial_model, params, work_dir=".",
                    dataset="dataset"):
    """K-class classification: seed classes by jittered occupancies of the
    common initial model, iterate refinement/occupancy/reconstruction, write
    per-class maps (maps/<dataset>_rKK_II.mrc)."""
    K = int(params.get("class_num") or 1)
    B = table.n_rows
    maps_dir = Path(work_dir) / "maps"
    maps_dir.mkdir(parents=True, exist_ok=True)
    pixel = float(params["scope_pixel"])
    maxiter = int(params.get("class3d_iters") or 0) or \
        int(params["refine_maxiter"])
    start = int(params.get("refine_iter") or 2)

    # resume: a previous classification table restores occupancies and
    # assignments unless class3d_force_init discards them (the reference
    # classification block's force_init switch)
    occ = None
    if not params.get("class3d_force_init"):
        prev = sorted(maps_dir.glob(f"{dataset}_classes_*.cistem"))
        if prev:
            t_prev = cistem.read_parameters(prev[-1])
            if (t_prev.n_rows == B and "occupancy" in t_prev
                    and "best_2d_class" in t_prev):
                assign = np.clip(np.asarray(
                    t_prev["best_2d_class"]).astype(int) - 1, 0, K - 1)
                o = np.asarray(t_prev["occupancy"], dtype=np.float64)
                occ = np.full((B, K), 1.0)
                occ[np.arange(B), assign] = np.maximum(o, 1.0)
                occ = occ / occ.sum(axis=1, keepdims=True) * 100.0
                logger.info("resuming classification from %s", prev[-1].name)
    if occ is None:
        occ = occ_mod.classification_initialization(B, K, seed=0)
    # seed class references with occupancy-jittered weighted reconstructions
    # (classification_initialization semantics, occupancies.py:324): each
    # seed is biased toward a random particle subset, so the seeds differ
    # exactly where the underlying states differ — structured symmetry
    # breaking the E-step can amplify. (Voxel-noise jitter does not work:
    # with near-identical references the per-class scores tie and the
    # occupancy feedback loop never engages.)
    from pyp_tpu.pipeline.refine import table_to_ctf_params, table_to_poses

    init_poses = table_to_poses(table, pixel)
    if np.any(np.abs(init_poses[:, :3]) > 1e-6):
        from pyp_tpu.ops import reconstruct as rec

        ctf_params = table_to_ctf_params(table)
        refs = []
        for k in range(K):
            out = rec.reconstruct(
                np.asarray(stack), init_poses, ctf_params, pixel,
                weights=(occ[:, k] / 100.0).astype(np.float32),
                symmetry=str(params["particle_sym"]),
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"]),
                amplitude_contrast=float(params["scope_wgh"]),
                iewald=int(params.get("reconstruct_iewald") or 0),
            )
            refs.append(np.asarray(out.volume, dtype=np.float32))
    else:  # no consensus alignment: fall back to jittered initial model
        rng = np.random.RandomState(1)
        r0 = np.asarray(initial_model, dtype=np.float32)
        refs = [r0 + rng.normal(0, 0.02 * (np.abs(r0).max() + 1e-6),
                                r0.shape).astype(np.float32)
                for _ in range(K)]

    history = []
    for it in range(start, maxiter + 2):
        table, refs, occ, resolutions = classify3d_iteration(
            stack, table, refs, occ, params, it)
        for k, (r, res) in enumerate(zip(refs, resolutions)):
            mrc.write(r, maps_dir / f"{dataset}_r{k + 1:02d}_{it:02d}.mrc",
                      pixel_size=pixel)
        cistem.write_parameters(table, maps_dir / f"{dataset}_classes_{it:02d}.cistem")
        history.append({
            "iteration": it, "resolutions": resolutions,
            "occupancy": occ.mean(axis=0).tolist(),
        })
    if params.get("plot_per_item", True) and history:
        # occupancy-vs-iteration panel (reference occ plots in classmerge)
        try:
            from pyp_tpu.analysis.plots import plot_occupancy_history

            plot_occupancy_history(
                history, maps_dir / f"{dataset}_occupancy.png")
        except (OSError, ValueError) as e:
            logger.warning("occupancy plot skipped: %s", e)
        (maps_dir / f"{dataset}_history.json").write_text(
            json.dumps(history))
    return table, refs, occ, history
