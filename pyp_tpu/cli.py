"""Command-line driver — the bin/run/pyp equivalent.

Mode dispatch mirrors the reference's env-var dispatched driver
(bin/run/pyp:4685-7020) as subcommands:

  pyp_tpu spr     -data_path "movies/*.mrc" ...   # SPA preprocessing swarm
  pyp_tpu tomo    ...                             # tilt-series swarm
  pyp_tpu extract ...                             # build particle stack
  pyp_tpu refine  -refine_maxiter 5 ...           # 3D refinement loop
  pyp_tpu classify2d -class_num 50 ...            # 2D classification
  pyp_tpu postprocess ...                         # masking/sharpening/FSC
  pyp_tpu worker  payload.json                    # SLURM array element entry

State persists in the project directory (.pyp_tpu_config.toml + per-item
metadata bundles), so re-running a mode resumes.
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

import numpy as np

from pyp_tpu.config import params as cfg
from pyp_tpu.utils import get_logger

logger = get_logger("cli")

MODES = ("spr", "tomo", "extract", "refine", "classify2d", "classify3d",
         "csp", "polish", "postprocess", "import_star", "export_star",
         "clean", "worker", "params", "gain", "stream", "kselection",
         "byp", "mine", "mask", "tomoedit", "boxedit", "sprtrain",
         "tomotrain", "heterogeneity", "sva", "export_session", "filter",
         "prism", "workflow", "report", "fsc")


def _project_params(argv, work_dir=".", persist=True):
    # nextPYP project-file interop: a reference `.pyp_config.toml` in the
    # project dir seeds the parameter namespace when this framework's own
    # project file does not exist yet (first run inside an existing
    # nextPYP project) — known ids load, external-tool ids are tolerated,
    # recognized-but-unconsumed ids warn (config.params.load_reference_config)
    ref_cfg = Path(work_dir) / ".pyp_config.toml"
    if ref_cfg.exists() and not (Path(work_dir) / cfg.PROJECT_FILE).exists():
        ref_params, report = cfg.load_reference_config(ref_cfg)
        logger.info("imported nextPYP project config: %d loaded / %d "
                    "tolerated / %d unimplemented / %d unknown",
                    len(report["loaded"]), len(report["tolerated"]),
                    len(report["unimplemented"]), len(report["unknown"]))
        if persist:
            cfg.save_parameters(ref_params, work_dir)
    overrides = cfg.parse_arguments(argv)
    # an argument is explicit iff its flag appears on the command line —
    # value-vs-default comparison would let a stale saved project value
    # silently override e.g. `-tomo_spk_method none` (the schema default)
    given = {a.lstrip("-").split("=")[0] for a in argv if a.startswith("-")}
    defaults = cfg.defaults()
    explicit = {
        k: v for k, v in overrides.items()
        if k in given or defaults.get(k) != v
    }
    from pyp_tpu.config.blocks import apply_reference_aliases

    if not persist:
        # one-shot modes (edits): apply without writing to the project
        # config, so e.g. -edit_remove_circle can't replay on the next run
        saved = {**defaults, **(cfg.load_parameters(work_dir) or {})}
        saved.update(explicit)
        return apply_reference_aliases(saved)
    # reference-spelled ids (metric_*, sharpen_cistem_*, sharpen_relion_*,
    # dose_weighting_*, class2d_* aliases) land on their engine targets
    # AFTER persistence, so the project file keeps the user's spelling
    return apply_reference_aliases(cfg.update_parameters(work_dir, explicit))


def _discover_items(params):
    pattern = params.get("data_path") or ""
    suffix = str(params.get("data_suffix") or "")
    items = []
    for path in sorted(glob.glob(pattern)):
        if suffix and suffix not in Path(path).name:
            continue
        items.append({"name": Path(path).stem, "path": path})
    # separate mdoc glob (reference data_path_mdoc): tomo sessions whose
    # .mdoc files live apart from the frame movies
    mdoc_glob = str(params.get("data_path_mdoc") or "")
    if mdoc_glob:
        have = {i["name"] for i in items}
        for path in sorted(glob.glob(mdoc_glob)):
            name = Path(path).stem.replace(".mrc", "")
            if name not in have:
                items.append({"name": name, "path": path})
    # saved filter selection (the reference's table-view Filters,
    # docs/guide/filters.rst): keep only items the filter kept
    sel = str(params.get("filter_sel") or "")
    if sel:
        from pyp_tpu.analysis.filters import load_selection

        # same fallback as mode_filter's save path
        keep = load_selection(sel, ".",
                              str(params.get("data_set") or "dataset"))
        items = [it for it in items if it["name"] in keep]
    # dataset subsetting (large-project splits): process [first, last)
    first = int(params.get("data_first_item") or 0)
    last = int(params.get("data_last_item") or -1)
    if first or last >= 0:
        items = items[first:(None if last < 0 else last)]
    return items


def _maybe_slurm_swarm(mode, argv, params, items):
    """Route per-item modes through SLURM when -slurm_* selects it:
    emit/submit the array + dependent merge and return its report (the
    merge element re-runs the mode, whose resume-aware stages reduce)."""
    from pyp_tpu.sched import bridge

    if not bridge.slurm_requested(params):
        return None
    report = bridge.submit_swarm(mode, items, params, argv)
    print(json.dumps(report, indent=1))
    return 0


def mode_spr(argv):
    params = _project_params(argv)
    items = _discover_items(params)
    if not items:
        logger.error("no input files match data_path=%r", params.get("data_path"))
        return 1
    rc = _maybe_slurm_swarm("spr", argv, params, items)
    if rc is not None:
        return rc
    from pyp_tpu.pipeline import spr
    from pyp_tpu.sched import JobGraph, LocalExecutor

    graph = JobGraph("spr")
    graph.swarm(
        "sprswarm", items,
        work_fn=lambda item: spr.process_micrograph(item, params),
        merge_fn=lambda results, missing: spr.spr_merge(results, missing),
        max_retries=int(params.get("slurm_retries") or 2),
        merge_retries=int(params.get("slurm_merge_retries") or 2),
    )
    # intra-node worker pool (the reference's joblib-over-cpus, mpi.py:44)
    LocalExecutor(max_workers=int(params.get("slurm_local_tasks") or 0)
                  or int(params.get("slurm_tasks") or 1)).run(graph)
    merge = graph.jobs["sprswarm.merge"]
    if merge.status == "done" and params.get("prism_enable"):
        # prism tab enable card: quality assessment runs as part of
        # preprocessing (scores land in metadata for the filter mode)
        logger.info("prism_enable: scoring micrograph quality")
        mode_prism([])
    print(json.dumps(merge.result, indent=1, default=str))
    return 0 if merge.status == "done" else 1


def mode_tomo(argv):
    params = _project_params(argv)
    items = _discover_items(params)
    if not items:
        logger.error("no input files match data_path=%r", params.get("data_path"))
        return 1
    rc = _maybe_slurm_swarm("tomo", argv, params, items)
    if rc is not None:
        return rc
    from pyp_tpu.io import mrc
    from pyp_tpu.pipeline import tomo as tomo_pipe
    from pyp_tpu.sched import JobGraph, LocalExecutor

    def load_item(item):
        if str(item["path"]).endswith(".mdoc"):
            # raw-movie ingestion: per-tilt frame alignment + assembly
            item.update(tomo_pipe.assemble_tilt_series(item["path"], params))
            return tomo_pipe.process_tilt_series(item, params)
        # pre-assembled stack; tilt angles from a sidecar .tlt/.rawtlt
        for ext in (".tlt", ".rawtlt"):
            tlt = Path(item["path"]).with_suffix(ext)
            if tlt.exists():
                item["angles"] = np.loadtxt(tlt)
                break
        else:
            n = mrc.read_header(item["path"]).nz
            item["angles"] = np.linspace(-60, 60, n)
        return tomo_pipe.process_tilt_series(item, params)

    graph = JobGraph("tomo")
    graph.swarm(
        "tomoswarm", items, work_fn=load_item,
        merge_fn=lambda results, missing: tomo_pipe.tomo_merge(results, missing),
    )
    LocalExecutor(max_workers=int(params.get("slurm_local_tasks") or 0)
                  or int(params.get("slurm_tasks") or 1)).run(graph)
    merge = graph.jobs["tomoswarm.merge"]
    print(json.dumps(merge.result, indent=1, default=str))
    return 0 if merge.status == "done" else 1


def mode_extract(argv):
    params = _project_params(argv)
    from pyp_tpu.pipeline import spr

    names = sorted(
        p.name.replace(".meta.npz", "") for p in Path(".").glob("*.meta.npz")
    )
    stack, table = spr.extract_stack([{"name": n} for n in names], params)
    if stack is None:
        logger.error("no picked particles found in project dir")
        return 1
    print(json.dumps({"particles": len(stack), "stack": "stack.mrc"}))
    return 0


def mode_refine(argv):
    params = _project_params(argv)
    from pyp_tpu.sched import bridge

    if bridge.slurm_requested(params):
        # multi-host refinement: one sbatch, slurm_nodes ranks joined into
        # a jax.distributed mesh via PYP_TPU_COORDINATOR/NUM_PROCS/PROC_ID
        script = bridge.write_distributed_refine_script(
            params, int(params.get("slurm_nodes") or 1), "refine",
            bridge.strip_slurm_flags(argv))
        ex = bridge.select_executor(params)[1]
        jid = ex.sbatch(script)
        print(json.dumps({"script": str(script), "job_id": jid}))
        return 0
    from pyp_tpu.io import cistem, mrc
    from pyp_tpu.pipeline import refine as ref_pipe

    stack = mrc.read("stack.mrc").astype(np.float32)
    table = cistem.read_parameters("stack.cistem")
    n = stack.shape[-1]
    # initial reference: -model_path, then project-local initial_model.mrc,
    # then ab initio / featureless sphere (the reference's precedence)
    model_path = Path(params.get("model_path") or "initial_model.mrc")
    init_path = model_path if model_path.exists() else Path("initial_model.mrc")
    if init_path.exists():
        initial = mrc.read(init_path).astype(np.float32)
    elif params.get("refine_abinit") and not params.get("abinit_skip"):
        # marginalized ab initio from scratch (create_initial_model role)
        from pyp_tpu.ops.ab_initio import ab_initio_frm
        from pyp_tpu.pipeline.refine import table_to_ctf_params

        logger.info("no initial_model.mrc: running marginalized ab initio")
        if str(params.get("abinit_engine") or "frm") == "classic":
            # stochastic-subset annealing engine (the original SGD-style
            # path; frm is the production default)
            from pyp_tpu.ops.ab_initio import ab_initio

            initial, _poses = ab_initio(
                stack, table_to_ctf_params(table),
                float(params["scope_pixel"]),
                symmetry=str(params["particle_sym"]),
                n_rounds=int(params.get("abinit_rounds") or 10),
                start_res=float(params.get("abinit_start_res") or 40.0),
                end_res=float(params.get("abinit_end_res") or 12.0),
                angular_step=float(params.get("abinit_angular_step")
                                   or 15.0),
                subset_frac=float(params.get("abinit_subset_frac") or 0.5),
                anneal=float(params.get("abinit_anneal") or 0.0),
                seed=int(params.get("abinit_seed") or 0),
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"]),
                amplitude_contrast=float(params["scope_wgh"]),
            )
        else:
            initial, _poses = ab_initio_frm(
                stack, table_to_ctf_params(table),
                float(params["scope_pixel"]),
                symmetry=str(params["particle_sym"]),
                n_rounds=int(params.get("abinit_rounds") or 10),
                start_res=float(params.get("abinit_start_res") or 40.0),
                end_res=float(params.get("abinit_end_res") or 12.0),
                angular_step=float(params.get("abinit_angular_step")
                                   or 15.0),
                top_t=int(params.get("abinit_top_t") or 8),
                beta0=float(params.get("abinit_beta0") or 20.0),
                beta_growth=float(params.get("abinit_beta_growth") or 1.4),
                hard_rounds=int(params.get("abinit_hard_rounds") or 3),
                polish_rounds=int(params.get("abinit_polish_rounds") or 2),
                seed=int(params.get("abinit_seed") or 0),
                soft_shifts=str(params.get("abinit_soft_shifts") or "zero"),
                seed_particles=int(params.get("abinit_random_particles")
                                   or 8),
                random_skip_ratio=float(
                    params.get("abinit_random_skip_ratio") or 0.0),
                voltage_kv=float(params["scope_voltage"]),
                cs_mm=float(params["scope_cs"]),
                amplitude_contrast=float(params["scope_wgh"]),
            )
        mrc.write(initial, "initial_model.mrc",
                  pixel_size=float(params["scope_pixel"]))
    else:
        # featureless sphere initial model (the reference's fallback)
        from pyp_tpu.core.filters import soft_spherical_mask

        initial = np.asarray(soft_spherical_mask(n, n * 0.3, 5.0), dtype=np.float32)
    dataset = params.get("data_set") or "dataset"
    table, final, history = ref_pipe.refine_loop(
        stack, table, initial, params, dataset=dataset,
    )
    print(json.dumps({"iterations": history}, default=str))
    return 0


def mode_classify2d(argv):
    params = _project_params(argv)
    from pyp_tpu.io import cistem, mrc
    from pyp_tpu.ops import refine2d
    from pyp_tpu.pipeline.refine import table_to_ctf_params

    stack = mrc.read("stack.mrc").astype(np.float32)
    table = cistem.read_parameters("stack.cistem")
    if params.get("class2d_staged"):
        # the reference's three-phase class2d protocol (ab initio ->
        # seeded -> refinement over growing subsets, [tabs.class2d])
        res = refine2d.classify2d_staged(
            stack, table_to_ctf_params(table), params,
            float(params["scope_pixel"]),
            voltage_kv=float(params["scope_voltage"]),
            cs_mm=float(params["scope_cs"]),
            amplitude_contrast=float(params["scope_wgh"]),
        )
    else:
        res = refine2d.classify2d(
            stack, table_to_ctf_params(table),
            int(params.get("class_num") or 10),
            float(params["scope_pixel"]),
            iters=int(params.get("class_2d_iters") or 10),
            high_res=float(params.get("class_rhcls") or 10.0),
            low_res=float(params.get("class_rlcls") or 100.0),
            shift_extent=float(params.get("class_shift") or 5.0),
            shift_step=float(params.get("class_shift_step") or 2.0),
            psi_step=float(params.get("class_psi_step") or 15.0),
            seed=int(params.get("class_seed") or 0),
            engine=str(params.get("class_engine") or "polar"),
            wiener=float(params.get("class_wiener") or 10.0),
            voltage_kv=float(params["scope_voltage"]),
            cs_mm=float(params["scope_cs"]),
            amplitude_contrast=float(params["scope_wgh"]),
        )
    mrc.write(np.asarray(res.class_avgs), "classes_2d.mrc",
              pixel_size=float(params["scope_pixel"]))
    table["best_2d_class"] = np.asarray(res.assignments) + 1
    cistem.write_parameters(table, "stack.cistem")
    print(json.dumps({
        "classes": int(res.class_avgs.shape[0]),
        "occupancy": np.asarray(res.occupancy).tolist(),
    }))
    return 0


def _csp_load_item(item, params):
    """Load one tilt-series' data + picks for a CSP pass. Returns
    (item2 dict, meta, params-with-spin-default, nz) or None if the series
    has no usable metadata/picks."""
    from pyp_tpu.io import mrc
    from pyp_tpu.io.metadata import ItemMetadata

    meta = ItemMetadata(item["name"], ".", mode="tomo").load()
    if not (meta.exists() and "box" in meta and "tlt" in meta):
        logger.warning("skipping %s: no tomo metadata/picks", item["name"])
        return None
    tilts = mrc.read(item["path"]).astype(np.float32)
    binning = float(meta.scalars.get("binning", 1.0))
    picks = meta["box"][:, :3] * binning  # unbinned voxel coords (z, y, x)
    nz = float(params.get("tomo_rec_thickness") or tilts.shape[-1])
    center = np.array([nz / 2, tilts.shape[-2] / 2, tilts.shape[-1] / 2])
    coords = picks - center
    pf = str(params.get("csp_parfile") or "")
    ext_eulers = None
    if pf:
        # external parameter-table initialization (reference csp block
        # `parfile` field): per-series <dir>/<name>.cistem or a single
        # table file; its refined eulers seed this pass
        from pyp_tpu.io import cistem as _cistem

        cand = Path(pf)
        if cand.is_dir():
            cand = cand / f"{item['name']}.cistem"
        if cand.exists():
            t = _cistem.read_parameters(cand)
            if t.n_rows == len(coords):
                ext_eulers = np.stack(
                    [t["phi"], t["theta"], t["psi"]], 1).astype(np.float32)
            else:
                logger.warning(
                    "csp_parfile %s: %d rows vs %d picks — ignored",
                    cand, t.n_rows, len(coords))
    if ext_eulers is not None:
        eulers = ext_eulers
    elif "spk_eulers" in meta and len(meta["spk_eulers"]) == len(coords):
        # surface-normal orientation priors (membrane-perpendicular
        # spikes, reference detect_particles_from_surface); the spin about
        # the spike axis is free — turn on the exhaustive spin ring unless
        # the user set a step explicitly
        eulers = np.asarray(meta["spk_eulers"], dtype=np.float32)
        if not float(params.get("csp_spin_search") or 0.0):
            params = {**params, "csp_spin_search": 15.0}
    elif params.get("tomo_pick_rand", True):
        rng = np.random.RandomState(abs(hash(item["name"])) % (2**31))
        eulers = rng.uniform(0, 360, (len(coords), 3)).astype(np.float32)
    else:
        # tomo_pick rand=false: deterministic zero-euler init (the
        # reference's no-randomization card) — the spin/grid searches do
        # the orientation work
        eulers = np.zeros((len(coords), 3), dtype=np.float32)
    item2 = {"name": item["name"], "tilts": tilts, "coords": coords,
             "eulers": eulers, "angles": meta["tlt"]}
    return item2, meta, params, nz


def _csp_post_series(name, tilts, refined, meta, params, nz):
    """Post-refinement per-series exports (ArtiaX ministar, tilt stacks)."""
    from pyp_tpu.io.metadata import ItemMetadata

    if params.get("export_artiax", True):
        # per-series "ministar" for ChimeraX/ArtiaX mapped-back display
        # (reference generate_ministar, inout/metadata/core.py:3139)
        from pyp_tpu.io.relion_tomo import export_artiax_star

        meta2 = ItemMetadata(name, ".", mode="tomo").load()
        tb = max(1, int(params.get("tomo_rec_binning") or 8))
        rec_shape = (int(nz) // tb, tilts.shape[-2] // tb,
                     tilts.shape[-1] // tb)
        export_artiax_star(
            name, np.asarray(refined.particle_pos),
            np.asarray(refined.particle_eulers), rec_shape, tb,
            Path("artiax") / f"{name}_K1.star",
            scores=(meta2["csp_scores"] if "csp_scores" in meta2 else None))
    if params.get("csp_save_stacks"):
        # per-particle tilt stacks at refined geometry (the reference's
        # Extraction "Save particle stacks" feeding tomoDRGN,
        # docs/guide/tomodrgn.rst) -> stacks/<name>_stack.npz
        _export_tilt_stacks(name, tilts, refined, meta, params)


def _csp_one_series(item, params, ref):
    """cspswarm element: one tilt-series refinement + accumulator dump to
    disk (the reference's per-series csp job writing dump files that
    cspmerge later sums, SURVEY §3.4)."""
    from pyp_tpu.ops.reconstruct import save_accumulators
    from pyp_tpu.pipeline import csp as csp_pipe

    dump = Path("swarm") / f"{item['name']}.acc.npz"
    if params.get("csp_resume") and dump.exists():
        # stage-level idempotency (reference csp block `resume`): a series
        # whose accumulator dump survives is not re-refined
        logger.info("csp %s: resume — reusing %s", item["name"], dump)
        return {"name": item["name"], "dump": str(dump), "resumed": True}
    loaded = _csp_load_item(item, params)
    if loaded is None:
        return None
    item2, meta, params, nz = loaded
    tilts = item2["tilts"]
    refined, acc, scores = csp_pipe.csp_swarm_one(item2, params, ref, ".")
    dump = Path("swarm") / f"{item['name']}.acc.npz"
    dump.parent.mkdir(exist_ok=True)
    save_accumulators(acc, dump)
    _csp_post_series(item["name"], tilts, refined, meta, params, nz)
    logger.info("csp %s: scores %s", item["name"],
                [round(s, 3) for s in scores])
    return {"name": item["name"], "dump": str(dump),
            "particles": int(len(item2["coords"]))}


def _csp_series_batch(group, params, ref):
    """cspswarm bundle: a BATCH of tilt-series refined in one fused TPU
    dispatch (pipeline.csp.csp_swarm_batch) with their accumulators chained
    into one dump — the TPU-native replacement for the reference's
    tasks_per_arr bundling (jobs.py:137-170): instead of packing serial
    commands into one array element, the chip packs series into one
    compiled program."""
    from pyp_tpu.ops.reconstruct import save_accumulators
    from pyp_tpu.pipeline import csp as csp_pipe

    loaded = [(_csp_load_item(it, params), it) for it in group]
    usable = [(l, it) for l, it in loaded if l is not None]
    if not usable:
        return None
    items2 = [l[0] for l, _ in usable]
    # spin default: any series with orientation priors turns the ring on
    # for the whole batch (one compiled schedule per batch)
    batch_params = params
    for l, _ in usable:
        if l[2] is not params:
            batch_params = l[2]
            break
    refined_list, acc, scores_list, _pscores = csp_pipe.csp_swarm_batch(
        items2, batch_params, ref, ".")
    first = usable[0][1]["name"]
    dump = Path("swarm") / f"{first}.batch.acc.npz"
    dump.parent.mkdir(exist_ok=True)
    save_accumulators(acc, dump)
    total = 0
    for (l, it), refined, scores in zip(usable, refined_list, scores_list):
        item2, meta, p2, nz = l
        _csp_post_series(it["name"], item2["tilts"], refined, meta,
                         batch_params, nz)
        logger.info("csp %s: scores %s", it["name"],
                    [round(s, 3) for s in scores])
        total += len(item2["coords"])
    return {"name": first, "dump": str(dump), "particles": int(total),
            "series": [it["name"] for _, it in usable]}


def _export_tilt_stacks(name, tilts, refined, meta, params):
    """Window every particle in every tilt at the refined geometry and save
    (stacks, poses, ctf, weights) for tilt-aware heterogeneity training."""
    import jax.numpy as jnp

    from pyp_tpu.core.geometry import matrix_to_euler
    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops.extract import window_particles

    T, ny, nx = tilts.shape
    box = int(params.get("csp_box") or 64)
    pixel = float(params["scope_pixel"])
    R_eff = np.asarray(csp_ops.effective_rotations(refined))   # (T, P, 3, 3)
    pred = np.asarray(csp_ops.project_positions(refined))      # (T, P, 2)
    depth = np.asarray(csp_ops.particle_depth(refined))        # (T, P)
    P = pred.shape[1]
    center = np.array([ny // 2, nx // 2])
    defocus = (np.asarray(meta["ctf"][:, :2], dtype=np.float32)
               if "ctf" in meta else np.full((T, 2), 20000.0, np.float32))

    stacks = np.zeros((P, T, box, box), dtype=np.float32)
    poses = np.zeros((P, T, 5), dtype=np.float32)
    ctf = np.zeros((P, T, 4), dtype=np.float32)
    phi, theta, psi = matrix_to_euler(jnp.asarray(R_eff))
    eulers = np.stack([np.asarray(phi), np.asarray(theta),
                       np.asarray(psi)], -1)                   # (T, P, 3)
    for t in range(T):
        ci = np.round(pred[t] + center).astype(np.int32)
        win = np.asarray(window_particles(
            jnp.asarray(tilts[t]), jnp.asarray(ci), box))
        stacks[:, t] = win
        # effective window center EXACTLY as window_particles clamps it
        starts = np.clip(ci - box // 2, 0, [ny - box, nx - box])
        resid = (pred[t] + center) - (starts + box // 2)
        poses[:, t, :3] = eulers[t]
        # pose-shift convention: stored shift s centers content sitting at
        # offset -s (reconstruct._shift_correct applies e^{-i phi(s)}), so
        # content at +resid needs s = -resid
        poses[:, t, 3:5] = -resid                              # (sy, sx)
        df = 0.5 * (defocus[t, 0] + defocus[t, 1]) + depth[t] * pixel
        ctf[:, t, 0] = df
        ctf[:, t, 1] = df
    out = Path("stacks")
    out.mkdir(exist_ok=True)
    np.savez_compressed(
        out / f"{name}_stack.npz", stacks=stacks, poses=poses, ctf=ctf,
        weights=np.ones((P, T), dtype=np.float32))
    logger.info("saved %d tilt stacks for %s", P, name)


def mode_csp(argv):
    """CSPT refinement over preprocessed tilt-series: the cspswarm ->
    cspmerge job graph (per-series refinement + accumulator dumps, then one
    merge summing the dumps — the reference's split/swarm/merge shape with
    retries and missing-item tolerance)."""
    params = _project_params(argv)
    from pyp_tpu.config.blocks import apply_block_overrides
    from pyp_tpu.io import mrc
    from pyp_tpu.ops.reconstruct import load_accumulators
    from pyp_tpu.pipeline import csp as csp_pipe
    from pyp_tpu.sched import JobGraph, LocalExecutor

    if not params.get("csp_parfile") and params.get("csp_parfile_tomo"):
        # csp_tomo_free's tomography parfile feeds the same init path
        params = {**params, "csp_parfile": params["csp_parfile_tomo"]}
    block = str(params.get("csp_block") or "")
    if block:
        # per-block stage overrides (reference [tabs.csp_tomo_*] munging,
        # bin/run/pyp:5254-5420): the block tab's values land in the
        # engine namespace before any pipeline code reads it
        params = apply_block_overrides(params, block)
        logger.info("csp block %s: modes %s", block,
                    params.get("csp_refine_modes"))
    items = _discover_items(params)
    rc = _maybe_slurm_swarm("csp", argv, params, items)
    if rc is not None:
        return rc
    ref_path = Path(str(params.get("csp_reference_model") or "")
                    or "initial_model.mrc")
    if not ref_path.exists():
        logger.error("csp needs %s (reference map)", ref_path)
        return 1
    ref = mrc.read(ref_path).astype(np.float32)
    box = int(params.get("csp_box") or ref.shape[-1])

    def merge_fn(results, missing):
        # results: dict[job_name -> per-series summary (or None if skipped)]
        accs = [load_accumulators(r["dump"]) for r in results.values() if r]
        if not accs:
            raise RuntimeError("no tilt-series with picks found")
        out, res = csp_pipe.csp_merge(accs, box, params, ".",
                                      params.get("data_set") or "dataset")
        return {"resolution": res, "series": len(accs), "missing": missing}

    graph = JobGraph("csp")
    # fused series batching: group B series per dispatch (csp_swarm_batch)
    # unless a per-series-only path is requested (patch grids, frame
    # refinement) — those keep per-series control flow
    bsz = int(params.get("csp_batch_series") or 1)
    grid_str = str(params.get("csp_Grid") or "").strip()
    has_grid = bool(grid_str) and np.prod(
        [int(v) for v in grid_str.replace(",", ":").split(":")]) > 1
    batchable = (bsz > 1 and not params.get("csp_frames") and not has_grid)
    if batchable and len(items) > 1:
        groups = [items[i:i + bsz] for i in range(0, len(items), bsz)]
        graph.swarm(
            "cspswarm", groups,
            work_fn=lambda group: _csp_series_batch(group, params, ref),
            merge_fn=merge_fn,
            max_retries=int(params.get("slurm_retries") or 2),
            merge_retries=int(params.get("slurm_merge_retries") or 2),
        )
    else:
        graph.swarm(
            "cspswarm", items,
            work_fn=lambda item: _csp_one_series(item, params, ref),
            merge_fn=merge_fn,
            max_retries=int(params.get("slurm_retries") or 2),
            merge_retries=int(params.get("slurm_merge_retries") or 2),
        )
    LocalExecutor(max_workers=int(params.get("slurm_local_tasks") or 0)
                  or int(params.get("slurm_tasks") or 1)).run(graph)
    merge = graph.jobs["cspswarm.merge"]
    print(json.dumps(merge.result, indent=1, default=str))
    return 0 if merge.status == "done" else 1


def mode_polish(argv):
    """Per-particle movie refinement: re-extract particles from raw frames
    at drift-corrected positions, refine per-frame trajectories against the
    latest map, and rebuild the stack dose-weighted (the reference's movie
    refinement / csp frame mode)."""
    params = _project_params(argv)
    from pyp_tpu.io import cistem, mrc
    from pyp_tpu.io.metadata import ItemMetadata
    from pyp_tpu.ops import polish as polish_ops
    from pyp_tpu.pipeline.refine import table_to_ctf_params, table_to_poses
    from pyp_tpu.pipeline.spr import apply_gain, load_movie

    table = cistem.read_parameters("stack.cistem")
    dataset = params.get("data_set") or "dataset"
    maps = sorted(Path("maps").glob(f"{dataset}_r??_??.mrc"))
    if not maps:
        logger.error("polish needs refined maps under maps/")
        return 1
    ref = mrc.read(maps[-1]).astype(np.float32)
    pixel = float(params["scope_pixel"])
    box = int(params["extract_box"])
    films = np.asarray(table["particle_group"]).astype(int)
    items = _discover_items(params)
    poses = table_to_poses(table, pixel)
    ctf = table_to_ctf_params(table)
    new_stack = np.array(mrc.read("stack.mrc"), dtype=np.float32, copy=True)
    n_polished = 0
    for film, item in enumerate(items, start=1):
        sel = np.where(films == film)[0]
        meta = ItemMetadata(item["name"], ".", mode="spr").load()
        if len(sel) == 0 or "box" not in meta:
            continue
        frames = apply_gain(load_movie(item["path"]), params)
        coords = meta["box"][:, :2].astype(np.int32)[: len(sel)]
        drift = meta["drift"] if "drift" in meta else None
        stack_p, traj = polish_ops.polish(
            frames, coords, poses[sel], ctf[sel], ref, pixel, box,
            global_shifts=drift,
            reg_weight=float(params.get("polish_reg") or 2.0),
            spatial_sigma=float(params.get("polish_spatial_sigma") or 0.0),
            iters=int(params.get("polish_iters") or 30),
            lr=float(params.get("polish_lr") or 0.15),
        )
        sign = -1.0 if params.get("extract_inv", True) else 1.0
        new_stack[sel] = sign * np.asarray(stack_p)
        n_polished += len(sel)
        if params.get("plot_per_item", True):
            # per-particle trajectory overlay (reference plot_trajectories,
            # analysis/plot/core.py:1722)
            try:
                from pyp_tpu.analysis.plots import plot_local_trajectories

                plot_local_trajectories(
                    coords, np.asarray(traj), frames.shape[-2:],
                    f"{item['name']}_trajectories.png")
            except (OSError, ValueError) as e:
                logger.warning("trajectory plot skipped: %s", e)
    mrc.write(new_stack, "stack.mrc", pixel_size=pixel)
    print(json.dumps({"polished": n_polished}))
    return 0


def mode_postprocess(argv):
    params = _project_params(argv)
    from pyp_tpu.postprocess import core as post

    dataset = params.get("data_set") or "dataset"
    out = post.postprocess_latest(dataset, params)
    print(json.dumps(out, default=str))
    return 0


def mode_fsc(argv):
    """Standalone FSC utility (the reference's pyp_fsc.py,
    postprocess/pyp_fsc.py:179): FSC between consecutive map pairs given as
    positionals, optional mask with phase-randomization correction
    (-fsc_mask), resolutions at 0.5/0.143, <out>.txt + <out>.png."""
    from pyp_tpu.analysis import plots
    from pyp_tpu.core import fsc as fsc_mod
    from pyp_tpu.io import mrc as mrc_io

    maps, rest, prev_flag = [], [], False
    for a in argv:
        if (not prev_flag and not a.startswith("-")
                and (a.endswith(".mrc") or a.endswith(".rec"))):
            maps.append(a)           # positional map; flag VALUES stay put
        else:
            rest.append(a)
            prev_flag = a.startswith("-")
            continue
        prev_flag = False
    params = _project_params(rest, persist=False)
    if len(maps) < 2 or len(maps) % 2 != 0:
        print("usage: pyp_tpu fsc half1.mrc half2.mrc [h1b.mrc h2b.mrc ...] "
              "[-fsc_mask mask.mrc] [-fsc_out fsc]")
        return 1
    mask = None
    if params.get("fsc_mask"):
        mask = np.asarray(mrc_io.read(str(params["fsc_mask"])), np.float32)
    out_base = str(params.get("fsc_out") or "fsc")
    curves, labels, freqs = [], [], None
    results = []
    pixel = 0.0
    for i in range(0, len(maps), 2):
        h1 = np.asarray(mrc_io.read(maps[i]), np.float32)
        h2 = np.asarray(mrc_io.read(maps[i + 1]), np.float32)
        hdr = mrc_io.read_header(maps[i])
        pixel = float(hdr.pixel_size) or float(
            params.get("scope_pixel") or 1.0)
        if mask is not None:
            from pyp_tpu.postprocess.core import masked_fsc

            freqs, curve = masked_fsc(h1, h2, mask, pixel)
        else:
            freqs, curve = fsc_mod.fsc(h1, h2)
        curves.append(np.asarray(curve))
        label = f"{Path(maps[i]).stem} vs {Path(maps[i + 1]).stem}"
        labels.append(label)
        res = {
            "pair": label,
            "res_0.5_A": float(fsc_mod.resolution_at_threshold(
                freqs, curve, pixel, 0.5)),
            "res_0.143_A": float(fsc_mod.resolution_at_threshold(
                freqs, curve, pixel, 0.143)),
        }
        results.append(res)
    np.savetxt(out_base + ".txt",
               np.stack([np.asarray(freqs)] + curves, axis=1),
               header="freq_cyc_per_px " + " ".join(
                   l.replace(" ", "_") for l in labels))
    plots.plot_fsc(np.asarray(freqs), curves, pixel, out_base + ".png",
                   labels=labels)
    print(json.dumps({"pairs": results, "masked": mask is not None,
                      "out": out_base}))
    return 0


def mode_import_star(argv):
    """RELION star -> project metadata. SPA particles.star -> stack.cistem;
    tomo stars (reference TomoStar2meta[V5], pyp_metadata.py:763+):
    tomograms.star -> per-series tlt/xf/ctf metadata, RELION5 particles
    star -> <name>.next coords + eulers tables."""
    from pyp_tpu.io import cistem, relion, relion_tomo

    # reference-compatible flags (rlp -import_refine_star/-import_tomo_star,
    # docs/cli/*_import_export.rst) join any positional star paths
    flagged = []
    ip = _project_params(argv, persist=False)
    for key in ("import_refine_star", "import_tomo_star",
                "import_motion_star"):
        v = str(ip.get(key) or "")
        if v:
            flagged.append(v)
    positional = [a for a in argv if not a.startswith("-")
                  and a.endswith(".star")]
    paths = [p for p in positional if p not in flagged] + flagged
    if not paths:
        logger.error("usage: import_star <file.star> [more.star ...] or "
                     "-import_refine_star/-import_tomo_star <file.star>")
        return 2

    # declared format (import_format, the csp_tomo_free block field): the
    # dispatch below is content-based; a declared format that disagrees
    # with the detected one is surfaced instead of silently honored
    declared = str(ip.get("import_format") or "none")
    declared_ver = str(ip.get("import_tomo_star_version") or "")
    report = {}
    for path in paths:
        text = Path(path).read_text()
        detected = ("tomo" if "_rlnTomoProjX" in text else "spa")
        if declared_ver:
            # declared RELION star dialect (import tab tomo_star_version):
            # content detection wins, disagreement is surfaced
            ver_detected = "5" if ("_rlnTomoName" in text
                                   or "_rlnTomoProjX" in text) else "4"
            if declared_ver.lstrip("relion") not in ("", ver_detected):
                logger.warning(
                    "import_tomo_star_version=%s declared but %s uses the "
                    "RELION %s tomo dialect — importing by content",
                    declared_ver, path, ver_detected)
        if declared not in ("none", "") and declared.lower() not in (
                "relion", "relion5", "star", detected):
            logger.warning("import_format=%s declared but %s looks like a "
                           "%s star file — importing by content", declared,
                           path, detected)
        if "_rlnTomoProjX" in text:
            series, gparams = relion_tomo.import_tomograms_star(path)
            from pyp_tpu.io.metadata import ItemMetadata

            for s in series:
                meta = ItemMetadata(s["name"], ".", mode="tomo").load()
                meta["tlt"] = s["tilt_angles"]
                T = len(s["tilt_angles"])
                xf = np.zeros((T, 3), dtype=np.float32)
                meta["xf"] = xf
                ctf = np.zeros((T, 6), dtype=np.float32)
                ctf[:, :2] = s["defocus"]
                ctf[:, 2] = s["astig_angle"]
                meta["ctf"] = ctf
                meta.save()
            cfg.update_parameters(".", gparams)
            report[path] = {"tomograms": len(series), **{
                k: v for k, v in gparams.items() if k.startswith("scope")}}
        elif "_rlnTomoName" in text:
            parts = relion_tomo.import_particles_star_v5(path)
            np.savez("imported_particles.npz", **{
                k: v for k, v in parts.items() if k != "optics"})
            report[path] = {"particles": len(parts["tomo_names"]),
                            "file": "imported_particles.npz"}
        elif "_rlnAccumMotionTotal" in text:
            # corrected_micrographs star (-import_motion_star): record
            # RELION's accumulated-motion stats per micrograph — they
            # become filterable metadata metrics. Micrographs absent from
            # the project are reported, not materialized as empty bundles.
            from pyp_tpu.io import star as star_mod
            from pyp_tpu.io.metadata import ItemMetadata

            blocks = star_mod.read(path)
            loop = next(b["loop"] for b in blocks.values()
                        if "rlnMicrographName" in b["loop"])
            names = [Path(m).stem for m in loop["rlnMicrographName"]]
            have_project_items = any(Path(".").glob("*.meta.npz"))
            matched, unmatched = 0, 0
            for i, nm in enumerate(names):
                meta = ItemMetadata(nm, ".", mode="spr")
                if have_project_items and not meta.load().exists():
                    unmatched += 1
                    continue
                meta.load()
                for col, key in (("rlnAccumMotionTotal", "motion_total"),
                                 ("rlnAccumMotionEarly", "motion_early"),
                                 ("rlnAccumMotionLate", "motion_late")):
                    if col in loop:
                        meta.scalars[key] = float(loop[col][i])
                meta.save()
                matched += 1
            report[path] = {"micrographs": matched, "unmatched": unmatched}
        elif "_rlnCoordinateX" not in text and "_rlnAngleRot" not in text:
            report[path] = {"skipped": "unrecognized star (no particles, "
                            "tomograms, or motion table)"}
        else:
            table, optics = relion.import_star(path)
            cistem.write_parameters(table, "stack.cistem")
            report[path] = {"particles": table.n_rows, "optics": optics}
    print(json.dumps(report, default=str))
    return 0


def mode_export_star(argv):
    """stack.cistem -> RELION particles.star (export_star driver mode).
    With -data_mode tomo, exports tomograms.star + RELION5 particles star
    from the project's tilt-series metadata (the reference's meta2Star tomo
    branch, pyp_metadata.py:1148)."""
    params = _project_params(argv)
    from pyp_tpu.io import cistem, relion

    if str(params.get("data_mode") or "spr") == "tomo":
        from pyp_tpu.io import relion_tomo
        from pyp_tpu.io.metadata import ItemMetadata

        series, parts = [], None
        for meta_path in sorted(Path(".").glob("*.meta.npz")):
            name = meta_path.name.replace(".meta.npz", "")
            meta = ItemMetadata(name, ".", mode="tomo").load()
            if not meta.is_done("tlt"):
                continue
            tlt = np.asarray(meta["tlt"]).reshape(-1)
            T = len(tlt)
            xf6 = np.zeros((T, 6), dtype=np.float32)
            xf6[:, 0] = xf6[:, 3] = 1.0
            if meta.is_done("xf"):
                xfm = np.asarray(meta["xf"])
                xf6[:, 4:6] = xfm[:, :2]
            ctf = (np.asarray(meta["ctf"]) if meta.is_done("ctf")
                   else np.zeros((T, 6), dtype=np.float32))
            series.append({
                "name": name, "tilt_angles": tlt, "xf": xf6,
                "defocus": ctf[:, :2], "astig_angle": ctf[:, 2],
                "order": np.arange(T, dtype=np.float32),
                "image_dims": (int(params.get("tomo_rec_thickness") or 2048),
                               int(params.get("tomo_rec_thickness") or 2048)),
            })
        if not series:
            logger.error("no tilt-series metadata (*_meta.npz with tlt) found")
            return 1
        loc = Path(str(params.get("export_location") or "."))
        loc.mkdir(parents=True, exist_ok=True)
        rt_out = relion_tomo.export_tomograms_star(
            series, params, str(loc / "tomograms.star"))
        report = {"tomograms.star": len(series)}
        if Path("imported_particles.npz").exists():
            d = dict(np.load("imported_particles.npz", allow_pickle=True))
            d["tomo_names"] = list(d["tomo_names"])
            relion_tomo.export_particles_star_v5(
                d, params, str(loc / "particles.star"))
            report["particles.star"] = len(d["tomo_names"])
        print(json.dumps(report))
        return 0

    table = cistem.read_parameters("stack.cistem")
    loc = Path(str(params.get("export_location") or "."))
    loc.mkdir(parents=True, exist_ok=True)
    out = str(loc / "particles.star")
    relion.export_star(
        table, out, pixel_size=float(params["scope_pixel"]),
        voltage=float(params["scope_voltage"]), cs=float(params["scope_cs"]),
        w=float(params["scope_wgh"]),
        image_name_fmt=str(params.get("export_image_fmt")
                           or "{i}@stack.mrcs"),
        optics_group=int(params.get("export_optics_group") or 1),
    )
    print(json.dumps({"particles": table.n_rows, "star": out}))
    return 0


def mode_clean(argv):
    """Remove regenerable intermediates (the reference's `clean` /
    clear_scratch modes): swarm scripts, stream stacks, and — only with
    -clean_all — maps and metadata bundles."""
    import shutil

    params = _project_params(argv, persist=False)
    if params.get("clean_particles"):
        # particle cleaning (the reference's analysis/scores machinery,
        # scores.py:981/:1542): deactivate low-score particles, optionally
        # deduplicate by position
        from pyp_tpu.analysis import scores as sc
        from pyp_tpu.io import cistem

        table = cistem.read_parameters("stack.cistem")
        mode_rule = str(params.get("clean_mode") or "otsu")
        if params.get("clean_spr_auto"):
            # reference tabs.clean.spr_auto: automatic bimodal threshold
            # wins over any fixed/percentile rule
            mode_rule = "otsu"
        if mode_rule == "shape":
            # group-local score shaping (reference shape_phase_residuals):
            # percentile cutoffs inside each (view, defocus) group
            table, keep = sc.shape_scores(
                table,
                n_angles=int(params.get("clean_shape_angles") or 25),
                n_defocuses=int(params.get("clean_shape_defocuses") or 25),
                threshold=1.0 - float(
                    params.get("clean_percentile") or 20.0) / 100.0)
        else:
            cut = None
            if mode_rule == "fixed":
                cut = float(params.get("clean_min_score") or 0.0)
            elif mode_rule == "percentile":
                cut = float(np.percentile(
                    np.asarray(table["score"]),
                    float(params.get("clean_percentile") or 20.0)))
            if cut is None:
                cut = float(sc.score_threshold(
                    np.asarray(table["score"], dtype=np.float64), "otsu"))
            table, keep = sc.particle_cleaning(
                table, score_cut=cut,
                min_occ=float(params.get("clean_min_occ") or 0.0))
        if params.get("plot_per_item", True) and "score" in table:
            # score histogram with the applied threshold (reference
            # histogram_particle_tomo, plot/core.py:1833)
            try:
                from pyp_tpu.analysis.plots import histogram_particle_scores

                histogram_particle_scores(
                    np.asarray(table["score"]),
                    cut if mode_rule != "shape" else float(np.min(
                        np.asarray(table["score"])[keep])) if keep.any()
                    else 0.0,
                    "clean_scores.png", title=f"clean ({mode_rule})")
            except (OSError, ValueError) as e:
                logger.warning("clean score plot skipped: %s", e)
        dist = float(params.get("clean_dist") or 0.0)
        if dist > 0 and "original_x_position" in table:
            pos = np.stack([np.asarray(table["original_y_position"]),
                            np.asarray(table["original_x_position"])], 1)
            keep_d = sc.remove_duplicates(
                pos, np.asarray(table["score"]), dist)
            act = np.asarray(table["image_is_active"]).astype(bool) & keep_d
            table["image_is_active"] = act.astype(np.int64)
            keep = keep & keep_d
        # class selection (reference tabs.clean.class_selection): keep
        # only particles assigned to the listed 3D classes; with
        # class_merge_alignment each particle keeps its own class's
        # alignment (the single-table flow already stores exactly that)
        cls_sel = str(params.get("clean_class_selection") or "").strip()
        if cls_sel and "reference_3d" in table:
            wanted = {int(c) for c in cls_sel.replace(":", ",").split(",")
                      if c != ""}
            keep &= np.isin(np.asarray(table["reference_3d"]).astype(int),
                            sorted(wanted))
            if not params.get("clean_class_merge_alignment", True):
                logger.warning(
                    "clean_class_merge_alignment=False requested: per-class"
                    " alignments are already per-particle here; selection "
                    "keeps each particle's own parameters either way")
        # tilt-angle window (reference tabs.clean.mintilt/maxtilt,
        # pyp_config.toml:10569): projections outside the window deactivate
        min_tilt = float(params.get("clean_mintilt") if params.get(
            "clean_mintilt") not in (None, "") else -90.0)
        max_tilt = float(params.get("clean_maxtilt") if params.get(
            "clean_maxtilt") not in (None, "") else 90.0)
        if (min_tilt > -90.0 or max_tilt < 90.0) and "tilt_angle" in table:
            ta = np.asarray(table["tilt_angle"], dtype=np.float64)
            keep &= (ta >= min_tilt) & (ta <= max_tilt)
        # particles left with too few active projections drop entirely
        # (reference tabs.clean.min_num_projections)
        min_proj = int(params.get("clean_min_num_projections") or 1)
        if min_proj > 1 and "particle_index" in table:
            keep &= sc.min_projections_keep(
                table["particle_index"], keep, min_proj)
        if "image_is_active" in table:
            table["image_is_active"] = keep.astype(np.int64)
        if "occupancy" in table:
            occ = np.asarray(table["occupancy"]).copy()
            occ[~keep] = 0.0
            table["occupancy"] = occ
        if params.get("clean_discard"):
            # permanent removal (reference tabs.clean.discard) — the
            # default keeps rows at occupancy 0 (FREALIGN semantics)
            table = table.select(keep)
        cistem.write_parameters(table, "stack.cistem")
        if params.get("clean_export_clean") and "original_x_position" in table:
            # cleaned coordinates for re-extraction (reference
            # generate_clean_spk, analysis/scores.py:1602)
            sel_dir = Path("frealign/selected_particles")
            sel_dir.mkdir(parents=True, exist_ok=True)
            act = (np.asarray(table["image_is_active"]).astype(bool)
                   if "image_is_active" in table
                   else np.ones(table.n_rows, dtype=bool))
            cols = [np.asarray(table["original_x_position"])[act],
                    np.asarray(table["original_y_position"])[act]]
            if "original_z_position" in table:
                cols.append(np.asarray(table["original_z_position"])[act])
            np.savetxt(sel_dir / "clean.spk",
                       np.stack(cols, axis=1), fmt="%.2f")
        if params.get("clean_cluster_stacks") and Path("stack.mrc").exists():
            # per-(view, defocus) group stacks for visual inspection
            # (reference generate_cluster_stacks, analysis/scores.py:274)
            from pyp_tpu.io import mrc as mrc_io

            imgs_c = mrc_io.read("stack.mrc")
            if imgs_c.shape[0] != table.n_rows and \
                    imgs_c.shape[0] == len(keep):
                imgs_c = imgs_c[keep]    # clean_discard dropped rows
            sc.generate_cluster_stacks(
                imgs_c, table,
                n_angles=int(params.get("clean_shape_angles") or 25),
                n_defocuses=int(params.get("clean_shape_defocuses") or 25),
                out_dir="clusters", base="stack")
        if params.get("clean_check_reconstruction"):
            # sanity reconstruction from the cleaned table (reference
            # tabs.clean.check_reconstruction)
            stack_path = Path("stack.mrc")
            if stack_path.exists():
                from pyp_tpu.io import mrc as mrc_io
                from pyp_tpu.ops import reconstruct as rec
                from pyp_tpu.pipeline.refine import (table_to_ctf_params,
                                                     table_to_poses)

                imgs = mrc_io.read(str(stack_path))
                if params.get("clean_discard"):
                    # table rows were dropped: align the stack to survivors
                    imgs = imgs[keep]
                pixel = (float(table["pixel_size"][0])
                         if "pixel_size" in table
                         else float(params.get("scope_pixel") or 1.0))
                wts = (np.asarray(table["occupancy"], np.float32) / 100.0
                       if "occupancy" in table
                       else keep.astype(np.float32))
                out = rec.reconstruct(
                    np.asarray(imgs, np.float32),
                    table_to_poses(table, pixel),
                    table_to_ctf_params(table), pixel,
                    subset=(np.arange(table.n_rows) % 2).astype(np.int32),
                    weights=wts,
                    symmetry=str(params.get("particle_sym") or "C1"),
                    voltage_kv=float(params.get("scope_voltage") or 300.0),
                    cs_mm=float(params.get("scope_cs") or 2.7),
                    amplitude_contrast=float(params.get("scope_wgh") or 0.07),
                )
                Path("maps").mkdir(exist_ok=True)
                mrc_io.write(np.asarray(out.volume, np.float32),
                             "maps/clean_check.mrc", pixel_size=pixel)
        print(json.dumps({"kept": int(keep.sum()),
                          "total": int(len(keep))}))
        return 0
    deep = "-clean_all" in argv
    removed = []
    for pattern in ["swarm", "stream_stack.mrc", "stream_classes.png"]:
        p = Path(pattern)
        if p.is_dir():
            shutil.rmtree(p)
            removed.append(str(p) + "/")
        elif p.exists():
            p.unlink()
            removed.append(str(p))
    if deep:
        for p in list(Path(".").glob("*.meta.npz")) + list(Path(".").glob("*.meta.json")):
            p.unlink()
            removed.append(str(p))
        if Path("maps").is_dir():
            shutil.rmtree("maps")
            removed.append("maps/")
    usage = shutil.disk_usage(".")  # free-space report (bin/run/pyp:4281)
    print(json.dumps({"removed": removed, "deep": deep,
                      "free_gb": round(usage.free / 2**30, 1)}))
    return 0


def mode_mine(argv):
    """Label-free tomogram pattern mining (the reference's milotrain/
    miloeval modes, detect/joint.py:640/:1011): train the contrastive
    miner on the project's tomogram volumes, cluster a dense sweep of each,
    and write per-cluster coordinates (<name>_cluster<k>.spk) + a JSON
    gallery so the user can pick the clusters that look like the target."""
    params = _project_params(argv)
    from pyp_tpu.io import boxfiles, mrc
    from pyp_tpu.models import miner

    recs = sorted(Path(".").glob("*.rec.mrc")) or sorted(
        Path("mrc").glob("*.mrc")) if Path("mrc").is_dir() else sorted(
        Path(".").glob("*.rec.mrc"))
    if not recs:
        logger.error("no tomogram volumes (*.rec.mrc or mrc/*.mrc) found")
        return 1
    vols = [mrc.read(p).astype(np.float32) for p in recs]
    patch = int(params.get("mine_patch") or 16)
    model = miner.train_miner(
        vols, patch=patch,
        n_steps=int(params.get("mine_steps") or 300),
        embed_dim=int(params.get("mine_embed_dim") or 32),
        batch=int(params.get("mine_batch") or 64),
        lr=float(params.get("mine_lr") or 1e-3),
        temperature=float(params.get("mine_temperature") or 0.2),
        seed=int(params.get("mine_seed") or 0))
    gallery = {}
    K = int(params.get("mine_clusters") or 8)
    for p, vol in zip(recs, vols):
        name = p.name.replace(".rec.mrc", "").replace(".mrc", "")
        clusters, _labels, _coords = miner.mine_tomogram(
            model, vol, n_clusters=K)
        entry = []
        for k, c in enumerate(clusters):
            if c["size"]:
                boxfiles.write_spk(c["coords"], f"{name}_cluster{k:02d}.spk")
            entry.append({"cluster": k, "size": c["size"],
                          "exemplars": np.asarray(c["exemplars"]).tolist()})
        gallery[name] = entry
    Path("mine_gallery.json").write_text(json.dumps(gallery, indent=1))
    print(json.dumps({"tomograms": len(recs), "clusters": K,
                      "gallery": "mine_gallery.json"}))
    return 0


def mode_classify3d(argv):
    """K-class 3D classification over the extracted stack (the reference's
    class3d driver role, bin/run/pyp classification branch)."""
    params = _project_params(argv)
    from pyp_tpu.io import cistem, mrc
    from pyp_tpu.pipeline import classify3d as c3d

    stack = mrc.read("stack.mrc").astype(np.float32)
    table = cistem.read_parameters("stack.cistem")
    init_path = Path("initial_model.mrc")
    if init_path.exists():
        initial = mrc.read(init_path).astype(np.float32)
    else:
        from pyp_tpu.core.filters import soft_spherical_mask

        n = stack.shape[-1]
        initial = np.asarray(soft_spherical_mask(n, n * 0.3, 5.0),
                             dtype=np.float32)
    dataset = params.get("data_set") or "dataset"
    table, refs, occ, history = c3d.classify3d_loop(
        stack, table, initial, params, dataset=dataset)
    cistem.write_parameters(table, "stack.cistem")
    print(json.dumps({"iterations": history}, default=str))
    return 0


def mode_gain(argv):
    """Estimate a gain reference from raw counting movies (the reference's
    pypgain driver, bin/run/pyp gain branch)."""
    params = _project_params(argv)
    from pyp_tpu.io import mrc
    from pyp_tpu.pipeline.spr import estimate_gain

    paths = sorted(glob.glob(params.get("data_path") or ""))
    if not paths:
        logger.error("no input files match data_path=%r", params.get("data_path"))
        return 1
    gain = estimate_gain(paths, max_movies=int(params.get("gain_movies") or 10))
    out = params.get("gain_reference") or "gain.mrc"
    mrc.write(gain, out)
    print(json.dumps({"gain": out, "shape": list(gain.shape),
                      "movies": min(len(paths), int(params.get("gain_movies") or 10))}))
    return 0


def mode_stream(argv):
    """Launch the on-the-fly session daemon (streampyp role): watch
    data_path for new movies, process each, incrementally re-classify."""
    params = _project_params(argv)
    from pyp_tpu.stream.daemon import SessionDaemon, SessionManager

    sessions_dir = str(params.get("stream_sessions_dir") or "")
    if sessions_dir:
        # multi-session mode: one process multiplexes every
        # {group}/{session}/session.toml under the root
        mgr = SessionManager(
            sessions_dir, defaults=params,
            poll_interval=float(params.get("stream_poll_interval") or 5.0))
        max_iter = params.get("stream_max_iterations")
        idle_exit = params.get("stream_idle_exit")
        results = mgr.run(
            max_iterations=int(max_iter) if max_iter else None,
            idle_exit=int(idle_exit) if idle_exit else None)
        print(json.dumps({k: len(v) for k, v in results.items()}))
        return 0
    pattern = params.get("data_path") or ""
    if not pattern:
        logger.error("stream needs -data_path <watch glob>")
        return 1
    if Path(pattern).is_dir():
        # directory + filename pattern (reference movie tab pattern /
        # source): the session watches <dir>/<movie_pattern>
        pattern = str(Path(pattern)
                      / str(params.get("movie_pattern") or "*.tif"))
    from pyp_tpu.sched import bridge

    if bridge.slurm_requested(params):
        # the daemon itself runs as one long scheduler job (streampyp's
        # pyp_daemon submission; resources from the slurm daemon tier)
        print(json.dumps(bridge.submit_daemon(params, argv), indent=1))
        return 0
    daemon = SessionDaemon(
        pattern, params,
        poll_interval=float(params.get("stream_poll_interval") or 5.0),
        classify_every=int(params.get("stream_classify_every") or 0),
        n_classes=int(params.get("class_num") or 10),
    )
    max_iter = params.get("stream_max_iterations")
    idle_exit = params.get("stream_idle_exit")
    daemon.run(
        max_iterations=int(max_iter) if max_iter else None,
        idle_exit=int(idle_exit) if idle_exit else None,
    )
    print(json.dumps({"processed": len(daemon.processed),
                      "classified": daemon.class_result is not None}))
    return 0


def mode_report(argv):
    """Static HTML project report (the web dashboards' file-based
    counterpart): per-item metric histograms + table, refinement FSC
    curves, model-fit track — one self-contained <dataset>_report.html."""
    params = _project_params(argv, persist=False)
    from pyp_tpu.analysis.report import build_report

    mode = "tomo" if params.get("data_mode") == "tomo" else "spr"
    out = build_report(".", str(params.get("data_set") or "dataset"),
                       mode=mode)
    print(json.dumps({"report": out}))
    return 0


def mode_workflow(argv):
    """Run a pre-defined block sequence from a .toml workflow file (the
    reference's Workflows, docs/guide/workflows.rst):

      pyp_tpu workflow spa_tutorial.toml -data_path "/data/*.tif"

    Flags after the file fill the workflow's `{ ask = true }` arguments and
    are also appended to every block's invocation."""
    from pyp_tpu.sched.workflow import run_workflow

    paths = [a for a in argv if not a.startswith("-")
             and a.endswith(".toml")]
    if not paths:
        logger.error("usage: workflow <file.toml> [-arg value ...]")
        return 2
    def _is_number(tok):
        try:
            float(tok)
            return True
        except ValueError:
            return False

    overrides = {}
    rest = [a for a in argv if a not in paths]
    i = 0
    while i < len(rest):
        tok = rest[i]
        if tok.startswith("-") and not _is_number(tok):
            key = tok.lstrip("-")
            nxt = rest[i + 1] if i + 1 < len(rest) else None
            # a following token is this flag's value unless it is itself a
            # flag (negative numbers are values, not flags)
            if nxt is not None and (not nxt.startswith("-")
                                    or _is_number(nxt)):
                overrides[key] = nxt
                i += 2
                continue
            overrides[key] = True
        i += 1
    report = run_workflow(paths[0], overrides, extra_argv=rest)
    print(json.dumps({"workflow": paths[0], "blocks": report}))
    return 0 if all(b["rc"] == 0 for b in report) else 1


def mode_prism(argv):
    """Self-supervised micrograph quality assessment (the prismPYP role,
    docs/guide/prismpyp.rst; native model, models/quality.py): learn the
    dataset's real+Fourier appearance, score every micrograph by
    typicality, and write prism_score into each item's metadata — the
    filter mode then does the consensus-filtering step:

      pyp_tpu prism
      pyp_tpu filter -filter_criteria "prism_score>-2" -filter_name good
    """
    params = _project_params(argv)
    from pyp_tpu.analysis.filters import discover_bundles
    from pyp_tpu.io.metadata import ItemMetadata
    from pyp_tpu.models import quality as qual

    mode = "tomo" if params.get("data_mode") == "tomo" else "spr"
    names = discover_bundles(".")
    mics, kept_names = [], []
    for name in names:
        meta = ItemMetadata(name, ".", mode=mode).load()
        if "average" in meta:
            mics.append(np.asarray(meta["average"], dtype=np.float32))
            kept_names.append(name)
    if len(mics) < 2:
        logger.error("prism: need >=2 items with averages (found %d)",
                     len(mics))
        return 1
    stack = np.stack(mics)
    model = qual.train_quality(
        stack,
        size=int(params.get("prism_size") or 128),
        latent_dim=int(params.get("prism_latent") or 16),
        steps=int(params.get("prism_steps") or 300),
        batch=int(params.get("prism_batch") or 16),
        lr=float(params.get("prism_lr") or 1e-3),
        seed=int(params.get("prism_seed") or 0),
        momentum=float(params.get("prism_momentum") or 0.0),
        weight_decay=float(params.get("prism_weight_decay") or 0.0),
        log_every=int(params.get("prism_print_freq") or 0))
    scores = qual.quality_scores(model, stack)
    emb = qual.embed_quality(model, stack)
    for name, s in zip(kept_names, scores):
        meta = ItemMetadata(name, ".", mode=mode).load()
        meta.scalars["prism_score"] = float(s)
        meta.save()
    np.savez("prism_embeddings.npz", names=np.asarray(kept_names),
             embeddings=emb, scores=scores)
    print(json.dumps({"items": len(kept_names),
                      "score_min": round(float(scores.min()), 3),
                      "score_median": round(float(np.median(scores)), 3),
                      "embeddings": "prism_embeddings.npz"}))
    return 0


def mode_filter(argv):
    """Create a micrograph/tilt-series filter selection (the reference's
    table-view Filters, docs/guide/filters.rst): evaluate metric criteria
    over every item's metadata bundle, apply manual include/exclude
    overrides, and save a selection downstream modes load via -filter_sel.

      pyp_tpu filter -filter_criteria "ctf_res<8 drift<60" -filter_name good
      pyp_tpu refine ... -filter_sel good
    """
    params = _project_params(argv)
    from pyp_tpu.analysis.filters import apply_filter, save_selection

    mode = "tomo" if params.get("data_mode") == "tomo" else "spr"
    crit = str(params.get("filter_criteria") or "")
    inc = [t for t in str(params.get("filter_include") or "").replace(
        ",", " ").split() if t]
    exc = [t for t in str(params.get("filter_exclude") or "").replace(
        ",", " ").split() if t]
    kept, table = apply_filter(".", crit, mode=mode, include=inc,
                               exclude=exc)
    name = str(params.get("filter_name") or "filter1")
    ds = str(params.get("data_set") or "dataset")
    out = save_selection(f"{ds}_{name}.filter.json", kept, crit, table)
    print(json.dumps({"filter": out, "kept": len(kept),
                      "total": len(table), "criteria": crit}))
    return 0


def mode_kselection(argv):
    """Keep only particles in the given classes (the reference's kselection
    driver): pyp_tpu kselection -keep_classes 1,3,5. With
    -expand_symmetry <group> instead, symmetry-expand the particle table
    (relion_particle_symmetry_expand role) for focused classification."""
    params = _project_params(argv)
    from pyp_tpu.analysis.scores import select_classes
    from pyp_tpu.io import cistem

    sym = str(params.get("expand_symmetry") or "")
    if sym:
        from pyp_tpu.analysis.scores import expand_symmetry

        table = cistem.read_parameters("stack.cistem")
        out = expand_symmetry(table, sym)
        cistem.write_parameters(out, "stack.cistem")
        print(json.dumps({"expanded": out.n_rows, "from": table.n_rows,
                          "symmetry": sym}))
        return 0

    spec = str(params.get("keep_classes") or "")
    if not spec:
        logger.error("kselection needs -keep_classes <comma list>")
        return 1
    keep = {int(tok) for tok in spec.replace(",", " ").split()}
    table = cistem.read_parameters("stack.cistem")
    table, mask = select_classes(table, keep)
    cistem.write_parameters(table, "stack.cistem")
    print(json.dumps({"kept": int(mask.sum()), "total": int(len(mask)),
                      "classes": sorted(keep)}))
    return 0


def mode_byp(argv):
    """Box/model interop utilities (the bin/run/byp driver): dispatch on the
    input file's extension like the reference does.

      byp picks.mod -extract_box 128      # mod2box: IMOD picks -> .box
      byp mic.boxx                        # box2mod: .box/.boxx -> IMOD .mod
      byp particles.star                  # relion2box: star -> .box per film
      byp stack.mrc -to_hdf               # mrc stack -> EMAN2 HDF
      byp stack.hdf                       # EMAN2 HDF -> mrc stack
    """
    if not argv or argv[0].startswith("-"):
        logger.error("usage: byp <file.mod|.box|.boxx|.star> [params]")
        return 2
    src = Path(argv[0])
    params = _project_params(argv[1:])
    box = int(params.get("extract_box") or 128)
    from pyp_tpu.io import boxfiles, imod

    scaling = float(params.get("convert_scaling") or 1.0)
    zheight = float(params.get("convert_z") or 256)
    depth = float(params.get("convert_depth") or 256)
    if src.suffix == ".cistem":
        # cistem2par: alignment table -> FREALIGN .par (the reference's
        # parfile hand-off format); refine_parfile_compress writes .par.bz2
        from pyp_tpu.io import cistem as _cistem
        from pyp_tpu.io import parfile as _parfile

        table = _cistem.read_parameters(src)
        pf = _parfile.from_cistem_table(
            table, variant=str(params.get("refine_metric") or "new")
            .replace("cc3m", "new").replace("frealignx", "frealignx"))
        out = src.with_suffix(
            ".par.bz2" if params.get("refine_parfile_compress") else ".par")
        _parfile.write(pf, out)
        print(json.dumps({"mode": "cistem2par", "rows": table.n_rows,
                          "output": str(out)}))
        return 0
    if src.suffix == ".cbox":
        # crYOLO picks -> IMOD model (reference pyp_convert_coord
        # cryolo2mod, analysis/geometry/pyp_convert_coord.py:83): rescale
        # from the cryolo tomogram grid and re-center z on the pyp depth
        centers, cbox_size, conf = boxfiles.read_cbox(src)
        pts = centers / scaling
        pts[:, 2] = pts[:, 2] - zheight / (2 * scaling) + depth / 2
        out = src.with_suffix(".mod")
        imod.write_point_model(out, pts)
        boxfiles.write_spk(np.stack([pts[:, 2], pts[:, 1], pts[:, 0]], 1),
                           src.with_suffix(".spk"))
        print(json.dumps({"mode": "cryolo2mod", "picks": int(len(pts)),
                          "mod": str(out)}))
        return 0
    if src.suffix == ".mod" and params.get("to_cbox"):
        # IMOD model -> crYOLO picks (mod2cryolo,
        # pyp_convert_coord.py:122): inverse of the transform above
        pts = imod.read_points(src)            # (N, 3) x, y, z
        xyz = np.array(pts[:, :3], dtype=np.float64)
        xyz[:, 2] = xyz[:, 2] - depth / 2 + zheight / (2 * scaling)
        xyz *= scaling
        out = src.with_suffix(".cbox")
        boxfiles.write_cbox(xyz, box * scaling, out)
        print(json.dumps({"mode": "mod2cryolo", "picks": int(len(pts)),
                          "cbox": str(out)}))
        return 0
    if src.suffix == ".mod":
        pts = imod.read_points(src)            # (N, 3) x, y, z
        coords_yx = np.stack([pts[:, 1], pts[:, 0]], axis=1)
        out = src.with_suffix(".box")
        boxfiles.write_box(coords_yx, box, out)
        print(json.dumps({"mode": "mod2box", "picks": int(len(pts)),
                          "box": str(out)}))
        return 0
    if src.suffix in (".box", ".boxx"):
        if src.suffix == ".boxx":
            coords_yx, boxsize, inside, kept = boxfiles.read_boxx(src)
            sel = np.asarray(kept, dtype=bool)
            coords_yx = np.asarray(coords_yx)[sel]
        else:
            coords_yx, boxsize = boxfiles.read_box(src)
            coords_yx = np.asarray(coords_yx)
        pts = np.stack([coords_yx[:, 1], coords_yx[:, 0],
                        np.zeros(len(coords_yx))], axis=1)
        out = src.with_suffix(".mod")
        imod.write_point_model(out, pts)
        print(json.dumps({"mode": "box2mod", "picks": int(len(pts)),
                          "mod": str(out)}))
        return 0
    if src.suffix in (".hdf", ".h5"):
        # EMAN2 -> mrc (refine/eman role)
        from pyp_tpu.io import eman, mrc

        stack, apix = eman.read_hdf(src)
        out = src.with_suffix(".mrc")
        mrc.write(stack, out, pixel_size=apix)
        print(json.dumps({"mode": "hdf2mrc", "images": int(len(stack)),
                          "mrc": str(out)}))
        return 0
    if src.suffix in (".mrc", ".mrcs") and params.get("to_hdf"):
        from pyp_tpu.io import eman

        out = eman.export_particles_hdf(
            src, src.with_suffix(".hdf"),
            apix=float(params.get("scope_pixel") or 1.0))
        print(json.dumps({"mode": "mrc2hdf", "hdf": out}))
        return 0
    if src.suffix == ".star":
        from pyp_tpu.io import relion

        table, _optics = relion.import_star(str(src))
        films = np.asarray(table["particle_group"]).astype(int) \
            if "particle_group" in table else np.zeros(table.n_rows, int)
        n_files = 0
        for f in np.unique(films):
            sel = films == f
            coords_yx = np.stack([
                np.asarray(table["original_y_position"])[sel],
                np.asarray(table["original_x_position"])[sel]], axis=1)
            boxfiles.write_box(coords_yx, box, src.parent / f"film{f:04d}.box")
            n_files += 1
        print(json.dumps({"mode": "relion2box", "films": n_files,
                          "particles": int(table.n_rows)}))
        return 0
    logger.error("byp: unsupported input %s", src.suffix)
    return 2


def mode_worker(argv):
    """SLURM array element entry: run a serialized job payload."""
    import os

    payload = json.loads(Path(argv[0]).read_text())
    mode = payload["mode"]
    os.environ["PYP_TPU_WORKER"] = "1"  # execute, never re-submit
    return main([mode] + payload.get("argv", []))


def mode_params(argv):
    params = _project_params(argv)
    print(json.dumps(params, indent=1, default=str))
    return 0


def mode_export_session(argv):
    """Streaming session -> RELION export (the reference's `pex` /
    export_session env mode, bin/run/pyp:5121 weak_meta2Star): for the
    selected micrographs (a *.micrographs list file in the export dir,
    else every processed item in the session), write
    relion/<data_set>_micrographs.star (optics + per-micrograph CTF) and
    per-micrograph _autopick.star coordinate files."""
    params = _project_params(argv, persist=False)
    from pyp_tpu.io import star
    from pyp_tpu.io.metadata import ItemMetadata

    session = str(params.get("data_parent") or ".")
    sp = {**params, **(cfg.load_parameters(session) or {})}
    data_set = str(sp.get("data_set") or "session")
    mode = str(sp.get("data_mode") or "spr")

    lists = sorted(glob.glob("*.micrographs"))
    if lists:
        wanted = [ln.strip() for ln in open(lists[0]) if ln.strip()]
    else:
        wanted = sorted(p.name[: -len(".meta.npz")] for p in
                        Path(session).glob("*.meta.npz"))
    out_dir = Path("relion")
    out_dir.mkdir(exist_ok=True)

    names, df1, df2, ang, fom = [], [], [], [], []
    n_coords = 0
    for name in wanted:
        meta = ItemMetadata(name, session, mode=mode).load()
        if "ctf" not in meta:
            continue
        c = np.atleast_2d(np.asarray(meta["ctf"]))
        names.append(f"{name}.mrc")
        df1.append(float(c[0, 0]))
        df2.append(float(c[0, 1]))
        ang.append(float(c[0, 2]))
        fom.append(float(c[0, 4]) if c.shape[1] > 4 else float(c[0, 3]))
        if "box" in meta and len(np.asarray(meta["box"])):
            box = np.atleast_2d(np.asarray(meta["box"]))
            star.write({"root": {"fields": {}, "loop": {
                "rlnCoordinateX": box[:, 1].astype(np.float64),
                "rlnCoordinateY": box[:, 0].astype(np.float64),
                "rlnAutopickFigureOfMerit": (
                    box[:, -1] if box.shape[1] > 2
                    else np.ones(len(box))).astype(np.float64),
            }}}, out_dir / f"{name}_autopick.star")
            n_coords += len(box)
    if not names:
        logger.error("export_session: no processed micrographs with CTF "
                     "under %s", session)
        return 1
    n = len(names)
    star.write({
        "optics": {"fields": {}, "loop": {
            "rlnOpticsGroup": np.array([1]),
            "rlnMicrographPixelSize": np.array([float(sp["scope_pixel"])]),
            "rlnVoltage": np.array([float(sp["scope_voltage"])]),
            "rlnSphericalAberration": np.array([float(sp["scope_cs"])]),
            "rlnAmplitudeContrast": np.array([float(sp["scope_wgh"])]),
        }},
        "micrographs": {"fields": {}, "loop": {
            "rlnMicrographName": np.array(names, dtype=object),
            "rlnOpticsGroup": np.ones(n, dtype=np.int64),
            "rlnDefocusU": np.array(df1),
            "rlnDefocusV": np.array(df2),
            "rlnDefocusAngle": np.array(ang),
            "rlnCtfFigureOfMerit": np.array(fom),
        }},
    }, out_dir / f"{data_set}_micrographs.star")
    print(json.dumps({"micrographs": n, "coordinates": n_coords,
                      "star": str(out_dir / f"{data_set}_micrographs.star")}))
    return 0


def mode_sva(argv):
    """Legacy subvolume averaging (the reference's sva/svaswarm/svamerge
    entries wrapping the TOMO 3DAVG binaries, bin/run/pyp env dispatch;
    production subtomogram refinement is `csp`): gather subvolumes at the
    3D picks of every reconstructed tomogram, align them to a reference
    (or reference-free from the raw average) with the bank-rotation FFT
    matcher, and write the wedge-compensated average."""
    params = _project_params(argv)
    from pyp_tpu.io import mrc
    from pyp_tpu.io.metadata import ItemMetadata
    from pyp_tpu.ops import sva as sva_ops
    from pyp_tpu.ops.extract import subvolume_gather

    box = int(params.get("sva_box") or 48)
    # extraction boundary (reference extract_bnd / tomo_ext padd role):
    # cut a larger window, process, and keep box³ — particles this close
    # to the tomogram edge survive instead of being dropped
    bnd = max(int(params.get("extract_bnd") or 0), box)
    subs, names = [], []
    for rec in sorted(glob.glob("*.rec.mrc")):
        name = Path(rec).name[: -len(".rec.mrc")]
        meta = ItemMetadata(name, ".", mode="tomo").load()
        if "box" not in meta:
            continue
        vol = mrc.read(rec).astype(np.float32)
        coords = np.asarray(meta["box"])[:, :3]
        ok = np.all((coords >= box // 2)
                    & (coords < np.asarray(vol.shape) - box // 2), axis=1)
        if not ok.any():
            continue
        import jax.numpy as jnp

        got = np.asarray(subvolume_gather(
            jnp.asarray(vol),
            jnp.asarray(np.round(coords[ok]).astype(np.int32)), bnd))
        if bnd > box:
            lo = (bnd - box) // 2
            got = got[:, lo:lo + box, lo:lo + box, lo:lo + box]
        subs.append(got)
        names.extend(f"{name}:{i}" for i in np.nonzero(ok)[0])
    if not subs:
        logger.error("sva: no *.rec.mrc with 3D picks found")
        return 1
    subs = np.concatenate(subs, axis=0)
    ref = None
    if params.get("sva_ref"):
        ref = mrc.read(str(params["sva_ref"])).astype(np.float32)
    def _pair(key, default):
        v = str(params.get(key) or default)
        a, b = (float(x) for x in v.replace(":", ",").split(","))
        return (a, b)

    wedge = float(params.get("sva_wedge") or 60.0)
    res = sva_ops.sva_iterate(
        subs, reference=ref,
        iters=int(params.get("sva_iters") or 3),
        angular_step=float(params.get("sva_ang") or 30.0),
        symmetry=str(params.get("particle_sym") or "C1"),
        shift_extent=int(params.get("sva_shift") or 8),
        wedge_deg=wedge,
        lowpass=_pair("sva_lowpass", "0.25,0.05"),
        highpass=_pair("sva_highpass", "0,0"),
        mask_rad=float(params.get("sva_mask_rad") or 0.0),
        mask_sigma=float(params.get("sva_mask_sigma") or 4.0),
        centering_iters=int(params.get("sva_centering_iters") or 0),
        keep_fraction=float(params.get("sva_keep_fraction") or 1.0),
        local_refine=bool(params.get("sva_local", True)))
    out = f"{params.get('data_set') or 'dataset'}_sva.mrc"
    pix = float(params["scope_pixel"]) * int(params.get("tomo_rec_binning")
                                             or 1)
    mrc.write(np.asarray(res.average, dtype=np.float32), out, pixel_size=pix)
    report = {"subvolumes": int(len(subs)), "average": out,
              "mean_score": float(np.mean(np.asarray(res.scores)))}
    labels = None
    K = int(params.get("sva_classes") or 1)
    if K > 1:
        labels, class_avgs = sva_ops.classify_subvolumes(
            subs, np.asarray(res.angles), np.asarray(res.shifts), K,
            wedge_deg=wedge)
        stem = str(params.get("data_set") or "dataset")
        for k, avg in enumerate(class_avgs):
            mrc.write(np.asarray(avg, dtype=np.float32),
                      f"{stem}_sva_class{k:02d}.mrc", pixel_size=pix)
        report["classes"] = [int(np.sum(labels == k)) for k in range(K)]
    np.savez("sva_alignment.npz", names=np.asarray(names),
             angles=np.asarray(res.angles), shifts=np.asarray(res.shifts),
             scores=np.asarray(res.scores),
             **({"labels": labels} if labels is not None else {}))
    print(json.dumps(report))
    return 0


def mode_heterogeneity(argv):
    """Continuous heterogeneity analysis on the refined stack (the
    reference's heterogeneitytrain/eval drivers wrapping cryoDRGN,
    refine/heterogeneity/; native flax model, models/heterogeneity.py):
    train the per-particle latent encoder + Fourier-slice decoder at the
    refined poses, embed every particle, and decode volumes along the
    first principal latent direction."""
    params = _project_params(argv)
    from pyp_tpu.io import cistem, mrc
    from pyp_tpu.models import heterogeneity as het
    from pyp_tpu.pipeline.refine import table_to_ctf_params, table_to_poses

    pixel = float(params["scope_pixel"])
    tilt_glob = sorted(glob.glob(
        str(params.get("het_input") or "stacks/*_stack.npz")))
    if tilt_glob and not Path("stack.mrc").exists() or params.get("het_input"):
        return _heterogeneity_tilt(tilt_glob, params, pixel)

    stack = mrc.read("stack.mrc").astype(np.float32)
    table = cistem.read_parameters("stack.cistem")
    if params.get("het_eval") and Path("het_model.npz").exists():
        # heterogeneityeval role: reuse the trained checkpoint
        model = het.load_model("het_model.npz")
        logger.info("heterogeneity: loaded het_model.npz (eval only)")
    else:
        model = het.train_heterogeneity(
            stack, table_to_poses(table, pixel), table_to_ctf_params(table),
            pixel,
            latent_dim=int(params.get("het_latent") or 8),
            steps=int(params.get("het_steps") or 500),
            batch=int(params.get("het_batch") or 32),
            lr=float(params.get("het_lr") or 1e-3),
            low_res=float(params.get("het_rlref") or 60.0),
            high_res=float(params.get("het_rhref") or 8.0),
            kl_weight=float(params.get("het_kl") or 1e-3),
            seed=int(params.get("het_seed") or 0),
            hidden=int(params.get("het_hidden") or 128),
            voltage_kv=float(params["scope_voltage"]),
            cs_mm=float(params["scope_cs"]),
            w=float(params["scope_wgh"]),
        )
        het.save_model(model, "het_model.npz")
    latents = np.asarray(het.embed(model, stack))
    np.savez("heterogeneity_latents.npz", latents=latents)
    scores, comps, svals = het.latent_pca(latents, n_components=2)
    nvol = int(params.get("het_volumes") or 5)
    qs = np.linspace(5, 95, nvol)
    mean_z = latents.mean(axis=0)
    for i, q in enumerate(qs):
        # walk along PC1 between the 5th..95th percentile of its scores
        pc = max(0, int(params.get("het_pc") or 1) - 1)
        z = mean_z + comps[pc] * np.percentile(scores[:, pc], q)
        vol = np.asarray(het.decode_volume(model, z), dtype=np.float32)
        mrc.write(vol, f"het_volume_{i:02d}.mrc", pixel_size=pixel)
    total_var = latents.var(axis=0).sum() * max(len(latents) - 1, 1)
    print(json.dumps({"particles": int(len(stack)),
                      "latent_dim": int(latents.shape[1]),
                      "volumes": nvol,
                      "pc1_explained": float(svals[0] ** 2 / max(
                          total_var, 1e-9))}))
    return 0


def _heterogeneity_tilt(stack_files, params, pixel):
    """tomoDRGN-role branch of the heterogeneity mode: train the tilt-aware
    latent model on per-particle tilt stacks exported by csp
    -csp_save_stacks (docs/guide/tomodrgn.rst)."""
    from pyp_tpu.io import mrc
    from pyp_tpu.models import heterogeneity as het

    if not stack_files:
        logger.error("heterogeneity: no tilt stacks (stacks/*_stack.npz); "
                     "run csp with -csp_save_stacks first")
        return 1
    parts = [np.load(f) for f in stack_files]
    stacks = np.concatenate([p["stacks"] for p in parts])
    poses = np.concatenate([p["poses"] for p in parts])
    ctf = np.concatenate([p["ctf"] for p in parts])
    weights = np.concatenate([p["weights"] for p in parts])
    if params.get("het_eval") and Path("het_model.npz").exists():
        model = het.load_model("het_model.npz")
        logger.info("heterogeneity: loaded het_model.npz (eval only)")
        latents = het.embed_tilt(model, stacks)
        return _het_report(latents, model, params, pixel, stacks)
    model = het.train_heterogeneity_tilt(
        stacks, poses, ctf, pixel, tilt_weights=weights,
        latent_dim=int(params.get("het_latent") or 8),
        steps=int(params.get("het_steps") or 500),
        batch=int(params.get("het_batch") or 8),
        lr=float(params.get("het_lr") or 1e-3),
        low_res=float(params.get("het_rlref") or 60.0),
        high_res=float(params.get("het_rhref") or 8.0),
        kl_weight=float(params.get("het_kl") or 1e-3),
        seed=int(params.get("het_seed") or 0),
        hidden=int(params.get("het_hidden") or 128),
        voltage_kv=float(params["scope_voltage"]),
        cs_mm=float(params["scope_cs"]),
        w=float(params["scope_wgh"]),
    )
    het.save_model(model, "het_model.npz")
    latents = het.embed_tilt(model, stacks)
    return _het_report(latents, model, params, pixel, stacks)


def _het_report(latents, model, params, pixel, stacks):
    from pyp_tpu.io import mrc
    from pyp_tpu.models import heterogeneity as het

    np.savez("heterogeneity_latents.npz", latents=latents)
    scores, comps, svals = het.latent_pca(latents, n_components=2)
    nvol = int(params.get("het_volumes") or 5)
    mean_z = latents.mean(axis=0)
    pc = max(0, int(params.get("het_pc") or 1) - 1)
    for i, q in enumerate(np.linspace(5, 95, nvol)):
        z = mean_z + comps[pc] * np.percentile(scores[:, pc], q)
        vol = np.asarray(het.decode_volume(model, z), dtype=np.float32)
        mrc.write(vol, f"het_volume_{i:02d}.mrc", pixel_size=pixel)
    total_var = latents.var(axis=0).sum() * max(len(latents) - 1, 1)
    print(json.dumps({"particles": int(len(stacks)),
                      "tilts": int(stacks.shape[1]),
                      "latent_dim": int(latents.shape[1]),
                      "volumes": nvol,
                      "pc1_explained": float(svals[0] ** 2 / max(
                          total_var, 1e-9))}))
    return 0


def mode_mask(argv):
    """Standalone mask creation (the reference's `mask` driver branch,
    bin/run/pyp:6640): build a 3D mask from the newest map (or
    -model_path) and write <dataset>_mask.mrc."""
    params = _project_params(argv)
    import jax.numpy as jnp

    from pyp_tpu.core.filters import soft_spherical_mask
    from pyp_tpu.io import mrc
    from pyp_tpu.postprocess.core import auto_mask

    src = Path(params.get("model_path") or "")
    if not src.exists():
        maps = sorted(Path("maps").glob("*_half1.mrc"))
        if not maps:
            logger.error("mask: no -model_path and no maps/*_half1.mrc")
            return 1
        h1 = mrc.read(maps[-1]).astype(np.float32)
        h2 = mrc.read(str(maps[-1]).replace("half1", "half2")).astype(np.float32)
        vol, pixel = h1 + h2, mrc.read_header(maps[-1]).pixel_size
    else:
        vol = mrc.read(src).astype(np.float32)
        pixel = mrc.read_header(src).pixel_size
    method = str(params.get("mask_method") or "auto")
    n = vol.shape[-1]
    if method == "sphere":
        rad_px = float(params.get("mask_radius") or 0.0) / pixel or n * 0.4
        mask = np.asarray(soft_spherical_mask(
            n, rad_px, float(params.get("mask_edge_width") or 5.0)))
    elif method == "file":
        mask = mrc.read(params["mask_file"]).astype(np.float32)
    else:
        mask = np.asarray(auto_mask(
            jnp.asarray(vol), pixel_size=pixel,
            lowpass_a=float(params.get("mask_lowpass") or 15.0),
            threshold_sigmas=float(params.get("mask_threshold") or 1.0),
            dilation_px=int(params.get("mask_dilation") or 3),
            soft_px=int(params.get("mask_edge_width") or 6),
            mw_kda=float(params.get("mask_mw")
                         or params.get("particle_mw") or 0.0)))
    if params.get("mask_invert"):
        mask = 1.0 - mask
    if params.get("mask_normalized"):
        # normalize to the full [0, 1] range (reference mask tab
        # normalized: input models whose densities are not 0-1)
        lo, hi = float(mask.min()), float(mask.max())
        mask = (mask - lo) / max(hi - lo, 1e-9)
    ow = float(params.get("mask_outside_weight") or 0.0)
    if ow > 0:
        # keep a fraction of the outside density instead of zeroing it
        # (relion --outside_weight role): m' = w + (1-w) m
        mask = ow + (1.0 - ow) * mask
    out = f"{params.get('data_set') or 'dataset'}_mask.mrc"
    mrc.write(mask.astype(np.float32), out, pixel_size=pixel)
    print(json.dumps({"mask": out, "coverage":
                      round(float((mask > 0.5).mean()), 4)}))
    return 0


def mode_tomoedit(argv):
    """Edit tilt-series metadata (the reference's tomoedit driver,
    bin/run/pyp:3526): exclude tilts and/or drop virions; the resume-aware
    pipeline honors the exclusion on the next run (with the relevant
    _force flags)."""
    params = _project_params(argv, persist=False)
    from pyp_tpu.io.metadata import ItemMetadata

    name = str(params.get("edit_name") or "")
    if not name:
        logger.error("tomoedit needs -edit_name <tilt-series>")
        return 2
    meta = ItemMetadata(name, ".", mode="tomo").load()
    report = {"name": name}
    spec = str(params.get("edit_exclude_tilts") or "")
    if spec:
        drop = sorted({int(t) for t in spec.replace(",", ":").split(":")})
        keep = None
        for key in ("tlt", "xf", "ctf", "order"):
            if meta.is_done(key):
                arr = np.asarray(meta[key])
                if keep is None:
                    keep = np.setdiff1d(np.arange(len(arr)), drop)
                meta[key] = arr[keep[keep < len(arr)]]
        report["excluded_tilts"] = drop
    if params.get("edit_drop_virions"):
        if meta.is_done("vir"):
            meta["vir"] = np.zeros((0, 5), dtype=np.float32)
        report["virions_dropped"] = True
    meta.save()
    print(json.dumps(report))
    return 0


def mode_boxedit(argv):
    """Edit particle picks (the reference's boxedit driver,
    bin/run/pyp:3612): remove picks inside a circle, threshold by score,
    or replace with an imported .box file."""
    params = _project_params(argv, persist=False)
    from pyp_tpu.io import boxfiles
    from pyp_tpu.io.metadata import ItemMetadata

    name = str(params.get("edit_name") or "")
    if not name:
        logger.error("boxedit needs -edit_name <micrograph>")
        return 2
    meta = ItemMetadata(name, ".", mode="spr").load()
    box = np.asarray(meta["box"]) if meta.is_done("box") else np.zeros((0, 3))
    n0 = len(box)
    imp = str(params.get("edit_import_box") or "")
    if imp:
        coords, _w = boxfiles.read_box(imp)   # (N, 2) centers (y, x)
        box = np.concatenate([coords, np.ones((len(coords), 1))], axis=1)
    spec = str(params.get("edit_remove_circle") or "")
    if spec and len(box):
        cy, cx, r = (float(v) for v in spec.replace(",", ":").split(":"))
        d2 = (box[:, 0] - cy) ** 2 + (box[:, 1] - cx) ** 2
        box = box[d2 > r * r]
    thr = float(params.get("edit_min_score") or 0.0)
    if thr > 0 and box.shape[1] > 2:
        box = box[box[:, 2] >= thr]
    meta["box"] = box.astype(np.float32)
    meta.save()
    print(json.dumps({"name": name, "picks_before": n0,
                      "picks_after": int(len(box))}))
    return 0


def mode_sprtrain(argv):
    """Train the native NN particle picker from this project's picks (the
    reference's sprtrain entry, detect/joint.py:35): micrograph averages +
    box coordinates -> UNet heatmap model saved to picker_model.npz, which
    `-detect_method nn` then uses."""
    params = _project_params(argv)
    from pyp_tpu.sched import bridge

    if bridge.slurm_requested(params):
        print(json.dumps(bridge.submit_training("sprtrain", params, argv),
                         indent=1))
        return 0
    from pyp_tpu.io.metadata import ItemMetadata
    from pyp_tpu.models import io as mio
    from pyp_tpu.models import picker as nn_picker

    mics, coords = [], []
    for p in sorted(Path(".").glob("*.meta.npz")):
        meta = ItemMetadata(p.name.replace(".meta.npz", ""), ".",
                            mode="spr").load()
        if meta.is_done("box") and meta.is_done("average") and \
                len(meta["box"]):
            mics.append(np.asarray(meta["average"], dtype=np.float32))
            coords.append(np.asarray(meta["box"])[:, :2])
    if not mics:
        logger.error("sprtrain: no micrographs with picks in project dir")
        return 1
    pixel = float(params["scope_pixel"])
    radius_px = max(4, int(float(params["detect_rad"]) / pixel))
    tb = int(params.get("train_bin") or 1)
    if tb > 1:
        # training binning (detect_nn2d bin / detect_nn3d down_ratio):
        # Fourier-crop inputs and scale picks/radius to the small grid
        import jax.numpy as _jnp

        from pyp_tpu.core.fft import fourier_crop

        mics = [np.asarray(fourier_crop(
            _jnp.asarray(m), (m.shape[0] // tb, m.shape[1] // tb)),
            dtype=np.float32) for m in mics]
        coords = [np.asarray(c, dtype=np.float32) / tb for c in coords]
        radius_px = max(2, radius_px // tb)
    patch = int(params.get("train_patch") or 128)
    features = (8, 16, 32)
    model = nn_picker.train_picker(
        mics, coords, radius_px, patch=patch,
        steps=int(params.get("train_steps") or 300),
        batch=int(params.get("train_batch") or 16),
        lr=float(params.get("train_lr") or 3e-4),
        seed=int(params.get("train_seed") or 0),
        features=features,
    )
    mio.save_params(model.params, "picker_model.npz", patch=patch)
    print(json.dumps({"micrographs": len(mics),
                      "particles": int(sum(len(c) for c in coords)),
                      "model": "picker_model.npz"}))
    return 0


def mode_tomotrain(argv):
    """Train the NN picker for tomograms from .spk picks (tomotrain,
    detect/joint.py:210): per-slice heatmap supervision around each 3D
    pick; inference = models.picker.pick_tomogram."""
    params = _project_params(argv)
    from pyp_tpu.sched import bridge

    if bridge.slurm_requested(params):
        print(json.dumps(bridge.submit_training("tomotrain", params, argv),
                         indent=1))
        return 0
    from pyp_tpu.io import boxfiles, mrc
    from pyp_tpu.models import io as mio
    from pyp_tpu.models import picker as nn_picker

    pixel = float(params["scope_pixel"])
    rad_px = max(3, int(float(params["tomo_spk_rad"]) / max(
        pixel * int(params.get("tomo_rec_binning") or 8), 1e-6)))
    slices, coords = [], []
    for rec_path in sorted(Path(".").glob("*.rec.mrc")):
        spk = rec_path.with_name(rec_path.name.replace(".rec.mrc", ".spk"))
        if not spk.exists():
            continue
        # detect_nn3d use_denoised: train on the denoised tomogram when one
        # exists beside the raw reconstruction
        den = rec_path.with_name(rec_path.name.replace(".rec.mrc",
                                                       ".den.mrc"))
        if params.get("detect_nn3d_use_denoised", True) and den.exists():
            rec_path = den
        vol = mrc.read(rec_path).astype(np.float32)
        picks = boxfiles.read_spk(spk)          # (N, >=3) (z, y, x)
        for z in np.unique(np.round(picks[:, 0]).astype(int)):
            if not (0 <= z < vol.shape[0]):
                continue
            sel = np.abs(picks[:, 0] - z) < rad_px
            slices.append(vol[z])
            coords.append(picks[sel][:, 1:3])
    if not slices:
        logger.error("tomotrain: no *.rec.mrc with matching .spk picks")
        return 1
    patch = int(params.get("train_patch") or 128)
    steps = int(params.get("train_steps") or 300)
    if params.get("detect_nn3d_num_epochs"):
        # detect_nn3d num_epochs: one "epoch" covers the slice set with
        # ~100 sampled patches
        steps = int(params["detect_nn3d_num_epochs"]) * 100
    model = nn_picker.train_picker(
        slices, coords, rad_px, patch=patch,
        steps=steps,
        batch=int(params.get("train_batch") or 16),
        lr=float(params.get("train_lr") or 3e-4),
        seed=int(params.get("train_seed") or 0),
        features=(8, 16, 32),
    )
    mio.save_params(model.params, "picker_model_tomo.npz", patch=patch)
    print(json.dumps({"slices": len(slices), "model":
                      "picker_model_tomo.npz"}))
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("modes:", ", ".join(MODES))
        return 0
    mode, rest = argv[0], argv[1:]
    if mode not in MODES:
        print(f"unknown mode {mode!r}; available: {', '.join(MODES)}")
        return 2
    profile = "-profile" in rest  # cProfile wrapper (bin/run/pyp:4260)
    rest = [a for a in rest if a != "-profile"]
    try:  # invocation audit trail (the reference's .pyp_history);
        # suppressed during history REPLAY so replays don't double the file
        import os as _os
        import time as _time

        import shlex as _shlex

        if _os.environ.get("PYP_TPU_NO_HISTORY"):
            raise OSError("history suppressed")
        with open(".pyp_history", "a") as f:
            # shlex-quoted so tools/replay_history.py round-trips globs,
            # spaces, and criteria strings
            f.write(_time.strftime("%Y-%m-%d %H:%M:%S ")
                    + _shlex.join([mode] + rest) + "\n")
    except OSError:
        pass
    # multi-host: join a jax.distributed cluster when the scheduler exported
    # PYP_TPU_COORDINATOR/NUM_PROCS/PROC_ID (no-op for single-host runs)
    from pyp_tpu.parallel import init_distributed

    init_distributed()
    # radiation-damage model overrides (dose_critical_*) must land before
    # the first jitted dose_weight trace
    if any(f"-dose_critical_{k}" in " ".join(rest) for k in "abc"):
        from pyp_tpu.core.ctf import set_dose_model

        dp = cfg.parse_arguments(rest)
        set_dose_model(float(dp["dose_critical_a"]),
                       float(dp["dose_critical_b"]),
                       float(dp["dose_critical_c"]))
    # observability (notify tab): mongo-style log mirroring + completion mail
    saved = cfg.load_parameters(".") or {}
    mongo_uri = str(saved.get("notify_mongo_uri") or "")
    if mongo_uri:
        from pyp_tpu.utils.notify import attach_mongo_sink

        attach_mongo_sink(mongo_uri, webid=str(saved.get("notify_webid") or ""))
    if profile:
        import cProfile
        import pstats

        prof = cProfile.Profile()
        rc = prof.runcall(globals()[f"mode_{mode}"], rest)
        prof.dump_stats(f"profile_{mode}.prof")
        pstats.Stats(prof).sort_stats("cumulative").print_stats(15)
    else:
        rc = globals()[f"mode_{mode}"](rest)
    email = str(saved.get("notify_email") or "")
    notify_rule = str(saved.get("notify_on") or "always")
    if notify_rule == "never" or (notify_rule == "fail" and rc == 0):
        email = ""
    if email and mode in ("spr", "tomo", "refine", "csp", "classify3d"):
        from pyp_tpu.utils.notify import send_email

        send_email(email, f"pyp_tpu {mode} {'done' if rc == 0 else 'FAILED'}",
                   f"mode={mode} rc={rc} cwd={Path.cwd()}",
                   smtp_host=str(saved.get("notify_smtp") or "localhost"))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
