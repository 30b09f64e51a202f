"""Benchmarks: the three north-star metrics (BASELINE.md:26) on one chip.

Prints ONE JSON line. Headline (metric/value/unit/vs_baseline) is
refine3d-equivalent local-refinement throughput; `extras` carries the other
recorded metrics so every BASELINE.md north-star number lands in BENCH_r*.json:

  - refine3d_local_gather_particles_per_sec_per_chip: the gather-based
    autodiff local-refinement path (ops/refine3d.local_refine), kept for
    transparency — XLA random gathers cap it at a few hundred p/s.
    Baseline: cisTEM2 refine3d local ~40 particles/sec on a 16-core node.
  - preprocess_micrographs_per_min_per_chip: K3-size (40 x 4096^2) movie
    motion correction (HBM-frugal binned+scan path) + CTF fit. Baseline:
    reference GPU pipelines (MotionCor3 + CTFFIND4) ~4 micrographs/min.
  - tomo_wbp_voxels_per_sec_per_chip: weighted backprojection of a 41-tilt
    1024^2 series into a 256-slab tomogram. Baseline: IMOD `tilt` on a
    16-core node ~5e7 voxels/sec.

Headline workload: the FRM engine (ops/frm.py) running a FULL exhaustive
orientation + shift search per particle — 7.5 deg direction lattice x 256
in-plane angles x 29 coarse shifts + fine shift grid, 25-4 Å band, 128 px
boxes — the refine3d-equivalent global mode (SURVEY §3.3/§A.1). Baseline:
the reference wraps cisTEM2 refine3d (CPU); its global mode runs
~0.5 particles/sec/core ≈ 8 particles/sec on a 16-core SLURM node.

NOTE on round-1 numbers: BENCH_r01 values were recorded with
block_until_ready(), which does NOT wait for execution through the axon
tunnel; every timing here syncs with a host readback (_sync).
"""

import json
import os
import sys
import time

import numpy as np

# HBM telemetry is part of the bench contract (the extras hbm block must
# never read 0/0 again — VERDICT r4 weak #3); memwatch costs one extra
# lowering per instrumented program shape.
os.environ.setdefault("PYP_TPU_MEMWATCH", "1")

BASELINE_GLOBAL_PPS = 8.0     # cisTEM2 refine3d global mode, 16-core node
BASELINE_LOCAL_PPS = 40.0     # cisTEM2 refine3d local mode, 16-core node
BASELINE_PREPROC_MPM = 4.0    # MotionCor3+CTFFIND GPU pipeline, mics/min
BASELINE_WBP_VPS = 5e7        # IMOD tilt, 16-core node, voxels/sec
BASELINE_INSERT_PPS = 45.0    # cisTEM2 reconstruct3d, 16-core node
# CSP binary (Powell per block, MPI over cores): EMPIAR-10164-scale jobs
# (~4k particles x 41 tilts = 164k projections) take 1-2 h per refinement
# pass per node in the reference tutorials => ~25-45 projections/sec/node;
# 50 is the generous end (favors the reference).
BASELINE_CSP_PROJ_PS = 50.0

N = 128
PIXEL = 1.0
BATCH = 256  # measured sweet spot: insertion/gather throughput rises with
             # batch (893 -> 1,156 p/s from 64 -> 256) as fixed cost amortizes
ITERS = 16


def _sync(x):
    """Force completion of the computation producing `x`.

    block_until_ready() through the axon tunnel can return before the
    program actually executes (measured: a 386 ms local_refine 'completes'
    in 0.04 ms under block_until_ready but takes its full time under a
    host readback) — so a 1-element readback is the only trustworthy
    barrier. The readback itself costs one tunnel round-trip (~25 ms),
    amortized over `inner` calls by the timing loop."""
    import numpy as _np

    _np.asarray(x.ravel()[0])


def _timed(fn, reps=3, inner=1):
    """Best-of-`reps` wall time of `inner` back-to-back calls followed by
    one forced readback (device executes the queue serially, so the final
    sync covers all `inner` dispatches)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def bench_frm(jax, jnp, Fref):
    """Headline: FRM full exhaustive search, B=256."""
    from pyp_tpu.ops import frm

    B = 256
    rng = np.random.RandomState(3)
    stack = jnp.asarray(rng.randn(B, N, N).astype(np.float32))
    df = rng.uniform(10000, 25000, B).astype(np.float32)
    ctf = jnp.asarray(np.stack(
        [df + 300, df - 300, np.full(B, 40.0), np.zeros(B)], 1
    ).astype(np.float32))
    cfg = frm.FrmConfig(N, PIXEL, low_res=25.0, high_res=4.0,
                        angular_step=7.5, shift_extent=6.0, shift_step=1.0,
                        rounds=2)
    bank = cfg.bank(Fref)
    _sync(bank.u2sum)

    def run():
        _, scores = frm.frm_refine(stack, ctf, None, cfg, bank=bank)
        return scores

    _sync(run())  # compile
    return B / _timed(run, reps=2, inner=1)


def bench_local_gather(jnp, r3, Fref, stack, ctf_params, poses, mask_pts):
    def run():
        _, scores = r3.local_refine(
            stack, ctf_params, Fref, poses, mask_pts, N, PIXEL, iters=ITERS,
        )
        return scores

    _sync(run())  # compile
    return BATCH / _timed(run, reps=2, inner=1)


def bench_preprocess(jax, jnp):
    from pyp_tpu.ops import motion
    from pyp_tpu.ops.ctf_fit import fit_ctf_micrograph

    # synthesize ON DEVICE: shipping a 2.7 GB host array through the
    # tunnel costs ~3 minutes and measures nothing about the chip
    frames = jax.jit(
        lambda k: jax.random.normal(k, (40, 4096, 4096), dtype=jnp.float32)
    )(jax.random.PRNGKey(1))
    _sync(frames)

    def run():
        res = motion.align_movie_large(frames, pixel_size=PIXEL, binning=2)
        return res.average

    avg = run()
    _sync(avg)  # compile
    dt_motion = _timed(run, reps=2, inner=1)

    # CTF on the device-resident average (the production path keeps it on
    # device between motion and CTF — pipeline/spr.py average_dev)
    def run_ctf():
        return fit_ctf_micrograph(avg, PIXEL).df1

    _sync(run_ctf())  # compile
    dt_ctf = _timed(run_ctf, reps=2, inner=1)
    return 60.0 / (dt_motion + dt_ctf)


def bench_insertion(jax, jnp):
    """Fourier-slice insertion (reconstruct3d role): both half-sets, one
    flat one-pass scatter (ops/fourier_slice.insert_slices_halves). The
    XLA TPU scatter unit caps this at ~100M f32 updates/s (measured across
    window widths, dtypes, sorted/unique hints — tools/microbench_scatter);
    the band-limited crop path recovers (n/n_rec)^2 of it in production.
    Baseline: cisTEM2 reconstruct3d ~45 particles/sec/node."""
    from pyp_tpu.core.geometry import euler_to_matrix
    from pyp_tpu.ops import fourier_slice as fs

    rng = np.random.RandomState(3)
    B = 256  # the production reconstruct_batch default (insertion
    # throughput rises with batch: 893/1058/1156 p/s at B=64/128/256 —
    # per-scatter fixed cost amortizes over more points)
    re = jnp.asarray(rng.randn(B, N, N // 2 + 1).astype(np.float32))
    im = jnp.asarray(rng.randn(B, N, N // 2 + 1).astype(np.float32))
    ctfs = jnp.asarray(rng.rand(B, N, N // 2 + 1).astype(np.float32))
    phi = jnp.asarray(rng.uniform(0, 360, B).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0, 180, B).astype(np.float32))
    psi = jnp.asarray(rng.uniform(0, 360, B).astype(np.float32))
    subset = jnp.asarray((np.arange(B) % 2).astype(np.int32))
    w = jnp.ones(B, jnp.float32)

    @jax.jit
    def run(re, im, ctfs, phi, theta, psi):
        F = jax.lax.complex(re, im)
        R = euler_to_matrix(phi, theta, psi)
        n1, d1, n2, d2 = fs.insert_slices_halves(F, ctfs, R, subset, w, N)
        return d1.ravel()[:1] + d2.ravel()[:1]

    _sync(run(re, im, ctfs, phi, theta, psi))  # compile
    dt = _timed(lambda: run(re, im, ctfs, phi, theta, psi), reps=2)
    return B / dt


def bench_csp(jax, jnp):
    """CSP joint-refinement throughput (the cspswarm hot loop): a BATCH of
    tilt-series through the full fused mode schedule 3:0:2:1 (gradient
    polish, 20 iters/mode) in ONE dispatch (ops/csp.csp_refine_batch).
    Production shape: 8 series x 41 tilts x 128 particles = 41,984
    projections per dispatch. Grid search (csp_GS) is off here, matching
    the schema default; the e2e benchmark exercises it separately.
    Baseline: reference CSP binary ~50 projections/sec/node (see
    BASELINE_CSP_PROJ_PS note)."""
    from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops.fourier_slice import volume_to_fourier
    from pyp_tpu.ops.refine3d import make_mask_points

    S, T, P, box = 8, 41, 128, 64
    pixel = 2.0
    rng = np.random.RandomState(11)
    vol = rng.randn(box, box, box).astype(np.float32)
    vol *= np.asarray(soft_spherical_mask(box, box * 0.33, 2.0))
    vol = np.asarray(lowpass_filter_3d(jnp.asarray(vol), pixel, 3.0 * pixel))
    Fref = volume_to_fourier(jnp.asarray(vol))
    mask_np = make_mask_points(box, pixel, 60.0, 8.0)
    mask_pts = jnp.asarray(mask_np)
    G = mask_np.shape[0]

    cp_b = csp_ops.CspParams(
        tilt_angles=jnp.asarray(np.tile(
            np.linspace(-60, 60, T, dtype=np.float32), (S, 1))),
        axis_angles=jnp.zeros((S, T), jnp.float32),
        tilt_shifts=jnp.asarray(
            rng.uniform(-2, 2, (S, T, 2)).astype(np.float32)),
        particle_eulers=jnp.asarray(
            rng.uniform(0, 360, (S, P, 3)).astype(np.float32)),
        particle_pos=jnp.asarray(
            rng.uniform(-100, 100, (S, P, 3)).astype(np.float32)),
        defocus_offsets=jnp.zeros((S, T), jnp.float32),
    )
    # complex window samples are synthesized ON DEVICE: the axon tunnel
    # cannot transfer complex arrays host<->device (verify SKILL gotcha —
    # a host-side complex jnp.asarray threw UNIMPLEMENTED here and then
    # wedged every later fresh compile in the process, taking the WBP
    # axis down with it)
    xv_b = jax.jit(lambda k: jax.lax.complex(
        jax.random.normal(k, (S, T, P, G), jnp.float32),
        jax.random.normal(jax.random.fold_in(k, 1), (S, T, P, G),
                          jnp.float32)))(jax.random.PRNGKey(11))
    wc_b = jnp.zeros((S, T, P, 2), jnp.float32)
    df_b = jnp.full((S, T, 2), 15000.0, jnp.float32)
    tw_b = jnp.ones((S, T), jnp.float32)
    va_b = jnp.ones((S, T, P), jnp.float32)
    modes = (3, 0, 2, 1)

    # self-probing: measure the conservative tunnel-safe dispatch config
    # (series_per_dispatch=2, sequential lax.map) AND the vectorized
    # whole-batch config (spd=8 + series_vmap) and report the best — the
    # dispatch shape is a runtime tuning knob, not a quality choice
    def run_cfg(spd, vm):
        def run():
            _, mode_scores, _ = csp_ops.csp_refine_batch(
                cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
                (None,) * len(modes), None, modes, box, pixel,
                iters_per_mode=20, series_per_dispatch=spd,
                series_vmap=vm)
            return mode_scores
        return run

    best = None
    for spd, vm in ((2, False), (8, True)):
        run = run_cfg(spd, vm)
        try:
            _sync(run())  # compile
            dt_c = _timed(run, reps=2, inner=1)
        except Exception as e:  # noqa: BLE001 — config may exceed memory
            print(f"[bench] csp cfg spd={spd} vmap={vm} failed: "
                  f"{str(e)[:120]}", file=sys.stderr, flush=True)
            continue
        print(f"[bench] csp cfg spd={spd} vmap={vm}: "
              f"{S * T * P / dt_c:.0f} proj/s", file=sys.stderr, flush=True)
        if best is None or dt_c < best:
            best = dt_c
    dt = best

    # the csp_GS production mode (grid search before each gradient polish,
    # reference csp_GridSearch + csp_Tolerance*): default tolerances at the
    # schema's grid_steps=9 — the most expensive configuration users run
    offsets_by_mode = csp_ops.build_mode_offsets(
        modes, {3: 10.0, 0: (2.0, 0.0), 2: 10.0, 1: (10.0, 10.0, 10.0)}, 9)

    def run_gs_cfg(spd, vm):
        def run_gs():
            _, mode_scores, _ = csp_ops.csp_refine_batch(
                cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
                offsets_by_mode[0], offsets_by_mode[1], modes, box, pixel,
                iters_per_mode=20, series_per_dispatch=spd, series_vmap=vm)
            return mode_scores
        return run_gs

    dt_gs = None
    for spd, vm in ((2, False), (8, True)):
        run_gs = run_gs_cfg(spd, vm)
        try:
            _sync(run_gs())
            d = _timed(run_gs, reps=2, inner=1)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] csp_GS cfg spd={spd} vmap={vm} failed: "
                  f"{str(e)[:120]}", file=sys.stderr, flush=True)
            continue
        print(f"[bench] csp_GS cfg spd={spd} vmap={vm}: "
              f"{S * T * P / d:.0f} proj/s", file=sys.stderr, flush=True)
        if dt_gs is None or d < dt_gs:
            dt_gs = d
    return S * T * P / dt, S * T * P / dt_gs


def bench_wbp(jax, jnp):
    from pyp_tpu.ops.tomo import wbp_reconstruct

    T, ny, nx, thick = 41, 1024, 1024, 256
    tilts = jax.jit(
        lambda k: jax.random.normal(k, (T, ny, nx), dtype=jnp.float32)
    )(jax.random.PRNGKey(2))
    _sync(tilts)
    angles = jnp.linspace(-60.0, 60.0, T)

    def run():
        return wbp_reconstruct(tilts, angles, thickness=thick)

    _sync(run())
    dt = _timed(run, reps=2, inner=1)
    return thick * ny * nx / dt


_PROGRESS = {"headline": None, "extras": {}, "emitted": False}


def _emit(headline_pps, extras):
    if _PROGRESS["emitted"]:   # exactly ONE JSON line, ever
        return
    _PROGRESS["emitted"] = True
    print(json.dumps({
        "metric": "refine3d_full_search_particles_per_sec_per_chip",
        "value": round(headline_pps, 2) if headline_pps else 0.0,
        "unit": "particles/sec/chip",
        "vs_baseline": (round(headline_pps / BASELINE_GLOBAL_PPS, 2)
                        if headline_pps else 0.0),
        "extras": extras,
    }), flush=True)


def _arm_watchdog(timeout_s: float = 2100.0):
    """The axon compile service can hang a fresh compile indefinitely; if
    the run exceeds `timeout_s`, emit whatever sections completed (marked
    incomplete) so the driver always records a JSON line, then hard-exit —
    the timer thread can run while the main thread is blocked in XLA."""
    import os
    import sys
    import threading

    def die():
        extras = dict(_PROGRESS["extras"])
        extras["incomplete"] = {
            "error": "watchdog: axon tunnel stalled; partial results only"}
        # attach the LAST RECORDED round's numbers, clearly labeled stale —
        # an outage of the experimental tunnel says nothing about the code
        try:
            import glob
            latest = sorted(glob.glob("BENCH_r*.json"))[-1]
            with open(latest) as f:
                prev = json.load(f)
            extras["stale_last_recorded"] = {
                "note": "previous round's measured values (tunnel down "
                "this run; NOT fresh measurements)",
                "tail": prev.get("tail", "")[:800],
            }
        except Exception:  # noqa: BLE001
            pass
        _emit(_PROGRESS["headline"], extras)
        sys.stdout.flush()
        os._exit(0)

    t = threading.Timer(timeout_s, die)
    t.daemon = True
    t.start()
    return t


def main():
    import sys

    _arm_watchdog()

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the benchmark's cost is dominated by
    # fresh-process XLA compiles (~6-8 min); cached reruns take ~1 min
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pyp_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — older jax without the knobs
        pass

    from pyp_tpu.ops import refine3d as r3
    from pyp_tpu.ops.fourier_slice import volume_to_fourier

    rng = np.random.RandomState(0)
    vol = rng.randn(N, N, N).astype(np.float32)
    Fref = volume_to_fourier(jnp.asarray(vol))

    stack = jnp.asarray(rng.randn(BATCH, N, N).astype(np.float32))
    df = rng.uniform(10000, 25000, BATCH).astype(np.float32)
    ctf_params = jnp.asarray(np.stack(
        [df + 300, df - 300, np.full(BATCH, 40.0), np.zeros(BATCH)], 1
    ).astype(np.float32))
    poses = jnp.asarray(np.stack(
        [
            rng.uniform(0, 360, BATCH),
            rng.uniform(0, 180, BATCH),
            rng.uniform(0, 360, BATCH),
            np.zeros(BATCH),
            np.zeros(BATCH),
        ],
        1,
    ).astype(np.float32))
    mask_pts = jnp.asarray(r3.make_mask_points(N, PIXEL, 25.0, 4.0))

    print("[bench] frm...", file=sys.stderr, flush=True)
    frm_pps = bench_frm(jax, jnp, Fref)
    _PROGRESS["headline"] = frm_pps
    print(f"[bench] frm {frm_pps:.0f} p/s", file=sys.stderr, flush=True)

    extras = _PROGRESS["extras"]
    print("[bench] local gather...", file=sys.stderr, flush=True)
    try:
        g = bench_local_gather(jnp, r3, Fref, stack, ctf_params, poses,
                               mask_pts)
        extras["refine3d_local_gather_particles_per_sec_per_chip"] = {
            "value": round(g, 2), "unit": "particles/sec/chip",
            "vs_baseline": round(g / BASELINE_LOCAL_PPS, 2),
        }
    except Exception as e:  # noqa: BLE001
        extras["refine3d_local_gather_particles_per_sec_per_chip"] = {"error": str(e)[:200]}
    print("[bench] preprocess...", file=sys.stderr, flush=True)
    try:
        m = bench_preprocess(jax, jnp)
        extras["preprocess_micrographs_per_min_per_chip"] = {
            "value": round(m, 2), "unit": "micrographs/min/chip",
            "vs_baseline": round(m / BASELINE_PREPROC_MPM, 2),
        }
    except Exception as e:  # noqa: BLE001
        extras["preprocess_micrographs_per_min_per_chip"] = {"error": str(e)[:200]}
    print("[bench] insertion...", file=sys.stderr, flush=True)
    try:
        ins = bench_insertion(jax, jnp)
        extras["reconstruct_insertion_particles_per_sec_per_chip"] = {
            "value": round(ins, 1), "unit": "particles/sec/chip",
            "vs_baseline": round(ins / BASELINE_INSERT_PPS, 2),
        }
    except Exception as e:  # noqa: BLE001
        extras["reconstruct_insertion_particles_per_sec_per_chip"] = {
            "error": str(e)[:200]}
    print("[bench] csp...", file=sys.stderr, flush=True)
    try:
        c, c_gs = bench_csp(jax, jnp)
        extras["csp_projections_per_sec_per_chip"] = {
            "value": round(c, 1), "unit": "projections/sec/chip",
            "vs_baseline": round(c / BASELINE_CSP_PROJ_PS, 2),
        }
        # grid-search-enabled path (csp_GS — the expensive production
        # mode); same 50 proj/s baseline: the reference binary's wall
        # already includes its grid searches
        extras["csp_gridsearch_projections_per_sec_per_chip"] = {
            "value": round(c_gs, 1), "unit": "projections/sec/chip",
            "vs_baseline": round(c_gs / BASELINE_CSP_PROJ_PS, 2),
        }
    except Exception as e:  # noqa: BLE001
        extras["csp_projections_per_sec_per_chip"] = {"error": str(e)[:200]}
    print("[bench] wbp...", file=sys.stderr, flush=True)
    try:
        v = bench_wbp(jax, jnp)
        extras["tomo_wbp_voxels_per_sec_per_chip"] = {
            "value": round(v, 0), "unit": "voxels/sec/chip",
            "vs_baseline": round(v / BASELINE_WBP_VPS, 2),
        }
    except Exception as e:  # noqa: BLE001
        extras["tomo_wbp_voxels_per_sec_per_chip"] = {"error": str(e)[:200]}

    # HBM telemetry — the regression guard for the production-scale work.
    # device.memory_stats() is dead through the axon tunnel (returns None;
    # VERDICT r4 weak #3), so the primary source is memwatch: per-program
    # compiled peaks (XLA memory_analysis) + live device-buffer bytes.
    # The assert keeps this from silently going dark again.
    try:
        from pyp_tpu.utils import memwatch

        mw = memwatch.report()
        stats = memwatch.device_memory_stats()
        prog_peak = max((p["peak_bytes"] for p in mw["programs"].values()),
                        default=0)
        extras["hbm"] = {
            "live_bytes": int(mw["live_bytes"]),
            "max_program_peak_bytes": int(prog_peak),
            "programs": {k: int(v["peak_bytes"])
                         for k, v in mw["programs"].items()},
            "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
            "bytes_limit": int(stats.get("bytes_limit", 0)),
        }
        assert mw["live_bytes"] > 0 or prog_peak > 0 or stats.get(
            "peak_bytes_in_use"), (
            "HBM telemetry dark: memwatch live/program bytes AND "
            "memory_stats all zero (run with PYP_TPU_MEMWATCH=1)")
    except AssertionError:
        raise
    except Exception as e:  # noqa: BLE001
        extras["hbm"] = {"error": str(e)[:200]}

    _emit(frm_pps, extras)


if __name__ == "__main__":
    # the axon compile service is occasionally flaky (UNIMPLEMENTED on fresh
    # compiles); one retry in-process after a short pause rescues those runs
    try:
        main()
    except Exception:  # noqa: BLE001
        import sys
        import time as _time
        import traceback

        traceback.print_exc(file=sys.stderr)
        print("[bench] first attempt failed; retrying in 120 s",
              file=sys.stderr, flush=True)
        _time.sleep(120)
        try:
            main()
        except Exception as e:  # noqa: BLE001
            # a dead tunnel must still leave the driver a JSON line:
            # partial sections + the error + clearly-labeled stale numbers
            traceback.print_exc(file=sys.stderr)
            extras = dict(_PROGRESS["extras"])
            extras["incomplete"] = {
                "error": ("tunnel failure after retry: " + str(e)[:200])}
            try:
                import glob as _glob
                with open(sorted(_glob.glob("BENCH_r*.json"))[-1]) as f:
                    prev = json.load(f)
                extras["stale_last_recorded"] = {
                    "note": "previous round's measured values (tunnel down "
                    "this run; NOT fresh measurements)",
                    "tail": prev.get("tail", "")[:800],
                }
            except Exception:  # noqa: BLE001
                pass
            _emit(_PROGRESS["headline"], extras)
