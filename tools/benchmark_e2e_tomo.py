"""Dataset-scale CSPT (tomo) benchmark: tools/benchmark_e2e_spa.py's analog
for the constrained tilt-series refinement path.

The honest synthetic stand-in for the reference's EMPIAR-10164 style
workload (BASELINE.md): several tilt series, each with dozens of particles
at known 3D positions/orientations inside a virtual tomogram, rendered with
tilt geometry + depth-dependent CTF + noise. The benchmark PERTURBS the
geometry (tilt angles, micrograph shifts, particle eulers/positions) and
runs the PRODUCTION pipeline (pipeline.csp.csp_swarm_one per series: grid
search + gradient modes 3:0:2:1, per-series reconstruction dumps ->
csp_merge global merge, SURVEY §3.4), timed end-to-end with host-readback
syncs. Reports per-stage wall time, geometry recovery (before/after), and
correlation + FSC of the subtomogram average against ground truth.

Run:  python tools/benchmark_e2e_tomo.py [n_series] [particles_per_series] [box]
      add "cpu" as any arg to force the CPU backend (e.g. while the TPU is
      busy); tilt count fixed at 41 (-60..60, 3 deg).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PYP_TPU_MEMWATCH", "1")


def _sync(x):
    """Host readback barrier (axon's block_until_ready returns early)."""
    return np.asarray(x).ravel()[0]


def make_series(vol, box, pixel, n_tilts, n_particles, ny, nx, noise, seed):
    """Ground-truth CspParams + rendered tilt images + per-tilt defocus."""
    import jax.numpy as jnp

    from pyp_tpu.core.fft import shift_images
    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops import fourier_slice as fs
    from pyp_tpu.ops.refine3d import _ctf_at_points

    rng = np.random.RandomState(seed)
    angles = np.linspace(-60, 60, n_tilts).astype(np.float32)
    true = csp_ops.make_params(
        angles,
        np.full(n_tilts, 3.0, dtype=np.float32),
        rng.uniform(-4, 4, (n_tilts, 2)).astype(np.float32),
        rng.uniform(0, 360, (n_particles, 3)).astype(np.float32),
        np.stack([
            rng.uniform(-20, 20, n_particles),
            rng.uniform(-(ny // 2 - box), ny // 2 - box, n_particles),
            rng.uniform(-(nx // 2 - box), nx // 2 - box, n_particles),
        ], 1).astype(np.float32),
    )
    R_eff = np.asarray(csp_ops.effective_rotations(true))
    pos = np.asarray(csp_ops.project_positions(true))
    depth = np.asarray(csp_ops.particle_depth(true))

    defocus = (20000.0 + 3000.0 * np.sin(np.radians(angles))).astype(np.float32)
    ky = (np.fft.fftfreq(box) * box).astype(np.float32)
    kx = np.arange(box // 2 + 1, dtype=np.float32)
    grid_pts = np.stack(np.meshgrid(ky, kx, indexing="ij"), -1)

    import jax

    @jax.jit
    def render_tilt(vol_r, R, df, frac):
        # everything complex stays INSIDE jit (the axon tunnel cannot run
        # eager complex ops or transfer complex arrays, SKILL.md); one
        # fused program per tilt: FFT -> slice -> CTF -> image -> shift
        Fv = fs.volume_to_fourier(vol_r)
        F = fs.project(Fv, R, box)
        ctf = _ctf_at_points(jnp.asarray(grid_pts)[None], box, pixel,
                             df[:, None, None], df[:, None, None],
                             0.0, 300.0, 2.7, 0.07, 0.0)
        return shift_images(fs.fourier_to_image(F * ctf, box), frac)

    images = rng.randn(n_tilts, ny, nx).astype(np.float32) * noise
    half = box // 2
    vol_r = jnp.asarray(vol)
    for t in range(n_tilts):
        df = defocus[t] + depth[t] * pixel
        cyx = pos[t] + np.array([ny // 2, nx // 2])
        iyx = np.round(cyx).astype(np.int64)
        frac = (cyx - iyx).astype(np.float32)
        wins = np.array(render_tilt(vol_r, jnp.asarray(R_eff[t]),
                                    jnp.asarray(df), jnp.asarray(frac)))
        for p in range(n_particles):
            iy, ix = iyx[p]
            images[t, iy - half:iy + half, ix - half:ix + half] += wins[p]
    return true, images, np.stack([defocus, defocus], 1)


def main(n_series=4, n_particles=32, box=48, force_cpu=False):
    if force_cpu:
        import os

        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import tempfile

    import jax.numpy as jnp

    from pyp_tpu.config.params import defaults
    from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
    from pyp_tpu.io.metadata import ItemMetadata
    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.pipeline import csp as csp_pipe

    pixel = 2.0
    # tilt-image size scales with the particle load so production shapes
    # (>=256 particles at box >=128) stay physical instead of stacking
    # every window onto the same 512^2 field
    n_tilts = 41
    ny = nx = max(512, int(np.ceil(np.sqrt(n_particles) * box * 1.25
                                   / 256.0)) * 256)
    rng = np.random.RandomState(0)
    t_all = time.perf_counter()

    # ---- ground truth + synthetic tilt series -----------------------------
    t0 = time.perf_counter()
    vol = rng.randn(box, box, box).astype(np.float32)
    vol *= np.asarray(soft_spherical_mask(box, box * 0.33, 3.0))
    vol = np.array(lowpass_filter_3d(jnp.asarray(vol), pixel, 3.0 * pixel)) * 20.0

    series = [make_series(vol, box, pixel, n_tilts, n_particles, ny, nx,
                          noise=0.15, seed=10 + s) for s in range(n_series)]
    t_synth = time.perf_counter() - t0
    n_proj = n_series * n_particles * n_tilts
    print(f"[synth] {n_series} series x {n_particles} particles x "
          f"{n_tilts} tilts ({n_proj} projections) in {t_synth:.1f}s")

    # ---- perturb geometry, run the production swarm -> merge --------------
    params = defaults()
    params.update({
        "scope_pixel": pixel, "csp_box": box, "csp_rlref": 60.0,
        "csp_rhref": "7", "csp_OptimizerIters": 20, "csp_transreg": 0.05,
        "csp_refine_modes": "3:0:2:1", "csp_GridSearch": True,
        "csp_ToleranceMicrographShifts": 6.0,
        "csp_ToleranceMicrographTiltAngles": 3.0,
        "csp_ToleranceParticlesPsi": 8.0, "csp_ToleranceParticlesShifts": 5.0,
    })

    stats = {"tilt_shift_before": [], "tilt_shift_after": [],
             "tilt_angle_before": [], "tilt_angle_after": [],
             "euler_before": [], "euler_after": []}
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        # production path: ALL series through the fused batch engine in one
        # csp_swarm_batch call (sharded across chips when a mesh exists) —
        # the per-series csp_swarm_one loop was the round-3 harness and
        # predates the fused engine
        items, perturb = [], []
        for s, (true, images, defocus) in enumerate(series):
            prng = np.random.RandomState(100 + s)
            d_ang = prng.uniform(-1.5, 1.5, n_tilts).astype(np.float32)
            d_shift = prng.uniform(-3, 3, (n_tilts, 2)).astype(np.float32)
            d_eul = prng.uniform(-5, 5, (n_particles, 3)).astype(np.float32)
            d_pos = prng.uniform(-2, 2, (n_particles, 3)).astype(np.float32)

            meta = ItemMetadata(f"ts{s}", td, mode="tomo")
            meta["tlt"] = np.asarray(true.tilt_angles) + d_ang
            meta["xf"] = np.concatenate([
                np.asarray(true.tilt_shifts) + d_shift,
                np.full((n_tilts, 1), 3.0),
            ], axis=1).astype(np.float32)
            meta["ctf"] = np.concatenate(
                [defocus, np.zeros((n_tilts, 3), np.float32)], axis=1)
            meta.save()

            items.append({
                "name": f"ts{s}", "tilts": images,
                "coords": np.asarray(true.particle_pos) + d_pos,
                "eulers": np.asarray(true.particle_eulers) + d_eul,
            })
            perturb.append((d_ang, d_shift, d_eul))

        refined_list, prev, scores_list, _ = csp_pipe.csp_swarm_batch(
            items, params, vol, td, iteration=2)

        for s, (true, _, _) in enumerate(series):
            refined = refined_list[s]
            d_ang, d_shift, d_eul = perturb[s]
            scores = scores_list[s]
            stats["tilt_shift_before"].append(np.abs(d_shift).mean())
            stats["tilt_shift_after"].append(np.abs(
                np.asarray(refined.tilt_shifts)
                - np.asarray(true.tilt_shifts)).mean())
            stats["tilt_angle_before"].append(np.abs(d_ang).mean())
            stats["tilt_angle_after"].append(np.abs(
                np.asarray(refined.tilt_angles)
                - np.asarray(true.tilt_angles)).mean())
            err0 = np.abs(((d_eul + 180) % 360) - 180).mean()
            errs = np.asarray(refined.particle_eulers) - np.asarray(
                true.particle_eulers)
            err1 = np.abs(((errs + 180) % 360) - 180).mean()
            stats["euler_before"].append(err0)
            stats["euler_after"].append(err1)
            print(f"[swarm ts{s}] score {scores[0]:.4f} -> {scores[-1]:.4f}; "
                  f"tilt-shift err {stats['tilt_shift_before'][-1]:.2f} -> "
                  f"{stats['tilt_shift_after'][-1]:.2f} px; euler err "
                  f"{err0:.2f} -> {err1:.2f} deg")

        t_refine = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, res = csp_pipe.csp_merge([prev], box, params, td, "bench")
        _sync(out.volume)
        t_merge = time.perf_counter() - t0

    cc = float(np.corrcoef(np.asarray(out.volume).ravel(), vol.ravel())[0, 1])
    t_total = time.perf_counter() - t_all
    summary = {
        "metric": "cspt_e2e_projections_per_sec",
        "value": round(n_proj / t_refine, 2),
        "unit": "proj/s",
        "n_series": n_series, "n_particles": n_particles,
        "n_tilts": n_tilts, "box": box,
        "t_synth_s": round(t_synth, 1), "t_refine_s": round(t_refine, 1),
        "t_merge_s": round(t_merge, 1), "t_total_s": round(t_total, 1),
        "map_cc_vs_truth": round(cc, 3),
        "fsc_resolution_A": round(float(res), 2),
        "tilt_shift_err_px": [round(float(np.mean(stats["tilt_shift_before"])), 2),
                              round(float(np.mean(stats["tilt_shift_after"])), 2)],
        "tilt_angle_err_deg": [round(float(np.mean(stats["tilt_angle_before"])), 2),
                               round(float(np.mean(stats["tilt_angle_after"])), 2)],
        "euler_err_deg": [round(float(np.mean(stats["euler_before"])), 2),
                          round(float(np.mean(stats["euler_after"])), 2)],
    }
    from pyp_tpu.utils import memwatch

    mw = memwatch.report()
    summary["hbm_live_GiB"] = round(mw["live_bytes"] / 2**30, 2)
    summary["hbm_program_peak_GiB"] = round(max(
        (p["peak_bytes"] for p in mw["programs"].values()), default=0)
        / 2**30, 2)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "cpu"]
    force_cpu = "cpu" in sys.argv[1:]
    n_series = int(argv[0]) if len(argv) > 0 else 4
    n_particles = int(argv[1]) if len(argv) > 1 else 32
    box = int(argv[2]) if len(argv) > 2 else 48
    main(n_series, n_particles, box, force_cpu=force_cpu)
