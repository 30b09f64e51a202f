"""CSP throughput probe: bench_csp's shape swept over the dispatch levers.

Measures csp_refine_batch wall per configuration — series_per_dispatch
(chunk size), series_vmap (vectorize vs sequentially map the chunk's
series), optional grid-search path — with memwatch per-program peaks, so
the 20x decision (VERDICT r5 item 2) is made from numbers, not guesses.

Usage:
  python tools/probe_csp_tpu.py                 # default sweep
  python tools/probe_csp_tpu.py --configs 2:0 8:1 --gs
  (each config is series_per_dispatch:vmap_flag)
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PYP_TPU_MEMWATCH", "1")


def build_problem(S, T, P, box, pixel=2.0):
    import jax
    import jax.numpy as jnp

    from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops.fourier_slice import volume_to_fourier
    from pyp_tpu.ops.refine3d import make_mask_points

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
    # complex window samples synthesized ON DEVICE (axon tunnel cannot
    # transfer complex arrays host<->device)
    xv_b = jax.jit(lambda k: jax.lax.complex(
        jax.random.normal(k, (S, T, P, G), jnp.float32),
        jax.random.normal(jax.random.fold_in(k, 1), (S, T, P, G),
                          jnp.float32)))(jax.random.PRNGKey(11))
    wc_b = jnp.zeros((S, T, P, 2), jnp.float32)
    df_b = jnp.full((S, T, 2), 15000.0, jnp.float32)
    tw_b = jnp.ones((S, T), jnp.float32)
    va_b = jnp.ones((S, T, P), jnp.float32)
    print(f"problem: S={S} T={T} P={P} box={box} G={G}", flush=True)
    return (cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b)


def _readback_sync(jax, x):
    """Host readback barrier (block_until_ready lies through the tunnel)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.tree.leaves(x)[0].ravel()[0] if hasattr(leaf, "ravel")
               else leaf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--series", type=int, default=8)
    ap.add_argument("--tilts", type=int, default=41)
    ap.add_argument("--particles", type=int, default=128)
    ap.add_argument("--box", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--gs", action="store_true",
                    help="include the grid-search (csp_GS) schedule")
    ap.add_argument("--configs", nargs="*", default=None,
                    help="series_per_dispatch:vmap pairs, e.g. 2:0 4:0 4:1 8:1")
    args = ap.parse_args()

    import jax

    from pyp_tpu.ops import csp as csp_ops

    S, T, P = args.series, args.tilts, args.particles
    prob = build_problem(S, T, P, args.box)
    modes = (3, 0, 2, 1)
    offs = ((None,) * len(modes), None)
    if args.gs:
        offs = csp_ops.build_mode_offsets(
            modes, {3: 10.0, 0: (2.0, 0.0), 2: 10.0,
                    1: (10.0, 10.0, 10.0)}, 9)

    configs = args.configs or ["1:0", "2:0", "4:0", "8:0", "2:1", "4:1",
                               "8:1"]
    results = []
    for cfgs in configs:
        spd, vm = (int(x) for x in cfgs.split(":"))
        if spd > S:
            continue
        label = f"spd={spd} vmap={bool(vm)} gs={args.gs}"
        try:
            t0 = time.perf_counter()
            out = csp_ops.csp_refine_batch(
                *prob, offs[0], offs[1], modes, args.box, 2.0,
                iters_per_mode=args.iters, series_per_dispatch=spd,
                series_vmap=bool(vm))
            _readback_sync(jax, out[1])
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = csp_ops.csp_refine_batch(
                *prob, offs[0], offs[1], modes, args.box, 2.0,
                iters_per_mode=args.iters, series_per_dispatch=spd,
                series_vmap=bool(vm))
            _readback_sync(jax, out[1])
            t_warm = time.perf_counter() - t0
            pps = S * T * P / t_warm
            print(f"{label}: cold={t_cold:.1f}s warm={t_warm:.1f}s "
                  f"-> {pps:.0f} proj/s (vs 50 baseline: {pps / 50:.1f}x)",
                  flush=True)
            results.append({"config": label, "warm_s": round(t_warm, 2),
                            "proj_per_s": round(pps, 1)})
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            results.append({"config": label, "error": str(e)[:160]})

    from pyp_tpu.utils import memwatch

    print(json.dumps({"results": results, "hbm": memwatch.report()},
                     indent=1, default=str), flush=True)


if __name__ == "__main__":
    main()
