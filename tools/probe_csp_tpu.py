"""Bisect the fused-CSP TPU crash: run bench_csp's exact shape at given
S (series) / P (particles) / iters and report wall + HBM.

Usage: python tools/probe_csp_tpu.py [S] [P] [iters] [T] [box]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(S=2, P=32, iters=20, T=41, box=64):
    import jax
    import jax.numpy as jnp

    from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
    from pyp_tpu.ops import csp as csp_ops
    from pyp_tpu.ops.fourier_slice import volume_to_fourier
    from pyp_tpu.ops.refine3d import make_mask_points

    pixel = 2.0
    rng = np.random.RandomState(11)
    vol = rng.randn(box, box, box).astype(np.float32)
    vol *= np.asarray(soft_spherical_mask(box, box * 0.33, 2.0))
    vol = np.asarray(lowpass_filter_3d(jnp.asarray(vol), pixel, 3.0 * pixel))
    Fref = volume_to_fourier(jnp.asarray(vol))
    mask_np = make_mask_points(box, pixel, 60.0, 8.0)
    mask_pts = jnp.asarray(mask_np)
    G = mask_np.shape[0]
    print(f"S={S} T={T} P={P} box={box} G={G} iters={iters}", flush=True)

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
    xv_b = jax.jit(lambda k: jax.lax.complex(
        jax.random.normal(k, (S, T, P, G), jnp.float32),
        jax.random.normal(jax.random.fold_in(k, 1), (S, T, P, G),
                          jnp.float32)))(jax.random.PRNGKey(11))
    wc_b = jnp.zeros((S, T, P, 2), jnp.float32)
    df_b = jnp.full((S, T, 2), 15000.0, jnp.float32)
    tw_b = jnp.ones((S, T), jnp.float32)
    va_b = jnp.ones((S, T, P), jnp.float32)
    modes = (3, 0, 2, 1)

    t0 = time.perf_counter()
    _, mode_scores, _ = csp_ops.csp_refine_batch(
        cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
        (None,) * len(modes), None, modes, box, pixel,
        iters_per_mode=iters)
    jax.block_until_ready(mode_scores)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, mode_scores, _ = csp_ops.csp_refine_batch(
        cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
        (None,) * len(modes), None, modes, box, pixel,
        iters_per_mode=iters)
    jax.block_until_ready(mode_scores)
    t_warm = time.perf_counter() - t0
    ms = jax.local_devices()[0].memory_stats() or {}
    print(f"OK compile={t_compile:.1f}s warm={t_warm:.1f}s "
          f"proj/s={S * T * P / t_warm:.0f} "
          f"hbm_peak={ms.get('peak_bytes_in_use', 0) / 2**30:.2f}GiB",
          flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
