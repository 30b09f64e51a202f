"""Microbenchmark: TPU scatter-add formulations for Fourier-slice insertion.

The reconstruct3d-equivalent (ops/fourier_slice.insert_slices_halves) is
scatter-bound: per particle it adds 8 trilinear corners x n x (n//2+1)
points x 3 values (Re, Im, CTF^2) into a pad^3-oversampled half-spectrum
grid. Round-2 measured ~60M single-element f32 scatter updates/s on this
chip, capping insertion at ~186 particles/s (box 128, pad 2).

This tool measures whether XLA's TPU scatter throughput is per-UPDATE or
per-ELEMENT by widening the update window:

  v0 single   : 3 scatters of single f32 elements (round-2 formulation)
  v1 vec3     : 1 scatter into a (size, 3) buffer  -> window (3,)
  v2 pair     : 1 scatter into a (size+1, 3) buffer, x-adjacent corner
                pairs fused                        -> window (2, 3)
  v3 cube     : 1 scatter with 4D indices into (pn+1, pn+1, nxf+1, 3),
                whole 2x2x2 trilinear neighborhood -> window (2, 2, 2, 3)
  v4 cube_h   : v3 with a leading half-set axis (the production halves
                layout)                            -> window (1, 2, 2, 2, 3)

All variants consume identical per-point (idx, re, im, c2) data so the
measured delta is purely the scatter formulation. Run on the real chip:
    python tools/microbench_scatter.py [--n 128] [--pad 2] [--batch 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(x.ravel()[0])


def _timed(fn, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def make_inputs(n, pad, batch, seed=0):
    """Synthetic slice-point data shaped exactly like insert_slices' lists:
    per particle n x nxf_img points with plane-structured coordinates."""
    rng = np.random.RandomState(seed)
    pn = pad * n
    nxf = pn // 2 + 1
    nxf_img = n // 2 + 1
    # random rotations -> plane coords, like slice_coords * pad
    from pyp_tpu.core.geometry import euler_to_matrix

    R = np.asarray(euler_to_matrix(
        jnp.asarray(rng.uniform(0, 360, batch).astype(np.float32)),
        jnp.asarray(np.degrees(np.arccos(rng.uniform(-1, 1, batch))).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 360, batch).astype(np.float32))))
    ky = np.fft.fftfreq(n) * n
    kx = np.arange(nxf_img, dtype=np.float32)
    gy, gx = np.meshgrid(ky, kx, indexing="ij")
    ex, ey = R[:, 0, :], R[:, 1, :]
    q = (gx[None, ..., None] * ex[:, None, None, :]
         + gy[None, ..., None] * ey[:, None, None, :])[..., ::-1] * pad
    # complex arrays cannot cross the axon tunnel (SKILL.md): ship re/im
    # as float32 planes and rebuild with lax.complex inside jit
    vre = rng.randn(batch, n, nxf_img).astype(np.float32)
    vim = rng.randn(batch, n, nxf_img).astype(np.float32)
    c2 = rng.rand(batch, n, nxf_img).astype(np.float32)
    return (jnp.asarray(q.astype(np.float32)), jnp.asarray(vre),
            jnp.asarray(vim), jnp.asarray(c2), pn, nxf)


def _prep(q, vre, vim, c2, pn, nxf):
    """Shared per-point prep (flip, floor, frac, base corner indices)."""
    vals = jax.lax.complex(vre, vim)
    flip = q[..., 2] < 0
    qs = jnp.where(flip[..., None], -q, q)
    vals = jnp.where(flip, jnp.conj(vals), vals)
    q0 = jnp.floor(qs)
    frac = qs - q0
    q0 = q0.astype(jnp.int32)
    in_sphere = jnp.sum(q * q, axis=-1) <= (pn // 2) ** 2
    return qs, vals, c2, q0, frac, in_sphere


def v0_single(q, vre, vim, c2, pn, nxf):
    from pyp_tpu.ops.fourier_slice import _corner_lists

    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    size = pn * pn * nxf
    a = jnp.zeros(size, jnp.float32).at[idx].add(wre)
    b = jnp.zeros(size, jnp.float32).at[idx].add(wim)
    c = jnp.zeros(size, jnp.float32).at[idx].add(wc2)
    return a[:1] + b[:1] + c[:1]


def v1_vec3(q, vre, vim, c2, pn, nxf):
    from pyp_tpu.ops.fourier_slice import _corner_lists

    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    upd = jnp.stack([wre, wim, wc2], axis=-1)  # (N, 3)
    buf = jnp.zeros((pn * pn * nxf, 3), jnp.float32).at[idx].add(upd)
    return buf[:1, 0]


def _corner_weights(frac, dz, dy):
    wz = frac[..., 0] if dz else 1 - frac[..., 0]
    wy = frac[..., 1] if dy else 1 - frac[..., 1]
    return wz * wy


def v2_pair(q, vre, vim, c2, pn, nxf):
    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    wx = jnp.stack([1 - frac[..., 2], frac[..., 2]], -1)  # (..., 2)
    re, im = jnp.real(vals), jnp.imag(vals)
    idxs, upds = [], []
    for dz in (0, 1):
        for dy in (0, 1):
            w = _corner_weights(frac, dz, dy)
            w = jnp.where(in_sphere, w, 0.0)
            kz = (q0[..., 0] + dz) % pn
            ky = (q0[..., 1] + dy) % pn
            kx = jnp.clip(q0[..., 2], 0, nxf - 1)
            w2 = w[..., None] * wx  # (..., 2)
            upd = jnp.stack([w2 * re[..., None], w2 * im[..., None],
                             w2 * c2[..., None]], -1)  # (..., 2, 3)
            idxs.append(((kz * pn + ky) * (nxf + 1) + kx).reshape(-1))
            upds.append(upd.reshape(-1, 2, 3))
    idx = jnp.concatenate(idxs)[:, None]
    upd = jnp.concatenate(upds)
    buf = jnp.zeros((pn * pn * (nxf + 1) + 1, 3), jnp.float32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    buf = jax.lax.scatter_add(buf, idx, upd, dnums, mode="drop")
    return buf[:1, 0]


def v3_cube(q, vre, vim, c2, pn, nxf):
    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    fz, fy, fx = frac[..., 0], frac[..., 1], frac[..., 2]
    wz = jnp.stack([1 - fz, fz], -1)                      # (..., 2)
    wy = jnp.stack([1 - fy, fy], -1)
    wx = jnp.stack([1 - fx, fx], -1)
    w = (wz[..., :, None, None] * wy[..., None, :, None]
         * wx[..., None, None, :])                        # (..., 2, 2, 2)
    w = jnp.where(in_sphere[..., None, None, None], w, 0.0)
    re, im = jnp.real(vals), jnp.imag(vals)
    upd = jnp.stack([w * re[..., None, None, None],
                     w * im[..., None, None, None],
                     w * c2[..., None, None, None]], -1)  # (..., 2,2,2,3)
    kz = q0[..., 0] % pn
    ky = q0[..., 1] % pn
    kx = jnp.clip(q0[..., 2], 0, nxf - 1)
    idx = jnp.stack([kz, ky, kx], -1).reshape(-1, 3)
    upd = upd.reshape(-1, 2, 2, 2, 3)
    buf = jnp.zeros((pn + 1, pn + 1, nxf + 1, 3), jnp.float32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2))
    buf = jax.lax.scatter_add(buf, idx, upd, dnums, mode="drop")
    return buf[:1, 0, 0, 0]


def v4_cube_h(q, vre, vim, c2, pn, nxf):
    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    B = q.shape[0]
    half = (jnp.arange(B) % 2).astype(jnp.int32)
    fz, fy, fx = frac[..., 0], frac[..., 1], frac[..., 2]
    wz = jnp.stack([1 - fz, fz], -1)
    wy = jnp.stack([1 - fy, fy], -1)
    wx = jnp.stack([1 - fx, fx], -1)
    w = (wz[..., :, None, None] * wy[..., None, :, None]
         * wx[..., None, None, :])
    w = jnp.where(in_sphere[..., None, None, None], w, 0.0)
    re, im = jnp.real(vals), jnp.imag(vals)
    upd = jnp.stack([w * re[..., None, None, None],
                     w * im[..., None, None, None],
                     w * c2[..., None, None, None]], -1)
    kz = q0[..., 0] % pn
    ky = q0[..., 1] % pn
    kx = jnp.clip(q0[..., 2], 0, nxf - 1)
    hh = jnp.broadcast_to(half[:, None, None], kz.shape)
    idx = jnp.stack([hh, kz, ky, kx], -1).reshape(-1, 4)
    upd = upd.reshape(-1, 1, 2, 2, 2, 3)
    buf = jnp.zeros((2, pn + 1, pn + 1, nxf + 1, 3), jnp.float32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4, 5),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2, 3))
    buf = jax.lax.scatter_add(buf, idx, upd, dnums, mode="drop")
    return buf[:1, 0, 0, 0, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--pad", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--variants", default="v0,v5,v6,v7,v8")
    args = ap.parse_args()

    q, vre, vim, c2, pn, nxf = make_inputs(args.n, args.pad, args.batch)
    fns = {"v0": v0_single, "v1": v1_vec3, "v2": v2_pair, "v3": v3_cube,
           "v4": v4_cube_h, "v5": v5_prep_only, "v6": v6_bf16,
           "v7": v7_sorted, "v8": v8_sort_only, "v9": v9_collapse_set,
           "v10": v10_set_rate, "v11": v11_add_unique_hint,
           "v12": v12_window_set, "v13": v13_backfill_set,
           "v14": v14_scan_overhead, "v15": v15_parallel_chunks}
    out = {}
    for name in args.variants.split(","):
        fn = jax.jit(lambda q, a, b, c, f=fns[name]: f(q, a, b, c, pn, nxf))
        try:
            t = _timed(lambda: fn(q, vre, vim, c2))
        except Exception as e:  # axon flakiness / unsupported lowering
            out[name] = {"error": str(e)[:200]}
            continue
        pps = args.batch / t
        out[name] = {"sec": round(t, 4), "particles_per_sec": round(pps, 1)}
        print(name, out[name], flush=True)
    print(json.dumps({"n": args.n, "pad": args.pad, "batch": args.batch,
                      "device": str(jax.devices()[0]), "results": out}))




def v5_prep_only(q, vre, vim, c2, pn, nxf):
    """Everything except the scatters — isolates scatter cost in v0."""
    from pyp_tpu.ops.fourier_slice import _corner_lists

    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    return (jnp.sum(idx) + jnp.sum(wre) + jnp.sum(wim)
            + jnp.sum(wc2)).reshape(1)


def v6_bf16(q, vre, vim, c2, pn, nxf):
    """v0 with bfloat16 scatter values (element-width-bound?)."""
    from pyp_tpu.ops.fourier_slice import _corner_lists

    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    size = pn * pn * nxf
    a = jnp.zeros(size, jnp.bfloat16).at[idx].add(wre.astype(jnp.bfloat16))
    b = jnp.zeros(size, jnp.bfloat16).at[idx].add(wim.astype(jnp.bfloat16))
    c = jnp.zeros(size, jnp.bfloat16).at[idx].add(wc2.astype(jnp.bfloat16))
    return (a[:1] + b[:1] + c[:1]).astype(jnp.float32)


def v7_sorted(q, vre, vim, c2, pn, nxf):
    """Sort contributions by destination then scatter with
    indices_are_sorted (XLA TPU has a sorted-scatter fast path)."""
    from pyp_tpu.ops.fourier_slice import _corner_lists

    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    idx_s, wre_s, wim_s, wc2_s = jax.lax.sort(
        (idx, wre, wim, wc2), num_keys=1)
    size = pn * pn * nxf
    a = jnp.zeros(size, jnp.float32).at[idx_s].add(
        wre_s, indices_are_sorted=True)
    b = jnp.zeros(size, jnp.float32).at[idx_s].add(
        wim_s, indices_are_sorted=True)
    c = jnp.zeros(size, jnp.float32).at[idx_s].add(
        wc2_s, indices_are_sorted=True)
    return a[:1] + b[:1] + c[:1]


def v8_sort_only(q, vre, vim, c2, pn, nxf):
    """Cost of the 4-array sort alone."""
    from pyp_tpu.ops.fourier_slice import _corner_lists

    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    idx_s, wre_s, wim_s, wc2_s = jax.lax.sort(
        (idx, wre, wim, wc2), num_keys=1)
    return (idx_s[:1].astype(jnp.float32) + wre_s[:1] + wim_s[:1]
            + wc2_s[:1])




def _sorted_corner_lists(q, vre, vim, c2, pn, nxf):
    from pyp_tpu.ops.fourier_slice import _corner_lists

    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    return jax.lax.sort((idx, wre, wim, wc2), num_keys=1)


def _segment_collapse(idx_s, vals_list):
    """Sorted duplicate runs -> per-segment totals written at each
    segment's LAST position (zeros elsewhere), via cumsum + boundary
    differencing (no scatter)."""
    n = idx_s.shape[0]
    is_end = jnp.concatenate([idx_s[1:] != idx_s[:-1],
                              jnp.ones((1,), bool)])
    outs = []
    for v in vals_list:
        C = jnp.cumsum(v)
        # cumulative value at the most recent segment end (exclusive):
        # values can be negative, so carry the LAST end's C with an
        # associative "latest valid" scan rather than a max
        endC = jnp.where(is_end, C, jnp.nan)
        carried = jax.lax.associative_scan(
            lambda a, b: jnp.where(jnp.isnan(b), a, b), endC)
        prevC = jnp.concatenate([jnp.zeros((1,)), carried[:-1]])
        prevC = jnp.where(jnp.isnan(prevC), 0.0, prevC)
        outs.append(jnp.where(is_end, C - prevC, 0.0))
    return is_end, outs


def v9_collapse_set(q, vre, vim, c2, pn, nxf):
    """sort -> cumsum segment totals -> ONE overwrite scatter per value
    with sorted+unique indices (duplicate-free .set avoids the
    read-modify-write scatter path)."""
    idx_s, wre_s, wim_s, wc2_s = _sorted_corner_lists(q, vre, vim, c2,
                                                      pn, nxf)
    size = pn * pn * nxf
    is_end, (tre, tim, tc2) = _segment_collapse(
        idx_s, [wre_s, wim_s, wc2_s])
    # non-end rows write their 0 to a dump slot
    tgt = jnp.where(is_end, idx_s, size)
    a = jnp.zeros(size + 1, jnp.float32).at[tgt].add(
        tre, indices_are_sorted=True)
    b = jnp.zeros(size + 1, jnp.float32).at[tgt].add(
        tim, indices_are_sorted=True)
    c = jnp.zeros(size + 1, jnp.float32).at[tgt].add(
        tc2, indices_are_sorted=True)
    return a[:1] + b[:1] + c[:1]


def v10_set_rate(q, vre, vim, c2, pn, nxf):
    """Pure overwrite-scatter rate: sorted indices, .set (no collapse —
    duplicates overwrite, numerically wrong, measures the store path)."""
    idx_s, wre_s, wim_s, wc2_s = _sorted_corner_lists(q, vre, vim, c2,
                                                      pn, nxf)
    size = pn * pn * nxf
    a = jnp.zeros(size, jnp.float32).at[idx_s].set(
        wre_s, indices_are_sorted=True, unique_indices=True)
    b = jnp.zeros(size, jnp.float32).at[idx_s].set(
        wim_s, indices_are_sorted=True, unique_indices=True)
    c = jnp.zeros(size, jnp.float32).at[idx_s].set(
        wc2_s, indices_are_sorted=True, unique_indices=True)
    return a[:1] + b[:1] + c[:1]


def v11_add_unique_hint(q, vre, vim, c2, pn, nxf):
    """scatter-ADD but promising sorted+unique (valid after collapse):
    does the unique hint unlock a faster add path?"""
    idx_s, wre_s, wim_s, wc2_s = _sorted_corner_lists(q, vre, vim, c2,
                                                      pn, nxf)
    size = pn * pn * nxf
    a = jnp.zeros(size, jnp.float32).at[idx_s].add(
        wre_s, indices_are_sorted=True, unique_indices=True)
    b = jnp.zeros(size, jnp.float32).at[idx_s].add(
        wim_s, indices_are_sorted=True, unique_indices=True)
    c = jnp.zeros(size, jnp.float32).at[idx_s].add(
        wc2_s, indices_are_sorted=True, unique_indices=True)
    return a[:1] + b[:1] + c[:1]




def _backfill_totals(idx_s, vals_list):
    """Per-position SEGMENT TOTALS (every member of a duplicate run carries
    the same total), so an overwrite scatter at sorted indices is
    deterministic and correct regardless of which duplicate lands last."""
    n = idx_s.shape[0]
    is_end = jnp.concatenate([idx_s[1:] != idx_s[:-1], jnp.ones((1,), bool)])
    outs = []
    for v in vals_list:
        C = jnp.cumsum(v)
        endC = jnp.where(is_end, C, jnp.nan)
        carried = jax.lax.associative_scan(
            lambda a, b: jnp.where(jnp.isnan(b), a, b), endC)
        prevC = jnp.concatenate([jnp.zeros((1,)), carried[:-1]])
        prevC = jnp.where(jnp.isnan(prevC), 0.0, prevC)
        total_at_end = C - prevC
        # backfill: reverse "latest valid" scan propagates each end's total
        # to every member of its run
        t = jnp.where(is_end, total_at_end, jnp.nan)
        filled = jax.lax.associative_scan(
            lambda a, b: jnp.where(jnp.isnan(b), a, b), t[::-1])[::-1]
        outs.append(filled)
    return outs


def v13_backfill_set(q, vre, vim, c2, pn, nxf):
    """Numerically correct sorted-overwrite insertion: sort, segment totals
    backfilled to every duplicate, 3 .set scatters (duplicates write equal
    values)."""
    idx_s, wre_s, wim_s, wc2_s = _sorted_corner_lists(q, vre, vim, c2,
                                                      pn, nxf)
    size = pn * pn * nxf
    tre, tim, tc2 = _backfill_totals(idx_s, [wre_s, wim_s, wc2_s])
    a = jnp.zeros(size, jnp.float32).at[idx_s].set(
        tre, indices_are_sorted=True)
    b = jnp.zeros(size, jnp.float32).at[idx_s].set(
        tim, indices_are_sorted=True)
    c = jnp.zeros(size, jnp.float32).at[idx_s].set(
        tc2, indices_are_sorted=True)
    return a[:1] + b[:1] + c[:1]


def v12_window_set(q, vre, vim, c2, pn, nxf):
    """One overwrite scatter of (N, 3) rows into a (size, 3) buffer —
    does SET keep its rate with a 3-wide window?"""
    idx_s, wre_s, wim_s, wc2_s = _sorted_corner_lists(q, vre, vim, c2,
                                                      pn, nxf)
    size = pn * pn * nxf
    tre, tim, tc2 = _backfill_totals(idx_s, [wre_s, wim_s, wc2_s])
    rows = jnp.stack([tre, tim, tc2], axis=-1)
    buf = jnp.zeros((size, 3), jnp.float32).at[idx_s].set(
        rows, indices_are_sorted=True)
    return buf[:1, 0]


def v14_scan_overhead(q, vre, vim, c2, pn, nxf):
    """sort + backfill scans WITHOUT the final scatter."""
    idx_s, wre_s, wim_s, wc2_s = _sorted_corner_lists(q, vre, vim, c2,
                                                      pn, nxf)
    tre, tim, tc2 = _backfill_totals(idx_s, [wre_s, wim_s, wc2_s])
    return (tre[:1] + tim[:1] + tc2[:1]
            + idx_s[:1].astype(jnp.float32))




def v15_parallel_chunks(q, vre, vim, c2, pn, nxf):
    """Split the contribution list into 4 chunks scattered into 4 SEPARATE
    buffers (no data dependency -> XLA may overlap them), summed densely at
    the end. If the scatter unit serializes, this matches v0."""
    from pyp_tpu.ops.fourier_slice import _corner_lists

    qs, vals, c2, q0, frac, in_sphere = _prep(q, vre, vim, c2, pn, nxf)
    idx, wre, wim, wc2 = _corner_lists(qs, vals, c2, q0, frac, in_sphere,
                                       pn, nxf)
    size = pn * pn * nxf
    K = 4
    n = idx.shape[0] // K * K
    idx_c = idx[:n].reshape(K, -1)
    outs = []
    for name, v in (("re", wre), ("im", wim), ("c2", wc2)):
        vc = v[:n].reshape(K, -1)
        bufs = [jnp.zeros(size, jnp.float32).at[idx_c[k]].add(vc[k])
                for k in range(K)]
        outs.append(sum(bufs))
    return outs[0][:1] + outs[1][:1] + outs[2][:1]


if __name__ == "__main__":
    main()
