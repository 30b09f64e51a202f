"""Pallas TPU kernels for the hot inner loops.

`shift_scored_match`: the global-search scoring core — for every
(particle x psi) row and every reference direction, the best CTF-weighted
correlation over S candidate shifts:

    score[a, d] = max_s  Re( sum_g v[a, g] * E[g, s] * u[g, d] ) * ninv[a, d]

The XLA version (refine3d.global_search's lax.scan) re-reads the (G, D)
reference matrix from HBM for every shift; this kernel keeps the v-tile,
u-tile and all shift phasors resident in VMEM and loops shifts on-chip, so
the MXU stays fed at one HBM pass per (row-tile, dir-tile) — an S-fold cut
in reference-side memory traffic. Complex arithmetic is expressed as real
matmul pairs (MXU has no complex type).

Falls back to interpret mode off-TPU (tests) and is drop-in numerically
identical to the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 128   # rows (particle x psi) per program
TILE_D = 128   # directions per program


def _kernel(vr_ref, vi_ref, ur_ref, ui_ref, er_ref, ei_ref, ninv_ref,
            score_ref, sidx_ref, *, n_shifts: int):
    vr = vr_ref[:]
    vi = vi_ref[:]
    ur = ur_ref[:]
    ui = ui_ref[:]
    ninv = ninv_ref[:]

    def body(s, carry):
        best, idx = carry
        # E is laid out (S, G): the dynamic shift index lands on the sublane
        # axis (lane-axis dynamic indexing is not Mosaic-expressible)
        ers = er_ref[pl.ds(s, 1), :]  # (1, G)
        eis = ei_ref[pl.ds(s, 1), :]
        wr = vr * ers - vi * eis
        wi = vr * eis + vi * ers
        num = (
            jnp.dot(wr, ur, preferred_element_type=jnp.float32)
            - jnp.dot(wi, ui, preferred_element_type=jnp.float32)
        )
        score = num * ninv
        better = score > best
        best = jnp.where(better, score, best)
        idx = jnp.where(better, s, idx)
        return best, idx

    init = (
        jnp.full((TILE_A, TILE_D), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((TILE_A, TILE_D), dtype=jnp.int32),
    )
    best, idx = jax.lax.fori_loop(0, n_shifts, body, init)
    score_ref[:] = best
    sidx_ref[:] = idx


def _pad_to(x, axis, multiple):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def shift_scored_match(v, u, E, ninv, interpret: bool = False):
    """v: (A, G) complex64 particle-side values; u: (G, D) complex64
    reference slices; E: (G, S) complex64 shift phasors; ninv: (A, D)
    real normalization. Returns (best_score (A, D), best_shift_idx (A, D)).
    """
    A, G = v.shape
    D = u.shape[1]
    S = E.shape[1]

    vr = _pad_to(_pad_to(jnp.real(v), 0, TILE_A), 1, 128)
    vi = _pad_to(_pad_to(jnp.imag(v), 0, TILE_A), 1, 128)
    ur = _pad_to(_pad_to(jnp.real(u), 0, 128), 1, TILE_D)
    ui = _pad_to(_pad_to(jnp.imag(u), 0, 128), 1, TILE_D)
    Et = E.T  # (S, G)
    er = _pad_to(_pad_to(jnp.real(Et), 0, 8), 1, 128)
    ei = _pad_to(_pad_to(jnp.imag(Et), 0, 8), 1, 128)
    ninv_p = _pad_to(_pad_to(ninv, 0, TILE_A), 1, TILE_D)

    Ap, Gp = vr.shape
    Dp = ur.shape[1]
    grid = (Ap // TILE_A, Dp // TILE_D)

    score, sidx = pl.pallas_call(
        functools.partial(_kernel, n_shifts=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_A, Gp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, Gp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, TILE_D), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, TILE_D), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((er.shape[0], Gp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ei.shape[0], Gp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, TILE_D), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_A, TILE_D), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, TILE_D), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Ap, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Ap, Dp), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Ap * Dp * S * Gp,
            bytes_accessed=(Ap * Gp + Gp * Dp) * 8 * grid[1] + Ap * Dp * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vr, vi, ur, ui, er, ei, ninv_p)
    return score[:A, :D], sidx[:A, :D]


def shift_scored_match_xla(v, u, E, ninv):
    """Reference XLA implementation (the scan the kernel replaces) — used
    for numerical cross-checks and as the non-TPU fallback."""
    S = E.shape[1]

    def body(carry, s):
        best, idx = carry
        num = jnp.real((v * E[:, s][None, :]) @ u)
        score = num * ninv
        better = score > best
        return (jnp.where(better, score, best), jnp.where(better, s, idx)), None

    # derive the carry init from ninv so its sharding/varying type matches
    # the body output under shard_map's varying-manual-axes check
    init = (jnp.zeros_like(ninv) - jnp.inf,
            jnp.zeros_like(ninv, dtype=jnp.int32))
    (best, idx), _ = jax.lax.scan(body, init, jnp.arange(S))
    return best, idx
