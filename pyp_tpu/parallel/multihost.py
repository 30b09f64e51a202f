"""Multi-host (multi-process) data path for the sharded kernels.

Single-process multi-chip runs hand plain numpy arrays to
`parallel.spmd.*` and GSPMD shards them. Under `jax.distributed` each
process only owns its local devices, so globally-sharded inputs must be
assembled from per-process local chunks with
`jax.make_array_from_process_local_data`. This module does that assembly
and re-uses the very same shard_map kernels, keeping one code path for the
numerics (the psum merge = the reference's local_merge3d+merge3d tree,
frealign.py:1838/:1910 — SURVEY §2.3.5).

Partitioning contract: particles are statically range-partitioned by
process id (`process_range`); every process calls the `distributed_*`
functions with ONLY its own range. Results come back replicated, so every
rank can finalize/write identically (rank 0 conventionally persists).
"""

from __future__ import annotations

import numpy as np

from pyp_tpu.utils.log import get_logger

logger = get_logger("multihost")


def process_range(total: int, nprocs: int | None = None,
                  pid: int | None = None) -> tuple[int, int]:
    """Contiguous [lo, hi) particle range owned by this process."""
    import jax

    nprocs = jax.process_count() if nprocs is None else nprocs
    pid = jax.process_index() if pid is None else pid
    per = (total + nprocs - 1) // nprocs
    lo = min(pid * per, total)
    return lo, min(lo + per, total)


def _global_batch(mesh, local_arrays, pad_rows: int):
    """Per-process local chunks -> global arrays sharded on the batch axis.

    pad_rows: rows of zero padding appended to THIS process's chunk so
    every process contributes the same row count (weights of padded rows
    must be zero, which sharded_accumulate's weight vector guarantees)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    out = []
    for a in local_arrays:
        a = np.asarray(a)
        if pad_rows:
            a = np.concatenate(
                [a, np.zeros((pad_rows,) + a.shape[1:], a.dtype)])
        out.append(jax.make_array_from_process_local_data(sharding, a))
    return out


def distributed_accumulate(mesh, stack, poses, ctf_params, subset, weights,
                           n: int, pixel_size: float, voltage_kv=300.0,
                           cs_mm=2.7, amplitude_contrast=0.07,
                           symmetry="C1", pad=2, prev=None):
    """`spmd.sharded_accumulate` semantics with per-process local inputs.

    Each process passes its own particle chunk; chunks are padded to a
    common per-process length (padding weight 0), assembled into global
    arrays, and run through the same shard_map + psum kernel. Returns
    replicated Accumulators visible on every process."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pyp_tpu.ops import reconstruct as rec

    from jax.experimental import multihost_utils

    B_local = np.asarray(stack).shape[0]
    # same per-process row count everywhere: max over processes, rounded
    # up so the GLOBAL batch divides the mesh
    counts = np.asarray(
        multihost_utils.process_allgather(jnp.asarray([B_local])))
    per = max(int(counts.max()), 1)
    ndev_local = jax.local_device_count()
    if per % ndev_local:
        per += ndev_local - per % ndev_local
    pad_rows = per - B_local

    w = np.asarray(weights, dtype=np.float32)
    stack_g, poses_g, ctf_g, subset_g, w_g = _global_batch(
        mesh, [stack, poses, ctf_params,
               np.asarray(subset), w], pad_rows)
    axes = tuple(mesh.axis_names)
    spec = P(axes)

    def shard_fn(stack_s, poses_s, ctf_s, subset_s, w_s):
        acc = rec.accumulate(
            stack_s, poses_s, ctf_s, subset_s, w_s, n, pixel_size,
            voltage_kv, cs_mm, amplitude_contrast, symmetry, pad)
        return jax.tree.map(lambda x: jax.lax.psum(x, axes), acc)

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec,) * 5,
                   out_specs=P())
    acc = jax.jit(fn)(stack_g, poses_g, ctf_g, subset_g, w_g)
    if prev is not None:
        acc = rec.Accumulators(*(p + a for p, a in zip(prev, acc)))
    return acc


def distributed_reconstruct(stack, poses, ctf_params, pixel_size,
                            subset=None, weights=None, symmetry="C1",
                            voltage_kv=300.0, cs_mm=2.7,
                            amplitude_contrast=0.07, wiener=0.5,
                            batch: int = 256, pad: int = 2):
    """Full-stack reconstruction across a jax.distributed cluster: each
    process feeds its local particle chunk in superbatches; finalize runs
    replicated. Call only after `parallel.init_distributed()` joined."""
    import jax

    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.parallel.spmd import make_mesh

    mesh = make_mesh()  # all global devices on ("data",)
    B = np.asarray(stack).shape[0]
    if subset is None:
        subset = np.arange(B) % 2
    if weights is None:
        weights = np.ones(B, dtype=np.float32)
    n = np.asarray(stack).shape[-1]
    # every process must run the SAME number of collective rounds, even
    # when its local chunk is smaller (final-round empty chunks pad out)
    from jax.experimental import multihost_utils

    import jax.numpy as jnp

    max_b = int(np.asarray(multihost_utils.process_allgather(
        jnp.asarray([B]))).max())
    acc = None
    for i in range(0, max(max_b, 1), batch):
        sl = slice(min(i, B), min(i + batch, B))
        acc = distributed_accumulate(
            mesh, np.asarray(stack[sl]), np.asarray(poses[sl]),
            np.asarray(ctf_params[sl]), np.asarray(subset[sl]),
            np.asarray(weights[sl]), n, pixel_size, voltage_kv, cs_mm,
            amplitude_contrast, symmetry, pad, prev=acc)
    out = rec.finalize(acc, n, pad, wiener)
    # replicated outputs are fully addressable on every process
    return jax.tree.map(np.asarray, out)
