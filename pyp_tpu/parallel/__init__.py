"""Device meshes, shardings, and collective merges."""

import os

from pyp_tpu.parallel.spmd import (  # noqa: F401
    csp_refine_batch_sharded,
    make_mesh,
    reconstruct_sharded,
    sharded_accumulate,
    sharded_accumulate_matrices,
    sharded_reconstruct,
    sharded_refine_batch,
    sharded_refine_step,
)


def pipeline_mesh(params: dict | None = None):
    """The mesh production pipelines shard over: all local devices on a
    ("data", "model") mesh when more than one exists, else None (single-chip
    batch loop). parallel_data/parallel_model set the axis sizes explicitly
    (0 = data axis takes every device not claimed by the model axis).
    Disable with PYP_TPU_DISABLE_SPMD=1. This is the TPU-native form of the
    reference's particle-range splits + dump-file merges
    (SURVEY §2.3.4/§2.3.5)."""
    if os.environ.get("PYP_TPU_DISABLE_SPMD") == "1":
        return None
    import jax

    if len(jax.devices()) < 2:
        return None
    params = params or {}
    model = max(1, int(params.get("parallel_model") or 1))
    data = int(params.get("parallel_data") or 0)
    n = data * model if data > 0 else None
    return make_mesh(n_devices=n, model=model)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host bootstrap: join a jax.distributed cluster so the pipeline
    mesh spans hosts (ICI within a slice, DCN across — SURVEY §2.4). Reads
    PYP_TPU_COORDINATOR / PYP_TPU_NUM_PROCS / PYP_TPU_PROC_ID when args are
    omitted (the scheduler exports these per rank, sched.executor). Returns
    True when a cluster was joined, False for single-host runs."""
    coordinator = coordinator or os.environ.get("PYP_TPU_COORDINATOR")
    if not coordinator:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes or os.environ.get("PYP_TPU_NUM_PROCS", 1)),
        process_id=int(process_id or os.environ.get("PYP_TPU_PROC_ID", 0)),
    )
    return True
