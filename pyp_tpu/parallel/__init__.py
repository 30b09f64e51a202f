"""Device meshes, shardings, and collective merges."""

from pyp_tpu.parallel.spmd import (  # noqa: F401
    make_mesh,
    sharded_refine_step,
    sharded_reconstruct,
)
