"""Save/load flax model params (picker/denoiser) as npz archives.

The reference ships torch .pth checkpoints for its NN tools; these npz
archives serve the same role with no pickle execution risk.
"""

from __future__ import annotations

import numpy as np
import jax


def save_params(params, path, **meta):
    flat, treedef = jax.tree.flatten(params)
    arrays = {f"p{i}": np.asarray(a) for i, a in enumerate(flat)}
    arrays["_treedef"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    for k, v in meta.items():
        arrays[f"_meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_params(path, like):
    """Load into the structure of `like` (a template pytree with the same
    treedef, e.g. from model.init on dummy input)."""
    with np.load(path) as z:
        flat_t, treedef = jax.tree.flatten(like)
        flat = [z[f"p{i}"] for i in range(len(flat_t))]
        meta = {k[6:]: z[k] for k in z.files if k.startswith("_meta_")}
    return jax.tree.unflatten(treedef, flat), meta
