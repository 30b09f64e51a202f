"""Ab initio test: recover a 3D model from particles with unknown poses,
starting from nothing."""

import jax.numpy as jnp
import numpy as np

from pyp_tpu.ops import ab_initio
from pyp_tpu.ops.template_match import rotate_volume
from tests.test_refine3d import make_particles, make_volume, N, PIXEL


def best_aligned_cc(a, b, step=30.0):
    """Max correlation of a against b over a coarse rotation grid (+mirror):
    ab initio reconstructions are only defined up to a global rotation and
    hand."""
    best = -1.0
    for hand in (a, a[::-1]):
        va = jnp.asarray(np.ascontiguousarray(hand))
        for phi in np.arange(0, 360, step):
            for theta in np.arange(0, 181, step):
                for psi in np.arange(0, 360, step):
                    r = np.asarray(rotate_volume(va, float(phi), float(theta), float(psi)))
                    cc = np.corrcoef(r.ravel(), b.ravel())[0, 1]
                    best = max(best, cc)
    return best


class TestAbInitio:
    def test_recovers_structure(self):
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=64, noise=0.1, seed=3)
        out, poses = ab_initio.ab_initio(
            np.asarray(imgs), np.asarray(ctf_params), PIXEL,
            n_rounds=4, start_res=24.0, end_res=8.0, subset_frac=0.75,
            angular_step=24.0, seed=1,
        )
        assert out.shape == (N, N, N)
        cc = best_aligned_cc(out, vol, step=45.0)
        assert cc > 0.4, cc
