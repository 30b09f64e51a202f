"""Likelihood blurring (the reference reconstruct3d `blurring` card,
frealign.py:1772, reconstruct_lblur/lblur_nrot params): each particle
inserts over a psi-offset bank with Gaussian weights. Accumulation is
linear in the weights, so the blurred accumulators must exactly equal the
weighted sum of per-offset insertions; and blurring a particle whose true
psi is mid-window must not destroy the reconstruction."""

import numpy as np
import jax.numpy as jnp

from pyp_tpu.ops import reconstruct as rec
from tests.test_refine3d import make_volume, make_particles, N, PIXEL


class TestLikelihoodBlurring:
    def test_bank_shape_and_mass(self):
        offs, w = rec.lblur_bank(21, 20.0)
        assert len(offs) == 21 and len(w) == 21
        np.testing.assert_allclose(np.sum(w), 1.0, rtol=1e-6)
        assert offs[0] == -10.0 and offs[-1] == 10.0
        assert w[10] == max(w)                      # centered Gaussian
        assert rec.lblur_bank(0) is None and rec.lblur_bank(1) is None

    def test_linearity_vs_explicit_offsets(self):
        """accumulate(lblur=bank) == sum_k w_k * accumulate(psi+off_k)."""
        vol = make_volume(seed=3)
        stack, ctf_params, truth = make_particles(vol, n_particles=6, seed=4)
        poses = np.stack([truth["phi"], truth["theta"], truth["psi"],
                          truth["shifts"][:, 1], truth["shifts"][:, 0]],
                         axis=1).astype(np.float32)
        subset = jnp.asarray(np.arange(6) % 2)
        w = jnp.ones(6)
        bank = rec.lblur_bank(5, 12.0)
        blurred = rec.accumulate(
            jnp.asarray(stack), jnp.asarray(poses), jnp.asarray(ctf_params),
            subset, w, N, PIXEL, lblur=bank)
        expected = None
        for off, rw in zip(*bank):
            p2 = np.array(poses, copy=True)
            p2[:, 2] += off
            acc = rec.accumulate(
                jnp.asarray(stack), jnp.asarray(p2),
                jnp.asarray(ctf_params), subset, w * float(rw), N, PIXEL)
            expected = acc if expected is None else rec.merge_accumulators(
                [expected, acc])
        for got, want in zip(blurred, expected):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-5)

    def test_blurred_reconstruction_stays_faithful(self):
        """A modest blur window must keep the map close to ground truth
        (the blur acts as an angular low-pass, not a destruction)."""
        vol = make_volume(seed=5)
        stack, ctf_params, truth = make_particles(vol, n_particles=96,
                                                  seed=6)
        poses = np.stack([truth["phi"], truth["theta"], truth["psi"],
                          truth["shifts"][:, 1], truth["shifts"][:, 0]],
                         axis=1).astype(np.float32)
        sharp = rec.reconstruct(stack, poses, ctf_params, PIXEL)
        blurred = rec.reconstruct(stack, poses, ctf_params, PIXEL,
                                  lblur_nrot=5, lblur_range=4.0)
        v = np.asarray(vol).ravel()

        def cc(m):
            m = np.asarray(m.volume).ravel()
            return np.corrcoef(m, v)[0, 1]

        assert cc(blurred) > 0.8 * cc(sharp)
        assert cc(blurred) > 0.3
