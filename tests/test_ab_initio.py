"""Ab initio smoke/behavior test.

Scope note: the reference's create_initial_model (frealign.py:4552) is a
crude random-angle reconstruction tool — PYP users normally supply an
external initial model. Our ab_initio matches that contract (resolution
ladder + stochastic reassignment). Converging to the true hand/structure on
tiny noisy synthetic boxes (cryoSPARC-grade SGD ab initio) is a known
improvement item for a later round; here we assert the mechanics: the model
sharpens, particle scores improve across rounds, and outputs are sane.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.ops import ab_initio, refine3d
from pyp_tpu.ops.fourier_slice import volume_to_fourier
from tests.test_refine3d import make_particles, make_volume, N, PIXEL


@pytest.mark.slow
class TestAbInitioFrm:
    def test_from_scratch_recovery(self):
        """Marginalized ab initio (FRM soft posterior + hard rounds) must
        recover the true structure from scratch — the scenario hard-argmax
        ab initio collapses on (round-1 STATUS: cc ~0.09). Acceptance per
        VERDICT round 1: aligned cc > 0.8 vs ground truth."""
        from pyp_tpu.ops.template_match import align_volumes

        vol = make_volume()
        # +/-1 px pick error: the accuracy of a decent picker. (+/-2 px
        # breaks the soft posterior — documented limitation; pre-align or
        # re-pick in that regime.)
        imgs, ctf_params, _ = make_particles(
            vol, n_particles=256, noise=0.2, shift_max=1.0, seed=3)
        out, poses = ab_initio.ab_initio_frm(
            np.asarray(imgs), np.asarray(ctf_params), PIXEL,
            n_rounds=8, start_res=24.0, end_res=8.0, angular_step=12.0,
            hard_rounds=3, hard_end_res=6.0, seed=1,
        )
        cc, _ang, _flipped, _aligned = align_volumes(
            jnp.asarray(out), jnp.asarray(vol))
        assert float(cc) > 0.8, float(cc)


@pytest.mark.slow
class TestAbInitio:
    def test_mechanics_and_score_improvement(self):
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=48, noise=0.1, seed=3)
        out, poses = ab_initio.ab_initio(
            np.asarray(imgs), np.asarray(ctf_params), PIXEL,
            n_rounds=3, start_res=16.0, end_res=8.0, subset_frac=1.0,
            angular_step=24.0, seed=1,
        )
        assert out.shape == (N, N, N)
        assert np.isfinite(out).all()
        # the model must not be empty or a uniform blob
        assert out.std() > 0

        # refined particle scores against the ab-initio model must beat
        # scores against a featureless sphere (i.e. the model learned
        # *something* self-consistent from the data)
        from pyp_tpu.core.filters import soft_spherical_mask

        sphere = np.asarray(soft_spherical_mask(N, N * 0.3, 4.0), dtype=np.float32)
        pts = refine3d.make_mask_points(N, PIXEL, 100.0, 4.0 * PIXEL)

        def mean_score(ref_vol):
            _, scores = refine3d.local_refine(
                imgs, ctf_params, volume_to_fourier(jnp.asarray(ref_vol)),
                jnp.asarray(poses), jnp.asarray(pts), N, PIXEL, iters=0,
            )
            return float(jnp.mean(scores))

        s_model = mean_score(out)
        s_sphere = mean_score(sphere)
        assert s_model > s_sphere, (s_model, s_sphere)
