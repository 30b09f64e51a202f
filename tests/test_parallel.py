"""SPMD layer tests on the 8-device virtual CPU mesh: sharded execution must
match the single-device reference numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.ops import reconstruct as rec
from pyp_tpu.ops import refine3d
from pyp_tpu.ops.fourier_slice import volume_to_fourier
from pyp_tpu.parallel import make_mesh, sharded_reconstruct, sharded_refine_step
from tests.test_refine3d import make_particles, make_volume, N, PIXEL


class TestShardedRefine:
    def test_matches_single_device(self):
        assert len(jax.devices()) >= 8
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=16, noise=0.1)
        rng = np.random.RandomState(0)
        init = np.stack([
            truth["phi"] + rng.uniform(-5, 5, 16),
            truth["theta"] + rng.uniform(-5, 5, 16),
            truth["psi"] + rng.uniform(-5, 5, 16),
            np.zeros(16), np.zeros(16),
        ], axis=1).astype(np.float32)

        mesh = make_mesh(8, model=2)  # data=4, model=2
        poses_s, scores_s = sharded_refine_step(
            mesh, np.asarray(imgs), np.asarray(ctf_params), vol, init, PIXEL,
            low_res=40.0, high_res=2.5 * PIXEL, iters=6,
        )
        # single-device reference with identical hyperparameters
        Fref = volume_to_fourier(jnp.asarray(vol))
        pts = refine3d.make_mask_points(N, PIXEL, 40.0, 2.5 * PIXEL)
        poses_r, scores_r = refine3d.local_refine(
            imgs, ctf_params, Fref, jnp.asarray(init), jnp.asarray(pts),
            N, PIXEL, iters=6,
        )
        np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_r),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(poses_s), np.asarray(poses_r),
                                   rtol=1e-3, atol=5e-2)

    def test_sharded_reconstruct_matches(self):
        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=16, noise=0.1)
        poses = np.stack([
            truth["phi"], truth["theta"], truth["psi"],
            -truth["shifts"][:, 0], -truth["shifts"][:, 1],
        ], axis=1).astype(np.float32)
        mesh = make_mesh(8, model=1)
        acc_s = sharded_reconstruct(mesh, np.asarray(imgs), poses,
                                    np.asarray(ctf_params), PIXEL)
        acc_r = rec.accumulate(
            imgs, jnp.asarray(poses), ctf_params,
            jnp.arange(16) % 2, jnp.ones(16), N, PIXEL,
        )
        np.testing.assert_allclose(np.asarray(acc_s.den1), np.asarray(acc_r.den1),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(acc_s.num1), np.asarray(acc_r.num1),
                                   rtol=1e-3, atol=1e-2)
