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


class TestPipelineMeshDispatch:
    """The production pipeline path must produce the same results through the
    mesh-sharded wrappers as through the single-chip batch loop."""

    def _problem(self):
        from pyp_tpu.io import cistem

        vol = make_volume()
        imgs, ctf_params, truth = make_particles(vol, n_particles=16, noise=0.1)
        rng = np.random.RandomState(3)
        table = cistem.Table.zeros(16)
        table["position_in_stack"] = np.arange(1, 17)
        table["phi"] = truth["phi"] + rng.uniform(-4, 4, 16)
        table["theta"] = truth["theta"] + rng.uniform(-4, 4, 16)
        table["psi"] = truth["psi"] + rng.uniform(-4, 4, 16)
        table["defocus_1"] = ctf_params[:, 0]
        table["defocus_2"] = ctf_params[:, 1]
        table["defocus_angle"] = ctf_params[:, 2]
        table["occupancy"] = np.full(16, 100.0)
        table["pixel_size"] = np.full(16, PIXEL)
        params = {
            "scope_pixel": PIXEL, "scope_voltage": 300.0, "scope_cs": 2.7,
            "scope_wgh": 0.07, "refine_rhref": "8", "refine_rlref": 40.0,
            "refine_mode": "local", "refine_dang": 30.0,
            "refine_psi_step": 20.0, "refine_searchx": 4.0,
            "particle_sym": "C1", "refine_topk": 2, "refine_local_iters": 6,
        }
        return vol, np.asarray(imgs), table, params

    def test_refinement_iteration_mesh_matches_single(self, monkeypatch):
        from pyp_tpu.pipeline.refine import refinement_iteration

        vol, stack, table, params = self._problem()
        assert len(jax.devices()) >= 8
        t_mesh, out_mesh, res_mesh = refinement_iteration(
            stack, table.copy(), vol, params, 2)
        monkeypatch.setenv("PYP_TPU_DISABLE_SPMD", "1")
        t_one, out_one, res_one = refinement_iteration(
            stack, table.copy(), vol, params, 2)
        np.testing.assert_allclose(t_mesh["phi"], t_one["phi"], atol=1e-2)
        np.testing.assert_allclose(t_mesh["score"], t_one["score"], atol=0.1)
        np.testing.assert_allclose(
            np.asarray(out_mesh.volume), np.asarray(out_one.volume),
            rtol=1e-3, atol=1e-3 * float(np.abs(np.asarray(out_one.volume)).max()),
        )
        assert abs(res_mesh - res_one) < 0.3


class TestGoldStandard:
    def test_halfset_separated_refinement_runs(self, monkeypatch):
        """Gold-standard mode: each half aligns against its own half map;
        results stay sane and at least match the shared-map mode on
        synthetic data (same machinery, different banks)."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from test_refine3d import make_particles, make_volume, PIXEL

        from pyp_tpu.io import cistem
        from pyp_tpu.pipeline.refine import refine_loop

        monkeypatch.setenv("PYP_TPU_DISABLE_SPMD", "1")
        vol = make_volume()
        stack, ctf_params, truth = make_particles(vol, n_particles=24,
                                                  noise=0.2)
        B = 24
        table = cistem.Table.zeros(B)
        table["pixel_size"] = np.full(B, PIXEL)
        table["defocus_1"] = np.asarray(ctf_params)[:, 0]
        table["defocus_2"] = np.asarray(ctf_params)[:, 1]
        table["defocus_angle"] = np.asarray(ctf_params)[:, 2]
        table["occupancy"] = np.full(B, 100.0)
        table["assigned_subset"] = np.arange(B) % 2 + 1
        params = {"scope_pixel": PIXEL, "scope_voltage": 300.0,
                  "scope_cs": 2.7, "scope_wgh": 0.07, "refine_rlref": 40.0,
                  "refine_rhref": "10:8", "refine_dang": 12.0,
                  "refine_psi_step": 10.0, "refine_searchx": 4.0,
                  "refine_searchy": 4.0, "particle_sym": "C1",
                  "refine_mode": "global", "refine_engine": "frm",
                  "refine_maxiter": 2, "refine_goldstandard": True,
                  "reconstruct_wiener": 0.5}
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            table, ref, history = refine_loop(
                np.asarray(stack), table, vol * 0 + np.asarray(vol), params,
                work_dir=d, dataset="gs")
        assert np.isfinite(ref).all()
        assert history and history[-1]["resolution"] < 100.0
        # poses still track truth reasonably (same data as other tests)
        from pyp_tpu.core.geometry import euler_to_matrix
        from test_refine3d import rotation_error_deg

        errs = [rotation_error_deg(
            np.asarray(euler_to_matrix(float(table["phi"][b]),
                                       float(table["theta"][b]),
                                       float(table["psi"][b]))),
            truth["R"][b]) for b in range(B)]
        assert np.median(errs) < 10.0, errs
