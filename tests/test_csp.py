"""CSP (constrained single-particle tomography) refinement tests.

Synthetic tilt-series: particles are projections of a known reference placed
at known 3D positions through a known tilt geometry. Perturb the geometry /
poses, refine each CSP mode, verify recovery.
"""

import jax.numpy as jnp
import numpy as np

from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
from pyp_tpu.ops import csp, fourier_slice as fs
from pyp_tpu.core.fft import shift_images


NBOX = 24
NY = NX = 160
PIXEL = 2.0
ANGLES = np.arange(-45.0, 46.0, 15.0, dtype=np.float32)  # 7 tilts
T = len(ANGLES)
P = 6


def make_reference(seed=0):
    rng = np.random.RandomState(seed)
    vol = rng.randn(NBOX, NBOX, NBOX).astype(np.float32)
    vol *= np.asarray(soft_spherical_mask(NBOX, NBOX * 0.33, 2.0))
    vol = np.array(lowpass_filter_3d(jnp.asarray(vol), PIXEL, 3.0 * PIXEL))
    return vol * 20.0


def make_tilt_series(vol, seed=1, noise=0.05):
    rng = np.random.RandomState(seed)
    true = csp.make_params(
        ANGLES,
        np.full(T, 2.0, dtype=np.float32),
        rng.uniform(-3, 3, (T, 2)).astype(np.float32),
        rng.uniform(0, 360, (P, 3)).astype(np.float32),
        np.stack([
            rng.uniform(-10, 10, P),
            rng.uniform(-50, 50, P),
            rng.uniform(-50, 50, P),
        ], 1).astype(np.float32),
    )
    Fv = fs.volume_to_fourier(jnp.asarray(vol))
    R_eff = csp.effective_rotations(true)            # (T, P, 3, 3)
    pos = np.asarray(csp.project_positions(true))    # (T, P, 2) centered
    depth = np.asarray(csp.particle_depth(true))     # (T, P)

    defocus_nominal = 15000.0
    from pyp_tpu.ops.refine3d import _ctf_at_points

    ky = (np.fft.fftfreq(NBOX) * NBOX).astype(np.float32)
    kx = np.arange(NBOX // 2 + 1, dtype=np.float32)
    grid_pts = jnp.asarray(np.stack(np.meshgrid(ky, kx, indexing="ij"), -1))

    images = np.zeros((T, NY, NX), dtype=np.float32)
    for t in range(T):
        F = fs.project(Fv, R_eff[t], NBOX)           # (P, NBOX, nxf)
        # apply the same depth-dependent CTF the scoring model uses
        df = defocus_nominal + depth[t] * PIXEL      # (P,)
        ctf = _ctf_at_points(grid_pts[None], NBOX, PIXEL,
                             jnp.asarray(df)[:, None, None],
                             jnp.asarray(df)[:, None, None],
                             0.0, 300.0, 2.7, 0.07, 0.0)
        projs = np.array(fs.fourier_to_image(F * ctf, NBOX))
        for p in range(P):
            cy, cx = pos[t, p] + np.array([NY // 2, NX // 2])
            iy, ix = int(round(cy)), int(round(cx))
            fy, fx = cy - iy, cx - ix
            win = np.array(shift_images(jnp.asarray(projs[p])[None],
                                        jnp.asarray([[fy, fx]]))[0])
            y0, x0 = iy - NBOX // 2, ix - NBOX // 2
            images[t, y0:y0 + NBOX, x0:x0 + NBOX] += win
    images += noise * np.abs(images).max() * rng.randn(*images.shape).astype(np.float32)
    defocus = np.full((T, 2), 15000.0, dtype=np.float32)
    return true, jnp.asarray(images), jnp.asarray(defocus)


class TestCspScore:
    def test_truth_scores_higher_than_perturbed(self):
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol)
        rng = np.random.RandomState(2)
        perturbed = true._replace(
            tilt_shifts=true.tilt_shifts + jnp.asarray(rng.uniform(-3, 3, (T, 2)).astype(np.float32)),
        )
        p_true, s_true = csp.csp_refine(true, images, defocus, vol, PIXEL, NBOX,
                                        modes=(3,), iters_per_mode=0)
        p_pert, s_pert = csp.csp_refine(perturbed, images, defocus, vol, PIXEL, NBOX,
                                        modes=(3,), iters_per_mode=0)
        assert s_true[0] > s_pert[0], (s_true, s_pert)

    def test_mode3_recovers_tilt_shifts(self):
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol)
        rng = np.random.RandomState(3)
        pert_shift = rng.uniform(-2.5, 2.5, (T, 2)).astype(np.float32)
        perturbed = true._replace(tilt_shifts=true.tilt_shifts + jnp.asarray(pert_shift))
        refined, scores = csp.csp_refine(
            perturbed, images, defocus, vol, PIXEL, NBOX,
            modes=(3,), iters_per_mode=40, high_res=2.5 * PIXEL, reg_weight=0.0,
        )
        err0 = np.abs(pert_shift).mean()
        err1 = np.abs(np.asarray(refined.tilt_shifts - true.tilt_shifts)).mean()
        assert err1 < err0 * 0.5, (err0, err1)

    def test_mode1_recovers_particle_rotations(self):
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol)
        rng = np.random.RandomState(4)
        pert = rng.uniform(-6, 6, (P, 3)).astype(np.float32)
        perturbed = true._replace(particle_eulers=true.particle_eulers + jnp.asarray(pert))
        refined, scores = csp.csp_refine(
            perturbed, images, defocus, vol, PIXEL, NBOX,
            modes=(1,), iters_per_mode=40, high_res=2.5 * PIXEL, reg_weight=0.0,
        )
        from pyp_tpu.core.geometry import euler_to_matrix

        def rot_errs(params):
            Rt = euler_to_matrix(true.particle_eulers[:, 0], true.particle_eulers[:, 1], true.particle_eulers[:, 2])
            Re = euler_to_matrix(params.particle_eulers[:, 0], params.particle_eulers[:, 1], params.particle_eulers[:, 2])
            tr = np.einsum("pij,pij->p", np.asarray(Rt), np.asarray(Re))
            return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))

        e0 = rot_errs(perturbed).mean()
        e1 = rot_errs(refined).mean()
        assert e1 < e0 * 0.6, (e0, e1)

    def test_mode0_recovers_tilt_angles(self):
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol)
        rng = np.random.RandomState(5)
        pert = rng.uniform(-1.5, 1.5, T).astype(np.float32)
        perturbed = true._replace(tilt_angles=true.tilt_angles + jnp.asarray(pert))
        refined, scores = csp.csp_refine(
            perturbed, images, defocus, vol, PIXEL, NBOX,
            modes=(0,), iters_per_mode=40, high_res=2.5 * PIXEL, reg_weight=0.0,
        )
        e0 = np.abs(pert).mean()
        e1 = np.abs(np.asarray(refined.tilt_angles - true.tilt_angles)).mean()
        assert e1 < e0, (e0, e1)


class TestCspDefocusMode:
    def test_mode4_recovers_defocus_error(self):
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, noise=0.05)
        rng = np.random.RandomState(6)
        derr = rng.uniform(-500, 500, T).astype(np.float32)
        # data has true defocus; tell the model a WRONG nominal defocus
        wrong_defocus = np.asarray(defocus).copy()
        wrong_defocus[:, 0] += derr
        wrong_defocus[:, 1] += derr
        refined, scores = csp.csp_refine(
            true, images, jnp.asarray(wrong_defocus), vol, PIXEL, NBOX,
            modes=(4,), iters_per_mode=40, high_res=2.5 * PIXEL, reg_weight=0.0,
        )
        # defocus_offsets should cancel the planted error
        resid = np.asarray(refined.defocus_offsets) + derr
        assert np.abs(resid).mean() < np.abs(derr).mean() * 0.7, (
            derr, np.asarray(refined.defocus_offsets))


class TestCspRegions:
    def test_region_partition_and_refine(self):
        from pyp_tpu.pipeline.csp import csp_refine_regions

        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, noise=0.05)
        per_region, region = csp_refine_regions(
            true, images, defocus, vol, PIXEL, NBOX, grid=(2, 1, 1),
            modes=(5,), iters_per_mode=4, reg_weight=0.0,
        )
        assert len(per_region) == 2
        assert region.shape == (P,)
        refined = [p for p in per_region if p is not None]
        assert refined, "no region refined"
        for p in refined:
            assert np.isfinite(np.asarray(p.tilt_shifts)).all()


class TestGridSearch:
    """csp_GS role: discrete search recovers initialization errors outside
    the gradient basin (VERDICT r1 item 6)."""

    def test_recovers_8deg_tilt_angle_errors(self):
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol)
        rng = np.random.RandomState(7)
        pert = true._replace(
            tilt_angles=true.tilt_angles
            + jnp.asarray(rng.choice([-8.0, 8.0], T).astype(np.float32)))

        # control: gradient-only cannot cross an 8 deg basin
        grad_only, _ = csp.csp_refine(
            pert, images, defocus, vol, PIXEL, NBOX, modes=(0,),
            iters_per_mode=20, high_res=8.0)
        err_grad = np.abs(np.asarray(grad_only.tilt_angles)
                          - np.asarray(true.tilt_angles))

        refined, _ = csp.csp_refine(
            pert, images, defocus, vol, PIXEL, NBOX, modes=(0,),
            iters_per_mode=20, high_res=8.0,
            grid_tols={0: 10.0}, grid_steps=11)
        err = np.abs(np.asarray(refined.tilt_angles)
                     - np.asarray(true.tilt_angles))
        assert np.max(err) < 1.0, (err, err_grad)
        assert np.max(err_grad) > np.max(err)

    def test_recovers_particle_shift_errors(self):
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, seed=3)
        rng = np.random.RandomState(8)
        pert = true._replace(
            particle_pos=true.particle_pos
            + jnp.asarray(rng.choice([-5.0, 5.0], (P, 3)).astype(np.float32)))
        refined, _ = csp.csp_refine(
            pert, images, defocus, vol, PIXEL, NBOX, modes=(2,),
            iters_per_mode=20, high_res=8.0,
            grid_tols={2: 6.0}, grid_steps=7)
        err = np.abs(np.asarray(refined.particle_pos)
                     - np.asarray(true.particle_pos))
        assert np.median(err) < 1.0, err

    def test_mode7_refines_particle_rotations(self):
        """Mode 7 (patch particle-rotation variant) is dispatchable and
        improves perturbed eulers."""
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, seed=4)
        rng = np.random.RandomState(9)
        pert = true._replace(
            particle_eulers=true.particle_eulers
            + jnp.asarray(rng.uniform(-8, 8, (P, 3)).astype(np.float32)))
        refined, _ = csp.csp_refine(
            pert, images, defocus, vol, PIXEL, NBOX, modes=(7,),
            iters_per_mode=16, high_res=8.0,
            grid_tols={7: 8.0}, grid_steps=5)
        err0 = np.abs(np.asarray(pert.particle_eulers)
                      - np.asarray(true.particle_eulers))
        err1 = np.abs(np.asarray(refined.particle_eulers)
                      - np.asarray(true.particle_eulers))
        assert np.median(err1) < np.median(err0)
        assert np.median(err1) < 2.0, err1

    def test_spin_ring_recovers_random_inplane_phi(self):
        """Surface-prior scenario: theta/psi known (membrane normal), phi
        uniform-random. The spin ring + mode-1 polish recovers rotations the
        gradient alone cannot (phi error up to 180 deg)."""
        from pyp_tpu.core.geometry import euler_to_matrix

        vol = make_reference()
        true, images, defocus = make_tilt_series(vol, seed=5)
        rng = np.random.RandomState(11)
        spin = rng.uniform(-180, 180, P).astype(np.float32)
        pert_eul = np.asarray(true.particle_eulers).copy()
        pert_eul[:, 0] += spin  # phi = first-applied Rz = free spin
        pert = true._replace(particle_eulers=jnp.asarray(pert_eul))

        def rot_err(params):
            Rt = euler_to_matrix(true.particle_eulers[:, 0],
                                 true.particle_eulers[:, 1],
                                 true.particle_eulers[:, 2])
            Re = euler_to_matrix(params.particle_eulers[:, 0],
                                 params.particle_eulers[:, 1],
                                 params.particle_eulers[:, 2])
            tr = np.einsum("pij,pij->p", np.asarray(Rt), np.asarray(Re))
            return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))

        # control: gradient-only stays lost
        grad_only, _ = csp.csp_refine(
            pert, images, defocus, vol, PIXEL, NBOX, modes=(1,),
            iters_per_mode=20, high_res=8.0, reg_weight=0.0)
        # spin ring + polish
        refined, _ = csp.csp_refine(
            pert, images, defocus, vol, PIXEL, NBOX, modes=(1,),
            iters_per_mode=20, high_res=8.0, reg_weight=0.0,
            spin_step=15.0)
        e_grad = np.median(rot_err(grad_only))
        e_spin = np.median(rot_err(refined))
        assert e_spin < 5.0, (e_spin, e_grad)
        assert e_grad > e_spin, (e_grad, e_spin)


class TestPerParticleScores:
    def test_refine_returns_particle_scores(self):
        import jax.numpy as jnp

        from pyp_tpu.ops import csp

        # reuse the module's synthetic helpers: small series
        vol = make_reference()
        true, images, defocus = make_tilt_series(vol)
        refined, scores, pscores = csp.csp_refine(
            true, images, defocus, vol, PIXEL, NBOX, modes=(3,),
            iters_per_mode=2, return_particle_scores=True)
        assert pscores.shape == (np.asarray(true.particle_pos).shape[0],)
        assert np.isfinite(pscores).all()
        # at the true parameters every particle should correlate positively
        assert (pscores > 0).all(), pscores


class TestBatchedEngine:
    """csp_refine_batch (one fused dispatch for S series) must match the
    single-series path exactly — same schedule, same math, just vmapped."""

    def test_batch_matches_single(self):
        import jax

        from pyp_tpu.ops.fourier_slice import volume_to_fourier
        from pyp_tpu.ops.refine3d import make_mask_points

        vol = make_reference()
        rng = np.random.RandomState(7)
        series = []
        for seed in (1, 5):
            true, images, defocus = make_tilt_series(vol, seed=seed)
            pert = true._replace(
                tilt_shifts=true.tilt_shifts + jnp.asarray(
                    rng.uniform(-2, 2, (T, 2)).astype(np.float32)))
            series.append((pert, images, defocus))

        modes = (3, 1)
        kw = dict(iters_per_mode=5, high_res=8.0, reg_weight=0.05)

        singles = [
            csp.csp_refine(p, im, df, vol, PIXEL, NBOX, modes=modes,
                           return_particle_scores=True, **kw)
            for p, im, df in series
        ]

        Fref = volume_to_fourier(jnp.asarray(vol))
        mask_pts = jnp.asarray(make_mask_points(NBOX, PIXEL, 60.0, 8.0))
        prep = [csp.prepare_series_windows(im, p, NBOX, mask_pts)
                for p, im, df in series]
        cp_b = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[p for p, _, _ in series])
        xv_b = jnp.stack([jnp.asarray(x) for x, _, _ in prep])
        wc_b = jnp.stack([jnp.asarray(w) for _, w, _ in prep])
        va_b = jnp.stack([jnp.asarray(v) for _, _, v in prep])
        df_b = jnp.stack([df for _, _, df in series])
        tw_b = jnp.ones((2, T), jnp.float32)

        refined_b, mode_scores_b, pscores_b = csp.csp_refine_batch(
            cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
            (None, None), None, modes, NBOX, PIXEL,
            iters_per_mode=5, reg_weight=0.05)

        for i, (p_single, s_single, ps_single) in enumerate(singles):
            p_batch = jax.tree.map(lambda x: np.asarray(x[i]), refined_b)
            for name in csp.CspParams._fields:
                np.testing.assert_allclose(
                    getattr(p_batch, name),
                    np.asarray(getattr(p_single, name)),
                    rtol=2e-4, atol=2e-4, err_msg=f"series {i} field {name}")
            np.testing.assert_allclose(
                np.asarray(mode_scores_b[i]), np.asarray(s_single),
                rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(pscores_b[i]), ps_single, rtol=1e-4, atol=1e-5)

    def test_chunked_dispatch_matches_whole_batch(self):
        """series_per_dispatch chunking (bounds single-dispatch wall time on
        shared-tunnel runtimes) must be invisible: S=3 series through chunk=2
        dispatches (second chunk padded) == one whole-batch dispatch."""
        import jax

        from pyp_tpu.ops.fourier_slice import volume_to_fourier
        from pyp_tpu.ops.refine3d import make_mask_points

        vol = make_reference()
        rng = np.random.RandomState(11)
        series = []
        for seed in (1, 5, 9):
            true, images, defocus = make_tilt_series(vol, seed=seed)
            pert = true._replace(
                tilt_shifts=true.tilt_shifts + jnp.asarray(
                    rng.uniform(-2, 2, (T, 2)).astype(np.float32)))
            series.append((pert, images, defocus))

        Fref = volume_to_fourier(jnp.asarray(vol))
        mask_pts = jnp.asarray(make_mask_points(NBOX, PIXEL, 60.0, 8.0))
        prep = [csp.prepare_series_windows(im, p, NBOX, mask_pts)
                for p, im, df in series]
        cp_b = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[p for p, _, _ in series])
        xv_b = jnp.stack([jnp.asarray(x) for x, _, _ in prep])
        wc_b = jnp.stack([jnp.asarray(w) for _, w, _ in prep])
        va_b = jnp.stack([jnp.asarray(v) for _, _, v in prep])
        df_b = jnp.stack([df for _, _, df in series])
        tw_b = jnp.ones((3, T), jnp.float32)

        kw = dict(iters_per_mode=3, reg_weight=0.05)
        whole = csp.csp_refine_batch(
            cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
            (None, None), None, (3, 1), NBOX, PIXEL,
            series_per_dispatch=3, **kw)
        chunked = csp.csp_refine_batch(
            cp_b, xv_b, wc_b, df_b, mask_pts, Fref, tw_b, va_b,
            (None, None), None, (3, 1), NBOX, PIXEL,
            series_per_dispatch=2, **kw)
        for w, c in zip(jax.tree.leaves(whole), jax.tree.leaves(chunked)):
            np.testing.assert_allclose(np.asarray(c), np.asarray(w),
                                       rtol=1e-5, atol=1e-6)

    def test_swarm_batch_pipeline(self, tmp_path):
        """csp_swarm_batch end-to-end: padded series of different P, metadata
        persisted, accumulators chained."""
        import os

        from pyp_tpu.io.metadata import ItemMetadata
        from pyp_tpu.pipeline.csp import csp_swarm_batch

        vol = make_reference()
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            items = []
            for i, seed in enumerate((1, 5)):
                true, images, defocus = make_tilt_series(vol, seed=seed)
                name = f"series{i}"
                meta = ItemMetadata(name, ".", mode="tomo")
                meta["tlt"] = ANGLES
                meta["ctf"] = np.asarray(defocus)
                meta["box"] = np.zeros((P, 5), dtype=np.float32)
                meta.save()
                n_keep = P if i == 0 else P - 2  # different particle counts
                items.append({
                    "name": name,
                    "tilts": np.asarray(images),
                    "coords": np.asarray(true.particle_pos)[:n_keep],
                    "eulers": np.asarray(true.particle_eulers)[:n_keep],
                })
            params = {
                "scope_pixel": PIXEL, "scope_voltage": 300.0,
                "scope_cs": 2.7, "scope_wgh": 0.07, "csp_box": NBOX,
                "csp_refine_modes": "3", "csp_OptimizerIters": 3,
            }
            refined, acc, scores, pscores = csp_swarm_batch(
                items, params, vol, ".")
            assert len(refined) == 2
            assert refined[0].particle_pos.shape[0] == P
            assert refined[1].particle_pos.shape[0] == P - 2
            assert len(pscores[1]) == P - 2
            assert all(np.isfinite(s).all() for s in pscores)
            # accumulators chained over both series and finalizable
            from pyp_tpu.ops import reconstruct as rec

            out = rec.finalize(acc, NBOX)
            assert np.isfinite(np.asarray(out.volume)).all()
            meta2 = ItemMetadata("series1", ".", mode="tomo").load()
            assert "csp_scores" in meta2
            assert len(meta2["csp_scores"]) == P - 2
        finally:
            os.chdir(cwd)
