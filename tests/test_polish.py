"""Movie polishing tests: recover known per-frame particle trajectories."""

import jax.numpy as jnp
import numpy as np

from pyp_tpu.ops import fourier_slice as fs, polish, reconstruct as rec
from pyp_tpu.core.geometry import euler_to_matrix
from tests.test_refine3d import make_volume, N, PIXEL


def make_movie_particles(n_particles=6, n_frames=6, traj_scale=1.5, noise=0.1, seed=0):
    rng = np.random.RandomState(seed)
    vol = make_volume()
    phi = rng.uniform(0, 360, n_particles).astype(np.float32)
    theta = np.degrees(np.arccos(rng.uniform(-1, 1, n_particles))).astype(np.float32)
    psi = rng.uniform(0, 360, n_particles).astype(np.float32)
    df = rng.uniform(14000, 22000, n_particles).astype(np.float32)
    ctf_params = np.stack([df, df, np.zeros(n_particles), np.zeros(n_particles)], 1).astype(np.float32)
    poses = np.stack([phi, theta, psi, np.zeros(n_particles), np.zeros(n_particles)], 1).astype(np.float32)

    Fv = fs.volume_to_fourier(jnp.asarray(vol))
    R = euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta), jnp.asarray(psi))
    Fp = fs.project(Fv, R, N)
    ctfs = rec._ctf_grids(N, PIXEL, jnp.asarray(ctf_params), 300.0, 2.7, 0.07)
    base = Fp * ctfs  # (P, N, nxf)

    # smooth per-particle trajectories
    t = np.linspace(0, 1, n_frames)
    traj = np.stack([
        np.outer(rng.uniform(-traj_scale, traj_scale, n_particles), t**2),
        np.outer(rng.uniform(-traj_scale, traj_scale, n_particles), t),
    ], axis=-1).astype(np.float32)  # (P, F, 2)
    traj -= traj.mean(axis=1, keepdims=True)

    windows = np.zeros((n_particles, n_frames, N, N), dtype=np.float32)
    for f in range(n_frames):
        Ff = rec._shift_correct(base, jnp.asarray(traj[:, f]), N)
        windows[:, f] = np.array(fs.fourier_to_image(Ff, N))
    windows += noise * np.abs(windows).max() * rng.randn(*windows.shape).astype(np.float32)
    return vol, windows, poses, ctf_params, traj


class TestPolish:
    def test_recovers_trajectories(self):
        vol, windows, poses, ctf_params, traj_true = make_movie_particles()
        Fref = fs.volume_to_fourier(jnp.asarray(vol))
        from pyp_tpu.ops.refine3d import make_mask_points

        pts = make_mask_points(N, PIXEL, 100.0, 2.5 * PIXEL)
        traj, score = polish.refine_trajectories(
            jnp.asarray(windows), jnp.asarray(poses), jnp.asarray(ctf_params),
            Fref, jnp.asarray(pts), N, PIXEL, iters=40, reg_weight=0.5,
        )
        # recovered trajectory should cancel the true one: traj = -traj_true
        err = np.abs(np.asarray(traj) + traj_true)
        base_err = np.abs(traj_true)
        assert err.mean() < base_err.mean() * 0.6, (base_err.mean(), err.mean())

    def test_polished_average_sharper(self):
        vol, windows, poses, ctf_params, traj_true = make_movie_particles(noise=0.05)
        stack = polish.polished_average(
            jnp.asarray(windows), jnp.asarray(-traj_true),
            jnp.arange(1.0, 7.0), PIXEL,
        )
        naive = windows.mean(axis=1)
        # polished images should correlate better with the frame-0-aligned truth
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        from pyp_tpu.core.geometry import euler_to_matrix as e2m

        R = e2m(jnp.asarray(poses[:, 0]), jnp.asarray(poses[:, 1]), jnp.asarray(poses[:, 2]))
        clean = np.array(fs.fourier_to_image(
            fs.project(Fv, R, N) * rec._ctf_grids(N, PIXEL, jnp.asarray(ctf_params), 300.0, 2.7, 0.07), N))

        def mean_cc(a):
            out = []
            for i in range(len(a)):
                x, y = a[i].ravel(), clean[i].ravel()
                out.append(np.corrcoef(x, y)[0, 1])
            return np.mean(out)

        assert mean_cc(np.asarray(stack)) > mean_cc(naive)
