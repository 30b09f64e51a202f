"""Ab initio initial model generation.

Equivalent of the reference's initial-model path (frealign.py:4552
`create_initial_model` and the ab-initio branch bin/run/pyp:4185): stochastic
refinement from a featureless start — iterate global orientation search on
random particle subsets against the current model with a resolution ladder
(very low resolution first so the landscape is smooth), reconstruct, lowpass,
repeat. The classic cisTEM ab-initio recipe, here batched on TPU.
"""

from __future__ import annotations

import numpy as np

from pyp_tpu.utils import Timer, get_logger

logger = get_logger("ab_initio")


def ab_initio(
    stack,
    ctf_params,
    pixel_size: float,
    n_rounds: int = 6,
    start_res: float = 40.0,
    end_res: float = 12.0,
    subset_frac: float = 0.5,
    symmetry: str = "C1",
    angular_step: float = 20.0,
    seed: int = 0,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    anneal: float = 0.0,
):
    """Returns (volume (n, n, n), final poses (B, 5)).

    Resolution ladder: geometric from start_res to end_res over rounds;
    each round refines a random subset globally and reconstructs from ALL
    particles assigned so far (unassigned particles keep random poses from
    round 0 with decaying weight).
    """
    import jax.numpy as jnp

    from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.ops import refine3d

    stack = np.asarray(stack, dtype=np.float32)
    B, n, _ = stack.shape
    rng = np.random.RandomState(seed)

    poses = np.stack([
        rng.uniform(0, 360, B),
        np.degrees(np.arccos(rng.uniform(-1, 1, B))),
        rng.uniform(0, 360, B),
        np.zeros(B), np.zeros(B),
    ], axis=1).astype(np.float32)

    mask = np.asarray(soft_spherical_mask(n, n * 0.4, 4.0))
    res_ladder = np.geomspace(start_res, end_res, n_rounds)

    def reconstruct_from(idx, poses, res):
        out = rec.reconstruct(
            stack[idx], jnp.asarray(poses[idx]),
            jnp.asarray(np.asarray(ctf_params)[idx]), pixel_size,
            symmetry=symmetry, voltage_kv=voltage_kv, cs_mm=cs_mm,
            amplitude_contrast=amplitude_contrast, batch=min(256, len(idx)),
        )
        vol = np.asarray(out.volume) * mask
        return np.array(
            lowpass_filter_3d(jnp.asarray(vol), pixel_size, float(res)),
            dtype=np.float32,
        )

    # symmetry breaking: seed the model from a handful of particles at random
    # poses — a lumpy, asymmetric start. A full-dataset random-pose
    # reconstruction is nearly centrosymmetric and the search can never
    # break the tie (every orientation matches a blob equally well).
    seed_idx = rng.choice(B, size=min(8, B), replace=False)
    vol = reconstruct_from(seed_idx, poses, res_ladder[0])
    all_idx = np.arange(B)

    def reconstruct_all(poses, res):
        return reconstruct_from(all_idx, poses, res)

    for r in range(n_rounds):
        res = float(res_ladder[r])
        k = max(8, int(B * subset_frac))
        sel = rng.choice(B, size=k, replace=False)
        with Timer(f"ab-initio round {r + 1}/{n_rounds} @ {res:.0f} Å"):
            out = refine3d.refine_batch(
                jnp.asarray(stack[sel]), jnp.asarray(np.asarray(ctf_params)[sel]),
                vol, pixel_size,
                angular_step=angular_step, psi_step=angular_step,
                low_res=300.0, high_res_search=res, high_res_refine=res,
                shift_extent=max(2.0, n * 0.05), shift_step=2.0,
                symmetry=symmetry, mode="global", topk=2, local_iters=10,
                voltage_kv=voltage_kv, cs_mm=cs_mm,
                amplitude_contrast=amplitude_contrast,
            )
            poses[sel] = np.stack([
                np.asarray(out.phi), np.asarray(out.theta), np.asarray(out.psi),
                np.asarray(out.shift_y), np.asarray(out.shift_x),
            ], axis=1)
            if anneal > 0 and r < n_rounds - 1:
                # stochastic annealing: decaying angular noise keeps the
                # assignment distribution from collapsing onto a bad seed
                frac = 1.0 - r / max(n_rounds - 1, 1)
                poses[:, :3] += rng.normal(
                    0, anneal * frac, poses[:, :3].shape)
            vol = reconstruct_all(poses, res)
    return vol, poses


def mean_particle_score(stack, ctf_params, poses, volume, pixel_size,
                        res: float, voltage_kv=300.0, cs_mm=2.7, w=0.07):
    """Mean CTF-weighted NCC of the stack against a model at given poses —
    the model-selection criterion for multi-seed ab initio."""
    import jax.numpy as jnp

    from pyp_tpu.ops import refine3d
    from pyp_tpu.ops.fourier_slice import volume_to_fourier

    n = stack.shape[-1]
    pts = refine3d.make_mask_points(n, pixel_size, 300.0, res)
    _, scores = refine3d.local_refine(
        jnp.asarray(stack), jnp.asarray(ctf_params),
        volume_to_fourier(jnp.asarray(volume)), jnp.asarray(poses),
        jnp.asarray(pts), n, pixel_size, iters=0,
        voltage_kv=voltage_kv, cs_mm=cs_mm, amplitude_contrast=w,
    )
    return float(np.mean(np.asarray(scores)))


def ab_initio_multiseed(
    stack, ctf_params, pixel_size: float, n_seeds: int = 4, **kw,
):
    """Run `n_seeds` independent ab-initio trajectories and keep the model
    whose refined particle scores are highest — the cheap, robust fix for
    seed-dependent collapse (cisTEM runs multiple starts the same way).
    Returns (volume, poses, best_seed, per-seed scores)."""
    end_res = float(kw.get("end_res", 12.0))
    base_seed = int(kw.pop("seed", 0))
    results = []
    scores = []
    for s in range(n_seeds):
        vol, poses = ab_initio(stack, ctf_params, pixel_size,
                               seed=base_seed + s * 101, **kw)
        sc = mean_particle_score(stack, ctf_params, poses, vol, pixel_size,
                                 end_res)
        results.append((vol, poses))
        scores.append(sc)
        logger.info("ab-initio seed %d: mean score %.4f", s, sc)
    best = int(np.argmax(scores))
    vol, poses = results[best]
    return vol, poses, best, scores
