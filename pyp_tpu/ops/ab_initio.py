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




def ab_initio_frm(
    stack,
    ctf_params,
    pixel_size: float,
    n_rounds: int = 10,
    start_res: float = 40.0,
    end_res: float = 12.0,
    symmetry: str = "C1",
    angular_step: float = 15.0,
    top_t: int = 8,
    beta0: float = 20.0,
    beta_growth: float = 1.4,
    hard_rounds: int = 3,
    hard_end_res: float = None,
    polish_rounds: int = 2,
    seed: int = 0,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    soft_shifts: str = "zero",
    seed_particles: int = 8,
    random_skip_ratio: float = 0.0,
):
    """Marginalized ab initio on the FRM engine (the cryoSPARC-style
    branch-and-bound role, reference frealign.py:4552): each round scores
    EVERY particle against EVERY direction of the lattice (ops/frm — cheap
    on the MXU), converts scores to a tempered posterior over orientations,
    and reconstructs with each particle inserted at its top-T directions
    weighted by that posterior. Soft assignment is what prevents the
    self-consistent wrong minima that hard-argmax ab initio collapses into
    (STATUS round 1); the inverse temperature beta anneals upward so the
    posterior sharpens as the model improves, alongside the usual
    resolution ladder. Returns (volume, hard poses (B, 5))."""
    import jax.numpy as jnp

    from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
    from pyp_tpu.ops import frm
    from pyp_tpu.ops import reconstruct as rec
    from pyp_tpu.ops.fourier_slice import volume_to_fourier

    stack = np.asarray(stack, dtype=np.float32)
    ctf_params = np.asarray(ctf_params, dtype=np.float32)
    B, n, _ = stack.shape
    rng = np.random.RandomState(seed)
    mask = np.asarray(soft_spherical_mask(n, n * 0.4, 4.0))
    res_ladder = np.geomspace(start_res, end_res, n_rounds)

    # lumpy asymmetric seed: a few particles at random poses (the
    # reference's RandomParticles count, csp_tomo_init tab)
    seed_idx = rng.choice(B, size=min(max(int(seed_particles), 1), B),
                          replace=False)
    poses0 = np.stack([
        rng.uniform(0, 360, len(seed_idx)),
        np.degrees(np.arccos(rng.uniform(-1, 1, len(seed_idx)))),
        rng.uniform(0, 360, len(seed_idx)),
        np.zeros(len(seed_idx)), np.zeros(len(seed_idx)),
    ], axis=1).astype(np.float32)
    out = rec.reconstruct(stack[seed_idx], jnp.asarray(poses0),
                          jnp.asarray(ctf_params[seed_idx]), pixel_size,
                          symmetry=symmetry, voltage_kv=voltage_kv,
                          cs_mm=cs_mm, amplitude_contrast=amplitude_contrast)
    vol = np.array(lowpass_filter_3d(
        jnp.asarray(np.asarray(out.volume) * mask), pixel_size,
        float(res_ladder[0])), dtype=np.float32)

    subset = np.arange(B) % 2
    beta = beta0
    poses_hard = None
    cur_shifts = np.zeros((B, 2), dtype=np.float32)
    for r in range(n_rounds):
        res = float(res_ladder[r])
        cfg = frm.get_config(
            n, pixel_size, low_res=min(300.0, n * pixel_size),
            high_res=max(res, 2.5 * pixel_size),
            angular_step=angular_step, symmetry=symmetry,
            # 1-px marginalization steps: at step s the residual shift
            # reaches s/2, i.e. a phase error pi*r_max*s/n at the band
            # edge — 2-px steps leave enough decorrelation to keep the
            # posterior from ever locking (measured: entropy stuck at ~2
            # bits and cc 0.13 on +/-2 px picks)
            shift_extent=max(2.0, n * 0.05), shift_step=1.0,
            voltage_kv=voltage_kv, cs_mm=cs_mm,
            amplitude_contrast=amplitude_contrast)
        with Timer(f"ab-initio(frm) round {r + 1}/{n_rounds} @ {res:.0f} Å "
                   f"(beta={beta:.0f})"):
            bank = cfg.bank(volume_to_fourier(jnp.asarray(vol)))
            # soft_shifts="zero": scoring assumes centered picks; maximizing
            # over a shift grid ALONE was measured to HURT (selection noise
            # flattens the posterior: cc 0.15 vs 0.43 on +/-1 px picks) —
            # small pick errors blur the soft maps slightly and the
            # hard/polish phases recover them.
            # soft_shifts="marginalize"/"track": marginalize the score
            # over the coarse shift grid ("track" additionally centers the
            # grid on a running estimate) and insert every top-T direction
            # at its winning shift. MEASURED on the 256-particle control at
            # +/-2 px picks: none of zero/marginalize/track bootstraps
            # (cc 0.11-0.26 vs 0.92 at +/-1 px) — selection noise plus the
            # tiny box's 4-ring 24 A band; the practical route for bad
            # picks remains re-picking or classify2d centering. Knobs kept
            # for larger-box regimes where the band has room.
            # "marginalize" = fresh full-grid marginalization every round
            # (no carryover: a wrong early estimate cannot feed back)
            track = soft_shifts == "track"
            marg = track or soft_shifts == "marginalize"
            scores, psis, sh_bd = frm.frm_score_directions(
                stack, ctf_params, cfg, bank,
                shifts=(cur_shifts if track else None),
                marginalize_shifts=marg)
            scores = np.asarray(scores)
            psis = np.asarray(psis)
            D = scores.shape[1]
            T = min(top_t, D)
            top = np.argpartition(-scores, T - 1, axis=1)[:, :T]   # (B, T)
            s_top = np.take_along_axis(scores, top, axis=1)
            p_top = np.take_along_axis(psis, top, axis=1)
            w = np.exp(beta * (s_top - s_top.max(axis=1, keepdims=True)))
            w /= w.sum(axis=1, keepdims=True)
            dirs = bank.directions[top]                  # (B, T, 2)
            if marg:
                sh_top = np.take_along_axis(
                    np.asarray(sh_bd), top[..., None], axis=1)  # (B, T, 2)
            else:
                sh_top = np.zeros((B, T, 2), np.float32)
            poses_soft = np.concatenate([
                dirs, p_top[..., None], sh_top,
            ], axis=2).reshape(B * T, 5).astype(np.float32)
            rows = np.repeat(np.arange(B), T)
            w_round = w.copy()
            if random_skip_ratio > 0.0:
                # stochastic particle dropout per round (the reference's
                # RandomSkipRatio): decorrelates successive models from any
                # one particle's wrong early assignment
                keep = rng.rand(B) >= min(random_skip_ratio, 0.95)
                w_round = w_round * keep[:, None]
            out = rec.reconstruct(
                stack[rows], jnp.asarray(poses_soft),
                jnp.asarray(ctf_params[rows]), pixel_size,
                subset=subset[rows].astype(np.int32),
                weights=w_round.reshape(-1).astype(np.float32),
                symmetry=symmetry, voltage_kv=voltage_kv, cs_mm=cs_mm,
                amplitude_contrast=amplitude_contrast,
            )
            vol = np.array(lowpass_filter_3d(
                jnp.asarray(np.asarray(out.volume) * mask), pixel_size,
                res), dtype=np.float32)
            hard = np.argmax(s_top, axis=1)
            poses_hard = poses_soft.reshape(B, T, 5)[np.arange(B), hard]
            if track:
                cur_shifts = poses_hard[:, 3:5].astype(np.float32)
            logger.info(
                "round %d: posterior entropy %.2f bits (of %.2f), "
                "mean best score %.3f", r + 1,
                float(np.mean(-np.sum(w * np.log2(w + 1e-12), axis=1))),
                float(np.log2(T)), float(s_top.max(axis=1).mean()))
        beta *= beta_growth

    # --- hard phase: the soft posterior lands the model in the right
    # basin (measured cc ~0.6 vs ground truth on the 256-particle control);
    # a few standard exhaustive-refinement rounds at a finer lattice push
    # it to convergence (cc ~0.9 on the same control)
    hard_end = float(hard_end_res if hard_end_res is not None
                     else max(end_res * 0.75, 2.5 * pixel_size))
    hard_ladder = np.geomspace(res_ladder[-1], hard_end, max(hard_rounds, 1))
    for r in range(hard_rounds):
        res = float(hard_ladder[r])
        cfg = frm.get_config(
            n, pixel_size, low_res=min(60.0, n * pixel_size),
            high_res=max(res, 2.5 * pixel_size),
            angular_step=max(angular_step * 0.6, 7.5), symmetry=symmetry,
            shift_extent=max(2.0, n * 0.05), shift_step=1.0,
            voltage_kv=voltage_kv, cs_mm=cs_mm,
            amplitude_contrast=amplitude_contrast)
        with Timer(f"ab-initio(frm) hard round {r + 1}/{hard_rounds} "
                   f"@ {res:.0f} Å"):
            bank = cfg.bank(volume_to_fourier(jnp.asarray(vol)))
            poses_hard, _scores = frm.frm_refine(
                stack, ctf_params, None, cfg, bank=bank)
            poses_hard = np.asarray(poses_hard)
            out = rec.reconstruct(
                stack, jnp.asarray(poses_hard), jnp.asarray(ctf_params),
                pixel_size, subset=subset.astype(np.int32),
                symmetry=symmetry, voltage_kv=voltage_kv, cs_mm=cs_mm,
                amplitude_contrast=amplitude_contrast,
            )
            vol = np.array(lowpass_filter_3d(
                jnp.asarray(np.asarray(out.volume) * mask), pixel_size,
                res), dtype=np.float32)
    # continuous polish tail: the hard rounds stall at the FRM lattice
    # quantization floor; short autodiff gradient rounds from the hard
    # poses push through it (measured on +/-1 px picks: cc 0.45 -> 0.92)
    from pyp_tpu.ops import refine3d

    poses_hard = np.array(poses_hard, dtype=np.float32, copy=True)
    for r in range(polish_rounds):
        res = float(hard_ladder[-1]) * (0.85 ** r)
        Fv = volume_to_fourier(jnp.asarray(vol))
        pts = jnp.asarray(refine3d.make_mask_points(
            n, pixel_size, min(60.0, n * pixel_size),
            max(res, 2.5 * pixel_size)))
        p2, _sc = refine3d.local_refine(
            jnp.asarray(stack), jnp.asarray(ctf_params), Fv,
            jnp.asarray(poses_hard), pts, n, pixel_size, iters=24,
            voltage_kv=voltage_kv, cs_mm=cs_mm,
            amplitude_contrast=amplitude_contrast)
        poses_hard = np.array(p2, dtype=np.float32, copy=True)
        o = rec.reconstruct(stack, poses_hard, ctf_params, pixel_size,
                            symmetry=symmetry, voltage_kv=voltage_kv,
                            cs_mm=cs_mm,
                            amplitude_contrast=amplitude_contrast)
        vol = np.array(lowpass_filter_3d(
            jnp.asarray(np.asarray(o.volume) * mask), pixel_size,
            max(res, 2.5 * pixel_size)), dtype=np.float32)
    return vol, poses_hard


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
