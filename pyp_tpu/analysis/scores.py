"""Score-based particle selection and cleaning.

Equivalent of the reference's analysis/scores.py (shape_phase_residuals
:300, particle_cleaning :981, remove_duplicates :1542): statistical
filtering of particle tables between refinement iterations.
"""

from __future__ import annotations

import numpy as np

from pyp_tpu.io import cistem
from pyp_tpu.utils import get_logger

logger = get_logger("scores")


def score_threshold(scores, mode: str = "otsu", sigma: float = 1.0):
    """Pick a score cutoff: 'otsu' (bimodal split), 'sigma' (mean - k*std),
    or a float quantile in (0, 1)."""
    scores = np.asarray(scores, dtype=np.float64)
    if isinstance(mode, float) or (isinstance(mode, str) and mode.replace(".", "").isdigit()):
        return float(np.quantile(scores, float(mode)))
    if mode == "sigma":
        return float(scores.mean() - sigma * scores.std())
    # otsu on a 128-bin histogram
    hist, edges = np.histogram(scores, bins=128)
    centers = 0.5 * (edges[:-1] + edges[1:])
    total = hist.sum()
    best_t, best_var = centers[0], -1.0
    w0 = 0.0
    sum0 = 0.0
    sum_all = (hist * centers).sum()
    for i in range(128):
        w0 += hist[i]
        if w0 == 0 or w0 == total:
            continue
        sum0 += hist[i] * centers[i]
        m0 = sum0 / w0
        m1 = (sum_all - sum0) / (total - w0)
        var = w0 * (total - w0) * (m0 - m1) ** 2
        if var > best_var:
            best_var, best_t = var, centers[i]
    return float(best_t)


def particle_cleaning(table: cistem.Table, score_cut=None, min_occ: float = 0.0,
                      mode: str = "otsu"):
    """Deactivate particles below the score threshold / occupancy floor.

    Returns (table, kept_mask). Particles are kept in the table (FREALIGN
    semantics: OCC=0 / image_is_active=0 instead of deletion)."""
    scores = np.asarray(table["score"], dtype=np.float64)
    if score_cut is None:
        score_cut = score_threshold(scores, mode)
    keep = scores >= score_cut
    if "occupancy" in table:
        keep &= np.asarray(table["occupancy"]) >= min_occ
    if "image_is_active" in table:
        table["image_is_active"] = keep.astype(np.int64)
    if "occupancy" in table:
        occ = np.asarray(table["occupancy"]).copy()
        occ[~keep] = 0.0
        table["occupancy"] = occ
    logger.info("particle cleaning: %d/%d kept (cutoff %.2f)",
                int(keep.sum()), len(keep), score_cut)
    return table, keep


def remove_duplicates(positions, scores, min_distance: float):
    """Greedy NMS on (N, 2 or 3) positions: keep the best-scoring particle
    within each min_distance neighborhood (reference remove_duplicates
    :1542). Returns a boolean keep mask."""
    positions = np.asarray(positions, dtype=np.float64)
    order = np.argsort(np.asarray(scores))[::-1]
    keep = np.zeros(len(positions), dtype=bool)
    kept_pos = []
    for i in order:
        p = positions[i]
        if all(np.linalg.norm(p - q) >= min_distance for q in kept_pos):
            keep[i] = True
            kept_pos.append(p)
    return keep


def per_frame_weights(scores_per_frame):
    """Relative per-frame weighting from frame-resolved scores (the
    reference's per-frame scoring/weighting for movie refinement :31)."""
    s = np.asarray(scores_per_frame, dtype=np.float64)
    s = s - s.min() + 1e-6
    return s / s.sum()


def angular_groups(phi, theta, n_groups: int = 50):
    """Group particles by viewing direction (coarse orientation clusters for
    defocus/angle grouping, reference :208)."""
    from pyp_tpu.core.geometry import euler_to_matrix
    import jax.numpy as jnp

    R = np.asarray(euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta),
                                   jnp.zeros_like(jnp.asarray(phi))))
    views = R[:, 2, :]  # viewing axes
    # k-means-lite: seed from a Fibonacci sphere
    k = n_groups
    idx = np.arange(k) + 0.5
    ga = np.pi * (1 + 5**0.5) * idx
    z = 1 - 2 * idx / k
    r = np.sqrt(1 - z * z)
    seeds = np.stack([r * np.cos(ga), r * np.sin(ga), z], axis=1)
    assign = np.argmax(views @ seeds.T, axis=1)
    return assign


def select_classes(table, keep_classes):
    """Keep only particles assigned to the given 2D/3D classes (the
    reference's kselection mode): deactivates everything else. Returns
    (table, keep mask)."""
    import numpy as np

    assign = np.asarray(table["best_2d_class"]).astype(int)
    keep = np.isin(assign, np.asarray(list(keep_classes), dtype=int))
    if "image_is_active" in table:
        table["image_is_active"] = keep.astype(np.int64)
    if "occupancy" in table:
        occ = np.asarray(table["occupancy"]).copy()
        occ[~keep] = 0.0
        table["occupancy"] = occ
    logger.info("class selection: %d/%d particles kept (classes %s)",
                int(keep.sum()), len(keep), sorted(keep_classes))
    return table, keep


def assign_angular_defocus_groups(table, n_angles: int = 25,
                                  n_defocuses: int = 25):
    """Partition particles into (angular, defocus) bins (the reference's
    assign_angular_defocus_groups, analysis/scores.py:208): theta is binned
    modulo 180 into `n_angles` groups; defocus_1 is min-max binned into
    `n_defocuses` groups. Returns (angular_group (B,), defocus_group (B,))."""
    theta = np.asarray(table["theta"], dtype=np.float64)
    df1 = np.asarray(table["defocus_1"], dtype=np.float64)
    angular = np.floor(np.mod(theta, 180.0) * n_angles / 180.0).astype(int)
    angular = np.clip(angular, 0, n_angles - 1)
    lo, hi = float(np.floor(df1.min())), float(np.ceil(df1.max()))
    if hi == lo:
        defocus = np.zeros(len(df1), dtype=int)
    else:
        defocus = np.round((df1 - lo) / (hi - lo) * (n_defocuses - 1)).astype(int)
    return angular, defocus


def shape_scores(
    table,
    n_angles: int = 25,
    n_defocuses: int = 25,
    threshold: float = 1.0,
    min_defocus: float = None,
    max_defocus: float = None,
    min_score: float = None,
    max_score: float = None,
    reverse: bool = False,
):
    """Per-(angular, defocus)-group score shaping (the reference's
    shape_phase_residuals role, analysis/scores.py:300): inside each group,
    keep the `threshold` fraction of best-scoring particles — group-local
    cutoffs prevent views/defoci with systematically lower scores from being
    purged wholesale — then apply absolute defocus/score windows. Rejected
    particles get occupancy 0 (and image_is_active 0). Returns (table,
    keep mask)."""
    scores = np.asarray(table["score"], dtype=np.float64)
    df1 = np.asarray(table["defocus_1"], dtype=np.float64)
    ang_g, def_g = assign_angular_defocus_groups(table, n_angles, n_defocuses)
    keep = np.ones(len(scores), dtype=bool)

    if 0.0 < threshold < 1.0:
        group_key = ang_g * n_defocuses + def_g
        for g in np.unique(group_key):
            sel = group_key == g
            cut = np.quantile(scores[sel], 1.0 - threshold)
            bad = sel & ((scores > cut) if reverse else (scores < cut))
            keep[bad] = False
    if min_defocus is not None:
        keep &= df1 >= min_defocus
    if max_defocus is not None:
        keep &= df1 <= max_defocus
    if min_score is not None:
        keep &= scores >= min_score
    if max_score is not None:
        keep &= scores <= max_score

    if "occupancy" in table:
        occ = np.asarray(table["occupancy"]).copy()
        occ[~keep] = 0.0
        table["occupancy"] = occ
    if "image_is_active" in table:
        active = np.asarray(table["image_is_active"]).copy()
        active[~keep] = 0
        table["image_is_active"] = active
    logger.info("score shaping: kept %d/%d particles "
                "(%d angular x %d defocus groups)",
                int(keep.sum()), len(keep), n_angles, n_defocuses)
    return table, keep


def expand_symmetry(table, symmetry: str):
    """Symmetry-expand a particle table: every particle is replicated once
    per point-group rotation with the composed orientation (the
    relion_particle_symmetry_expand role — used ahead of focused
    classification/refinement of features that break the symmetry).

    Pose composition: the particle maps reference coords through
    R(phi,theta,psi); a symmetry mate is R @ S_k (the reference volume is
    invariant under S_k), so the mate's eulers come from matrix_to_euler
    (R @ S_k). Shifts/defoci/occupancies copy through; occupancy is
    divided by the group order so total mass is conserved."""
    import jax.numpy as jnp

    from pyp_tpu.core.geometry import (apply_symmetry_matrices,
                                       euler_to_matrix, matrix_to_euler)
    from pyp_tpu.io import cistem

    mats = apply_symmetry_matrices(symmetry)
    K = len(mats)
    n = table.n_rows
    R = np.asarray(euler_to_matrix(
        jnp.asarray(np.asarray(table["phi"], np.float32)),
        jnp.asarray(np.asarray(table["theta"], np.float32)),
        jnp.asarray(np.asarray(table["psi"], np.float32))))   # (n, 3, 3)
    out = cistem.Table.zeros(n * K)
    for name in table.data:
        out[name] = np.tile(np.asarray(table[name]), K)
    phis, thetas, psis = [], [], []
    for S in mats:
        Rk = np.einsum("nij,jk->nik", R, S)
        ph, th, ps = matrix_to_euler(jnp.asarray(Rk))
        phis.append(np.asarray(ph))
        thetas.append(np.asarray(th))
        psis.append(np.asarray(ps))
    out["phi"] = np.concatenate(phis)
    out["theta"] = np.concatenate(thetas)
    out["psi"] = np.concatenate(psis)
    if "occupancy" in table:
        out["occupancy"] = np.tile(
            np.asarray(table["occupancy"]) / K, K)
    return out
