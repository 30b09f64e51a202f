"""Multi-class occupancy updates from per-class log-likelihoods.

Equivalent of the reference's analysis/occupancies.py (`occupancies` :34,
`occupancy_extended` :70, `classification_initialization` :324): after each
iteration of K-class refinement, per-particle class occupancies are the
softmax of per-class LogP (with an average-occupancy prior), and particles
feed each class reconstruction weighted by OCC/100.
"""

from __future__ import annotations

import numpy as np


def occupancies_from_logp(logp_per_class, prior_occ=None, temperature: float = 1.0):
    """(N, K) LogP -> (N, K) occupancies in percent (rows sum to 100).

    prior_occ: (K,) average class occupancies (mixing proportions) from the
    previous iteration; None = uniform.
    """
    logp = np.asarray(logp_per_class, dtype=np.float64) / max(temperature, 1e-6)
    K = logp.shape[1]
    if prior_occ is None:
        prior = np.zeros(K)
    else:
        p = np.maximum(np.asarray(prior_occ, dtype=np.float64), 1e-6)
        prior = np.log(p / p.sum())
    z = logp + prior[None, :]
    z -= z.max(axis=1, keepdims=True)
    w = np.exp(z)
    w /= w.sum(axis=1, keepdims=True)
    return w * 100.0


def update_average_occupancies(occ):
    """(N, K) -> (K,) mixing proportions for the next iteration's prior."""
    return np.asarray(occ, dtype=np.float64).mean(axis=0)


def classification_initialization(n_particles: int, n_classes: int, seed: int = 0,
                                  jitter: float = 10.0):
    """Random soft start: occupancies near-uniform with jitter so classes
    diverge (reference classification_initialization :324)."""
    rng = np.random.RandomState(seed)
    occ = np.full((n_particles, n_classes), 100.0 / n_classes)
    occ += rng.uniform(-jitter, jitter, occ.shape)
    occ = np.clip(occ, 1e-3, None)
    occ *= 100.0 / occ.sum(axis=1, keepdims=True)
    return occ


def hard_assignments(occ):
    return np.argmax(np.asarray(occ), axis=1)
