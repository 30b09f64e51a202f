"""Pallas kernel tests (interpret mode on CPU): numerical equivalence with
the XLA reference implementation."""

import jax.numpy as jnp
import numpy as np

from pyp_tpu.ops import pallas_kernels as pk


def make_problem(A=40, G=200, D=50, S=9, seed=0):
    rng = np.random.RandomState(seed)
    v = (rng.randn(A, G) + 1j * rng.randn(A, G)).astype(np.complex64)
    u = (rng.randn(G, D) + 1j * rng.randn(G, D)).astype(np.complex64)
    ph = rng.uniform(0, 2 * np.pi, (G, S)).astype(np.float32)
    E = np.exp(1j * ph).astype(np.complex64)
    ninv = (1.0 / (1.0 + rng.rand(A, D))).astype(np.float32)
    return jnp.asarray(v), jnp.asarray(u), jnp.asarray(E), jnp.asarray(ninv)


class TestShiftScoredMatch:
    def test_matches_xla_reference(self):
        v, u, E, ninv = make_problem()
        ref_score, ref_idx = pk.shift_scored_match_xla(v, u, E, ninv)
        out_score, out_idx = pk.shift_scored_match(v, u, E, ninv, interpret=True)
        np.testing.assert_allclose(np.asarray(out_score), np.asarray(ref_score),
                                   rtol=2e-5, atol=2e-4)
        # indices may differ only where two shifts tie numerically
        disagree = np.asarray(out_idx) != np.asarray(ref_idx)
        assert disagree.mean() < 0.01, disagree.mean()

    def test_nonaligned_shapes_padded(self):
        # deliberately awkward sizes (not multiples of 128/8)
        v, u, E, ninv = make_problem(A=13, G=37, D=5, S=3, seed=1)
        ref_score, _ = pk.shift_scored_match_xla(v, u, E, ninv)
        out_score, _ = pk.shift_scored_match(v, u, E, ninv, interpret=True)
        np.testing.assert_allclose(np.asarray(out_score), np.asarray(ref_score),
                                   rtol=2e-5, atol=2e-4)

    def test_single_shift(self):
        v, u, E, ninv = make_problem(S=1, seed=2)
        ref_score, ref_idx = pk.shift_scored_match_xla(v, u, E, ninv)
        out_score, out_idx = pk.shift_scored_match(v, u, E, ninv, interpret=True)
        np.testing.assert_allclose(np.asarray(out_score), np.asarray(ref_score),
                                   rtol=2e-5, atol=2e-4)
        assert np.all(np.asarray(out_idx) == 0)
