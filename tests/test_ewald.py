"""Ewald-sphere correction (FREALIGN IEWALD role, reference reconstruct
tab): particles synthesized ON the curved sphere must reconstruct better
with the matching curvature than with planar insertion, and the wrong
handedness must be worse still."""

import jax.numpy as jnp
import numpy as np

from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops import fourier_slice as fs
from pyp_tpu.ops import reconstruct as rec
from tests.test_refine3d import make_volume, N, PIXEL

PAD = 2


def curved_project(Fvol, R, n, ewald_c):
    """PHYSICAL curved projection: a real image mixes both sphere branches,
    X(g) = (F(q+(g)) + F*(q+(-g))) / 2 with q+(g) = g.e + c g^2 ez —
    hermitian by construction."""
    q = fs.slice_coords(R, n)                        # (B, n, nxf, 3) zyx
    ky = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)
    kx = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    g2 = ky[:, None] ** 2 + kx[None, :] ** 2
    ez = R[..., 2, :][..., ::-1]                     # beam axis, zyx
    curve = ewald_c * g2[None, :, :, None] * ez[:, None, None, :]
    Fp = fs.gather_3d_hermitian(Fvol, q + curve, scale=float(PAD))
    Fm = fs.gather_3d_hermitian(Fvol, -q + curve, scale=float(PAD))
    return 0.5 * (Fp + jnp.conj(Fm))


def make_curved_particles(vol, ewald_c, n_particles=96, seed=0):
    rng = np.random.RandomState(seed)
    phi = rng.uniform(0, 360, n_particles).astype(np.float32)
    theta = np.degrees(np.arccos(
        rng.uniform(-1, 1, n_particles))).astype(np.float32)
    psi = rng.uniform(0, 360, n_particles).astype(np.float32)
    R = euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta),
                        jnp.asarray(psi))
    Fvol = fs.volume_to_fourier(jnp.asarray(vol), PAD)
    F = curved_project(Fvol, R, N, ewald_c)
    poses = np.stack([phi, theta, psi, np.zeros(n_particles),
                      np.zeros(n_particles)], 1).astype(np.float32)
    return F, jnp.asarray(R), poses


def reconstruct_with(F, R, ewald_c):
    B = F.shape[0]
    ones = jnp.ones((B, N, N // 2 + 1), jnp.float32)
    subset = jnp.asarray(np.arange(B) % 2)
    w = jnp.ones(B)
    n1, d1, n2, d2 = fs.insert_slices_halves(
        F, ones, R, subset, w, N, pad=PAD, ewald_c=ewald_c)
    vol = fs.reconstruct_from_accumulators(n1 + n2, d1 + d2, N, PAD,
                                           wiener=0.2)
    return np.asarray(vol)


class TestEwaldInsertion:
    def test_curved_insertion_beats_planar_and_wrong_hand(self):
        vol = make_volume(seed=0)
        # exaggerated curvature so the effect dominates at N=32:
        # dz at Nyquist ~ c * (N/2)^2 = 5.1 voxels
        c = 0.02
        F, R, _ = make_curved_particles(vol, c)

        def cc(v):
            return np.corrcoef(v.ravel(), vol.ravel())[0, 1]

        cc_curved = cc(reconstruct_with(F, R, c))
        cc_planar = cc(reconstruct_with(F, R, 0.0))
        cc_flip = cc(reconstruct_with(F, R, -c))
        assert cc_curved > cc_planar + 0.02, (cc_curved, cc_planar)
        assert cc_curved > 0.85, cc_curved
        # simple insertion is handedness-INVARIANT: the hermitian volume
        # storage supplies the second sphere branch automatically, so the
        # +-c point sets coincide (handedness only matters for the
        # reference-based unmixing variant, IEWALD=+-2)
        assert abs(cc_flip - cc_curved) < 1e-6, (cc_flip, cc_curved)

    def test_zero_curvature_reduces_to_planar(self):
        """ewald_c=0 must produce the exact planar-path result (the Ewald
        branch is skipped entirely)."""
        vol = make_volume(seed=1)
        F, R, _ = make_curved_particles(vol, 0.0, n_particles=16)
        a = reconstruct_with(F, R, 0.0)
        # reference: direct planar insertion path
        B = F.shape[0]
        ones = jnp.ones((B, N, N // 2 + 1), jnp.float32)
        n1, d1, n2, d2 = fs.insert_slices_halves(
            F, ones, R, jnp.asarray(np.arange(B) % 2), jnp.ones(B), N,
            pad=PAD)
        b = np.asarray(fs.reconstruct_from_accumulators(
            n1 + n2, d1 + d2, N, PAD, wiener=0.2))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_accumulate_wires_voltage_curvature(self):
        """accumulate(iewald=1) computes c = lambda/(2 n pixel) from the
        voltage and improves recovery of curved-synthesized CTF-modulated
        data at an artificially low voltage (big lambda)."""
        from pyp_tpu.core.ctf import wavelength

        vol = make_volume(seed=2)
        voltage = 1.0   # ~1.2 Å wavelength -> strong curvature at N=32
        c = float(wavelength(voltage)) / (2.0 * N * PIXEL)
        F, R, poses = make_curved_particles(vol, c, n_particles=96, seed=3)
        B = F.shape[0]
        cp = np.tile([15000.0, 15000.0, 0.0, 0.0], (B, 1)).astype(
            np.float32)
        ctfs = rec._ctf_grids(N, PIXEL, jnp.asarray(cp), voltage, 2.7, 0.07)
        imgs = jnp.asarray(fs.fourier_to_image(F * ctfs, N))
        subset = jnp.asarray(np.arange(B) % 2)
        w = jnp.ones(B)

        def run(iew):
            acc = rec.accumulate(imgs, jnp.asarray(poses),
                                 jnp.asarray(cp), subset, w,
                                 N, PIXEL, voltage_kv=voltage, iewald=iew)
            out = rec.finalize(acc, N)
            return np.corrcoef(np.asarray(out.volume).ravel(),
                               vol.ravel())[0, 1]

        cc1, cc0 = run(1), run(0)
        assert cc1 > cc0 + 0.01, (cc1, cc0)


def split_ctf_project(Fvol, R, n, ewald_c, chi):
    """PHYSICAL curved image formation with the branch-dependent complex
    transfer factor (Wolf/DeRosier/Grigorieff 2006):
        X(g) = ctf+ F(s+) + conj(ctf+) F*(s-),  ctf+ = (i/2) e^{i chi},
    which collapses to X = -sin(chi) F at ewald_c = 0."""
    q = fs.slice_coords(R, n)
    ky = jnp.asarray(np.fft.fftfreq(n) * n, dtype=jnp.float32)
    kx = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    g2 = ky[:, None] ** 2 + kx[None, :] ** 2
    ez = R[..., 2, :][..., ::-1]
    curve = ewald_c * g2[None, :, :, None] * ez[:, None, None, :]
    Fp = fs.gather_3d_hermitian(Fvol, q + curve, scale=float(PAD))
    Fm = fs.gather_3d_hermitian(Fvol, -q + curve, scale=float(PAD))
    ctfp = 0.5j * jnp.exp(1j * chi.astype(jnp.complex64))
    return ctfp * Fp + jnp.conj(ctfp) * jnp.conj(Fm)


class TestEwaldReferenceBased:
    """IEWALD ±2 (reference-based unmixing, frealign.py:1780-1824 Ewald
    card): the current map predicts the opposite sphere branch, which is
    subtracted from the measured mixture before matched-filter insertion
    by the complex branch CTF. Unlike the simple ±1 mode (provably
    handedness-invariant) the e^{±i chi} phases make this mode
    handedness-SENSITIVE."""

    VOLTAGE = 1.0  # ~1.2 Å wavelength -> strong curvature at N=32

    def _make_split_data(self, vol, sign=+1, n_particles=96, seed=3):
        from pyp_tpu.core.ctf import wavelength

        c = sign * float(wavelength(self.VOLTAGE)) / (2.0 * N * PIXEL)
        rng = np.random.RandomState(seed)
        phi = rng.uniform(0, 360, n_particles).astype(np.float32)
        theta = np.degrees(np.arccos(
            rng.uniform(-1, 1, n_particles))).astype(np.float32)
        psi = rng.uniform(0, 360, n_particles).astype(np.float32)
        R = euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta),
                            jnp.asarray(psi))
        cp = np.stack([
            rng.uniform(8000, 25000, n_particles),
            rng.uniform(8000, 25000, n_particles),
            rng.uniform(0, 180, n_particles),
            np.zeros(n_particles)], 1).astype(np.float32)
        Fvol = fs.volume_to_fourier(jnp.asarray(vol), PAD)
        chi = rec._chi_grids(N, PIXEL, jnp.asarray(cp), self.VOLTAGE,
                             2.7, 0.07)
        X = split_ctf_project(Fvol, R, N, c, chi)
        imgs = np.asarray(fs.fourier_to_image(X, N))
        poses = np.stack([phi, theta, psi, np.zeros(n_particles),
                          np.zeros(n_particles)], 1).astype(np.float32)
        return imgs, poses, cp, abs(c)

    def test_reference_based_beats_simple_and_wrong_hand(self):
        """Data synthesized with +handed curvature: iewald=+2 (with the
        true map as reference) must beat both iewald=+1 (simple) and
        iewald=-2 (wrong handedness)."""
        vol = make_volume(seed=0)
        imgs, poses, cp, _c = self._make_split_data(vol, sign=+1)

        def run(iew, ref=None):
            out = rec.reconstruct(
                imgs, poses, cp, PIXEL, voltage_kv=self.VOLTAGE,
                iewald=iew, wiener=0.2, ref_volume=ref)
            return np.corrcoef(np.asarray(out.volume).ravel(),
                               vol.ravel())[0, 1]

        cc_ref = run(2, ref=vol)
        cc_ref_flip = run(-2, ref=vol)
        cc_simple = run(1)
        assert cc_ref > cc_simple + 0.005, (cc_ref, cc_simple)
        assert cc_ref > cc_ref_flip + 0.01, (cc_ref, cc_ref_flip)
        assert cc_ref > 0.9, cc_ref

    def test_handedness_detectable_from_data(self):
        """The mirror scenario: data made with NEGATIVE handedness must
        prefer iewald=-2 — i.e. the mode genuinely reads the data's
        curvature sign rather than just preferring one sign."""
        vol = make_volume(seed=1)
        imgs, poses, cp, _c = self._make_split_data(vol, sign=-1, seed=5)

        def run(iew):
            out = rec.reconstruct(
                imgs, poses, cp, PIXEL, voltage_kv=self.VOLTAGE,
                iewald=iew, wiener=0.2, ref_volume=vol)
            return np.corrcoef(np.asarray(out.volume).ravel(),
                               vol.ravel())[0, 1]

        cc_minus, cc_plus = run(-2), run(2)
        assert cc_minus > cc_plus + 0.01, (cc_minus, cc_plus)

    def test_project_ewald_reduces_to_project_flat(self):
        vol = make_volume(seed=3)
        Fvol = fs.volume_to_fourier(jnp.asarray(vol), PAD)
        from pyp_tpu.core.geometry import euler_to_matrix as e2m

        R = e2m(jnp.asarray([15.0]), jnp.asarray([40.0]),
                jnp.asarray([70.0]))
        a = np.asarray(fs.project_ewald(Fvol, R, N, 0.0))
        b = np.asarray(fs.project(Fvol, R, N))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_iewald2_without_reference_degrades_to_simple(self):
        """reconstruct(iewald=2) with no ref_volume must still run (simple
        curved insertion) — the documented degradation path."""
        vol = make_volume(seed=2)
        imgs, poses, cp, _ = self._make_split_data(vol, n_particles=16)
        out = rec.reconstruct(imgs, poses, cp, PIXEL,
                              voltage_kv=self.VOLTAGE, iewald=2, wiener=0.2)
        assert np.isfinite(np.asarray(out.volume)).all()
