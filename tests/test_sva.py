"""Legacy subvolume averaging (ops/sva.py — the reference's sva*/3DAVG
role): bank-rotation FFT alignment of extracted subvolumes and the
wedge-compensated Fourier average, plus the `sva` CLI mode end to end."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from pyp_tpu.ops import sva
from pyp_tpu.ops.template_match import rotate_volume


def _phantom(n):
    truth = np.zeros((n, n, n), np.float32)
    zz, yy, xx = np.mgrid[:n, :n, :n]
    c = n // 2
    for (dz, dy, dx, s, a) in ((0, 0, 0, 3.0, 1.0), (0, -6, 4, 2.0, 0.8),
                               (4, 2, -4, 1.5, 0.6)):
        truth += a * np.exp(-((zz - c - dz) ** 2 + (yy - c - dy) ** 2
                              + (xx - c - dx) ** 2) / (2 * s * s))
    return truth


def _make_subvols(truth, B, wedge_deg, noise, seed=0):
    rng = np.random.RandomState(seed)
    n = truth.shape[0]
    wm = sva.wedge_mask(n, wedge_deg)
    subs, angles, shifts = [], [], []
    for _ in range(B):
        a = (rng.uniform(0, 360), rng.uniform(0, 180), rng.uniform(0, 360))
        v = np.asarray(rotate_volume(jnp.asarray(truth), *a))
        s = rng.randint(-3, 4, 3)
        v = np.roll(v, tuple(s), (0, 1, 2))
        V = np.fft.fftshift(np.fft.fftn(v)) * wm
        v = np.real(np.fft.ifftn(np.fft.ifftshift(V))).astype(np.float32)
        subs.append(v + noise * rng.randn(n, n, n).astype(np.float32))
        angles.append(a)
        shifts.append(s)
    return np.stack(subs), np.asarray(angles), np.asarray(shifts)


class TestWedgeMask:
    def test_full_grid_and_fraction(self):
        wm = sva.wedge_mask(32, 60.0)
        assert wm.shape == (32, 32, 32)
        # +/-60 deg wedge keeps roughly 2/3 of frequencies
        assert 0.6 < wm.mean() < 0.8
        assert sva.wedge_mask(32, 90.0).min() == 1.0

    def test_mask_is_y_invariant(self):
        wm = sva.wedge_mask(16, 55.0)
        assert np.all(wm == wm[:, :1, :])


class TestAlign:
    def test_known_pose_recovered(self):
        truth = _phantom(32)
        true_a = (40.0, 60.0, 100.0)
        v = np.asarray(rotate_volume(jnp.asarray(truth), *true_a))
        v = np.roll(v, (2, -1, 3), (0, 1, 2))
        angles, shifts, scores = sva.align_subvolumes(
            v[None], truth, angular_step=20.0, shift_extent=5,
            wedge_deg=90.0)
        assert np.allclose(np.asarray(shifts)[0], [2, -1, 3])
        assert float(np.asarray(scores)[0]) > 0.9
        # found angle within the 20-degree lattice of the truth
        from pyp_tpu.core.geometry import euler_to_matrix

        Rt = np.asarray(euler_to_matrix(*true_a))
        Rf = np.asarray(euler_to_matrix(
            *[float(x) for x in np.asarray(angles)[0]]))
        geo = np.degrees(np.arccos(np.clip(
            (np.trace(Rt @ Rf.T) - 1) / 2, -1, 1)))
        assert geo < 25.0, geo


class TestAverage:
    def test_single_volume_back_transform(self):
        truth = _phantom(32)
        a = (40.0, 60.0, 100.0)
        v = np.asarray(rotate_volume(jnp.asarray(truth), *a))
        v = np.roll(v, (2, -1, 3), (0, 1, 2))
        avg = np.asarray(sva.average_subvolumes(
            v[None], np.asarray([a]), np.asarray([[2, -1, 3]]),
            wedge_deg=90.0))
        cc = np.corrcoef(avg.ravel(), truth.ravel())[0, 1]
        assert cc > 0.99, cc

    def test_wedge_compensation_beats_raw(self):
        truth = _phantom(32)
        subs, _, _ = _make_subvols(truth, 12, wedge_deg=60.0, noise=0.5)
        res = sva.sva_iterate(subs, reference=truth, iters=1,
                              angular_step=30.0, shift_extent=5,
                              wedge_deg=60.0)
        cc = np.corrcoef(np.asarray(res.average).ravel(),
                         truth.ravel())[0, 1]
        raw = np.corrcoef(subs.mean(0).ravel(), truth.ravel())[0, 1]
        assert cc > raw + 0.2, (cc, raw)
        assert cc > 0.5, cc


@pytest.mark.slow
class TestSvaCli:
    def test_sva_mode_on_tomogram_picks(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli
        from pyp_tpu.io import mrc
        from pyp_tpu.io.metadata import ItemMetadata

        truth = _phantom(24)
        rng = np.random.RandomState(3)
        # one fake "tomogram" with copies of the phantom at known centers
        vol = 0.1 * rng.randn(64, 96, 96).astype(np.float32)
        centers = [(32, 30, 30), (32, 30, 66), (32, 66, 48)]
        for (cz, cy, cx) in centers:
            a = (rng.uniform(0, 360), rng.uniform(0, 180),
                 rng.uniform(0, 360))
            r = np.asarray(rotate_volume(jnp.asarray(truth), *a))
            vol[cz - 12:cz + 12, cy - 12:cy + 12, cx - 12:cx + 12] += r
        mrc.write(vol, "t1.rec.mrc", pixel_size=2.0)
        meta = ItemMetadata("t1", ".", mode="tomo").load()
        meta["box"] = np.asarray(
            [(z, y, x, 1.0) for (z, y, x) in centers], np.float32)
        meta.save()

        rc = cli.main(["sva", "-scope_pixel", "2.0", "-sva_box", "24",
                       "-sva_iters", "1", "-sva_ang", "45",
                       "-sva_shift", "3", "-sva_wedge", "90",
                       "-data_set", "t"])
        assert rc == 0
        avg = mrc.read("t_sva.mrc")
        assert avg.shape == (24, 24, 24)
        al = np.load("sva_alignment.npz")
        assert len(al["scores"]) == 3
        cc = np.corrcoef(np.asarray(avg).ravel(), truth.ravel())[0, 1]
        assert cc > 0.6, cc


class TestLocalRefine:
    def test_local_rounds_tighten_angles(self):
        from pyp_tpu.core.geometry import euler_to_matrix

        truth = _phantom(32)
        rng = np.random.RandomState(2)
        subs, angs = [], []
        for _ in range(6):
            a = (rng.uniform(0, 360), rng.uniform(0, 180),
                 rng.uniform(0, 360))
            v = np.asarray(rotate_volume(jnp.asarray(truth), *a))
            subs.append(v + 0.3 * rng.randn(32, 32, 32).astype(np.float32))
            angs.append(a)
        subs = np.stack(subs)

        def med_geo(found):
            errs = []
            for b, a in enumerate(angs):
                Rt = np.asarray(euler_to_matrix(*a))
                Rf = np.asarray(euler_to_matrix(
                    *[float(x) for x in np.asarray(found)[b]]))
                errs.append(np.degrees(np.arccos(np.clip(
                    (np.trace(Rt @ Rf.T) - 1) / 2, -1, 1))))
            return float(np.median(errs))

        a1, s1, _ = sva.align_subvolumes(subs, truth, angular_step=30.0,
                                         shift_extent=3)
        a2, s2, _ = sva.refine_subvolumes(subs, truth, np.asarray(a1),
                                          np.asarray(s1), tol_angle=30.0,
                                          step=10.0, shift_extent=2)
        assert med_geo(a2) < med_geo(a1) - 5.0, (med_geo(a1), med_geo(a2))

    def test_band_filter_shapes(self):
        w = sva._band_filter(32, (0.25, 0.05), (0.05, 0.02))
        assert w.shape == (32, 32, 17)
        assert w[0, 0, 0] < 0.6      # highpass suppresses DC
        assert w[0, 0, 16] < 0.1     # lowpass suppresses Nyquist
        assert w[0, 0, 3] > 0.9      # mid-band passes

    def test_soft_mask(self):
        m = sva._sphere(32, radius_px=10, sigma_px=4)
        assert m[16, 16, 16] == 1.0
        assert 0.0 < m[16, 16, 28] < 1.0   # r=12: inside the soft edge
        assert m[16, 16, 31] == 0.0        # r=15: past radius+sigma


class TestClassify:
    def test_two_state_separation(self):
        rng = np.random.RandomState(4)
        n, B = 24, 12
        a_state = _phantom(24)
        b_state = np.roll(a_state, 5, axis=1)  # distinct second state
        subs, labels_true = [], []
        for b in range(B):
            state = a_state if b % 2 == 0 else b_state
            subs.append(state + 0.3 * rng.randn(n, n, n).astype(np.float32))
            labels_true.append(b % 2)
        subs = np.stack(subs)
        labels, avgs = sva.classify_subvolumes(
            subs, np.zeros((B, 3)), np.zeros((B, 3)), 2, wedge_deg=90.0)
        labels_true = np.asarray(labels_true)
        agree = max(np.mean(labels == labels_true),
                    np.mean(labels != labels_true))
        assert agree >= 10 / 12, (labels, labels_true)
        assert len(avgs) == 2
