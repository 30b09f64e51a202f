"""Item filters (the reference web UI's table-view Filters,
docs/guide/filters.rst): criteria over metadata metrics select per-item
subsets that downstream modes honor via -filter_sel."""

import json
import os

import numpy as np

from pyp_tpu.analysis.filters import (apply_filter, evaluate, item_metrics,
                                      load_selection, parse_criteria,
                                      save_selection)
from pyp_tpu.io.metadata import ItemMetadata


def write_item(work_dir, name, ctf_res, drift_total, n_particles):
    meta = ItemMetadata(name, work_dir, mode="spr")
    meta["ctf"] = np.array([15000.0, 14000.0, 30.0, 0.0, 0.8, ctf_res])
    # straight-line drift of the requested total length over 10 frames
    steps = np.full((10, 2), drift_total / 9 / np.sqrt(2))
    meta["drift"] = np.cumsum(np.vstack([[0.0, 0.0], steps[1:]]), axis=0)
    meta["box"] = np.zeros((n_particles, 4), dtype=np.float32)
    meta.save()
    return meta


class TestMetricsAndCriteria:
    def test_item_metrics(self, tmp_path):
        write_item(tmp_path, "a", ctf_res=6.5, drift_total=30.0,
                   n_particles=50)
        m = item_metrics(ItemMetadata("a", tmp_path, mode="spr").load())
        assert abs(m["ctf_res"] - 6.5) < 1e-6
        assert abs(m["defocus"] - 14500.0) < 1e-3
        assert abs(m["astigmatism"] - 1000.0) < 1e-3
        assert abs(m["drift"] - 30.0) < 0.5
        assert m["particles"] == 50

    def test_parse_and_evaluate(self):
        clauses = parse_criteria("ctf_res<8, drift<=60 particles>10")
        assert len(clauses) == 3
        assert evaluate({"ctf_res": 6, "drift": 60, "particles": 11},
                        clauses)
        assert not evaluate({"ctf_res": 9, "drift": 60, "particles": 11},
                            clauses)
        # missing metric -> excluded
        assert not evaluate({"ctf_res": 6, "drift": 60}, clauses)

    def test_bad_clause_raises(self):
        import pytest

        with pytest.raises(ValueError):
            parse_criteria("ctf_res ~ 8")


class TestApplyAndSelect:
    def test_filter_and_roundtrip(self, tmp_path):
        write_item(tmp_path, "good", 6.0, 20.0, 100)
        write_item(tmp_path, "bad_ctf", 12.0, 20.0, 100)
        write_item(tmp_path, "bad_drift", 6.0, 150.0, 100)
        kept, table = apply_filter(tmp_path, "ctf_res<8 drift<60")
        assert kept == ["good"], kept
        assert set(table) == {"good", "bad_ctf", "bad_drift"}
        # manual overrides win
        kept2, _ = apply_filter(tmp_path, "ctf_res<8 drift<60",
                                include=["bad_ctf"], exclude=["good"])
        assert kept2 == ["bad_ctf"], kept2
        p = save_selection(tmp_path / "ds_f1.filter.json", kept,
                           "ctf_res<8 drift<60", table)
        assert load_selection(p) == {"good"}
        # bare-name resolution
        assert load_selection("f1", tmp_path, "ds") == {"good"}


class TestCliIntegration:
    def test_filter_mode_and_discovery(self, tmp_path, monkeypatch,
                                       capsys):
        from pyp_tpu import cli

        monkeypatch.chdir(tmp_path)
        write_item(".", "aa", 6.0, 20.0, 100)
        write_item(".", "bb", 12.0, 20.0, 100)
        # item files the discovery globs over
        for n in ("aa", "bb"):
            (tmp_path / f"{n}.mrc").write_bytes(b"")
        rc = cli.main(["filter", "-data_set", "ds",
                       "-filter_criteria", "ctf_res<8",
                       "-filter_name", "good"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["kept"] == 1 and rep["total"] == 2
        assert os.path.exists("ds_good.filter.json")

        items = cli._discover_items({"data_path": "*.mrc",
                                     "filter_sel": "good",
                                     "data_set": "ds"})
        assert [it["name"] for it in items] == ["aa"]


class TestClassicDenoisers:
    """Native bm4d-role NLM + IMOD-NAD role diffusion (reference
    [tabs.denoise]): both must cut noise while keeping structure."""

    def _noisy_phantom(self, seed=0):
        import jax.numpy as jnp

        from pyp_tpu.core.filters import lowpass_filter_3d

        rng = np.random.RandomState(seed)
        n = 48
        clean = np.zeros((n, n, n), dtype=np.float32)
        clean[12:36, 12:36, 12:36] = 1.0   # bright cube = edge structure
        clean = np.asarray(lowpass_filter_3d(jnp.asarray(clean), 1.0, 4.0))
        noisy = clean + 0.5 * rng.randn(n, n, n).astype(np.float32)
        return clean, noisy

    def test_nlm_reduces_noise_keeps_structure(self):
        from pyp_tpu.ops.denoise_classic import nlm_denoise_3d

        clean, noisy = self._noisy_phantom()
        den = np.asarray(nlm_denoise_3d(noisy, patch_size=3, nsearch=7,
                                        sigma=0.5))
        rms_before = np.sqrt(np.mean((noisy - clean) ** 2))
        rms_after = np.sqrt(np.mean((den - clean) ** 2))
        assert rms_after < 0.7 * rms_before, (rms_after, rms_before)
        cc = np.corrcoef(den.ravel(), clean.ravel())[0, 1]
        assert cc > np.corrcoef(noisy.ravel(), clean.ravel())[0, 1]

    def test_nad_reduces_noise(self):
        from pyp_tpu.ops.denoise_classic import nad_denoise_3d

        clean, noisy = self._noisy_phantom(seed=1)
        den = np.asarray(nad_denoise_3d(noisy, iters=12, sigma=1.5))
        rms_before = np.sqrt(np.mean((noisy - clean) ** 2))
        rms_after = np.sqrt(np.mean((den - clean) ** 2))
        assert rms_after < 0.8 * rms_before, (rms_after, rms_before)

    def test_dispatch(self):
        from pyp_tpu.ops.denoise_classic import denoise_map

        _, noisy = self._noisy_phantom(seed=2)
        for method in ("bm4d", "nad"):
            out = np.asarray(denoise_map(noisy, method=method, nsearch=5,
                                         patch_size=3))
            assert out.shape == noisy.shape and np.isfinite(out).all()
