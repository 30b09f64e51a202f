"""Micrograph quality assessment (prismPYP role): typical micrographs
score high; aberrant ones (blank ice, drift smear) score low, and the
scores feed the Filters subsystem."""

import json

import numpy as np
import pytest

from pyp_tpu.models import quality as qual

NY = NX = 256


def make_micrograph(rng, kind="good"):
    """Typical = particles on noise; blank = pure noise at another gain;
    smeared = same content dragged along x (motion failure)."""
    mic = rng.randn(NY, NX).astype(np.float32)
    if kind in ("good", "smear"):
        for _ in range(25):
            cy, cx = rng.randint(20, NY - 20), rng.randint(20, NX - 20)
            yy, xx = np.mgrid[-8:9, -8:9]
            blob = np.exp(-(yy**2 + xx**2) / 18.0)
            mic[cy - 8:cy + 9, cx - 8:cx + 9] -= 3.0 * blob
    if kind == "blank":
        mic = 0.3 * rng.randn(NY, NX).astype(np.float32) + 5.0
    return mic


def smear(mic):
    out = np.copy(mic)
    for s in range(1, 12):
        out += np.roll(mic, s, axis=1)
    return (out / 12.0).astype(np.float32)


class TestQualityModel:
    @pytest.mark.slow
    def test_aberrant_micrographs_score_low(self):
        rng = np.random.RandomState(0)
        good = [make_micrograph(rng, "good") for _ in range(14)]
        blank = [make_micrograph(rng, "blank") for _ in range(2)]
        smeared = [smear(make_micrograph(rng, "good")) for _ in range(2)]
        stack = np.stack(good + blank + smeared)

        model = qual.train_quality(stack, size=64, steps=150, batch=8,
                                   seed=0)
        scores = qual.quality_scores(model, stack)
        good_med = np.median(scores[:14])
        bad_max = scores[14:].max()
        assert good_med > bad_max, (good_med, scores[14:])

    def test_featurize_shapes(self):
        rng = np.random.RandomState(1)
        feats = np.asarray(qual.featurize(
            rng.randn(3, NY, NX).astype(np.float32), size=64))
        assert feats.shape == (3, 64, 64, 2)
        # both channels standardized
        assert np.all(np.abs(feats.mean(axis=(1, 2))) < 0.1)


class TestPrismCli:
    @pytest.mark.slow
    def test_prism_then_filter(self, tmp_path, monkeypatch, capsys):
        from pyp_tpu import cli
        from pyp_tpu.io.metadata import ItemMetadata

        monkeypatch.chdir(tmp_path)
        rng = np.random.RandomState(0)
        for i in range(8):
            meta = ItemMetadata(f"g{i}", ".", mode="spr")
            meta["average"] = make_micrograph(rng, "good")
            meta.save()
        meta = ItemMetadata("bad", ".", mode="spr")
        meta["average"] = make_micrograph(rng, "blank")
        meta.save()

        rc = cli.main(["prism", "-prism_steps", "120", "-prism_size", "64",
                       "-prism_batch", "6"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["items"] == 9
        s_bad = ItemMetadata("bad", ".", mode="spr").load().scalars[
            "prism_score"]
        goods = [ItemMetadata(f"g{i}", ".", mode="spr").load().scalars[
            "prism_score"] for i in range(8)]
        assert s_bad < np.median(goods), (s_bad, goods)

        # consensus filtering via the filter mode
        cut = (s_bad + np.median(goods)) / 2
        rc = cli.main(["filter", "-data_set", "ds",
                       "-filter_criteria", f"prism_score>{cut:.4f}",
                       "-filter_name", "prism"])
        assert rc == 0
        sel = json.loads((tmp_path / "ds_prism.filter.json").read_text())
        assert "bad" not in sel["keep"] and len(sel["keep"]) >= 5
