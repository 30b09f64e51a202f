"""Project HTML report (web-dashboard counterpart): metrics, FSC curves,
and model-fit tracks render into one self-contained file."""

import json

import numpy as np

from pyp_tpu.io.metadata import ItemMetadata


def seed_project(tmp_path):
    for i, res in enumerate((5.0, 7.5, 12.0)):
        meta = ItemMetadata(f"m{i}", tmp_path, mode="spr")
        meta["ctf"] = np.array([15000.0, 14000.0, 0.0, 0.0, 0.9, res])
        meta["box"] = np.zeros((10 * (i + 1), 4), np.float32)
        meta.save()
    maps = tmp_path / "maps"
    maps.mkdir()
    freqs = np.linspace(0.01, 0.25, 30)
    for it in (2, 3):
        curve = 1.0 / (1.0 + np.exp((freqs - 0.1 * it) * 60))
        np.savetxt(maps / f"ds_r01_{it:02d}_fsc.txt",
                   np.stack([freqs, curve], 1))
    (maps / "ds_model_fit.txt").write_text("2 0.61 0 0 0\n3 0.72 0 0 0\n")
    (maps / "ds_r01_history.json").write_text(json.dumps([
        {"iteration": 2, "resolution": 8.1,
         "median_angular_change_deg": 12.0, "occupancies": [100.0]},
        {"iteration": 3, "resolution": 5.2,
         "median_angular_change_deg": 2.5, "occupancies": [100.0]},
    ]))


class TestReport:
    def test_builds_self_contained_html(self, tmp_path):
        from pyp_tpu.analysis.report import build_report, collect_project

        seed_project(tmp_path)
        data = collect_project(tmp_path)
        assert len(data["items"]) == 3
        assert len(data["fscs"]) == 2
        assert data["model_fit"] == [(2, 0.61), (3, 0.72)]

        # a pre-existing artifact image must be embedded too
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(1, 1))
        fig.savefig(tmp_path / "classes_montage.png")
        plt.close(fig)

        out = build_report(tmp_path, "ds")
        text = (tmp_path / "ds_report.html").read_text()
        assert "data:image/png;base64," in text        # embedded plots
        assert "m0" in text and "m2" in text           # item table
        assert "Model fit" in text
        assert "classes_montage.png" in text           # artifact embedded
        assert "Refinement history" in text            # history panels
        assert "Dataset time series" in text
        assert len(text) > 10000                       # real images inline

    def test_cli_mode(self, tmp_path, monkeypatch, capsys):
        from pyp_tpu import cli

        monkeypatch.chdir(tmp_path)
        seed_project(tmp_path)
        assert cli.main(["report", "-data_set", "ds"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["report"].endswith("ds_report.html")
