"""Workflow runner (the reference's Workflows feature,
docs/guide/workflows.rst): TOML block sequences run in dependency order,
ask-args substitute from overrides, parameter-only blocks persist."""

import json

import numpy as np
import pytest

from pyp_tpu.sched.workflow import (load_workflow, order_blocks,
                                    resolve_args, run_workflow)

WF = """
name = "test workflow"

[blocks.second]
blockId = "sp-filtering"
parent = "rawdata"
[blocks.second.args]
filter_name = "wf"
data_set = { ask = true }

[blocks.rawdata]
blockId = "sp-rawdata"
[blocks.rawdata.args]
scope_pixel = 0.66
data_path = { ask = true }
"""


class TestParsing:
    def test_order_respects_parent_links(self, tmp_path):
        p = tmp_path / "wf.toml"
        p.write_text(WF)
        wf = load_workflow(p)
        assert order_blocks(wf["blocks"]) == ["rawdata", "second"]

    def test_cycle_raises(self):
        with pytest.raises(ValueError):
            order_blocks({"a": {"parent": "b"}, "b": {"parent": "a"}})

    def test_ask_args_required(self, tmp_path):
        p = tmp_path / "wf.toml"
        p.write_text(WF)
        wf = load_workflow(p)
        with pytest.raises(ValueError, match="data_path"):
            resolve_args(wf["blocks"]["rawdata"], {}, "rawdata")
        out = resolve_args(wf["blocks"]["rawdata"],
                           {"data_path": "/x/*.tif"}, "rawdata")
        assert out == {"scope_pixel": 0.66, "data_path": "/x/*.tif"}


class TestRun:
    def test_runs_blocks_in_order(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        p = tmp_path / "wf.toml"
        p.write_text(WF)
        calls = []

        def runner(mode, argv):
            calls.append((mode, argv))
            return 0

        report = run_workflow(p, {"data_path": "/x/*.tif",
                                  "data_set": "ds"}, runner=runner)
        assert [b["mode"] for b in report] == ["params", "filter"]
        assert calls[0][0] == "filter"
        assert "-filter_name" in calls[0][1]
        # parameter-only block persisted for downstream modes
        from pyp_tpu.config import params as cfg

        saved = cfg.load_parameters(".")
        assert abs(saved["scope_pixel"] - 0.66) < 1e-9

    def test_negative_number_overrides(self, tmp_path, monkeypatch,
                                       capsys):
        """Negative numeric values are flag VALUES, not flags."""
        from pyp_tpu import cli
        from pyp_tpu.config import params as cfg

        monkeypatch.chdir(tmp_path)
        (tmp_path / "wf.toml").write_text("""
[blocks.rawdata]
blockId = "sp-rawdata"
[blocks.rawdata.args]
tomo_rec_zshift = { ask = true }
""")
        rc = cli.main(["workflow", "wf.toml", "-tomo_rec_zshift", "-5"])
        assert rc == 0
        saved = cfg.load_parameters(".")
        assert float(saved["tomo_rec_zshift"]) == -5.0
        assert "5" not in {k for k in saved if k.isdigit()}

    def test_cli_end_to_end(self, tmp_path, monkeypatch, capsys):
        from pyp_tpu import cli
        from pyp_tpu.io.metadata import ItemMetadata

        monkeypatch.chdir(tmp_path)
        meta = ItemMetadata("m1", ".", mode="spr")
        meta["ctf"] = np.array([15000.0, 14000.0, 0.0, 0.0, 0.9, 5.0])
        meta.save()
        (tmp_path / "wf.toml").write_text(WF)
        rc = cli.main(["workflow", "wf.toml", "-data_path", "/x/*.tif",
                       "-data_set", "ds"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert [b["rc"] for b in rep["blocks"]] == [0, 0]
        sel = json.loads((tmp_path / "ds_wf.filter.json").read_text())
        assert sel["keep"] == ["m1"]
