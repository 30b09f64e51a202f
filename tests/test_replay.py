"""History replay (the reference's regression-suite shape, SURVEY §4 /
test_pyp.py:374): a recorded `.pyp_history` reproduces a project."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np


def _load_replay():
    spec = importlib.util.spec_from_file_location(
        "replay_history",
        Path(__file__).resolve().parent.parent / "tools"
        / "replay_history.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestParse:
    def test_parses_stamped_and_bare_lines(self, tmp_path):
        rh = _load_replay()
        p = tmp_path / ".pyp_history"
        p.write_text(
            "2026-08-17 21:45:03 spr -data_path '/x/*.tif'\n"
            "filter -filter_criteria ctf_res<8\n"
            "\n# comment\n")
        entries = rh.parse_history(p)
        assert len(entries) == 2
        assert entries[0][1][0] == "spr"
        assert entries[0][1][1:] == ["-data_path", "/x/*.tif"]
        assert entries[1][0] == ""  # bare line, no stamp


class TestReplay:
    def test_replays_recorded_session(self, tmp_path, monkeypatch):
        """Record a mini session via the CLI's own history, wipe, replay
        from the history into a fresh dir, compare artifacts."""
        from pyp_tpu import cli
        from pyp_tpu.io.metadata import ItemMetadata

        rh = _load_replay()
        rec = tmp_path / "rec"
        rec.mkdir()
        monkeypatch.chdir(rec)
        meta = ItemMetadata("m1", ".", mode="spr")
        meta["ctf"] = np.array([15000.0, 14000.0, 0.0, 0.0, 0.9, 5.0])
        meta.save()
        assert cli.main(["filter", "-data_set", "ds",
                         "-filter_criteria", "ctf_res<8",
                         "-filter_name", "good"]) == 0
        history = (rec / ".pyp_history").read_text()
        golden = json.loads((rec / "ds_good.filter.json").read_text())

        fresh = tmp_path / "fresh"
        fresh.mkdir()
        monkeypatch.chdir(fresh)
        meta = ItemMetadata("m1", ".", mode="spr")
        meta["ctf"] = np.array([15000.0, 14000.0, 0.0, 0.0, 0.9, 5.0])
        meta.save()
        (fresh / ".pyp_history").write_text(history)
        report = rh.replay(fresh / ".pyp_history")
        assert [r["rc"] for r in report] == [0]
        replayed = json.loads((fresh / "ds_good.filter.json").read_text())
        assert replayed["keep"] == golden["keep"] == ["m1"]

    def test_only_skip_dry(self, tmp_path):
        rh = _load_replay()
        p = tmp_path / "h"
        p.write_text("spr -a 1\ntomo -b 2\nrefine -c 3\n")
        calls = []
        report = rh.replay(p, only={"spr", "refine"}, skip={"refine"},
                           runner=lambda argv: calls.append(argv) or 0)
        assert [r["mode"] for r in report] == ["spr", "refine"]
        assert report[1]["skipped"] is True
        assert calls == [["spr", "-a", "1"]]
        dry = rh.replay(p, dry_run=True,
                        runner=lambda argv: (_ for _ in ()).throw(
                            AssertionError("must not run")))
        assert all(r["rc"] is None for r in dry)
