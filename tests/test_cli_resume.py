"""CLI-path production e2e with kill/resume, at test scale (VERDICT r4
item 6; reference shape: refine_resume durable-state semantics,
bin/run/pyp:5404 + test_pyp.py replay).

tools/cli_e2e_spa.py drives the REAL user path — `pyp spr` / `extract` /
`refine` / `postprocess` as subprocesses against a file-backed project —
SIGKILLs refine right after the first durable iteration lands, re-runs
it, and requires: a logged resume, untouched durable files, and a final
map matching an uninterrupted control run from the same post-extract
snapshot (exact on the deterministic CPU backend)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

TOOL = Path(__file__).resolve().parent.parent / "tools" / "cli_e2e_spa.py"


@pytest.mark.slow
def test_cli_kill_resume_roundtrip(tmp_path):
    work = tmp_path / "proj"
    rc = subprocess.run(
        [sys.executable, str(TOOL), "--workdir", str(work),
         "--platform", "cpu", "--mics", "2", "--mic-size", "512",
         "--ppm", "24", "--box", "32", "--iters", "3",
         "--rhref", "12:8:8", "--kill-resume"],
        capture_output=True, text=True, timeout=3000)
    assert rc.returncode == 0, rc.stdout[-2000:] + rc.stderr[-2000:]
    report = json.loads((work / "cli_e2e_report.json").read_text())
    assert report["resume"]["resumed_log_line"]
    assert report["resume"]["finished_iteration_untouched"]
    assert report["control"]["exact_match"], report["control"]
    # the whole user path ran and recorded a replayable history
    assert {"spr", "extract", "refine", "postprocess"} <= set(
        report["history_modes"])
    # refinement actually produced a finished final iteration + sharpening
    assert report["final_fsc143_A"] is not None
    assert (work / "maps").glob("*_sharpened.mrc")
