"""Replay a recorded `.pyp_history` through the CLI.

The reference's main regression suite replays recorded command histories
from `.pyp_history`/`.csp_history` files against golden outputs
(tests/test_pyp.py:374-378, SURVEY §4). Every pyp_tpu invocation appends
its mode+args to `.pyp_history` (cli.main); this tool re-runs them in
order, so a project directory can be reproduced from raw data — or a
recorded session can be turned into a regression test.

Usage:
    python tools/replay_history.py <history-file> [--dry-run]
        [--only MODE[,MODE..]] [--skip MODE[,MODE..]] [--stop-on-error]
"""

from __future__ import annotations

import argparse
import shlex
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_history(path):
    """`.pyp_history` lines -> [(timestamp, argv)]. Lines look like
    `2026-08-17 21:45:03 spr -data_path ...`."""
    entries = []
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        toks = shlex.split(line)
        # leading "YYYY-MM-DD HH:MM:SS" stamp is optional
        if len(toks) >= 2 and toks[0].count("-") == 2 and ":" in toks[1]:
            stamp, argv = " ".join(toks[:2]), toks[2:]
        else:
            stamp, argv = "", toks
        if argv:
            entries.append((stamp, argv))
    return entries


def replay(path, only=None, skip=None, dry_run=False,
           stop_on_error=False, runner=None):
    """Re-run each recorded command. Returns a report list."""
    import os

    from pyp_tpu import cli

    os.environ["PYP_TPU_NO_HISTORY"] = "1"  # replays must not re-append
    if runner is None:
        runner = cli.main
    report = []
    for stamp, argv in parse_history(path):
        mode = argv[0]
        if only and mode not in only:
            continue
        if skip and mode in skip:
            report.append({"mode": mode, "rc": None, "skipped": True})
            continue
        if dry_run:
            report.append({"mode": mode, "rc": None, "argv": argv})
            continue
        rc = runner(argv)
        report.append({"mode": mode, "rc": int(rc)})
        if rc and stop_on_error:
            break
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("history")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--stop-on-error", action="store_true")
    args = ap.parse_args()
    report = replay(
        args.history,
        only=set(t for t in args.only.split(",") if t) or None,
        skip=set(t for t in args.skip.split(",") if t) or None,
        dry_run=args.dry_run, stop_on_error=args.stop_on_error)
    import json

    print(json.dumps(report, indent=1))
    bad = [r for r in report if r.get("rc")]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
