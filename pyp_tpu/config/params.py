"""Parameter handling: schema-driven CLI, project state, schedules.

Equivalents of the reference's system/project_params.py: generated argparse
(parse_parameters :377), persisted project state (.pyp_config.toml;
load/save_pyp_parameters :1159), and per-iteration schedule resolution
(`param()` :362 — "8:7:6:4:3" means value for iterations 2,3,4,5,6...).
"""

from __future__ import annotations

import argparse
import tomllib
from pathlib import Path

from pyp_tpu.config.schema import SCHEMA, all_params, defaults

PROJECT_FILE = ".pyp_tpu_config.toml"


def build_parser(tabs=None) -> argparse.ArgumentParser:
    """Generate an argparse parser from the schema (all tabs by default)."""
    parser = argparse.ArgumentParser(
        prog="pyp_tpu", description="TPU-native cryo-EM/ET pipeline",
        fromfile_prefix_chars="@",
    )
    for tab, defs in SCHEMA.items():
        if tabs is not None and tab not in tabs:
            continue
        group = parser.add_argument_group(tab)
        for d in defs:
            flag = f"-{d.name}"
            kw: dict = {"help": d.help, "default": None}
            if d.type is bool:
                group.add_argument(flag, dest=d.name, action="store_true",
                                   default=None, help=d.help)
                group.add_argument(f"-no_{d.name}", dest=d.name,
                                   action="store_false", default=None,
                                   help=argparse.SUPPRESS)
            else:
                kw["type"] = d.type if not d.schedule else str
                if d.enum:
                    kw["choices"] = list(d.enum)
                group.add_argument(flag, dest=d.name, **kw)
    return parser


def parse_arguments(argv=None, tabs=None) -> dict:
    """CLI -> parameter dict (defaults + explicit overrides)."""
    parser = build_parser(tabs)
    ns, _unknown = parser.parse_known_args(argv)
    params = defaults()
    for k, v in vars(ns).items():
        if v is not None:
            params[k] = v
    return params


def param(value, iteration: int = 2):
    """Resolve an iteration-scheduled value: "8:7:6:4:3" -> value for the
    given refinement iteration (iteration 2 = first entry, reference
    convention project_params.py:362). Scalars pass through; schedules
    clamp to their last entry."""
    if isinstance(value, str) and ":" in value:
        parts = [p for p in value.split(":") if p != ""]
        idx = max(0, min(iteration - 2, len(parts) - 1))
        v = parts[idx]
        try:
            return int(v)
        except ValueError:
            return float(v)
    if isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            try:
                return float(value)
            except ValueError:
                return value
    return value


# ---------------------------------------------------------------------------
# project state persistence (minimal TOML emitter; tomllib is read-only)
# ---------------------------------------------------------------------------

def _toml_value(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'


def save_parameters(params: dict, directory="."):
    path = Path(directory) / PROJECT_FILE
    known = all_params()
    lines = ["# pyp_tpu project parameters\n[parameters]"]
    for k in sorted(params):
        v = params[k]
        if v is None:
            continue
        lines.append(f"{k} = {_toml_value(v)}")
    unknown = [k for k in params if k not in known]
    path.write_text("\n".join(lines) + "\n")
    return path


def load_parameters(directory="."):
    path = Path(directory) / PROJECT_FILE
    if not path.exists():
        return None
    with open(path, "rb") as f:
        data = tomllib.load(f)
    params = defaults()
    params.update(data.get("parameters", {}))
    return params


def update_parameters(directory, overrides: dict) -> dict:
    """Load + apply overrides + save (the reference's resume-with-changes)."""
    params = load_parameters(directory) or defaults()
    params.update({k: v for k, v in overrides.items() if v is not None})
    save_parameters(params, directory)
    return params
