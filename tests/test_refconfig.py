"""nextPYP project-file interop (VERDICT r3 item 3): a reference
`.pyp_config.toml` — a flat TOML of reference parameter ids
(reference project_params.py:550) — must parse without unknown-key errors:
every key either loads, is tolerated as an external-tool setting, or is
reported as recognized-but-unconsumed. Nothing in the reference schema may
land in `unknown`."""

from pathlib import Path

import pytest

from pyp_tpu.config import params as cfg
from pyp_tpu.config.params import (OUT_OF_SCOPE_PREFIXES,
                                   TOLERATED_IMPL_IDS,
                                   TOLERATED_IMPL_PREFIXES, _reference_ids,
                                   load_reference_config)
from pyp_tpu.config.schema import all_params


def _toml_literal(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'


def write_full_reference_config(path):
    """A project file setting EVERY id the reference schema defines."""
    known = all_params()
    lines = []
    for rid in sorted(_reference_ids()):
        if rid in known:
            v = known[rid].default
            if v is None:
                v = ""
        else:
            v = 1
        lines.append(f"{rid} = {_toml_literal(v)}")
    Path(path).write_text("\n".join(lines) + "\n")


class TestReferenceConfig:
    def test_full_reference_schema_parses_without_unknowns(self, tmp_path):
        p = tmp_path / ".pyp_config.toml"
        write_full_reference_config(p)
        params, report = load_reference_config(p)
        assert report["unknown"] == []
        # the split is exhaustive and meaningful
        n = (len(report["loaded"]) + len(report["tolerated"])
             + len(report["unimplemented"]))
        assert n == len(_reference_ids())
        assert len(report["loaded"]) >= 270, len(report["loaded"])
        for k in report["tolerated"]:
            assert (k.startswith(OUT_OF_SCOPE_PREFIXES)
                    or k.startswith(TOLERATED_IMPL_PREFIXES)
                    or k in TOLERATED_IMPL_IDS), k

    def test_garbage_key_is_reported_unknown(self, tmp_path):
        p = tmp_path / ".pyp_config.toml"
        p.write_text('scope_pixel = 1.35\nnot_a_real_param = 7\n')
        params, report = load_reference_config(p)
        assert params["scope_pixel"] == 1.35
        assert report["unknown"] == ["not_a_real_param"]

    def test_type_coercion_from_strings(self, tmp_path):
        p = tmp_path / ".pyp_config.toml"
        p.write_text('scope_pixel = "1.25"\nrefine_maxiter = "4"\n'
                     'csp_GridSearch = "true"\n')
        params, _ = load_reference_config(p)
        assert params["scope_pixel"] == 1.25
        assert params["refine_maxiter"] == 4
        assert params["csp_GridSearch"] is True

    def test_cli_seeds_from_reference_project_file(self, tmp_path,
                                                   monkeypatch):
        """First run inside an existing nextPYP project: the reference
        project file seeds the namespace and persists to this framework's
        own project file."""
        monkeypatch.chdir(tmp_path)
        (tmp_path / ".pyp_config.toml").write_text(
            "scope_pixel = 0.66\nrelion_refine_general_whatever = 3\n")
        from pyp_tpu.cli import _project_params

        params = _project_params([])
        assert params["scope_pixel"] == 0.66
        assert (tmp_path / cfg.PROJECT_FILE).exists()
        # second call reads the persisted file, not the reference one
        params2 = _project_params(["-scope_pixel=0.8"])
        assert params2["scope_pixel"] == 0.8


class TestFullReferenceIdCoverage:
    def test_every_reference_id_loads_or_is_tolerated(self):
        """VERDICT r3 item 3 'done' criterion: a nextPYP project file must
        parse without unknown-key errors. Every id the reference schema
        defines (reference_param_ids.txt, regenerated from
        pyp_config.toml) must classify as loaded (in the schema, incl.
        aliases) or explicitly tolerated — never unknown."""
        from pyp_tpu.config.params import (OUT_OF_SCOPE_PREFIXES,
                                           TOLERATED_IMPL_IDS,
                                           TOLERATED_IMPL_PREFIXES,
                                           _reference_ids, all_params)

        ap = set(all_params())
        unknown = [
            r for r in _reference_ids()
            if r not in ap and r not in TOLERATED_IMPL_IDS
            and not r.startswith(tuple(OUT_OF_SCOPE_PREFIXES))
            and not r.startswith(tuple(TOLERATED_IMPL_PREFIXES))
        ]
        assert not unknown, (len(unknown), sorted(unknown)[:20])

    def test_loaded_fraction_floor(self):
        """Most reference ids map onto real engine parameters (796/1,521
        at round 4) — ratchet so the loaded share never silently shrinks
        back toward tolerate-everything."""
        from pyp_tpu.config.params import _reference_ids, all_params

        ap = set(all_params())
        ids = _reference_ids()
        loaded = sum(1 for r in ids if r in ap)
        assert loaded >= 750, loaded
