"""Every schema parameter must be CONSUMED by non-config code (VERDICT r2
item 5: "no dead schema" — a param that never reaches a kernel argument is
UI noise, not capability). The reference's schema is consumed via its
project_params plumbing; here consumption = the literal id appearing in
pyp_tpu source outside config/ (params["id"], params.get("id"), or an
explicit keyword wiring site) or in tools/ (benchmark knobs).
"""

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _source_blob():
    blobs = []
    for base in (REPO / "pyp_tpu", REPO / "tools"):
        for p in base.rglob("*.py"):
            if "config" in p.parts and p.name == "schema.py":
                continue
            blobs.append(p.read_text())
    blobs.append((REPO / "bench.py").read_text())
    return "\n".join(blobs)


def test_every_param_is_consumed():
    from pyp_tpu.config.schema import all_params

    blob = _source_blob()
    dead = [name for name in all_params() if f'"{name}"' not in blob
            and f"'{name}'" not in blob]
    assert not dead, (
        f"{len(dead)} schema params are never consumed outside the schema: "
        f"{dead[:20]}{'...' if len(dead) > 20 else ''}")


def test_param_count_target():
    """Coverage floor so the schema keeps growing toward the reference's
    ~1,524 params (pyp_config.toml); round-3 target >= 400 (VERDICT)."""
    from pyp_tpu.config.schema import all_params

    assert len(all_params()) >= 400, len(all_params())
