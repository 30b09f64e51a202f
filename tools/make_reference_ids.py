"""Regenerate pyp_tpu/config/reference_param_ids.txt — the flat list of
parameter ids the reference's schema defines (pyp_config.toml [tabs.*]).

The id list is the PROJECT-FILE FORMAT CONTRACT (a nextPYP .pyp_config.toml
is a flat TOML of these ids): the loader uses it to tell "recognized
nextPYP setting this framework does not (yet) consume" apart from
"genuinely unknown key". Run against a reference checkout:

    python tools/make_reference_ids.py /root/reference/config/pyp_config.toml
"""

import re
import sys
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / (
    "pyp_tpu/config/reference_param_ids.txt")


def main(spec_path):
    ids = []
    cur = None
    for line in Path(spec_path).read_text().splitlines():
        m = re.match(r"\[tabs\.([A-Za-z0-9_]+)\.?([A-Za-z0-9_]*)\]", line)
        if m:
            cur = m.group(1)
            if m.group(2) and not m.group(2).startswith("_"):
                ids.append(f"{cur}_{m.group(2)}")
    OUT.write_text("\n".join(sorted(set(ids))) + "\n")
    print(f"{len(set(ids))} ids -> {OUT}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "/root/reference/config/pyp_config.toml")
