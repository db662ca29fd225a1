"""Regenerate registry._DRIVER_LAST_VERIFIED from the CORRECTNESS_r*.json
artifacts — the mechanical start-of-round step (round 9 did this by hand
with an ad-hoc script; this tool makes the transcription reproducible and
guarantees agreement with the drift test in tests/test_registry_order.py,
which derives the same map with the same rule).

Prints the dict body ready to paste into registry.py. Rule: a name's
round is the LAST round with a full hash-green row, or (for the designed
rows-only queries) a rows>0 'no_oracle' row.

Usage: PYTHONPATH=/root/repo python tools/ledger_transcribe.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap

# Exactly the queries designed WITHOUT a SQL oracle (rows-only driver
# check). multimodal_features was removed r11: it has carried a real
# oracle since r5, and keeping it here could mask a silently lost oracle
# (tests/test_registry_order.py pins that every non-listed query HAS one).
ROWS_ONLY_OK = ("o4_sort_random", "f12_where_udf_tier")


def derive(root: str) -> dict[str, int]:
    out: dict[str, int] = {}
    # Glob r*.json and parse r(\d+): the earlier r0* glob / r0(\d+) regex
    # silently skipped two-digit rounds (r10+), freezing the ledger while
    # the drift test kept passing against stale evidence (ADVICE r9).
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ) or (
                row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) > 0
                and name in ROWS_ONLY_OK
            )
            if ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    derived = derive(root)
    by_round: dict[int, list[str]] = {}
    for n, r in derived.items():
        by_round.setdefault(r, []).append(n)
    for r in sorted(by_round):
        names = sorted(by_round[r])
        body = ", ".join(f'"{n}"' for n in names)
        wrapped = textwrap.fill(
            body, width=72, initial_indent="        ",
            subsequent_indent="        ",
        )
        print(f"    **{{n: {r} for n in (\n{wrapped},\n    )}},")
    print(f"# {len(derived)} names, max round {max(by_round)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
