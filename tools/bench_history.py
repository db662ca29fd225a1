"""Round-over-round bench regression report.

bench.py appends every run to BENCH_HISTORY.jsonl; this prints per-query
deltas between the two most recent runs (or any two indices).

Usage: python tools/bench_history.py [idx_old idx_new]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_HISTORY.jsonl")
    if not os.path.exists(path):
        print("no BENCH_HISTORY.jsonl yet — run bench.py first")
        return 1
    runs = [json.loads(line) for line in open(path) if line.strip()]
    if len(runs) < 2:
        print(f"{len(runs)} run(s) recorded — need 2 for a diff")
        return 0
    i, j = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) == 3 else (-2, -1)
    old, new = runs[i], runs[j]
    print(f"old total {old['value']}s → new total {new['value']}s (sf={new.get('sf')})")
    # calibration-normalized compare: divide each query by its session's
    # calibration anchor so uniform host drift cancels and only real plan
    # changes move the normalized delta
    cal_old, cal_new = old.get("calibration_sec"), new.get("calibration_sec")
    norm = cal_old and cal_new
    if norm:
        print(f"calibration {cal_old}s → {cal_new}s; showing raw Δ and "
              f"calibration-normalized Δ — REGRESSED only when BOTH exceed "
              f"the threshold (the anchor has noise of its own, so either "
              f"alone can mislead)")
    rows = []
    for q, t_new in new["queries"].items():
        t_old = old["queries"].get(q)
        if t_old is None:
            rows.append((q, None, t_new, "NEW"))
        else:
            raw = (t_new - t_old) / t_old * 100 if t_old else 0.0
            if norm and t_old:
                npct = ((t_new / cal_new) / (t_old / cal_old) - 1) * 100
                bad = raw > 25 and npct > 25 and t_new - t_old > 0.3
                note = f"{raw:+.0f}% norm {npct:+.0f}%"
            else:
                bad = raw > 25 and t_new - t_old > 0.3
                note = f"{raw:+.0f}%"
            rows.append((q, t_old, t_new, f"{note} REGRESSED" if bad else note))
    width = max(len(r[0]) for r in rows)
    for q, t_old, t_new, note in sorted(rows, key=lambda r: -(r[2] or 0)):
        print(f"{q:<{width}}  {t_old if t_old is not None else '—':>7}  {t_new:>7}  {note}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
