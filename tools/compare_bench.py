"""Round-over-round bench regression diff.

Compares per-query times between two bench records — either the driver's
`BENCH_r{N}.json` files (tail + parsed forms) or raw `bench.py` output
logs — and prints regressions beyond noise (>1.5x AND >0.5 s slower),
improvements, and queries present on only one side.

Usage: python tools/compare_bench.py OLD NEW
"""

from __future__ import annotations

import json
import re
import sys


def load_times(path: str) -> dict[str, float]:
    text = open(path).read().replace("\r", "\n")
    # driver record: {"tail": ..., "parsed": {...}} — the tail may hold a
    # truncated detail line; harvest every q<N>: <sec> pair we can see.
    try:
        rec = json.loads(text)
        if isinstance(rec, dict) and ("tail" in rec or "parsed" in rec):
            pairs: dict[str, float] = {}
            blob = json.dumps(rec.get("parsed") or {}) + (rec.get("tail") or "")
            for m in re.finditer(r'"(q\d+[a-z0-9_]*)":\s*([0-9.]+)', blob):
                pairs[m.group(1)] = float(m.group(2))
            return pairs
    except json.JSONDecodeError:
        pass
    # raw bench log: prefer the detail line
    times: dict[str, float] = {}
    for m in re.finditer(r'\{"metric".*', text):
        try:
            rec = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if rec.get("metric") == "headline_queries_detail":
            times = {k: float(v) for k, v in rec["queries"].items()}
    return times


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, new = load_times(sys.argv[1]), load_times(sys.argv[2])
    common = sorted(set(old) & set(new))
    regress = [
        (n, old[n], new[n])
        for n in common
        if new[n] > max(1.5 * old[n], old[n] + 0.5)
    ]
    improve = [
        (n, old[n], new[n])
        for n in common
        if old[n] > max(1.5 * new[n], new[n] + 0.5)
    ]
    print(f"compared {len(common)} common queries "
          f"(+{len(set(new) - set(old))} new, -{len(set(old) - set(new))} gone)")
    for title, rows in (("REGRESSIONS", regress), ("improvements", improve)):
        print(f"{title}: {len(rows)}")
        for n, a, b in sorted(rows, key=lambda r: r[1] - r[2]):
            print(f"  {n}: {a:.2f}s -> {b:.2f}s")
    if regress:
        sys.exit(2)


if __name__ == "__main__":
    main()
