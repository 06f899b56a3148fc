"""Round-over-round CORRECTNESS diff: makes verification-window rotation
mechanically checkable (which queries entered/left the driver's 50-query
window, which verdicts flipped) and reports per-query staleness — the
newest round each registry query has a driver row in.

Usage:
  python tools/compare_correctness.py OLD.json NEW.json   # window diff
  python tools/compare_correctness.py --staleness         # all rounds
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def verdict(rec: dict) -> str:
    if rec.get("err"):
        return "error"
    checks = [rec.get("rows_match"), rec.get("schema_match"), rec.get("hash_match")]
    if all(c is True for c in checks):
        return "pass"
    if any(c is False for c in checks):
        return "fail"
    return "rows-only"


def load(path: str) -> dict[str, str]:
    return {k: verdict(v) for k, v in json.load(open(path)).items()}


def diff(old_path: str, new_path: str) -> int:
    old, new = load(old_path), load(new_path)
    entered = sorted(set(new) - set(old))
    left = sorted(set(old) - set(new))
    flipped = sorted(
        (n, old[n], new[n]) for n in set(old) & set(new) if old[n] != new[n]
    )
    bad = sorted(n for n, v in new.items() if v != "pass")
    print(f"window: {len(old)} -> {len(new)} queries "
          f"(+{len(entered)} entered, -{len(left)} left)")
    if entered:
        print("entered:", ", ".join(entered))
    if left:
        print("left:", ", ".join(left))
    print(f"verdict flips: {len(flipped)}")
    for n, a, b in flipped:
        print(f"  {n}: {a} -> {b}")
    print(f"non-pass in NEW: {len(bad)}")
    for n in bad:
        print(f"  {n}: {new[n]}")
    return 2 if bad or any(b != "pass" for _, _, b in flipped) else 0


def staleness() -> int:
    latest: dict[str, int] = {}
    verdicts: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r0*(\d+)", os.path.basename(path))
        rnd = int(m.group(1))
        for name, v in load(path).items():
            latest[name] = rnd
            verdicts[name] = v
    sys.path.insert(0, REPO)
    from etl_entregas_pyspark_spark import queries as q

    rounds = sorted(set(latest.values()), reverse=True)
    by_round: dict[int, list[str]] = {}
    never = []
    for name in q.REGISTRY:
        if name in latest:
            by_round.setdefault(latest[name], []).append(name)
        else:
            never.append(name)
    print(f"{len(q.REGISTRY)} registered; "
          f"{len(latest)} with >=1 driver row; {len(never)} never checked")
    if never:
        print("never:", ", ".join(sorted(never)))
    for rnd in rounds:
        names = sorted(by_round.get(rnd, []))
        bad = [n for n in names if verdicts[n] != "pass"]
        print(f"newest row = r{rnd}: {len(names)} queries"
              + (f" ({len(bad)} NON-PASS: {', '.join(bad)})" if bad else ""))
    return 0


def main() -> int:
    if len(sys.argv) == 2 and sys.argv[1] == "--staleness":
        return staleness()
    if len(sys.argv) == 3:
        return diff(sys.argv[1], sys.argv[2])
    sys.exit(__doc__)


if __name__ == "__main__":
    raise SystemExit(main())
