"""Driver-gate rotation bookkeeping (r6).

The external correctness gate verifies the first 50 queries() entries per
round, so the registry order rotates (never-yet-gated entries first). This
tool reads every CORRECTNESS_r*.json in the repo root, reports which
entries the driver has gated so far, verifies every gated row was green,
and prints the entries the NEXT round's rotation should put first.

Usage: python tools/gate_coverage.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    gated: dict[str, list[str]] = {}
    latest: dict[str, tuple[str, bool, str]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = os.path.basename(path)
        data = json.load(open(path))
        for name, row in data.items():
            gated.setdefault(name, []).append(rnd)
            if not isinstance(row, dict):
                continue
            ok = bool(row.get("rows_match") and row.get("schema_match")
                      and row.get("hash_match") and not row.get("err"))
            latest[name] = (rnd, ok, str(row.get("err") or "mismatch"))
    # only the LATEST gated round matters (early rounds predate some oracles)
    red = [(rnd, n, err) for n, (rnd, ok, err) in latest.items() if not ok]
    never = [n for n in names if n not in gated]
    stale = [n for n in names if n in gated]
    print(f"queries() entries: {len(names)}")
    print(f"driver-gated so far: {len(stale)}  never gated: {len(never)}")
    if never:
        print("\nnext rotation should lead with:")
        for n in never:
            print(f"  {n}")
    if red:
        print("\nNON-GREEN gated rows:")
        for rnd, name, err in red:
            print(f"  {rnd}: {name}: {err}")
    # current-order preview: what the next gate run will cover
    head = names[:50]
    covered_next = set(head) | set(gated)
    missing_after = [n for n in names if n not in covered_next]
    print(f"\nfirst-50 of current order gates {len(set(head) - set(gated))} "
          f"new entries; still uncovered after next run: {len(missing_after)}")
    for n in missing_after:
        print(f"  {n}")
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
