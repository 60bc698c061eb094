"""Driver-verification ledger: which round last recorded a green row
for each registered query, and which queries have never had one.

Used when cutting each round's 50-entry ``registry.DRIVER_EXPORT``
(the driver records at most 50 ``queries()`` entries per round):
never-verified queries rotate in first; once coverage is complete the
oldest rows re-verify on the current tree.

Usage: python tools/rotation_ledger.py  (from the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__  # noqa: F401  — registers every query

    from mammoth_spark.registry import DRIVER_EXPORT, QUERIES

    last_green: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and row.get("schema_match") is not False:
                last_green[name] = max(last_green.get(name, 0), rnd)

    by_age = sorted(QUERIES, key=lambda n: (last_green.get(n, 0), n))
    never = [n for n in by_age if n not in last_green]
    print(f"{len(QUERIES)} registered, {len(last_green)} ever green, "
          f"{len(never)} never driver-verified")
    if never:
        print("\nnever verified (rotate in first):")
        for n in never:
            mark = "*" if n in DRIVER_EXPORT else " "
            print(f"  {mark} {n}")
    print("\noldest green rows (re-verify candidates):")
    for n in [n for n in by_age if n in last_green][:30]:
        mark = "*" if n in DRIVER_EXPORT else " "
        print(f"  {mark} r{last_green[n]:02d} {n}")
    print("\n(* = in the current DRIVER_EXPORT)")


if __name__ == "__main__":
    main()
