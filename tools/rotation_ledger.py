"""Driver-verification ledger CLI over mammoth_spark.rotation.

Prints which round last recorded a green driver row for each registered
query and which have never had one; with ``--cut`` prints the contract
for ``rotation.CONTRACT_ROUND`` as a ready-to-paste Python list (the
policy itself — never-verified first, refactored flagships, then
oldest-row-first — lives in ``mammoth_spark/rotation.py`` and is
enforced by tests/test_oracle_parity.py::test_contract_is_ledger_cut).

Usage (from the repo root):
    python tools/rotation_ledger.py          # ledger report
    python tools/rotation_ledger.py --cut    # print the contract cut
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__  # noqa: F401  — registers every query

    from mammoth_spark.registry import DRIVER_EXPORT, QUERIES
    from mammoth_spark.rotation import CONTRACT_ROUND, cut_contract, last_green_rounds

    if "--cut" in sys.argv:
        for n in cut_contract(sorted(QUERIES), REPO):
            print(f'    "{n}",')
        return

    last_green = last_green_rounds(REPO)
    by_age = sorted(QUERIES, key=lambda n: (last_green.get(n, 0), n))
    never = [n for n in by_age if n not in last_green]
    print(f"{len(QUERIES)} registered, {len(last_green)} ever green, "
          f"{len(never)} never driver-verified (contract round {CONTRACT_ROUND})")
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
