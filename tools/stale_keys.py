"""Staleness report for the driver's ~50-key/round scoring rotation.

Reads every CORRECTNESS_r*.json in the repo root, computes each
registered key's most recent driver-green round, and prints the keys in
rotation-priority order (never-scored first, then oldest evidence) —
the ordering `_PRIORITY_R{N+1}` should lead with so no key's driver
evidence goes stale behind the cut (the r4-r6 position-51 pathology).

    python tools/stale_keys.py            # report
    python tools/stale_keys.py --list     # bare key list, paste-ready
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.ledger import latest_green_rounds, rows_only_keys


def main() -> None:
    from spark_file_mover_spark import registry

    registry.load_all()
    # full driver-green only (hash, or declared-rows-only rows): a key
    # that hash-fails while matching rows must rotate to the FRONT
    latest = latest_green_rounds(registry.QUERIES, rows_only_keys())

    # rotation order: never-scored first (registry order preserved so
    # same-age keys keep their category grouping), then oldest round
    keys = list(registry.QUERIES)
    ordered = sorted(keys, key=lambda k: (latest.get(k, -1), keys.index(k)))

    if "--list" in sys.argv:
        for k in ordered:
            print(f'    "{k}",')
        return

    n_never = sum(1 for k in keys if k not in latest)
    print(f"{len(keys)} registered keys; {n_never} with no driver row yet\n")
    print(f"{'key':40s} {'last driver-green':>18s}")
    for k in ordered:
        tag = f"r{latest[k]}" if k in latest else "NEVER"
        print(f"{k:40s} {tag:>18s}")


if __name__ == "__main__":
    main()
