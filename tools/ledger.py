"""Shared driver-ledger helpers for the staleness/rotation tooling.

The single definition of "driver-green" used by both
``tools/stale_keys.py`` (the report) and ``tools/make_priority.py``
(the registry rewrite). A ledger row only counts as green when its
value hash matched the oracle — or, for keys *declared* rows-only
(registered without an ``oracle_sql()`` entry, so the driver records a
weaker rows+schema check by design), when the rows matched. A key that
hash-FAILS while matching row counts is stale evidence, not green: it
must sort to the FRONT of the rotation so the driver re-scores it, not
to the back (the r14-verdict "What's wrong" item 1 pathology).

``rows_only_keys()`` derives the declared set from the registry itself
(queries() minus oracle_sql()) so the tools can never drift from the
contract the driver actually checks.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def rows_only_keys() -> frozenset[str]:
    """Keys registered WITHOUT an oracle — rows-only by declaration."""
    sys.path.insert(0, str(REPO))
    from spark_file_mover_spark import registry

    registry.load_all()
    return frozenset(set(registry.QUERIES) - set(registry.ORACLES))


def is_green(row: dict, key: str, rows_only: frozenset[str]) -> bool:
    """True iff this CORRECTNESS ledger row is full driver-green.

    hash_match alone suffices; rows_match only counts for keys in the
    declared rows-only set (no oracle registered — the driver never
    computed a hash for them, so rows+schema IS the full check).
    """
    if row.get("hash_match"):
        return True
    return key in rows_only and bool(row.get("rows_match"))


def latest_green_rounds(
    registry_keys, rows_only: frozenset[str], repo: Path = REPO
) -> dict[str, int]:
    """Map key -> most recent round with a full driver-green row."""
    keyset = set(registry_keys)
    latest: dict[str, int] = {}
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        for key, row in json.loads(p.read_text()).items():
            if key not in keyset:
                continue  # renamed/retired keys don't pin staleness
            if is_green(row, key, rows_only):
                latest[key] = max(latest.get(key, 0), rnd)
    return latest
