"""Scan-leaf census over formatted physical plans — the re-execution
gate (r11).

A derived relation consumed k ways must NOT re-run its corpus scan k
times. Three rounds of by-eye catches (RFM r10, graph-reciprocity r10,
jaccard-neighbors r9) motivated making it mechanical: census every
registered plan's parquet-scan leaves and gate on scans per
(table, pushed-filters, read-schema) SIGNATURE.

Why signatures and not raw per-table counts:

* AQE formatted trees print the same node under both
  ``== Initial Plan ==`` and the final plan, and a cached
  ``InMemoryRelation``'s subtree reprints per reference — both with
  SHARED node ids (one physical node, one execution). Unique ids
  therefore count executions.
* A table scanned k times with DIFFERENT pushed filters / pruned
  columns is k disjoint-ish slices: a union of pushed-filter slices
  costs about one full scan of IO (the set-ops / funnel-stage shape).
* An IDENTICAL signature appearing twice is the legitimate
  two-consumer shape (self-join sides, doc-local text rebuild).
* An identical signature appearing >2 times means a derived relation
  re-executes its corpus pass per consumer — the defect class.

``tools/dump_plans.py --audit`` runs the gate over all registered
keys; ``tests/test_plans.py`` pins it for the families where the
catches happened.
"""

from __future__ import annotations

import re
from collections import Counter


def scan_census(plan: str) -> dict[str, int]:
    """Per-table parquet-scan LEAF counts of a formatted plan: unique
    tree node ids mapped to the scanned table via the node-id ->
    Location detail blocks."""
    tree = plan.split("\n\n")[0]
    leaf_ids = set(re.findall(r"Scan parquet[^\(\n]*\((\d+)\)", tree))
    id2loc: dict[str, str] = {}
    cur: str | None = None
    for line in plan.splitlines():
        m = re.match(r"\((\d+)\) Scan parquet", line.strip())
        if m:
            cur = m.group(1)
            continue
        if cur is not None:
            lm = re.search(r"Location: \S+ \[([^\],]*)", line)
            if lm:
                id2loc[cur] = lm.group(1).rstrip("/").rsplit("/", 1)[-1]
                cur = None
    return dict(Counter(id2loc.get(i, f"node-{i}") for i in leaf_ids))


def scan_signatures(plan: str) -> dict[tuple[str, str, str], int]:
    """Unique scan nodes grouped by (table, PushedFilters, ReadSchema)
    — the gate counts these; see the module docstring for why."""
    tree = plan.split("\n\n")[0]
    leaf_ids = set(re.findall(r"Scan parquet[^\(\n]*\((\d+)\)", tree))
    sig: dict[str, list[str]] = {}
    cur: str | None = None
    for line in plan.splitlines():
        m = re.match(r"\((\d+)\) Scan parquet", line.strip())
        if m:
            cur = m.group(1)
            sig[cur] = ["?", "", ""]
            continue
        if cur is not None:
            s = line.strip()
            lm = re.search(r"Location: \S+ \[([^\],]*)", s)
            if lm:
                sig[cur][0] = lm.group(1).rstrip("/").rsplit("/", 1)[-1]
            elif s.startswith("PushedFilters:"):
                sig[cur][1] = s
            elif s.startswith("ReadSchema:"):
                sig[cur][2] = s
                cur = None
    return dict(
        Counter(
            tuple(sig.get(i, ["node-" + i, "", ""]))
            for i in leaf_ids
        )
    )


def max_signature_count(plan: str) -> int:
    """The gated quantity: the largest identical-signature scan count."""
    return max(scan_signatures(plan).values(), default=0)


# Keys allowed >2 identical-signature scans of one table, each with the
# reason the repeat is NOT a re-execution defect. Everything else is
# gated at <=2 scans per signature by tools/dump_plans.py --audit AND
# the registry-wide parametrized test (tests/test_plans.py, r12 — the
# verdict order that made the r10 graph-reciprocity catch mechanical
# for every key). Lives here, not in tools/, so the package owns its
# own scale contract.
SCAN_BUDGET_EXEMPT: dict[str, str] = {
    # r16 (verdict item 1): the ~550-cell (x, y, c) relation feeds five
    # consumers LAZILY — the r15 eager localCheckpoint ran at build
    # time, which turned the @plan_cached hit into a result cache. The
    # static census sees one scan per consumer branch, but the
    # branches share the identical scan→partial-agg→Exchange subtree
    # and AQE stage reuse collapses them at runtime: the executed
    # final plan carries 2 FileScan nodes + 3 ReusedExchange
    # (plans/r16/agg-kendall-tau_after.txt), and the honest
    # per-invocation wall time HALVED vs the barrier form
    # (1.11 → 0.59 s at sf0.1). Not a re-execution defect — a
    # deliberate lazy-shared aggregate.
    "agg-kendall-tau": "five lazy consumers of one cell aggregate; "
    "AQE stage reuse dedupes at runtime (2 scans + 3 ReusedExchange "
    "in the executed plan), wall time halved vs the eager barrier",
}
