"""Audit: which @plan_cached keys run Spark jobs at BUILD time?

A key wrapped in @plan_cached must be pure lazy construction: on a
cache hit the stored plan re-executes from the parquet inputs, so
anything the BUILD executes eagerly (localCheckpoint barriers,
collects, persist().count() outside a declared artifact cache) is
computed once and silently served from the materialized intermediate
afterwards — result caching, not plan caching (r15 verdict item 1).

Method: for every registered key that carries the plan-cache wrapper,
bypass the plan cache (so the real build runs) and count the Spark
jobs submitted DURING CONSTRUCTION (no action). The first build warms
the declared per-(SparkContext, corpus) ingest artifacts (tf relation,
minhash bands, asset corpora, …) whose build jobs are blessed paid-
once ingest; the SECOND build's job count is the per-invocation eager
work. Keys with second-build jobs > 0 may not be @plan_cached.

Usage: python tools/audit_build_jobs.py [sf_dir]
Prints one line per wrapped key: key, first-build jobs, second-build
jobs, and OFFENDER for second-build > 0.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from spark_file_mover_spark import registry
    from spark_file_mover_spark.session import get_spark
    from spark_file_mover_spark.sources import io as sio

    registry.load_all()
    spark = get_spark("audit-build-jobs")
    sc = spark.sparkContext

    # bypass the plan cache so the build actually runs
    real_cached_plan = sio.cached_plan
    sio.cached_plan = lambda spark, sf_dir, name, make: make()

    wrapped = []
    for key, fn in registry.QUERIES.items():
        inner = getattr(fn, "__wrapped__", None)
        # plan_cached wrappers carry functools.wraps' __wrapped__
        if inner is not None and hasattr(inner, "__wrapped__"):
            wrapped.append(key)
    print(f"# {len(wrapped)} plan_cached keys", file=sys.stderr)

    tracker = sc.statusTracker()
    offenders = []
    for key in sorted(wrapped):
        counts = []
        for rep in range(2):
            group = f"audit-{key}-{rep}"
            sc.setJobGroup(group, key)
            try:
                registry.QUERIES[key](spark, sf_dir)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"{key}\tERROR\t{e}")
                counts = None
                break
            finally:
                sc.setJobGroup(None, None)
            counts.append(len(tracker.getJobIdsForGroup(group)))
        if counts is None:
            continue
        flag = "OFFENDER" if counts[1] > 0 else "ok"
        print(f"{key}\t{counts[0]}\t{counts[1]}\t{flag}")
        if counts[1] > 0:
            offenders.append(key)
    sio.cached_plan = real_cached_plan
    print(f"# offenders ({len(offenders)}): {offenders}", file=sys.stderr)


if __name__ == "__main__":
    main()
