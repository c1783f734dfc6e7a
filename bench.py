"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
sys.path.insert(0, REPO)

from spark_file_mover_spark import registry  # noqa: E402
from spark_file_mover_spark.session import get_spark  # noqa: E402

# Headline set: one representative per SURVEY.md §2 category that exists.
HEADLINE = [
    "agg-hash",
    "join-multiway-star",
    "join-inner-equi",
    "window-ranking",
    "topk-per-group",
    "stream-tumbling",
    "dedup-exact",
    "dedup-near-minhash",
    "sim-search-topk",
    "text-analysis",
    "sort-limit",
    "fn-string",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    registry.load_all()
    spark = get_spark("spark_file_mover_spark-bench")

    keys = [k for k in HEADLINE if k in registry.QUERIES]
    # Warm the JVM + parquet footers once (excluded from timings).
    registry.QUERIES[keys[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for key in keys:
        t0 = time.perf_counter()
        df = registry.QUERIES[key](spark, sf_dir)
        n = df.count()  # full materialization of the result
        timings[key] = round(time.perf_counter() - t0, 4)
        print(f"# {key}: {timings[key]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
