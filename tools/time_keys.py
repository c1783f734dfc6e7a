"""Time every registered query key the way the driver's correctness run
does: build the Spark DataFrame, collect it, and (when an oracle exists)
run the DuckDB oracle SQL. Prints one line per key, slowest last, plus a
total — the feedback loop for keeping every registered key inside the driver's
scoring budget.

Usage: python tools/time_keys.py [--sf /root/testdata/sf0.01] [key ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*", help="subset of keys (default: all)")
    args = ap.parse_args()

    import duckdb

    from spark_file_mover_spark import registry
    from spark_file_mover_spark.session import get_spark
    from spark_file_mover_spark.sources.io import TABLES

    registry.load_all()
    spark = get_spark("time-keys")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{args.sf}/{name}.parquet'"
        )

    keys = args.keys or list(registry.QUERIES)
    # Warm up JVM/parquet footers (not timed).
    registry.QUERIES[keys[0]](spark, args.sf).collect()

    timings: list[tuple[str, float, float]] = []
    for key in keys:
        t0 = time.perf_counter()
        df = registry.QUERIES[key](spark, args.sf)
        df.collect()
        t_spark = time.perf_counter() - t0
        t_duck = 0.0
        if key in registry.ORACLES:
            t0 = time.perf_counter()
            con.sql(registry.ORACLES[key]).fetchall()
            t_duck = time.perf_counter() - t0
        timings.append((key, t_spark, t_duck))
        print(f"{key:32s} spark={t_spark:6.2f}s duck={t_duck:6.2f}s", flush=True)

    timings.sort(key=lambda t: t[1] + t[2])
    print("\n--- sorted by total (slowest last) ---")
    for key, ts, td in timings:
        print(f"{key:32s} total={ts + td:6.2f}s (spark={ts:.2f} duck={td:.2f})")
    total = sum(ts + td for _, ts, td in timings)
    print(f"\nTOTAL: {total:.1f}s over {len(timings)} keys")


if __name__ == "__main__":
    main()
