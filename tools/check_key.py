"""Single-key oracle check for fast iteration while adding operators:

    TZ=America/New_York python tools/check_key.py KEY [KEY...] [--sf DIR]

Same compare as tools/driver_sim.py, restricted to the named keys.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show", action="store_true", help="print spark head")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from parity import compare
    from spark_file_mover_spark.sources.io import TABLES

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    failures = []
    for key in args.keys:
        if key not in qs:
            print(f"{key}: NOT REGISTERED")
            failures.append(key)
            continue
        t0 = time.perf_counter()
        try:
            df = qs[key](spark, args.sf)
            if args.show:
                df.show(10, truncate=80)
            if key in osql:
                ok, msg = compare(df, con.sql(osql[key]))
                status = "pass" if ok else f"FAIL {msg}"
            else:
                n = len(df.collect())
                ok = n > 0
                status = f"rows-only ({n})"
            if not ok:
                failures.append(key)
        except Exception as ex:  # noqa: BLE001
            status = f"ERROR {type(ex).__name__}: {ex}"
            failures.append(key)
        print(f"{key:32s} {time.perf_counter() - t0:5.2f}s {status}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
