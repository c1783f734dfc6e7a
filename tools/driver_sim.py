"""Simulate the grading driver's t2 correctness run end-to-end: a plain
SparkSession (no engine session factory), every ``queries()`` key in
scoring order, DuckDB oracle compare where declared, rows-only otherwise.
Prints per-key status + timing and a final tally — run under a non-UTC TZ
to also catch host-timezone dependence:

    TZ=America/New_York python tools/driver_sim.py [--sf /root/testdata/sf0.01]
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
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from parity import compare
    from spark_file_mover_spark.sources.io import TABLES

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    t0 = time.perf_counter()
    assert len(e.entry(spark).collect()) > 0, "entry() smoke failed"
    print(f"entry() smoke OK ({time.perf_counter() - t0:.1f}s)")

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    t_start = time.perf_counter()
    n_pass = n_rows_only = 0
    failures: list[str] = []
    for key, fn in qs.items():
        t0 = time.perf_counter()
        try:
            if key in osql:
                ok, msg = compare(fn(spark, args.sf), con.sql(osql[key]))
                status = "pass" if ok else f"FAIL {msg}"
                if ok:
                    n_pass += 1
                else:
                    failures.append(key)
            else:
                n = len(fn(spark, args.sf).collect())
                ok = n > 0
                status = f"rows-only ({n})" if ok else "FAIL empty"
                if ok:
                    n_rows_only += 1
                else:
                    failures.append(key)
        except Exception as ex:  # noqa: BLE001 — driver records errors per key
            status = f"ERROR {type(ex).__name__}: {ex}"
            failures.append(key)
        print(f"{key:32s} {time.perf_counter() - t0:5.2f}s {status}", flush=True)

    total = time.perf_counter() - t_start
    print(
        f"\n{n_pass} hash-pass + {n_rows_only} rows-only of {len(qs)} keys "
        f"in {total:.1f}s; failures: {failures or 'none'}"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
