"""r11 — the ROUND-tie hazard is retired mechanically.

``ROUND(double, n)`` diverges between Spark (HALF_UP over
shortest-decimal) and DuckDB (multiply-based) on tie-adjacent values
(the ``agg-ols-trend`` r10 differential catch, SURVEY §5). Every
registered query therefore snaps derived doubles with
``numerics.snap`` (Spark) and the textual ``FLOOR((x)*1e{d}+0.5)/1e{d}``
(oracle SQL). These tests pin the migration so no new ``F.round`` /
``ROUND`` creeps back into the package, and prove the two snap forms
agree bit-for-bit across engines on adversarial values.
"""

from __future__ import annotations

import pathlib
import re

import duckdb
import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "spark_file_mover_spark"


def _package_sources():
    for p in sorted(PKG.rglob("*.py")):
        if p.name == "numerics.py":  # the docstring documents the hazard
            continue
        yield p, p.read_text()


def test_no_f_round_in_package():
    hits = [
        f"{p}:{i}"
        for p, src in _package_sources()
        for i, line in enumerate(src.splitlines(), 1)
        if "F.round(" in line
    ]
    assert not hits, hits


def test_no_sql_round_in_package():
    hits = [
        f"{p}:{i}"
        for p, src in _package_sources()
        for i, line in enumerate(src.splitlines(), 1)
        if re.search(r"\bROUND\(", line)
    ]
    assert not hits, hits


# Tie-adjacent doubles: x where x*1e9 lands exactly on .5 or within one
# ulp of it — the class where Spark's HALF_UP-over-shortest-decimal and
# DuckDB's multiply-based ROUND actually disagree.
_ADVERSARIAL = [
    0.0000000005,
    0.0000000015,
    0.1234567895,
    0.9999999995,
    -0.0000000005,
    -0.1234567895,
    2.5e-10 * 2,
    0.3333333335,
    1.0000000005,
    123.4567890115,
]


@pytest.mark.parametrize("x", _ADVERSARIAL)
def test_snap_bitwise_identical_spark_duckdb(spark, x):
    from spark_file_mover_spark.numerics import snap

    import pyspark.sql.functions as F

    got_spark = (
        spark.range(1)
        .select(snap(F.lit(x), 9).alias("v"))
        .collect()[0]["v"]
    )
    got_duck = duckdb.sql(
        f"SELECT FLOOR(({x!r}) * 1e9 + 0.5) / 1e9 AS v"
    ).fetchone()[0]
    assert got_spark == got_duck, (x, got_spark, got_duck)


def test_snap_accepts_string_column(spark):
    from spark_file_mover_spark.numerics import snap

    row = (
        spark.range(1)
        .selectExpr("0.1234567891234 AS raw")
        .select(snap("raw", 6).alias("v"))
        .collect()[0]
    )
    assert row["v"] == 0.123457


def test_snap_propagates_null(spark):
    from spark_file_mover_spark.numerics import snap

    import pyspark.sql.functions as F

    row = (
        spark.range(1)
        .select(snap(F.lit(None).cast("double"), 9).alias("v"))
        .collect()[0]
    )
    assert row["v"] is None
