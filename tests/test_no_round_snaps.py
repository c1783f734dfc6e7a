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


# --- magnitude-hazard pins (r12, ADVICE item) -----------------------------
#
# Spark's floor(double) -> BIGINT saturates at Long.MaxValue when
# |x*10^d| >= 2^63; DuckDB's FLOOR stays double. snap() is therefore
# only engine-portable inside |x| < 2^63/10^d. These two tests pin BOTH
# sides of that boundary: agreement just inside it, and the KNOWN
# saturation divergence outside it (if Spark's semantics ever change —
# e.g. ANSI starts raising — the second test trips loudly instead of a
# driver hash silently mismatching).

_SATURATED = 9223372036.854776  # Long.MaxValue / 1e9


# (Values here must parse identically as literals in both engines —
# DuckDB types long decimal literals as DECIMAL before casting, which
# perturbs the 17th significant digit; registered queries never ship
# doubles through literals, so exponent-form values pin the column
# path faithfully.)
@pytest.mark.parametrize("x", [1.8e9, -1.8e9, 9.2e9, 1234567.890625])
def test_snap_agrees_inside_2pow63_envelope(spark, x):
    from spark_file_mover_spark.numerics import snap

    import pyspark.sql.functions as F

    got_spark = (
        spark.range(1).select(snap(F.lit(x), 9).alias("v")).collect()[0]["v"]
    )
    got_duck = duckdb.sql(
        f"SELECT FLOOR(({x!r}) * 1e9 + 0.5) / 1e9 AS v"
    ).fetchone()[0]
    assert got_spark == got_duck, (x, got_spark, got_duck)


@pytest.mark.parametrize("x", [9.3e9, 1.0e12, 9007199254740.0])
def test_snap_saturates_beyond_2pow63_documented_divergence(spark, x):
    from spark_file_mover_spark.numerics import snap

    import pyspark.sql.functions as F

    got_spark = (
        spark.range(1).select(snap(F.lit(x), 9).alias("v")).collect()[0]["v"]
    )
    got_duck = duckdb.sql(
        f"SELECT FLOOR(({x!r}) * 1e9 + 0.5) / 1e9 AS v"
    ).fetchone()[0]
    # Spark saturates; DuckDB does not. This is the DOCUMENTED hazard —
    # registered metrics must stay inside the envelope (numerics.py).
    assert got_spark == _SATURATED, (x, got_spark)
    assert got_duck != _SATURATED, (x, got_duck)


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
