"""Category F6 — set operations (SURVEY.md §2F).

UNION ALL is a zero-shuffle concatenation; DISTINCT/INTERSECT/EXCEPT
hash-shuffle on the full row — acceptable here because the inputs are
key projections, the pattern to keep at scale (never set-op wide rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_file_mover_spark.registry import query
from spark_file_mover_spark.sources.io import load_table

_SETOPS_ORACLE = """
WITH building AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
rich AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
)
SELECT 'union_distinct' AS op, c_custkey FROM (
  SELECT c_custkey FROM building UNION SELECT c_custkey FROM rich)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (
  SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
UNION ALL
SELECT 'except' AS op, c_custkey FROM (
  SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
"""


@query("set-union-intersect-except", oracle=_SETOPS_ORACLE)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: UNION [ALL|DISTINCT], INTERSECT, EXCEPT over customer key sets,
    tagged and concatenated into one result."""
    c = load_table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        building.union(rich).distinct().select(F.lit("union_distinct").alias("op"), "c_custkey")
        .unionAll(building.intersect(rich).select(F.lit("intersect").alias("op"), "c_custkey"))
        .unionAll(building.subtract(rich).select(F.lit("except").alias("op"), "c_custkey"))
    )
