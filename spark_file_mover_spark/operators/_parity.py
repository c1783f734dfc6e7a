"""Helpers for exact numeric parity between Spark and the DuckDB oracle.

The testdata money columns (l_quantity, l_extendedprice, l_discount,
l_tax, c_acctbal, p_retailprice, events.value, s_acctbal) are exact
2-decimal doubles. Casting them to DECIMAL(12,2) before arithmetic makes
sums/products exact integers-in-disguise, so both engines produce
bit-identical results regardless of aggregation order; the final cast to
DOUBLE is then deterministic and identical too.

``o_totalprice`` is a full-precision double; round it to 2 decimals going
through DECIMAL only when exactness of the *input* doesn't matter (e.g.
comparisons use the raw double; aggregate outputs get dround()).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"


def dec(col: str | Column) -> Column:
    """Exact decimal view of a 2-decimal money column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: str | Column, alias: str) -> Column:
    """Exact decimal sum surfaced as double (matches CAST(SUM(CAST(x AS
    DECIMAL(12,2))) AS DOUBLE) in DuckDB)."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Average as one double division of exact decimal sum by count —
    engine-identical. Matches CAST(SUM(dec)/COUNT(x) AS DOUBLE) ... but we
    emit CAST(SUM AS DOUBLE)/COUNT so both engines do the same single fp op.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)
