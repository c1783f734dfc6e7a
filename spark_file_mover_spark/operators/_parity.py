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

Why DECIMAL and not int64 cents (measured at sf0.1, warm):
decimal sums 0.63 s vs cents 0.37 s vs raw double 0.26 s for the Q1
aggregate — cents is ~1.7x faster. PURE int64 stays rejected:
revenue-style products (price_cents * (100 - disc_cents)) live in cents²
units, and at 100 TB row counts their per-group SUMS exceed int64
(~3e21 > 2^63). The r15 refinement (agg_hash) is the safe hybrid: the
per-ROW product runs in long — bounded by the DECIMAL(12,2) money
domain itself (pc ≤ 1e12 cents × 100 × 200 ≤ 2e16, 460x inside
int64 regardless of corpus size) — and only the group SUM promotes to
DECIMAL(38,0), which cannot overflow. One exact decimal division
rescales, and the final double cast performs the same single rounding
as the oracle's CAST(SUM(...) AS DOUBLE), so values stay bit-identical
while the per-row BigDecimal multiplies disappear (1.50 s → 1.15 s for
Q1 at sf0.1). Raw doubles remain reserved for comparisons where
last-ulp exactness is irrelevant.
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
