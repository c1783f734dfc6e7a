"""Query registry: the declared operator contract of SURVEY.md §2.

Every implemented operator registers itself here with a ``queries()``
callable ``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a
DuckDB oracle SQL string over the pre-registered views
``region nation customer supplier part orders lineitem events documents
embeddings``. The driver hash-compares Spark vs DuckDB results at sf0.01,
so column names/aliases MUST match between the two.

Numeric-parity rules used across all registered queries:

* Money columns in the testdata are exact 2-decimal doubles (verified in
  FIXTURES.md terms); all money arithmetic is done in DECIMAL so sums are
  exact and engine-identical, then the final value is cast to DOUBLE.
* Derived floating values (averages, similarities) are rounded to a fixed
  scale in BOTH engines before output.
* Timestamps are never emitted raw: they are formatted to strings or
  decomposed to date parts identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a declared query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    # Imports are at call time so `import spark_file_mover_spark` stays cheap.
    from spark_file_mover_spark.operators import (  # noqa: F401
        relational,
        joins,
        aggregates,
        windows,
        setops,
        streaming,
    )
    from spark_file_mover_spark.functions import scalar  # noqa: F401
    from spark_file_mover_spark.llm import (  # noqa: F401
        dedup,
        multimodal,
        sampling,
        similarity,
        text,
    )
    from spark_file_mover_spark import udfs, filemover_queries  # noqa: F401
    from spark_file_mover_spark.sources import sourcesink  # noqa: F401
