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
    """Decorator registering a declared query (and optional DuckDB oracle).

    Every registered callable first applies :func:`tune_session` to the
    session it is handed: the driver calls ``queries()[k](spark, sf_dir)``
    on a PLAIN SparkSession (default ``spark.sql.shuffle.partitions=200``,
    host timezone), and without the tune each small-SF shuffle fans out to
    200 near-empty tasks and timestamp queries depend on the host TZ.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key {key!r}")

        def tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
            from spark_file_mover_spark.session import tune_session

            tune_session(spark)
            return fn(spark, sf_dir)

        tuned.__name__ = fn.__name__
        tuned.__doc__ = fn.__doc__
        tuned.__wrapped__ = fn
        QUERIES[key] = tuned
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


# Scoring priority for the current round (r5). The driver consumes
# ``queries()`` in dict insertion order under a wall-clock budget
# (~50 keys/round; the r02 run was cut at position 51), so ``load_all``
# rebuilds the registry dict in this order after all modules import:
#
#   1. The three keys whose r4 row was red or vacuous, now fixed
#      (oracle BIGINT casts; 1995-Q1 pruning window) — they need a fresh
#      driver row above all else.
#   2. Keys whose implementation or ORACLE changed this round
#      (minhash rework; stratified/url output-schema changes — their r4
#      rows describe the OLD output and must not stand).
#   3. The six NEW r5 keys (chunking, tfidf, quantize, lsh, orc,
#      temperature) — no driver row exists yet.
#   4. The 40 keys whose latest driver row is r3 (one round stale) —
#      scoring them keeps every key at <=1-round staleness across r4|r5.
#   5. Everything r4-fresh at the tail.
_PRIORITY_R5 = [
    # red/vacuous in r4, fixed this round
    "dedup-simhash",
    "sample-pack-sequences",
    "sink-sorted-pruning",
    # implementation/oracle changed this round — their r4 rows describe
    # the OLD output schema, so they need fresh rows ahead of the stale
    # block
    "dedup-near-minhash",
    "sample-hash-stratified",
    "text-url-normalize",
    # new keys this round (no driver row yet)
    "text-chunk-sliding",
    "text-tfidf-topk",
    "embed-quantize-int8",
    "sim-search-lsh",
    "scan-orc-roundtrip",
    "sample-temperature-weights",
    # r3-stale block (latest green row is r3)
    "project-select", "filter-pred", "filter-like-regexp",
    "join-semi-anti", "join-broadcast", "join-range-theta",
    "fn-string", "fn-date", "fn-math", "fn-array", "fn-map-json",
    "fn-case-when-cast",
    "dedup-exact", "sim-search-topk", "text-analysis",
    "multimodal-binary", "dedup-ngram-jaccard", "dedup-embedding-cosine",
    "text-token-count", "text-langid", "text-quality-score",
    "text-fingerprint", "multimodal-frame-sample", "text-pii-scrub",
    "text-ngram-freq", "sample-train-split",
    "move-partition-extract", "move-template", "move-collision-guard",
    "write-single-file",
    "udf-scalar-pandas", "udaf-grouped-pandas", "udtf-explode-like",
    "scan-parquet", "scan-table-manifest", "scan-csv-roundtrip",
    "sink-partitioned", "sink-overwrite", "sink-bucketed",
    "sink-merge-upsert",
]


def load_all() -> None:
    """Import every operator module so registrations run, then rebuild
    the registry dict in scoring-priority order (see ``_PRIORITY_R5``) —
    dict insertion order IS the driver's scoring order."""
    # Imports are at call time so `import spark_file_mover_spark` stays cheap.
    from spark_file_mover_spark.operators import (  # noqa: F401
        aggregates,
        windows,
        setops,
        streaming,
        joins,
    )
    from spark_file_mover_spark.llm import (  # noqa: F401
        dedup,
        similarity,
        sampling,
        decontam,
        features,
    )
    from spark_file_mover_spark.operators import relational  # noqa: F401
    from spark_file_mover_spark.functions import scalar  # noqa: F401
    from spark_file_mover_spark.llm import multimodal, text  # noqa: F401
    from spark_file_mover_spark import filemover_queries, udfs  # noqa: F401
    from spark_file_mover_spark.sources import sourcesink  # noqa: F401

    ordered = [k for k in _PRIORITY_R5 if k in QUERIES]
    ordered += [k for k in QUERIES if k not in _PRIORITY_R5]
    for mapping in (QUERIES, ORACLES):
        snapshot = {k: mapping[k] for k in ordered if k in mapping}
        mapping.clear()
        mapping.update(snapshot)
