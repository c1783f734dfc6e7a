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


# Scoring priority for the current round (r7). The driver consumes
# ``queries()`` in dict insertion order under a wall-clock budget
# (~50 keys/round; the r02 run was cut at position 51 and r6 scored
# exactly 50), so ``load_all`` rebuilds the registry dict in this order
# after all modules import:
#
#   1. sink-compact — its last driver row is r4 (2 rounds stale): it
#      sat at cut position 51 in r6, the exact pathology that kept
#      sink-bucketed/sink-merge-upsert stale through r4/r5.
#   2. The two keys whose implementations CHANGED in r6 but were cut
#      at positions 52-53, so the driver has never scored the current
#      code (dedup-near-minhash — changed again in r7's perf rework —
#      and text-chunk-sliding).
#   3. The two NEW r7 keys (multimodal-video-meta, text-dup-cut) — no
#      driver row exists at all.
#   4. The 48 keys whose latest driver row is r5 — scoring them keeps
#      every key at <=1-round staleness; a ~50-key cut drops only this
#      block's tail.
#   5. text-perplexity-proxy LAST in the head: its r7 change (left
#      join + coalesce) is value-identical by construction and it is
#      r6-fresh, so it is the least-harm key to lose to the cut.
#   6. Everything r6-fresh falls through to the tail (load_all appends
#      registry order for keys not listed here).
_PRIORITY_R7 = [
    # 2-round-stale key FIRST (cut at position 51 in r6)
    "sink-compact",
    # changed in r6 (and r7), never driver-scored since
    "dedup-near-minhash",
    "text-chunk-sliding",
    # new r7 keys: no driver row at all
    "multimodal-video-meta",
    "text-dup-cut",
    # r5-stale block (latest green row is r5)
    "move-partition-extract", "move-template", "move-collision-guard",
    "write-single-file",
    "scan-parquet", "scan-table-manifest", "scan-csv-roundtrip",
    "sink-sorted-pruning", "scan-orc-roundtrip", "sink-partitioned",
    "sink-overwrite",
    "project-select", "filter-pred", "filter-like-regexp",
    "join-semi-anti", "join-broadcast", "join-range-theta",
    "fn-string", "fn-date", "fn-math", "fn-array", "fn-map-json",
    "fn-case-when-cast",
    "dedup-exact", "sim-search-topk", "text-analysis",
    "multimodal-binary", "dedup-simhash", "dedup-ngram-jaccard",
    "dedup-embedding-cosine", "text-token-count", "text-langid",
    "text-quality-score", "text-fingerprint", "multimodal-frame-sample",
    "text-pii-scrub", "text-ngram-freq", "sample-train-split",
    "sample-hash-stratified", "text-url-normalize",
    "sample-pack-sequences", "text-tfidf-topk", "embed-quantize-int8",
    "sim-search-lsh", "sample-temperature-weights",
    "udf-scalar-pandas", "udaf-grouped-pandas", "udtf-explode-like",
    # late-r7 extras: new keys placed AFTER the full r5-stale block so
    # scoring them never costs a stale key its row (they have local sim
    # + pytest evidence; a driver row follows in r8 at the latest)
    "dedup-image-phash",
    "text-gopher-rules",
    "sink-zorder",
    "agg-retention-cohort",
    "dedup-cross-bloom",
    "agg-sketch-hll-merge",
    "scan-schema-evolution",
    "agg-outlier-mad",
    "join-interval-overlap",
    "embed-random-projection",
    "graph-pagerank",
    "embed-kmeans-lloyd",
    "agg-sketch-cms",
    "text-bpe-pairs",
    "sample-reservoir-weighted",
    "embed-pq-encode",
    "graph-label-propagation",
    "multimodal-image-exif",
    "sink-snapshot-read",
    "scan-dpp-join",
    "embed-ann-ivfpq",
    "stream-disorder-metrics",
    "agg-sketch-theta-setops",
    "scan-csv-corrupt-recover",
    "window-distribution",
    "sample-balanced-downsample",
    "join-asof-tolerance",
    "fn-variant-json",
    "text-containment",
    "agg-mode-exact",
    "stream-sink-exactly-once",
    # changed r7 (value-identical left-join hardening), r6-fresh —
    # deliberately the last head slot
    "text-perplexity-proxy",
]


def load_all() -> None:
    """Import every operator module so registrations run, then rebuild
    the registry dict in scoring-priority order (see ``_PRIORITY_R7``) —
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
    from spark_file_mover_spark.llm import clustering  # noqa: F401
    from spark_file_mover_spark.operators import graph, relational  # noqa: F401
    from spark_file_mover_spark.functions import scalar  # noqa: F401
    from spark_file_mover_spark.llm import multimodal, text  # noqa: F401
    from spark_file_mover_spark import filemover_queries, udfs  # noqa: F401
    from spark_file_mover_spark.sources import sourcesink  # noqa: F401

    ordered = [k for k in _PRIORITY_R7 if k in QUERIES]
    ordered += [k for k in QUERIES if k not in _PRIORITY_R7]
    for mapping in (QUERIES, ORACLES):
        snapshot = {k: mapping[k] for k in ordered if k in mapping}
        mapping.clear()
        mapping.update(snapshot)
