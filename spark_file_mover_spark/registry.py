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


# Scoring priority for the current round (r8). The driver consumes
# ``queries()`` in dict insertion order under a wall-clock budget
# (~50 keys/round; r6 and r7 each scored exactly 50), so ``load_all``
# rebuilds the registry dict in this order after all modules import:
#
#   1. The 31 keys that have NEVER been driver-scored (every one
#      landed behind r7's 50-key cut after the late-r7 additions).
#      LLM-family keys first, then B/E/H/D/F/G — the exact order the
#      r7 verdict asked for. All 31 are green in the full-inventory
#      oracle sim; this buys the hard driver row.
#   2. The 3 keys whose latest driver row is r5 (udf/udaf/udtf) —
#      two rounds stale, the oldest rows in the registry.
#   3. The full r6-scored block in tools/stale_keys.py order
#      (text-perplexity-proxy first: its r7 left-join hardening has
#      never been driver-scored). Positions 35-50 of the cut come
#      from this block's head; if the driver scores past 50, it
#      keeps consuming the stalest keys next rather than r7-fresh
#      ones.
#   4. Everything r7-fresh falls through to the tail (load_all
#      appends registry order for keys not listed here).
#
# Round 8 adds NO new keys (verdict #2: freeze the count at 134 so
# the rotation converges; any future addition goes at the HEAD).
#
# r9 playbook: once CORRECTNESS_r08.json lands, run
# `python tools/stale_keys.py --list` and paste its output as
# _PRIORITY_R9 — after r8 scores this head, the stalest block will be
# the 50 r7-scored keys (2 rounds old), then this round's tail. Any
# NEW key still goes at the HEAD, before the stale block.
_PRIORITY_R8 = [
    # -- 31 never-driver-scored keys (late-r7 additions) --
    "dedup-image-phash",
    "dedup-cross-bloom",
    "embed-kmeans-lloyd",
    "embed-pq-encode",
    "embed-ann-ivfpq",
    "embed-random-projection",
    "multimodal-image-exif",
    "text-bpe-pairs",
    "text-containment",
    "text-gopher-rules",
    "sample-reservoir-weighted",
    "sample-balanced-downsample",
    "graph-pagerank",
    "graph-label-propagation",
    "sink-zorder",
    "sink-snapshot-read",
    "scan-dpp-join",
    "scan-schema-evolution",
    "scan-csv-corrupt-recover",
    "agg-retention-cohort",
    "agg-sketch-hll-merge",
    "agg-sketch-cms",
    "agg-sketch-theta-setops",
    "agg-outlier-mad",
    "agg-mode-exact",
    "join-interval-overlap",
    "join-asof-tolerance",
    "window-distribution",
    "fn-variant-json",
    "stream-disorder-metrics",
    "stream-sink-exactly-once",
    # -- r5-stale J keys (oldest driver rows in the registry) --
    "udf-scalar-pandas",
    "udaf-grouped-pandas",
    "udtf-explode-like",
    # -- r6-scored block, stale_keys.py order --
    "text-perplexity-proxy",
    "agg-hash",
    "agg-distinct",
    "agg-approx-distinct",
    "agg-rollup-cube-gsets",
    "agg-having",
    "agg-approx-quantile",
    "agg-pivot",
    "agg-stats",
    "agg-unpivot",
    "agg-incremental-merge",
    "window-ranking",
    "window-analytic",
    "window-frame-agg",
    "topk-per-group",
    "sort-limit",
    "etl-scd2",
    "etl-cdc-apply",
    "set-union-intersect-except",
    "stream-tumbling",
    "stream-sliding",
    "stream-session",
    "stream-dedup-late",
    "stream-stateful-agg",
    "stream-join",
    "events-funnel",
    "rollup-hierarchical",
    "join-inner-equi",
    "join-left-right-full",
    "join-multiway-star",
    "join-skew-salted",
    "join-range-binned",
    "join-asof",
    "join-lateral-topk",
    "dedup-components",
    "dedup-paragraph",
    "text-dup-span",
    "sim-search-ivf",
    "text-decontaminate",
    "text-repetition",
    "filter-scalar-subquery",
    "fn-bitwise",
    "multimodal-image-dims",
    "multimodal-audio-meta",
    "move-list-files",
    "move-rename",
    "scan-jsonl-roundtrip",
    "sink-bucketed",
    "repartition-n",
    "sink-merge-upsert",
]


def load_all() -> None:
    """Import every operator module so registrations run, then rebuild
    the registry dict in scoring-priority order (see ``_PRIORITY_R8``) —
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

    ordered = [k for k in _PRIORITY_R8 if k in QUERIES]
    ordered += [k for k in QUERIES if k not in _PRIORITY_R8]
    for mapping in (QUERIES, ORACLES):
        snapshot = {k: mapping[k] for k in ordered if k in mapping}
        mapping.clear()
        mapping.update(snapshot)
