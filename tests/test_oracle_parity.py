"""Every registered query with an oracle must hash-match DuckDB at the
test scale factor — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from spark_file_mover_spark import registry
from tests.parity import compare

registry.load_all()

KEYS = sorted(registry.ORACLES)


@pytest.mark.parametrize("key", KEYS)
def test_oracle_parity(key, spark, sf_dir, duck):
    df = registry.QUERIES[key](spark, sf_dir)
    rel = duck.sql(registry.ORACLES[key])
    ok, msg = compare(df, rel)
    assert ok, f"{key}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))

# SURVEY.md §2 declared contract — every key must stay registered; a
# refactor that silently drops one should fail here, not in the driver.
SURVEY_KEYS = {
    # A
    "move-list-files", "move-partition-extract", "move-template",
    "move-collision-guard", "move-rename", "write-single-file",
    # B
    "scan-parquet", "scan-table-manifest", "scan-csv-roundtrip",
    "scan-jsonl-roundtrip", "scan-orc-roundtrip", "sink-sorted-pruning",
    "sink-partitioned", "sink-overwrite", "sink-bucketed", "sink-compact",
    "sink-merge-upsert", "repartition-n",
    # C
    "project-select", "filter-pred", "filter-like-regexp",
    "filter-scalar-subquery",
    # D
    "join-inner-equi", "join-left-right-full", "join-semi-anti",
    "join-broadcast", "join-range-theta", "join-multiway-star",
    "join-skew-salted", "join-range-binned", "join-asof",
    "join-lateral-topk",
    # E
    "agg-hash", "agg-distinct", "agg-approx-distinct",
    "agg-rollup-cube-gsets", "agg-having", "agg-approx-quantile",
    "agg-pivot", "agg-stats", "agg-unpivot", "agg-incremental-merge",
    # F
    "window-ranking", "window-analytic", "window-frame-agg",
    "topk-per-group", "sort-limit", "set-union-intersect-except",
    "etl-scd2", "etl-cdc-apply",
    # G
    "fn-string", "fn-date", "fn-math", "fn-array", "fn-map-json",
    "fn-case-when-cast", "fn-bitwise",
    # H
    "stream-tumbling", "stream-sliding", "stream-session",
    "stream-dedup-late", "stream-stateful-agg", "stream-join",
    "events-funnel", "rollup-hierarchical",
    # I
    "dedup-exact", "dedup-near-minhash", "dedup-simhash",
    "dedup-ngram-jaccard", "dedup-components", "dedup-embedding-cosine",
    "dedup-paragraph",
    "sim-search-topk",
    "sim-search-ivf", "sim-search-lsh",
    "text-analysis", "text-token-count", "text-langid",
    "text-quality-score", "text-fingerprint", "text-pii-scrub",
    "text-ngram-freq", "text-decontaminate", "text-repetition",
    "text-url-normalize", "text-chunk-sliding", "text-tfidf-topk",
    "text-perplexity-proxy", "text-dup-span",
    "embed-quantize-int8",
    "sample-train-split", "sample-hash-stratified",
    "sample-pack-sequences", "sample-temperature-weights",
    "multimodal-binary", "multimodal-frame-sample",
    "multimodal-image-dims", "multimodal-audio-meta",
    # J
    "udf-scalar-pandas", "udaf-grouped-pandas", "udtf-explode-like",
}


def test_survey_contract_fully_registered():
    missing = SURVEY_KEYS - set(registry.QUERIES)
    assert not missing, f"SURVEY.md §2 keys not registered: {sorted(missing)}"


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_query_runs(key, spark, sf_dir):
    """Rows-only keys (no oracle) must execute, return rows and a schema."""
    df = registry.QUERIES[key](spark, sf_dir)
    assert len(df.columns) >= 1, key
    assert df.count() > 0, key
