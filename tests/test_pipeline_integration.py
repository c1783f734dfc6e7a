"""End-to-end library composition: the curation pipeline a user of the
engine would actually run — exact dedup -> quality gate -> token
accounting -> PII scrub -> single-file export through the reference's
signature ``write_single_file`` — with cross-stage invariants. This
pins that the registry operators compose as a LIBRARY (shared doc_id
keys, one SparkSession, interoperable schemas), not just as isolated
driver keys.
"""

from __future__ import annotations

import csv
from pathlib import Path

from pyspark.sql import functions as F

from spark_file_mover_spark import registry
from spark_file_mover_spark.filemover import write_single_file

registry.load_all()


def _curated(spark, sf_dir):
    survivors = registry.QUERIES["dedup-exact"](spark, sf_dir).select(
        "doc_id"
    )
    quality = registry.QUERIES["text-quality-score"](spark, sf_dir).select(
        "doc_id", "passes_filter"
    )
    tokens = registry.QUERIES["text-token-count"](spark, sf_dir).select(
        "doc_id", "n_ws_tokens"
    )
    scrub = registry.QUERIES["text-pii-scrub"](spark, sf_dir).select(
        "doc_id", "scrubbed"
    )
    return (
        survivors.join(quality, "doc_id")
        .filter("passes_filter")
        .join(tokens, "doc_id")
        .join(scrub, "doc_id")
        .select("doc_id", "n_ws_tokens", "scrubbed")
    )


def test_curation_pipeline_composes(spark, sf_dir):
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_corpus = corpus.count()
    cur = _curated(spark, sf_dir)
    rows = cur.collect()

    # survivors-only, quality-gated: a strict subset of the corpus
    assert 0 < len(rows) <= n_corpus
    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert {r.doc_id for r in rows} <= corpus_ids
    # every curated doc carries a positive token count and scrubbed text
    for r in rows:
        assert r.n_ws_tokens >= 1
        assert r.scrubbed is not None

    # deterministic end to end: a second run yields the identical set
    again = {(r.doc_id, r.n_ws_tokens) for r in _curated(spark, sf_dir).collect()}
    assert again == {(r.doc_id, r.n_ws_tokens) for r in rows}


def test_curated_corpus_exports_through_the_filemover(spark, sf_dir, tmp_path):
    cur = _curated(spark, sf_dir).orderBy("doc_id")
    n = cur.count()
    out = str(tmp_path / "curated")
    write_single_file(
        cur.coalesce(1),
        out,
        template="$outputDirectory.csv",
        fmt="csv",
        options={"header": "true"},
    )
    target = Path(out + ".csv")
    assert target.is_file()
    with target.open() as fh:
        reader = csv.reader(fh)
        header = next(reader)
        assert header == ["doc_id", "n_ws_tokens", "scrubbed"]
        assert sum(1 for _ in reader) == n


def test_publish_gate_and_split_compose(spark, sf_dir):
    """The release workflow around the curated corpus: the DQ audit is
    the publish gate (all checks green on the clean corpus), and the
    leakage-safe group k-fold partitions exactly the curated survivor
    set when composed downstream of dedup — folds cover every survivor
    once, and every survivor's fold equals its dedup-cluster
    representative's fold (no split leakage through the composition)."""
    gate = registry.QUERIES["etl-dq-audit"](spark, sf_dir)
    assert all(r["passed"] == 1 for r in gate.collect())

    survivors = {
        r.doc_id
        for r in registry.QUERIES["dedup-exact"](spark, sf_dir)
        .select("doc_id")
        .collect()
    }
    folds = registry.QUERIES["sample-group-kfold"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # the fold audit covers the WHOLE corpus (splits precede dedup in
    # some pipelines, follow it in others — group-fold supports both
    # because duplicates share their representative's fold)...
    assert sum(r["n_docs"] for r in folds) == n_docs
    # ...and the cluster count equals the dedup survivor count: one
    # representative per cluster, i.e. the split is consistent with I1.
    assert sum(r["n_clusters"] for r in folds) == len(survivors)


def test_growth_report_composes(spark, sf_dir):
    """The r10 analytics keys compose into one consistent growth
    report over the same corpus: cumulative users from the
    new-vs-returning curve must END at the corpus' true distinct-user
    count, every RFM customer must be an orders customer scored 1-5 on
    all three axes, quota apportionment must hand back exactly its
    budget, and the sweep-line's final concurrency must return to zero
    (every opened interval closes)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    nvr = registry.QUERIES["agg-new-vs-returning"](spark, sf_dir).collect()
    assert nvr[-1]["cum_users"] == ev.select("user_id").distinct().count()
    assert all(
        r["n_active"] == r["n_new"] + r["n_returning"] for r in nvr
    )

    rfm = registry.QUERIES["window-rfm-segment"](spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert len(rfm) == n_cust
    for r in rfm:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["rfm_code"] == 100 * r["r_score"] + 10 * r["f_score"] + r["m_score"]

    quota = registry.QUERIES["sample-quota-allocate"](spark, sf_dir).collect()
    assert sum(r["quota"] for r in quota) == 10_000

    sweep = registry.QUERIES["window-concurrency-sweep"](spark, sf_dir).collect()
    assert sweep[-1]["concurrency"] == 0  # all intervals close
    assert max(r["concurrency"] for r in sweep) == sweep[0]["max_concurrency"]
