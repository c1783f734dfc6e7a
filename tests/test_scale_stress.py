"""Scale-stress: the heaviest dedup paths on a 10x corpus (50k docs)
where EVERY document has 10 exact copies — the adversarial shape for
hot-group handling (exact-edge windows, LSH bucket guards, covered-span
explosion). Gated behind SPARK_GRAFT_SCALE_TEST=1 so the default suite
stays fast:

    SPARK_GRAFT_SCALE_TEST=1 python -m pytest tests/test_scale_stress.py -q

What it checks beyond completion: exact-dup survivor counts, minhash
cluster consistency on 10-member duplicate groups, and that the cutting
pass removes every token of a fully-duplicated corpus.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from spark_file_mover_spark import registry

registry.load_all()

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="scale stress is opt-in (SPARK_GRAFT_SCALE_TEST=1)",
)

_COPIES = 10
_BASE_SF = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def big_sf(spark, tmp_path_factory):
    """documents.parquet at 10x sf0.1: each source doc re-emitted under
    _COPIES distinct doc_ids with IDENTICAL text."""
    out = str(tmp_path_factory.mktemp("scale") / "sf")
    d = spark.read.parquet(f"{_BASE_SF}/documents.parquet")
    n = d.count()
    big = (
        d.crossJoin(F.broadcast(spark.range(_COPIES).select(F.col("id").alias("copy"))))
        .select(
            (F.col("doc_id") + F.col("copy") * (n * 10)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    big.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_exact_dedup_collapses_every_copy_group(spark, big_sf):
    d = spark.read.parquet(f"{big_sf}/documents.parquet")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    n_groups = d.select(norm.alias("nt")).distinct().count()
    out = registry.QUERIES["dedup-exact"](spark, big_sf)
    # one survivor per normalized-text group; every group has at least
    # _COPIES members (the base corpus itself contains a few duplicate
    # texts, so some groups are larger)
    assert out.count() == n_groups
    assert d.count() >= n_groups * _COPIES


def test_minhash_clusters_unite_copy_groups(spark, big_sf):
    out = registry.QUERIES["dedup-near-minhash"](spark, big_sf)
    rows = out.collect()
    assert len(rows) == _COPIES * 5000
    # the audit columns are TRUE-expected invariants; at 10x they must
    # still all hold (exact-dup consistency is the hot-group case)
    for r in rows[:100]:
        assert r.cluster_le_doc_id and r.cluster_ref_valid
        assert r.exact_dup_consistent


def test_cut_pass_removes_everything_in_a_fully_duplicated_corpus(
    spark, big_sf
):
    out = registry.QUERIES["text-dup-cut"](spark, big_sf)
    stats = out.agg(
        F.count("*").alias("n"),
        F.sum((F.col("n_cut") == F.col("n_tok")).cast("int")).alias(
            "fully_cut"
        ),
        F.max(F.length("kept_text")).alias("max_kept"),
    ).collect()[0]
    # every gram occurs in >= _COPIES docs, so every token is covered
    # in every doc with >= K tokens; docs shorter than K keep all text
    d = spark.read.parquet(f"{big_sf}/documents.parquet")
    short = d.filter(
        F.size(F.split(F.lower(F.trim("text")), r"\s+")) < 5
    ).count()
    assert stats.n == _COPIES * 5000
    assert stats.fully_cut == stats.n - short
