"""Behavior pins for the late-r9 batch: the DQ audit must actually
DETECT violations (the sf fixture is clean, so every driver row shows
passed=1 — these tests feed it a deliberately dirty corpus), and the
k-core peel must match an independent pure-Python peel on the same
graph."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from spark_file_mover_spark import registry
from spark_file_mover_spark.sources.io import TABLES

registry.load_all()

SRC_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirty_sf(spark, tmp_path_factory):
    """A corpus copy with one violation per DQ check planted in
    orders/lineitem (remaining tables copied verbatim so load_table's
    schema expectations hold)."""
    out = tmp_path_factory.mktemp("dirty-sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SRC_SF}/{t}.parquet")
        if t == "orders":
            first = df.limit(1)
            dirty = (
                # duplicate orderkey + NULL custkey + future date
                first.select(
                    "o_orderkey",
                    F.lit(None).cast("long").alias("o_custkey"),
                    F.lit("X").alias("o_orderstatus"),  # bad domain
                    F.lit(-5.0).alias("o_totalprice"),  # bad range
                    F.lit(datetime.datetime(2030, 1, 1)).alias(
                        "o_orderdate"
                    ),
                    "o_orderpriority",
                )
            )
            df = df.unionByName(dirty)
        if t == "lineitem":
            first = df.limit(1)
            dirty = first.select(
                F.lit(999999999).alias("l_orderkey"),  # orphan FK
                "l_partkey",
                "l_suppkey",
                "l_linenumber",
                F.lit(999.0).alias("l_quantity"),  # out of [1,50]
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            )
            df = df.unionByName(dirty)
        df.coalesce(1).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


def test_dq_audit_detects_planted_violations(spark, dirty_sf):
    rows = {
        r["check_name"]: r
        for r in registry.QUERIES["etl-dq-audit"](spark, dirty_sf).collect()
    }
    assert rows["completeness_custkey"]["passed"] == 0
    assert rows["completeness_custkey"]["metric"] > 0
    assert rows["uniqueness_orderkey"]["passed"] == 0
    assert rows["min_totalprice_positive"]["passed"] == 0
    assert rows["min_totalprice_positive"]["metric"] == -5.0
    assert rows["domain_orderstatus"]["passed"] == 0
    assert rows["domain_orderstatus"]["metric"] == 1.0
    assert rows["freshness_no_future_dates"]["passed"] == 0
    assert rows["range_quantity_1_50"]["passed"] == 0
    assert rows["ri_lineitem_orders"]["passed"] == 0
    assert rows["ri_lineitem_orders"]["metric"] > 0


def test_dq_audit_clean_fixture_all_pass(spark, sf_dir):
    rows = registry.QUERIES["etl-dq-audit"](spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r["passed"] == 1 for r in rows)


def test_kcore_matches_pure_python_peel(spark, sf_dir):
    """Independent derivation: rebuild the K3 sparse adjacency in plain
    Python from the parquet bytes and run the same bounded peel."""
    import collections

    import duckdb

    from spark_file_mover_spark.operators.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _LPA_EDGE_MOD,
        _LPA_ENTITY_BASE,
    )

    con = duckdb.connect()
    fwd = con.execute(
        f"""SELECT DISTINCT user_id,
                   {_LPA_ENTITY_BASE} + CAST(props->>'k' AS BIGINT)
            FROM '{sf_dir}/events.parquet'
            WHERE event_id % {_LPA_EDGE_MOD} = 0"""
    ).fetchall()
    adj = collections.defaultdict(set)
    for a, b in fwd:
        adj[a].add(b)
        adj[b].add(a)
    surviving = set(adj)
    removed_round: dict[int, int] = {}
    for rnd in range(1, _KCORE_ROUNDS + 1):
        degs = {
            n: sum(1 for m in adj[n] if m in surviving) for n in surviving
        }
        out = {n for n, d in degs.items() if d < _KCORE_K}
        for n in out:
            removed_round[n] = rnd
        surviving -= out

    rows = registry.QUERIES["graph-kcore"](spark, sf_dir).collect()
    assert {r["node_id"] for r in rows} == set(adj)
    for r in rows:
        n = r["node_id"]
        if n in removed_round:
            assert r["removed_round"] == removed_round[n], n
            assert r["deg_final"] is None
        else:
            assert r["removed_round"] is None
            want = sum(1 for m in adj[n] if m in surviving)
            assert r["deg_final"] == want, (n, r["deg_final"], want)


def test_group_kfold_no_cluster_straddles_folds(spark, sf_dir):
    """The leakage guarantee itself: recompute per-document folds and
    assert every exact-dup cluster lands in exactly one fold, and that
    fold counts cover all docs."""
    from pyspark.sql import Window as W

    from spark_file_mover_spark.llm._textnorm import md5_prefix60
    from spark_file_mover_spark.llm.dedup import _norm_hash
    from spark_file_mover_spark.llm.sampling import _KFOLD_K
    from spark_file_mover_spark.sources.io import load_table

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("nh")
    f = (
        d.select("doc_id", _norm_hash().alias("nh"))
        .withColumn("rep", F.min("doc_id").over(w))
        .withColumn(
            "fold",
            F.pmod(md5_prefix60(F.col("rep").cast("string")), F.lit(_KFOLD_K)),
        )
    )
    per_cluster = f.groupBy("rep").agg(
        F.countDistinct("fold").alias("nf")
    )
    assert per_cluster.filter(F.col("nf") > 1).count() == 0
    total = d.count()
    out = registry.QUERIES["sample-group-kfold"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) == total
    assert {r["fold"] for r in out} <= set(range(_KFOLD_K))


def test_ols_snap_tie_regression(spark, tmp_path):
    """The hypothesis-found cross-engine ROUND divergence, pinned
    deterministically: n=8 clicks make the intercept an exact eighth
    whose decimal expansion lands on the 9-dp tie (…5465), and Spark's
    HALF_UP-over-shortest-decimal round disagreed with DuckDB's
    multiply-based round (…547 vs …546). agg-ols-trend now snaps via
    the textual floor(x*1e9 + 0.5)/1e9 sequence in BOTH engines, which
    cannot diverge whatever each library's tie convention is."""
    from tests.test_r9_properties import _run_both, _write_events

    rows = [
        (0, 0, 0, "click", 1),
        (0, 0, 0, "view", 1),
        (0, 0, 0, "view", 1),
        (0, 0, 0, "view", 1),
        (0, 0, 0, "click", 1),
        (0, 0, 0, "click", 131),
        (0, 0, 0, "click", 8937),
        (0, 6, 0, "click", 1),
        (0, 0, 0, "click", 16),
        (0, 0, 0, "click", 93),
        (0, 1, 0, "click", 1),
    ]
    _write_events(tmp_path, rows)
    ok, msg = _run_both("agg-ols-trend", spark, tmp_path, ["events"])
    assert ok, msg
