"""Round-14 regression pins.

Covers the r13 ADVICE items: the agg-bh-fdr NULL-p rank divergence
(Spark ASC sorts NULLs FIRST, DuckDB ASC sorts them LAST — latent until
a saturated metric produces a NULL p), the sink-expire-snapshots
lexicographic version sort (v10 < v2 lexically), the scalar width gate,
and the from_xml hot-path parity (r13 verdict item 5). The
staged-publish pins (r13 verdict item 4) live with the other file-mover
scenarios in tests/test_filemover.py and tests/test_filemover_hdfs.py.
"""

from __future__ import annotations

import datetime

import pytest


# ---------------------------------------------------------------------------
# agg-bh-fdr: a saturated event type (every user converts) must yield a
# NULL p that ranks LAST in BOTH engines (ADVICE r13, medium)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def saturated_events_dir(tmp_path_factory) -> str:
    """A tiny events corpus where type 'sat_all' is converted by EVERY
    user, failing the xa+xb < na+nb guard and yielding NULL z/p."""
    import pandas as pd

    base = tmp_path_factory.mktemp("bhfdr")
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0

    def emit(user_id: int, etype: str) -> None:
        nonlocal eid
        eid += 1
        rows.append((eid, ts, user_id, etype, 1.0, "{}"))

    users = range(1, 25)
    for u in users:  # saturated: all 24 users convert
        emit(u, "sat_all")
        if u % 2 == 0:  # duplicate events exercise countDistinct
            emit(u, "sat_all")
    for u in list(users)[:12]:
        emit(u, "half")
    for u in list(users)[:8]:
        emit(u, "third")
    for u in list(users)[:2]:
        emit(u, "rare")

    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(base / "events.parquet", index=False)
    return str(base)


def test_bh_fdr_null_p_ranks_last_and_matches_oracle(
    spark, saturated_events_dir
):
    """Differential: Spark vs the registered DuckDB oracle on a corpus
    with a NULL-p metric. Before the asc_nulls_last fix, Spark ranked
    the NULL-p row FIRST (rank 1), shifting every other rank off the
    oracle's NULLS-LAST ranking."""
    import duckdb

    from spark_file_mover_spark import registry
    from spark_file_mover_spark.operators.aggregates import agg_bh_fdr

    registry.load_all()

    got = {
        r["event_type"]: r
        for r in agg_bh_fdr(spark, saturated_events_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{saturated_events_dir}/events.parquet'"
    )
    cols = ["event_type", "xa", "xb", "z", "p", "rank", "m",
            "bh_critical", "rejected"]
    want = {
        r[0]: dict(zip(cols, r))
        for r in con.execute(registry.ORACLES["agg-bh-fdr"]).fetchall()
    }
    con.close()

    assert set(got) == set(want) == {"sat_all", "half", "third", "rare"}
    # the saturated type is degenerate: NULL z/p, never rejected, and
    # ranks LAST (m) in both engines
    assert got["sat_all"]["p"] is None and got["sat_all"]["z"] is None
    assert got["sat_all"]["rank"] == got["sat_all"]["m"] == 4
    assert got["sat_all"]["rejected"] is False
    assert want["sat_all"]["rank"] == 4

    for etype in got:
        g, w = got[etype], want[etype]
        for c in cols:
            gv, wv = g[c], w[c]
            if isinstance(gv, float) and wv is not None:
                assert abs(gv - wv) < 1e-12, (etype, c, gv, wv)
            else:
                assert gv == wv, (etype, c, gv, wv)
    # non-null p-values occupy ranks 1..3 without gaps
    assert sorted(
        r["rank"] for r in got.values() if r["p"] is not None
    ) == [1, 2, 3]


# ---------------------------------------------------------------------------
# sink-expire-snapshots: numeric (not lexicographic) version order and
# scratch-dir hygiene (ADVICE r13, low)
# ---------------------------------------------------------------------------


def test_expire_snapshots_orders_versions_numerically(
    spark, sf_dir, monkeypatch
):
    """With double-digit versions, lexicographic sort puts v10 < v2 and
    retains the WRONG snapshots; the numeric key must keep the newest
    two (v10, v11) and expire v2/v9."""
    from spark_file_mover_spark.sources import sourcesink

    monkeypatch.setattr(
        sourcesink,
        "_EXP_SNAPS",
        {"v2": (1, 3), "v9": (0, 1, 2), "v10": (0, 2), "v11": (0,)},
    )
    rows = sourcesink.sink_expire_snapshots(spark, sf_dir).collect()
    assert [r["snapshot"] for r in rows] == ["v10", "v11"]
    assert all(r["n_expired_manifests"] == 2 for r in rows)


# ---------------------------------------------------------------------------
# _widen_narrow_scan: the scalar width gate adds an exchange ONLY for
# under-parallel scans (ADVICE r13 — the 'zero shuffle at cluster
# scale' claim, pinned structurally)
# ---------------------------------------------------------------------------


def test_widen_narrow_scan_gates_on_split_count(spark):
    from spark_file_mover_spark.functions.scalar import _widen_narrow_scan

    par = spark.sparkContext.defaultParallelism
    if par < 2:
        pytest.skip(
            "coalesce(1) is not narrower than defaultParallelism=1 — "
            "the width gate correctly adds no exchange on a 1-core runner"
        )
    base = spark.range(1000).selectExpr("id", "id * 2 AS v")

    def n_exchanges(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    narrow = base.coalesce(1)
    wide = base.repartition(par)  # simulates a cluster-scale multi-split scan
    assert n_exchanges(_widen_narrow_scan(spark, narrow, ["id", "v"])) == 1
    # already-wide input: the gate must add NOTHING beyond the input's
    # own exchange
    assert n_exchanges(_widen_narrow_scan(spark, wide, ["id", "v"])) == (
        n_exchanges(wide.select("id", "v"))
    )


# ---------------------------------------------------------------------------
# fn-xml-extract: the promised from_xml hot path is value-identical to
# the registered xpath formulation (r13 verdict item 5)
# ---------------------------------------------------------------------------


def test_xml_extract_from_xml_hotpath_value_parity(spark, sf_dir):
    from spark_file_mover_spark.functions.scalar import (
        fn_xml_extract,
        fn_xml_extract_hotpath,
    )

    xpath_rows = fn_xml_extract(spark, sf_dir).collect()
    hot_rows = fn_xml_extract_hotpath(spark, sf_dir).collect()
    assert len(xpath_rows) == len(hot_rows) > 0
    for a, b in zip(xpath_rows, hot_rows):
        assert a.asDict() == b.asDict(), (a, b)
    # the hot path parses ONCE per row: no xpath_* expression anywhere
    plan = fn_xml_extract_hotpath(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "xpath" not in plan.lower()
    assert "from_xml" in plan.lower()


def test_expire_snapshots_sweeps_stale_scratch_dirs(spark, sf_dir):
    """Prior runs' sfm-b22-* scratch dirs older than 1 h are removed on
    the next run; young dirs (possibly owned by a concurrent session
    mid-query) are left alone."""
    import os
    import tempfile
    import time

    old = tempfile.mkdtemp(prefix="sfm-b22-")
    os.utime(old, (time.time() - 7200, time.time() - 7200))
    young = tempfile.mkdtemp(prefix="sfm-b22-")

    from spark_file_mover_spark.sources.sourcesink import (
        sink_expire_snapshots,
    )

    sink_expire_snapshots(spark, sf_dir).collect()
    assert not os.path.exists(old)
    assert os.path.exists(young)
    os.rmdir(young)
