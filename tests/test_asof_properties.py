"""Property-based test for the as-of join family: the union-and-window
formulation (joins.py `_asof_merged` + carry) against a brute-force
per-event reference on RANDOM order/event streams — exactly the operator
shape where example tests miss edge cases (same-timestamp order/event
collisions, multiple orders on one date, keys with zero orders, matches
exactly AT the tolerance boundary)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_BASE = datetime(2000, 1, 1)

# small universes force collisions: few keys, few distinct days
_KEYS = st.integers(min_value=0, max_value=3)
_DAYS = st.integers(min_value=0, max_value=30)

orders_strategy = st.lists(
    st.tuples(_KEYS, _DAYS), min_size=0, max_size=15
)
events_strategy = st.lists(
    st.tuples(_KEYS, _DAYS), min_size=1, max_size=10
)

_TOL_DAYS = 7


def _brute_force(orders, events, tol_days):
    """Per event: latest order date <= event time for its key; ties on
    date -> max orderkey; a match older than tol is too_stale."""
    out = {}
    for eid, (key, eday) in enumerate(events):
        et = _BASE + timedelta(days=eday)
        elig = [
            (oday, okey)
            for okey, (k, oday) in enumerate(orders)
            if k == key and _BASE + timedelta(days=oday) <= et
        ]
        if not elig:
            out[eid] = (None, False)
            continue
        oday, okey = max(elig)
        if eday - oday <= tol_days:
            out[eid] = (okey, False)
        else:
            out[eid] = (None, True)
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(orders=orders_strategy, events=events_strategy)
def test_union_window_asof_matches_brute_force(spark, orders, events):
    from pyspark.sql import Window as W

    odf = spark.createDataFrame(
        [
            (okey, key, _BASE + timedelta(days=d))
            for okey, (key, d) in enumerate(orders)
        ]
        or [(None, None, None)],
        "okey long, key long, t timestamp",
    ).filter(F.col("okey").isNotNull())
    edf = spark.createDataFrame(
        [
            (eid, key, _BASE + timedelta(days=d))
            for eid, (key, d) in enumerate(events)
        ],
        "event_id long, key long, asof_ts timestamp",
    )
    orders_side = odf.select(
        "key",
        "t",
        F.lit(0).alias("is_event"),
        "okey",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("asof_ts"),
    )
    events_side = edf.select(
        "key",
        F.col("asof_ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("okey"),
        "event_id",
        "asof_ts",
    )
    w = (
        W.partitionBy("key")
        .orderBy("t", "is_event", "okey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last(
        F.when(
            F.col("okey").isNotNull(),
            F.struct(F.col("t").alias("mt"), F.col("okey").alias("mk")),
        ),
        ignorenulls=True,
    ).over(w)
    fresh = F.col("m.mt") >= F.timestamp_add(
        "DAY", F.lit(-_TOL_DAYS), F.col("asof_ts")
    )
    got = {
        r["event_id"]: (r["matched"], r["too_stale"])
        for r in (
            orders_side.unionByName(events_side)
            .withColumn("m", carried)
            .filter(F.col("is_event") == 1)
            .select(
                "event_id",
                F.when(fresh, F.col("m.mk")).alias("matched"),
                (
                    F.col("m.mk").isNotNull()
                    & ~F.coalesce(fresh, F.lit(False))
                ).alias("too_stale"),
            )
            .collect()
        )
    }
    assert got == _brute_force(orders, events, _TOL_DAYS)
