"""Structured Streaming execution tests: the declared H1-H4 queries run
batch plans; these tests run the SAME transformations as real streaming
jobs (file source → watermark → availableNow → memory sink) and assert
stream ≡ batch. This is the semantic guarantee Spark makes (unified
batch/stream) — worth checking, not assuming."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_file_mover_spark import registry
from spark_file_mover_spark.operators.streaming import (
    as_stream,
    run_stream_to_memory,
    stateful_user_profile_stream,
)

registry.load_all()

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream = as_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    # complete mode: append would hold back windows newer than the final
    # watermark (max(ts) - 10min), i.e. the last hour of data
    run_stream_to_memory(agg, "t_tumbling", mode="complete")
    streamed = spark.table("t_tumbling")
    batch = registry.QUERIES["stream-tumbling"](spark, sf_dir)
    cols = ["window_start", "event_type", "n_events"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stream_dedup_matches_batch(spark, sf_dir):
    stream = as_stream(spark, sf_dir)
    dedup = stream.dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "event_type"
    )
    run_stream_to_memory(dedup, "t_dedup", mode="append")
    streamed = spark.table("t_dedup")
    batch = registry.QUERIES["stream-dedup-late"](spark, sf_dir)
    cols = ["event_id", "user_id", "event_type"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stream_sliding_matches_batch(spark, sf_dir):
    stream = as_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    run_stream_to_memory(agg, "t_sliding", mode="complete")
    streamed = spark.table("t_sliding")
    batch = registry.QUERIES["stream-sliding"](spark, sf_dir)
    cols = ["window_start", "event_type", "n_events"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stream_session_window_matches_batch(spark, sf_dir):
    """Session windows need watermark + update/complete mode in streaming;
    the merged sessions (start + event count per user) must equal the
    batch session_window result row-for-row."""
    stream = as_stream(spark, sf_dir, watermark="1 hour")
    sess = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n_events",
        )
    )
    run_stream_to_memory(sess, "t_session", mode="complete")
    streamed = spark.table("t_session")
    batch = registry.QUERIES["stream-session"](spark, sf_dir)
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stateful_operator_matches_batch(spark, sf_dir):
    """applyInPandasWithState running profile across FOUR micro-batches
    (one file per trigger): the final per-user update must equal the
    batch groupBy profile — state must merge correctly across batch
    boundaries and integer-cents accumulation keeps totals exact
    regardless of how rows are split."""
    stream = as_stream(spark, sf_dir, files_per_trigger=1)
    prof = stateful_user_profile_stream(stream)
    run_stream_to_memory(prof, "t_stateful", mode="update")
    # update mode may emit a row per user per micro-batch; keep the last
    # the timestamp columns must be genuine epoch MICROS (a bare
    # astype('int64') silently becomes nanos on datetime64[ns] stacks);
    # the batch anchor formats to whole seconds, so compare there — a
    # 1000x unit error still lands ~50,000 years off
    streamed = (
        spark.table("t_stateful")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
            F.floor(F.min("first_us") / 1_000_000).alias("first_s"),
            F.floor(F.max("last_us") / 1_000_000).alias("last_s"),
        )
    )
    batch = registry.QUERIES["stream-stateful-agg"](spark, sf_dir)
    batch_s = batch.select(
        "user_id",
        "n_events",
        "total_value",
        F.unix_seconds(F.to_timestamp("first_seen")).alias("first_s"),
        F.unix_seconds(F.to_timestamp("last_seen")).alias("last_s"),
    )
    a = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch_s.collect())
    assert a == b


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join (two watermarked file-source streams)
    must emit exactly the pairs the batch interval join produces."""
    from spark_file_mover_spark.operators.streaming import (
        attribution_join_stream,
    )

    views = as_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    purchases = as_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = attribution_join_stream(views, purchases)
    run_stream_to_memory(joined, "t_ssjoin", mode="append")
    streamed = spark.table("t_ssjoin")

    from spark_file_mover_spark.sources.io import load_table

    e = load_table(spark, sf_dir, "events")
    bv = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    bp = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    batch = (
        bp.join(bv, "user_id")
        .filter(
            (F.col("vts") <= F.col("ts"))
            & (F.col("vts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        )
        .select("event_id", "user_id", "ts", "vts")
    )
    cols = ["event_id", "user_id", "ts", "vts"]
    assert _rows(streamed, cols) == _rows(batch, cols)
    assert streamed.count() > 0


def test_stream_join_multibatch_state_eviction(spark, sf_dir):
    """Bounded join state PROVEN, not asserted in prose: replay both
    sides of the interval join as time-ordered one-file-per-trigger
    micro-batches, so the watermark ratchets forward batch over batch.
    The state store must (a) actually evict view/purchase rows as the
    eviction horizon advances (numRowsRemoved > 0), (b) finish holding
    strictly fewer rows than it ingested (bounded, not accumulate-all),
    and (c) still emit exactly the batch interval-join result — eviction
    must only ever remove rows that can no longer match."""
    import json

    from spark_file_mover_spark.operators.streaming import (
        attribution_join_stream,
    )
    from spark_file_mover_spark.sources.io import load_table

    n_files = 8
    views = as_stream(
        spark, sf_dir, files_per_trigger=1, n_files=n_files, time_ordered=True
    ).filter(F.col("event_type") == "view")
    purchases = as_stream(
        spark, sf_dir, files_per_trigger=1, n_files=n_files, time_ordered=True
    ).filter(F.col("event_type") == "purchase")
    joined = attribution_join_stream(views, purchases)
    q = run_stream_to_memory(joined, "t_ssjoin_mb", mode="append")

    progs = [json.loads(p.json) for p in q.recentProgress]
    data_batches = [p for p in progs if p.get("numInputRows", 0) > 0]
    assert len(data_batches) >= 2, "stream ran as a single micro-batch"
    state_ops = [op for p in progs for op in p.get("stateOperators", [])]
    assert state_ops, "no state operator metrics reported"
    removed = sum(op.get("numRowsRemoved", 0) for op in state_ops)
    assert removed > 0, "watermark never evicted any join state"
    # final state is bounded well below everything ever ingested
    final_total = sum(
        op.get("numRowsTotal", 0) for op in progs[-1]["stateOperators"]
    )
    e = load_table(spark, sf_dir, "events")
    ingested = e.filter(
        F.col("event_type").isin("view", "purchase")
    ).count()
    assert 0 < final_total < ingested, (final_total, ingested)

    # eviction removed only no-longer-matchable rows: stream == batch
    streamed = spark.table("t_ssjoin_mb")
    bv = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    bp = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    batch = (
        bp.join(bv, "user_id")
        .filter(
            (F.col("vts") <= F.col("ts"))
            & (F.col("vts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        )
        .select("event_id", "user_id", "ts", "vts")
    )
    cols = ["event_id", "user_id", "ts", "vts"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_session_batch_rollup_matches_streaming_sessions(spark, sf_dir):
    """F10 claims H3-twin semantics: the lag + running-sum batch
    sessionization (window-session-batch) must produce the SAME
    per-user session rollup as the engine's own session_window
    merging run as a real stream — same 30-min gap, so session
    boundaries, counts and durations must agree exactly."""
    stream = as_stream(spark, sf_dir, watermark="1 hour")
    sess = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    run_stream_to_memory(sess, "t_session_f10", mode="complete")
    rollup = (
        spark.table("t_session_f10")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("int"))
            .cast("long")
            .alias("n_singleton"),
            F.max("n_events").cast("long").alias("max_events"),
            F.max(
                F.unix_micros("last_ts") - F.unix_micros("first_ts")
            )
            .cast("long")
            .alias("max_duration_us"),
        )
    )
    batch = registry.QUERIES["window-session-batch"](spark, sf_dir)
    cols = [
        "user_id",
        "n_sessions",
        "n_singleton",
        "max_events",
        "max_duration_us",
    ]
    assert _rows(rollup, cols) == _rows(batch, cols)


def test_stream_topk_windowed_matches_batch(spark, sf_dir):
    """H12's streaming half: the windowed per-type counts ARE the
    streaming aggregate (complete mode); the bounded top-k rank
    applies to the closed result exactly as a foreachBatch consumer
    would, and must reproduce the declared batch query."""
    from pyspark.sql import Window as W

    stream = as_stream(spark, sf_dir)
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").cast("long").alias("n_events"))
    run_stream_to_memory(agg, "t_topkw", mode="complete")
    wr = W.partitionBy("w").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    streamed = (
        spark.table("t_topkw")
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 3)
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            F.col("rnk").cast("int").alias("rnk"),
            "event_type",
            "n_events",
        )
    )
    batch = registry.QUERIES["stream-topk-windowed"](spark, sf_dir)
    cols = ["window_start", "rnk", "event_type", "n_events"]
    assert _rows(streamed, cols) == _rows(batch, cols)
