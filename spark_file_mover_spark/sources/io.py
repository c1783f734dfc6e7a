"""Table loading for the driver testdata star schema.

``load_table`` is the single entry point every declared query uses; it
keeps the scan declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown, column pruning and partition pruning for free.
At 100 TB the same call works against a partitioned table directory —
nothing here assumes a single file.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def corpus_fingerprint(sf_dir: str) -> tuple:
    """Cheap content fingerprint of the testdata tables under ``sf_dir``:
    every ``*.parquet`` entry's (name, size, mtime_ns), as a tuple —
    equality is all callers need, and the raw tuple can't collide.

    Regenerating a corpus IN PLACE at the same path rewrites the files,
    so their sizes/mtimes change and every artifact cache keyed through
    :func:`artifact_cache_key` misses instead of silently serving
    results computed from the old bytes (the r8 cache-contract gap: the
    (appId, sf_dir) key only detected *switching* directories). Cost is
    ~10 stat calls per lookup — re-statted every call on purpose, since
    caching the fingerprint would reintroduce the staleness it exists
    to catch. Directory-shaped tables (partitioned/multi-file datasets)
    are walked one level of files deep, which covers any rewrite that
    replaces or appends data files."""
    import os

    parts: list[tuple[str, int, int]] = []
    try:
        entries = sorted(os.scandir(sf_dir), key=lambda e: e.name)
    except FileNotFoundError:
        return ()
    for e in entries:
        if not e.name.endswith(".parquet"):
            continue
        if e.is_file():
            st = e.stat()
            parts.append((e.name, st.st_size, st.st_mtime_ns))
        elif e.is_dir():
            for root, _dirs, files in os.walk(e.path):
                for fname in sorted(files):
                    st = os.stat(os.path.join(root, fname))
                    parts.append(
                        (f"{e.name}/{fname}", st.st_size, st.st_mtime_ns)
                    )
    return hash(tuple(parts))


def artifact_cache_key(spark: SparkSession, sf_dir: str) -> tuple:
    """Key for cross-invocation materialized artifacts derived from a
    corpus (minhash bands, IVF assignments, span gram relations, Bloom
    summaries, graph adjacency, kmeans models, …): a cache entry is
    valid only while (a) the SparkContext that owns its blocks is alive
    (applicationId) and (b) the input files are byte-identical
    (:func:`corpus_fingerprint`)."""
    return (
        spark.sparkContext.applicationId,
        sf_dir,
        corpus_fingerprint(sf_dir),
    )


# (artifact_cache_key, query name) → built (lazy) DataFrame. PLAN cache
# for pure-read queries, not a result cache: the returned DataFrame
# re-executes on every action — only the Column-tree construction
# (dozens-to-hundreds of py4j round trips) and the eager analysis are
# paid once per (SparkContext, corpus). Profiled at 0.2-0.8 s per
# invocation on expression-heavy keys (guide §7.3: planning time itself
# as the bottleneck; the prepared-statement discipline). ONLY valid for
# query functions with no per-invocation side effects (no writes, no
# fresh temp dirs, no streaming queries). One live entry per name; the
# corpus fingerprint in the key invalidates on in-place rewrites.
_QUERY_PLAN_CACHE: dict[tuple, DataFrame] = {}


def cached_plan(spark: SparkSession, sf_dir: str, name: str, make):
    """Return the cached built plan for ``name`` or build it via the
    zero-arg ``make`` and cache it (the multimodal _ASSET_PLAN_CACHE
    discipline, shared). Under the plan-only tooling mode
    (:data:`checkpoints.LAZY_ACTIVE`) the cache is bypassed in BOTH
    directions — a plan built against substituted empty-leaf barriers
    must not leak into production-mode invocations, nor vice versa."""
    from spark_file_mover_spark import checkpoints

    if checkpoints.LAZY_ACTIVE:
        return make()
    key = (artifact_cache_key(spark, sf_dir), name)
    df = _QUERY_PLAN_CACHE.get(key)
    if df is None:
        for k in [k for k in _QUERY_PLAN_CACHE if k[1] == name and k != key]:
            del _QUERY_PLAN_CACHE[k]
        df = make()
        _QUERY_PLAN_CACHE[key] = df
        return df
    # HIT: hand back a fresh no-op projection over the cached logical
    # plan, not the stored Dataset itself — a Dataset that has already
    # executed renders its AQE FINAL plan on explain (isFinalPlan=true),
    # which would make plan dumps order-dependent. select("*") is
    # removed by RemoveNoopOperators, so the physical plan is identical
    # to a cold build; the cost is ONE analyzer pass over the resolved
    # tree instead of the per-operator construction+analysis chain.
    return df.select("*")


def plan_cached(name: str):
    """Decorator form of :func:`cached_plan` for side-effect-free query
    functions: the wrapped function builds the plan on a (SparkContext,
    corpus) miss; hits return the SAME lazy DataFrame, re-executed per
    action. Apply BELOW ``@query`` so the registry sees the wrapper."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            return cached_plan(
                spark, sf_dir, name, lambda: fn(spark, sf_dir)
            )

        return wrapper

    return deco


# (sf_dir, name) → DataFrame for ONE SparkSession at a time. A DataFrame
# is an immutable logical plan, so reuse is safe; without the cache every
# load_table call pays a fresh driver-side footer read + file listing
# (~0.1 s), and the scoring run calls load_table a few hundred times
# across all registered keys. In-place corpus rewrites are detected via
# the fingerprint component of the key (see _CacheKey below). The
# cache is dropped whenever a different session appears, so stopped
# sessions are never pinned by cached plans. Keyed on
# (applicationId, nonce): applicationId alone would conflate two
# live sessions sharing one SparkContext (spark.newSession()) and hand
# one session plans bound to the other; the nonce is a monotonic counter
# stamped onto each session object the first time we see it — unlike
# id(spark), which CPython can recycle for a new session allocated after
# the old one is GC'd, a counter value is never reused.
# Cache entries are keyed (sf_dir, table_name); session scoping lives
# entirely in _CACHE_SESSION_KEY ((applicationId, nonce)) — the cache is
# cleared whenever the observed session key changes, so entry keys never
# need to carry session identity themselves.
# A cached plan snapshots its file listing (sizes/offsets included), so
# the key also carries the corpus fingerprint: rewriting a table's file
# in place misses the cache and re-plans against the new bytes instead
# of reading stale (or wrongly-sized) splits. Entries for a superseded
# fingerprint linger until the session changes — harmless, they're
# lazy plans, not pinned blocks.
_CacheKey = tuple[str, str, tuple]  # (sf_dir, table name, fingerprint)
_CACHE: dict[_CacheKey, DataFrame] = {}
_CACHE_SESSION_KEY: tuple[str, int] | None = None
_SESSION_NONCES = itertools.count()
_NONCE_ATTR = "_spark_file_mover_cache_nonce"


def _session_nonce(spark: SparkSession) -> int:
    nonce = getattr(spark, _NONCE_ATTR, None)
    if nonce is None:
        nonce = next(_SESSION_NONCES)
        setattr(spark, _NONCE_ATTR, nonce)
    return nonce


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    Every call — cache hit or miss — pins the session timezone to UTC so
    timestamp-derived values are stable regardless of driver host
    timezone (runtime-settable conf; direct callers outside the
    registry's ``tune_session`` wrapper rely on this)."""
    global _CACHE_SESSION_KEY
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    session_key = (spark.sparkContext.applicationId, _session_nonce(spark))
    if _CACHE_SESSION_KEY != session_key:
        _CACHE.clear()
        _CACHE_SESSION_KEY = session_key
    ck = (sf_dir, name, corpus_fingerprint(sf_dir))
    if ck in _CACHE:
        return _CACHE[ck]
    if name == "events":
        # events.ts has shipped in two physical encodings across testdata
        # generations: parquet INT64 TIMESTAMP(NANOS) (which Spark's reader
        # rejects unless nanosAsLong is set) and plain timestamp[us]. Read
        # with nanosAsLong enabled, then normalize whatever surfaced to
        # TimestampType:
        #   long           → raw nanos: integer-divide to µs (float division
        #                    would lose sub-µs bits above 2^53); DuckDB
        #                    truncates ns→µs the same way, so oracles agree.
        #   timestamp_ntz  → value-preserving cast to TIMESTAMP (session tz
        #                    is pinned UTC above, so the wall-clock is kept).
        # The legacy conf is scoped to this read (set → plan → restore) so
        # it doesn't leak into how other nanos parquet columns are decoded.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            ts_type = df.schema["ts"].dataType.typeName()
            if ts_type in ("long", "integer"):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif ts_type != "timestamp":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _CACHE[ck] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


_SCAN_PARTS_ATTR = "_spark_file_mover_scan_partitions"


def scan_partitions(df: DataFrame) -> int:
    """Memoized ``df.rdd.getNumPartitions()`` for under-parallelism
    guards. The probe is a full plan→RDD conversion (~0.1 s of driver
    latency), so the result is stamped onto the DataFrame object itself —
    attribute lifetime equals object lifetime, so a recycled ``id()``
    can never alias a dead entry. The memo is VALID precisely because of
    this module's cache contract: :func:`load_table` hands every
    consumer the same cached plan object per (session, table) and the
    scan's file listing is frozen at plan time, so the partition count
    cannot change for the object's lifetime. Keeping the helper beside
    the cache ties the two halves of that contract together — a cache
    policy change here must revisit this memo too."""
    n = getattr(df, _SCAN_PARTS_ATTR, None)
    if n is None:
        n = df.rdd.getNumPartitions()
        setattr(df, _SCAN_PARTS_ATTR, n)
    return n
