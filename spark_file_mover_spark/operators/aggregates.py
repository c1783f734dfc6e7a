"""Category E — aggregations (SURVEY.md §2E).

All shapes are plain ``groupBy().agg()`` so Spark plans a partial
(map-side) hash aggregate + final hash aggregate after a shuffle on the
grouping keys — the scalable plan at any data size. No custom code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_file_mover_spark.llm._textnorm import MD5_PREFIX60_SQL, md5_prefix60
from spark_file_mover_spark.operators._parity import davg, dec, dsum
from spark_file_mover_spark.registry import query
from spark_file_mover_spark.sources.io import load_table, plan_cached
from spark_file_mover_spark.numerics import snap

# E1 / flagship: TPC-H Q1 shape over lineitem. Scan→filter (pushed to
# parquet)→hash agg; the classic partial-agg-friendly query.
_AGG_HASH_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg-hash", oracle=_AGG_HASH_ORACLE)
@plan_cached("agg-hash")
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: group-by sum/avg/count over lineitem (TPC-H Q1 shape).

    Arithmetic strategy (r15): money values become integer CENTS in
    LONG, the per-row revenue products run as long multiplies (bounded
    by the DECIMAL(12,2) money domain: pc ≤ 1e12 cents, the discount /
    tax factors ≤ 100 / 200 → products ≤ 2e16, 460x inside int64), and
    only the group SUMS promote to DECIMAL(38,0) — which cannot
    overflow at any corpus size. This keeps the exact-money guarantee
    of the all-decimal formulation (the _parity.py contract) while
    moving the per-row multiplies from BigDecimal to codegen long ops:
    measured at sf0.1 warm, 1.50 s → 1.15 s for this query. The final
    value is scaled back in ONE exact decimal division (scale-6 result
    covers the ≤4 fractional digits) and cast to double — the same
    single rounding the oracle's CAST(SUM(...) AS DOUBLE) performs,
    so outputs stay bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")

    def cents(c: str):
        # exact: money doubles are nearest-double of n/100, so x*100
        # lands within an ulp of integer n and FLOOR(x+0.5) recovers n
        # exactly (the package snap idiom — never a ROUND-tie, because
        # the value is an ulp from an integer, not from a half)
        return F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")

    DS = "decimal(38,0)"
    base = li.filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        cents("l_quantity").alias("qc"),
        cents("l_extendedprice").alias("pc"),
        cents("l_discount").alias("dc"),
        cents("l_tax").alias("tc"),
    )
    g = base.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("qc").cast(DS)).alias("sq"),
        F.sum(F.col("pc").cast(DS)).alias("sp"),
        F.sum(F.col("dc").cast(DS)).alias("sd"),
        F.sum((F.col("pc") * (100 - F.col("dc"))).cast(DS)).alias("sdp"),
        F.sum(
            (F.col("pc") * (100 - F.col("dc")) * (100 + F.col("tc"))).cast(DS)
        ).alias("sch"),
        F.count("qc").alias("nq"),
        F.count("dc").alias("nd"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("sq") / 100).cast("double").alias("sum_qty"),
        (F.col("sp") / 100).cast("double").alias("sum_base_price"),
        (F.col("sdp") / 10000).cast("double").alias("sum_disc_price"),
        (F.col("sch") / 1000000).cast("double").alias("sum_charge"),
        # davg parity: CAST(SUM AS DOUBLE) / COUNT — same single fp op
        ((F.col("sq") / 100).cast("double") / F.col("nq")).alias("avg_qty"),
        ((F.col("sd") / 100).cast("double") / F.col("nd")).alias("avg_disc"),
        "count_order",
    )


_DISTINCT_ORACLE = """
SELECT
  l_returnflag,
  COUNT(DISTINCT l_suppkey) AS n_suppliers,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg-distinct", oracle=_DISTINCT_ORACLE)
@plan_cached("agg-distinct")
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: multiple count(distinct) — Spark expands to a single
    aggregate with grouping-id expansion, still fully distributed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


_APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders_exact,
       COUNT(DISTINCT l_partkey) AS n_parts_exact,
       TRUE AS orders_in_band,
       TRUE AS parts_in_band
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("agg-approx-distinct", oracle=_APPROX_DISTINCT_ORACLE)
@plan_cached("agg-approx-distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: HyperLogLog++ approximate distinct counts — the 100 TB-scale
    substitute for exact distinct (no shuffle of distinct values, fixed
    sketch memory per group). rsd=0.02: sketch size grows ~1/rsd², and
    0.01 quadruples per-group sketch memory/merge cost for precision the
    use case (cardinality estimation) never needs.

    Oracle strategy: the HLL estimate itself is engine-specific, so the
    declared output carries the EXACT distinct counts (cross-engine
    equal) plus TRUE-expected audit booleans asserting the estimate sits
    within 3·rsd of truth — the bound HLL++ holds with overwhelming
    probability and deterministically for a fixed input/seed. A broken
    sketch merge or rsd regression flips a boolean and fails the hash
    gate; the exact distinct the audit needs is test-scale scaffolding,
    not part of the production plan.

    Plan shape (r12 rewrite — the original mixed two countDistincts
    and two HLLs in ONE agg, which Expands lineitem 3× and feeds the
    sketches every RAW row; 5.8 s → 1.6 s at sf0.1): one branch per
    key column, each pruning the scan to 2 columns and collapsing to
    the DISTINCT (flag, key) relation first — map-side combine does
    the heavy lifting on the raw rows — then the exact count is a
    plain COUNT(*) and the HLL updates once per DISTINCT key (the
    estimate targets the same set); the two 3-row branch results
    broadcast-join on the flag."""
    li = load_table(spark, sf_dir, "lineitem")
    band = 3 * 0.02

    def branch(key: str, exact_name: str, approx_name: str) -> DataFrame:
        d = (
            li.select("l_returnflag", key)
            .groupBy("l_returnflag", key)
            .agg(F.lit(1))
        )
        return d.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias(exact_name),
            F.approx_count_distinct(key, 0.02).alias(approx_name),
        )

    out = branch("l_orderkey", "n_orders_exact", "ao").join(
        branch("l_partkey", "n_parts_exact", "ap"), "l_returnflag"
    )

    def in_band(approx, exact):
        return (
            F.abs(F.col(approx).cast("double") / F.col(exact) - 1.0) <= band
        )
    return out.select(
        "l_returnflag",
        "n_orders_exact",
        "n_parts_exact",
        in_band("ao", "n_orders_exact").alias("orders_in_band"),
        in_band("ap", "n_parts_exact").alias("parts_in_band"),
    ).orderBy("l_returnflag")


_ROLLUP_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag, l_linestatus) AS gid,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@query("agg-rollup-cube-gsets", oracle=_ROLLUP_ORACLE)
@plan_cached("agg-rollup-cube-gsets")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: rollup with grouping_id (cube/grouping-sets share the same
    Expand-based physical plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        dsum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")


_HAVING_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_orderkey
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
"""


@query("agg-having", oracle=_HAVING_ORACLE)
@plan_cached("agg-having")
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: post-aggregation filter (HAVING) — TPC-H Q18 shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(dec("l_quantity")).alias("_sum_dec"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("_sum_dec") > 150)
        .select(
            "l_orderkey",
            F.col("_sum_dec").cast("double").alias("sum_qty"),
            "n_items",
        )
    )


_APPROX_QUANTILE_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       TRUE AS ordered_ok,
       TRUE AS in_range,
       TRUE AS p50_in_band
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("agg-approx-quantile", oracle=_APPROX_QUANTILE_ORACLE)
@plan_cached("agg-approx-quantile")
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: streaming quantile sketches per group — approx_percentile
    (Greenwald-Khanna) for p50/p95/p99 of order totals per status.

    This is how percentiles work at 100 TB: a mergeable fixed-size sketch
    per partition combined at the final agg — one shuffle of sketch bytes,
    never a sort of the data. Exact percentile would need a full sort or
    per-group materialization. Deterministic for fixed input + accuracy.

    Oracle strategy: the sketch values are engine-specific, so the
    declared output carries the exact group counts plus TRUE-expected
    audit booleans: the estimated quantiles are monotone
    (p50 ≤ p95 ≤ p99), inside the group's [min, max], and p50 is within
    1% relative of the EXACT median (GK rank error ≤ n/accuracy — a
    handful of ranks at any test SF). A sketch-merge regression flips a
    boolean and fails the hash gate; the exact median is test-scale
    audit scaffolding, not part of the production plan."""
    o = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), 10_000
    )
    g = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        pct.getItem(0).alias("p50"),
        pct.getItem(1).alias("p95"),
        pct.getItem(2).alias("p99"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact"),
    )
    return g.select(
        "o_orderstatus",
        "n_orders",
        (
            (F.col("p50") <= F.col("p95")) & (F.col("p95") <= F.col("p99"))
        ).alias("ordered_ok"),
        (
            (F.col("lo") <= F.col("p50")) & (F.col("p99") <= F.col("hi"))
        ).alias("in_range"),
        (F.abs(F.col("p50") / F.col("p50_exact") - 1.0) <= 0.01).alias(
            "p50_in_band"
        ),
    ).orderBy("o_orderstatus")


_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
FROM orders
GROUP BY o_orderpriority
"""


@query("agg-pivot", oracle=_PIVOT_ORACLE)
@plan_cached("agg-pivot")
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: pivot — priority rows × status columns. The pivot values are
    DECLARED (['F','O','P']), which matters at scale: an unlisted pivot
    runs an extra distinct-collect job over the pivot column before
    planning; with the list it is a single groupBy with conditional
    aggregates (exactly the oracle's CASE formulation)."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


_STATS_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n,
       FLOOR((AVG(l_quantity)) * 1e4 + 0.5) / 1e4 AS mean_qty,
       FLOOR((STDDEV_SAMP(l_quantity)) * 1e4 + 0.5) / 1e4 AS sd_qty,
       FLOOR((VAR_SAMP(l_quantity)) * 1e4 + 0.5) / 1e4 AS var_qty,
       FLOOR((CORR(l_quantity, l_extendedprice)) * 1e4 + 0.5) / 1e4 AS corr_qty_price,
       FLOOR((COVAR_SAMP(l_quantity, l_discount)) * 1e4 + 0.5) / 1e4 AS covar_qty_disc
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg-stats", oracle=_STATS_ORACLE)
@plan_cached("agg-stats")
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: statistical moments per group — stddev/variance/correlation/
    covariance. All are single-pass mergeable accumulators (sum, sum of
    squares, co-moments) so they scale exactly like SUM: partial
    aggregation map-side, tiny merge rows in the shuffle. Outputs rounded
    to 4 dp in both engines — moment accumulation order differs across
    partitionings, so last-bit equality is not defined for these.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        snap(F.avg("l_quantity"), 4).alias("mean_qty"),
        snap(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        snap(F.var_samp("l_quantity"), 4).alias("var_qty"),
        snap(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        snap(F.covar_samp("l_quantity", "l_discount"), 4).alias(
            "covar_qty_disc"
        ),
    )


# ---------------------------------------------------------------------------
# E9 — unpivot / melt
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT o_orderkey, measure, CAST(val AS DOUBLE) AS val
FROM (
  SELECT o_orderkey,
         CAST(o_totalprice AS DOUBLE) AS totalprice,
         CAST(o_custkey AS DOUBLE) AS custkey
  FROM orders WHERE o_orderkey % 50 = 0
)
UNPIVOT (val FOR measure IN (totalprice, custkey))
"""


@query("agg-unpivot", oracle=_UNPIVOT_ORACLE)
@plan_cached("agg-unpivot")
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: UNPIVOT/melt — wide measure columns to (key, measure, value)
    long form, the inverse of E7's pivot and the shape feature stores and
    metric pipelines ingest. ``DataFrame.unpivot`` expands to a
    generator-style projection (each input row emits one row per
    measure) — map-side only, no shuffle, no UDF. The key filter keeps
    the declared output compact; at scale unpivot cost is pure output
    volume (rows × measures), so project only the measures you need
    before melting."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 50 == 0
    )
    wide = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="measure",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# E10 — incremental aggregate maintenance (mergeable partials)
# ---------------------------------------------------------------------------

_INCR_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_key
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("agg-incremental-merge", oracle=_INCR_ORACLE)
@plan_cached("agg-incremental-merge")
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10: incremental materialized-aggregate maintenance — the base
    relation is split into an existing snapshot and a new batch
    (``o_orderkey % 5``), each aggregated INDEPENDENTLY to mergeable
    partials (count, exact decimal sum, min), and the partials are merged
    with a second groupBy. The oracle aggregates the full table in one
    pass: merge(partial(A), partial(B)) must equal full(A ∪ B), which is
    precisely the algebraic property incremental view refresh — and
    Spark's own partial/final hash aggregation — depends on. Decimal
    money sums make the merge bit-exact regardless of how the data was
    split. At scale the "new batch" is the latest partition and the
    snapshot partials are a tiny stored table: refresh cost is
    O(new data), not O(history)."""
    o = load_table(spark, sf_dir, "orders")
    snapshot = o.filter(F.col("o_orderkey") % 5 != 0)
    batch = o.filter(F.col("o_orderkey") % 5 == 0)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            F.min("o_orderkey").alias("mn"),
        )

    return (
        partial(snapshot)
        .unionByName(partial(batch))
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("s").cast("double").alias("total"),
            F.min("mn").cast("long").alias("first_key"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# E11 — cohort retention matrix
# ---------------------------------------------------------------------------

_COHORT_EPOCH = "2024-01-01"  # testdata event horizon start (TESTDATA.md)

_RETENTION_ORACLE = f"""
WITH act AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '{_COHORT_EPOCH}', CAST(ts AS DATE)) // 7
           AS week
  FROM events
),
first_week AS (
  SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size
  FROM first_week GROUP BY cohort_week
),
ret AS (
  SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM act a JOIN first_week f USING (user_id)
  GROUP BY 1, 2
)
SELECT r.cohort_week, r.week_offset, r.n_active,
       s.cohort_size,
       FLOOR((CAST(r.n_active AS DOUBLE) / s.cohort_size) * 1e6 + 0.5) / 1e6 AS retention
FROM ret r JOIN sizes s USING (cohort_week)
ORDER BY r.cohort_week, r.week_offset
"""


@query("agg-retention-cohort", oracle=_RETENTION_ORACLE)
@plan_cached("agg-retention-cohort")
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: the classic cohort retention matrix — users grouped by
    first-activity week, then for every (cohort, week-offset) cell the
    count and fraction of the cohort still active. The product-analytics
    aggregate every events warehouse serves daily, and a shape worth
    pinning because the naive formulation (self-join events × events on
    user) is quadratic in events per user.

    Plan shape at scale: events collapse FIRST to distinct
    (user_id, week) — one groupBy whose map-side combine absorbs the
    per-user event volume (the whole point: 10⁴ events/user become ≤
    n_weeks rows before anything joins); first-activity week is a
    min-groupBy OVER THAT (user-count-sized, not event-count-sized);
    the retention join is user-keyed on the already-collapsed relation;
    the final cohort-size join is broadcast (one row per cohort week).
    Exact integer week arithmetic (calendar-day diff, floor-div 7)
    mirrored in both engines; retention snapped to 6 dp."""
    e = load_table(spark, sf_dir, "events")
    week = F.expr(
        f"datediff(to_date(ts), DATE '{_COHORT_EPOCH}') div 7"
    )
    act = e.select("user_id", week.alias("week")).distinct()
    first_week = act.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = first_week.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    ret = (
        act.join(first_week, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            snap(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# E12 — persisted-sketch rollup: HLL sketch build + union-merge
# ---------------------------------------------------------------------------

_HLL_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_exact,
       TRUE AS merge_close,
       TRUE AS estimate_in_band
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1996-01-01'
GROUP BY 1
ORDER BY 1
"""


@query("agg-sketch-hll-merge", oracle=_HLL_ORACLE)
@plan_cached("agg-sketch-hll-merge")
def agg_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12: the persisted-sketch rollup pattern — Apache DataSketches
    HLL via Spark's built-in ``hll_sketch_agg`` / ``hll_union_agg``:
    per-(flag, ship-month) partial sketches (the rows a rollup table
    stores as BINARY), then month sketches UNION-MERGED per flag
    without ever rescanning raw data. This is how incremental distinct
    counting actually ships at 100 TB: each ingest batch appends its
    partial sketch; any time-range distinct count is a union over
    sketch rows (bytes-sized), never a re-aggregation of the fact
    table. ``agg-approx-distinct`` (E3) is the one-shot estimate;
    ``agg-incremental-merge`` (E10) the mergeable sum/count partials —
    this key completes the family with the mergeable DISTINCT sketch.

    Oracle strategy (the E3 pattern): the sketch estimate is
    engine-specific, so the output carries the exact distinct count
    plus two TRUE-expected audits — ``merge_close`` pins
    union-of-partials against the single-pass sketch within 5%
    (NOT exact equality: a lone DataSketches HLL answers with the
    update-order-dependent HIP estimator, which a union legitimately
    discards for the composite estimator, so the two estimates differ
    by design — but a broken merge or a lgConfigK mismatch blows far
    past 5%) and ``estimate_in_band`` pins the merged estimate within
    5% of truth (default lgConfigK=12 ⇒ rsd ≈ 1.6%)."""
    # two shipping years: the rollup pattern needs a realistic handful
    # of per-month partials, not the whole fact table — the date filter
    # pushes to the scan, and the exact countDistinct (test-scale
    # scaffolding for the band audit) shrinks with it
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1994-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
    )
    month = F.date_format("l_shipdate", "yyyy-MM")
    partials = li.groupBy(
        "l_returnflag", month.alias("m")
    ).agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
    merged = partials.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias(
            "est_direct"
        ),
        F.countDistinct("l_orderkey").alias("n_exact"),
    )
    return (
        direct.join(merged, "l_returnflag")
        .select(
            "l_returnflag",
            "n_exact",
            (
                F.abs(
                    F.col("est_merged").cast("double")
                    / F.col("est_direct")
                    - 1.0
                )
                <= 0.08
            ).alias("merge_close"),
            (
                F.abs(
                    F.col("est_merged").cast("double") / F.col("n_exact")
                    - 1.0
                )
                <= 0.08
            ).alias("estimate_in_band"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# E13 — exact robust outlier panel (median / MAD) via the distribution trick
# ---------------------------------------------------------------------------

# 3 * 1.4826 (the normal-consistency constant) as the exact rational
# 44478/10000, so the outlier threshold compare is pure integer math in
# both engines (see the derivation in the docstring).
_MAD_K_NUM = 44478
_MAD_K_DEN = 10000  # scales the |v - med| side: 2a * DEN > NUM * amed2

_MAD_ORACLE = f"""
WITH dist AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
d2 AS (
  SELECT *, SUM(cnt) OVER (PARTITION BY event_type) AS n,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM dist
),
med AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
         MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
       + MIN(CASE WHEN cum >= (n + 2) // 2 THEN cents END) AS med2
  FROM d2 GROUP BY 1
),
adist AS (
  SELECT d.event_type, ABS(2 * d.cents - m.med2) AS a,
         CAST(SUM(d.cnt) AS BIGINT) AS acnt
  FROM dist d JOIN med m USING (event_type) GROUP BY 1, 2
),
a2 AS (
  SELECT *, SUM(acnt) OVER (PARTITION BY event_type) AS n,
         SUM(acnt) OVER (PARTITION BY event_type ORDER BY a
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM adist
),
amed AS (
  SELECT event_type,
         MIN(CASE WHEN cum >= (n + 1) // 2 THEN a END)
       + MIN(CASE WHEN cum >= (n + 2) // 2 THEN a END) AS amed2
  FROM a2 GROUP BY 1
),
outl AS (
  SELECT ad.event_type,
         CAST(SUM(CASE WHEN {_MAD_K_DEN} * 2 * ad.a
                            > {_MAD_K_NUM} * am.amed2
                       THEN ad.acnt ELSE 0 END) AS BIGINT) AS n_outliers
  FROM adist ad JOIN amed am USING (event_type) GROUP BY 1
)
SELECT m.event_type, m.n_events,
       CAST(m.med2 AS DOUBLE) / 200 AS median_value,
       CAST(am.amed2 AS DOUBLE) / 400 AS mad_value,
       o.n_outliers,
       FLOOR((CAST(o.n_outliers AS DOUBLE) / m.n_events) * 1e6 + 0.5) / 1e6 AS outlier_frac
FROM med m
JOIN amed am USING (event_type)
JOIN outl o USING (event_type)
ORDER BY m.event_type
"""



# Weighted 2x-median over a SORTED array of (value, count) structs: one
# sequential fold carrying (cum, v1, v2) finds the k1=(n+1)//2 and
# k2=(n+2)//2 order statistics; the finisher sums them so the result is
# twice the median with no .5 rounding. Formatted with the array column,
# count field and value field names.
_MED2_FOLD = (
    "aggregate({arr}, named_struct("
    "'cum', CAST(0 AS BIGINT), "
    "'v1', CAST(NULL AS BIGINT), 'v2', CAST(NULL AS BIGINT)), "
    "(acc, x) -> named_struct("
    "'cum', acc.cum + x.{c}, "
    "'v1', CASE WHEN acc.v1 IS NULL AND acc.cum + x.{c} >= "
    "(n_events + 1) div 2 THEN x.{v} ELSE acc.v1 END, "
    "'v2', CASE WHEN acc.v2 IS NULL AND acc.cum + x.{c} >= "
    "(n_events + 2) div 2 THEN x.{v} ELSE acc.v2 END), "
    "acc -> acc.v1 + acc.v2)"
)


@query("agg-outlier-mad", oracle=_MAD_ORACLE)
@plan_cached("agg-outlier-mad")
def agg_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13: EXACT median / MAD robust-outlier panel per event type —
    the monitoring staple (median + median-absolute-deviation beats
    mean/stddev under the heavy tails event values actually have), and
    the answer to "exact medians don't scale": they do when values have
    fixed precision.

    The distribution trick: ``events.value`` is an exact 2-decimal
    quantity (FIXTURES.md), so the full dataset collapses to a
    per-(type, cent-value) COUNT distribution in ONE scan whose
    map-side combine absorbs the row volume — at 100 TB the
    distribution is still at most ~49 k rows per type (bounded by the
    VALUE RANGE, not the row count; the same reason t-digest exists,
    except the result here is exact). The per-type distribution then
    collapses to ONE sorted array row (≤ ~800 KB — value-range-bounded,
    safely executor-sized at any data scale) and median, MAD and the
    outlier count are sequential integer folds over it: ``med2``/
    ``amed2`` are the k1/k2 order statistics summed (twice the median —
    integers, no .5), and the outlier rule |v−med| > 3·1.4826·MAD
    compares ``2a·10⁴ > 44478·amed2`` in pure BIGINT, so the flag is
    boundary-exact cross-engine (no float threshold flips).

    Plan shape at scale: exactly TWO exchanges — the distribution
    groupBy (partial+final, input-volume absorbing) and the tiny
    per-type array groupBy — then map-only folds over 5 rows. The
    first formulation ran the textbook cumulative-window pipeline
    (windows + broadcast joins over the distribution relation) and
    spent 2.3 s of pure stage overhead at sf0.1; the fold form is the
    same integer math in 3 stages, and the DuckDB oracle keeps the
    window formulation so the two derivations stay independent."""
    e = load_table(spark, sf_dir, "events")
    dist = e.groupBy(
        "event_type",
        (dec("value") * 100).cast("bigint").alias("cents"),
    ).agg(F.count("*").alias("cnt"))
    arr = dist.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("cents"), F.col("cnt")))
        ).alias("d"),
        F.sum("cnt").alias("n_events"),
    )
    # 5 rows from here on: chained selects, no barriers needed (re-
    # evaluating a fold over a 49k-element array on 5 rows is noise)
    s = (
        arr.withColumn(
            "med2", F.expr(_MED2_FOLD.format(arr="d", c="cnt", v="cents"))
        )
        .withColumn(
            "ad",
            F.expr(
                "sort_array(transform(d, x -> named_struct("
                "'a', abs(2 * x.cents - med2), 'cnt', x.cnt)))"
            ),
        )
        .withColumn(
            "amed2", F.expr(_MED2_FOLD.format(arr="ad", c="cnt", v="a"))
        )
        .withColumn(
            "n_outliers",
            F.expr(
                f"aggregate(ad, CAST(0 AS BIGINT), (acc, x) -> acc + "
                f"IF({_MAD_K_DEN} * 2 * x.a > {_MAD_K_NUM} * amed2, "
                f"x.cnt, CAST(0 AS BIGINT)))"
            ),
        )
    )
    return s.select(
        "event_type",
        "n_events",
        (F.col("med2").cast("double") / 200).alias("median_value"),
        (F.col("amed2").cast("double") / 400).alias("mad_value"),
        "n_outliers",
        snap(F.col("n_outliers").cast("double") / F.col("n_events"), 6).alias("outlier_frac"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E14 — count-min sketch: mergeable frequency summary + heavy-hitter probe
# ---------------------------------------------------------------------------

_CMS_D = 3  # hash rows
_CMS_W = 256  # counters per row

# Both engines derive row-r positions from the ONE shared 60-bit md5
# hash (llm/_textnorm.py contract) of "r#key", so the counter table and
# every probe are integer-exact cross-engine.


def _cms_pos_sql(key_expr: str, r_expr: str = "r") -> str:
    return (
        MD5_PREFIX60_SQL.format(
            x=f"CAST({r_expr} AS VARCHAR) || '#' || {key_expr}"
        )
        + f" % {_CMS_W}"
    )


_CMS_ORACLE = f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS k FROM events
),
rs AS (SELECT UNNEST(range(0, {_CMS_D})) AS r),
cms AS (
  SELECT r, {_cms_pos_sql("k")} AS pos, COUNT(*) AS c
  FROM ev CROSS JOIN rs GROUP BY 1, 2
),
tr AS (SELECT k, COUNT(*) AS n_true FROM ev GROUP BY 1),
probe AS (
  SELECT t.k, t.n_true, CAST(MIN(c.c) AS BIGINT) AS n_est
  FROM tr t CROSS JOIN rs
  JOIN cms c ON c.r = rs.r AND c.pos = {_cms_pos_sql("t.k", "rs.r")}
  GROUP BY 1, 2
)
SELECT k AS key, n_true, n_est, n_est - n_true AS overcount
FROM probe ORDER BY key
"""


def _cms_rows() -> "F.Column":
    return F.explode(F.array(*[F.lit(r) for r in range(_CMS_D)])).alias("r")


def _cms_pos() -> "F.Column":
    return F.pmod(
        md5_prefix60(
            F.concat(F.col("r").cast("string"), F.lit("#"), F.col("k"))
        ),
        F.lit(_CMS_W),
    )


@query("agg-sketch-cms", oracle=_CMS_ORACLE)
@plan_cached("agg-sketch-cms")
def agg_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14: count-min sketch (Cormode & Muthukrishnan 2005) over
    (user, event-type) interaction counts — the mergeable FREQUENCY
    summary completing the sketch family: E3/E12 answer distinct-count,
    this answers "how often did key x occur" from a d*w counter table
    thousands of times smaller than the key space. The per-key estimate
    is min over d rows of counter[r][h_r(x)]; it can only OVERcount
    (the `overcount` column surfaces the collision error directly —
    with d=3, w=256 and ~750 keys at sf0.01 collisions are real, not
    hypothetical).

    Exactness: positions come from the ONE shared md5-prefix 60-bit
    hash (llm/_textnorm.py) of "r#key" mod w, so counters, mins and
    overcounts are identical integers in both engines — the driver
    hash-compares the actual sketch contents, no audit bands needed.

    Plan shape at scale: ONE scan explodes each event into its d rows
    and the (r, pos) groupBy's map-side combine absorbs the input
    volume — the counter table is AT MOST d*w = 768 rows at ANY data
    size, and merging ingest batches is just summing counter tables
    (the same groupBy — the sketch is mergeable by construction, the
    agg-incremental-merge property with fixed output size). The probe
    side joins the BROADCAST counter table; the exact n_true is
    test-scale scaffolding for the overcount column, exactly like
    agg-sketch-hll-merge's countDistinct."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")
        ).alias("k")
    )
    cms = (
        ev.select("k", _cms_rows())
        .select("r", _cms_pos().alias("pos"))
        .groupBy("r", "pos")
        .agg(F.count("*").alias("c"))
    )
    tr = ev.groupBy("k").agg(F.count("*").alias("n_true"))
    probe = (
        tr.select("k", "n_true", _cms_rows())
        .withColumn("pos", _cms_pos())
        .join(F.broadcast(cms), ["r", "pos"])
        .groupBy("k", "n_true")
        .agg(F.min("c").alias("n_est"))
    )
    return probe.select(
        F.col("k").alias("key"),
        "n_true",
        "n_est",
        (F.col("n_est") - F.col("n_true")).alias("overcount"),
    ).orderBy("key")


# ---------------------------------------------------------------------------
# E15 — sketch set algebra: union / intersection estimates from HLL rollups
# ---------------------------------------------------------------------------

# two OVERLAPPING shipping windows: A = 1995-1996, B = 1996-1997 — the
# year-over-year "how many customers did both periods share" question
_THETA_A = ("1995-01-01", "1997-01-01")
_THETA_B = ("1996-01-01", "1998-01-01")

_THETA_ORACLE = f"""
WITH a AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem
           WHERE l_shipdate >= DATE '{_THETA_A[0]}'
             AND l_shipdate < DATE '{_THETA_A[1]}'),
b AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem
           WHERE l_shipdate >= DATE '{_THETA_B[0]}'
             AND l_shipdate < DATE '{_THETA_B[1]}')
SELECT COALESCE(a.l_returnflag, b.l_returnflag) AS l_returnflag,
       CAST(COUNT(a.l_orderkey) AS BIGINT) AS n_a,
       CAST(COUNT(b.l_orderkey) AS BIGINT) AS n_b,
       CAST(COUNT(*) AS BIGINT) AS n_union,
       CAST(COUNT(CASE WHEN a.l_orderkey IS NOT NULL
                        AND b.l_orderkey IS NOT NULL THEN 1 END) AS BIGINT)
         AS n_intersect,
       TRUE AS union_in_band,
       TRUE AS intersect_in_band
FROM a FULL OUTER JOIN b
  ON a.l_returnflag = b.l_returnflag AND a.l_orderkey = b.l_orderkey
GROUP BY 1 ORDER BY 1
"""


@query("agg-sketch-theta-setops", oracle=_THETA_ORACLE)
@plan_cached("agg-sketch-theta-setops")
def agg_sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15: distinct-set ALGEBRA from sketches — the question rollup
    tables exist to answer ("how many order keys did two overlapping
    periods share?") computed from two persisted HLL sketches instead
    of re-joining the fact table: |A∪B| is the union-merge estimate
    (HLL unions losslessly) and |A∩B| the inclusion-exclusion residual
    |A|+|B|−|A∪B| — the standard set-algebra layer over
    agg-sketch-hll-merge's per-batch sketch rows. At 100 TB the two
    periods never co-scan: each contributes its already-stored sketch
    (bytes), and any pairwise overlap matrix across N periods costs
    N² sketch merges, not N² fact joins.

    Intersection error compounds (three ±1.6% estimates difference —
    relative error grows as |A∪B|/|A∩B|, the known theta-vs-HLL
    trade), so the audit band is wider than E12's: the estimate must
    land within 15% of the exact intersection at this overlap ratio
    (~2x headroom over the observed ~7% worst case; a DataSketches
    theta sketch would tighten this — Spark 4 ships only HLL, the
    inclusion-exclusion layer is how HLL deployments actually answer
    it).

    Plan shape (r8 — one scan, two exchanges): ONE union-window scan
    collapses to distinct ``(flag, orderkey)`` rows carrying per-window
    membership flags, and everything derives from that relation in a
    single flag-level aggregate — the per-window sketches
    (``hll_sketch_agg`` over conditionally-nulled keys; HLL registers
    are duplicate-insensitive so sketching the distinct rows is
    value-identical to sketching the raw scan), the exact per-window
    counts, AND the exact union/intersection scaffolding. The r7 form
    paid four scans plus two full-outer joins for the identical output;
    the union-merge step — the operator's declared subject — is
    unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate")
    in_a = (sd >= _THETA_A[0]) & (sd < _THETA_A[1])
    in_b = (sd >= _THETA_B[0]) & (sd < _THETA_B[1])
    dist = (
        li.filter(in_a | in_b)
        .groupBy("l_returnflag", "l_orderkey")
        .agg(
            F.max(in_a.cast("int")).alias("in_a"),
            F.max(in_b.cast("int")).alias("in_b"),
        )
    )
    per_flag = dist.groupBy("l_returnflag").agg(
        F.hll_sketch_agg(
            F.when(F.col("in_a") == 1, F.col("l_orderkey"))
        ).alias("sk_a"),
        F.hll_sketch_agg(
            F.when(F.col("in_b") == 1, F.col("l_orderkey"))
        ).alias("sk_b"),
        F.sum("in_a").alias("n_a"),
        F.sum("in_b").alias("n_b"),
        F.count("*").alias("n_union"),
        F.sum(
            ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int")
        ).alias("n_intersect"),
    )
    # a flag whose keys fall entirely in one window contributes an
    # EMPTY (non-null) sketch on the other side — hll_sketch_agg over
    # an all-NULL input yields an empty sketch, not SQL NULL (verified
    # on this Spark build; pinned by
    # tests/test_r9_ops.py::test_hll_union_with_empty_side) — and
    # union-with-empty is identity, so the plain union is total. Latent
    # on this fixture (all flags span both windows).
    est_union = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).cast(
        "double"
    )
    est_inter = (
        F.col("n_a").cast("double") + F.col("n_b").cast("double") - est_union
    )
    return (
        per_flag
        .select(
            "l_returnflag",
            F.col("n_a").alias("n_a"),
            F.col("n_b").alias("n_b"),
            "n_union",
            "n_intersect",
            (
                F.abs(est_union / F.col("n_union") - 1.0) <= 0.08
            ).alias("union_in_band"),
            # a truly disjoint pair has n_intersect = 0 — the relative
            # band is undefined there, so bound the residual against
            # the union instead (same 8% sketch tolerance)
            F.when(
                F.col("n_intersect") == 0,
                F.abs(est_inter) <= 0.08 * F.col("n_union"),
            )
            .otherwise(
                F.abs(est_inter / F.col("n_intersect") - 1.0) <= 0.15
            )
            .alias("intersect_in_band"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# E16 — exact mode with deterministic tie-break (the distribution trick)
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH dist AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(MIN(CASE WHEN rn = 1 THEN cents END) AS DOUBLE) / 100
         AS mode_value,
       CAST(MIN(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS n_at_mode,
       COUNT(*) AS n_distinct_values
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY cnt DESC, cents) AS rn
  FROM dist)
GROUP BY event_type ORDER BY event_type
"""


@query("agg-mode-exact", oracle=_MODE_ORACLE)
@plan_cached("agg-mode-exact")
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16: EXACT modal value per group with a DETERMINISTIC tie-break
    (smallest value wins) — completing the ordered-set aggregate
    family next to E13's exact median/MAD. Spark ships ``mode()``
    since 3.4, but its tie behavior is unspecified (whichever value
    the hash map yields first) — useless under a hash-compare gate and
    dangerous anywhere reproducibility matters; the distribution
    formulation pins ties by construction.

    The E13 trick makes it scale: ``events.value`` is an exact
    2-decimal quantity, so one scan collapses to the per-(type, cent)
    COUNT distribution (map-side combine absorbs row volume; the
    relation is bounded by the VALUE RANGE at any data size), and the
    mode is one ``min(struct(-count, value))`` aggregate over it — no
    window, no second scan. ``n_distinct_values`` rides the same
    exchange. Exact integer arithmetic end to end; the oracle keeps
    the ROW_NUMBER form so the derivations stay independent."""
    e = load_table(spark, sf_dir, "events")
    dist = e.groupBy(
        "event_type",
        (dec("value") * 100).cast("bigint").alias("cents"),
    ).agg(F.count("*").alias("cnt"))
    return (
        dist.groupBy("event_type")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("nc"), F.col("cents").alias("c")
                )
            ).alias("m"),
            F.count("*").alias("n_distinct_values"),
        )
        .select(
            "event_type",
            (F.col("m.c").cast("double") / 100).alias("mode_value"),
            (-F.col("m.nc")).alias("n_at_mode"),
            "n_distinct_values",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E17 — two-sample Kolmogorov–Smirnov drift statistic (data-QA gate)
# ---------------------------------------------------------------------------

# Split the observed January window into two halves: the "reference"
# period A and the "candidate" period B a production drift monitor
# compares against it.
_KS_SPLIT = "2024-01-16 00:00:00"
# Asymptotic two-sample KS critical coefficient at alpha = 0.05
# (c(alpha) = sqrt(-ln(alpha/2)/2) = 1.3581; Smirnov's approximation —
# public-domain statistics, see e.g. NIST/SEMATECH e-Handbook §1.3.5.16).
_KS_COEFF = 1.3581

_KS_ORACLE = f"""
WITH dist AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         COUNT(*) FILTER (WHERE ts <  TIMESTAMP '{_KS_SPLIT}') AS a_cnt,
         COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{_KS_SPLIT}') AS b_cnt
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
c AS (
  SELECT event_type,
         SUM(a_cnt) OVER (PARTITION BY event_type ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(b_cnt) OVER (PARTITION BY event_type ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cum_b,
         SUM(a_cnt) OVER (PARTITION BY event_type) AS n_a,
         SUM(b_cnt) OVER (PARTITION BY event_type) AS n_b
  FROM dist
)
SELECT event_type,
       CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       FLOOR((MAX(CASE WHEN n_a > 0 AND n_b > 0
                      THEN ABS(CAST(cum_a AS DOUBLE) / n_a
                             - CAST(cum_b AS DOUBLE) / n_b) END)) * 1e9 + 0.5) / 1e9
         AS ks_stat,
       CASE WHEN MAX(n_a) > 0 AND MAX(n_b) > 0
            THEN FLOOR(({_KS_COEFF}
                       * sqrt(CAST(MAX(n_a) + MAX(n_b) AS DOUBLE)
                              / (MAX(n_a) * MAX(n_b)))) * 1e9 + 0.5) / 1e9 END AS ks_crit,
       COALESCE(
         FLOOR((MAX(CASE WHEN n_a > 0 AND n_b > 0
                        THEN ABS(CAST(cum_a AS DOUBLE) / n_a
                               - CAST(cum_b AS DOUBLE) / n_b) END)) * 1e9 + 0.5) / 1e9
           > FLOOR(({_KS_COEFF}
                   * sqrt(CAST(MAX(n_a) + MAX(n_b) AS DOUBLE)
                          / (MAX(n_a) * MAX(n_b)))) * 1e9 + 0.5) / 1e9,
         FALSE) AS drift
FROM c GROUP BY event_type ORDER BY event_type
"""


@query("agg-ks-drift", oracle=_KS_ORACLE)
@plan_cached("agg-ks-drift")
def agg_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17: two-sample Kolmogorov–Smirnov statistic per event type
    between two time windows — the standard nonparametric
    distribution-drift gate a production data-QA layer runs on every
    ingest batch (did this week's `value` distribution move vs the
    reference period?). D = max |ECDF_A - ECDF_B|, compared against the
    alpha=0.05 asymptotic critical value.

    Shape at 100 TB (the E16/E13 "distribution trick"): the raw scan
    collapses to DISTINCT (event_type, value-cents) rows carrying
    per-window counts — bounded by value cardinality, not row count —
    then ONE window partition per event type computes both ECDFs with
    cumulative sums and a final bounded agg takes the sup. No sort of
    raw rows, no per-row shuffle: the exchanges carry the distinct-value
    relation only. The ordering axis is exact integer cents (the
    agg-mode-exact money representation), so cumulative counts are
    tie-free and engine-identical.

    Parity: cumulative and total counts are exact BIGINTs; the two
    ECDF divisions and their difference are IEEE-exact-input double ops
    (deterministic), and both the statistic and the critical value are
    snapped to 9 dp before the flag compare and the hash (sqrt is
    correctly rounded per IEEE-754, the snap is belt-and-braces)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    in_a = (F.col("ts") < _KS_SPLIT).cast("long")
    cents = (
        (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    ).alias("cents")
    dist = (
        e.select("event_type", cents, in_a.alias("in_a"))
        .groupBy("event_type", "cents")
        .agg(
            F.sum("in_a").alias("a_cnt"),
            F.sum(1 - F.col("in_a")).alias("b_cnt"),
        )
    )
    cum = W.partitionBy("event_type").orderBy("cents").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    tot = W.partitionBy("event_type")
    c = dist.select(
        "event_type",
        F.sum("a_cnt").over(cum).alias("cum_a"),
        F.sum("b_cnt").over(cum).alias("cum_b"),
        F.sum("a_cnt").over(tot).alias("n_a"),
        F.sum("b_cnt").over(tot).alias("n_b"),
    )
    # a type whose events fall entirely in ONE window has no second
    # sample — KS is undefined there (statistic/critical value NULL,
    # drift false), and under ANSI mode the unguarded ECDF division
    # would raise DIVIDE_BY_ZERO (caught by the randomized differential
    # test, tests/test_r9_properties.py — the fixture never hits it)
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    d_col = F.when(
        both,
        F.abs(
            F.col("cum_a").cast("double") / F.col("n_a")
            - F.col("cum_b").cast("double") / F.col("n_b")
        ),
    )
    ks = snap(F.max(d_col), 9)
    crit = F.when(
        (F.max("n_a") > 0) & (F.max("n_b") > 0),
        snap(_KS_COEFF
            * F.sqrt(
                (F.max("n_a") + F.max("n_b")).cast("double")
                / (F.max("n_a") * F.max("n_b"))
            ), 9),
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            ks.alias("ks_stat"),
            crit.alias("ks_crit"),
            F.coalesce(ks > crit, F.lit(False)).alias("drift"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E18 — power-of-ten value histogram in exact integer space
# ---------------------------------------------------------------------------

_HIST_ORACLE = """
WITH b AS (
  SELECT event_type,
         LENGTH(CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                     AS VARCHAR)) AS bucket
  FROM events WHERE value IS NOT NULL
),
h AS (
  SELECT event_type, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2
)
SELECT event_type,
       CAST(bucket AS BIGINT) AS bucket,
       FLOOR((POW(10.0, bucket - 1) / 100.0) * 1e9 + 0.5) / 1e9 AS bucket_lo,
       FLOOR((POW(10.0, bucket) / 100.0) * 1e9 + 0.5) / 1e9 AS bucket_hi,
       n,
       FLOOR((CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type)) * 1e9 + 0.5) / 1e9 AS share
FROM h ORDER BY event_type, bucket
"""


@query("agg-hist-logbucket", oracle=_HIST_ORACLE)
@plan_cached("agg-hist-logbucket")
def agg_hist_logbucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18: order-of-magnitude value histogram per event type — the
    log-bucketed distribution profile a 100 TB data-QA sweep keeps per
    column (long-tailed metrics are unreadable in linear buckets, and
    a full exact histogram is unboundedly wide). Bucket = decimal digit
    count of the exact integer cents, i.e. floor(log10)+1 computed in
    INTEGER space: float floor(log10(x)) misassigns values sitting on
    bucket edges (log10(1000.) ULP), digit count cannot.

    Shape: one scan → map-side bucket expression → partial+final hash
    agg on (event_type, bucket) — the agg-hash plan with a derived key,
    ~45 output rows at any scale. The per-type share normalizer is a
    window over the AGGREGATED relation (bucket-count-sized), not the
    raw scan. Parity: buckets and counts are exact integers; share is
    an int/int double division snapped to 9 dp; the bucket bounds are
    pow(10, k) doubles snapped to 9 dp (exact integers well inside
    double precision until k = 15)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.length(
        ((F.col("value").cast("decimal(12,2)") * 100).cast("long")).cast(
            "string"
        )
    )
    h = (
        e.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
    )
    share = snap(F.col("n").cast("double")
        / F.sum("n").over(W.partitionBy("event_type")), 9)
    return h.select(
        "event_type",
        F.col("bucket").cast("long").alias("bucket"),
        snap(F.pow(F.lit(10.0), F.col("bucket") - 1) / 100.0, 9).alias(
            "bucket_lo"
        ),
        snap(F.pow(F.lit(10.0), F.col("bucket")) / 100.0, 9).alias(
            "bucket_hi"
        ),
        "n",
        share.alias("share"),
    ).orderBy("event_type", "bucket")


# ---------------------------------------------------------------------------
# E19 — exact nearest-rank quantiles via the distinct-value distribution
# ---------------------------------------------------------------------------

_QEXACT_ORACLE = """
WITH dist AS (
  SELECT o_orderpriority AS priority, o_totalprice AS price,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT priority, price,
         SUM(cnt) OVER (PARTITION BY priority ORDER BY price
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY priority) AS n
  FROM dist
)
SELECT priority,
       CAST(MAX(n) AS BIGINT) AS n,
       MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN price END) AS p50,
       MIN(CASE WHEN cum >= (90 * n + 99) // 100 THEN price END) AS p90,
       MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN price END) AS p99,
       MIN(price) AS min_price,
       MAX(price) AS max_price
FROM c GROUP BY priority ORDER BY priority
"""


@query("agg-quantile-exact", oracle=_QEXACT_ORACLE)
@plan_cached("agg-quantile-exact")
def agg_quantile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19: EXACT nearest-rank percentiles (p50/p90/p99 of order value
    per priority class) — the deterministic complement of E6's
    approx_percentile: an SLA/billing report needs "the p99 is THIS
    order's price", not an epsilon-band estimate, and nearest-rank
    (smallest value whose cumulative count reaches ceil(q*n)) is the
    definition that always returns an actual data value.

    Shape at 100 TB (the E13/E16/E17 distribution trick): the scan
    collapses map-side to DISTINCT (priority, price) rows with counts —
    bounded by value cardinality, which for money-like columns is far
    below row count — then ONE window partition per priority computes
    the cumulative distribution and a final bounded agg selects the
    target ranks. No global sort of raw rows, no row_number over the
    full table (the naive rank-selection plan), no collect: this is
    exactly how an MPP engine computes exact quantiles when asked to.

    Parity: counts/ranks are exact integers (ceil via the (q*n+99) div
    100 integer identity — no float rank arithmetic); the selected
    quantiles are actual input doubles picked by integer comparison,
    bit-identical in both engines."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    dist = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("price"),
        ).agg(F.count("*").alias("cnt"))
    )
    cum = W.partitionBy("priority").orderBy("price").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = dist.select(
        "priority",
        "price",
        F.sum("cnt").over(cum).alias("cum"),
        F.sum("cnt").over(W.partitionBy("priority")).alias("n"),
    )

    def at(pct: int, alias: str) -> F.Column:
        rank = F.expr(f"({pct} * n + 99) div 100")
        return F.min(F.when(F.col("cum") >= rank, F.col("price"))).alias(alias)

    return (
        c.groupBy("priority")
        .agg(
            F.max("n").cast("long").alias("n"),
            at(50, "p50"),
            at(90, "p90"),
            at(99, "p99"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# E20 — categorical distribution entropy / gini per group
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH cl AS (
  SELECT source, lang, COUNT(*) AS c, SUM(n_chars) AS ch
  FROM documents GROUP BY 1, 2
),
t AS (
  SELECT source, lang, c, ch,
         SUM(c)  OVER (PARTITION BY source) AS n,
         SUM(ch) OVER (PARTITION BY source) AS nch
  FROM cl
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       CAST(-SUM(CAST(FLOOR(((CAST(c AS DOUBLE) / n)
                            * ln(CAST(c AS DOUBLE) / n)) * 1e9 + 0.5) / 1e9
                      AS DECIMAL(18,9))) AS DOUBLE) AS entropy,
       CASE WHEN MAX(nch) > 0 THEN
         CAST(-SUM(CASE WHEN ch > 0 THEN
                     CAST(FLOOR(((CAST(ch AS DOUBLE) / nch)
                                * ln(CAST(ch AS DOUBLE) / nch)) * 1e9 + 0.5) / 1e9
                          AS DECIMAL(18,9))
                   ELSE CAST(0 AS DECIMAL(18,9)) END) AS DOUBLE)
       END AS entropy_chars,
       CAST(1 - SUM(CAST(FLOOR(((CAST(c AS DOUBLE) / n)
                               * (CAST(c AS DOUBLE) / n)) * 1e9 + 0.5) / 1e9
                        AS DECIMAL(18,9))) AS DOUBLE) AS gini,
       FLOOR((CAST(MAX(c) AS DOUBLE) / MAX(n)) * 1e9 + 0.5) / 1e9 AS top_share
FROM t GROUP BY source ORDER BY source
"""


@query("agg-entropy", oracle=_ENTROPY_ORACLE)
@plan_cached("agg-entropy")
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E20: Shannon entropy + Gini impurity of the per-source language
    distribution (doc-count and char-weighted) — the corpus-composition
    diversity profile a curation pipeline tracks per shard/source: a
    source whose language entropy collapses between crawls changed its
    mix, and downstream sampling weights are functions of exactly these
    shares (cf. sample-temperature-weights).

    Shape: one scan → hash agg to (source, lang) counts (bounded by
    |sources|x|langs|, tiny at any data size) → per-source window
    normalizer over the AGGREGATED relation → final bounded agg. The
    raw-row shuffle carries grouping keys only; everything after the
    first agg is cardinality-bounded. The same plan as E18 with an
    information-theoretic reducer.

    Parity: counts are exact integers; each p·ln(p) / p² term is an
    IEEE-exact-input double op snapped to 9 dp and summed in
    DECIMAL(18,9) — exact, order-independent, so the entropy sum cannot
    drift between engines on aggregation order (the tfidf ln
    precedent)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    cl = d.groupBy("source", "lang").agg(
        F.count("*").alias("c"), F.sum("n_chars").alias("ch")
    )
    w = W.partitionBy("source")
    t = cl.select(
        "source",
        "c",
        "ch",
        F.sum("c").over(w).alias("n"),
        F.sum("ch").over(w).alias("nch"),
    )
    p = F.col("c").cast("double") / F.col("n")
    pch = F.col("ch").cast("double") / F.col("nch")

    def snap_dec(col: F.Column) -> F.Column:
        # snap each term then sum as exact DECIMAL so the total is
        # order-independent (the module-level snap, decimal-summed)
        return snap(col, 9).cast("decimal(18,9)")

    return (
        t.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_langs"),
            (-F.sum(snap_dec(p * F.log(p)))).cast("double").alias("entropy"),
            # 0·ln 0 = 0 convention for zero-length-doc langs; a source
            # whose every doc is empty has no char distribution → NULL
            # (the differential harness caught both: ln(0) in DuckDB,
            # ANSI DIVIDE_BY_ZERO in Spark)
            F.when(
                F.max("nch") > 0,
                (
                    -F.sum(
                        F.when(
                            (F.col("ch") > 0) & (F.col("nch") > 0),
                            snap_dec(pch * F.log(pch)),
                        ).otherwise(F.lit(0).cast("decimal(18,9)"))
                    )
                ).cast("double"),
            ).alias("entropy_chars"),
            (1 - F.sum(snap_dec(p * p))).cast("double").alias("gini"),
            snap(F.max("c").cast("double") / F.max("n"), 9).alias(
                "top_share"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E21 — Benford first-digit deviation (data-QA / fraud screening)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) snapped to 12 dp as SHARED LITERALS: both engines
# consume the same constant strings, so the expected shares carry zero
# cross-libm ULP risk (the one place the entropy 9-dp-snap argument
# would otherwise have to cover an output column directly)
import math as _math

_BENFORD_P = {d: f"{_math.log10(1 + 1 / d):.12f}" for d in range(1, 10)}

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items()
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT l_returnflag AS flag,
         CAST(substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                               AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
           AS digit
  FROM lineitem
),
h AS (
  SELECT flag, digit, COUNT(*) AS n_d FROM digits GROUP BY 1, 2
),
t AS (
  SELECT flag, digit, n_d,
         SUM(n_d) OVER (PARTITION BY flag) AS n,
         CASE digit {_BENFORD_CASE} END AS p
  FROM h
)
SELECT flag, digit, n_d,
       FLOOR((CAST(n_d AS DOUBLE) / n) * 1e9 + 0.5) / 1e9 AS share,
       p AS benford_p,
       CAST(SUM(CAST(FLOOR((POW(n_d - n * p, 2) / (n * p)) * 1e9 + 0.5) / 1e9
                     AS DECIMAL(28,9)))
            OVER (PARTITION BY flag) AS DOUBLE) AS chi2
FROM t ORDER BY flag, digit
"""


@query("agg-benford-digit", oracle=_BENFORD_ORACLE)
@plan_cached("agg-benford-digit")
def agg_benford_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E21: first-significant-digit distribution vs Benford's law per
    return flag, with the χ² deviation statistic — the classic
    fabricated-data / corruption screen a data-QA layer runs on every
    money column (organically generated amounts follow
    P(d)=log10(1+1/d); synthetic or truncated feeds don't).

    Shape (the E13/E17/E18 family): digit extraction happens in EXACT
    integer space (first char of the integer-cents string — float
    log10-based extraction misassigns edge values by ULP), the scan
    collapses map-side to ≤ flags×9 rows, and the χ² window runs over
    that aggregated relation. ~27 output rows at any data size.

    Parity: expected shares are SHARED 12-dp literal constants (both
    engines consume the same strings — no cross-libm log10), counts
    are exact integers, each χ² term is snapped to 9 dp and summed in
    DECIMAL(28,9) (order-independent), shares are one int/int IEEE
    division snapped to 9 dp."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    digit = F.substring(
        ((F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("string"),
        1,
        1,
    ).cast("long")
    h = (
        li.select(F.col("l_returnflag").alias("flag"), digit.alias("digit"))
        .groupBy("flag", "digit")
        .agg(F.count("*").alias("n_d"))
    )
    wf = W.partitionBy("flag")
    p = F.expr(f"CASE digit {_BENFORD_CASE} END")
    t = h.select(
        "flag",
        "digit",
        "n_d",
        F.sum("n_d").over(wf).alias("n"),
        p.alias("p"),
    )
    term = snap(F.pow(F.col("n_d") - F.col("n") * F.col("p"), 2)
        / (F.col("n") * F.col("p")), 9).cast("decimal(28,9)")
    return t.select(
        "flag",
        "digit",
        "n_d",
        snap(F.col("n_d").cast("double") / F.col("n"), 9).alias("share"),
        F.col("p").alias("benford_p"),
        F.sum(term).over(wf).cast("double").alias("chi2"),
    ).orderBy("flag", "digit")


# ---------------------------------------------------------------------------
# E22 — exact distinct via 64-bit bitmap words (the roaring-bitmap pattern)
# ---------------------------------------------------------------------------

# 62 bits per word: bit 62 would need shiftleft(1,63) whose sign
# behavior is the one place the two engines' BIGINT shifts could
# diverge — a 62-bit word keeps every set bit strictly positive in
# both. (id DIV 62, id % 62) is still a bijection for the non-negative
# id contract the tables carry, so the count stays EXACT.
_BITMAP_WORD_BITS = 62

_BITMAP_ORACLE = f"""
WITH w AS (
  SELECT event_type,
         user_id // {_BITMAP_WORD_BITS} AS bucket,
         bit_or(CAST(1 AS BIGINT)
                << CAST(user_id % {_BITMAP_WORD_BITS} AS INT)) AS word
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(bit_count(word)) AS BIGINT) AS n_users_bitmap,
       COUNT(*) AS n_words,
       (SELECT COUNT(DISTINCT user_id) FROM events e
        WHERE e.event_type = w.event_type) AS n_users_exact,
       CAST(SUM(bit_count(word)) AS BIGINT)
         = (SELECT COUNT(DISTINCT user_id) FROM events e
            WHERE e.event_type = w.event_type) AS bitmap_matches
FROM w GROUP BY event_type ORDER BY event_type
"""


@query("agg-distinct-bitmap", oracle=_BITMAP_ORACLE)
@plan_cached("agg-distinct-bitmap")
def agg_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22: EXACT distinct-user count per event type via 64-bit bitmap
    words — the roaring-bitmap / ClickHouse ``groupBitmap`` pattern for
    exact COUNT(DISTINCT dense_id) at scale. Each (type, id DIV 62)
    group OR-folds one BIGINT word whose bit (id % 62) marks presence;
    popcount-summing the words is the distinct count.

    Why this beats the stock distinct at 100 TB: COUNT(DISTINCT)
    shuffles every distinct (type, user) PAIR to the final aggregate;
    the bitmap shuffles at most distinct_ids/62 8-byte words per type —
    a 62× reduction on the wire for dense id spaces — and bit_or is
    associative/commutative, so the partial (map-side) aggregate
    collapses each input split's contribution to one word per bucket
    before the exchange. Both aggregations are plain two-phase hash
    aggs; no sketch error bars (vs E3's HLL).

    The ``n_users_exact`` / ``bitmap_matches`` audit columns are
    test-scale scaffolding (the E15 precedent): they pin
    bitmap == exact on every run; a deployment drops them.

    Parity: every value is BIGINT bit arithmetic — bit-identical by
    construction. Word size 62 keeps set bits positive in both
    engines' signed BIGINT shift."""
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr(f"user_id DIV {_BITMAP_WORD_BITS}").alias("bucket"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(user_id % {_BITMAP_WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bit_or("bit").alias("word"))
    )
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users_exact"))
    )
    per_type = words.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_users_bitmap"),
        F.count("*").alias("n_words"),
    )
    return (
        per_type.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_users_bitmap",
            "n_words",
            "n_users_exact",
            (F.col("n_users_bitmap") == F.col("n_users_exact")).alias(
                "bitmap_matches"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E23 — two-proportion z-test per conversion metric (experiment readout)
# ---------------------------------------------------------------------------

# |z| threshold for alpha = 0.05 two-sided, as a SHARED literal (the
# Benford-constant discipline: both engines compare against the same
# string, zero cross-libm risk from an inverse-normal call)
_ZTEST_CRIT = "1.959963985"

# The pooled two-proportion z statistic over EXACT integer counts
# (xa, na, xb, nb). Every division is CAST(... AS DOUBLE)/...: bare
# literals are DECIMAL in both engines with DIFFERENT division scales
# (measured: 0.53982486 vs 0.539818112 on the same inputs) — all-double
# arithmetic is IEEE-identical. Snapped to 9 dp; the significance flag
# compares the SNAPPED z so both engines branch on the same value.
_ZTEST_Z = f"""CASE WHEN na > 0 AND nb > 0
     AND (xa + xb) > 0 AND (xa + xb) < (na + nb) THEN
  FLOOR(((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
    / SQRT((CAST(xa + xb AS DOUBLE) / (na + nb))
           * (CAST(na + nb - xa - xb AS DOUBLE) / (na + nb))
           * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))) * 1e9 + 0.5) / 1e9
  END"""

_ZTEST_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id,
         {MD5_PREFIX60_SQL.format(x='CAST(user_id AS VARCHAR)')} % 2 AS v
  FROM events
),
pop AS (
  SELECT CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM u
),
conv AS (
  SELECT e.event_type AS metric,
         CAST(COUNT(DISTINCT CASE WHEN u.v = 0 THEN e.user_id END)
              AS BIGINT) AS xa,
         CAST(COUNT(DISTINCT CASE WHEN u.v = 1 THEN e.user_id END)
              AS BIGINT) AS xb
  FROM events e JOIN u ON u.user_id = e.user_id
  GROUP BY e.event_type
),
t AS (SELECT metric, xa, na, xb, nb FROM conv CROSS JOIN pop)
SELECT metric, xa, na, xb, nb,
       CASE WHEN na > 0 THEN FLOOR((CAST(xa AS DOUBLE) / na) * 1e9 + 0.5) / 1e9 END AS p_a,
       CASE WHEN nb > 0 THEN FLOOR((CAST(xb AS DOUBLE) / nb) * 1e9 + 0.5) / 1e9 END AS p_b,
       {_ZTEST_Z} AS z,
       COALESCE(abs({_ZTEST_Z}) > CAST({_ZTEST_CRIT} AS DOUBLE),
                FALSE) AS significant
FROM t ORDER BY metric
"""


@query("agg-proportion-ztest", oracle=_ZTEST_ORACLE)
@plan_cached("agg-proportion-ztest")
def agg_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E23: pooled two-proportion z-test per conversion metric — the
    A/B experiment readout (did variant A's users convert at a
    different rate than B's?). Users are deterministically split 50/50
    by the shared md5-prefix-60 key hash (the sample-hash-stratified
    idiom — any engine, any run, same assignment); each event type is
    one conversion metric: x = distinct converting users, n = variant
    population.

    Shape at 100 TB: the variant is a PURE FUNCTION of user_id (the
    md5-prefix hash), so it is computed MAP-SIDE on both paths — the
    r15 form joined raw events against a distinct-user relation just
    to attach v, which shuffled every event row through a join for a
    value each row could derive itself (r16, guide §2.4: the join is
    deleted outright; SortMergeJoin gone, 6 scans → 4 and 6 Exchange
    → 5 in the formatted plan — neutral wall time at sf0.1, one fewer
    raw-event shuffle at scale). ONE distinct over
    (event_type, user_id) collapses map-side; the per-variant
    population is a 2-value relation broadcast to the 5-row metric
    table.

    Parity: counts are exact BIGINTs; z is one compound all-double
    expression (every division CAST AS DOUBLE — bare literals are
    DECIMAL with engine-specific division scales, the measured
    hazard), snapped to 9 dp; the significance flag branches on the
    SNAPPED z against a shared literal critical value. Degenerate
    windows (empty variant, all-or-none conversion → zero pooled
    variance) yield NULL z / FALSE flag in both engines."""
    ev = load_table(spark, sf_dir, "events")
    v_expr = F.pmod(
        md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
    ).alias("v")
    u = ev.select("user_id").distinct().select("user_id", v_expr)
    pop = u.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    conv = (
        ev.select("event_type", "user_id", v_expr)
        .groupBy(F.col("event_type").alias("metric"))
        .agg(
            F.countDistinct(
                F.when(F.col("v") == 0, F.col("user_id"))
            )
            .cast("long")
            .alias("xa"),
            F.countDistinct(
                F.when(F.col("v") == 1, F.col("user_id"))
            )
            .cast("long")
            .alias("xb"),
        )
    )
    t = conv.crossJoin(F.broadcast(pop))
    return t.select(
        "metric",
        "xa",
        "na",
        "xb",
        "nb",
        F.when(
            F.col("na") > 0,
            snap(F.col("xa").cast("double") / F.col("na"), 9),
        ).alias("p_a"),
        F.when(
            F.col("nb") > 0,
            snap(F.col("xb").cast("double") / F.col("nb"), 9),
        ).alias("p_b"),
        F.expr(_ZTEST_Z).alias("z"),
        F.coalesce(
            F.abs(F.expr(_ZTEST_Z))
            > F.expr(f"CAST({_ZTEST_CRIT} AS DOUBLE)"),
            F.lit(False),
        ).alias("significant"),
    ).orderBy("metric")


# ---------------------------------------------------------------------------
# E24 — per-group OLS trend (slope / intercept / r²) from exact moments
# ---------------------------------------------------------------------------

# Moments are BIGINT-exact; the cross products n·Σxy, Σx·Σy etc. are
# computed in DECIMAL(38,0) — exact integer arithmetic with ~10^38
# headroom (BIGINT would overflow near n·Σxy ≈ 10^18 at bench scale
# already). Only the final slope / intercept / r² are IEEE doubles,
# each one division (or one product-of-two-doubles) snapped to 9 dp.
_OLS_D38 = "DECIMAL(38,0)"

_OLS_ORACLE = f"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(x) AS {_OLS_D38}) AS sx,
         CAST(SUM(y) AS {_OLS_D38}) AS sy,
         CAST(SUM(x * y) AS {_OLS_D38}) AS sxy,
         CAST(SUM(x * x) AS {_OLS_D38}) AS sxx,
         CAST(SUM(y * y) AS {_OLS_D38}) AS syy
  FROM e GROUP BY event_type
),
d AS (
  SELECT event_type, n, sx, sy,
         CAST(n AS {_OLS_D38}) * sxy - sx * sy AS cxy,
         CAST(n AS {_OLS_D38}) * sxx - sx * sx AS cxx,
         CAST(n AS {_OLS_D38}) * syy - sy * sy AS cyy
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 2 AND cxx > 0 THEN
         FLOOR((CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE)) * 1e9 + 0.5)
           / 1e9 END AS slope,
       CASE WHEN n >= 2 AND cxx > 0 THEN
         FLOOR(((CAST(sy AS DOUBLE) - (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
                * CAST(sx AS DOUBLE)) / n) * 1e9 + 0.5) / 1e9 END AS intercept,
       CASE WHEN n >= 2 AND cxx > 0 AND cyy > 0 THEN
         FLOOR(((CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
               * (CAST(cxy AS DOUBLE) / CAST(cyy AS DOUBLE))) * 1e9 + 0.5)
           / 1e9 END AS r2
FROM d ORDER BY event_type
"""


@query("agg-ols-trend", oracle=_OLS_ORACLE)
@plan_cached("agg-ols-trend")
def agg_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E24: simple linear regression per event type — value (cents)
    against day number: slope (cents/day), intercept and r² — the
    metric-trend readout a monitoring layer computes per series
    ("is average spend drifting?"). Equivalent to SQL's
    REGR_SLOPE/REGR_R2, re-derived from raw moments because the
    built-ins accumulate in floating point with engine-specific
    order (not oracle-comparable) — and the moment form is also the
    scalable one: ONE map-side-partial hash aggregate collapses any
    row count to 6 numbers per group; no second pass, no sort.

    Parity: x (days) and y (cents) are exact integers; the five
    moments are exact integer sums; the centered cross products
    n·Σxy − ΣxΣy etc. are DECIMAL(38,0) exact (BIGINT would overflow
    ~10^18 at bench scale); slope / intercept / r² are all-double
    expressions over those exact values snapped to 9 dp, with
    degenerate groups (n < 2, zero x-variance, constant y) → NULL.
    r² is computed as (cxy/cxx)·(cxy/cyy) — two exact-operand
    divisions and one product — NOT pow(corr, 2), keeping every
    intermediate a deterministic IEEE op on identical operands."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("x"),
            (dec("value") * 100).cast("long").alias("y"),
        )
    )
    d38 = lambda c: c.cast(_OLS_D38.lower())  # noqa: E731
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast(_OLS_D38.lower()).alias("sx"),
        F.sum("y").cast(_OLS_D38.lower()).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(_OLS_D38.lower()).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(_OLS_D38.lower()).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(_OLS_D38.lower()).alias("syy"),
    )
    n38 = d38(F.col("n"))
    d = m.select(
        "event_type",
        "n",
        "sx",
        "sy",
        (n38 * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cxy"),
        (n38 * F.col("sxx") - F.col("sx") * F.col("sx")).alias("cxx"),
        (n38 * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
    )
    ok = (F.col("n") >= 2) & (F.col("cxx") > 0)
    slope = F.col("cxy").cast("double") / F.col("cxx").cast("double")

    # snap9: floor(x*1e9 + 0.5)/1e9 as a TEXTUAL IEEE sequence instead
    # of library ROUND. The engines' round(double, 9) implementations
    # disagree on tie-adjacent values (Spark: HALF_UP over the
    # shortest-decimal representation; DuckDB: multiply-based) — the
    # randomized differential caught an n=8 intercept whose eighths
    # terminate exactly on the 9-dp tie (…5465 → 547 vs 546). With the
    # identical multiply/add/floor/divide sequence in both engines the
    # snapped bits cannot diverge, whatever the tie convention.
    snap9 = lambda c: F.floor(c * 1e9 + 0.5) / 1e9  # noqa: E731
    return d.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.when(ok, snap9(slope)).alias("slope"),
        F.when(
            ok,
            snap9(
                (
                    F.col("sy").cast("double")
                    - slope * F.col("sx").cast("double")
                )
                / F.col("n")
            ),
        ).alias("intercept"),
        F.when(
            ok & (F.col("cyy") > 0),
            snap9(
                slope
                * (
                    F.col("cxy").cast("double")
                    / F.col("cyy").cast("double")
                )
            ),
        ).alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E25 — signup→purchase conversion lag (rate + exact lag percentiles)
# ---------------------------------------------------------------------------

_CONVLAG_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS ts0
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) - MAX(s.ts0) AS lag_us
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.ts0
  GROUP BY e.user_id
),
h AS (
  SELECT lag_us, COUNT(*) AS n_d FROM c GROUP BY lag_us
),
cdf AS (
  SELECT lag_us,
         SUM(n_d) OVER (ORDER BY lag_us) AS cum,
         SUM(n_d) OVER () AS n
  FROM h
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM c) AS n_converted,
       CASE WHEN (SELECT COUNT(*) FROM s) > 0 THEN
         FLOOR((CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
               / (SELECT COUNT(*) FROM s)) * 1e9 + 0.5) / 1e9 END AS conversion_rate,
       (SELECT MIN(lag_us) FROM cdf
        WHERE cum >= (50 * n + 99) // 100) AS p50_lag_us,
       (SELECT MIN(lag_us) FROM cdf
        WHERE cum >= (90 * n + 99) // 100) AS p90_lag_us
"""


@query("agg-conversion-lag", oracle=_CONVLAG_ORACLE)
@plan_cached("agg-conversion-lag")
def agg_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E25: signup→purchase conversion — rate plus EXACT nearest-rank
    p50/p90 of the time-to-convert, the activation-funnel readout
    growth teams track ("half our converts do it within X hours").
    A user converts at their first purchase AT OR AFTER their first
    signup; earlier purchases don't count (the funnel is ordered).

    Shape: per-user firsts collapse map-side (min over (user, type)),
    the ordering constraint is one window-free LEFT join on user_id
    (non-converts carry a NULL lag into a sentinel bucket), and the
    lag percentiles ride the E19 distribution trick — the CDF window
    runs over the DISTINCT-lag relation (bounded by value
    cardinality), never the raw rows; no global sort. The whole
    readout — n_signup, n_converted, rate AND both percentiles — is
    derived from that ONE bucket histogram (r9 rework): the first cut
    computed the counts as separate aggregates over the unmaterialized
    signup/convert relations, and Catalyst re-ran the corpus scans and
    the user join once per consumer (the E27/K5 re-execution class) —
    two corpus slices are now scanned exactly once each.

    Parity: timestamps are exact epoch-microsecond integers, the rank
    thresholds use the (q·n+99) div 100 integer-ceil identity, picked
    percentiles are actual input values selected by integer compare
    (the -1 non-convert sentinel is excluded by the bucket >= 0
    guard — real lags are >= 0 by the funnel ordering), and the rate
    is one snapped division."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("ts0"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("tp")
    )
    per_user = (
        s.join(p, "user_id", "left")
        .groupBy("user_id")
        .agg(
            (
                F.min(F.when(F.col("tp") >= F.col("ts0"), F.col("tp")))
                - F.max("ts0")
            ).alias("lag_us")
        )
    )
    h = per_user.groupBy(
        F.coalesce(F.col("lag_us"), F.lit(-1)).alias("bucket")
    ).agg(F.count("*").alias("n_d"))
    from pyspark.sql import Window as W

    conv = F.when(F.col("bucket") >= 0, F.col("n_d")).otherwise(F.lit(0))
    wcum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cdf = h.select(
        "bucket",
        F.sum(conv).over(wcum).alias("cum"),
        F.sum("n_d").over(wall).alias("n_signup"),
        F.sum(conv).over(wall).alias("n_conv"),
    )
    pick = lambda q: F.min(  # noqa: E731
        F.when(
            (F.col("bucket") >= 0)
            & (F.col("cum") >= F.expr(f"({q} * n_conv + 99) DIV 100")),
            F.col("bucket"),
        )
    )
    return cdf.agg(
        F.coalesce(F.max("n_signup"), F.lit(0)).alias("n_signup"),
        F.coalesce(F.max("n_conv"), F.lit(0)).alias("n_converted"),
        pick(50).alias("p50_lag_us"),
        pick(90).alias("p90_lag_us"),
    ).select(
        "n_signup",
        "n_converted",
        F.when(
            F.col("n_signup") > 0,
            snap(F.col("n_converted").cast("double") / F.col("n_signup"), 9),
        ).alias("conversion_rate"),
        "p50_lag_us",
        "p90_lag_us",
    )


# ---------------------------------------------------------------------------
# E26 — event-type transition matrix (first-order Markov estimate)
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id)
           AS prev_type
  FROM events
),
t AS (
  SELECT COALESCE(prev_type, '_START') AS prev_type,
         event_type AS next_type,
         COUNT(*) AS n
  FROM o GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       FLOOR((CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY prev_type)) * 1e9 + 0.5) / 1e9 AS p
FROM t ORDER BY prev_type, next_type
"""


@query("agg-markov-transitions", oracle=_MARKOV_ORACLE)
@plan_cached("agg-markov-transitions")
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E26: first-order Markov transition matrix over per-user event
    sequences — P(next event type | previous event type), with a
    synthetic ``_START`` state for each user's first event. The
    session-flow model behind "what do users do after an error?",
    next-action prediction baselines, and bot detection (bots have
    degenerate transition rows).

    Shape: one lag window per user (the F12 exchange+sort contract)
    collapses immediately into a (prev, next) hash aggregate — output
    is ≤ (types+1)×types rows at ANY corpus size; the probability
    normalizer is a window over that aggregated relation (the E21
    discipline).

    Parity: the (ts_us, event_id) total order pins lag() on timestamp
    ties; counts are exact; each probability is one snapped division
    of exact integers."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    o = ev.select(
        "event_type",
        F.coalesce(F.lag("event_type").over(w), F.lit("_START")).alias(
            "prev_type"
        ),
    )
    t = (
        o.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    wp = W.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        snap(F.col("n").cast("double") / F.sum("n").over(wp), 9).alias("p"),
    ).orderBy("prev_type", "next_type")


# ---------------------------------------------------------------------------
# E27 — CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

_CUPED_CUT = "2024-01-16 00:00:00"

_CUPED_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
              THEN CAST(value AS DECIMAL(12,2)) END), 0) * 100
              AS DECIMAL(18,0)) AS xc,
         CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
              THEN CAST(value AS DECIMAL(12,2)) END), 0) * 100
              AS DECIMAL(18,0)) AS yc
  FROM events GROUP BY user_id
),
v AS (
  SELECT {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2
           AS variant,
         COUNT(*) AS n_users,
         SUM(xc) AS sxv,
         SUM(yc) AS syv,
         SUM(xc * yc) AS sxyv,
         SUM(xc * xc) AS sxxv,
         SUM(yc * yc) AS syyv
  FROM per_user
  GROUP BY {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2
),
g AS (
  SELECT variant, n_users,
         CAST(CAST(sxv AS DECIMAL(38,0)) AS BIGINT) AS sum_x_cents,
         CAST(CAST(syv AS DECIMAL(38,0)) AS BIGINT) AS sum_y_cents,
         CAST(SUM(n_users) OVER () AS DOUBLE) AS n,
         CAST(SUM(sxv) OVER () AS DOUBLE) AS sx,
         CAST(SUM(syv) OVER () AS DOUBLE) AS sy,
         CAST(SUM(sxyv) OVER () AS DOUBLE) AS sxy,
         CAST(SUM(sxxv) OVER () AS DOUBLE) AS sxx,
         CAST(SUM(syyv) OVER () AS DOUBLE) AS syy
  FROM v
)
SELECT variant, n_users, sum_x_cents, sum_y_cents,
       FLOOR(((CAST(sum_y_cents AS DOUBLE) / n_users) / 100)
             * 1e9 + 0.5) / 1e9 AS mean_y,
       FLOOR(((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0))
             * 1e9 + 0.5) / 1e9 AS theta,
       FLOOR((((CAST(sum_y_cents AS DOUBLE) / n_users)
              - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0))
                * ((CAST(sum_x_cents AS DOUBLE) / n_users) - (sx / n)))
             / 100) * 1e9 + 0.5) / 1e9 AS mean_y_cuped,
       FLOOR((((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0))
             * 1e9 + 0.5) / 1e9 AS var_reduction
FROM g
ORDER BY variant
"""


@query("agg-cuped", oracle=_CUPED_ORACLE)
@plan_cached("agg-cuped")
def agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E27: CUPED variance-reduced experiment readout (Deng et al.,
    WSDM'13 — the adjustment every large experimentation platform
    applies before reading an A/B test): per-user pre-period spend X
    (days before Jan 16) de-noises the post-period metric Y via
    Y' = Y - theta (X - mean X), theta = cov(X,Y)/var(X) pooled across
    variants. Emits per-variant raw vs adjusted means, theta, and the
    theoretical variance-reduction factor rho^2.

    Shape at 100 TB: ONE corpus scan, one corpus shuffle (groupBy
    user_id folds pre and post sums in a single pass via conditional
    aggregation); the moments (n, sum X, sum Y, sum XY, sum X^2,
    sum Y^2) are aggregated PER VARIANT over the per-user relation and
    the pooled globals come from a window-sum over that 2-row relation
    — the mergeable-partials trick (E10), so the per-user subtree is
    consumed exactly once (a naive global-moments + per-variant pair
    of aggregates makes Catalyst re-run the corpus scan and user
    shuffle twice — plan-pinned against regression). No second pass
    over the log, no driver collect. The pooled window is UNPARTITIONED
    by construction — it runs over the |variants|-row relation (2 rows
    here, never more than the experiment's arm count), so the WindowExec
    single-partition warning it triggers is about metadata, not data.

    Parity: per-user sums are exact DECIMAL cents (DECIMAL(18,0)), the
    cross moments are exact DECIMAL(38,0) sums of 36-digit products —
    order-independent in both engines; every global moment is then cast
    ONCE to double (correctly rounded, identical), and theta / the
    adjusted means / rho^2 are computed with the same textual operation
    order in both engines, so the IEEE sequences match bit for bit
    before the 9-dp snap. The uncentered moment formula loses digits to
    cancellation when means dwarf variances (at extreme scale compute
    centered second moments in a second pass over the per-user
    relation, same shape); fine at any realistic spend scale and
    engine-identical regardless.
    """
    e = load_table(spark, sf_dir, "events")
    cut = F.to_timestamp(F.lit(_CUPED_CUT))
    cents = "decimal(18,0)"
    per_user = e.groupBy("user_id").agg(
        (
            F.coalesce(
                F.sum(F.when(F.col("ts") < cut, dec("value"))), F.lit(0)
            )
            * 100
        )
        .cast(cents)
        .alias("xc"),
        (
            F.coalesce(
                F.sum(F.when(F.col("ts") >= cut, dec("value"))), F.lit(0)
            )
            * 100
        )
        .cast(cents)
        .alias("yc"),
    )
    # variant = the shared md5-prefix-60 user hash mod 2 (the E29 SRM
    # gate / E23 z-test split — a readout must run on the split its
    # gate validated)
    v = per_user.groupBy(
        F.pmod(
            md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("variant")
    ).agg(
        F.count("*").alias("n_users"),
        F.sum("xc").alias("sxv"),
        F.sum("yc").alias("syv"),
        F.sum(F.col("xc") * F.col("yc")).alias("sxyv"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxxv"),
        F.sum(F.col("yc") * F.col("yc")).alias("syyv"),
    )
    from pyspark.sql import Window as W

    wg = W.partitionBy()
    j = v.select(
        "variant",
        "n_users",
        F.col("sxv").cast("decimal(38,0)").cast("long").alias("sum_x_cents"),
        F.col("syv").cast("decimal(38,0)").cast("long").alias("sum_y_cents"),
        F.sum("n_users").over(wg).cast("double").alias("n"),
        F.sum("sxv").over(wg).cast("double").alias("sx"),
        F.sum("syv").over(wg).cast("double").alias("sy"),
        F.sum("sxyv").over(wg).cast("double").alias("sxy"),
        F.sum("sxxv").over(wg).cast("double").alias("sxx"),
        F.sum("syyv").over(wg).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # a degenerate covariate (constant X — e.g. a single user, or no
    # pre-period at all) has no defined theta: NULL, not a 0/0 NaN
    theta = num / F.nullif(den_x, F.lit(0.0))
    mean_y_d = F.col("sum_y_cents").cast("double") / F.col("n_users")
    mean_x_d = F.col("sum_x_cents").cast("double") / F.col("n_users")
    # snap via floor(x*1e9 + 0.5)/1e9 — the OLS tie-regression remedy:
    # library ROUNDs (Spark HALF_UP vs DuckDB multiply-based) disagree
    # on tie-adjacent doubles; the floor sequence is the same IEEE ops
    # in both engines
    snap9 = lambda col: F.floor(col * 1e9 + 0.5) / 1e9  # noqa: E731
    return j.select(
        "variant",
        "n_users",
        "sum_x_cents",
        "sum_y_cents",
        snap9(mean_y_d / 100).alias("mean_y"),
        snap9(theta).alias("theta"),
        snap9(
            (mean_y_d - theta * (mean_x_d - F.col("sx") / F.col("n"))) / 100
        ).alias("mean_y_cuped"),
        snap9(
            num * num / F.nullif(den_x * den_y, F.lit(0.0))
        ).alias("var_reduction"),
    ).orderBy("variant")


# ---------------------------------------------------------------------------
# E28 — exact ROC-AUC via the rank-sum (Mann-Whitney) identity
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
WITH ex AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE event_type IN ('purchase', 'click')
    AND value IS NOT NULL
),
b AS (
  SELECT score,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(1 - y) AS BIGINT) AS neg
  FROM ex GROUP BY score
),
c AS (
  SELECT score, pos, neg,
         COALESCE(SUM(neg) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS neg_below,
         SUM(pos) OVER () AS n_pos,
         SUM(neg) OVER () AS n_neg
  FROM b
)
SELECT CAST(MAX(n_pos) AS BIGINT) AS n_pos,
       CAST(MAX(n_neg) AS BIGINT) AS n_neg,
       CAST(SUM(CASE WHEN pos > 0 AND neg > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tied_scores,
       CASE WHEN MAX(n_pos) > 0 AND MAX(n_neg) > 0 THEN
         FLOOR((CAST(SUM(2 * neg_below * pos + pos * neg) AS DOUBLE)
                / (2.0 * MAX(n_pos) * MAX(n_neg))) * 1e9 + 0.5) / 1e9
       END AS auc,
       CASE WHEN MAX(n_pos) > 0 AND MAX(n_neg) > 0 THEN
         FLOOR(((CAST(SUM(2 * neg_below * pos + pos * neg) AS DOUBLE)
                / (1.0 * MAX(n_pos) * MAX(n_neg))) - 1.0) * 1e9 + 0.5) / 1e9
       END AS gini
FROM c
"""


@query("agg-auc-rank", oracle=_AUC_ORACLE)
@plan_cached("agg-auc-rank")
def agg_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E28: EXACT ROC-AUC of a score column against a binary outcome
    via the rank-sum identity (Mann-Whitney U; Hanley & McNeil 1982) —
    model evaluation AS A QUERY, the complement of the langid confusion
    matrix (I55) for continuous scorers: every model-in-the-loop
    curation pipeline (quality scorer, spam classifier, relevance
    ranker) reads AUC after retraining, and at corpus scale it has to
    be computed BY THE ENGINE, not by scikit on a driver sample. Here
    the fixture asks "does event value discriminate purchases from
    clicks"; a deployment swaps the score/label projections.

    Tie-exact formulation: examples collapse to per-SCORE (pos, neg)
    buckets — bounded by value cardinality, never row count (the E19
    distribution trick) — and AUC = sum(2 x neg_below x pos +
    pos x neg) / (2 x n_pos x n_neg): the pos x neg term IS the
    tied-pair half-credit doubled into integer space, so U2 is an
    exact BIGINT and AUC is ONE double division. gini = 2 AUC - 1
    computed from the same exact operands.

    Shape at 100 TB: one filtered scan collapsing map-side into score
    buckets, one bounded window pass over the bucket relation for the
    exclusive below-count and the class totals, one final aggregate —
    no per-row ranks, no global sort of examples. Degenerate single-
    class inputs yield NULL AUC in both engines.

    Parity: all counts exact integers; the division's operands are
    bit-identical; the snap is the floor(x*1e9 + 0.5)/1e9 textual
    sequence (the OLS tie-regression remedy — library ROUNDs disagree
    on tie-adjacent values and AUC over small cohorts is exactly the
    small-denominator rational that lands on ties)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    # NULL scores must not form a bucket: Spark windows sort NULLs
    # FIRST, DuckDB ORDER BY sorts them LAST, so a NULL score bucket
    # would land at opposite ends of the two engines' cumulatives and
    # diverge neg_below — a scoreless example carries no ranking
    # information anyway (the Welch/Gini NULL-guard discipline).
    ex = e.filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    ).select(
        (dec("value") * 100).cast("long").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    b = ex.groupBy("score").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(1 - F.col("y")).cast("long").alias("neg"),
    )
    wbelow = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = b.select(
        "score",
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(wbelow), F.lit(0)).alias("neg_below"),
        F.sum("pos").over(wall).alias("n_pos"),
        F.sum("neg").over(wall).alias("n_neg"),
    )
    u2 = F.sum(
        2 * F.col("neg_below") * F.col("pos") + F.col("pos") * F.col("neg")
    )
    np_, nn = F.max("n_pos"), F.max("n_neg")
    snap9 = lambda col: F.floor(col * 1e9 + 0.5) / 1e9  # noqa: E731
    have_both = (np_ > 0) & (nn > 0)
    return c.agg(
        np_.cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        F.sum(((F.col("pos") > 0) & (F.col("neg") > 0)).cast("int"))
        .cast("long")
        .alias("n_tied_scores"),
        F.when(
            have_both,
            snap9(u2.cast("double") / (2.0 * np_ * nn)),
        ).alias("auc"),
        F.when(
            have_both,
            snap9(u2.cast("double") / (1.0 * np_ * nn) - 1.0),
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# E29 — sample-ratio-mismatch gate (experiment assignment health)
# ---------------------------------------------------------------------------

# chi-square df=1 critical value at p=0.05, shared literal (E23 style)
_SRM_CRIT = "3.841458821"

_SRM_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id,
         {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2
           AS variant
  FROM events
),
c AS (
  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1
  FROM u
)
SELECT n0, n1,
       CASE WHEN n0 + n1 > 0 THEN
         FLOOR((CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1))
               * 1e9 + 0.5) / 1e9 END AS chi2,
       CASE WHEN n0 + n1 > 0 THEN
         FLOOR((CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1))
               * 1e9 + 0.5) / 1e9 > {_SRM_CRIT}
       END AS srm_detected
FROM c
"""


@query("agg-srm-check", oracle=_SRM_ORACLE)
@plan_cached("agg-srm-check")
def agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E29: sample-ratio-mismatch gate — the trust check every
    experimentation platform runs BEFORE reading any A/B result
    (Fabijan et al. 2019): if the 50/50 assignment's observed split is
    chi-square-improbable, the experiment is corrupted (bot filtering,
    logging loss, redirect bias) and E23's z-test / E27's CUPED
    readout must not be believed. Completes the experiment-health
    triptych: SRM gate -> z-test -> CUPED.

    For two cells against a 50/50 expectation the chi-square statistic
    collapses algebraically to (n0 - n1)^2 / n — an exact-integer
    ratio, ONE double division. Assignment uses the shared
    md5-prefix-60 user hash (the E23/I18 contract, engine-exact).

    Shape at 100 TB: one DISTINCT over (user, variant) collapsing
    map-side (the variant is a pure function of user_id, so the
    distinct is really over users), then a 2-cell conditional count —
    nothing else moves. Parity: exact counts; the statistic snaps via
    the floor(x*1e9 + 0.5)/1e9 textual sequence and the flag branches
    on the SNAPPED value against the shared critical literal (E23
    discipline)."""
    e = load_table(spark, sf_dir, "events")
    u = e.select(
        "user_id",
        F.pmod(
            md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("variant"),
    ).distinct()
    c = u.agg(
        F.sum((F.col("variant") == 0).cast("int")).cast("long").alias("n0"),
        F.sum((F.col("variant") == 1).cast("int")).cast("long").alias("n1"),
    )
    n = F.col("n0") + F.col("n1")
    diff = F.col("n0") - F.col("n1")
    chi2 = (
        F.floor((diff * diff).cast("double") / n * 1e9 + 0.5) / 1e9
    )
    return c.select(
        "n0",
        "n1",
        F.when(n > 0, chi2).alias("chi2"),
        F.when(n > 0, chi2 > float(_SRM_CRIT)).alias("srm_detected"),
    )


# ---------------------------------------------------------------------------
# E30 — Welch two-sample t-test on per-user spend (unequal variances)
# ---------------------------------------------------------------------------

# Large-sample two-sided 5% critical value (N(0,1) 97.5th percentile).
# Welch df at bench scale is ~population-sized, where t ≈ z; the flag
# documents this convention — small-cohort callers compare t against
# their own t-table using the emitted df.
_WT_CRIT = "1.959963985"

# Shared textual fragments — interpolated VERBATIM into the DuckDB
# oracle and the Spark selectExpr chain so every double op runs the
# identical IEEE sequence in both engines (the CUPED/OLS discipline).
# Operands n{i} are BIGINT, c{i} DECIMAL(38,0)-exact centered sums.
_WT_V0 = "CAST(c0 AS DOUBLE) / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0))"
_WT_V1 = "CAST(c1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))"
_WT_T = (
    "(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / SQRT(a0 + a1)"
)
_WT_DF = (
    "((a0 + a1) * (a0 + a1))"
    " / (a0 * a0 / (CAST(n0 AS DOUBLE) - 1.0)"
    " + a1 * a1 / (CAST(n1 AS DOUBLE) - 1.0))"
)
_WT_OK = "n0 >= 2 AND n1 >= 2 AND a0 + a1 > 0"

_WELCH_ORACLE = f"""
WITH per_user AS (
  SELECT {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2
           AS v,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
m AS (
  SELECT
    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN yc END), 0)
         AS DECIMAL(38,0)) AS s0,
    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN yc END), 0)
         AS DECIMAL(38,0)) AS s1,
    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN yc * yc END), 0)
         AS DECIMAL(38,0)) AS q0,
    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN yc * yc END), 0)
         AS DECIMAL(38,0)) AS q1
  FROM per_user
),
c AS (
  SELECT *,
         CAST(n0 AS DECIMAL(38,0)) * q0 - s0 * s0 AS c0,
         CAST(n1 AS DECIMAL(38,0)) * q1 - s1 * s1 AS c1
  FROM m
),
vv AS (
  SELECT *,
         CASE WHEN n0 >= 2 THEN {_WT_V0} END AS v0,
         CASE WHEN n1 >= 2 THEN {_WT_V1} END AS v1
  FROM c
),
aa AS (
  SELECT *, v0 / CAST(n0 AS DOUBLE) AS a0, v1 / CAST(n1 AS DOUBLE) AS a1
  FROM vv
)
SELECT n0, n1,
  CASE WHEN n0 >= 1 THEN FLOOR((CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
       / 100.0) * 1e9 + 0.5) / 1e9 END AS mean_0,
  CASE WHEN n1 >= 1 THEN FLOOR((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       / 100.0) * 1e9 + 0.5) / 1e9 END AS mean_1,
  CASE WHEN {_WT_OK} THEN
    FLOOR(({_WT_T}) * 1e9 + 0.5) / 1e9 END AS t_welch,
  CASE WHEN {_WT_OK} THEN
    FLOOR(({_WT_DF}) * 1e9 + 0.5) / 1e9 END AS df_welch,
  COALESCE(ABS(CASE WHEN {_WT_OK} THEN
    FLOOR(({_WT_T}) * 1e9 + 0.5) / 1e9 END)
    > CAST({_WT_CRIT} AS DOUBLE), FALSE) AS significant
FROM aa
"""


@query("agg-welch-ttest", oracle=_WELCH_ORACLE)
@plan_cached("agg-welch-ttest")
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E30: Welch two-sample t-test on per-user TOTAL spend between
    the two hash variants — the means test that closes the experiment
    readout family: SRM (E29) gates assignment health, the z-test
    (E23) reads conversion proportions, CUPED (E27) de-noises the
    metric, and Welch answers "did average spend per user move?"
    without the equal-variance assumption Student's t needs (variant
    populations routinely have unequal spend variance — that is WHY
    platforms default to Welch; Welch 1947).

    Shape at 100 TB: one corpus shuffle to the per-user relation
    (map-side-combinable conditional sums), then ONE one-row
    conditional aggregate collapses any user count to six numbers
    (n, Σy, Σy² per variant); the statistic is driver-free arithmetic
    on that row. No second scan, no broadcast beyond the one-row
    relation.

    Parity: per-user cents are exact BIGINTs; the centered sums
    n·Σy² − (Σy)² are DECIMAL(38,0)-exact (the OLS discipline); every
    double expression — variance, SE terms, t, Welch–Satterthwaite df
    — is a shared textual fragment interpolated verbatim into BOTH
    engines' SQL, each division over exact-valued operands, snapped
    via the floor(x·1e9+0.5)/1e9 sequence. Degenerate cohorts (either
    variant < 2 users, zero pooled variance) → NULL t/df and a FALSE
    flag in both engines; the flag branches on the SNAPPED t against
    the shared critical literal (large-sample convention, documented
    at _WT_CRIT)."""
    ev = load_table(spark, sf_dir, "events")
    # variant = the ONE shared md5-prefix-60 user hash mod 2 — the
    # SAME split the SRM gate (E29) validates and the z-test (E23)
    # reads; a readout on a different split than its gate is the bug
    # class SRM exists to catch.
    pu = ev.groupBy("user_id").agg(
        F.coalesce((F.sum(dec("value")) * 100).cast("long"), F.lit(0))
        .alias("yc")
    ).select(
        F.pmod(
            md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("v"),
        "yc",
    )
    d38 = "decimal(38,0)"
    m = pu.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(F.sum(F.when(F.col("v") == 0, F.col("yc"))), F.lit(0))
        .cast(d38)
        .alias("s0"),
        F.coalesce(F.sum(F.when(F.col("v") == 1, F.col("yc"))), F.lit(0))
        .cast(d38)
        .alias("s1"),
        F.coalesce(
            F.sum(F.when(F.col("v") == 0, F.col("yc") * F.col("yc"))),
            F.lit(0),
        )
        .cast(d38)
        .alias("q0"),
        F.coalesce(
            F.sum(F.when(F.col("v") == 1, F.col("yc") * F.col("yc"))),
            F.lit(0),
        )
        .cast(d38)
        .alias("q1"),
    )
    c = m.withColumns(
        {
            "c0": F.expr("CAST(n0 AS DECIMAL(38,0)) * q0 - s0 * s0"),
            "c1": F.expr("CAST(n1 AS DECIMAL(38,0)) * q1 - s1 * s1"),
        }
    )
    vv = c.withColumns(
        {
            "v0": F.expr(f"CASE WHEN n0 >= 2 THEN {_WT_V0} END"),
            "v1": F.expr(f"CASE WHEN n1 >= 2 THEN {_WT_V1} END"),
        }
    )
    aa = vv.withColumns(
        {
            "a0": F.expr("v0 / CAST(n0 AS DOUBLE)"),
            "a1": F.expr("v1 / CAST(n1 AS DOUBLE)"),
        }
    )
    return aa.selectExpr(
        "n0",
        "n1",
        "CASE WHEN n0 >= 1 THEN FLOOR((CAST(s0 AS DOUBLE)"
        " / CAST(n0 AS DOUBLE) / 100.0) * 1e9 + 0.5) / 1e9 END AS mean_0",
        "CASE WHEN n1 >= 1 THEN FLOOR((CAST(s1 AS DOUBLE)"
        " / CAST(n1 AS DOUBLE) / 100.0) * 1e9 + 0.5) / 1e9 END AS mean_1",
        f"CASE WHEN {_WT_OK} THEN"
        f" FLOOR(({_WT_T}) * 1e9 + 0.5) / 1e9 END AS t_welch",
        f"CASE WHEN {_WT_OK} THEN"
        f" FLOOR(({_WT_DF}) * 1e9 + 0.5) / 1e9 END AS df_welch",
        f"COALESCE(ABS(CASE WHEN {_WT_OK} THEN"
        f" FLOOR(({_WT_T}) * 1e9 + 0.5) / 1e9 END)"
        f" > CAST({_WT_CRIT} AS DOUBLE), FALSE) AS significant",
    )


# ---------------------------------------------------------------------------
# E31 — chi-square test of independence (time-of-day × event type)
# ---------------------------------------------------------------------------

_CHI_US_6H = 6 * 3600 * 1_000_000
_CHI_US_1D = 86400 * 1_000_000

# Shared double fragments (verbatim in both engines). Operands: o, r, c,
# n BIGINT exact; rc/num/den DECIMAL(38,0)-exact products. The expected
# count and the standardized residual reuse the same textual sub-terms.
_CHI_EXP = "CAST(rc AS DOUBLE) / CAST(n AS DOUBLE)"
_CHI_CONTRIB = "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
_CHI_STDRES = (
    "(CAST(o AS DOUBLE) - CAST(rc AS DOUBLE) / CAST(n AS DOUBLE))"
    " / SQRT((CAST(rc AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))"
)
_CHI_STDRES_OK = "r < n AND c < n"

_CHISQ_ORACLE = f"""
WITH e AS (
  SELECT CAST((epoch_us(ts) % {_CHI_US_1D}) // {_CHI_US_6H} AS BIGINT)
           AS bucket,
         event_type
  FROM events
),
obs AS (
  SELECT bucket, event_type, CAST(COUNT(*) AS BIGINT) AS o
  FROM e GROUP BY 1, 2
),
cells AS (
  SELECT b.bucket, t.event_type, COALESCE(obs.o, 0) AS o
  FROM (SELECT DISTINCT bucket FROM obs) b
  CROSS JOIN (SELECT DISTINCT event_type FROM obs) t
  LEFT JOIN obs ON obs.bucket = b.bucket
              AND obs.event_type = t.event_type
),
dims AS (
  SELECT CAST(COUNT(DISTINCT bucket) AS BIGINT) AS nb,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ne
  FROM obs
),
tot AS (
  SELECT bucket, event_type, o,
         SUM(o) OVER (PARTITION BY bucket) AS r,
         SUM(o) OVER (PARTITION BY event_type) AS c,
         SUM(o) OVER () AS n,
         nb, ne
  FROM cells CROSS JOIN dims
),
x AS (
  SELECT bucket, event_type, o, r, c, n, nb, ne,
         CAST(r AS DECIMAL(38,0)) * c AS rc,
         (CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c)
           * (CAST(n AS DECIMAL(38,0)) * o
              - CAST(r AS DECIMAL(38,0)) * c) AS num,
         CAST(n AS DECIMAL(38,0)) * r * c AS den
  FROM tot
),
y AS (
  SELECT *,
         FLOOR(({_CHI_CONTRIB}) * 1e9 + 0.5) AS contrib_i9
  FROM x
)
SELECT bucket, event_type, o AS observed,
       FLOOR(({_CHI_EXP}) * 1e9 + 0.5) / 1e9 AS expected,
       contrib_i9 / 1e9 AS contribution,
       CASE WHEN {_CHI_STDRES_OK} THEN
         FLOOR(({_CHI_STDRES}) * 1e9 + 0.5) / 1e9 END AS std_residual,
       COALESCE(ABS(CASE WHEN {_CHI_STDRES_OK} THEN
         FLOOR(({_CHI_STDRES}) * 1e9 + 0.5) / 1e9 END) > 2.0, FALSE)
         AS cell_flag,
       CAST(SUM(CAST(contrib_i9 AS DECIMAL(18,0))) OVER () AS DOUBLE)
         / 1e9 AS chi2_total,
       CAST((nb - 1) * (ne - 1) AS BIGINT) AS df
FROM y
ORDER BY bucket, event_type
"""


@query("agg-chisq-independence", oracle=_CHISQ_ORACLE)
# NOT @plan_cached (r16, verdict item 1): the build runs an eager
# localCheckpoint barrier — per-invocation work a plan-cache hit
# would silently skip (result caching, not plan caching).
def agg_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E31: Pearson chi-square test of independence over the
    time-of-day × event-type contingency table — "does the event mix
    depend on when users are active?", the categorical-association
    readout that complements the continuous tests (Welch E30, z E23):
    segment × outcome, device × conversion, source × language are the
    same query with different projections. Emits the full analyst
    view: every cell with observed, expected, chi-square contribution
    and its standardized (adjusted) residual — the per-cell signal
    that localizes WHICH cells drive dependence (|stdres| > 2) — plus
    the exact chi-square total and degrees of freedom on every row;
    callers compare chi2_total against the critical value for df.

    Shape at 100 TB: the time bucket is exact integer arithmetic on
    epoch µs fused into the scan (the G10 contract); ONE hash
    aggregate collapses the corpus to |buckets|×|types| observed
    cells; the zero-cell completion cross-joins two DISTINCT
    relations of that bounded table (a proper contingency table
    includes empty cells — their expected counts still contribute);
    margins come from windows over the CELL relation. Nothing after
    the first aggregate touches raw rows.

    Parity: counts and margins are exact BIGINTs; n·O − R·C and its
    square are DECIMAL(38,0)-exact (n·O ~ 1e10 at bench scale already
    overflows the square in BIGINT); each cell's contribution is
    snapped to an INTEGER-VALUED double (floor(x·1e9+0.5), < 2^53),
    cast losslessly to DECIMAL(18,0) and summed exactly — the total
    is order-independent (the E20 entropy mechanism, tie-safe via the
    floor-snap). The residual's guard (R<n and C<n) NULLs the cells
    where the adjusted denominator degenerates (single-row or
    single-column tables) in both engines."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.expr(
            f"(unix_micros(ts) % {_CHI_US_1D}) DIV {_CHI_US_6H}"
        ).alias("bucket"),
        "event_type",
    )
    # obs is |buckets|x|types|-bounded at ANY corpus size and is
    # consumed FOUR ways below (bucket dim, type dim, the completion
    # join, the df dims) — materialize it once so the corpus hash agg
    # runs once, not once per consumer (the r11 scan-census catch:
    # the lazy form re-executed the events scan 4x; with AQE stage
    # reuse it still re-ran the final agg + four stage schedules,
    # measured 1.17 vs 0.68 s/invocation at sf0.1). The barrier is
    # per-invocation eager work, which is why this key is NOT
    # @plan_cached (r16).
    obs = (
        e.groupBy("bucket", "event_type")
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=True)
    )
    b = obs.select("bucket").distinct()
    t = obs.select("event_type").distinct()
    cells = (
        b.crossJoin(t)
        # obs is |buckets|x|types|-bounded at ANY corpus size:
        # broadcast it so the zero-cell completion never shuffles
        .join(F.broadcast(obs), ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce(F.col("o"), F.lit(0).cast("long")).alias("o"),
        )
    )
    from pyspark.sql import Window as W

    dims = obs.agg(
        F.countDistinct("bucket").cast("long").alias("nb"),
        F.countDistinct("event_type").cast("long").alias("ne"),
    )
    wb = W.partitionBy("bucket")
    we = W.partitionBy("event_type")
    wall = W.partitionBy()
    tot = cells.select(
        "bucket",
        "event_type",
        "o",
        F.sum("o").over(wb).alias("r"),
        F.sum("o").over(we).alias("c"),
        F.sum("o").over(wall).alias("n"),
    ).crossJoin(F.broadcast(dims))
    x = tot.withColumns(
        {
            "rc": F.expr("CAST(r AS DECIMAL(38,0)) * c"),
            "num": F.expr(
                "(CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0))"
                " * c) * (CAST(n AS DECIMAL(38,0)) * o"
                " - CAST(r AS DECIMAL(38,0)) * c)"
            ),
            "den": F.expr("CAST(n AS DECIMAL(38,0)) * r * c"),
        }
    )
    y = x.withColumn(
        "contrib_i9", F.expr(f"FLOOR(({_CHI_CONTRIB}) * 1e9 + 0.5)")
    )
    return y.selectExpr(
        "bucket",
        "event_type",
        "o AS observed",
        f"FLOOR(({_CHI_EXP}) * 1e9 + 0.5) / 1e9 AS expected",
        "contrib_i9 / 1e9 AS contribution",
        f"CASE WHEN {_CHI_STDRES_OK} THEN"
        f" FLOOR(({_CHI_STDRES}) * 1e9 + 0.5) / 1e9 END AS std_residual",
        f"COALESCE(ABS(CASE WHEN {_CHI_STDRES_OK} THEN"
        f" FLOOR(({_CHI_STDRES}) * 1e9 + 0.5) / 1e9 END) > 2.0, FALSE)"
        " AS cell_flag",
        "CAST(SUM(CAST(contrib_i9 AS DECIMAL(18,0)))"
        " OVER (PARTITION BY 1) AS DOUBLE) / 1e9 AS chi2_total",
        "CAST((nb - 1) * (ne - 1) AS BIGINT) AS df",
    ).orderBy("bucket", "event_type")


# ---------------------------------------------------------------------------
# E32 — Gini coefficient of per-user spend (+ top-decile share)
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
r AS (
  SELECT yc,
         ROW_NUMBER() OVER (ORDER BY yc, user_id) AS i,
         ROW_NUMBER() OVER (ORDER BY yc DESC, user_id DESC) AS j,
         COUNT(*) OVER () AS nn
  FROM per_user
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(yc), 0) AS DECIMAL(38,0)) AS t,
         CAST(COALESCE(SUM(CAST(i AS DECIMAL(38,0)) * yc), 0)
              AS DECIMAL(38,0)) AS siy,
         CAST(COALESCE(SUM(CASE WHEN j <= (nn + 9) // 10
                                THEN yc END), 0) AS DECIMAL(38,0)) AS topd
  FROM r
)
SELECT n AS n_users,
       CAST(t AS BIGINT) AS total_cents,
       CAST((n + 9) // 10 AS BIGINT) AS top_decile_users,
       CASE WHEN t > 0 THEN
         FLOOR((CAST(2 * siy - (CAST(n AS DECIMAL(38,0)) + 1) * t
                     AS DOUBLE)
                / CAST(CAST(n AS DECIMAL(38,0)) * t AS DOUBLE))
               * 1e9 + 0.5) / 1e9 END AS gini,
       CASE WHEN t > 0 THEN
         FLOOR((CAST(topd AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9 + 0.5)
           / 1e9 END AS top_decile_share
FROM m
"""


@query("agg-gini-coefficient", oracle=_GINI_ORACLE)
@plan_cached("agg-gini-coefficient")
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E32: Gini coefficient of the per-user spend distribution plus
    the top-decile revenue share — the concentration readout every
    marketplace/ads/usage pipeline reports ("how whale-dominated is
    revenue?") and, in corpus curation, the same query over per-domain
    document counts answers "is the crawl one giant host?". Uses the
    sorted-rank identity G = (2·Σi·y_(i) − (n+1)·T)/(n·T) — exact on
    ties because equal values contribute the same regardless of their
    order within a tie run (the rank tiebreak on user_id merely makes
    each engine's row numbering deterministic).

    Parity: per-user cents exact BIGINTs; rank products accumulate in
    DECIMAL(38,0) (i·y ~ 1e11 already at bench scale, and the sum is
    n× that); both output ratios are ONE double division over exact
    operands, snapped floor(x·1e9+0.5)/1e9; an all-zero-spend
    population (T = 0) → NULL ratios in both engines. The top decile
    is the exact integer ceil(n/10) by descending rank.

    Shape at 100 TB — the E13/E19 DISTRIBUTION trick, not a sort of
    users: the per-user relation collapses map-side to DISTINCT
    (cents, count) rows — bounded by VALUE cardinality (fixed-precision
    cents), never user count — and the rank-sum over a tie run is
    closed-form: a value v occupying ranks B+1..B+c (B = users with
    smaller spend) contributes v·(c·B + c(c+1)/2) to Σi·y, so one
    cumulative-count window over the distribution relation replaces
    the user-cardinality ROW_NUMBER sort entirely (the result is
    identical BY CONSTRUCTION — ties contribute the same under any
    within-tie order, which is also why the oracle can keep the
    textbook ROW_NUMBER form as an independent derivation). The top
    decile is the same arithmetic from above: a value with A richer
    users contributes min(c, k−A) of its users to the top-k cut.
    One corpus shuffle to per-user, one value-bounded hash agg, one
    window over the ~|distinct cents| relation, one one-row aggregate
    — no user-cardinality sort anywhere (plan-pinned: no row_number
    in this plan). Per-segment Ginis add the segment to the groupBy
    and the window PARTITION BY; same shape."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.coalesce((F.sum(dec("value")) * 100).cast("long"), F.lit(0))
        .alias("yc")
    )
    dist = pu.groupBy("yc").agg(F.count("*").cast("long").alias("c"))
    wbelow = W.orderBy("yc").rowsBetween(W.unboundedPreceding, -1)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    d = dist.select(
        "yc",
        "c",
        F.coalesce(F.sum("c").over(wbelow), F.lit(0)).alias("b"),
        F.sum("c").over(wall).alias("nn"),
    )
    d38 = "decimal(38,0)"
    m = d.selectExpr(
        "yc",
        "c",
        "b",
        "nn",
        # ranks B+1..B+c of a tie run, summed: c*B + c*(c+1)/2 —
        # c*(c+1) is even so DIV 2 is exact; DECIMAL(38,0) before the
        # value multiply (i*y ~ 1e11 at bench scale, summed n× that)
        "CAST(yc AS DECIMAL(38,0))"
        " * (CAST(c AS DECIMAL(38,0)) * b + CAST(c AS DECIMAL(38,0))"
        "    * (c + 1) / 2) AS siy_term",
        # users richer than this value: A = nn - b - c; the top-k cut
        # k = ceil(nn/10) takes min(c, k - A) users from this run
        "CAST(yc AS DECIMAL(38,0))"
        " * GREATEST(CAST(0 AS BIGINT),"
        "            LEAST(c, (nn + 9) DIV 10 - (nn - b - c)))"
        " AS topd_term",
    ).agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum(F.expr("CAST(yc AS DECIMAL(38,0)) * c")), F.lit(0))
        .cast(d38)
        .alias("t"),
        F.coalesce(F.sum("siy_term"), F.lit(0)).cast(d38).alias("siy"),
        F.coalesce(F.sum("topd_term"), F.lit(0)).cast(d38).alias("topd"),
    )
    return m.selectExpr(
        "n AS n_users",
        "CAST(t AS BIGINT) AS total_cents",
        "CAST((n + 9) DIV 10 AS BIGINT) AS top_decile_users",
        "CASE WHEN t > 0 THEN"
        " FLOOR((CAST(2 * siy - (CAST(n AS DECIMAL(38,0)) + 1) * t"
        " AS DOUBLE)"
        " / CAST(CAST(n AS DECIMAL(38,0)) * t AS DOUBLE))"
        " * 1e9 + 0.5) / 1e9 END AS gini",
        "CASE WHEN t > 0 THEN"
        " FLOOR((CAST(topd AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9 + 0.5)"
        " / 1e9 END AS top_decile_share",
    )


# ---------------------------------------------------------------------------
# E33 — Herfindahl–Hirschman revenue concentration per market segment
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS yc
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT c_mktsegment AS segment, yc
  FROM rev JOIN customer ON o_custkey = c_custkey
),
m AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(yc) AS DECIMAL(38,0)) AS t,
         CAST(SUM(CAST(yc AS DECIMAL(38,0)) * yc) AS DECIMAL(38,0)) AS q,
         CAST(MAX(yc) AS DECIMAL(38,0)) AS mx
  FROM seg GROUP BY segment
)
SELECT segment, n_customers,
       CAST(t AS BIGINT) AS total_cents,
       CASE WHEN t > 0 THEN
         FLOOR((CAST(q AS DOUBLE) / CAST(t * t AS DOUBLE)) * 1e9 + 0.5)
           / 1e9 END AS hhi,
       CASE WHEN q > 0 THEN
         FLOOR((CAST(t * t AS DOUBLE) / CAST(q AS DOUBLE)) * 1e9 + 0.5)
           / 1e9 END AS effective_n,
       CASE WHEN t > 0 THEN
         FLOOR((CAST(mx AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9 + 0.5)
           / 1e9 END AS top_share
FROM m ORDER BY segment
"""


@query("agg-hhi-concentration", oracle=_HHI_ORACLE)
@plan_cached("agg-hhi-concentration")
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E33: Herfindahl–Hirschman index of revenue concentration per
    market segment — HHI = Σ shareᵢ², the antitrust-standard
    concentration number, plus its reciprocal (the "effective number
    of customers" — 20 equal customers reads 20, one whale reads ~1)
    and the top-customer share. E32's Gini ranks the whole curve;
    HHI is the sort-free moment version — the one you compute when
    the population is too big to sort — and over per-source document
    masses it is the curation "effective number of sources" check.

    Sort-free exactness: HHI = Σy²/T² needs only the second moment,
    so the whole statistic is two map-side-combinable sums per group:
    y in exact cents (o_totalprice is the one full-precision-double
    money column — rounded through DECIMAL(18,2) per the parity
    contract), Σy·y accumulated in DECIMAL(38,0) (y² ~ 1e14 per
    customer, summed ×|customers|), T² as an exact DECIMAL product;
    each output ratio is ONE double division snapped via
    floor(x·1e9+0.5)/1e9; empty/zero segments → NULL.

    Shape at 100 TB: orders collapse to (custkey, cents) map-side
    before ANY join; the segment attach is a key-shuffle join of two
    already-aggregated relations (never raw orders against customer),
    then a |segments|-bounded aggregate. No sort anywhere — compare
    E32's docstring for when that matters."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                "long"
            )
        )
        .cast("long")
        .alias("yc")
    )
    seg = rev.join(
        c.select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_mktsegment").alias("segment"),
        ),
        "o_custkey",
    )
    d38 = "decimal(38,0)"
    m = seg.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("yc").cast(d38).alias("t"),
        F.sum(F.col("yc").cast(d38) * F.col("yc")).cast(d38).alias("q"),
        F.max("yc").cast(d38).alias("mx"),
    )
    return m.selectExpr(
        "segment",
        "n_customers",
        "CAST(t AS BIGINT) AS total_cents",
        "CASE WHEN t > 0 THEN"
        " FLOOR((CAST(q AS DOUBLE) / CAST(t * t AS DOUBLE)) * 1e9 + 0.5)"
        " / 1e9 END AS hhi",
        "CASE WHEN q > 0 THEN"
        " FLOOR((CAST(t * t AS DOUBLE) / CAST(q AS DOUBLE)) * 1e9 + 0.5)"
        " / 1e9 END AS effective_n",
        "CASE WHEN t > 0 THEN"
        " FLOOR((CAST(mx AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9 + 0.5)"
        " / 1e9 END AS top_share",
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# E34 — daily new-vs-returning actives + cumulative distinct users
# ---------------------------------------------------------------------------

_NVR_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
fd AS (
  SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
),
daily AS (
  SELECT ud.day,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(CASE WHEN ud.day = fd.first_day THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new
  FROM ud JOIN fd ON ud.user_id = fd.user_id
  GROUP BY ud.day
)
SELECT day, n_active, n_new,
       n_active - n_new AS n_returning,
       CAST(SUM(n_new) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM daily ORDER BY day
"""


@query("agg-new-vs-returning", oracle=_NVR_ORACLE)
@plan_cached("agg-new-vs-returning")
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E34: the growth-accounting daily split — per day, active users
    partitioned into NEW (first-ever activity today) vs RETURNING,
    plus the running cumulative distinct-user count. The cumulative
    distinct is the trick: COUNT(DISTINCT) over an expanding window
    re-scans history per day, but "distinct users through day d" IS
    the running sum of daily new-user counts — each user counts
    exactly once, on their first day.

    Shape at 100 TB: events collapse map-side to DISTINCT (user, day)
    — bounded by users x active-days, absorbing per-user event volume
    before any exchange; first-day is one min-groupBy over that
    relation (re-using its shuffle key); the day rollup is bounded by
    the calendar, and the cumulative window runs over the DAY-bounded
    relation (never user- or event-cardinality — the E19 discipline).
    Exact integers end to end; day = epoch_us div 86400000000 (the
    G10 integer-bucket contract, UTC-pinned)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).distinct()
    fd = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        ud.join(fd, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .cast("long")
            .alias("n_new"),
        )
    )
    wcum = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new").over(wcum).cast("long").alias("cum_users"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# E35 — day-of-week seasonality index per event type
# ---------------------------------------------------------------------------

_DOW_ORACLE = """
WITH e AS (
  SELECT event_type,
         (CAST(epoch_us(ts) // 86400000000 AS BIGINT) + 4) % 7 AS dow,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
),
cell AS (
  SELECT event_type, dow,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS DECIMAL(38,0)) AS s
  FROM e GROUP BY event_type, dow
),
tot AS (
  SELECT *,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS nt,
         CAST(SUM(s) OVER (PARTITION BY event_type) AS DECIMAL(38,0))
           AS st
  FROM cell
)
SELECT event_type, dow, n, CAST(s AS BIGINT) AS sum_cents,
       FLOOR((CAST(n AS DOUBLE) * 7.0 / CAST(nt AS DOUBLE))
             * 1e9 + 0.5) / 1e9 AS volume_index,
       CASE WHEN st > 0 THEN
         FLOOR(((CAST(s AS DOUBLE) * CAST(nt AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(st AS DOUBLE)))
               * 1e9 + 0.5) / 1e9 END AS value_index
FROM tot ORDER BY event_type, dow
"""


@query("agg-seasonality-dow", oracle=_DOW_ORACLE)
@plan_cached("agg-seasonality-dow")
def agg_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E35: day-of-week seasonality profile per event type — the
    volume index (share of events on this weekday x 7; 1.0 = flat) and
    the value index (avg spend this weekday / overall avg; 1.0 = no
    weekday effect) every ops/forecasting dashboard normalizes by
    before comparing a Monday to a Saturday. dow = (epoch_day + 4) % 7
    with 0 = Sunday — the G10 integer contract, shared verbatim.

    Shape at 100 TB: one scan collapsing map-side into <= types x 7
    cells (the agg-hash plan with a derived key); the normalizer
    windows run over the aggregated cell relation (E21 discipline).
    Counts and cent sums exact; each index is ONE all-double
    expression over exact operands, snapped floor(x*1e9+0.5)/1e9; a
    zero-spend type yields NULL value_index in both engines."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    cell = (
        e.select(
            "event_type",
            ((F.expr("unix_micros(ts) div 86400000000") + 4) % 7).alias(
                "dow"
            ),
            (dec("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "dow")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast(d38).alias("s"),
        )
    )
    wt = W.partitionBy("event_type")
    tot = cell.select(
        "event_type",
        "dow",
        "n",
        "s",
        F.sum("n").over(wt).cast("long").alias("nt"),
        F.sum("s").over(wt).cast(d38).alias("st"),
    )
    return tot.selectExpr(
        "event_type",
        "dow",
        "n",
        "CAST(s AS BIGINT) AS sum_cents",
        "FLOOR((CAST(n AS DOUBLE) * 7.0 / CAST(nt AS DOUBLE))"
        " * 1e9 + 0.5) / 1e9 AS volume_index",
        "CASE WHEN st > 0 THEN"
        " FLOOR(((CAST(s AS DOUBLE) * CAST(nt AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(st AS DOUBLE)))"
        " * 1e9 + 0.5) / 1e9 END AS value_index",
    ).orderBy("event_type", "dow")


# ---------------------------------------------------------------------------
# E36 — experiment power / minimum-detectable-effect calculator
# ---------------------------------------------------------------------------

# shared literals: two-sided alpha=.05 and 80%-power normal quantiles
_PWR_ZA = "1.959963985"
_PWR_ZB = "0.841621234"
_PWR_TARGET_REL = "0.10"  # planning target: 10% relative lift

_POWER_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2
           AS variant,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(COALESCE(SUM(CASE WHEN variant = 0 THEN conv END), 0)
              AS BIGINT) AS x0,
         CAST(COALESCE(SUM(CASE WHEN variant = 1 THEN conv END), 0)
              AS BIGINT) AS x1
  FROM u
),
p AS (
  SELECT *,
         CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS pbar,
         (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) / 2.0 AS n_arm
  FROM m WHERE n0 + n1 > 0
)
SELECT n0, n1, x0, x1,
       FLOOR(pbar * 1e9 + 0.5) / 1e9 AS pooled_rate,
       CASE WHEN pbar > 0 AND pbar < 1 AND n_arm > 0 THEN
         FLOOR((({_PWR_ZA} + {_PWR_ZB})
                * SQRT(2.0 * pbar * (1.0 - pbar) / n_arm))
               * 1e9 + 0.5) / 1e9 END AS mde_abs,
       CASE WHEN pbar > 0 AND pbar < 1 AND n_arm > 0 THEN
         FLOOR(((({_PWR_ZA} + {_PWR_ZB})
                 * SQRT(2.0 * pbar * (1.0 - pbar) / n_arm)) / pbar)
               * 1e9 + 0.5) / 1e9 END AS mde_rel,
       CASE WHEN pbar > 0 AND pbar < 1 THEN
         CAST(CEIL(FLOOR((2.0 * pbar * (1.0 - pbar)
                * ({_PWR_ZA} + {_PWR_ZB}) * ({_PWR_ZA} + {_PWR_ZB})
                / (({_PWR_TARGET_REL} * pbar)
                   * ({_PWR_TARGET_REL} * pbar)))
               * 1e9 + 0.5) / 1e9) AS BIGINT) END AS n_per_arm_required
FROM p
"""


@query("agg-power-mde", oracle=_POWER_ORACLE)
@plan_cached("agg-power-mde")
def agg_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E36: experiment power planning AS A QUERY — the two numbers a
    platform computes before (and while) running an A/B test: the
    minimum detectable effect at the CURRENT sample size (absolute and
    relative, two-sided alpha = 5%, power = 80%) and the per-arm sample
    size REQUIRED to detect a 10% relative lift — the standard normal-
    approximation formulas (n = 2*p(1-p)*(z_a+z_b)^2 / delta^2) over the
    pooled conversion rate. Completes the experiment family: SRM (E29)
    gates assignment, this sizes the test, z (E23) / Welch (E30) /
    CUPED (E27) read it — all on the ONE shared md5-prefix-60 split.

    Parity: counts exact integers off one per-user map-side collapse;
    every double expression is shared verbatim (divisions cast, sqrt is
    IEEE-correctly-rounded so cross-engine-exact, z quantiles shared
    literals), snapped floor(x*1e9+0.5)/1e9; the required-n CEIL is
    taken on the SNAPPED value so the integer boundary is engine-safe;
    degenerate rates (0 or 1) -> NULLs both engines.

    Shape at 100 TB: one corpus shuffle to the per-user relation, one
    one-row conditional aggregate, driver-free arithmetic on that row."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    ).select(
        F.pmod(
            md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("variant"),
        "conv",
    )
    m = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(F.sum(F.when(F.col("variant") == 0, F.col("conv"))), F.lit(0))
        .cast("long")
        .alias("x0"),
        F.coalesce(F.sum(F.when(F.col("variant") == 1, F.col("conv"))), F.lit(0))
        .cast("long")
        .alias("x1"),
    )
    p = m.filter(F.expr("n0 + n1 > 0")).withColumns(
        {
            "pbar": F.expr(
                "CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)"
            ),
            "n_arm": F.expr(
                "(CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) / 2.0"
            ),
        }
    )
    return p.selectExpr(
        "n0",
        "n1",
        "x0",
        "x1",
        "FLOOR(pbar * 1e9 + 0.5) / 1e9 AS pooled_rate",
        f"CASE WHEN pbar > 0 AND pbar < 1 AND n_arm > 0 THEN"
        f" FLOOR((({_PWR_ZA} + {_PWR_ZB})"
        f" * SQRT(2.0 * pbar * (1.0 - pbar) / n_arm))"
        f" * 1e9 + 0.5) / 1e9 END AS mde_abs",
        f"CASE WHEN pbar > 0 AND pbar < 1 AND n_arm > 0 THEN"
        f" FLOOR(((({_PWR_ZA} + {_PWR_ZB})"
        f" * SQRT(2.0 * pbar * (1.0 - pbar) / n_arm)) / pbar)"
        f" * 1e9 + 0.5) / 1e9 END AS mde_rel",
        f"CASE WHEN pbar > 0 AND pbar < 1 THEN"
        f" CAST(CEIL(FLOOR((2.0 * pbar * (1.0 - pbar)"
        f" * ({_PWR_ZA} + {_PWR_ZB}) * ({_PWR_ZA} + {_PWR_ZB})"
        f" / (({_PWR_TARGET_REL} * pbar)"
        f" * ({_PWR_TARGET_REL} * pbar)))"
        f" * 1e9 + 0.5) / 1e9) AS BIGINT) END AS n_per_arm_required",
    )


# ---------------------------------------------------------------------------
# E37 — Spearman rank correlation (tie-exact, from value distributions)
# ---------------------------------------------------------------------------

_SPEAR_ORACLE = """
WITH rows_ AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS xv,
         CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS yv
  FROM lineitem
),
dx AS (
  SELECT xv, COUNT(*) AS c,
         COALESCE(SUM(COUNT(*)) OVER (ORDER BY xv
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
  FROM rows_ GROUP BY xv
),
dy AS (
  SELECT yv, COUNT(*) AS c,
         COALESCE(SUM(COUNT(*)) OVER (ORDER BY yv
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
  FROM rows_ GROUP BY yv
),
rk AS (
  SELECT CAST(2 * dx.b + dx.c + 1 AS DECIMAL(38,0)) AS rx,
         CAST(2 * dy.b + dy.c + 1 AS DECIMAL(38,0)) AS ry
  FROM rows_
  JOIN dx ON dx.xv = rows_.xv
  JOIN dy ON dy.yv = rows_.yv
),
m AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(rx) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(ry) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(rx * ry) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(rx * rx) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(ry * ry) AS DECIMAL(38,0)) AS syy
  FROM rk
)
SELECT CAST(n AS BIGINT) AS n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dx) AS n_distinct_x,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dy) AS n_distinct_y,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
                / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE)))
               * 1e9 + 0.5) / 1e9 END AS spearman_rho
FROM m
"""


@query("agg-spearman-corr", oracle=_SPEAR_ORACLE)
# NOT @plan_cached (r16, verdict item 1): the build runs an eager
# localCheckpoint barrier — per-invocation work a plan-cache hit
# would silently skip (result caching, not plan caching).
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E37: Spearman rank correlation between quantity and discount
    — the robust monotone-association readout (Pearson on RANKS):
    insensitive to outliers and nonlinearity, the statistic to reach
    for when E8's corr() answers "linear?" but the question is
    "monotone?". Both columns are heavily TIED (50 and 11 distinct
    values over any row count) — exactly the regime this formulation
    exists for: tie handling is the textbook AVERAGE rank, computed
    EXACTLY: a tie run of c values with B values below occupies ranks
    B+1..B+c, so its average rank is B + (c+1)/2 — carried as the
    INTEGER 2B + c + 1 (twice the rank), which cancels in the Pearson
    ratio and keeps every moment in exact DECIMAL space.

    Shape at 100 TB (the E19 discipline, taken to its endpoint): ONE
    corpus pass collapses map-side to the JOINT (xv, yv) distribution
    — bounded by the PRODUCT of the value cardinalities (50 × 11
    cells here), never row count — behind a localCheckpoint barrier.
    Every marginal rank relation re-aggregates that tiny relation
    (never the corpus; r15: the per-variable groupBy formulation plus
    the rank-attach join re-scanned the corpus 3× per invocation),
    ranks attach back to the CELLS by value-keyed BROADCAST equi
    joins, and the six moments are weighted sums over cells (each
    moment is linear in the cell count c, so Σ_rows rx·ry =
    Σ_cells c·rx·ry exactly — integer arithmetic in DECIMAL(38,0),
    same magnitude bound as the row form). No global row sort, no
    row_number over raw rows, no second corpus scan. rho is one
    all-double expression over exact operands (sqrt is correctly
    rounded), snapped floor(x*1e9+0.5)/1e9; zero-variance sides →
    NULL in both engines."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.select(
        (dec("l_quantity") * 100).cast("long").alias("xv"),
        (dec("l_discount") * 100).cast("long").alias("yv"),
    )
    d38 = "decimal(38,0)"

    # the one corpus pass: joint value distribution, map-side combined
    # to |X|·|Y| cells, checkpointed so the marginals and the moment
    # aggregate all read the barrier instead of re-deriving the scan
    # (the broadcast rank subtrees cannot share the main plan's
    # exchange, so the r16 lazy experiment still ran TWO corpus scans
    # per action for the same wall time). The barrier is
    # per-invocation eager work, which is why this key is NOT
    # @plan_cached (r16, verdict item 1).
    joint = (
        rows_.groupBy("xv", "yv")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )

    def rank_rel(col: str):
        # marginal distribution from the joint cells (cell-bounded, no
        # corpus access); the distinct-value diagnostic rides the SAME
        # window exchange as the cumulative count
        wb = W.orderBy(col).rowsBetween(W.unboundedPreceding, -1)
        wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        return (
            joint.groupBy(col)
            .agg(F.sum("c").alias("c"))
            .select(
                col,
                F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("b"),
                "c",
                F.count("*").over(wall).alias(f"nd_{col}"),
            )
            .select(
                col,
                (2 * F.col("b") + F.col("c") + 1)
                .cast(d38)
                .alias(f"r_{col}"),
                f"nd_{col}",
            )
        )

    # BROADCAST the rank relations onto the cells: VALUE-cardinality
    # rows (50 and 11 here; bounded by the value space at any corpus
    # size), but they sit behind window outputs so Spark cannot
    # estimate that unhinted.
    rk = joint.join(
        F.broadcast(rank_rel("xv")), "xv"
    ).join(F.broadcast(rank_rel("yv")), "yv")
    cd = F.col("c").cast(d38)
    m = rk.agg(
        F.sum("c").cast(d38).alias("n"),
        F.sum(cd * F.col("r_xv")).cast(d38).alias("sx"),
        F.sum(cd * F.col("r_yv")).cast(d38).alias("sy"),
        F.sum(cd * F.col("r_xv") * F.col("r_yv")).cast(d38).alias("sxy"),
        F.sum(cd * F.col("r_xv") * F.col("r_xv")).cast(d38).alias("sxx"),
        F.sum(cd * F.col("r_yv") * F.col("r_yv")).cast(d38).alias("syy"),
        F.max("nd_xv").cast("long").alias("n_distinct_x"),
        F.max("nd_yv").cast("long").alias("n_distinct_y"),
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "n_distinct_x",
        "n_distinct_y",
        "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN"
        " FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)"
        " / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)"
        " * CAST(n * syy - sy * sy AS DOUBLE)))"
        " * 1e9 + 0.5) / 1e9 END AS spearman_rho",
    )


# ---------------------------------------------------------------------------
# E38 — cohort LTV curve (cumulative revenue per cohort-week offset)
# ---------------------------------------------------------------------------

_LTV_ORACLE = f"""
WITH act AS (
  SELECT user_id,
         CAST(datediff('day', DATE '{_COHORT_EPOCH}', CAST(ts AS DATE))
              // 7 AS BIGINT) AS week,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
fw AS (
  SELECT user_id,
         CAST(MIN(datediff('day', DATE '{_COHORT_EPOCH}',
                           CAST(ts AS DATE)) // 7) AS BIGINT)
           AS cohort_week
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM fw
  GROUP BY cohort_week
),
cell AS (
  SELECT fw.cohort_week,
         act.week - fw.cohort_week AS week_offset,
         CAST(SUM(act.cents) AS DECIMAL(38,0)) AS rev_cents
  FROM act JOIN fw ON fw.user_id = act.user_id
  GROUP BY fw.cohort_week, act.week - fw.cohort_week
),
cum AS (
  SELECT cohort_week, week_offset,
         CAST(rev_cents AS BIGINT) AS rev_cents,
         CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week
                ORDER BY week_offset
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_rev_cents
  FROM cell
)
SELECT cum.cohort_week AS cohort_week, cum.week_offset, cum.rev_cents,
       cum.cum_rev_cents, sizes.cohort_size,
       FLOOR((CAST(cum.cum_rev_cents AS DOUBLE)
              / CAST(sizes.cohort_size AS DOUBLE) / 100.0)
             * 1e9 + 0.5) / 1e9 AS ltv_per_user
FROM cum JOIN sizes ON sizes.cohort_week = cum.cohort_week
ORDER BY cum.cohort_week, week_offset
"""


@query("agg-cohort-ltv", oracle=_LTV_ORACLE)
@plan_cached("agg-cohort-ltv")
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E38: cohort LTV curves — cumulative purchase revenue per
    (first-activity-week cohort, week offset), per-user: the money
    sibling of the E11 retention matrix and the payback-period readout
    every acquisition team plots ("week-4 LTV of the January cohort").
    Cohorting is by FIRST ACTIVITY of any type (the E11 contract), so
    never-purchasing users correctly dilute per-user LTV.

    Shape at 100 TB: purchase events collapse map-side into
    (cohort, offset) cells — bounded by weeks², never event count —
    after a user-keyed join against the first-week relation (itself a
    min-groupBy over the per-user collapse, the E11 plan); the
    cumulative-LTV window runs per cohort over OFFSET-bounded rows;
    cohort sizes broadcast. Exact integer cents in DECIMAL(38,0); the
    per-user division is one snapped double."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    week = F.expr(f"datediff(to_date(ts), DATE '{_COHORT_EPOCH}') div 7")
    act = e.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        week.alias("week"),
        (dec("value") * 100).cast("long").alias("cents"),
    )
    fw = e.select("user_id", week.alias("w")).groupBy("user_id").agg(
        F.min("w").cast("long").alias("cohort_week")
    )
    sizes = fw.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    cell = (
        act.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.sum("cents").cast("decimal(38,0)").alias("rev"))
    )
    wcum = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = cell.select(
        "cohort_week",
        "week_offset",
        F.col("rev").cast("long").alias("rev_cents"),
        F.sum("rev").over(wcum).cast("long").alias("cum_rev_cents"),
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .selectExpr(
            "cohort_week",
            "week_offset",
            "rev_cents",
            "cum_rev_cents",
            "cohort_size",
            "FLOOR((CAST(cum_rev_cents AS DOUBLE)"
            " / CAST(cohort_size AS DOUBLE) / 100.0)"
            " * 1e9 + 0.5) / 1e9 AS ltv_per_user",
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# E39 — Theil inequality indices of per-user spend (sort-free)
# ---------------------------------------------------------------------------

# shared textual fragments (verbatim in BOTH engines): the share ratio
# r = y·n/T and the two per-user log terms, snapped BEFORE the
# c-weighted decimal sum so the totals are order-independent
_THEIL_R = "(CAST(yc AS DOUBLE) * n) / CAST(t AS DOUBLE)"
_THEIL_TERM_T = (
    f"CAST(FLOOR(({_THEIL_R} * LN({_THEIL_R})) * 1e9 + 0.5) / 1e9"
    " AS DECIMAL(20,9))"
)
_THEIL_TERM_L = (
    f"CAST(FLOOR((LN(CAST(t AS DOUBLE) / (CAST(yc AS DOUBLE) * n)))"
    " * 1e9 + 0.5) / 1e9 AS DECIMAL(20,9))"
)

_THEIL_ORACLE = f"""
WITH pu AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
dist AS (
  SELECT yc, CAST(COUNT(*) AS BIGINT) AS c
  FROM pu WHERE yc > 0 GROUP BY yc
),
m AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CAST(yc AS DECIMAL(38,0)) * c), 0)
              AS DECIMAL(38,0)) AS t
  FROM dist
),
terms AS (
  SELECT SUM({_THEIL_TERM_T} * CAST(c AS DECIMAL(10,0))) AS sum_t,
         SUM({_THEIL_TERM_L} * CAST(c AS DECIMAL(10,0))) AS sum_l
  FROM dist, m
)
SELECT n AS n_users, CAST(t AS BIGINT) AS total_cents,
       CASE WHEN n > 0 AND t > 0 THEN
         FLOOR((CAST(sum_t AS DOUBLE) / n) * 1e9 + 0.5) / 1e9
       END AS theil_t,
       CASE WHEN n > 0 AND t > 0 THEN
         FLOOR((CAST(sum_l AS DOUBLE) / n) * 1e9 + 0.5) / 1e9
       END AS theil_l
FROM m, terms
"""


@query("agg-theil-index", oracle=_THEIL_ORACLE)
# NOT @plan_cached (r16, verdict item 1): the build runs an eager
# localCheckpoint barrier — per-invocation work a plan-cache hit
# would silently skip (result caching, not plan caching).
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E39: Theil T and Theil L (mean log deviation) of the per-user
    spend distribution — the DECOMPOSABLE inequality indices (total
    Theil = within-group + between-group exactly, which Gini E32 does
    not satisfy), the readout to reach for when the question is "how
    much of the inequality is BETWEEN segments vs within them?".
    T = (1/n)·Σ r·ln r and L = (1/n)·Σ ln(1/r) with r = y·n/T, over
    the positive-spend population (log terms are undefined at zero —
    the textbook convention, documented; n/total count that
    population only).

    Parity: per-user cents exact BIGINTs; r and each log term are
    shared textual double fragments evaluated identically by both
    engines, snapped floor(x·1e9+0.5)/1e9 per USER-CLASS and summed
    c-weighted in exact DECIMAL — the E20 entropy mechanism — so the
    totals are order-independent; each index is one more snapped
    division; an empty/zero population → NULL indices in both.

    Shape at 100 TB — the E32 distribution trick, one corpus pass and
    NO sort anywhere: per-user collapses map-side, then to the
    DISTINCT (cents, count) relation (bounded by value cardinality,
    never user count), whose two consumers (the one-row n/T aggregate
    and the term sum) share one exchange (ReusedExchange — the corpus
    aggs run once per action); n/T broadcast back via one-row
    crossJoin.
    Per-segment decomposition adds the segment to both groupBys; same
    shape. DECIMAL(20,9) term headroom: |r·ln r| ≤ n·ln n ~ 2e10 at
    10⁹ users, 11 integer digits."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.coalesce((F.sum(dec("value")) * 100).cast("long"), F.lit(0))
        .alias("yc")
    )
    # value-bounded distribution consumed twice (n/T aggregate + term
    # sum) — materialize once: only the user-agg exchange below it is
    # shareable, so the lazy form re-runs the user-scale final
    # aggregate per consumer. The barrier is per-invocation eager
    # work, which is why this key is NOT @plan_cached (r16).
    dist = (
        pu.filter(F.col("yc") > 0)
        .groupBy("yc")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    m = dist.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.expr("CAST(yc AS DECIMAL(38,0)) * c")), F.lit(0)
        )
        .cast("decimal(38,0)")
        .alias("t"),
    )
    terms = (
        dist.crossJoin(F.broadcast(m))
        .selectExpr(
            f"{_THEIL_TERM_T} * CAST(c AS DECIMAL(10,0)) AS term_t",
            f"{_THEIL_TERM_L} * CAST(c AS DECIMAL(10,0)) AS term_l",
        )
        .agg(
            F.sum("term_t").alias("sum_t"),
            F.sum("term_l").alias("sum_l"),
        )
    )
    return (
        F.broadcast(m)
        .crossJoin(terms)
        .selectExpr(
            "n AS n_users",
            "CAST(t AS BIGINT) AS total_cents",
            "CASE WHEN n > 0 AND t > 0 THEN"
            " FLOOR((CAST(sum_t AS DOUBLE) / n) * 1e9 + 0.5) / 1e9"
            " END AS theil_t",
            "CASE WHEN n > 0 AND t > 0 THEN"
            " FLOOR((CAST(sum_l AS DOUBLE) / n) * 1e9 + 0.5) / 1e9"
            " END AS theil_l",
        )
    )


# ---------------------------------------------------------------------------
# E40 — Lorenz decile curve of per-user spend (sort-free)
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH pu AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
r AS (
  SELECT yc,
         ROW_NUMBER() OVER (ORDER BY yc, user_id) AS i,
         COUNT(*) OVER () AS nn
  FROM pu
),
d AS (
  SELECT CAST((10 * i + nn - 1) // nn AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(COALESCE(SUM(CAST(yc AS DECIMAL(38,0))), 0)
              AS DECIMAL(38,0)) AS cents
  FROM r GROUP BY 1
),
t AS (
  SELECT *,
         CAST(SUM(cents) OVER () AS DECIMAL(38,0)) AS total,
         CAST(SUM(cents) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,0)) AS cum
  FROM d
)
SELECT decile, n_users,
       CAST(cents AS BIGINT) AS cents,
       CAST(cum AS BIGINT) AS cum_cents,
       CASE WHEN total > 0 THEN
         FLOOR((CAST(cents AS DOUBLE) / CAST(total AS DOUBLE))
               * 1e9 + 0.5) / 1e9 END AS share,
       CASE WHEN total > 0 THEN
         FLOOR((CAST(cum AS DOUBLE) / CAST(total AS DOUBLE))
               * 1e9 + 0.5) / 1e9 END AS cum_share
FROM t ORDER BY decile
"""


@query("agg-lorenz-deciles", oracle=_LORENZ_ORACLE)
@plan_cached("agg-lorenz-deciles")
def agg_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E40: the Lorenz curve at decile resolution — per spend decile
    (users ranked ascending), user count, cents, cumulative cents and
    (cumulative) revenue share: the curve BEHIND the E32 Gini number,
    what an analyst actually plots ("the bottom 50% of users carry 9%
    of revenue"), and over per-domain doc masses the corpus-balance
    curve curation reports want. Decile boundaries are the exact
    integer cuts k_d = d·n div 10 (rank i belongs to decile
    ceil(10·i/n)); ties don't matter because users sharing a value are
    interchangeable — a tie run split across deciles contributes by
    COUNT only, which is the closed form below.

    Parity: exact integer cents everywhere; DECIMAL(38,0) sums; the
    two shares are snapped divisions; an all-zero population keeps
    exact zeros (deciles of zeros are zeros) and total=0 → NULL
    shares. The oracle derives deciles independently via the textbook
    ROW_NUMBER form; equality on ties holds by construction.

    Shape at 100 TB — the E32 distribution trick with a bounded
    10-way expansion instead of a user sort: per-user collapses
    map-side, then to the DISTINCT (cents, count) relation; one
    cumulative-count window over that metadata-scale relation gives
    each value run its rank interval [b+1, b+c], and each decile's
    overlap with the run is GREATEST(0, LEAST(b+c, k_d) −
    GREATEST(b, k_{d-1})) users — an explode(sequence(1,10)) 10×
    fanout of a value-bounded relation, then a ≤10-row hash agg. No
    row_number over users anywhere (plan-pinned)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.coalesce((F.sum(dec("value")) * 100).cast("long"), F.lit(0))
        .alias("yc")
    )
    dist = pu.groupBy("yc").agg(F.count("*").cast("long").alias("c"))
    wbelow = W.orderBy("yc").rowsBetween(W.unboundedPreceding, -1)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    runs = dist.select(
        "yc",
        "c",
        F.coalesce(F.sum("c").over(wbelow), F.lit(0)).alias("b"),
        F.sum("c").over(wall).alias("nn"),
    )
    # decile d covers ranks (d-1)*nn div 10 + 1 .. d*nn div 10; the
    # run covers b+1 .. b+c; users in the overlap all carry value yc
    cells = runs.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
        "yc",
        "c",
        "b",
        "nn",
    ).selectExpr(
        "decile",
        "yc",
        "GREATEST(CAST(0 AS BIGINT),"
        " LEAST(b + c, (decile * nn) DIV 10)"
        " - GREATEST(b, ((decile - 1) * nn) DIV 10)) AS k",
    )
    d = cells.groupBy("decile").agg(
        F.sum("k").cast("long").alias("n_users"),
        F.coalesce(
            F.sum(F.expr("CAST(yc AS DECIMAL(38,0)) * k")), F.lit(0)
        )
        .cast("decimal(38,0)")
        .alias("cents"),
    ).filter(F.col("n_users") > 0)
    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    t = d.select(
        "decile",
        "n_users",
        "cents",
        F.sum("cents").over(wall).cast("decimal(38,0)").alias("total"),
        F.sum("cents").over(wcum).cast("decimal(38,0)").alias("cum"),
    )
    return t.selectExpr(
        "decile",
        "n_users",
        "CAST(cents AS BIGINT) AS cents",
        "CAST(cum AS BIGINT) AS cum_cents",
        "CASE WHEN total > 0 THEN"
        " FLOOR((CAST(cents AS DOUBLE) / CAST(total AS DOUBLE))"
        " * 1e9 + 0.5) / 1e9 END AS share",
        "CASE WHEN total > 0 THEN"
        " FLOOR((CAST(cum AS DOUBLE) / CAST(total AS DOUBLE))"
        " * 1e9 + 0.5) / 1e9 END AS cum_share",
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# E41 — winsorized / trimmed spend statistics (sort-free)
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH pu AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
r AS (
  SELECT yc,
         ROW_NUMBER() OVER (ORDER BY yc, user_id) AS i,
         COUNT(*) OVER () AS nn
  FROM pu
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CAST(yc AS DECIMAL(38,0))), 0)
              AS DECIMAL(38,0)) AS t,
         CAST(MAX(nn) // 20 AS BIGINT) AS k,
         CAST(COALESCE(SUM(CASE WHEN i > nn // 20
                                 AND i <= nn - nn // 20
                                THEN CAST(yc AS DECIMAL(38,0)) END), 0)
              AS DECIMAL(38,0)) AS trim_sum,
         CAST(MIN(CASE WHEN i >= nn // 20 + 1 THEN yc END)
              AS BIGINT) AS lo,
         CAST(MAX(CASE WHEN i <= nn - nn // 20 THEN yc END)
              AS BIGINT) AS hi
  FROM r
)
SELECT n AS n_users, k AS k_trim, lo AS lo_cents, hi AS hi_cents,
       CASE WHEN n > 0 THEN
         FLOOR((CAST(t AS DOUBLE) / n) * 1e9 + 0.5) / 1e9
       END AS mean_cents,
       CASE WHEN n > 0 THEN
         FLOOR((CAST(trim_sum AS DOUBLE) / (n - 2 * k)) * 1e9 + 0.5)
           / 1e9
       END AS trimmed_mean_cents,
       CASE WHEN n > 0 THEN
         FLOOR((CAST(trim_sum + CAST(k AS DECIMAL(38,0)) * (lo + hi)
                     AS DOUBLE) / n) * 1e9 + 0.5) / 1e9
       END AS winsorized_mean_cents
FROM m
"""


@query("agg-winsorized-stats", oracle=_WINSOR_ORACLE)
@plan_cached("agg-winsorized-stats")
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E41: 5%-winsorized and 5%-trimmed means of per-user spend next
    to the raw mean — the robust-location staple for long-tailed
    revenue metrics (one whale moves the raw mean; the experimentation
    literature winsorizes before every t-test for exactly that
    reason). k = n div 20 users clipped/trimmed at each end; the
    winsorized mean replaces the bottom/top k values with the
    (k+1)-th / (n−k)-th order statistics (lo/hi, emitted).

    Parity: exact integer cents; order statistics and all three sums
    derive from exact integer/DECIMAL(38,0) arithmetic; each mean is
    ONE snapped division; n=0 → NULL row in both engines (and n−2k ≥
    0.9n > 0 whenever n > 0, so the trimmed denominator never
    degenerates). The oracle re-derives ranks via the textbook
    ROW_NUMBER form; tie runs contribute by count only, so equality
    holds by construction.

    Shape at 100 TB — the E32/E40 distribution trick, one corpus pass
    and no user sort: per-user collapses map-side, then to the
    DISTINCT (cents, count) relation; ONE cumulative-count window
    over that metadata-scale relation assigns each value run its rank
    interval [b+1, b+c]; the trimmed sum is the run∩[k+1, n−k]
    overlap closed form, and lo/hi are conditional MINs over runs
    (the smallest value whose run reaches rank k+1 / n−k). One
    ≤|distinct-cents|-row window + ONE one-row aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.coalesce((F.sum(dec("value")) * 100).cast("long"), F.lit(0))
        .alias("yc")
    )
    dist = pu.groupBy("yc").agg(F.count("*").cast("long").alias("c"))
    wbelow = W.orderBy("yc").rowsBetween(W.unboundedPreceding, -1)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    runs = dist.select(
        "yc",
        "c",
        F.coalesce(F.sum("c").over(wbelow), F.lit(0)).alias("b"),
        F.sum("c").over(wall).alias("nn"),
    )
    m = runs.selectExpr(
        "yc",
        "c",
        "b",
        "nn",
        # run∩[k+1, n−k] with k = nn div 20: users in this value run
        # surviving the trim
        "GREATEST(CAST(0 AS BIGINT),"
        " LEAST(b + c, nn - nn DIV 20)"
        " - GREATEST(b, nn DIV 20)) AS kept",
    ).agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.expr("CAST(yc AS DECIMAL(38,0)) * c")), F.lit(0)
        )
        .cast("decimal(38,0)")
        .alias("t"),
        F.max(F.expr("nn DIV 20")).cast("long").alias("k"),
        F.coalesce(
            F.sum(F.expr("CAST(yc AS DECIMAL(38,0)) * kept")), F.lit(0)
        )
        .cast("decimal(38,0)")
        .alias("trim_sum"),
        F.min(F.expr("CASE WHEN b + c >= nn DIV 20 + 1 THEN yc END"))
        .cast("long")
        .alias("lo"),
        F.min(F.expr("CASE WHEN b + c >= nn - nn DIV 20 THEN yc END"))
        .cast("long")
        .alias("hi"),
    )
    return m.selectExpr(
        "n AS n_users",
        "k AS k_trim",
        "lo AS lo_cents",
        "hi AS hi_cents",
        "CASE WHEN n > 0 THEN"
        " FLOOR((CAST(t AS DOUBLE) / n) * 1e9 + 0.5) / 1e9"
        " END AS mean_cents",
        "CASE WHEN n > 0 THEN"
        " FLOOR((CAST(trim_sum AS DOUBLE) / (n - 2 * k)) * 1e9 + 0.5)"
        " / 1e9 END AS trimmed_mean_cents",
        "CASE WHEN n > 0 THEN"
        " FLOOR((CAST(trim_sum + CAST(k AS DECIMAL(38,0)) * (lo + hi)"
        " AS DOUBLE) / n) * 1e9 + 0.5) / 1e9"
        " END AS winsorized_mean_cents",
    )


# ---------------------------------------------------------------------------
# E42 — Poisson-bootstrap confidence interval for mean per-user spend
# ---------------------------------------------------------------------------

_BOOT_B = 64  # replicates
# floor(P(Poisson(1) <= k) * 2^60), k = 0..7 — exact BIGINT thresholds
# for the inverse-CDF draw; both engines compare the same 60-bit hash
# integer against the same literals, so weights are engine-identical
_BOOT_CDF = [
    424136118829305329,
    848272237658610659,
    1060340297073263324,
    1131029650211480879,
    1148701988496035267,
    1152236456152946145,
    1152825534095764625,
    1152909688087595836,
]

# weight k for one (user, replicate) from the shared 60-bit hash u
_BOOT_W = (
    "CASE"
    + "".join(
        f" WHEN u < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF)
    )
    + " ELSE 8 END"
)

_BOOT_ORACLE = f"""
WITH pu AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
draws AS (
  SELECT b.b, yc,
         {MD5_PREFIX60_SQL.format(
             x="CAST(user_id AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)"
         )} AS u
  FROM pu CROSS JOIN (SELECT UNNEST(range(0, {_BOOT_B})) AS b) b
),
rep AS (
  SELECT b,
         CAST(COALESCE(SUM(({_BOOT_W}) * CAST(yc AS DECIMAL(38,0))), 0)
              AS DECIMAL(38,0)) AS wy,
         CAST(COALESCE(SUM({_BOOT_W}), 0) AS BIGINT) AS wn
  FROM draws GROUP BY b
),
means AS (
  SELECT b,
         CASE WHEN wn > 0 THEN
           FLOOR((CAST(wy AS DOUBLE) / wn) * 1e9 + 0.5) / 1e9
         END AS m
  FROM rep
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS i,
         COUNT(*) OVER () AS nb
  FROM means WHERE m IS NOT NULL
),
ci AS (
  SELECT CAST(MAX(nb) AS BIGINT) AS n_reps,
         MIN(CASE WHEN i >= (nb + 19) // 20 THEN m END) AS ci_lo,
         MAX(CASE WHEN i <= nb + 1 - (nb + 19) // 20 THEN m END) AS ci_hi
  FROM ranked
),
pt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CASE WHEN COUNT(*) > 0 THEN
           FLOOR((CAST(SUM(CAST(yc AS DECIMAL(38,0))) AS DOUBLE)
                  / COUNT(*)) * 1e9 + 0.5) / 1e9
         END AS mean_cents
  FROM pu
)
SELECT n_users, CAST({_BOOT_B} AS BIGINT) AS n_replicates,
       COALESCE(n_reps, 0) AS n_valid_replicates,
       mean_cents, ci_lo, ci_hi
FROM pt, ci
"""


@query("agg-bootstrap-ci", oracle=_BOOT_ORACLE)
# NOT @plan_cached (r16, verdict item 1): the build runs an eager
# localCheckpoint barrier — per-invocation work a plan-cache hit
# would silently skip (result caching, not plan caching).
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E42: Poisson-bootstrap 90% confidence interval for the mean
    per-user spend — THE at-scale resampling recipe (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012):
    classic multinomial bootstrap needs the whole sample per
    replicate, but Poisson(1) per-(user, replicate) weights are
    independent, so all B replicates compute in ONE streaming pass —
    the uncertainty companion to the experiment family's closed-form
    tests (E23/E30) for statistics with no clean variance formula.

    Determinism/parity: each weight is the Poisson(1) inverse CDF
    applied to the shared md5-prefix-60 hash of (user_id, replicate)
    — the I18/I64 contract, never an RNG — compared against exact
    floor(CDF·2⁶⁰) BIGINT literals, so both engines draw IDENTICAL
    integer weights (tail capped at 8, P < 1e-5). Replicate sums are
    exact DECIMAL(38,0); each replicate mean is one snapped division;
    the CI bounds are nearest-rank order statistics (rank ceil(B/20)
    from each end) over the B snapped means; empty replicates (all
    weights 0) drop out, an empty population → NULL point/CI in both.

    Shape at 100 TB: per-user collapses map-side; the B-way explode
    fans each user row to B weighted draws whose groupBy(b) partial
    aggregation collapses to B rows PER TASK before the exchange (the
    shuffle moves B·tasks partials, never B·users rows); the CI ranks
    a B-row relation. One corpus pass, one bounded exchange. The
    B-row window is replicate-bounded, not data-bounded."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    # per-user collapse consumed twice (draws + the point estimate) —
    # materialize once: the lazy form re-runs the user-scale final
    # aggregate per consumer (only the scan exchange is reused;
    # measured 0.94 vs 0.81 s/invocation at sf0.1). The barrier is
    # per-invocation eager work, which is why this key is NOT
    # @plan_cached (r16).
    pu = ev.groupBy("user_id").agg(
        F.coalesce((F.sum(dec("value")) * 100).cast("long"), F.lit(0))
        .alias("yc")
    ).localCheckpoint(eager=True)
    draws = pu.select(
        "user_id",
        "yc",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).select(
        "b",
        "yc",
        md5_prefix60(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        ).alias("u"),
    )
    rep = draws.selectExpr("b", "yc", f"({_BOOT_W}) AS w").groupBy("b").agg(
        F.coalesce(
            F.sum(F.expr("w * CAST(yc AS DECIMAL(38,0))")), F.lit(0)
        )
        .cast("decimal(38,0)")
        .alias("wy"),
        F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("wn"),
    )
    means = rep.selectExpr(
        "b",
        "CASE WHEN wn > 0 THEN"
        " FLOOR((CAST(wy AS DOUBLE) / wn) * 1e9 + 0.5) / 1e9 END AS m",
    ).filter(F.col("m").isNotNull())
    wr = W.orderBy("m", "b")
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = means.select(
        "m",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wall).alias("nb"),
    )
    ci = ranked.agg(
        F.max("nb").cast("long").alias("n_reps"),
        F.min(
            F.expr("CASE WHEN i >= (nb + 19) DIV 20 THEN m END")
        ).alias("ci_lo"),
        F.max(
            F.expr("CASE WHEN i <= nb + 1 - (nb + 19) DIV 20 THEN m END")
        ).alias("ci_hi"),
    )
    pt = pu.agg(
        F.count("*").cast("long").alias("n_users"),
        F.expr(
            "CASE WHEN COUNT(*) > 0 THEN"
            " FLOOR((CAST(SUM(CAST(yc AS DECIMAL(38,0))) AS DOUBLE)"
            " / COUNT(*)) * 1e9 + 0.5) / 1e9 END"
        ).alias("mean_cents"),
    )
    return pt.crossJoin(F.broadcast(ci)).selectExpr(
        "n_users",
        f"CAST({_BOOT_B} AS BIGINT) AS n_replicates",
        "COALESCE(n_reps, 0) AS n_valid_replicates",
        "mean_cents",
        "ci_lo",
        "ci_hi",
    )


# ---------------------------------------------------------------------------
# E43 — DAU/MAU stickiness per month
# ---------------------------------------------------------------------------

_STICKY_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
k AS (
  SELECT user_id, day,
         strftime(make_timestamp(day * 86400000000), '%Y-%m') AS ym
  FROM ud
),
dau AS (
  SELECT ym, day, CAST(COUNT(*) AS BIGINT) AS dau
  FROM k GROUP BY ym, day
),
mau AS (
  SELECT ym, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM k GROUP BY ym
),
agg AS (
  SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dau) AS BIGINT) AS sum_dau
  FROM dau GROUP BY ym
)
SELECT agg.ym AS month, n_days, sum_dau, mau,
       FLOOR(((CAST(sum_dau AS DOUBLE) / n_days)
              / CAST(mau AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS stickiness
FROM agg JOIN mau ON mau.ym = agg.ym
ORDER BY month
"""


@query("agg-stickiness-dau-mau", oracle=_STICKY_ORACLE)
@plan_cached("agg-stickiness-dau-mau")
def agg_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E43: DAU/MAU stickiness per month — mean daily active users
    over monthly active users, THE product-engagement ratio every
    growth report leads with (stickiness 0.5 = the average user shows
    up every other day); completes the growth family next to
    new-vs-returning (E34) and retention (E11), which count
    composition and comebacks but not frequency.

    Parity: exact integers until the single snapped division;
    mau > 0 whenever the month exists (every distinct (user, day) row
    implies its user is monthly-active), so no NULL guard is needed
    in either engine — documented rather than guarded.

    Shape at 100 TB: events collapse map-side to DISTINCT (user, day)
    BEFORE any exchange (the E34 plan — per-user event volume never
    shuffles); DAU is a calendar-bounded count over that relation,
    MAU one distinct-count per month over the same relation, the join
    is month-keyed over ≤12-rows-per-year relations. The
    distinct-user collapse is the only corpus-sized exchange."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)").alias(
            "day"
        ),
    ).distinct()
    k = ud.select(
        "user_id",
        "day",
        F.date_format(
            F.timestamp_micros(F.col("day") * 86400000000), "yyyy-MM"
        ).alias("ym"),
    )
    dau = k.groupBy("ym", "day").agg(
        F.count("*").cast("long").alias("dau")
    )
    mau = k.groupBy("ym").agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    agg = dau.groupBy("ym").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("dau").cast("long").alias("sum_dau"),
    )
    return (
        agg.join(mau, "ym")
        .selectExpr(
            "ym AS month",
            "n_days",
            "sum_dau",
            "mau",
            "FLOOR(((CAST(sum_dau AS DOUBLE) / n_days)"
            " / CAST(mau AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS stickiness",
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# E44 — Kaplan-Meier conversion-survival curve
# ---------------------------------------------------------------------------

# per-event-time log term, integer-valued 1e9-scaled (shared textual;
# only defined when d < n — d = n is the curve-hits-zero case, flagged)
_KM_TERM = (
    "FLOOR(LN(1.0 - CAST(n_conv AS DOUBLE) / CAST(n_risk AS DOUBLE))"
    " * 1e9 + 0.5)"
)

_KM_ORACLE = f"""
WITH e AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         event_type
  FROM events
),
pu AS (
  SELECT user_id,
         MIN(day) AS first_day,
         MIN(CASE WHEN event_type = 'purchase' THEN day END) AS conv_day
  FROM e GROUP BY user_id
),
l AS (SELECT MAX(day) AS last_day FROM e),
dur AS (
  SELECT CASE WHEN conv_day IS NOT NULL THEN conv_day - first_day
              ELSE l.last_day - first_day END AS t,
         (conv_day IS NOT NULL) AS is_event
  FROM pu, l
),
dist AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(COALESCE(SUM(CASE WHEN is_event THEN 1 END), 0) AS BIGINT)
           AS n_conv
  FROM dur GROUP BY t
),
risk AS (
  SELECT t, n_conv,
         CAST(SUM(n_total) OVER () -
              COALESCE(SUM(n_total) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM dist
),
ev AS (
  SELECT t, n_conv, n_risk,
         SUM(CASE WHEN n_conv < n_risk THEN
               CAST({_KM_TERM} AS DECIMAL(28,0)) ELSE 0 END)
           OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_i9,
         MAX(CASE WHEN n_conv = n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hit_zero
  FROM risk WHERE n_conv > 0
)
SELECT t AS t_days, n_risk, n_conv,
       CASE WHEN hit_zero = 1 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR(EXP(CAST(cum_i9 AS DOUBLE) / 1e9) * 1e9 + 0.5)
                   / 1e9 END AS survival
FROM ev ORDER BY t_days
"""


@query("agg-survival-km", oracle=_KM_ORACLE)
@plan_cached("agg-survival-km")
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E44: the Kaplan–Meier survival curve for time-to-first-purchase
    (days from a user's first activity), right-censored at the corpus
    horizon — THE time-to-event estimator (Kaplan & Meier 1958) for
    conversion/churn questions where naive conversion rates are
    biased by users who simply haven't had time yet: censoring keeps
    late joiners in the at-risk denominator exactly as long as they
    were observable. Emits each event time with its at-risk count,
    conversions, and S(t) = Π(1 − dᵢ/nᵢ).

    Parity: durations/at-risk/conversion counts are exact integers
    from the duration DISTRIBUTION; the product is computed in log
    space with INTEGER-VALUED 1e9-scaled per-time terms (shared
    textual fragment) summed exactly in DECIMAL — so the cumulative
    product is order-independent — and one shared EXP + snap per row;
    the d = n boundary (everyone at risk converts — LN(0)) is flagged
    and forces survival 0 rather than feeding −inf into arithmetic,
    in both engines.

    Shape at 100 TB: one per-user collapse (first day + first
    purchase day in a single conditional-MIN groupBy — the H6 funnel
    plan), the corpus horizon one one-row aggregate broadcast back;
    everything after lives on the DURATION distribution (bounded by
    the observation window in days — the E19 discipline): at-risk
    counts, log terms, the cumulative windows all rank
    calendar-bounded rows, never users."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.expr("CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)").alias(
            "day"
        ),
        "event_type",
    )
    pu = e.groupBy("user_id").agg(
        F.min("day").alias("first_day"),
        F.min(
            F.expr("CASE WHEN event_type = 'purchase' THEN day END")
        ).alias("conv_day"),
    )
    horizon = e.agg(F.max("day").alias("last_day"))
    dur = pu.crossJoin(F.broadcast(horizon)).selectExpr(
        "CASE WHEN conv_day IS NOT NULL THEN conv_day - first_day"
        " ELSE last_day - first_day END AS t",
        "(conv_day IS NOT NULL) AS is_event",
    )
    dist = dur.groupBy("t").agg(
        F.count("*").cast("long").alias("n_total"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN is_event THEN 1 END")), F.lit(0)
        )
        .cast("long")
        .alias("n_conv"),
    )
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wbefore = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    risk = dist.select(
        "t",
        "n_conv",
        (
            F.sum("n_total").over(wall)
            - F.coalesce(F.sum("n_total").over(wbefore), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    ).filter(F.col("n_conv") > 0)
    wcum = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    evr = risk.select(
        "t",
        "n_conv",
        "n_risk",
        F.sum(
            F.expr(
                f"CASE WHEN n_conv < n_risk THEN"
                f" CAST({_KM_TERM} AS DECIMAL(28,0)) ELSE 0 END"
            )
        )
        .over(wcum)
        .alias("cum_i9"),
        F.max(
            F.expr("CASE WHEN n_conv = n_risk THEN 1 ELSE 0 END")
        )
        .over(wcum)
        .alias("hit_zero"),
    )
    return evr.selectExpr(
        "t AS t_days",
        "n_risk",
        "n_conv",
        "CASE WHEN hit_zero = 1 THEN CAST(0.0 AS DOUBLE)"
        " ELSE FLOOR(EXP(CAST(cum_i9 AS DOUBLE) / 1e9) * 1e9 + 0.5)"
        " / 1e9 END AS survival",
    ).orderBy("t_days")


# ---------------------------------------------------------------------------
# E45 — event-type association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
tc AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
  FROM ut GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS ante, b.event_type AS cons,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ante, cons, n_ab,
       ta.n_t AS n_ante, tb.n_t AS n_cons,
       FLOOR((CAST(n_ab AS DOUBLE) / CAST(n.n_users AS DOUBLE))
             * 1e9 + 0.5) / 1e9 AS support,
       FLOOR((CAST(n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE))
             * 1e9 + 0.5) / 1e9 AS confidence,
       FLOOR(((CAST(n_ab AS DOUBLE) * CAST(n.n_users AS DOUBLE))
              / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)))
             * 1e9 + 0.5) / 1e9 AS lift
FROM pairs
JOIN tc ta ON ta.event_type = ante
JOIN tc tb ON tb.event_type = cons
CROSS JOIN n
ORDER BY ante, cons
"""


@query("agg-assoc-lift", oracle=_LIFT_ORACLE)
# NOT @plan_cached (r16, verdict item 1): the build runs an eager
# localCheckpoint barrier — per-invocation work a plan-cache hit
# would silently skip (result caching, not plan caching).
def agg_assoc_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E45: pairwise association rules over per-user event-type
    baskets — support, confidence and lift for every unordered type
    pair: the market-basket readout ("users who view also purchase —
    is that co-occurrence above chance?") behind cross-sell and
    recommendation baselines; lift = P(A∧B)/(P(A)·P(B)) > 1 flags
    above-independence co-occurrence, and the Markov transition matrix
    (E26) is the ORDERED sibling (sequence vs co-occurrence).

    Parity: all counts exact integers over the DISTINCT (user, type)
    relation; the three ratios are snapped all-double expressions;
    pair symmetry fixed by the ante < cons canonical order so both
    engines emit identical row sets.

    Shape at 100 TB: events collapse map-side to DISTINCT
    (user, type) — per-user event volume never shuffles (the E34/E43
    plan); the pair enumeration is a user-keyed self-join whose
    fanout is bounded by |types|² per user (types is a small
    vocabulary — this is the basket model, not a general pair join);
    margins and the user count aggregate the SAME collapsed relation
    and broadcast onto the types²-bounded pair relation."""
    ev = load_table(spark, sf_dir, "events")
    # distinct (user, type) consumed four ways (n, margins, both pair
    # sides) — materialize once: the exchanged partials are USER-scale,
    # so the lazy form re-runs the user-scale final dedup per consumer
    # (measured 0.60 vs 0.45 s/invocation at sf0.1). The barrier is
    # per-invocation eager work, which is why this key is NOT
    # @plan_cached (r16).
    ut = ev.select("user_id", "event_type").distinct().localCheckpoint(
        eager=True
    )
    n = ut.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    tc = ut.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_t")
    )
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"),
            F.col("b.event_type").alias("cons"),
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    ta = tc.select(
        F.col("event_type").alias("ante"), F.col("n_t").alias("n_ante")
    )
    tb = tc.select(
        F.col("event_type").alias("cons"), F.col("n_t").alias("n_cons")
    )
    return (
        pairs.join(F.broadcast(ta), "ante")
        .join(F.broadcast(tb), "cons")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "ante",
            "cons",
            "n_ab",
            "n_ante",
            "n_cons",
            "FLOOR((CAST(n_ab AS DOUBLE) / CAST(n_users AS DOUBLE))"
            " * 1e9 + 0.5) / 1e9 AS support",
            "FLOOR((CAST(n_ab AS DOUBLE) / CAST(n_ante AS DOUBLE))"
            " * 1e9 + 0.5) / 1e9 AS confidence",
            "FLOOR(((CAST(n_ab AS DOUBLE) * CAST(n_users AS DOUBLE))"
            " / (CAST(n_ante AS DOUBLE) * CAST(n_cons AS DOUBLE)))"
            " * 1e9 + 0.5) / 1e9 AS lift",
        )
        .orderBy("ante", "cons")
    )


# ---------------------------------------------------------------------------
# E46 — Mann-Whitney U / Wilcoxon rank-sum test (tie-corrected)
# ---------------------------------------------------------------------------

# Shared textual fragments, interpolated VERBATIM into both engines'
# SQL (the Welch/CUPED discipline). Operands: n0/n1 BIGINT group
# sizes, dd = 2·U1 − n0·n1 and tt = Σ(t³−t) both DECIMAL(38,0)-exact.
_MW_VAR = (
    "(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0)"
    " * ((CAST(n0 + n1 AS DOUBLE) + 1.0)"
    "    - CAST(tt AS DOUBLE)"
    "      / (CAST(n0 + n1 AS DOUBLE) * (CAST(n0 + n1 AS DOUBLE) - 1.0)))"
)
_MW_Z = f"(CAST(dd AS DOUBLE) / 2.0) / SQRT({_MW_VAR})"
_MW_OK = f"n0 >= 1 AND n1 >= 1 AND n0 + n1 >= 2 AND ({_MW_VAR}) > 0.0"

_MANNWHITNEY_ORACLE = f"""
WITH per_user AS (
  SELECT {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2 AS v,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
dist AS (
  SELECT yc,
         CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM per_user GROUP BY yc
),
r AS (
  SELECT yc, c0, c1, c0 + c1 AS t,
         COALESCE(CAST(SUM(c0 + c1) OVER (ORDER BY yc
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS b
  FROM dist
),
m AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS n0,
         CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(COALESCE(SUM(CAST(c1 AS DECIMAL(38,0)) * (2*b + t + 1)), 0)
              AS DECIMAL(38,0)) AS r2,
         CAST(COALESCE(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t), 0)
              AS DECIMAL(38,0)) AS tt
  FROM r
),
c AS (
  SELECT *,
         r2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS u2,
         r2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)
            - CAST(n0 AS DECIMAL(38,0)) * n1 AS dd
  FROM m
)
SELECT n0, n1,
  CASE WHEN n0 >= 1 AND n1 >= 1 THEN CAST(u2 AS DOUBLE) / 2.0 END AS u_stat,
  CASE WHEN {_MW_OK} THEN FLOOR(({_MW_Z}) * 1e9 + 0.5) / 1e9 END AS z_value,
  COALESCE(ABS(CASE WHEN {_MW_OK} THEN
    FLOOR(({_MW_Z}) * 1e9 + 0.5) / 1e9 END)
    > CAST({_WT_CRIT} AS DOUBLE), FALSE) AS significant
FROM c
"""


@query("agg-mann-whitney", oracle=_MANNWHITNEY_ORACLE)
@plan_cached("agg-mann-whitney")
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E46: Mann-Whitney U (Wilcoxon rank-sum) test on per-user total
    spend between the two hash variants — the NONPARAMETRIC sibling
    that completes the experiment readout family: Welch (E30) tests
    means but is rattled by the heavy-tailed spend distributions
    Hill (E48) measures; the rank-sum test asks the robust question
    "does one variant's spend distribution stochastically dominate?"
    and is the standard fallback every experimentation platform
    offers for skewed metrics. Tie-corrected normal approximation
    (Mann & Whitney 1947; large-sample z convention shared with E30's
    _WT_CRIT documentation).

    Shape at 100 TB — the E13/E19 DISTRIBUTION trick, rank-sum
    flavored: per-user cents collapse to DISTINCT (cents, c0, c1)
    rows bounded by VALUE cardinality; a tie run of combined size t
    starting after B smaller observations occupies ranks B+1..B+t
    with shared midrank B+(t+1)/2, so the variant-1 rank sum is the
    closed form Σ c1·(2B+t+1)/2 — one cumulative-count window over
    the bounded distribution relation, one one-row aggregate, and NO
    sort of users anywhere (the Gini r10 lesson).

    Parity: doubled rank sums 2·R1 = Σ c1·(2B+t+1) and the tie term
    Σ(t³−t) are DECIMAL(38,0)-exact integers; U is emitted as the
    exact half 2U/2 (IEEE-exact); z's variance and ratio are shared
    textual fragments over exact operands, snapped at 9 dp; the flag
    compares the SNAPPED z against the shared critical literal.
    Degenerate inputs (a one-variant population, all values tied →
    zero variance) → NULL u/z and FALSE in both engines."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce((F.sum(dec("value")) * 100).cast("long"), F.lit(0))
            .alias("yc")
        )
        .select(
            F.pmod(
                md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
            ).alias("v"),
            "yc",
        )
    )
    dist = pu.groupBy("yc").agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    wb = W.orderBy("yc").rowsBetween(W.unboundedPreceding, -1)
    r = dist.select(
        "yc",
        "c0",
        "c1",
        (F.col("c0") + F.col("c1")).alias("t"),
        F.coalesce(
            F.sum(F.col("c0") + F.col("c1")).over(wb), F.lit(0)
        ).alias("b"),
    )
    d38 = "decimal(38,0)"
    m = r.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.coalesce(
            F.sum(F.expr("CAST(c1 AS DECIMAL(38,0)) * (2*b + t + 1)")),
            F.lit(0),
        )
        .cast(d38)
        .alias("r2"),
        F.coalesce(
            F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t * t - t")), F.lit(0)
        )
        .cast(d38)
        .alias("tt"),
    )
    c = m.withColumns(
        {
            "u2": F.expr("r2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)"),
            "dd": F.expr(
                "r2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)"
                " - CAST(n0 AS DECIMAL(38,0)) * n1"
            ),
        }
    )
    return c.selectExpr(
        "n0",
        "n1",
        "CASE WHEN n0 >= 1 AND n1 >= 1 THEN"
        " CAST(u2 AS DOUBLE) / 2.0 END AS u_stat",
        f"CASE WHEN {_MW_OK} THEN"
        f" FLOOR(({_MW_Z}) * 1e9 + 0.5) / 1e9 END AS z_value",
        f"COALESCE(ABS(CASE WHEN {_MW_OK} THEN"
        f" FLOOR(({_MW_Z}) * 1e9 + 0.5) / 1e9 END)"
        f" > CAST({_WT_CRIT} AS DOUBLE), FALSE) AS significant",
    )


# ---------------------------------------------------------------------------
# E47 — Population Stability Index per event type (two time windows)
# ---------------------------------------------------------------------------

# Industry-standard PSI bands (Siddiqi, credit-scorecard convention):
# < 0.10 stable, 0.10-0.25 moderate shift, >= 0.25 major shift. The
# compares run on the exact-decimal-derived psi, so the banding is
# boundary-deterministic cross-engine.
_PSI_MODERATE = "0.1"
_PSI_MAJOR = "0.25"

_PSI_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         LENGTH(CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                     AS VARCHAR)) AS bucket,
         CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END AS in_a
  FROM events WHERE value IS NOT NULL
),
h AS (
  SELECT event_type, bucket,
         CAST(SUM(in_a) AS BIGINT) AS a_cnt,
         CAST(SUM(1 - in_a) AS BIGINT) AS b_cnt
  FROM b GROUP BY 1, 2
),
t AS (
  SELECT *,
         CAST(SUM(a_cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
         CAST(SUM(b_cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
  FROM h
),
terms AS (
  SELECT event_type, n_a, n_b,
         CASE WHEN a_cnt > 0 AND b_cnt > 0 THEN
           CAST(FLOOR(((CAST(a_cnt AS DOUBLE) / n_a
                        - CAST(b_cnt AS DOUBLE) / n_b)
                       * LN((CAST(a_cnt AS DOUBLE) / n_a)
                            / (CAST(b_cnt AS DOUBLE) / n_b)))
                      * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9))
         END AS term,
         CASE WHEN a_cnt = 0 OR b_cnt = 0 THEN 1 ELSE 0 END AS onesided
  FROM t
),
p AS (
  SELECT event_type,
         MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(SUM(onesided) AS BIGINT) AS n_onesided,
         CASE WHEN MAX(n_a) > 0 AND MAX(n_b) > 0 THEN
           CAST(COALESCE(SUM(term), 0) AS DOUBLE) END AS psi
  FROM terms GROUP BY event_type
)
SELECT event_type, n_a, n_b, n_buckets, n_onesided, psi,
       CASE WHEN psi IS NULL THEN 'undefined'
            WHEN psi < {_PSI_MODERATE} THEN 'stable'
            WHEN psi < {_PSI_MAJOR} THEN 'moderate'
            ELSE 'major' END AS drift_level
FROM p ORDER BY event_type
"""


@query("agg-psi-drift", oracle=_PSI_ORACLE)
@plan_cached("agg-psi-drift")
def agg_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E47: Population Stability Index per event type between the two
    time windows — THE industry drift gate for deployed-model inputs
    (credit scorecards onward): PSI = Σ (pᵃ−pᵇ)·ln(pᵃ/pᵇ) over value
    buckets, read beside KS (E17): KS is the sup-norm test with a
    significance line, PSI is the banded magnitude score ops teams
    alert on (<0.10 stable / <0.25 moderate / else major — Siddiqi
    convention, pinned at _PSI_MODERATE/_PSI_MAJOR). Buckets are the
    E18 power-of-ten digit-count of exact integer cents — integer
    bucketing cannot edge-misassign, and the bucket count is fixed
    (~digits of the value range) at ANY data size.

    One-sided buckets (mass in only one window) make the ln term
    undefined; the standard ε fudge trades that for an arbitrary
    constant, so instead they are EXCLUDED from the sum and COUNTED
    in `n_onesided` — the reader sees exactly how much mass the score
    ignores instead of a silently ε-inflated number.

    Shape at 100 TB: the agg-ks-drift plan with a coarser axis — one
    scan collapses map-side to (type, bucket) counts (bounded by
    |types|×|digits|), the per-type normalizer windows over the
    AGGREGATED relation reusing its exchange, final bounded agg.

    Parity: counts exact BIGINTs; each PSI term is an IEEE-identical
    double expression snapped to 9 dp and summed as DECIMAL(18,9)
    (order-independent — the entropy/tfidf ln precedent); the banding
    compares the exact-decimal-derived psi against shared literals;
    a type living entirely in one window → NULL psi, 'undefined'."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    in_a = (F.col("ts") < _KS_SPLIT).cast("long")
    h = (
        e.select(
            "event_type",
            F.length(cents.cast("string")).alias("bucket"),
            in_a.alias("in_a"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("in_a").cast("long").alias("a_cnt"),
            F.sum(1 - F.col("in_a")).cast("long").alias("b_cnt"),
        )
    )
    tot = W.partitionBy("event_type")
    t = h.select(
        "event_type",
        "a_cnt",
        "b_cnt",
        F.sum("a_cnt").over(tot).cast("long").alias("n_a"),
        F.sum("b_cnt").over(tot).cast("long").alias("n_b"),
    )
    terms = t.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "CASE WHEN a_cnt > 0 AND b_cnt > 0 THEN"
        " CAST(FLOOR(((CAST(a_cnt AS DOUBLE) / n_a"
        "              - CAST(b_cnt AS DOUBLE) / n_b)"
        "             * LN((CAST(a_cnt AS DOUBLE) / n_a)"
        "                  / (CAST(b_cnt AS DOUBLE) / n_b)))"
        "            * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)) END AS term",
        "CASE WHEN a_cnt = 0 OR b_cnt = 0 THEN 1 ELSE 0 END AS onesided",
    )
    p = terms.groupBy("event_type").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("onesided").cast("long").alias("n_onesided"),
        F.expr(
            "CASE WHEN MAX(n_a) > 0 AND MAX(n_b) > 0 THEN"
            " CAST(COALESCE(SUM(term), 0) AS DOUBLE) END"
        ).alias("psi"),
    )
    return p.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "n_buckets",
        "n_onesided",
        "psi",
        f"CASE WHEN psi IS NULL THEN 'undefined'"
        f" WHEN psi < {_PSI_MODERATE} THEN 'stable'"
        f" WHEN psi < {_PSI_MAJOR} THEN 'moderate'"
        f" ELSE 'major' END AS drift_level",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E48 — Hill tail-index estimator on per-user spend (heavy-tail gate)
# ---------------------------------------------------------------------------

# Top-k fraction (5%) and the heavy-tail alpha threshold. alpha <= 2
# means infinite variance in the Pareto sense — the regime where mean
# readouts (Welch E30) are unstable and rank tests (E46) are the
# defensible readout; this key is the gate that tells you which.
_HILL_TOPFRAC_DIV = 20  # k = ceil(n_pos / 20)
_HILL_ALPHA_HEAVY = "2.0"

# H in exact nano-units until the two final divisions: num_nano =
# Σ c_eff·floor_nano(ln yc) − k·floor_nano(ln xk), a DECIMAL(38,0)
# integer on both engines; H = num_nano / 1e9 / k.
_HILL_H = "CAST(num_nano AS DOUBLE) / 1e9 / CAST(k AS DOUBLE)"
_HILL_OK = f"n_pos >= 1 AND xk IS NOT NULL AND ({_HILL_H}) > 0.0"

_HILL_ORACLE = f"""
WITH per_user AS (
  SELECT CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
dist AS (
  SELECT yc, CAST(COUNT(*) AS BIGINT) AS c
  FROM per_user WHERE yc > 0 GROUP BY yc
),
r AS (
  SELECT yc, c,
         COALESCE(CAST(SUM(c) OVER (ORDER BY yc DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS a,
         CAST(SUM(c) OVER () AS BIGINT) AS nn
  FROM dist
),
kk AS (
  SELECT *, GREATEST(1, (nn + {_HILL_TOPFRAC_DIV - 1})
                        // {_HILL_TOPFRAC_DIV}) AS k
  FROM r
),
m AS (
  SELECT MAX(nn) AS n_pos, MAX(k) AS k,
         MAX(CASE WHEN a < k AND a + c >= k THEN yc END) AS xk,
         CAST(COALESCE(SUM(CASE WHEN a < k THEN
           CAST(LEAST(c, k - a) AS DECIMAL(38,0))
           * CAST(FLOOR(LN(CAST(yc AS DOUBLE)) * 1e9 + 0.5)
                  AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0)) AS s_nano
  FROM kk
),
c AS (
  SELECT *,
         s_nano - CAST(k AS DECIMAL(38,0))
                  * CAST(FLOOR(LN(CAST(xk AS DOUBLE)) * 1e9 + 0.5)
                         AS DECIMAL(38,0)) AS num_nano
  FROM m WHERE xk IS NOT NULL
)
SELECT n_pos, k,
  CAST(xk AS DOUBLE) / 100.0 AS xk_dollars,
  CASE WHEN {_HILL_OK} THEN
    FLOOR(({_HILL_H}) * 1e9 + 0.5) / 1e9 END AS hill_h,
  CASE WHEN {_HILL_OK} THEN
    FLOOR((1.0 / ({_HILL_H})) * 1e9 + 0.5) / 1e9 END AS tail_alpha,
  COALESCE(CASE WHEN {_HILL_OK} THEN
    FLOOR((1.0 / ({_HILL_H})) * 1e9 + 0.5) / 1e9 END
    <= CAST({_HILL_ALPHA_HEAVY} AS DOUBLE), FALSE) AS heavy_tail
FROM c
"""


@query("agg-hill-tail", oracle=_HILL_ORACLE)
@plan_cached("agg-hill-tail")
def agg_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E48: Hill estimator of the Pareto tail index over per-user
    total spend — the heavy-tail gate for revenue metrics: H =
    (1/k)·Σ_top-k ln(xᵢ/x₍ₖ₎) with x₍ₖ₎ the k-th largest observation
    (k = top 5%, rank-k term contributing 0 — convention documented
    here), α = 1/H (Hill 1975). α ≤ 2 flags the infinite-variance
    regime where mean-based experiment readouts (E30) are unstable
    and the rank-sum test (E46) is the defensible alternative; read
    beside Gini/Theil (E32/E39), which summarize concentration but
    not tail law.

    Shape at 100 TB — the Gini top-decile arithmetic on the E13/E19
    distribution relation: per-user cents collapse to DISTINCT
    (cents, count) rows (value-bounded); one DESC cumulative-count
    window gives each value run its count-above a; the top-k cut
    takes min(c, k−a) users from the run straddling rank k, and x₍ₖ₎
    is the single run with a < k ≤ a+c — one window over the bounded
    relation, one one-row aggregate, no sort of users anywhere.

    Parity: the log sum stays an EXACT INTEGER to the end — each
    ln(cents) is snapped to nano-units as floor(ln·1e9+0.5) (a <2^53
    integer both engines CAST identically), multiplied by the integer
    user count and summed in DECIMAL(38,0); the numerator subtracts
    k·floor_nano(ln x₍ₖ₎) still in DECIMAL; H is then two IEEE
    divisions over exact operands, α one more, both snapped. Working
    in cents is safe because Hill is scale-invariant (the ln(100)
    offsets cancel in the ratio). Degenerate inputs — no positive
    spenders, or the whole top-k tied at x₍ₖ₎ (H=0) — yield NULL
    hill_h/tail_alpha and FALSE heavy_tail in both engines; an
    all-nonpositive population emits zero rows (both engines filter
    the empty distribution)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.coalesce((F.sum(dec("value")) * 100).cast("long"), F.lit(0))
        .alias("yc")
    )
    dist = (
        pu.filter(F.col("yc") > 0)
        .groupBy("yc")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wa = W.orderBy(F.col("yc").desc()).rowsBetween(W.unboundedPreceding, -1)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = dist.select(
        "yc",
        "c",
        F.coalesce(F.sum("c").over(wa), F.lit(0)).cast("long").alias("a"),
        F.sum("c").over(wall).cast("long").alias("nn"),
    )
    kk = r.withColumn(
        "k",
        F.expr(
            f"GREATEST(1, (nn + {_HILL_TOPFRAC_DIV - 1})"
            f" DIV {_HILL_TOPFRAC_DIV})"
        ),
    )
    m = kk.agg(
        F.max("nn").alias("n_pos"),
        F.max("k").alias("k"),
        F.expr("MAX(CASE WHEN a < k AND a + c >= k THEN yc END)").alias("xk"),
        F.expr(
            "CAST(COALESCE(SUM(CASE WHEN a < k THEN"
            " CAST(LEAST(c, k - a) AS DECIMAL(38,0))"
            " * CAST(FLOOR(LN(CAST(yc AS DOUBLE)) * 1e9 + 0.5)"
            "        AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0))"
        ).alias("s_nano"),
    )
    c = m.filter(F.col("xk").isNotNull()).withColumn(
        "num_nano",
        F.expr(
            "s_nano - CAST(k AS DECIMAL(38,0))"
            " * CAST(FLOOR(LN(CAST(xk AS DOUBLE)) * 1e9 + 0.5)"
            "        AS DECIMAL(38,0))"
        ),
    )
    return c.selectExpr(
        "n_pos",
        "k",
        "CAST(xk AS DOUBLE) / 100.0 AS xk_dollars",
        f"CASE WHEN {_HILL_OK} THEN"
        f" FLOOR(({_HILL_H}) * 1e9 + 0.5) / 1e9 END AS hill_h",
        f"CASE WHEN {_HILL_OK} THEN"
        f" FLOOR((1.0 / ({_HILL_H})) * 1e9 + 0.5) / 1e9 END AS tail_alpha",
        f"COALESCE(CASE WHEN {_HILL_OK} THEN"
        f" FLOOR((1.0 / ({_HILL_H})) * 1e9 + 0.5) / 1e9 END"
        f" <= CAST({_HILL_ALPHA_HEAVY} AS DOUBLE), FALSE) AS heavy_tail",
    )


# ---------------------------------------------------------------------------
# E49 — Cramér's V effect size over the segment × nation contingency
# ---------------------------------------------------------------------------

# Cohen (1988) effect-size bands for w = sqrt(chi2/n): small 0.1,
# medium 0.3, large 0.5. Banding compares the SNAPPED w against these
# shared literals, so the label is boundary-deterministic cross-engine.
_CV_SMALL = "0.1"
_CV_MEDIUM = "0.3"
_CV_LARGE = "0.5"

# chi2/n via the O²/E identity: chi2 = Σ(O−E)²/E = Σ O²/E − n (zero
# cells contribute 0 to Σ O²/E), so chi2/n = Σ o²/(r·c) − 1 — NO
# zero-cell completion join, unlike E31's analyst view. Each present
# cell's o²/(r·c) is in (0, 1] (o ≤ min(r, c) ⇒ o² ≤ r·c), so the
# 1e15-snap stays far inside 2^53 and the DECIMAL(20,15) sum is exact.
_CV_TERM = (
    "CAST(o AS DOUBLE) * CAST(o AS DOUBLE)"
    " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))"
)
_CV_PHI2 = "CAST(GREATEST(s - 1, 0) AS DOUBLE)"
_CV_W = f"SQRT({_CV_PHI2})"
_CV_V = f"SQRT(({_CV_PHI2}) / CAST(mindim - 1 AS DOUBLE))"

_CRAMERSV_ORACLE = f"""
WITH obs AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer GROUP BY 1, 2
),
tot AS (
  SELECT seg, nat, o,
         CAST(SUM(o) OVER (PARTITION BY seg) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY nat) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM obs
),
terms AS (
  SELECT n, r, c,
         CAST(FLOOR(({_CV_TERM}) * 1e15 + 0.5) / 1e15 AS DECIMAL(20,15))
           AS term
  FROM tot
),
m AS (
  SELECT MAX(n) AS n,
         CAST(SUM(term) AS DECIMAL(38,15)) AS s
  FROM terms
),
dims AS (
  SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS nr,
         CAST(COUNT(DISTINCT nat) AS BIGINT) AS nc
  FROM obs
),
f AS (
  SELECT n, nr, nc, s,
         CASE WHEN nr < nc THEN nr ELSE nc END AS mindim
  FROM m CROSS JOIN dims
)
SELECT n, nr AS n_segments, nc AS n_nations,
  FLOOR((CAST(n AS DOUBLE) * ({_CV_PHI2})) * 1e6 + 0.5) / 1e6 AS chi2,
  FLOOR(({_CV_W}) * 1e9 + 0.5) / 1e9 AS cohen_w,
  CASE WHEN mindim > 1 THEN
    FLOOR(({_CV_V}) * 1e9 + 0.5) / 1e9 END AS cramers_v,
  CASE WHEN FLOOR(({_CV_W}) * 1e9 + 0.5) / 1e9 < {_CV_SMALL}
         THEN 'negligible'
       WHEN FLOOR(({_CV_W}) * 1e9 + 0.5) / 1e9 < {_CV_MEDIUM}
         THEN 'small'
       WHEN FLOOR(({_CV_W}) * 1e9 + 0.5) / 1e9 < {_CV_LARGE}
         THEN 'medium'
       ELSE 'large' END AS effect_band
FROM f
"""


@query("agg-cramers-v", oracle=_CRAMERSV_ORACLE)
@plan_cached("agg-cramers-v")
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E49: Cramér's V + Cohen's w over the market-segment × nation
    contingency — the EFFECT-SIZE readout that belongs beside the E31
    significance test: at 100 TB *everything* is significant (n in
    the billions drives any χ² past any critical value), so the
    decision-grade number is the scale-free association strength
    V = sqrt(χ²/(n·(min(r,c)−1))) with Cohen's banding on
    w = sqrt(χ²/n) (0.1 / 0.3 / 0.5 — _CV_SMALL/_CV_MEDIUM/_CV_LARGE).

    Shape at 100 TB: ONE hash aggregate collapses the corpus to the
    |segments|×|nations| cell relation; margins are windows over that
    bounded relation; and the χ² identity Σ(O−E)²/E = Σ O²/E − n
    makes zero cells contribute NOTHING — no E31-style completion
    cross-join, no per-cell expected counts. χ²/n = Σ o²/(rc) − 1
    never multiplies by n until the display column, so the statistic
    the banding reads is precision-stable at ANY corpus size.

    Parity: counts/margins exact BIGINTs; each cell's o²/(rc) ∈ (0,1]
    is an IEEE-identical double snapped at 1e15 (inside 2^53) and
    summed as DECIMAL(20,15) — order-independent; GREATEST(s−1, 0)
    clamps the snap-jitter of an exactly-independent table; single-
    row/column tables → NULL cramers_v (w still 0-defined) in both
    engines; the band compares the SNAPPED w against shared literals."""
    from pyspark.sql import Window as W

    cu = load_table(spark, sf_dir, "customer")
    obs = cu.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    # the cell relation is |segments|×|nations|-bounded at ANY corpus
    # size and feeds both the margin windows and the dims aggregate —
    # checkpoint-free reuse is fine: the scan-census gate sees one
    # corpus scan per consumer of a ~125-row aggregate, which the
    # planner collapses via exchange reuse on the grouping key.
    tot = obs.select(
        "seg",
        "nat",
        "o",
        F.sum("o").over(W.partitionBy("seg")).cast("long").alias("r"),
        F.sum("o").over(W.partitionBy("nat")).cast("long").alias("c"),
        F.sum("o").over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n"),
    )
    terms = tot.selectExpr(
        "n",
        f"CAST(FLOOR(({_CV_TERM}) * 1e15 + 0.5) / 1e15"
        " AS DECIMAL(20,15)) AS term",
    )
    m = terms.agg(
        F.max("n").alias("n"),
        F.sum("term").cast("decimal(38,15)").alias("s"),
    )
    dims = obs.agg(
        F.countDistinct("seg").cast("long").alias("nr"),
        F.countDistinct("nat").cast("long").alias("nc"),
    )
    f = m.crossJoin(dims).selectExpr(
        "n",
        "nr",
        "nc",
        "s",
        "CASE WHEN nr < nc THEN nr ELSE nc END AS mindim",
    )
    return f.selectExpr(
        "n",
        "nr AS n_segments",
        "nc AS n_nations",
        f"FLOOR((CAST(n AS DOUBLE) * ({_CV_PHI2})) * 1e6 + 0.5) / 1e6"
        " AS chi2",
        f"FLOOR(({_CV_W}) * 1e9 + 0.5) / 1e9 AS cohen_w",
        f"CASE WHEN mindim > 1 THEN"
        f" FLOOR(({_CV_V}) * 1e9 + 0.5) / 1e9 END AS cramers_v",
        f"CASE WHEN FLOOR(({_CV_W}) * 1e9 + 0.5) / 1e9 < {_CV_SMALL}"
        f" THEN 'negligible'"
        f" WHEN FLOOR(({_CV_W}) * 1e9 + 0.5) / 1e9 < {_CV_MEDIUM}"
        f" THEN 'small'"
        f" WHEN FLOOR(({_CV_W}) * 1e9 + 0.5) / 1e9 < {_CV_LARGE}"
        f" THEN 'medium'"
        f" ELSE 'large' END AS effect_band",
    )


# ---------------------------------------------------------------------------
# E50 — Jensen-Shannon drift per event type (two time windows)
# ---------------------------------------------------------------------------

# ln(2) as a shared literal (not LN(2.0)) so both engines band and
# normalize against the identical IEEE constant.
_JSD_LN2 = "0.6931471805599453"

# Each half-term p·ln(2p/(p+q)) is an IEEE-identical textual fragment
# over the window proportions; a=0 (resp. b=0) contributes exactly 0
# by the p·ln p limit, handled by the CASE guard, so one-sided buckets
# are INCLUDED (each contributes p·ln2) — the structural advantage
# over PSI (E47), which must exclude them.
_JSD_PA = "(CAST(a_cnt AS DOUBLE) / n_a)"
_JSD_PB = "(CAST(b_cnt AS DOUBLE) / n_b)"
_JSD_TERM_A = f"{_JSD_PA} * LN(2.0 * {_JSD_PA} / ({_JSD_PA} + {_JSD_PB}))"
_JSD_TERM_B = f"{_JSD_PB} * LN(2.0 * {_JSD_PB} / ({_JSD_PA} + {_JSD_PB}))"

_JSD_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         LENGTH(CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                     AS VARCHAR)) AS bucket,
         CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END AS in_a
  FROM events WHERE value IS NOT NULL
),
h AS (
  SELECT event_type, bucket,
         CAST(SUM(in_a) AS BIGINT) AS a_cnt,
         CAST(SUM(1 - in_a) AS BIGINT) AS b_cnt
  FROM b GROUP BY 1, 2
),
t AS (
  SELECT *,
         CAST(SUM(a_cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
         CAST(SUM(b_cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
  FROM h
),
terms AS (
  SELECT event_type, n_a, n_b,
         CASE WHEN a_cnt > 0 THEN
           CAST(FLOOR(({_JSD_TERM_A}) * 1e9 + 0.5) / 1e9
                AS DECIMAL(18,9)) ELSE CAST(0 AS DECIMAL(18,9))
         END AS term_a,
         CASE WHEN b_cnt > 0 THEN
           CAST(FLOOR(({_JSD_TERM_B}) * 1e9 + 0.5) / 1e9
                AS DECIMAL(18,9)) ELSE CAST(0 AS DECIMAL(18,9))
         END AS term_b
  FROM t
),
p AS (
  SELECT event_type,
         MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CASE WHEN MAX(n_a) > 0 AND MAX(n_b) > 0 THEN
           CAST(SUM(term_a) + SUM(term_b) AS DOUBLE) / 2.0
         END AS jsd
  FROM terms GROUP BY event_type
)
SELECT event_type, n_a, n_b, n_buckets,
       FLOOR(jsd * 1e9 + 0.5) / 1e9 AS jsd_nats,
       FLOOR((jsd / {_JSD_LN2}) * 1e9 + 0.5) / 1e9 AS jsd_norm,
       CASE WHEN jsd IS NOT NULL THEN
         FLOOR(SQRT(GREATEST(jsd / {_JSD_LN2}, 0.0)) * 1e9 + 0.5) / 1e9
       END AS js_distance
FROM p ORDER BY event_type
"""


@query("agg-jsd-drift", oracle=_JSD_ORACLE)
@plan_cached("agg-jsd-drift")
def agg_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E50: Jensen-Shannon divergence per event type between the two
    KS time windows (Lin 1991) — the SYMMETRIC, BOUNDED member of the
    drift family: KS (E17) gives a significance verdict, PSI (E47)
    gives the banded magnitude ops teams alert on but must THROW AWAY
    one-sided buckets (its ln blows up), JSD is finite for any pair
    of distributions — a bucket seen in only one window contributes
    exactly p·ln2 — and lives in [0, ln 2], so 'jsd_norm' ∈ [0, 1] is
    comparable across types and its square root is a proper metric
    (Endres & Schindelin 2003), the right distance for downstream
    thresholding/clustering of drifted segments.

    Shape at 100 TB: identical to E47 — one scan collapses map-side
    to (type, digit-bucket) counts bounded by |types|×|digits|;
    per-type normalizers are windows over that AGGREGATED relation
    reusing its exchange; final bounded agg. Nothing downstream of
    the first aggregate touches raw rows.

    Parity: counts exact BIGINTs; each half-term p·ln(2p/(p+q)) is an
    IEEE-identical textual fragment snapped to 9 dp and summed as
    DECIMAL(18,9) (order-independent — the E20/E47 ln precedent);
    normalization divides by the shared _JSD_LN2 literal, never
    LN(2.0); GREATEST(·, 0) clamps snap-jitter before the sqrt; a
    type living entirely in one window → NULL in both engines."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    in_a = (F.col("ts") < _KS_SPLIT).cast("long")
    h = (
        e.select(
            "event_type",
            F.length(cents.cast("string")).alias("bucket"),
            in_a.alias("in_a"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("in_a").cast("long").alias("a_cnt"),
            F.sum(1 - F.col("in_a")).cast("long").alias("b_cnt"),
        )
    )
    tot = W.partitionBy("event_type")
    t = h.select(
        "event_type",
        "a_cnt",
        "b_cnt",
        F.sum("a_cnt").over(tot).cast("long").alias("n_a"),
        F.sum("b_cnt").over(tot).cast("long").alias("n_b"),
    )
    terms = t.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        f"CASE WHEN a_cnt > 0 THEN"
        f" CAST(FLOOR(({_JSD_TERM_A}) * 1e9 + 0.5) / 1e9"
        f" AS DECIMAL(18,9)) ELSE CAST(0 AS DECIMAL(18,9))"
        f" END AS term_a",
        f"CASE WHEN b_cnt > 0 THEN"
        f" CAST(FLOOR(({_JSD_TERM_B}) * 1e9 + 0.5) / 1e9"
        f" AS DECIMAL(18,9)) ELSE CAST(0 AS DECIMAL(18,9))"
        f" END AS term_b",
    )
    p = terms.groupBy("event_type").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.count("*").cast("long").alias("n_buckets"),
        F.expr(
            "CASE WHEN MAX(n_a) > 0 AND MAX(n_b) > 0 THEN"
            " CAST(SUM(term_a) + SUM(term_b) AS DOUBLE) / 2.0 END"
        ).alias("jsd"),
    )
    return p.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "n_buckets",
        "FLOOR(jsd * 1e9 + 0.5) / 1e9 AS jsd_nats",
        f"FLOOR((jsd / {_JSD_LN2}) * 1e9 + 0.5) / 1e9 AS jsd_norm",
        f"CASE WHEN jsd IS NOT NULL THEN"
        f" FLOOR(SQRT(GREATEST(jsd / {_JSD_LN2}, 0.0)) * 1e9 + 0.5) / 1e9"
        " END AS js_distance",
    ).orderBy("event_type")




# ---------------------------------------------------------------------------
# E51 — Kendall tau-b over the quantity × discount contingency
# ---------------------------------------------------------------------------

# tau-b with DOUBLED pair counts: n0' = n(n−1), n1' = Σ tx(tx−1),
# n2' = Σ ty(ty−1) stay exact DECIMAL(38,0) integers (t(t−1)/2 in
# DECIMAL would force a scale-changing division mid-pipeline); the ½
# factors out into the one final double fragment:
#   tau_b = (C − D) / (½·√((n0'−n1')·(n0'−n2')))
_KT_OK = "n0p - n1p > 0 AND n0p - n2p > 0"
_KT_TAU = (
    "CAST(conc - disc AS DOUBLE)"
    " / (0.5 * SQRT(CAST(n0p - n1p AS DOUBLE)"
    " * CAST(n0p - n2p AS DOUBLE)))"
)

_KENDALL_ORACLE = f"""
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
pairs AS (
  SELECT
    CAST(COALESCE(SUM(CASE WHEN b.y < a.y
                           THEN CAST(a.c AS DECIMAL(38,0)) * b.c END), 0)
         AS DECIMAL(38,0)) AS conc,
    CAST(COALESCE(SUM(CASE WHEN b.y > a.y
                           THEN CAST(a.c AS DECIMAL(38,0)) * b.c END), 0)
         AS DECIMAL(38,0)) AS disc
  FROM cells a JOIN cells b ON b.x < a.x
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM cells
),
margx AS (
  SELECT CAST(SUM(CAST(tx AS DECIMAL(38,0)) * (tx - 1))
              AS DECIMAL(38,0)) AS n1p
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS tx FROM cells GROUP BY x) q
),
margy AS (
  SELECT CAST(SUM(CAST(ty AS DECIMAL(38,0)) * (ty - 1))
              AS DECIMAL(38,0)) AS n2p
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS ty FROM cells GROUP BY y) q
),
f AS (
  SELECT n, n_cells, conc, disc, n1p, n2p,
         CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) AS DECIMAL(38,0)) AS n0p
  FROM pairs CROSS JOIN tot CROSS JOIN margx CROSS JOIN margy
)
SELECT n, n_cells,
       CAST(conc AS DOUBLE) AS concordant,
       CAST(disc AS DOUBLE) AS discordant,
       CAST(n1p AS DOUBLE) / 2.0 AS tied_x_pairs,
       CAST(n2p AS DOUBLE) / 2.0 AS tied_y_pairs,
       CASE WHEN {_KT_OK} THEN
         FLOOR(({_KT_TAU}) * 1e9 + 0.5) / 1e9 END AS tau_b
FROM f
"""


@query("agg-kendall-tau", oracle=_KENDALL_ORACLE)
@plan_cached("agg-kendall-tau")
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E51: Kendall's tau-b between order quantity and discount — the
    RANK-correlation sibling that completes the association family:
    OLS (E24) assumes linearity, Spearman (E37) ranks continuous-ish
    values, tau-b is the concordant-vs-discordant pair probability
    with EXACT tie correction (Kendall 1945) — the robust "do bigger
    orders get bigger discounts?" readout for heavily-tied integer /
    step-valued columns exactly like these two.

    Shape at 100 TB — the contingency trick, pair-counting flavored:
    ONE hash aggregate collapses the corpus to the |quantities| ×
    |discount steps| CELL relation (~550 cells, a CONSTANT at any
    corpus size); concordant/discordant counts come from a cell×cell
    self-join over that bounded relation (b.x < a.x with a CASE on
    y — ~300k cell pairs, data-size-independent, broadcastable); tie
    terms are two margin aggs over the same relation. NO row-level
    pair pass exists at any scale (the textbook O(n²) form).

    Parity: every pair count is a DECIMAL(38,0)-exact integer — the
    DOUBLED forms n0' = n(n−1), n1' = Σt(t−1) avoid any mid-pipeline
    DECIMAL division (the ½ factors into the final fragment);
    concordant/discordant/tie outputs are exact-integer-valued
    DOUBLEs (inside 2^53 at bench scale; at 1e12 rows emit the
    DECIMAL directly instead); tau_b is ONE shared textual fragment
    over exact operands, snapped at 9 dp; an all-tied column →
    NULL tau_b in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            F.col("l_quantity").cast("long").alias("x"),
            (dec("l_discount") * 100).cast("long").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # ~550 bounded rows consumed FIVE ways (both self-join sides,
        # totals, two margin aggs). No barrier (r16, verdict item 1):
        # every consumer shares the identical scan→partial-agg→
        # Exchange subtree (ReusedExchange — one corpus scan PER
        # ACTION; only the cell-bounded final agg re-runs per
        # consumer), so the plan-cache hit path re-executes from
        # parquet instead of a build-time materialization.
    )
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    pairs = a.join(b, F.col("bx") < F.col("ax")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("by") < F.col("ay"),
                    F.col("ac").cast("decimal(38,0)") * F.col("bc"),
                )
            ),
            F.lit(0),
        )
        .cast("decimal(38,0)")
        .alias("conc"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("by") > F.col("ay"),
                    F.col("ac").cast("decimal(38,0)") * F.col("bc"),
                )
            ),
            F.lit(0),
        )
        .cast("decimal(38,0)")
        .alias("disc"),
    )
    tot = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    margx = (
        cells.groupBy("x")
        .agg(F.sum("c").cast("long").alias("tx"))
        .agg(
            F.sum(F.expr("CAST(tx AS DECIMAL(38,0)) * (tx - 1)"))
            .cast("decimal(38,0)")
            .alias("n1p")
        )
    )
    margy = (
        cells.groupBy("y")
        .agg(F.sum("c").cast("long").alias("ty"))
        .agg(
            F.sum(F.expr("CAST(ty AS DECIMAL(38,0)) * (ty - 1)"))
            .cast("decimal(38,0)")
            .alias("n2p")
        )
    )
    f = (
        pairs.crossJoin(tot)
        .crossJoin(margx)
        .crossJoin(margy)
        .selectExpr(
            "n",
            "n_cells",
            "conc",
            "disc",
            "n1p",
            "n2p",
            "CAST(CAST(n AS DECIMAL(38,0)) * (n - 1)"
            " AS DECIMAL(38,0)) AS n0p",
        )
    )
    return f.selectExpr(
        "n",
        "n_cells",
        "CAST(conc AS DOUBLE) AS concordant",
        "CAST(disc AS DOUBLE) AS discordant",
        "CAST(n1p AS DOUBLE) / 2.0 AS tied_x_pairs",
        "CAST(n2p AS DOUBLE) / 2.0 AS tied_y_pairs",
        f"CASE WHEN {_KT_OK} THEN"
        f" FLOOR(({_KT_TAU}) * 1e9 + 0.5) / 1e9 END AS tau_b",
    )


# ---------------------------------------------------------------------------
# E52 — Tukey fences (1.5·IQR outliers) on per-user spend
# ---------------------------------------------------------------------------

# Boundary-exact fences: 1.5·IQR is half-integral in cents, so both
# comparisons run DOUBLED — outlier_low ⟺ 2x < 2·Q1 − 3·IQR — and no
# double ever gates a count (the F32 cross-multiply discipline).
_TUKEY_ORACLE = """
WITH pu AS (
  SELECT CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
dist AS (
  SELECT yc, CAST(COUNT(*) AS BIGINT) AS c FROM pu GROUP BY yc
),
cum AS (
  SELECT yc, c,
         CAST(SUM(c) OVER (ORDER BY yc ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cm,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM dist
),
q AS (
  SELECT MAX(n) AS n,
         MIN(CASE WHEN cm >= (25 * n + 99) // 100 THEN yc END) AS q1,
         MIN(CASE WHEN cm >= (75 * n + 99) // 100 THEN yc END) AS q3
  FROM cum
),
f AS (
  SELECT d.yc, d.c, q.n, q.q1, q.q3, q.q3 - q.q1 AS iqr
  FROM dist d CROSS JOIN q
)
SELECT MAX(n) AS n_users,
       MAX(q1) AS q1_cents,
       MAX(q3) AS q3_cents,
       MAX(iqr) AS iqr_cents,
       CAST(COALESCE(SUM(CASE WHEN 2 * yc < 2 * q1 - 3 * iqr
                              THEN c END), 0) AS BIGINT) AS n_low,
       CAST(COALESCE(SUM(CASE WHEN 2 * yc > 2 * q3 + 3 * iqr
                              THEN c END), 0) AS BIGINT) AS n_high,
       FLOOR((CAST(COALESCE(SUM(CASE WHEN 2 * yc < 2 * q1 - 3 * iqr
                                      OR 2 * yc > 2 * q3 + 3 * iqr
                                     THEN c END), 0) AS DOUBLE)
              / CAST(MAX(n) AS DOUBLE)) * 1e9 + 0.5) / 1e9
         AS outlier_frac
FROM f
"""


@query("agg-tukey-fences", oracle=_TUKEY_ORACLE)
# NOT @plan_cached (r16, verdict item 1): the build runs an eager
# localCheckpoint barrier — per-invocation work a plan-cache hit
# would silently skip (result caching, not plan caching).
def agg_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E52: Tukey's 1.5·IQR fences on per-user total spend (Tukey
    1977, the boxplot rule) — the quartile-based member completing
    the outlier-screen family: MAD (E13) is the median-centered
    robust z, Tukey is the distribution-free box rule every BI tool
    draws and every DQ pipeline implements first; the two disagree
    exactly on skewed spend tails, which is why platforms ship both.

    Shape at 100 TB: per-user collapse, then the E19 distribution
    trick — quartiles come from ONE cumulative window over the
    value-bounded (cents, count) relation, and the outlier counts
    from the SAME relation cross-joined with the one-row quartile
    relation; no raw-row sort, no second corpus pass.

    Parity: cents/quartiles/counts exact integers; 1.5·IQR is
    half-integral so the fence comparisons run DOUBLED (2x vs
    2·Q1 − 3·IQR) — boundary-EXACT, no double gates a count; the
    single fraction is one snapped division."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.coalesce((F.sum(dec("value")) * 100), F.lit(0))
        .cast("long")
        .alias("yc")
    )
    # bounded (cents, count) relation consumed twice (quartile window
    # + fence counts) — materialize once (the E45/E51 discipline):
    # only the user-agg EXCHANGE below it is shareable, so the lazy
    # form re-runs the user-scale final aggregate per consumer
    # (measured 0.66 vs 0.59 s/invocation at sf0.1, and duplicated
    # user-scale work at 100 TB). The barrier is per-invocation eager
    # work, which is why this key is NOT @plan_cached (r16).
    dist = (
        pu.groupBy("yc")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    cum = dist.select(
        "yc",
        "c",
        F.sum("c")
        .over(W.orderBy("yc").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("cm"),
        F.sum("c")
        .over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n"),
    )
    q = cum.agg(
        F.max("n").alias("n"),
        F.min(
            F.when(
                F.col("cm") >= F.expr("(25 * n + 99) div 100"), F.col("yc")
            )
        ).alias("q1"),
        F.min(
            F.when(
                F.col("cm") >= F.expr("(75 * n + 99) div 100"), F.col("yc")
            )
        ).alias("q3"),
    )
    f = dist.crossJoin(q).withColumn(
        "iqr", F.col("q3") - F.col("q1")
    )
    return f.selectExpr(
        "MAX(n) AS n_users",
        "MAX(q1) AS q1_cents",
        "MAX(q3) AS q3_cents",
        "MAX(iqr) AS iqr_cents",
        "CAST(COALESCE(SUM(CASE WHEN 2 * yc < 2 * q1 - 3 * iqr"
        " THEN c END), 0) AS BIGINT) AS n_low",
        "CAST(COALESCE(SUM(CASE WHEN 2 * yc > 2 * q3 + 3 * iqr"
        " THEN c END), 0) AS BIGINT) AS n_high",
        "FLOOR((CAST(COALESCE(SUM(CASE WHEN 2 * yc < 2 * q1 - 3 * iqr"
        " OR 2 * yc > 2 * q3 + 3 * iqr"
        " THEN c END), 0) AS DOUBLE)"
        " / CAST(MAX(n) AS DOUBLE)) * 1e9 + 0.5) / 1e9"
        " AS outlier_frac",
    )


# ---------------------------------------------------------------------------
# E53 — overdispersion (variance-to-mean ratio) of per-user event counts
# ---------------------------------------------------------------------------

# Poisson baseline: VMR = 1. The flag compares the SNAPPED vmr against
# the shared literal, so the banding is boundary-deterministic.
_VMR_OVER = "1.5"
_VMR_UNDER = "0.75"

_OVERDISP_ORACLE = f"""
WITH pc AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(k) AS BIGINT) AS s,
         CAST(SUM(CAST(k AS DECIMAL(38,0)) * k) AS DECIMAL(38,0)) AS sq
  FROM pc GROUP BY event_type
),
x AS (
  SELECT event_type, n_users, s,
         CAST(n_users AS DECIMAL(38,0)) * sq - CAST(s AS DECIMAL(38,0)) * s
           AS vn
  FROM m
)
SELECT event_type, n_users, s AS n_events,
       CAST(s AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_k,
       FLOOR((CAST(vn AS DOUBLE)
              / (CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE)))
             * 1e9 + 0.5) / 1e9 AS var_k,
       CASE WHEN s > 0 THEN
         FLOOR((CAST(vn AS DOUBLE)
                / (CAST(n_users AS DOUBLE) * CAST(s AS DOUBLE)))
               * 1e9 + 0.5) / 1e9 END AS vmr,
       CASE WHEN s = 0 THEN 'undefined'
            WHEN FLOOR((CAST(vn AS DOUBLE)
                 / (CAST(n_users AS DOUBLE) * CAST(s AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9 > {_VMR_OVER} THEN 'overdispersed'
            WHEN FLOOR((CAST(vn AS DOUBLE)
                 / (CAST(n_users AS DOUBLE) * CAST(s AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9 < {_VMR_UNDER} THEN 'underdispersed'
            ELSE 'poisson-like' END AS regime
FROM x ORDER BY event_type
"""


@query("agg-overdispersion", oracle=_OVERDISP_ORACLE)
@plan_cached("agg-overdispersion")
def agg_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E53: overdispersion screen — the variance-to-mean ratio (Fano
    factor) of per-user event counts per type, against the Poisson
    baseline VMR = 1: the model-selection gate for count data (VMR ≫ 1
    → negative-binomial land, where Poisson rate tests and CIs are
    anticonservative), the count-distribution sibling of the heavy-
    tail gate (E48 decides mean-vs-rank for VALUES, this decides
    Poisson-vs-NB for COUNTS). Banded on shared literals (1.5 / 0.75)
    over the SNAPPED vmr.

    Shape at 100 TB: two stacked map-side-combining hash aggregates —
    events → (type, user, k) → per-type moments (n, Σk, Σk²); nothing
    after the first aggregate touches raw rows, and the second is
    |types|-bounded.

    Parity: counts exact BIGINTs; the population-variance numerator
    vn = n·Σk² − (Σk)² is DECIMAL(38,0)-exact (the F32/I73 identity);
    mean is one division (davg precedent), var and vmr are single
    snapped chains — vmr = vn/(n·Σk) since vn/n² over Σk/n cancels
    one n; a type with zero events cannot exist by construction, the
    s = 0 guard still mirrors cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    pc = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    m = pc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("k").cast("long").alias("s"),
        F.sum(F.expr("CAST(k AS DECIMAL(38,0)) * k"))
        .cast("decimal(38,0)")
        .alias("sq"),
    )
    x = m.selectExpr(
        "event_type",
        "n_users",
        "s",
        "CAST(n_users AS DECIMAL(38,0)) * sq"
        " - CAST(s AS DECIMAL(38,0)) * s AS vn",
    )
    vmr = (
        "FLOOR((CAST(vn AS DOUBLE)"
        " / (CAST(n_users AS DOUBLE) * CAST(s AS DOUBLE)))"
        " * 1e9 + 0.5) / 1e9"
    )
    return x.selectExpr(
        "event_type",
        "n_users",
        "s AS n_events",
        "CAST(s AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_k",
        "FLOOR((CAST(vn AS DOUBLE)"
        " / (CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE)))"
        " * 1e9 + 0.5) / 1e9 AS var_k",
        f"CASE WHEN s > 0 THEN {vmr} END AS vmr",
        f"CASE WHEN s = 0 THEN 'undefined'"
        f" WHEN {vmr} > {_VMR_OVER} THEN 'overdispersed'"
        f" WHEN {vmr} < {_VMR_UNDER} THEN 'underdispersed'"
        f" ELSE 'poisson-like' END AS regime",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E54 — capture-recapture (Lincoln-Petersen) population estimate
# ---------------------------------------------------------------------------

# Chapman's bias-corrected estimator (Chapman 1951):
#   N̂ = (n1+1)(n2+1)/(m+1) − 1
# — defined even at m = 0 (unlike raw Lincoln-Petersen n1·n2/m), which
# is why production coverage estimators use it.
_CRC_NHAT = (
    "(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)"
    " / CAST(m + 1 AS DOUBLE)) - 1.0"
)

_CAPTURE_ORACLE = f"""
WITH pu AS (
  SELECT user_id,
         MAX(CASE WHEN ts <  TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END)
           AS in_a,
         MAX(CASE WHEN ts >= TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END)
           AS in_b
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS n1,
         CAST(SUM(in_b) AS BIGINT) AS n2,
         CAST(SUM(in_a * in_b) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_observed
  FROM pu
)
SELECT n1, n2, m, n_observed,
       FLOOR(({_CRC_NHAT}) * 1e9 + 0.5) / 1e9 AS n_hat,
       FLOOR((({_CRC_NHAT}) - n_observed) * 1e9 + 0.5) / 1e9
         AS est_unseen
FROM m
"""


@query("agg-capture-recapture", oracle=_CAPTURE_ORACLE)
@plan_cached("agg-capture-recapture")
def agg_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E54: capture-recapture population estimate — treat the two KS
    time windows as two independent "captures" of the user
    population and estimate the TRUE population incl. never-observed
    users from the overlap (Chapman's bias-corrected Lincoln-Petersen,
    the mark-recapture standard): the "how many users/dups/entities
    exist that we have not seen?" readout — the same estimator data
    teams run on two dedup passes or two crawls to size the unseen
    remainder, which no distinct-count (E2/E3) can answer.

    Shape at 100 TB: one per-user conditional-flag collapse (map-side
    combining MAX of 0/1 flags), then a ONE-ROW aggregate. Nothing
    touches raw rows after the first agg.

    Parity: capture counts and overlap exact BIGINTs; Chapman's
    estimator is one shared textual fragment over exact operands,
    snapped; m = 0 stays defined (the +1s), matching both engines."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("ts") < _KS_SPLIT, 1).otherwise(0)).alias(
            "in_a"
        ),
        F.max(F.when(F.col("ts") >= _KS_SPLIT, 1).otherwise(0)).alias(
            "in_b"
        ),
    )
    m = pu.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_observed"),
    )
    return m.selectExpr(
        "n1",
        "n2",
        "m",
        "n_observed",
        f"FLOOR(({_CRC_NHAT}) * 1e9 + 0.5) / 1e9 AS n_hat",
        f"FLOOR((({_CRC_NHAT}) - n_observed) * 1e9 + 0.5) / 1e9"
        " AS est_unseen",
    )


# ---------------------------------------------------------------------------
# E55 — confusion panel + MCC: does early spend rank predict late rank?
# ---------------------------------------------------------------------------

# MCC numerator/denominator over exact BIGINT confusion counts; the
# four margin factors each ≤ n, product ≤ n⁴ — DECIMAL(38,0)-exact to
# n ~ 3e9 users (document the DECIMAL ceiling, not a silent overflow).
_MCC_DEN_OK = "(tp+fp) > 0 AND (tp+fn) > 0 AND (tn+fp) > 0 AND (tn+fn) > 0"
_MCC = (
    "CAST(CAST(tp AS DECIMAL(38,0)) * tn"
    " - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)"
    " / SQRT(CAST(CAST(tp+fp AS DECIMAL(38,0)) * (tp+fn)"
    " * (tn+fp) * (tn+fn) AS DOUBLE))"
)

_CONFUSION_ORACLE = f"""
WITH pu AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}'
                       THEN CAST(value AS DECIMAL(12,2)) END), 0) * 100
              AS BIGINT) AS sa,
         CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_KS_SPLIT}'
                       THEN CAST(value AS DECIMAL(12,2)) END), 0) * 100
              AS BIGINT) AS sb
  FROM events GROUP BY user_id
),
qa AS (
  SELECT MIN(CASE WHEN cm >= (90 * n + 99) // 100 THEN sa END) AS ta
  FROM (SELECT sa, CAST(SUM(c) OVER (ORDER BY sa ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cm, CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM (SELECT sa, CAST(COUNT(*) AS BIGINT) AS c
              FROM pu GROUP BY sa) d) x
),
qb AS (
  SELECT MIN(CASE WHEN cm >= (90 * n + 99) // 100 THEN sb END) AS tb
  FROM (SELECT sb, CAST(SUM(c) OVER (ORDER BY sb ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cm, CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM (SELECT sb, CAST(COUNT(*) AS BIGINT) AS c
              FROM pu GROUP BY sb) d) x
),
cf AS (
  SELECT
    CAST(SUM(CASE WHEN sa >= ta AND sb >= tb THEN 1 ELSE 0 END)
         AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN sa >= ta AND sb <  tb THEN 1 ELSE 0 END)
         AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN sa <  ta AND sb >= tb THEN 1 ELSE 0 END)
         AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN sa <  ta AND sb <  tb THEN 1 ELSE 0 END)
         AS BIGINT) AS tn,
    MAX(ta) AS threshold_a, MAX(tb) AS threshold_b
  FROM pu CROSS JOIN qa CROSS JOIN qb
)
SELECT tp, fp, fn, tn, threshold_a, threshold_b,
  CASE WHEN tp + fp > 0 THEN
    FLOOR((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
          * 1e9 + 0.5) / 1e9 END AS precision_,
  CASE WHEN tp + fn > 0 THEN
    FLOOR((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
          * 1e9 + 0.5) / 1e9 END AS recall_,
  CASE WHEN 2 * tp + fp + fn > 0 THEN
    FLOOR((CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE))
          * 1e9 + 0.5) / 1e9 END AS f1,
  FLOOR((CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE))
        * 1e9 + 0.5) / 1e9 AS accuracy,
  CASE WHEN {_MCC_DEN_OK} THEN
    FLOOR(({_MCC}) * 1e9 + 0.5) / 1e9 END AS mcc
FROM cf
"""


@query("agg-confusion-mcc", oracle=_CONFUSION_ORACLE)
# NOT @plan_cached (r16, verdict item 1): the build runs an eager
# localCheckpoint barrier — per-invocation work a plan-cache hit
# would silently skip (result caching, not plan caching).
def agg_confusion_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E55: the classifier-evaluation panel AS A QUERY — confusion
    matrix, precision/recall/F1/accuracy and Matthews correlation —
    applied to a real product question: does a user's FIRST-period
    top-decile spend rank predict their SECOND-period rank? ("early
    signal predictiveness", the evaluation behind every early-whale /
    churn-risk heuristic.) MCC is the headline number because with a
    ~10% positive class, accuracy is a 90%-by-doing-nothing metric
    and F1 ignores TN — MCC is the one confusion summary robust to
    imbalance (Chicco & Jurman 2020); AUC (E28) scores a CONTINUOUS
    scorer, this panel scores a deployed THRESHOLD.

    Shape at 100 TB: one per-user two-flag collapse (map-side
    conditional sums), the E19 distribution trick PER HALF for the
    two p90 thresholds (value-bounded relations, localCheckpointed
    source reused three ways), both one-row thresholds cross-joined
    back, ONE conditional one-row aggregate. No row-level sorts.

    Parity: cents/thresholds/counts exact BIGINTs; nearest-rank via
    the integer ceil identity; MCC's numerator tp·tn − fp·fn and the
    four margin factors are DECIMAL(38,0)-exact (ceiling n ~ 3e9
    users documented at _MCC); every ratio one snapped chain with
    zero-margin guards NULLing identically in both engines."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") < _KS_SPLIT, dec("value"))) * 100,
                F.lit(0),
            )
            .cast("long")
            .alias("sa"),
            F.coalesce(
                F.sum(F.when(F.col("ts") >= _KS_SPLIT, dec("value"))) * 100,
                F.lit(0),
            )
            .cast("long")
            .alias("sb"),
        )
        # consumed three ways (two threshold derivations + the final
        # confusion agg) — the E45/E51/E52 materialize-once
        # discipline: the lazy form re-runs the user-scale final
        # aggregate per consumer (only the scan exchange is reused;
        # measured 1.25 vs 0.86 s/invocation at sf0.1). The barrier
        # is per-invocation eager work, which is why this key is NOT
        # @plan_cached (r16).
        .localCheckpoint(eager=True)
    )

    def p90(col: str, alias: str):
        dist = pu.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        cum = dist.select(
            col,
            F.sum("c")
            .over(
                W.orderBy(col).rowsBetween(W.unboundedPreceding, 0)
            )
            .cast("long")
            .alias("cm"),
            F.sum("c")
            .over(
                W.partitionBy().rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            )
            .cast("long")
            .alias("n"),
        )
        return cum.agg(
            F.min(
                F.when(
                    F.col("cm") >= F.expr("(90 * n + 99) div 100"),
                    F.col(col),
                )
            ).alias(alias)
        )

    cf = (
        pu.crossJoin(p90("sa", "ta"))
        .crossJoin(p90("sb", "tb"))
        .agg(
            F.sum(
                F.when((F.col("sa") >= F.col("ta"))
                       & (F.col("sb") >= F.col("tb")), 1).otherwise(0)
            ).cast("long").alias("tp"),
            F.sum(
                F.when((F.col("sa") >= F.col("ta"))
                       & (F.col("sb") < F.col("tb")), 1).otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(
                F.when((F.col("sa") < F.col("ta"))
                       & (F.col("sb") >= F.col("tb")), 1).otherwise(0)
            ).cast("long").alias("fn"),
            F.sum(
                F.when((F.col("sa") < F.col("ta"))
                       & (F.col("sb") < F.col("tb")), 1).otherwise(0)
            ).cast("long").alias("tn"),
            F.max("ta").alias("threshold_a"),
            F.max("tb").alias("threshold_b"),
        )
    )
    return cf.selectExpr(
        "tp", "fp", "fn", "tn", "threshold_a", "threshold_b",
        "CASE WHEN tp + fp > 0 THEN"
        " FLOOR((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))"
        " * 1e9 + 0.5) / 1e9 END AS precision_",
        "CASE WHEN tp + fn > 0 THEN"
        " FLOOR((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))"
        " * 1e9 + 0.5) / 1e9 END AS recall_",
        "CASE WHEN 2 * tp + fp + fn > 0 THEN"
        " FLOOR((CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE))"
        " * 1e9 + 0.5) / 1e9 END AS f1",
        "FLOOR((CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE))"
        " * 1e9 + 0.5) / 1e9 AS accuracy",
        f"CASE WHEN {_MCC_DEN_OK} THEN"
        f" FLOOR(({_MCC}) * 1e9 + 0.5) / 1e9 END AS mcc",
    )


# ---------------------------------------------------------------------------
# E56 — Mann-Kendall trend test over the daily revenue series
# ---------------------------------------------------------------------------

# Kendall's S over time: S = Σ_{i<j} sgn(x_j − x_i). The variance is
# the tie-corrected 18·Var(S) = n(n−1)(2n+5) − Σt(t−1)(2t+5), kept as
# an exact integer; z applies the standard continuity correction
# (S−1 for S>0, S+1 for S<0; Mann 1945 / Kendall 1975).
_MK_Z = (
    "(CAST(s_stat AS DOUBLE)"
    " - CAST(SIGN(CAST(s_stat AS DOUBLE)) AS DOUBLE))"
    " / SQRT(CAST(v18 AS DOUBLE) / 18.0)"
)
_MK_OK = "v18 > 0 AND s_stat <> 0"
_MK_CRIT = "1.959963985"  # two-sided 5% normal critical value

_MANNKENDALL_ORACLE = f"""
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS cents
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN b.cents > a.cents THEN 1
                                WHEN b.cents < a.cents THEN -1
                                ELSE 0 END), 0) AS BIGINT) AS s_stat
  FROM d a JOIN d b ON b.day > a.day
),
ties AS (
  SELECT CAST(COALESCE(SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)
                           * (2 * t + 5)), 0) AS DECIMAL(38,0)) AS tt
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY cents) q
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
f AS (
  SELECT s_stat, n,
         CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5) - tt
              AS DECIMAL(38,0)) AS v18
  FROM pairs CROSS JOIN ties CROSS JOIN nn
)
SELECT n AS n_days, s_stat,
       CASE WHEN {_MK_OK} THEN
         FLOOR(({_MK_Z}) * 1e9 + 0.5) / 1e9 END AS z_value,
       CASE WHEN NOT ({_MK_OK}) THEN 'none'
            WHEN ABS(FLOOR(({_MK_Z}) * 1e9 + 0.5) / 1e9)
                 <= {_MK_CRIT} THEN 'none'
            WHEN s_stat > 0 THEN 'increasing'
            ELSE 'decreasing' END AS trend
FROM f
"""


@query("agg-mann-kendall", oracle=_MANNKENDALL_ORACLE)
# NOT @plan_cached (r16, verdict item 1): the build runs an eager
# localCheckpoint barrier — per-invocation work a plan-cache hit
# would silently skip (result caching, not plan caching).
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E56: the Mann-Kendall trend test on daily revenue — the
    NONPARAMETRIC "is this series monotonically trending?" verdict
    (Mann 1945, Kendall 1975; the standard in hydrology/ops
    monitoring): S counts concordant-minus-discordant DAY PAIRS, so
    it is immune to the spend distribution's shape and to any
    monotone transform — the trend sibling of E46's rank-sum
    (location) and E51's tau (association), closing the
    nonparametric-readout family; OLS trend (E24) fits a SLOPE,
    this tests DIRECTION with tie-corrected significance.

    Shape at 100 TB: events collapse map-side to the CALENDAR-bounded
    day relation, and the O(n²) pair pass runs over DAYS (n ~ 365/yr
    — a constant in corpus size, ~3M pairs per decade), never rows;
    the tie term and n come from aggs over the same bounded relation.

    Parity: S and the tie-corrected 18·Var(S) are exact integers
    (DECIMAL(38,0) for the cubic terms); z is one shared textual
    fragment with the standard continuity correction, snapped; the
    verdict compares the SNAPPED |z| against the shared critical
    literal; a constant series (v18 = 0) → NULL z, 'none'."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            F.expr(
                "CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)"
            ).alias("day")
        )
        .agg(
            F.coalesce(F.sum(dec("value") * 100), F.lit(0))
            .cast("long")
            .alias("cents")
        )
        # calendar-bounded relation consumed three ways (both pair
        # sides + ties/n) — materialize once (the E51/E52 discipline;
        # the r16 lazy experiment measured the same wall time with
        # two corpus scans per action — no win to buy the static
        # multi-scan shape). The barrier is per-invocation eager
        # work, which is why this key is NOT @plan_cached (r16).
        .localCheckpoint(eager=True)
    )
    a = d.select(F.col("day").alias("aday"), F.col("cents").alias("ac"))
    b = d.select(F.col("day").alias("bday"), F.col("cents").alias("bc"))
    pairs = a.join(b, F.col("bday") > F.col("aday")).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("bc") > F.col("ac"), 1)
                .when(F.col("bc") < F.col("ac"), -1)
                .otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("s_stat")
    )
    # r15: tt and n from ONE branch — n_days is Σt over the cents
    # groups, so the separate d.agg(count) pass (and its crossJoin)
    # folds into the tie aggregate.
    ties = (
        d.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)"
                    )
                ),
                F.lit(0),
            )
            .cast("decimal(38,0)")
            .alias("tt"),
            F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n"),
        )
    )
    f = pairs.crossJoin(ties).selectExpr(
        "s_stat",
        "n",
        "CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5) - tt"
        " AS DECIMAL(38,0)) AS v18",
    )
    return f.selectExpr(
        "n AS n_days",
        "s_stat",
        f"CASE WHEN {_MK_OK} THEN"
        f" FLOOR(({_MK_Z}) * 1e9 + 0.5) / 1e9 END AS z_value",
        f"CASE WHEN NOT ({_MK_OK}) THEN 'none'"
        f" WHEN ABS(FLOOR(({_MK_Z}) * 1e9 + 0.5) / 1e9)"
        f" <= {_MK_CRIT} THEN 'none'"
        f" WHEN s_stat > 0 THEN 'increasing'"
        f" ELSE 'decreasing' END AS trend",
    )


# ---------------------------------------------------------------------------
# E57 — agg-ratio-delta-ci: delta-method inference for a ratio metric
# ---------------------------------------------------------------------------

# Shared textual fragments (identical in both engines) over the exact
# conditional sums: R = Sx/Sy, and the delta-method variance of the
# ratio-of-sums estimator,
#   var(R̂) = (Sxx − 2R·Sxy + R²·Syy − n·mv²·(…)) …
# computed in its numerically direct form
#   var(R̂) ≈ (vxx − 2R·vxy + R²·vyy) / (n · ȳ²)
# with vxx = Sxx/n − x̄², vxy = Sxy/n − x̄ȳ, vyy = Syy/n − ȳ².
def _ratio_frags(a: str) -> dict[str, str]:
    n = f"CAST(n{a} AS DOUBLE)"
    sx = f"CAST(sx{a} AS DOUBLE)"
    sy = f"CAST(sy{a} AS DOUBLE)"
    sxx = f"CAST(qx{a} AS DOUBLE)"
    syy = f"CAST(qy{a} AS DOUBLE)"
    sxy = f"CAST(qxy{a} AS DOUBLE)"
    r = f"({sx} / {sy})"
    mx, my = f"({sx} / {n})", f"({sy} / {n})"
    vxx = f"({sxx} / {n} - {mx} * {mx})"
    vyy = f"({syy} / {n} - {my} * {my})"
    vxy = f"({sxy} / {n} - {mx} * {my})"
    var = (
        f"(({vxx} - 2.0 * {r} * {vxy} + {r} * {r} * {vyy})"
        f" / ({n} * {my} * {my}))"
    )
    return {"r": r, "var": var}


_RD_F0 = _ratio_frags("0")
_RD_F1 = _ratio_frags("1")
_RD_GUARD = "n0 >= 2 AND n1 >= 2 AND sy0 > 0 AND sy1 > 0"

_RATIO_DELTA_ORACLE = f"""
WITH per_user AS (
  SELECT {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2
           AS v,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS xc,
         CAST(COUNT(*) AS BIGINT) AS yc
  FROM events GROUP BY user_id
),
m AS (
  SELECT
    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN xc END), 0)
         AS DECIMAL(38,0)) AS sx0,
    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN xc END), 0)
         AS DECIMAL(38,0)) AS sx1,
    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN yc END), 0)
         AS DECIMAL(38,0)) AS sy0,
    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN yc END), 0)
         AS DECIMAL(38,0)) AS sy1,
    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN CAST(xc AS DECIMAL(38,0))
                           * xc END), 0) AS DECIMAL(38,0)) AS qx0,
    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN CAST(xc AS DECIMAL(38,0))
                           * xc END), 0) AS DECIMAL(38,0)) AS qx1,
    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN CAST(yc AS DECIMAL(38,0))
                           * yc END), 0) AS DECIMAL(38,0)) AS qy0,
    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN CAST(yc AS DECIMAL(38,0))
                           * yc END), 0) AS DECIMAL(38,0)) AS qy1,
    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN CAST(xc AS DECIMAL(38,0))
                           * yc END), 0) AS DECIMAL(38,0)) AS qxy0,
    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN CAST(xc AS DECIMAL(38,0))
                           * yc END), 0) AS DECIMAL(38,0)) AS qxy1
  FROM per_user
)
SELECT n0, n1,
       CAST(sx0 AS BIGINT) AS sum_num_0,
       CAST(sx1 AS BIGINT) AS sum_num_1,
       CAST(sy0 AS BIGINT) AS sum_den_0,
       CAST(sy1 AS BIGINT) AS sum_den_1,
       CASE WHEN sy0 > 0 THEN
         FLOOR({_RD_F0["r"]} * 1e9 + 0.5) / 1e9 END AS ratio_0,
       CASE WHEN sy1 > 0 THEN
         FLOOR({_RD_F1["r"]} * 1e9 + 0.5) / 1e9 END AS ratio_1,
       CASE WHEN {_RD_GUARD} THEN
         FLOOR(SQRT({_RD_F0["var"]}) * 1e9 + 0.5) / 1e9 END AS se_0,
       CASE WHEN {_RD_GUARD} THEN
         FLOOR(SQRT({_RD_F1["var"]}) * 1e9 + 0.5) / 1e9 END AS se_1,
       CASE WHEN {_RD_GUARD}
                 AND {_RD_F0["var"]} + {_RD_F1["var"]} > 0 THEN
         FLOOR(({_RD_F1["r"]} - {_RD_F0["r"]})
               / SQRT({_RD_F0["var"]} + {_RD_F1["var"]})
               * 1e9 + 0.5) / 1e9 END AS z
FROM m
"""


@query("agg-ratio-delta-ci", oracle=_RATIO_DELTA_ORACLE)
@plan_cached("agg-ratio-delta-ci")
def agg_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E57: delta-method inference for a RATIO metric (revenue per
    event) between two hash-split arms — the experimentation family's
    missing member: E30's Welch test covers per-user MEANS, but most
    product metrics are ratios of sums (revenue/session, CTR,
    items/order) whose denominator is itself random, so the naive
    per-user t-test is wrong and the standard correction (Deng et al.
    2013, the delta method) expands var(Σx/Σy) around the means:
    var(R̂) ≈ (var x − 2R·cov(x,y) + R²·var y) / (n·ȳ²). Emits both
    arms' ratio, delta-method SE, and the two-sample z for the ratio
    difference.

    Parity: per-user numerators are exact cents (the E30 DECIMAL
    discipline), denominators exact counts; all five sufficient
    statistics per arm (Σx, Σy, Σx², Σy², Σxy) are DECIMAL(38,0)
    conditional sums — order-free exact integer arithmetic; every
    ratio/SE/z is a shared textual double expression over those exact
    operands, snapped at 9 dp; degenerate arms (n < 2 or zero
    denominator mass) yield NULLs identically in both engines.

    Shape at 100 TB: the E30 plan — one per-user groupBy absorbs
    event volume map-side, ONE conditional aggregate collapses users
    to a single sufficient-statistics row (partial aggregation does
    the work; nothing but one row crosses the final exchange)."""
    e = load_table(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.coalesce(F.sum(dec("value") * 100), F.lit(0))
        .cast("long")
        .alias("xc"),
        F.count("*").cast("long").alias("yc"),
    )
    pv = pu.select(
        F.pmod(
            md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("v"),
        "xc",
        "yc",
    )

    def _csum(cond: str, expr: str) -> F.Column:
        return F.coalesce(
            F.sum(F.expr(f"CASE WHEN {cond} THEN {expr} END")), F.lit(0)
        ).cast("decimal(38,0)")

    m = pv.agg(
        F.sum(F.expr("CASE WHEN v = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n0"),
        F.sum(F.expr("CASE WHEN v = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n1"),
        _csum("v = 0", "xc").alias("sx0"),
        _csum("v = 1", "xc").alias("sx1"),
        _csum("v = 0", "yc").alias("sy0"),
        _csum("v = 1", "yc").alias("sy1"),
        _csum("v = 0", "CAST(xc AS DECIMAL(38,0)) * xc").alias("qx0"),
        _csum("v = 1", "CAST(xc AS DECIMAL(38,0)) * xc").alias("qx1"),
        _csum("v = 0", "CAST(yc AS DECIMAL(38,0)) * yc").alias("qy0"),
        _csum("v = 1", "CAST(yc AS DECIMAL(38,0)) * yc").alias("qy1"),
        _csum("v = 0", "CAST(xc AS DECIMAL(38,0)) * yc").alias("qxy0"),
        _csum("v = 1", "CAST(xc AS DECIMAL(38,0)) * yc").alias("qxy1"),
    )
    return m.selectExpr(
        "n0",
        "n1",
        "CAST(sx0 AS BIGINT) AS sum_num_0",
        "CAST(sx1 AS BIGINT) AS sum_num_1",
        "CAST(sy0 AS BIGINT) AS sum_den_0",
        "CAST(sy1 AS BIGINT) AS sum_den_1",
        f"CASE WHEN sy0 > 0 THEN"
        f" FLOOR({_RD_F0['r']} * 1e9 + 0.5) / 1e9 END AS ratio_0",
        f"CASE WHEN sy1 > 0 THEN"
        f" FLOOR({_RD_F1['r']} * 1e9 + 0.5) / 1e9 END AS ratio_1",
        f"CASE WHEN {_RD_GUARD} THEN"
        f" FLOOR(SQRT({_RD_F0['var']}) * 1e9 + 0.5) / 1e9 END AS se_0",
        f"CASE WHEN {_RD_GUARD} THEN"
        f" FLOOR(SQRT({_RD_F1['var']}) * 1e9 + 0.5) / 1e9 END AS se_1",
        f"CASE WHEN {_RD_GUARD}"
        f" AND {_RD_F0['var']} + {_RD_F1['var']} > 0 THEN"
        f" FLOOR(({_RD_F1['r']} - {_RD_F0['r']})"
        f" / SQRT({_RD_F0['var']} + {_RD_F1['var']})"
        f" * 1e9 + 0.5) / 1e9 END AS z",
    )


# ---------------------------------------------------------------------------
# E58 — agg-poisson-rate-test: two-sample event-rate z with real exposure
# ---------------------------------------------------------------------------

# Rate = events per active user-day; the two-sample Poisson normal
# approximation z = (r1 − r0) / √(X0/T0² + X1/T1²) with X = event
# count and T = exposure (distinct user-days). E23's proportion test
# compares CONVERTER FRACTIONS; this compares INTENSITIES against
# exposure — the correct family for "did the event rate change?"
# questions where one user can contribute many events.
_PRT_R = "(CAST(x{a} AS DOUBLE) / CAST(t{a} AS DOUBLE))"
_PRT_GUARD = "t0 > 0 AND t1 > 0 AND x0 + x1 > 0"

_POISSON_RATE_ORACLE = f"""
WITH e AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2 AS v
  FROM events
),
m AS (
  SELECT
    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN 1 END), 0) AS BIGINT) AS x0,
    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN 1 END), 0) AS BIGINT) AS x1,
    CAST(COUNT(DISTINCT CASE WHEN v = 0
                             THEN user_id * 100000 + day END)
         AS BIGINT) AS t0,
    CAST(COUNT(DISTINCT CASE WHEN v = 1
                             THEN user_id * 100000 + day END)
         AS BIGINT) AS t1
  FROM e
)
SELECT x0, x1, t0, t1,
       CASE WHEN t0 > 0 THEN
         FLOOR({_PRT_R.format(a="0")} * 1e9 + 0.5) / 1e9 END AS rate_0,
       CASE WHEN t1 > 0 THEN
         FLOOR({_PRT_R.format(a="1")} * 1e9 + 0.5) / 1e9 END AS rate_1,
       CASE WHEN {_PRT_GUARD} THEN
         FLOOR(({_PRT_R.format(a="1")} - {_PRT_R.format(a="0")})
               / SQRT(CAST(x0 AS DOUBLE)
                      / (CAST(t0 AS DOUBLE) * CAST(t0 AS DOUBLE))
                      + CAST(x1 AS DOUBLE)
                      / (CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)))
               * 1e9 + 0.5) / 1e9 END AS z
FROM m
"""


@query("agg-poisson-rate-test", oracle=_POISSON_RATE_ORACLE)
@plan_cached("agg-poisson-rate-test")
def agg_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E58: two-sample Poisson rate test — events per ACTIVE USER-DAY
    between two hash-split arms, the intensity member of the
    experimentation family: E23 tests converter proportions (one
    Bernoulli per user), E30 tests per-user means, E57 ratio-of-sums
    metrics; this tests event INTENSITY against real exposure, the
    correct form for "did the alert/purchase/error RATE change?"
    where one unit contributes many events and uneven activity spans
    would bias a per-user comparison. Exposure is distinct
    (user, day) pairs; z is the standard normal approximation
    (r1 − r0)/√(X0/T0² + X1/T1²).

    Parity: counts and exposures are exact BIGINTs — exposure counts
    DISTINCT composite keys (user·10⁵ + day, collision-free at the
    fixture's day range and at any realistic one); rates and z are
    shared textual snapped divisions over exact operands; empty arms
    yield NULLs in both engines.

    Shape at 100 TB: ONE aggregate over the event scan — the arm is a
    map-side hash, the exposure a distinct-count the partial
    aggregation absorbs; a single sufficient-statistics row crosses
    the exchange. (At extreme cardinality the distinct would become
    an approx_count_distinct or a two-level agg — declared here as
    the exact form the oracle can certify.)"""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        F.pmod(
            md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("v"),
        F.expr(
            "user_id * 100000"
            " + CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)"
        ).alias("ud"),
    )
    m = base.agg(
        F.coalesce(
            F.sum(F.expr("CASE WHEN v = 0 THEN 1 END")), F.lit(0)
        ).cast("long").alias("x0"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN v = 1 THEN 1 END")), F.lit(0)
        ).cast("long").alias("x1"),
        F.countDistinct(
            F.expr("CASE WHEN v = 0 THEN ud END")
        ).cast("long").alias("t0"),
        F.countDistinct(
            F.expr("CASE WHEN v = 1 THEN ud END")
        ).cast("long").alias("t1"),
    )
    return m.selectExpr(
        "x0",
        "x1",
        "t0",
        "t1",
        f"CASE WHEN t0 > 0 THEN"
        f" FLOOR({_PRT_R.format(a='0')} * 1e9 + 0.5) / 1e9 END AS rate_0",
        f"CASE WHEN t1 > 0 THEN"
        f" FLOOR({_PRT_R.format(a='1')} * 1e9 + 0.5) / 1e9 END AS rate_1",
        f"CASE WHEN {_PRT_GUARD} THEN"
        f" FLOOR(({_PRT_R.format(a='1')} - {_PRT_R.format(a='0')})"
        f" / SQRT(CAST(x0 AS DOUBLE)"
        f" / (CAST(t0 AS DOUBLE) * CAST(t0 AS DOUBLE))"
        f" + CAST(x1 AS DOUBLE)"
        f" / (CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)))"
        f" * 1e9 + 0.5) / 1e9 END AS z",
    )


# ---------------------------------------------------------------------------
# E59 — agg-diff-in-diff: 2×2 difference-in-differences estimator
# ---------------------------------------------------------------------------

# Period split: fixed calendar pivot (2024-01-16 = epoch day 19738),
# the same literal in both engines; units are (user, period) cells
# with exact integer cents.
_DID_PIVOT_DAY = 19738


def _did_cell(a: str) -> dict[str, str]:
    n = f"CAST(n{a} AS DOUBLE)"
    sm = f"CAST(s{a} AS DOUBLE)"
    q = f"CAST(q{a} AS DOUBLE)"
    mean = f"({sm} / {n})"
    # population variance of the cell mean: (Σy²/n − ȳ²)/n
    varm = f"(({q} / {n} - {mean} * {mean}) / {n})"
    return {"mean": mean, "varm": varm}


_DID_C = {a: _did_cell(a) for a in ("00", "01", "10", "11")}
_DID_GUARD = " AND ".join(f"n{a} >= 2" for a in ("00", "01", "10", "11"))
_DID_EST = (
    f"(({_DID_C['11']['mean']} - {_DID_C['10']['mean']})"
    f" - ({_DID_C['01']['mean']} - {_DID_C['00']['mean']}))"
)
_DID_SE = (
    f"SQRT({_DID_C['00']['varm']} + {_DID_C['01']['varm']}"
    f" + {_DID_C['10']['varm']} + {_DID_C['11']['varm']})"
)

_DID_ORACLE = f"""
WITH pu AS (
  SELECT user_id,
         {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2 AS g,
         CASE WHEN CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                   < {_DID_PIVOT_DAY} THEN 0 ELSE 1 END AS p,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) * 100
              AS BIGINT) AS yc
  FROM events GROUP BY 1, 2, 3
),
m AS (
  SELECT
    {", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN g = {a[0]} AND p = {a[1]} THEN 1 END), 0) AS BIGINT) AS n{a}, "
        f"CAST(COALESCE(SUM(CASE WHEN g = {a[0]} AND p = {a[1]} THEN yc END), 0) AS DECIMAL(38,0)) AS s{a}, "
        f"CAST(COALESCE(SUM(CASE WHEN g = {a[0]} AND p = {a[1]} THEN CAST(yc AS DECIMAL(38,0)) * yc END), 0) AS DECIMAL(38,0)) AS q{a}"
        for a in ("00", "01", "10", "11")
    )}
  FROM pu
)
SELECT n00, n01, n10, n11,
       {", ".join(
        f"CASE WHEN n{a} > 0 THEN FLOOR({_DID_C[a]['mean']} * 1e9 + 0.5) / 1e9 END AS mean_{a}"
        for a in ("00", "01", "10", "11")
       )},
       CASE WHEN {_DID_GUARD} THEN
         FLOOR({_DID_EST} * 1e9 + 0.5) / 1e9 END AS did,
       CASE WHEN {_DID_GUARD} THEN
         FLOOR({_DID_SE} * 1e9 + 0.5) / 1e9 END AS se,
       CASE WHEN {_DID_GUARD} AND {_DID_SE} > 0 THEN
         FLOOR({_DID_EST} / {_DID_SE} * 1e9 + 0.5) / 1e9 END AS z
FROM m
"""


@query("agg-diff-in-diff", oracle=_DID_ORACLE)
@plan_cached("agg-diff-in-diff")
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E59: 2×2 difference-in-differences — the quasi-experimental
    estimator for rollouts WITHOUT randomization-at-exposure: group
    (hash-split) × period (fixed calendar pivot) cell means of
    per-user-period spend, ATT = (ȳ₁₁−ȳ₁₀) − (ȳ₀₁−ȳ₀₀), SE from the
    four independent cell-mean variances, z for the interaction. The
    observational counterpart to E30/E57's randomized tests —
    parallel-trends is the caveat the docstring owns, not hides.

    Parity: per-(user, period) outcomes are exact cents; each cell's
    (n, Σy, Σy²) are exact conditional BIGINT/DECIMAL(38,0) sums; cell
    means, the DiD contrast, SE and z are shared textual snapped
    chains; any cell with n < 2 NULLs the inference in both engines.

    Shape at 100 TB: one per-(user, period) groupBy absorbs event
    volume map-side (the E30 plan with a composite key), then ONE
    conditional aggregate collapses to a single 12-statistic row."""
    e = load_table(spark, sf_dir, "events")
    pu = e.groupBy(
        "user_id",
        F.expr(
            f"CASE WHEN CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)"
            f" < {_DID_PIVOT_DAY} THEN 0 ELSE 1 END"
        ).alias("p"),
    ).agg(
        F.coalesce(F.sum(dec("value") * 100), F.lit(0))
        .cast("long")
        .alias("yc")
    )
    pv = pu.select(
        F.pmod(
            md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
        ).alias("g"),
        "p",
        "yc",
    )
    aggs = []
    for a in ("00", "01", "10", "11"):
        cond = f"g = {a[0]} AND p = {a[1]}"
        aggs.append(
            F.coalesce(
                F.sum(F.expr(f"CASE WHEN {cond} THEN 1 END")), F.lit(0)
            ).cast("long").alias(f"n{a}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.expr(f"CASE WHEN {cond} THEN yc END")), F.lit(0)
            ).cast("decimal(38,0)").alias(f"s{a}")
        )
        aggs.append(
            F.coalesce(
                F.sum(
                    F.expr(
                        f"CASE WHEN {cond}"
                        " THEN CAST(yc AS DECIMAL(38,0)) * yc END"
                    )
                ),
                F.lit(0),
            ).cast("decimal(38,0)").alias(f"q{a}")
        )
    m = pv.agg(*aggs)
    cells = [
        f"CASE WHEN n{a} > 0 THEN"
        f" FLOOR({_DID_C[a]['mean']} * 1e9 + 0.5) / 1e9 END AS mean_{a}"
        for a in ("00", "01", "10", "11")
    ]
    return m.selectExpr(
        "n00",
        "n01",
        "n10",
        "n11",
        *cells,
        f"CASE WHEN {_DID_GUARD} THEN"
        f" FLOOR({_DID_EST} * 1e9 + 0.5) / 1e9 END AS did",
        f"CASE WHEN {_DID_GUARD} THEN"
        f" FLOOR({_DID_SE} * 1e9 + 0.5) / 1e9 END AS se",
        f"CASE WHEN {_DID_GUARD} AND {_DID_SE} > 0 THEN"
        f" FLOOR({_DID_EST} / {_DID_SE} * 1e9 + 0.5) / 1e9 END AS z",
    )


# ---------------------------------------------------------------------------
# E60 — agg-bh-fdr: Benjamini-Hochberg FDR control over the metric family
# ---------------------------------------------------------------------------

_BH_Q = "0.10"  # FDR level, shared literal

# Standard normal CDF via Abramowitz-Stegun 26.2.17 (|err| < 7.5e-8,
# far inside the 9-dp snap) — neither engine ships Phi, so BOTH
# evaluate this same textual chain over the SNAPPED |z|. EXP/SQRT are
# the only libm calls; the final p snaps to 9 dp, absorbing any
# last-ulp library split (the LN/SQRT precedent of E48/F39).
_BH_T = "(1.0 / (1.0 + 0.2316419 * az))"
_BH_PHI_TAIL = (
    "(EXP(-az * az / 2.0) / 2.5066282746310002"
    f" * ((((1.330274429 * {_BH_T} - 1.821255978) * {_BH_T}"
    f" + 1.781477937) * {_BH_T} - 0.356563782) * {_BH_T}"
    f" + 0.319381530) * {_BH_T})"
)
_BH_P = f"FLOOR(2.0 * {_BH_PHI_TAIL} * 1e9 + 0.5) / 1e9"

_BH_Z_NUM = (
    "(CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE)"
    " - CAST(xa AS DOUBLE) / CAST(na AS DOUBLE))"
)
_BH_Z_DEN = (
    "SQRT(CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE)"
    " * (1.0 - CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))"
    " * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))"
)
_BH_Z = f"FLOOR({_BH_Z_NUM} / {_BH_Z_DEN} * 1e9 + 0.5) / 1e9"
_BH_GUARD = "na > 0 AND nb > 0 AND xa + xb > 0 AND xa + xb < na + nb"

_BH_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id,
         {MD5_PREFIX60_SQL.format(x="CAST(user_id AS VARCHAR)")} % 2 AS v
  FROM events
),
pop AS (
  SELECT CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM u
),
conv AS (
  SELECT e.event_type,
         CAST(COUNT(DISTINCT CASE WHEN u.v = 0 THEN e.user_id END)
              AS BIGINT) AS xa,
         CAST(COUNT(DISTINCT CASE WHEN u.v = 1 THEN e.user_id END)
              AS BIGINT) AS xb
  FROM events e JOIN u ON e.user_id = u.user_id
  GROUP BY e.event_type
),
zt AS (
  SELECT event_type, xa, xb, na, nb,
         CASE WHEN {_BH_GUARD} THEN {_BH_Z} END AS z
  FROM conv CROSS JOIN pop
),
pt AS (
  SELECT event_type, xa, xb, z, abs(z) AS az FROM zt
),
pv AS (
  SELECT event_type, xa, xb, z,
         CASE WHEN z IS NOT NULL THEN {_BH_P} END AS p
  FROM pt
),
rk AS (
  SELECT event_type, xa, xb, z, p,
         CAST(ROW_NUMBER() OVER (ORDER BY p, event_type) AS BIGINT)
           AS rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM pv
),
km AS (
  SELECT *,
         MAX(CASE WHEN p <= CAST(rank AS DOUBLE) * {_BH_Q}
                           / CAST(m AS DOUBLE)
                  THEN rank END) OVER () AS k_max
  FROM rk
)
SELECT event_type, xa, xb, z, p, rank, m,
       FLOOR(CAST(rank AS DOUBLE) * {_BH_Q} / CAST(m AS DOUBLE)
             * 1e9 + 0.5) / 1e9 AS bh_critical,
       COALESCE(rank <= k_max, FALSE) AS rejected
FROM km ORDER BY event_type
"""


@query("agg-bh-fdr", oracle=_BH_ORACLE)
@plan_cached("agg-bh-fdr")
def agg_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E60: Benjamini-Hochberg FDR control over the per-metric test
    family — the multiple-comparisons discipline the rest of the
    experimentation family (E23/E30/E57/E58/E59 all emit z statistics)
    deliberately leaves to the caller: per event type, the pooled
    two-proportion z between hash-split arms becomes a two-sided p
    (standard normal CDF via the shared Abramowitz-Stegun 26.2.17
    chain — neither engine ships Φ), p-values rank ascending, and the
    BH(q=0.10) step-up rule rejects ranks ≤ max{{k : p₍ₖ₎ ≤ kq/m}} —
    the procedure that keeps a 5-metric dashboard from shipping one
    false discovery per week.

    Parity: counts exact (the E23 distinct-user discipline); z snapped
    BEFORE |z| enters the CDF chain so both engines evaluate the same
    polynomial on identical inputs; p snapped; the step-up compare
    p ≤ k·q/m is over snapped p and a shared textual critical value;
    ties in p rank by event_type, and NULL p ranks LAST in both
    engines (DuckDB's ASC default; asc_nulls_last pins it in Spark).
    Degenerate metrics (empty arm, all-or-none conversion) yield NULL
    z/p and never reject.

    Shape at 100 TB: one distinct user-arm relation (map-side), one
    per-type distinct-converter aggregate, then every window runs
    over the TYPES-bounded relation (a handful of rows) — the
    corpus never reaches the BH machinery."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.pmod(
                md5_prefix60(F.col("user_id").cast("string")), F.lit(2)
            ).alias("v"),
        )
    )
    pop = u.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    conv = (
        ev.join(u, "user_id")
        .groupBy("event_type")
        .agg(
            F.countDistinct(
                F.expr("CASE WHEN v = 0 THEN user_id END")
            ).cast("long").alias("xa"),
            F.countDistinct(
                F.expr("CASE WHEN v = 1 THEN user_id END")
            ).cast("long").alias("xb"),
        )
    )
    zt = conv.crossJoin(F.broadcast(pop)).selectExpr(
        "event_type",
        "xa",
        "xb",
        f"CASE WHEN {_BH_GUARD} THEN {_BH_Z} END AS z",
    )
    pv = zt.selectExpr(
        "event_type", "xa", "xb", "z", "abs(z) AS az"
    ).selectExpr(
        "event_type",
        "xa",
        "xb",
        "z",
        f"CASE WHEN z IS NOT NULL THEN {_BH_P} END AS p",
    )
    # asc_nulls_last: DuckDB's plain ASC sorts NULLs LAST while Spark's
    # sorts them FIRST — a degenerate metric with NULL p (saturated or
    # empty arm failing _BH_GUARD) would shift every rank in Spark but
    # not in the oracle (ADVICE r13, pinned by the saturated-type test).
    w = W.orderBy(F.asc_nulls_last("p"), F.asc("event_type"))
    full = W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    rk = pv.select(
        "event_type",
        "xa",
        "xb",
        "z",
        "p",
        F.row_number().over(w).cast("long").alias("rank"),
        F.count("*").over(full).cast("long").alias("m"),
    )
    km = rk.select(
        "*",
        F.max(
            F.expr(
                f"CASE WHEN p <= CAST(rank AS DOUBLE) * {_BH_Q}"
                f" / CAST(m AS DOUBLE) THEN rank END"
            )
        ).over(full).alias("k_max"),
    )
    return km.selectExpr(
        "event_type",
        "xa",
        "xb",
        "z",
        "p",
        "rank",
        "m",
        f"FLOOR(CAST(rank AS DOUBLE) * {_BH_Q} / CAST(m AS DOUBLE)"
        f" * 1e9 + 0.5) / 1e9 AS bh_critical",
        "COALESCE(rank <= k_max, FALSE) AS rejected",
    ).orderBy("event_type")
