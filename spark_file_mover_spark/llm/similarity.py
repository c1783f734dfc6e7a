"""Similarity search over the embeddings table (SURVEY.md §2I, I3).

Two paths, mirroring how an ANN service is actually built:

* ``sim-search-topk`` — brute-force cosine top-k: broadcast the (small)
  query set against the corpus, rank per query. Exact, and the right plan
  whenever |queries| is small: the corpus is scanned ONCE, never shuffled,
  and per-partition top-k (WindowGroupLimit) keeps memory bounded. This is
  the oracle baseline.
* ``sim-search-ivf`` — IVF-style: coarse-quantize the corpus into cells
  (centroid per cell), probe only the nprobe nearest cells per query.
  At 100 TB the corpus is written bucketed by cell id, so a probe reads
  only matching buckets (partition pruning); recall is tunable via nprobe.

Numeric parity: the dot product is a SEQUENTIAL left fold over
element-wise double products (Spark ``F.aggregate`` ≡ DuckDB
``list_reduce``), so both engines execute the identical IEEE-754 op
sequence and match bit-for-bit — no rounding slack needed, though the
emitted similarity is rounded to 6 dp for stable hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_file_mover_spark.registry import query
from spark_file_mover_spark.sources.io import load_table

N_QUERIES = 5
TOP_K = 3


def dot(a, b):
    """Sequential-fold double dot product of two float array columns —
    order-deterministic, so it is engine-portable bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


# DuckDB mirror of dot()/norm(): same sequential fold in double.
_DOT = (
    "list_reduce(list_transform(range(1, len({a})+1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
    "(acc, x) -> acc + x)"
)
_NORM = (
    "sqrt(list_reduce(list_transform({a}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))"
)

_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id, embedding AS ce, label FROM embeddings),
sims AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.label,
         {_DOT.format(a='q.qe', b='c.ce')}
           / ({_NORM.format(a='q.qe')} * {_NORM.format(a='c.ce')}) AS cos
  FROM q CROSS JOIN c
  WHERE q.query_id <> c.vec_id
)
SELECT query_id, neighbor_id, label, rnk,
       ROUND(cos, 6) AS cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rnk
  FROM sims
) WHERE rnk <= {TOP_K}
"""


@query("sim-search-topk", oracle=_TOPK_ORACLE)
def sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3: exact brute-force cosine top-k — query set broadcast against the
    corpus, per-query rank-then-filter (rewritten to WindowGroupLimit).

    The corpus side is never shuffled or materialized: one scan, map-side
    broadcast join, partial top-k per task. Size gate: brute force is the
    DEFAULT only because |queries| is tiny; for query sets that scale with
    the corpus, use ``sim-search-ivf``.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        "label",
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "label",
            (
                dot(F.col("qe"), F.col("ce"))
                / (norm(F.col("qe")) * norm(F.col("ce")))
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            "rnk",
            F.round("cos", 6).alias("cosine"),
        )
    )


_IVF_ORACLE = f"""
WITH cent AS (
  SELECT label,
         list_transform(range(1, 65),
           i -> list_reduce(list_transform(list(embedding ORDER BY vec_id), e -> CAST(e[i] AS DOUBLE)),
                            (a, b) -> a + b) / COUNT(*)) AS centroid
  FROM embeddings GROUP BY label
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
probe AS (
  SELECT query_id, label, rnk FROM (
    SELECT q.query_id, cent.label,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_DOT.format(a='q.qe', b='cent.centroid')}
                      / ({_NORM.format(a='q.qe')} * {_NORM.format(a='cent.centroid')}) DESC,
                      cent.label) AS rnk
    FROM q CROSS JOIN cent
  ) WHERE rnk <= 2
),
cand AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         {_DOT.format(a='q.qe', b='e.embedding')}
           / ({_NORM.format(a='q.qe')} * {_NORM.format(a='e.embedding')}) AS cos
  FROM q
  JOIN probe p ON p.query_id = q.query_id
  JOIN embeddings e ON e.label = p.label
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, label, rnk, ROUND(cos, 6) AS cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rnk
  FROM cand
) WHERE rnk <= {TOP_K}
"""


@query("sim-search-ivf", oracle=_IVF_ORACLE)
def sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse cells = label groups, centroid = element-wise
    mean; each query probes its nprobe=2 nearest centroids and scans only
    those cells.

    Plan shape at scale: centroids are tiny (n_cells × dim) → broadcast;
    the corpus is bucketed/partitioned by cell id so a probe is a
    partition-pruned scan + broadcast join — no corpus shuffle. Recall <
    100% by construction (cells the query skips may hold true neighbors);
    that is the IVF trade, tuned by nprobe.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    # element-wise mean per cell: posexplode → avg per (label, pos) → re-pack
    cent = (
        e.select("label", "vec_id", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.col("v").cast("double")) / F.count("*")).alias("m"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    wq = W.partitionBy("query_id")
    probe = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qe",
            "label",
            (
                dot(F.col("qe"), F.col("centroid"))
                / (norm(F.col("qe")) * norm(F.col("centroid")))
            ).alias("ccos"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(wq.orderBy(F.col("ccos").desc(), "label")),
        )
        .filter(F.col("rnk") <= 2)
        .select("query_id", "qe", "label")
    )
    cand = (
        F.broadcast(probe)
        .join(e, "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            (
                dot(F.col("qe"), F.col("embedding"))
                / (norm(F.col("qe")) * norm(F.col("embedding")))
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            "rnk",
            F.round("cos", 6).alias("cosine"),
        )
    )


_EMB_DEDUP_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b, a.label,
         {_DOT.format(a='a.embedding', b='b.embedding')}
           / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='b.embedding')}) AS cos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT a, b, label, ROUND(cos, 6) AS cosine
FROM pairs WHERE cos >= 0.9
"""


@query("dedup-embedding-cosine", oracle=_EMB_DEDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup pairs: cosine ≥ 0.9 within label blocks.

    Blocking on the coarse cell (label) keeps the pairwise step
    within-block — the same LSH-bucket-then-compare shape as MinHash dedup;
    an unblocked all-pairs crossJoin is never run at scale.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea"), "label"
    )
    b = e.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb"), "label"
    )
    cos = dot(F.col("ea"), F.col("eb")) / (
        norm(F.col("ea")) * norm(F.col("eb"))
    )
    return (
        a.join(b, "label")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "label", cos.alias("cos"))
        .filter(F.col("cos") >= 0.9)
        .select("a", "b", "label", F.round("cos", 6).alias("cosine"))
    )
