"""Similarity search over the embeddings table (SURVEY.md §2I, I3/I8/I9).

Three operators, mirroring how an ANN service is actually built:

* ``sim-search-topk`` — brute-force cosine top-k: broadcast the (small)
  query set against the corpus, rank per query. Exact, and the right plan
  whenever |queries| is small: the corpus is scanned ONCE, never shuffled,
  and per-partition top-k (WindowGroupLimit) keeps memory bounded. This is
  the oracle baseline.
* ``sim-search-ivf`` — IVF-style: coarse-quantize the corpus into cells
  (centroid per cell), probe only the nprobe nearest cells per query.
  At 100 TB the corpus is written bucketed by cell id, so a probe reads
  only matching buckets (partition pruning); recall is tunable via nprobe.
* ``dedup-embedding-cosine`` — embedding near-dup pairs within blocks.

Norms are PRECOMPUTED once per row on each side before any join (a
projected column), never per pair: a per-pair ``norm()`` is a full
64-element fold repeated k× on the hottest scan — measurably wasteful at
sf0.1 and k× wasted compute at 100 TB. The DuckDB oracles mirror the same
precompute so the IEEE-754 op sequence stays identical.

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
DEDUP_COS_THRESHOLD = 0.8  # 0.9 was vacuous at sf0.01 (zero qualifying pairs)


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
WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
                  {_NORM.format(a='embedding')} AS qn
           FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id, embedding AS ce, label,
             {_NORM.format(a='embedding')} AS cn
      FROM embeddings),
sims AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.label,
         {_DOT.format(a='q.qe', b='c.ce')} / (q.qn * c.cn) AS cos
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
    broadcast join, partial top-k per task. Each side's norm is projected
    ONCE before the join; the per-pair expression is a single fold (the
    dot) plus one divide. Size gate: brute force is the DEFAULT only
    because |queries| is tiny; for query sets that scale with the corpus,
    use ``sim-search-ivf``.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        "label",
        norm(F.col("embedding")).alias("cn"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "label",
            (dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias(
                "cos"
            ),
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
cent_n AS (
  SELECT label, centroid, {_NORM.format(a='centroid')} AS cn FROM cent
),
q AS (SELECT vec_id AS query_id, embedding AS qe,
             {_NORM.format(a='embedding')} AS qn
      FROM embeddings WHERE vec_id < {N_QUERIES}),
probe AS (
  SELECT query_id, label, rnk FROM (
    SELECT q.query_id, cent_n.label,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_DOT.format(a='q.qe', b='cent_n.centroid')}
                      / (q.qn * cent_n.cn) DESC,
                      cent_n.label) AS rnk
    FROM q CROSS JOIN cent_n
  ) WHERE rnk <= 2
),
corpus AS (
  SELECT vec_id, label, embedding, {_NORM.format(a='embedding')} AS en
  FROM embeddings
),
cand AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         {_DOT.format(a='q.qe', b='e.embedding')} / (q.qn * e.en) AS cos
  FROM q
  JOIN probe p ON p.query_id = q.query_id
  JOIN corpus e ON e.label = p.label
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
    partition-pruned scan + broadcast join — no corpus shuffle. Corpus,
    query and centroid norms are all projected once before their joins.
    Recall < 100% by construction (cells the query skips may hold true
    neighbors); that is the IVF trade, tuned by nprobe.
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
        .withColumn("cn", norm(F.col("centroid")))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("qn"),
    )
    wq = W.partitionBy("query_id")
    probe = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qe",
            "qn",
            "label",
            (
                dot(F.col("qe"), F.col("centroid")) / (F.col("qn") * F.col("cn"))
            ).alias("ccos"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(wq.orderBy(F.col("ccos").desc(), "label")),
        )
        .filter(F.col("rnk") <= 2)
        .select("query_id", "qe", "qn", "label")
    )
    corpus = e.withColumn("en", norm(F.col("embedding")))
    cand = (
        F.broadcast(probe)
        .join(corpus, "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            (
                dot(F.col("qe"), F.col("embedding")) / (F.col("qn") * F.col("en"))
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
WITH e AS (
  SELECT vec_id, label, embedding,
         {_NORM.format(a='embedding')} AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nn_id, a.label,
         {_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) AS cos
  FROM e a JOIN e b
    ON a.label = b.label AND a.vec_id <> b.vec_id
)
SELECT vec_id, nn_id, label, ROUND(cos, 6) AS cosine,
       cos >= {DEDUP_COS_THRESHOLD} AS is_near_dup
FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cos DESC, nn_id) AS rnk
  FROM pairs
) WHERE rnk = 1
"""


@query("dedup-embedding-cosine", oracle=_EMB_DEDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection: nearest in-block neighbor per vector,
    flagged ``is_near_dup`` when cosine clears the dedup threshold.

    Emitting the top-1 neighbor (rather than only threshold-passing
    pairs) keeps the check NON-VACUOUS at test scale: the synthetic
    sf0.01 embeddings are near-orthogonal (max in-block cosine ≈ 0.47),
    so any fixed near-dup threshold returns zero rows and a correctness
    gate over an empty set proves nothing. The production consumer drops
    rows where ``is_near_dup`` is false; the fold/cosine/ranking math is
    exercised either way.

    Each side's norm is projected once per ROW before the join — never
    recomputed per pair (the join fans every row out to its block's pair
    count; a per-pair norm multiplies the fold by that fan-out).

    Blocking: ``label`` is a TEST-SCALE stand-in for a real blocking key.
    Its cardinality is fixed (10), so within-block all-pairs is O(N²/10) —
    still quadratic as N grows. At 100 TB the block key must be an
    LSH-bucket or IVF-cell id whose cardinality grows with N (bounding
    block size, as ``dedup-near-minhash`` does with its banded
    signatures); the pair-join-within-block shape shown here is unchanged
    by that substitution.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("ea"),
        "label",
        norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").alias("eb"),
        "label",
        norm(F.col("embedding")).alias("nb"),
    )
    cos = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "nn_id")
    return (
        a.join(b, "label")
        .filter(F.col("vec_id") != F.col("nn_id"))
        .select("vec_id", "nn_id", "label", cos.alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "vec_id",
            "nn_id",
            "label",
            F.round("cos", 6).alias("cosine"),
            (F.col("cos") >= DEDUP_COS_THRESHOLD).alias("is_near_dup"),
        )
    )
