"""Multimodal (binary) column handling (SURVEY.md §2I, I5).

Treats image/audio/video assets as opaque ``binary`` columns with typed
metadata, the way a 100 TB multimodal training set is actually stored:
parquet rows of (asset_id, bytes, mime, width, height, ...), partitioned
by modality/shard so decode jobs prune to the shards they need.

The decode/feature-extract step runs as an Arrow-batched ``mapInPandas``
— the one place Python is justified, because media codecs are Python/C
libraries. The media libs are not in this container, so the actual pixel
decode is STUBBED behind ``decode_image`` (NotImplementedError) and the
pipeline uses a deterministic byte-level feature extractor instead; the
Spark-side plumbing — schema, batch iteration, partition shape — is real
and is what these queries exercise.

``multimodal-binary`` additionally round-trips real files through Spark's
``binaryFile`` source (the ingestion path for loose asset files).
"""

from __future__ import annotations

import hashlib
import tempfile
from collections.abc import Iterator
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_file_mover_spark.registry import query
from spark_file_mover_spark.sources.io import load_table


def decode_image(data: bytes) -> "object":
    """Decode an image asset to pixels. STUB: PIL/opencv are not available
    in this environment; at deploy time this body becomes
    ``PIL.Image.open(io.BytesIO(data))``. The surrounding pipeline
    (schema, batching, partitioning) does not change."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this container"
    )


def _byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor: content hash, byte stats,
    fake dimensions derived from the payload. One Arrow batch in, one out —
    the exact shape a real decode UDF has."""
    for pdf in batches:
        data = pdf["content"]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "mime": pdf["mime"],
                "n_bytes": data.map(len),
                "sha256_8": data.map(
                    lambda b: hashlib.sha256(b).hexdigest()[:16]
                ),
                "first_byte": data.map(lambda b: b[0] if b else -1),
                # stand-in for decoded dims; a real decoder fills these
                "width": data.map(lambda b: 16 + len(b) % 64),
                "height": data.map(lambda b: 16 + (len(b) // 64) % 64),
            }
        )


_FEATURE_SCHEMA = (
    "asset_id long, mime string, n_bytes long, sha256_8 string, "
    "first_byte int, width long, height long"
)


# DuckDB's sha256 takes VARCHAR and hashes its utf-8 bytes — exactly what
# hashlib.sha256(text.encode()) computes in the mapInPandas extractor, so
# the content-hash column is cross-engine checkable without blob support.
_BINARY_ORACLE = """
WITH assets AS (
  SELECT doc_id AS asset_id, text,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS mime
  FROM documents
  UNION ALL
  SELECT doc_id, text, 'application/octet-stream' AS mime
  FROM documents WHERE doc_id < 3
)
SELECT mime, COUNT(*) AS n_assets,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT substr(sha256(text), 1, 16)) AS n_distinct_payloads,
       CAST(MAX(16 + octet_length(encode(text)) % 64) AS BIGINT) AS max_width
FROM assets GROUP BY mime
"""


@query("multimodal-binary", oracle=_BINARY_ORACLE)
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5: the multimodal asset pipeline end-to-end — oracle-checked: the
    byte-level features (sha256 content hash, byte counts, derived dims)
    are deterministic functions of the payload that DuckDB re-derives.

    1. Build a binary asset column (documents.text encoded to bytes — the
       testdata proxy for image payloads) + typed metadata.
    2. Write a handful of assets as loose files; re-ingest with the
       ``binaryFile`` source to prove the loose-file path.
    3. Feature-extract with Arrow-batched ``mapInPandas`` (real plumbing,
       stubbed decode) and aggregate per mime type.

    Scale: binary payloads stay opaque until the mapInPandas stage, so
    Tungsten never deserializes them; partition by shard/mime at write so
    decode jobs prune. maxPartitionBytes bounds the bytes a task holds.
    """
    d = load_table(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("content"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    )

    # loose-file ingestion path: write a few assets, read via binaryFile
    loose_dir = Path(tempfile.mkdtemp(prefix="sfm-assets-")) / "assets"
    loose_dir.mkdir()
    for row in assets.filter(F.col("asset_id") < 3).collect():
        (loose_dir / f"{row.asset_id}.bin").write_bytes(bytes(row.content))
    loose = (
        spark.read.format("binaryFile")
        .load(str(loose_dir))
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("long")
            .alias("asset_id"),
            F.col("content"),
            F.lit("application/octet-stream").alias("mime"),
        )
    )

    feats = assets.unionByName(loose).mapInPandas(
        _byte_features, schema=_FEATURE_SCHEMA
    )
    return (
        feats.groupBy("mime")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("sha256_8").alias("n_distinct_payloads"),
            F.max("width").alias("max_width"),
        )
        .orderBy("mime")
    )


# The sampled output is pure byte arithmetic over the utf-8 payload, so
# the oracle re-derives it exactly: frame i covers bytes
# [(i-1)*128, (i-1)*128+64) → its length is min(64, max(len-(i-1)*128, 0)).
_FRAME_ORACLE = """
WITH v AS (
  SELECT doc_id AS asset_id, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT asset_id, n, greatest(n // 128, 1) AS n_frames FROM v
)
SELECT asset_id, n_frames,
       CAST(list_reduce(
         list_transform(range(1, n_frames + 1),
                        i -> least(64, greatest(n - (i-1)*128, 0))),
         (a, b) -> a + b) AS BIGINT) AS sampled_bytes
FROM f
"""


@query("multimodal-frame-sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over (fake) video assets: each asset yields every
    k-th "frame" as its own row — the one-to-many explode shape a real
    frame sampler has, with byte-slice frames standing in for decoded
    ones. Oracle-checked: the per-asset frame count and sampled byte
    totals are deterministic byte arithmetic the oracle mirrors.

    posexplode keeps frame ordinals; at scale the explode multiplies rows
    before any shuffle, so repartition by asset afterwards if a downstream
    groupBy follows (here the per-asset agg folds straight back down).
    """
    d = load_table(spark, sf_dir, "documents")
    videos = d.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    # every 64-byte window, stride 128 ≈ "every 2nd frame"
    frames = videos.select(
        "asset_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        (F.length("content") / 128).cast("int"), F.lit(1)
                    ),
                ),
                lambda i: F.substring(
                    F.col("content"), (i - 1) * 128 + 1, 64
                ),
            )
        ).alias("frame_no", "frame_bytes"),
    )
    return (
        frames.groupBy("asset_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.length("frame_bytes")).alias("sampled_bytes"),
        )
        .orderBy("asset_id")
    )
