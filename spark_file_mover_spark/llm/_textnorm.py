"""The ONE whitespace tokenizer every text-family operator shares.

Cross-engine parity contract: this expression and the DuckDB twin
``string_split_regex(lower(trim(text)), '\\s+')`` (embedded in each
key's oracle SQL) MUST stay in lockstep — they define what a "token"
is for token counts, shingles, grams, fingerprints, language ID,
quality gates, packing offsets and dedup keys alike. Keeping the Spark
side here means an edit changes every operator at once instead of
silently de-synchronizing one of ~14 copies from its oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def toks(col: str = "text") -> Column:
    """``split(lower(trim(col)), '\\s+')`` — the shared tokenizer."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def md5_prefix60(col: Column) -> Column:
    """The ONE md5-hex-prefix 60-bit integer hash (15 hex chars fit a
    signed BIGINT with no sign-bit gymnastics) — the cross-engine-exact
    hash dedup-simhash and sample-hash-stratified share. Spark side here;
    every oracle embeds :data:`MD5_PREFIX60_SQL` so the two engines'
    definitions cannot drift apart one copy at a time."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


#: DuckDB twin of :func:`md5_prefix60`; format with the SQL expression
#: for the input string, e.g. ``MD5_PREFIX60_SQL.format(x="tok")``.
MD5_PREFIX60_SQL = "('0x' || substr(md5({x}), 1, 15))::UBIGINT::BIGINT"
