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
