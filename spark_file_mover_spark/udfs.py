"""Category J — UDF / UDAF / UDTF surface (SURVEY.md §2J).

The engine's posture is built-ins first (every other category is
UDF-free); this module is the declared escape hatch for logic that
genuinely needs Python, expressed the only way that's acceptable at
100 TB: Arrow-vectorized. Three shapes:

* J1 ``udf-scalar-pandas`` — ``@pandas_udf``: batches arrive as
  ``pd.Series`` over Arrow (no per-row pickling); still ~an order slower
  than the equivalent built-in expression, so the docstring carries the
  built-in rewrite it should become when possible.
* J2 ``udaf-grouped-pandas`` — ``applyInPandas``: one pandas frame per
  group after a hash shuffle on the keys. The hazard at scale is a skewed
  group exceeding executor memory — keys here are bounded (5 langs);
  salted two-phase aggregation is the fix when they aren't.
* J3 ``udtf-explode-like`` — one-to-many generation. The declared query
  uses the BUILT-IN ``posexplode`` (codegen'd, the right default); a real
  Python UDTF (Spark 4 ``@udtf``) with identical semantics is exported as
  :func:`token_explode_udtf` and exercised in tests — it is the shape to
  reach for only when generation logic can't be an array expression.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from spark_file_mover_spark.llm._textnorm import toks
from spark_file_mover_spark.registry import query
from spark_file_mover_spark.sources.io import load_table

# ---------------------------------------------------------------------------
# J1 — vectorized scalar pandas UDF
# ---------------------------------------------------------------------------


def _normalize_series(s: pd.Series) -> pd.Series:
    return (
        s.str.lower()
        .str.replace(r"[^a-z0-9\s]", "", regex=True)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )


_NORMALIZE_UDF = None


def normalize_text():
    """Arrow-batched text normalizer UDF: lowercase, trim, collapse
    whitespace, strip non-alphanumerics. Built lazily (pandas_udf wants a
    live session in Spark 4) and cached. Equivalent built-in rewrite
    (preferred when the logic stays this simple):
    ``lower(trim(regexp_replace(regexp_replace(text, '[^a-z0-9 ]', ''), '\\s+', ' ')))``.
    """
    global _NORMALIZE_UDF
    if _NORMALIZE_UDF is None:
        _NORMALIZE_UDF = pandas_udf(_normalize_series, "string")
    return _NORMALIZE_UDF


_SCALAR_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                           '\\s+', ' ', 'g')) AS norm_text,
       length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                  '\\s+', ' ', 'g'))) AS norm_len
FROM documents
"""


@query("udf-scalar-pandas", oracle=_SCALAR_ORACLE)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the pandas UDF runs the normalization; the oracle runs the pure
    SQL mirror — passing proves the vectorized Python path is semantics-
    preserving, which is the whole point of declaring it."""
    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text()
    # project the UDF result ONCE, derive from the column — two norm(text)
    # references would ship the batch through Python twice per row
    return d.select("doc_id", norm("text").alias("norm_text")).select(
        "doc_id", "norm_text", F.length("norm_text").alias("norm_len")
    )


# ---------------------------------------------------------------------------
# J2 — grouped-map applyInPandas
# ---------------------------------------------------------------------------


def _lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-language robust stats — the kind of whole-group computation
    (median needs the full group) that justifies applyInPandas over
    built-in aggregates. Quantiles use LINEAR interpolation — the same
    convention as DuckDB ``quantile_cont`` — so the oracle can mirror
    them; results rounded to 4 dp on both sides."""
    chars = pdf["n_chars"].sort_values()
    q25 = float(chars.quantile(0.25, interpolation="linear"))
    q75 = float(chars.quantile(0.75, interpolation="linear"))
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "median_chars": [
                round(float(chars.quantile(0.5, interpolation="linear")), 4)
            ],
            "iqr_chars": [round(q75 - q25, 4)],
            "min_doc_id": [int(pdf["doc_id"].min())],
        }
    )


_GROUPED_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       FLOOR((quantile_cont(n_chars, 0.5)) * 1e4 + 0.5) / 1e4 AS median_chars,
       FLOOR((quantile_cont(n_chars, 0.75) - quantile_cont(n_chars, 0.25)) * 1e4 + 0.5) / 1e4
         AS iqr_chars,
       MIN(doc_id) AS min_doc_id
FROM documents
GROUP BY lang
"""


@query("udaf-grouped-pandas", oracle=_GROUPED_ORACLE)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: one pandas frame per language group via applyInPandas — hash
    shuffle on lang, whole group in memory per task. Bounded keys here;
    for unbounded/skewed keys pre-aggregate or salt. Oracle-checked: the
    pandas quantiles use linear interpolation ≡ DuckDB quantile_cont."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(
            _lang_stats,
            schema=(
                "lang string, n_docs long, median_chars double, "
                "iqr_chars double, min_doc_id long"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# J3 — one-to-many generation (built-in explode + real Python UDTF)
# ---------------------------------------------------------------------------

_EXPLODE_ORACLE = """
WITH t AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '\\s+') AS tk
  FROM documents
  WHERE doc_id < 50
)
SELECT doc_id,
       CAST(generate_subscripts(tk, 1) - 1 AS INTEGER) AS pos,
       unnest(tk) AS tok,
       length(unnest(tk)) AS tok_len
FROM t
"""


@query("udtf-explode-like", oracle=_EXPLODE_ORACLE)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: one row per token with its ordinal — the built-in
    ``posexplode`` path (codegen'd; ALWAYS prefer this when the generator
    is expressible as an array). :func:`token_explode_udtf` is the Python
    UDTF twin for generators that aren't."""
    d = load_table(spark, sf_dir, "documents")
    tk = toks()
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(tk).alias("pos", "tok"))
        .select("doc_id", "pos", "tok", F.length("tok").alias("tok_len"))
    )


def token_explode_udtf():
    """Real Python UDTF (Spark 4 ``@udtf``) with semantics identical to
    ``udtf-explode-like`` — returned lazily so importing this module never
    pays UDTF registration. Tests assert UDTF ≡ posexplode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, tok string, tok_len int")
    class TokenExplode:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            tk = text.strip().lower().split()
            for pos, tok in enumerate(tk):
                yield doc_id, pos, tok, len(tok)

    return TokenExplode


# ---------------------------------------------------------------------------
# J4 — mapInPandas: Arrow batch-iterator transform with schema change
# ---------------------------------------------------------------------------

_MAPINPANDAS_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                     x -> x != '') AS tk
  FROM documents
),
s AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(tk)) AS BIGINT) AS n_types,
         CAST(COALESCE(list_sum(list_transform(tk, x -> LENGTH(x))), 0)
              AS BIGINT) AS chars_in_tokens
  FROM t
)
SELECT doc_id, n_tokens, n_types, chars_in_tokens,
  CASE WHEN n_tokens > 0 THEN
    FLOOR((CAST(n_types AS DOUBLE) / n_tokens) * 1e6 + 0.5) / 1e6
  END AS ttr,
  CASE WHEN n_tokens > 0 THEN
    FLOOR((CAST(chars_in_tokens AS DOUBLE) / n_tokens) * 1e6 + 0.5) / 1e6
  END AS avg_token_len
FROM s ORDER BY doc_id
"""


def _token_stats_batches(batches):
    """Batch-iterator body for J4: per-document token statistics
    computed in Python over Arrow batches. Tokenization is the RE2
    whitespace class [\\t\\n\\f\\r ] so the oracle's string_split_regex
    '\\s+' (RE2) sees the identical split; the function returns EXACT
    INTEGERS only — every double ratio is derived JVM-side after the
    UDF so no Python float arithmetic ever reaches the output."""
    import re

    ws = re.compile(r"[\t\n\f\r ]+")
    for pdf in batches:
        tok_lists = pdf["text"].map(
            lambda s: [t for t in ws.split(s or "") if t]
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": tok_lists.map(len).astype("int64"),
                "n_types": tok_lists.map(lambda t: len(set(t))).astype(
                    "int64"
                ),
                "chars_in_tokens": tok_lists.map(
                    lambda t: sum(len(x) for x in t)
                ).astype("int64"),
            }
        )


@query("udf-map-in-pandas", oracle=_MAPINPANDAS_ORACLE)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: ``mapInPandas`` — the Arrow batch-ITERATOR plane that
    completes the declared Python-boundary family (J1 scalar
    pandas_udf, J2 grouped applyInPandas, J3 UDTF): the transform
    sees whole record batches, may change the schema (text is
    dropped, three stat columns appear), and streams batch-by-batch
    with constant memory — the signature under which a real decode /
    feature-extract / tokenize stage runs when the logic genuinely
    needs a Python library (cf. multimodal.py's documented decode
    boundary; this key proves the plumbing with a deterministic,
    oracle-checkable computation).

    Parity discipline: Python emits EXACT INTEGERS only (token,
    type, char counts — the RE2-identical whitespace split documented
    on the batch fn); the type-token ratio and mean token length are
    snapped JVM-side divisions over those integers, so no Python
    float ever reaches the compared output.

    Shape at 100 TB: map-only — one Arrow pass per batch, zero
    shuffle before the presentation sort; the batch iterator holds
    one batch at a time regardless of partition size."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stats = d.mapInPandas(
        _token_stats_batches,
        schema=(
            "doc_id long, n_tokens long, n_types long, chars_in_tokens long"
        ),
    )
    return stats.selectExpr(
        "doc_id",
        "n_tokens",
        "n_types",
        "chars_in_tokens",
        "CASE WHEN n_tokens > 0 THEN"
        " FLOOR((CAST(n_types AS DOUBLE) / n_tokens) * 1e6 + 0.5) / 1e6"
        " END AS ttr",
        "CASE WHEN n_tokens > 0 THEN"
        " FLOOR((CAST(chars_in_tokens AS DOUBLE) / n_tokens)"
        " * 1e6 + 0.5) / 1e6 END AS avg_token_len",
    ).orderBy("doc_id")
