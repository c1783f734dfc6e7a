"""UDF-surface unit tests beyond the oracle gate: the Python UDTF must
agree with the built-in posexplode path row-for-row."""

from __future__ import annotations

from spark_file_mover_spark import registry
from spark_file_mover_spark.udfs import token_explode_udtf

registry.load_all()


def test_multimodal_decode_is_gated():
    """The image decode step must be an explicit NotImplementedError stub
    (media libs absent in this environment), never a silent fake."""
    import pytest

    from spark_file_mover_spark.llm.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_python_udtf_matches_posexplode(spark, sf_dir):
    from spark_file_mover_spark.sources.io import load_table

    TokenExplode = token_explode_udtf()
    spark.udtf.register("token_explode", TokenExplode)
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 50")
    d.createOrReplaceTempView("docs_head")
    via_udtf = spark.sql(
        "SELECT t.* FROM docs_head, LATERAL token_explode(doc_id, text) t"
    )
    via_builtin = registry.QUERIES["udtf-explode-like"](spark, sf_dir)
    a = sorted(tuple(r) for r in via_udtf.collect())
    b = sorted(tuple(r) for r in via_builtin.collect())
    assert a == b
