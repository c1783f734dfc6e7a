"""Behavioral fixtures for the r7 operators whose oracles MIRROR a
shared generated formula (dedup-image-phash, sink-zorder) or shared
rule constants (text-gopher-rules): a bug in the shared formula would
cancel in the oracle compare, so these tests pin hand-computed expected
values and end-to-end clustering behavior against pure Python."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_file_mover_spark.llm.multimodal import (
    _PHASH_COLS,
    _PHASH_NPIX,
    _PHASH_ROWS,
    _phash_sql,
    dedup_image_phash,
)
from spark_file_mover_spark.llm.text import text_gopher_rules
from spark_file_mover_spark.sources.sourcesink import _ZORDER_SPARK_SQL, _Z_BITS


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "test", len(t)) for i, t in enumerate(texts, start=1)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def _py_phash(text: str) -> int:
    """Pure-Python reference of the 60-bit dHash over the byte sampler."""
    n = len(text)
    stride = max(n // _PHASH_NPIX, 1)
    px = [ord(text[(i * stride) % n]) for i in range(_PHASH_NPIX)]
    out = 0
    for r in range(_PHASH_ROWS):
        for c in range(_PHASH_COLS - 1):
            b = r * (_PHASH_COLS - 1) + c
            if px[r * _PHASH_COLS + c] > px[r * _PHASH_COLS + c + 1]:
                out |= 1 << b
    return out


def test_phash_matches_pure_python(spark, tmp_path):
    texts = [
        "".join(chr(97 + (i * 7) % 26) for i in range(200)),
        "short text with a few words only here",
        "z" * 66,  # constant image -> phash 0
    ]
    sf = _write_docs(spark, tmp_path, texts)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        r.doc_id: r.ph
        for r in d.select(
            "doc_id",
            F.expr(_phash_sql(lambda a, b: f"({a} div {b})")).alias("ph"),
        ).collect()
    }
    for doc_id, text in enumerate(texts, start=1):
        assert got[doc_id] == _py_phash(text), doc_id
    assert got[3] == 0  # flat "image" has no gradient bits


def test_phash_clusters_near_dups_not_distinct(spark, tmp_path):
    base = "".join(chr(97 + (i * 11) % 26) for i in range(300))
    # near-dup: one character changed -> at most a few dHash bits flip
    near = "q" + base[1:]
    distinct = "".join(chr(97 + (i * 5 + 3) % 26) for i in range(300))
    sf = _write_docs(spark, tmp_path, [base, near, distinct])
    rows = {r.asset_id: r for r in dedup_image_phash(spark, sf).collect()}
    assert rows[1].cluster_id == rows[2].cluster_id == 1
    assert rows[1].has_near_dup and rows[2].has_near_dup
    assert bin(rows[1].phash ^ rows[2].phash).count("1") <= 8
    assert not rows[3].has_near_dup and rows[3].cluster_id == 3


def _py_zval(custkey: int, day: int) -> int:
    x, y = custkey % (1 << _Z_BITS), day % (1 << _Z_BITS)
    out = 0
    for i in range(_Z_BITS):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_interleave_matches_pure_python(spark):
    import datetime

    epoch = datetime.datetime(1992, 1, 1)
    cases = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 1023), (1024, 1024), (77777, 4000)]
    rows = [
        (i, k, epoch + datetime.timedelta(days=d))
        for i, (k, d) in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz"
    )
    got = {
        r.o_orderkey: r.z
        for r in df.select(
            "o_orderkey", F.expr(_ZORDER_SPARK_SQL).alias("z")
        ).collect()
    }
    for i, (k, d) in enumerate(cases):
        assert got[i] == _py_zval(k, d), (k, d)
    # corner pins: the canonical Morton values
    assert got[0] == 0 and got[1] == 1 and got[2] == 2
    assert _py_zval(1023, 1023) == (1 << 20) - 1


def test_gopher_rules_boundaries(spark, tmp_path):
    # doc 1: exactly 50 words, mean length exactly 3.0 (48x3 + 2 + 4 =
    # 150 chars of tokens), required stopwords present -> every rule
    # passes AT its boundary (n_words >= 50, mean >= 3.0 at equality)
    words = ["the", "and", "win"] * 16 + ["of", "cars"]
    assert len(words) == 50
    doc1 = " ".join(words)
    # doc 2: 49 words, mean still exactly 3.0 (47x3 + 2 + 4 = 147)
    # -> fails ONLY the word-count rule
    doc2 = " ".join(words[:47] + ["of", "cars"])
    # doc 3: symbol storm -> fails the symbol-ratio rule
    doc3 = " ".join(["the", "of"] + ["#tag"] * 20)
    # doc 4: numbers only -> fails alpha + required rules
    doc4 = " ".join(str(i) for i in range(60))
    sf = _write_docs(spark, tmp_path, [doc1, doc2, doc3, doc4])
    rows = {r.doc_id: r for r in text_gopher_rules(spark, sf).collect()}
    r1 = rows[1]
    assert r1.n_words == 50 and r1.mean_word_len == 3.0
    assert r1.gopher_pass and all(
        [r1.ok_word_count, r1.ok_mean_len, r1.ok_alpha, r1.ok_symbols, r1.ok_required]
    )
    r2 = rows[2]
    assert not r2.ok_word_count and not r2.gopher_pass
    assert r2.ok_mean_len and r2.ok_alpha and r2.ok_required
    r3 = rows[3]
    assert not r3.ok_symbols and r3.symbol_ratio > 0.1
    r4 = rows[4]
    assert not r4.ok_alpha and not r4.ok_required and r4.n_required_stop == 0


def test_cross_bloom_flags_exact_cross_corpus_dups(spark, tmp_path):
    from spark_file_mover_spark.llm.dedup import dedup_cross_bloom

    # doc_id % 3 == 0 -> reference corpus; others -> probe corpus.
    # doc 3 (ref) and doc 4 (probe) share normalized text; doc 5 differs
    # only by case/whitespace (still a normalized dup); docs 1, 2 unique.
    texts = {
        1: "probe only text with several words here",
        2: "another unique probe document entirely",
        3: "shared boilerplate text across corpora",
        4: "shared boilerplate text across corpora",
        5: "  SHARED   boilerplate TEXT across corpora ",
        6: "reference only text never probed",
        7: "yet another unique probe entry",
    }
    rows = [(i, t, "en", "t", len(t)) for i, t in sorted(texts.items())]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = {r.doc_id: r for r in dedup_cross_bloom(spark, out).collect()}
    assert set(got) == {1, 2, 4, 5, 7}  # probe docs only
    assert got[4].is_dup and got[5].is_dup  # exact + normalized dup
    assert not got[1].is_dup and not got[2].is_dup and not got[7].is_dup
    assert all(r.bloom_no_false_negative for r in got.values())


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            # tiny alphabet -> heavy cross-corpus duplication pressure,
            # whitespace/case noise exercises the normalization
            st.sampled_from(
                [
                    "alpha beta gamma",
                    "ALPHA  beta gamma",
                    "delta epsilon",
                    "zeta eta theta iota",
                    "unique words here",
                ]
            ),
            min_size=2,
            max_size=9,
        )
    )
    def test_cross_bloom_matches_exact_reference(
        spark, tmp_path_factory, texts
    ):
        """dedup-cross-bloom must equal a plain exact membership test on
        normalized text for ANY corpus split — the bloom layer can only
        add verified-away false positives, never change the result."""
        from spark_file_mover_spark.llm.dedup import dedup_cross_bloom

        rows = [
            (i, t, "en", "t", len(t)) for i, t in enumerate(texts, start=1)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = str(tmp_path_factory.mktemp("xbloom") / "sf")
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )

        def norm(t):
            return " ".join(t.strip().lower().split())

        ref_texts = {
            norm(t) for i, t in enumerate(texts, start=1) if i % 3 == 0
        }
        expect = {
            i: norm(t) in ref_texts
            for i, t in enumerate(texts, start=1)
            if i % 3 != 0
        }
        got = {
            r.doc_id: r.is_dup
            for r in dedup_cross_bloom(spark, out).collect()
        }
        assert got == expect

except ImportError:  # pragma: no cover
    pass
