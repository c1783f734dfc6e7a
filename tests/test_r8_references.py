"""Independent pure-Python references for the dedup hashing primitives.

The DuckDB oracles for dedup-simhash / dedup-near-minhash verify the
operators cross-engine, but both engines consume generated expressions
that share structure with the Spark side. These tests add a THIRD,
fully independent formulation: stdlib-only Python (re / hashlib / an
XXH64 implementation written from the public xxHash specification,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) recomputes

* the 60-bit md5-prefix SimHash fingerprints + bucket routing, and
* the k=12 permuted-minhash signature stage (including Spark's
  multi-column xxhash64 seed-chaining and null-skip semantics),

from the raw parquet bytes, with no Spark expressions anywhere in the
reference path.
"""

from __future__ import annotations

import hashlib
import re
import struct

import pyarrow.parquet as pq
import pytest

# ---------------------------------------------------------------------------
# XXH64 from the public specification
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 digest (unsigned) of ``data`` under ``seed``."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h = (
            _rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27)
            * _P1
            + _P4
        ) & _M64
        i += 8
    if i + 4 <= n:
        h = (
            _rotl(
                h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M64),
                23,
            )
            * _P2
            + _P3
        ) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(values, seed: int = 42) -> int:
    """Spark's ``xxhash64(col, ...)`` semantics: seed 42, each non-null
    column re-seeds the running hash (null columns are SKIPPED), strings
    hash their UTF-8 bytes, longs hash their 8 little-endian bytes.
    Returns the SIGNED 64-bit value Spark exposes."""
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, int):
            h = xxh64(struct.pack("<q", v), h)
        else:
            h = xxh64(str(v).encode("utf-8"), h)
    return _signed(h & _M64)


def test_xxh64_matches_spark_builtin(spark):
    """Anchor the reference implementation to Spark's builtin on literal
    strings, longs, multi-column chaining, and a null column."""
    rows = spark.sql(
        "SELECT xxhash64('abc') a, xxhash64('') b, "
        "xxhash64(CAST(42 AS BIGINT)) c, xxhash64('a','b','c') d, "
        "xxhash64('x', CAST(NULL AS STRING), 'y') e, "
        "xxhash64(repeat('spark', 20)) f"
    ).collect()[0]
    assert rows.a == spark_xxhash64(["abc"])
    assert rows.b == spark_xxhash64([""])
    assert rows.c == spark_xxhash64([42])
    assert rows.d == spark_xxhash64(["a", "b", "c"])
    assert rows.e == spark_xxhash64(["x", None, "y"])
    assert rows.f == spark_xxhash64(["spark" * 20])


# ---------------------------------------------------------------------------
# Shared tokenizer reference
# ---------------------------------------------------------------------------


def _ref_toks(text: str) -> list[str]:
    """``split(lower(trim(text)), '\\s+')`` replicated with stdlib re."""
    return re.split(r"\s+", text.strip().lower())


def _load_documents(sf_dir: str, limit: int | None = None):
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    return rows[:limit] if limit else rows


# ---------------------------------------------------------------------------
# dedup-simhash vs stdlib md5 voting
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 60


def _ref_simhash(text: str) -> tuple[int, int]:
    toks = _ref_toks(text)
    # array_distinct keeps first occurrence of each token; one vote per
    # DISTINCT TOKEN (two distinct tokens that collide to one 60-bit
    # hash still vote twice — hence a list, not a set of hashes)
    hashes = [
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        for t in dict.fromkeys(toks)
    ]
    fp = 0
    for bit in range(_SIMHASH_BITS):
        vote = sum(1 if (h >> bit) & 1 else -1 for h in hashes)
        if vote > 0:
            fp |= 1 << bit
    return fp, fp >> (_SIMHASH_BITS - 16)


def test_simhash_matches_stdlib_reference(spark, sf_dir):
    from spark_file_mover_spark import registry

    registry.load_all()
    got = {
        r.doc_id: (r.simhash, r.bucket16)
        for r in registry.QUERIES["dedup-simhash"](spark, sf_dir).collect()
    }
    docs = _load_documents(sf_dir)
    assert len(got) == len(docs)
    for doc_id, text in docs:
        assert got[doc_id] == _ref_simhash(text), f"doc {doc_id}"


# ---------------------------------------------------------------------------
# minhash signature stage vs stdlib-XXH64 permutation minima
# ---------------------------------------------------------------------------


def _ref_shingle_hashes(toks: list[str]) -> list[int]:
    """pmod(xxhash64(tok[i], tok[i+1], tok[i+2]), 2^32) for
    i in 0..max(len-3, 0) — element_at past the end is NULL and Spark's
    xxhash64 skips null inputs."""
    n = len(toks)
    out = []
    for i in range(max(n - 3, 0) + 1):
        cols = [toks[i + j] if i + j < n else None for j in range(3)]
        out.append(spark_xxhash64(cols) & 0xFFFFFFFF)
    return out


def test_minhash_signatures_match_stdlib_reference(spark, sf_dir):
    from spark_file_mover_spark.llm.dedup import (
        _P,
        _PERMS,
        _minhash_signatures,
    )
    from spark_file_mover_spark.sources.io import load_table

    d = load_table(spark, sf_dir, "documents")
    sig_rows = _minhash_signatures(d).collect()
    got = {
        r.doc_id: [r[f"mh{i}"] for i in range(len(_PERMS))] for r in sig_rows
    }
    docs = _load_documents(sf_dir, limit=100)
    for doc_id, text in docs:
        hs = _ref_shingle_hashes(_ref_toks(text))
        want = [min((a * h + b) % _P for h in hs) for a, b in _PERMS]
        assert got[doc_id] == want, f"doc {doc_id}"


# ---------------------------------------------------------------------------
# dedup-exact vs stdlib-XXH64 survivor selection
# ---------------------------------------------------------------------------


def test_dedup_exact_matches_stdlib_reference(spark, sf_dir):
    """Full survivor set from stdlib: group docs by the XXH64 of their
    whitespace/case-normalized text, keep the min-doc_id row per group —
    the exact semantics `dedup-exact` declares, with no Spark
    expressions anywhere in the reference path."""
    import pyarrow.parquet as pq2

    from spark_file_mover_spark import registry

    registry.load_all()
    tbl = pq2.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_pylist()
    groups: dict[int, dict] = {}
    for row in tbl:
        norm = re.sub(r"\s+", " ", row["text"]).strip().lower()
        h = spark_xxhash64([norm])
        cur = groups.get(h)
        if cur is None or row["doc_id"] < cur["doc_id"]:
            groups[h] = row
    want = {
        (r["doc_id"], r["lang"], r["source"], r["n_chars"])
        for r in groups.values()
    }
    got = {
        (r.doc_id, r.lang, r.source, r.n_chars)
        for r in registry.QUERIES["dedup-exact"](spark, sf_dir).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# text-fingerprint vs a stdlib rolling-hash fold
# ---------------------------------------------------------------------------


def _ref_fingerprint(text: str) -> int:
    acc = 0
    for t in _ref_toks(text):
        first = ord(t[0]) if t else 0
        last = ord(t[-1]) if t else 0
        acc = (acc * 31 + (len(t) * 131 + first * 7 + last)) % 2147483647
    return acc


def test_fingerprint_matches_stdlib_reference(spark, sf_dir):
    from spark_file_mover_spark import registry

    registry.load_all()
    got = {
        r.doc_id: (r.fingerprint, r.n_tokens)
        for r in registry.QUERIES["text-fingerprint"](spark, sf_dir).collect()
    }
    for doc_id, text in _load_documents(sf_dir):
        toks = _ref_toks(text)
        assert got[doc_id] == (_ref_fingerprint(text), len(toks)), doc_id


# ---------------------------------------------------------------------------
# sample-hash-stratified vs stdlib md5-prefix selection
# ---------------------------------------------------------------------------


def test_stratified_sample_matches_stdlib_reference(spark, sf_dir):
    import collections

    import pyarrow.parquet as pq2

    from spark_file_mover_spark import registry

    registry.load_all()
    tbl = pq2.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pylist()
    total = collections.Counter()
    sampled = collections.Counter()
    for row in tbl:
        total[row["lang"]] += 1
        h = int(
            hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:15], 16
        )
        if h % 100 < 20:
            sampled[row["lang"]] += 1
    rows = registry.QUERIES["sample-hash-stratified"](spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(total)
    for r in rows:
        assert (r.n_total, r.n_sampled) == (total[r.lang], sampled[r.lang])
