"""Randomized DIFFERENTIAL tests for the WRITE-PATH keys (r10 — the
r9 suite's declared exclusion, now closed): hypothesis generates whole
source tables, writes them as parquet into a tmp corpus, and each
registered sink/roundtrip query — which writes its own artifact
(partitioned / dynamic-overwrite / z-ordered / snapshot / compacted /
CSV / ORC / JSONL / text-lines / nested-JSON) to a fresh tempdir,
re-reads it and returns the re-read relation — must hash-match its
DuckDB oracle over the same source bytes. This is the class of key
where the data travels through a FORMAT on disk, so the failure modes
are different from pure-compute keys: partition-value encoding
(nulls → __HIVE_DEFAULT_PARTITION__), CSV quoting, decimal
annotations, schema merge, bucket predicates over sparse keys.

Example counts stay small (each example pays a Spark write + read
round trip); value universes force collisions — few keys, few days,
duplicate rows, null partition values on every 5th key."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_file_mover_spark import registry
from tests.test_r9_properties import (
    _LI_ROW,
    _ORDER_ROW,
    _SETTINGS,
    _run_both,
    _write_docs_tbl,
    _write_lineitem,
    _write_orders,
)

registry.load_all()

_SINK_SETTINGS = dict(_SETTINGS, max_examples=4)


def _write_supplier(path, rows):
    """rows: (nationkey, cents_bal)."""
    tbl = pa.table(
        {
            "s_suppkey": pa.array(range(len(rows)), pa.int64()),
            "s_name": pa.array(
                [f"Supplier#{i:09d}" for i in range(len(rows))],
                pa.string(),
            ),
            "s_nationkey": pa.array([n for n, _ in rows], pa.int32()),
            "s_acctbal": pa.array(
                [c / 100.0 for _, c in rows], pa.float64()
            ),
        }
    )
    pq.write_table(tbl, str(path / "supplier.parquet"))


def _write_nation(path, names):
    tbl = pa.table(
        {
            "n_nationkey": pa.array(range(len(names)), pa.int32()),
            "n_name": pa.array(names, pa.string()),
            "n_regionkey": pa.array(
                [i % 5 for i in range(len(names))], pa.int32()
            ),
        }
    )
    pq.write_table(tbl, str(path / "nation.parquet"))


# nationkey multiples of 5 force the NULL partition bucket
# (__HIVE_DEFAULT_PARTITION__) to be populated, not latent
_SUPP_ROW = st.tuples(
    st.integers(min_value=0, max_value=12),  # nationkey (0,5,10 -> NULL)
    st.integers(min_value=-99999, max_value=999999),  # acctbal cents
)

# CSV-hostile but contract-legal name content: commas, quotes, spaces,
# unicode — the write must quote and the explicit-schema read must
# unquote to the identical string
_NATION_NAME = st.sampled_from(
    [
        "ALGERIA",
        "a,b",
        'he said "hi"',
        "spa ce",
        "tab\tsep",
        "Ünïcode",
        "semi;colon",
        "'single'",
        "trail ",
    ]
)

_ORDERS_SINK_KEYS = [
    "sink-overwrite-dynamic",
    "sink-zorder",
    "sink-snapshot-read",
    "sink-compact",
    "sink-merge-upsert",
    "repartition-n",
]


@pytest.mark.parametrize("key", _ORDERS_SINK_KEYS)
@given(rows=st.lists(_ORDER_ROW, min_size=1, max_size=25))
@settings(**_SINK_SETTINGS)
def test_orders_sink_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("osink")
    _write_orders(d, rows)
    ok, msg = _run_both(key, spark, d, ["orders"])
    assert ok, f"{key}: {msg}"


_SUPPLIER_SINK_KEYS = [
    "sink-partitioned",
    "scan-schema-evolution",
    "scan-orc-roundtrip",
]


@pytest.mark.parametrize("key", _SUPPLIER_SINK_KEYS)
@given(rows=st.lists(_SUPP_ROW, min_size=1, max_size=20))
@settings(**_SINK_SETTINGS)
def test_supplier_sink_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ssink")
    _write_supplier(d, rows)
    ok, msg = _run_both(key, spark, d, ["supplier"])
    assert ok, f"{key}: {msg}"


_NATION_SINK_KEYS = [
    "scan-csv-roundtrip",
    "scan-csv-corrupt-recover",
]


@pytest.mark.parametrize("key", _NATION_SINK_KEYS)
@given(names=st.lists(_NATION_NAME, min_size=1, max_size=20))
@settings(**_SINK_SETTINGS)
def test_nation_sink_differential(key, names, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nsink")
    _write_nation(d, names)
    ok, msg = _run_both(key, spark, d, ["nation"])
    assert ok, f"{key}: {msg}"


# JSONL / text-lines / nested-JSON must survive escape-hostile text:
# embedded newlines and quotes ride JSON escapes; the text-lines format
# never writes the raw text (a hash rides the line instead)
_DOC_TEXT = st.sampled_from(
    [
        "plain words here",
        'quote " inside',
        "back\\slash",
        "new\nline",
        "uni ödé tokens",
        "a",
        "x y z x y z x y z",
    ]
)
_DOC_ROW10 = st.tuples(
    _DOC_TEXT,
    st.sampled_from(["en", "de"]),
    st.sampled_from(["srcA", "srcB"]),
)

_DOC_SINK_KEYS = [
    "scan-jsonl-roundtrip",
    "scan-text-lines",
    "scan-json-nested",
]


@pytest.mark.parametrize("key", _DOC_SINK_KEYS)
@given(rows=st.lists(_DOC_ROW10, min_size=1, max_size=20))
@settings(**_SINK_SETTINGS)
def test_docs_sink_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dsink")
    _write_docs_tbl(d, rows)
    ok, msg = _run_both(key, spark, d, ["documents"])
    assert ok, f"{key}: {msg}"


@given(rows=st.lists(_LI_ROW, min_size=1, max_size=25))
@settings(**_SINK_SETTINGS)
def test_sorted_pruning_differential(rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("spru")
    _write_lineitem(d, rows)
    ok, msg = _run_both("sink-sorted-pruning", spark, d, ["lineitem"])
    assert ok, f"sink-sorted-pruning: {msg}"
