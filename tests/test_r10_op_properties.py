"""Randomized DIFFERENTIAL tests for the r10 operators (the r9 harness
pattern): hypothesis-generated source tables through the registered
query + oracle over the same parquet bytes. Universes force the edge
cases each key's arithmetic must survive: singleton populations
(quintile boundaries collapse), one-day corpora (cumulative windows of
length 1), same-day interval stacks (sweep-line tie days), empty-ish
docs (0-word readability), duplicate customers."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_file_mover_spark import registry
from tests.test_r9_properties import (
    _CUST_ROW,
    _EVENT_ROW,
    _ORDER_ROW,
    _SETTINGS,
    _run_both,
    _write_customer,
    _write_docs_tbl,
    _write_events,
    _write_orders,
)

registry.load_all()

_R10_SETTINGS = dict(_SETTINGS, max_examples=5)

_EVENTS_R10_KEYS = ["agg-new-vs-returning", "agg-seasonality-dow"]


import pytest  # noqa: E402


@pytest.mark.parametrize("key", _EVENTS_R10_KEYS)
@given(rows=st.lists(_EVENT_ROW, min_size=1, max_size=25))
@settings(**_R10_SETTINGS)
def test_events_r10_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("er10")
    _write_events(d, rows)
    ok, msg = _run_both(key, spark, d, ["events"])
    assert ok, f"{key}: {msg}"


_ORDERS_R10_KEYS = ["window-rfm-segment", "window-concurrency-sweep"]


@pytest.mark.parametrize("key", _ORDERS_R10_KEYS)
@given(rows=st.lists(_ORDER_ROW, min_size=1, max_size=25))
@settings(**_R10_SETTINGS)
def test_orders_r10_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("or10")
    _write_orders(d, rows)
    ok, msg = _run_both(key, spark, d, ["orders"])
    assert ok, f"{key}: {msg}"


@given(rows=st.lists(_CUST_ROW, min_size=1, max_size=25))
@settings(**_R10_SETTINGS)
def test_geo_cell_differential(rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("geo")
    _write_customer(d, rows)
    ok, msg = _run_both("fn-geo-cell", spark, d, ["customer"])
    assert ok, f"fn-geo-cell: {msg}"


_READ_TEXT = st.sampled_from(
    [
        "the quick brown fox.",
        "bcdfg hjklm",  # zero vowels -> 0 syllables
        "aeiou aeiou",  # all-vowel tokens
        "Mr. X went... home?! yes!",  # punctuation runs
        "a",
        "Ünïcode prose, with clauses.",
    ]
)
_READ_ROW = st.tuples(
    _READ_TEXT,
    st.sampled_from(["en", "de"]),
    st.sampled_from(["srcA", "srcB"]),
)


@pytest.mark.parametrize(
    "key", ["text-readability", "multimodal-bmp-meta"]
)
@given(rows=st.lists(_READ_ROW, min_size=1, max_size=20))
@settings(**_R10_SETTINGS)
def test_docs_r10_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dr10")
    _write_docs_tbl(d, rows)
    ok, msg = _run_both(key, spark, d, ["documents"])
    assert ok, f"{key}: {msg}"


# --- r10 second batch -----------------------------------------------------

from tests.test_r9_properties import (  # noqa: E402
    _LI_ROW,
    _write_graph_events,
    _write_lineitem,
)
from tests.test_r10_sink_properties import _write_supplier, _SUPP_ROW  # noqa: E402

_GRAPH_ROW = st.tuples(
    st.integers(min_value=0, max_value=5),  # user_id
    st.integers(min_value=0, max_value=4),  # entity k
)


@pytest.mark.parametrize(
    "key", ["graph-reciprocity", "graph-degree-histogram"]
)
@given(rows=st.lists(_GRAPH_ROW, min_size=1, max_size=30))
@settings(**_R10_SETTINGS)
def test_graph_r10_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gr10")
    _write_graph_events(d, rows)
    ok, msg = _run_both(key, spark, d, ["events"])
    assert ok, f"{key}: {msg}"


@pytest.mark.parametrize("key", ["agg-power-mde", "fn-phone-normalize"])
@given(rows=st.lists(_EVENT_ROW, min_size=1, max_size=25))
@settings(**_R10_SETTINGS)
def test_events_r10b_differential(key, rows, spark, tmp_path_factory):
    # degenerate universes on purpose: all-click corpora (conversion
    # rate 0 -> NULL power numbers), tiny variants
    d = tmp_path_factory.mktemp("er10b")
    _write_events(d, rows)
    ok, msg = _run_both(key, spark, d, ["events"])
    assert ok, f"{key}: {msg}"


@pytest.mark.parametrize(
    "key", ["sample-quota-allocate", "text-novelty-ratio"]
)
@given(rows=st.lists(_READ_ROW, min_size=1, max_size=20))
@settings(**_R10_SETTINGS)
def test_docs_r10b_differential(key, rows, spark, tmp_path_factory):
    # duplicate-heavy tiny corpora: quota remainder ties, novelty 0 on
    # verbatim repeats, gram-less one-token docs
    d = tmp_path_factory.mktemp("dr10b")
    _write_docs_tbl(d, rows)
    ok, msg = _run_both(key, spark, d, ["documents"])
    assert ok, f"{key}: {msg}"


@given(rows=st.lists(_LI_ROW, min_size=1, max_size=25))
@settings(**_R10_SETTINGS)
def test_spearman_differential(rows, spark, tmp_path_factory):
    # duplicate-heavy values force tie runs through the average-rank
    # arithmetic; single-row inputs hit the zero-variance NULL branch
    d = tmp_path_factory.mktemp("spear")
    _write_lineitem(d, rows)
    ok, msg = _run_both("agg-spearman-corr", spark, d, ["lineitem"])
    assert ok, f"agg-spearman-corr: {msg}"


@given(
    crows=st.lists(_CUST_ROW, min_size=1, max_size=20),
    srows=st.lists(_SUPP_ROW, min_size=1, max_size=15),
)
@settings(**_R10_SETTINGS)
def test_geo_nearest_differential(crows, srows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("geoj")
    _write_customer(d, crows)
    _write_supplier(d, srows)
    ok, msg = _run_both(
        "join-geo-cell-nearest", spark, d, ["customer", "supplier"]
    )
    assert ok, f"join-geo-cell-nearest: {msg}"


# --- r10 third batch --------------------------------------------------------


@pytest.mark.parametrize(
    "key",
    ["agg-cohort-ltv", "events-funnel-windowed",
     "sample-downsample-negatives"],
)
@given(rows=st.lists(_EVENT_ROW, min_size=1, max_size=25))
@settings(**_R10_SETTINGS)
def test_events_r10c_differential(key, rows, spark, tmp_path_factory):
    # the event universe has no 'purchase' rows by default — funnel
    # stages empty out (NULL rates), LTV cells vanish (cohorts with no
    # purchases), negatives dominate the downsample — exactly the
    # degenerate shapes these keys must not diverge on
    d = tmp_path_factory.mktemp("er10c")
    _write_events(d, rows)
    ok, msg = _run_both(key, spark, d, ["events"])
    assert ok, f"{key}: {msg}"


_FUNNEL_ROW = st.tuples(
    st.integers(min_value=0, max_value=3),  # user_id
    st.integers(min_value=0, max_value=2),  # day offset
    st.sampled_from([0, 1, 3599_999_999, 3600_000_001, 10**6]),  # sub µs
    st.sampled_from(["view", "click", "purchase"]),  # incl. positives
    st.integers(min_value=1, max_value=30000),
)


@pytest.mark.parametrize(
    "key",
    ["agg-cohort-ltv", "events-funnel-windowed",
     "sample-downsample-negatives"],
)
@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_R10_SETTINGS)
def test_funnel_universe_differential(key, rows, spark, tmp_path_factory):
    # purchase-bearing universe with sub-µs values straddling the
    # 1-hour step boundary (3600_000_001 µs after a same-day view)
    d = tmp_path_factory.mktemp("fr10c")
    _write_events(d, rows)
    ok, msg = _run_both(key, spark, d, ["events"])
    assert ok, f"{key}: {msg}"
