"""Randomized DIFFERENTIAL tests for the r10-new keys (r11 item 4):
hypothesis generates random input tables, writes them as parquet into
a tmp corpus dir, and both engines run the REGISTERED query + oracle
over the same bytes — the harness contract of test_r9_properties.py,
extended to the 18 r10-new keys per the r10 verdict.

Excluded, with rationale:

* ``multimodal-bmp-meta`` — a pinned-binary-fixture parser (random
  bytes are not BMP files; the header walk is exhaustively pinned in
  tests/test_multimodal_dims.py on genuine fixtures).
* the r11-changed structural keys (reciprocity/funnel/chisq/set-ops)
  appear here too since their implementations are new this round.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_file_mover_spark import registry
from tests.test_r9_properties import (
    _CUST_ROW,
    _FUNNEL_ROW,
    _ORDER_ROW,
    _SETTINGS,
    _run_both,
    _write_customer,
    _write_docs_tbl,
    _write_events,
    _write_graph_events,
    _write_lineitem,
    _write_orders,
)

registry.load_all()


# ---------------------------------------------------------------------------
# events-plane r10 keys — funnel/cohort/experiment/seasonality family
# ---------------------------------------------------------------------------

_EVENTS_KEYS_R10 = [
    "events-funnel-windowed",
    "agg-new-vs-returning",
    "agg-seasonality-dow",
    "agg-cohort-ltv",
    "agg-power-mde",
    "fn-phone-normalize",  # synthesizes raw numbers from event_id
    "agg-chisq-independence",  # r11 structural change (checkpointed obs)
]


@pytest.mark.parametrize("key", _EVENTS_KEYS_R10)
@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_r10_events_keys_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11ev")
    _write_events(d, rows)
    ok, msg = _run_both(key, spark, d, ["events"])
    assert ok, f"{key}: {msg}"


# ---------------------------------------------------------------------------
# orders-plane r10 keys — RFM quintiles and the concurrency sweep
# ---------------------------------------------------------------------------

_ORDERS_KEYS_R10 = [
    "window-rfm-segment",
    "window-concurrency-sweep",
]


@pytest.mark.parametrize("key", _ORDERS_KEYS_R10)
@given(rows=st.lists(_ORDER_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_r10_orders_keys_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11ord")
    _write_orders(d, rows)
    ok, msg = _run_both(key, spark, d, ["orders"])
    assert ok, f"{key}: {msg}"


# ---------------------------------------------------------------------------
# lineitem-plane — Spearman under heavy ties (the regime it declares)
# ---------------------------------------------------------------------------

_LINE_ROW = st.tuples(
    st.integers(min_value=0, max_value=9),  # okey
    st.integers(min_value=0, max_value=9),  # pkey
    st.integers(min_value=1, max_value=5),  # qty: few distinct -> ties
    st.integers(min_value=100, max_value=99999),  # cents price
    st.integers(min_value=0, max_value=10),  # disc pct: 11 distinct
    st.integers(min_value=0, max_value=5),  # flag idx
    st.integers(min_value=0, max_value=3),  # ship quarter
)


@given(rows=st.lists(_LINE_ROW, min_size=2, max_size=25))
@settings(**_SETTINGS)
def test_spearman_differential(rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11li")
    _write_lineitem(d, rows)
    ok, msg = _run_both("agg-spearman-corr", spark, d, ["lineitem"])
    assert ok, msg


# ---------------------------------------------------------------------------
# documents-plane r10 keys — readability, novelty, quota allocation
# ---------------------------------------------------------------------------

_WORDS = ["the", "cat", "sat", "on", "a", "mat", "dogs", "run", "fast."]


@st.composite
def _doc_rows(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    rows = []
    for i in range(n):
        words = draw(
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=30)
        )
        rows.append(
            (
                " ".join(words),
                draw(st.sampled_from(["en", "de", "fr"])),
                draw(st.sampled_from(["srcA", "srcB"])),
            )
        )
    # duplicate-heavy suffix: novelty's cross-doc gram reuse needs dups
    n_dup = draw(st.integers(min_value=0, max_value=n // 2))
    for j in range(n_dup):
        rows[n - 1 - j] = rows[j]
    return rows


_DOC_KEYS_R10 = [
    "text-readability",
    "text-novelty-ratio",
    "sample-quota-allocate",
]


@pytest.mark.parametrize("key", _DOC_KEYS_R10)
@given(rows=_doc_rows())
@settings(**_SETTINGS)
def test_r10_doc_keys_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11doc")
    _write_docs_tbl(d, rows)
    ok, msg = _run_both(key, spark, d, ["documents"])
    assert ok, f"{key}: {msg}"


# ---------------------------------------------------------------------------
# customer/supplier-plane — geo-cell parse + cell-blocked nearest join
# ---------------------------------------------------------------------------


def _write_supplier(path, n):
    tbl = pa.table(
        {
            "s_suppkey": pa.array(range(n), pa.int64()),
            "s_name": pa.array(
                [f"Supplier#{i:09d}" for i in range(n)], pa.string()
            ),
            "s_nationkey": pa.array([i % 5 for i in range(n)], pa.int32()),
            "s_acctbal": pa.array(
                [float(i * 7 % 1000) for i in range(n)], pa.float64()
            ),
        }
    )
    pq.write_table(tbl, str(path / "supplier.parquet"))


@given(
    crows=st.lists(_CUST_ROW, min_size=1, max_size=20),
    n_supp=st.integers(min_value=1, max_value=10),
)
@settings(**_SETTINGS)
def test_geo_cell_keys_differential(crows, n_supp, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11geo")
    _write_customer(d, crows)
    _write_supplier(d, n_supp)
    for key, tables in (
        ("fn-geo-cell", ["customer"]),
        ("join-geo-cell-nearest", ["customer", "supplier"]),
    ):
        ok, msg = _run_both(key, spark, d, tables)
        assert ok, f"{key}: {msg}"


# ---------------------------------------------------------------------------
# graph-plane r10 keys — reciprocity (r11 rewrite) + degree histogram
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # user
            st.integers(min_value=0, max_value=6),  # entity k
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_reciprocity_differential(rows, spark, tmp_path_factory):
    """Random bipartite graphs through the r11 cached-edge rewrite:
    even/odd entity mixes vary the reciprocal-edge mass from 0 to
    |fwd|; duplicate (user, k) rows exercise the DISTINCT contract."""
    d = tmp_path_factory.mktemp("r11rec")
    _write_graph_events(d, rows)
    ok, msg = _run_both("graph-reciprocity", spark, d, ["events"])
    assert ok, msg


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_degree_histogram_differential(rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11deg")
    # every-20th-event edge sampling (the K3/K4 adjacency): pad the
    # row list so several rows land on sampled ids
    padded = [rows[i % len(rows)] for i in range(20 * len(rows))]
    _write_graph_events(d, padded)
    ok, msg = _run_both("graph-degree-histogram", spark, d, ["events"])
    assert ok, msg


# ---------------------------------------------------------------------------
# set-ops — r11 presence-flag rewrite under duplicate keys
# ---------------------------------------------------------------------------


@given(rows=st.lists(_CUST_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_setops_rewrite_differential(rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11set")
    _write_customer(d, rows)
    ok, msg = _run_both(
        "set-union-intersect-except", spark, d, ["customer"]
    )
    assert ok, msg


# ---------------------------------------------------------------------------
# r11-NEW keys — distribution-trick statistics, zipf, windowed top-k,
# global clustering
# ---------------------------------------------------------------------------

_R11_EVENTS_KEYS = [
    "agg-theil-index",
    "agg-lorenz-deciles",
    "agg-winsorized-stats",
    "stream-topk-windowed",
]


@pytest.mark.parametrize("key", _R11_EVENTS_KEYS)
@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_r11_events_keys_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11new")
    _write_events(d, rows)
    ok, msg = _run_both(key, spark, d, ["events"])
    assert ok, f"{key}: {msg}"


@given(rows=_doc_rows())
@settings(**_SETTINGS)
def test_zipf_fit_differential(rows, spark, tmp_path_factory):
    """Random corpora with duplicate-heavy suffixes: frequency ties in
    the top-50 (the tok tiebreak), vocabularies smaller than the fit
    window (k_fit < 50), single-token corpora (zero x-variance ->
    NULL fit)."""
    d = tmp_path_factory.mktemp("r11zipf")
    _write_docs_tbl(d, rows)
    ok, msg = _run_both("text-zipf-fit", spark, d, ["documents"])
    assert ok, msg


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_global_clustering_differential(rows, spark, tmp_path_factory):
    """Random co-interaction graphs through the K5-cached projection:
    triangle-free graphs (C = 0), no deg>=2 nodes (NULL averages),
    dense cliques (C = 1)."""
    d = tmp_path_factory.mktemp("r11gc")
    padded = [rows[i % len(rows)] for i in range(20 * len(rows))]
    _write_graph_events(d, padded)
    ok, msg = _run_both("graph-global-clustering", spark, d, ["events"])
    assert ok, msg


@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_bootstrap_ci_differential(rows, spark, tmp_path_factory):
    """Random event tables through the Poisson bootstrap: tiny
    populations (empty replicates drop out), single users (degenerate
    CI = the point), zero-spend users."""
    d = tmp_path_factory.mktemp("r11boot")
    _write_events(d, rows)
    ok, msg = _run_both("agg-bootstrap-ci", spark, d, ["events"])
    assert ok, msg


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_hits_differential(rows, spark, tmp_path_factory):
    """Random bipartite graphs through exact-integer HITS: dangling
    nodes (hub 0), odd entities (no back-edge -> authority-only),
    duplicate interactions (DISTINCT contract)."""
    d = tmp_path_factory.mktemp("r11hits")
    _write_graph_events(d, rows)
    ok, msg = _run_both("graph-hits", spark, d, ["events"])
    assert ok, msg


@given(rows=_doc_rows())
@settings(**_SETTINGS)
def test_webp_meta_differential(rows, spark, tmp_path_factory):
    """doc_id-synthesized WebP containers across all three variants:
    the doc ids sweep the w%53 / h%41 / alpha%2 / variant%3 lattice."""
    d = tmp_path_factory.mktemp("r11webp")
    _write_docs_tbl(d, rows)
    ok, msg = _run_both("multimodal-webp-meta", spark, d, ["documents"])
    assert ok, msg


@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_ohlc_bars_differential(rows, spark, tmp_path_factory):
    """Random event tables through the argmin-aggregate candles:
    same-timestamp ties (the event_id tiebreak), single-observation
    bars (open = close = high = low)."""
    d = tmp_path_factory.mktemp("r11ohlc")
    _write_events(d, rows)
    ok, msg = _run_both("window-ohlc-bars", spark, d, ["events"])
    assert ok, msg


@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_temporal_split_differential(rows, spark, tmp_path_factory):
    """Random event tables through the temporal split: single-day
    corpora (everything lands on/before the cutoff), sparse users on
    one side only (overlap audit)."""
    d = tmp_path_factory.mktemp("r11tsplit")
    _write_events(d, rows)
    ok, msg = _run_both("sample-temporal-split", spark, d, ["events"])
    assert ok, msg


@given(rows=_doc_rows())
@settings(**_SETTINGS)
def test_flac_meta_differential(rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11flac")
    _write_docs_tbl(d, rows)
    ok, msg = _run_both("multimodal-flac-meta", spark, d, ["documents"])
    assert ok, msg


_R11_BATCH6_EVENT_KEYS = [
    "window-calendar-mtd-ytd",
    "agg-stickiness-dau-mau",
]


@pytest.mark.parametrize("key", _R11_BATCH6_EVENT_KEYS)
@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_r11_batch6_events_differential(key, rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11b6")
    _write_events(d, rows)
    ok, msg = _run_both(key, spark, d, ["events"])
    assert ok, f"{key}: {msg}"


@given(rows=st.lists(_ORDER_ROW, min_size=0, max_size=25))
@settings(**_SETTINGS)
def test_table_checksum_differential(rows, spark, tmp_path_factory):
    """Random order tables through the canonical-row digest: empty
    tables (zero digests), duplicate rows (SUM catches what XOR
    cancels), money tie cents."""
    d = tmp_path_factory.mktemp("r11ck")
    _write_orders(d, rows)
    ok, msg = _run_both("etl-table-checksum", spark, d, ["orders"])
    assert ok, msg


@given(rows=st.lists(_ORDER_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_pareto_frontier_differential(rows, spark, tmp_path_factory):
    """Random order tables through the distribution-trick skyline vs
    the oracle's quadratic NOT EXISTS: duplicate (spend, day) points
    (all kept), single-customer tables, dominance chains."""
    d = tmp_path_factory.mktemp("r11sky")
    _write_orders(d, rows)
    ok, msg = _run_both("window-pareto-frontier", spark, d, ["orders"])
    assert ok, msg


@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_survival_km_differential(rows, spark, tmp_path_factory):
    """Random event tables through Kaplan-Meier: no purchases at all
    (empty curve), everyone converts on day 0 (d=n -> survival 0),
    heavy censoring."""
    d = tmp_path_factory.mktemp("r11km")
    _write_events(d, rows)
    ok, msg = _run_both("agg-survival-km", spark, d, ["events"])
    assert ok, msg


@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_percentile_bands_differential(rows, spark, tmp_path_factory):
    """Random event tables through the per-hour exact percentile
    panel: single-observation buckets (p50=p95=p99), dense cent ties
    (the nearest-rank boundary inside a tie run)."""
    d = tmp_path_factory.mktemp("r11pct")
    _write_events(d, rows)
    ok, msg = _run_both("window-percentile-bands", spark, d, ["events"])
    assert ok, msg


@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_assoc_lift_differential(rows, spark, tmp_path_factory):
    """Random baskets through support/confidence/lift: single-type
    users (no pairs), disjoint type populations (lift < 1), full
    co-occurrence (lift = 1/support)."""
    d = tmp_path_factory.mktemp("r11lift")
    _write_events(d, rows)
    ok, msg = _run_both("agg-assoc-lift", spark, d, ["events"])
    assert ok, msg


@given(rows=st.lists(_FUNNEL_ROW, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_drawdown_differential(rows, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r11dd")
    _write_events(d, rows)
    ok, msg = _run_both("window-drawdown", spark, d, ["events"])
    assert ok, msg
