"""Independent pure-Python references for the r10 statistical and
layout operators — the THIRD formulation next to the Spark plan and
the DuckDB oracle (the r8 pattern): stdlib + pyarrow only, no SQL and
no Spark expressions anywhere in the reference path, recomputing each
statistic from the raw parquet bytes with naive textbook algorithms.
A bug shared by both SQL derivations (e.g. a common misreading of the
tie rule) fails here."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq



def _utc_us(ts) -> int:
    """Microseconds since epoch, interpreting NAIVE (NTZ) timestamps as
    UTC — a bare .timestamp() would read them in host-local time, red
    only under the suite's non-UTC TZ (the engine pins UTC)."""
    from datetime import timezone

    if getattr(ts, "tzinfo", None) is None and hasattr(ts, "replace"):
        ts = ts.replace(tzinfo=timezone.utc)
    return int(round(ts.timestamp() * 1e6))

def _snap9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5) / 1e9


def _cents(v: float) -> int:
    # the DECIMAL(12,2)*100 contract: values are exact 2-decimal doubles
    return round(v * 100)


def test_spearman_matches_pure_python(spark, sf_dir):
    from spark_file_mover_spark import registry

    registry.load_all()
    t = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pydict()
    xs = [_cents(q) for q in t["l_quantity"]]
    ys = [_cents(d) for d in t["l_discount"]]

    def avg_ranks(vals):
        # textbook average ranks: sort, assign mean rank to tie runs
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            mean_rank = (i + 1 + j) / 2  # ranks i+1..j
            for k in range(i, j):
                ranks[order[k]] = mean_rank
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    expected = _snap9(num / den)

    row = registry.QUERIES["agg-spearman-corr"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["n_distinct_x"] == len(set(xs))
    assert row["n_distinct_y"] == len(set(ys))
    # the engine computes the same ratio from integer doubled ranks;
    # the float-rank reference agrees to well inside the snap
    assert abs(row["spearman_rho"] - expected) < 1e-6


def test_quota_matches_pure_python_hamilton(spark, sf_dir):
    from spark_file_mover_spark import registry

    registry.load_all()
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    counts = Counter(t["lang"])
    total, budget = sum(counts.values()), 10_000
    base = {l: budget * n // total for l, n in counts.items()}
    rem = {l: budget * n % total for l, n in counts.items()}
    leftover = budget - sum(base.values())
    for l in sorted(counts, key=lambda l: (-rem[l], l))[:leftover]:
        base[l] += 1
    assert sum(base.values()) == budget

    rows = registry.QUERIES["sample-quota-allocate"](spark, sf_dir).collect()
    assert {r["lang"]: r["quota"] for r in rows} == base


def test_concurrency_sweep_matches_pure_python(spark, sf_dir):
    from spark_file_mover_spark import registry

    registry.load_all()
    t = pq.read_table(f"{sf_dir}/orders.parquet").to_pydict()
    deltas = defaultdict(lambda: [0, 0])  # day -> [starts, ends]
    for k, d in zip(t["o_orderkey"], t["o_orderdate"]):
        day = (d.date() - __import__("datetime").date(1970, 1, 1)).days
        deltas[day][0] += 1
        deltas[day + (k % 14) + 1][1] += 1
    cur, expect = 0, {}
    for day in sorted(deltas):
        s, e = deltas[day]
        cur += s - e
        expect[day] = (s, e, cur)
    peak = max(c for _, _, c in expect.values())

    rows = registry.QUERIES["window-concurrency-sweep"](
        spark, sf_dir
    ).collect()
    assert len(rows) == len(expect)
    for r in rows:
        s, e, c = expect[r["day"]]
        assert (r["n_start"], r["n_end"], r["concurrency"]) == (s, e, c)
        assert r["max_concurrency"] == peak


def test_funnel_windowed_matches_pure_python(spark, sf_dir):
    from spark_file_mover_spark import registry

    registry.load_all()
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    per_user = defaultdict(lambda: defaultdict(list))
    for u, ty, ts in zip(t["user_id"], t["event_type"], t["ts"]):
        us = _utc_us(ts) if hasattr(ts, "timestamp") else ts
        per_user[u][ty].append(us)
    h1, h24 = 3600 * 10**6, 24 * 3600 * 10**6
    nv = nc = np_ = 0
    for u, evs in per_user.items():
        if not evs.get("view"):
            continue
        nv += 1
        tv = min(evs["view"])
        clicks = [x for x in evs.get("click", []) if tv <= x <= tv + h1]
        if not clicks:
            continue
        nc += 1
        tc = min(clicks)
        buys = [x for x in evs.get("purchase", []) if tc <= x <= tc + h24]
        if buys:
            np_ += 1
    row = registry.QUERIES["events-funnel-windowed"](
        spark, sf_dir
    ).collect()[0]
    assert (
        row["n_viewed"],
        row["n_clicked_in_window"],
        row["n_purchased_in_window"],
    ) == (nv, nc, np_)


def test_rfm_boundaries_match_pure_python(spark, sf_dir):
    from spark_file_mover_spark import registry

    registry.load_all()
    t = pq.read_table(f"{sf_dir}/orders.parquet").to_pydict()
    per = defaultdict(lambda: [0, 0, 0])  # cust -> [last_day, n, cents]
    epoch = __import__("datetime").date(1970, 1, 1)
    for c, d, p in zip(t["o_custkey"], t["o_orderdate"], t["o_totalprice"]):
        day = (d.date() - epoch).days
        per[c][0] = max(per[c][0], day)
        per[c][1] += 1
        per[c][2] += _cents(round(p, 2))

    def score(vals, v):
        # boundary b_q = smallest value whose cumulative count reaches
        # ceil(q*n/100); score = 1 + #(boundaries strictly below v)
        sv = sorted(vals)
        n = len(sv)
        bounds = [sv[-(-q * n // 100) - 1] for q in (20, 40, 60, 80)]
        return 1 + sum(v > b for b in bounds)

    lds = [v[0] for v in per.values()]
    ns = [v[1] for v in per.values()]
    ms = [v[2] for v in per.values()]
    rows = registry.QUERIES["window-rfm-segment"](spark, sf_dir).collect()
    assert len(rows) == len(per)
    for r in rows:
        ld, n, m = per[r["custkey"]]
        assert (r["last_day"], r["n_orders"], r["m_cents"]) == (ld, n, m)
        assert r["r_score"] == score(lds, ld)
        assert r["f_score"] == score(ns, n)
        assert r["m_score"] == score(ms, m)


def test_novelty_matches_pure_python(spark, sf_dir):
    from spark_file_mover_spark import registry

    registry.load_all()
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    import re as _re

    first_seen: dict = {}
    per_doc: dict = {}
    for doc_id in sorted(range(len(t["doc_id"])), key=lambda i: t["doc_id"][i]):
        did = t["doc_id"][doc_id]
        toks = _re.split(r"\s+", t["text"][doc_id].strip().lower())
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        for g in grams:
            first_seen.setdefault(g, did)
        per_doc[did] = grams
    rows = registry.QUERIES["text-novelty-ratio"](spark, sf_dir).collect()
    for r in rows:
        grams = per_doc[r["doc_id"]]
        assert r["n_grams"] == len(grams)
        assert r["n_novel"] == sum(
            first_seen[g] == r["doc_id"] for g in grams
        )
