"""Independent pure-Python references for the r11 operators — the
THIRD formulation next to the Spark plan and the DuckDB oracle (the
r8/r10 pattern): stdlib + pyarrow only, recomputing each statistic
from the raw parquet bytes with naive textbook algorithms. A bug
shared by both SQL derivations fails here."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from spark_file_mover_spark import registry

registry.load_all()


def _snap9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5) / 1e9


def _cents(v: float) -> int:
    return round(v * 100)


def _per_user_cents(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    pu = defaultdict(int)
    for u, v in zip(t["user_id"], t["value"]):
        pu[u] += _cents(v) if v is not None else 0
    return pu


def test_theil_matches_pure_python(spark, sf_dir):
    pu = _per_user_cents(sf_dir)
    ys = [y for y in pu.values() if y > 0]
    n, t = len(ys), sum(ys)
    # c-weighted via the value distribution, like the engines
    dist = Counter(ys)
    st = sl = 0.0
    for yc, c in dist.items():
        r = (float(yc) * n) / float(t)
        st += c * _snap9(r * math.log(r))
        sl += c * _snap9(math.log(float(t) / (float(yc) * n)))
    row = registry.QUERIES["agg-theil-index"](spark, sf_dir).collect()[0]
    assert row["n_users"] == n
    assert row["total_cents"] == t
    assert row["theil_t"] == _snap9(st / n)
    assert row["theil_l"] == _snap9(sl / n)


def test_lorenz_matches_pure_python(spark, sf_dir):
    ys = sorted(_per_user_cents(sf_dir).values())
    n, total = len(ys), sum(ys)
    by_dec = defaultdict(lambda: [0, 0])
    for i, y in enumerate(ys, 1):
        d = -(-10 * i // n)  # ceil(10i/n)
        by_dec[d][0] += 1
        by_dec[d][1] += y
    rows = registry.QUERIES["agg-lorenz-deciles"](spark, sf_dir).collect()
    cum = 0
    assert len(rows) == len(by_dec)
    for r in rows:
        cnt, cents = by_dec[r["decile"]]
        cum += cents
        assert r["n_users"] == cnt
        assert r["cents"] == cents
        assert r["cum_cents"] == cum
        assert r["share"] == _snap9(float(cents) / float(total))
        assert r["cum_share"] == _snap9(float(cum) / float(total))


def test_winsorized_matches_pure_python(spark, sf_dir):
    ys = sorted(_per_user_cents(sf_dir).values())
    n = len(ys)
    k = n // 20
    lo, hi = ys[k], ys[n - k - 1]
    trimmed = ys[k : n - k]
    row = registry.QUERIES["agg-winsorized-stats"](spark, sf_dir).collect()[0]
    assert (row["n_users"], row["k_trim"]) == (n, k)
    assert (row["lo_cents"], row["hi_cents"]) == (lo, hi)
    assert row["mean_cents"] == _snap9(float(sum(ys)) / n)
    assert row["trimmed_mean_cents"] == _snap9(
        float(sum(trimmed)) / (n - 2 * k)
    )
    assert row["winsorized_mean_cents"] == _snap9(
        float(sum(trimmed) + k * (lo + hi)) / n
    )


def _sparse_user_graph(sf_dir, mod=20, cap=64):
    """The K5 capped co-interaction projection, naively."""
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    import json

    ent_users = defaultdict(set)
    for eid, u, props in zip(t["event_id"], t["user_id"], t["props"]):
        if eid % mod == 0:
            ent_users[json.loads(props)["k"]].add(u)
    adj = defaultdict(set)
    for users in ent_users.values():
        if len(users) > cap:
            continue
        us = sorted(users)
        for i, a in enumerate(us):
            for b in us[i + 1 :]:
                adj[a].add(b)
                adj[b].add(a)
    return adj


def test_global_clustering_matches_pure_python(spark, sf_dir):
    adj = _sparse_user_graph(sf_dir)
    tri = Counter()
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for x in (a, b, c):
                        tri[x] += 1
    n_nodes = len(nodes)
    n_edges = sum(len(v) for v in adj.values()) // 2
    n_tri = sum(tri.values()) // 3
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in nodes)
    elig = [v for v in nodes if len(adj[v]) >= 2]
    local = sum(
        _snap9(
            float(2 * tri[v]) / (float(len(adj[v])) * (len(adj[v]) - 1))
        )
        for v in elig
    )
    row = registry.QUERIES["graph-global-clustering"](
        spark, sf_dir
    ).collect()[0]
    assert row["n_nodes"] == n_nodes
    assert row["n_edges"] == n_edges
    assert row["n_triangles"] == n_tri
    assert row["n_wedges"] == wedges
    assert row["global_clustering"] == _snap9(
        float(3 * n_tri) / float(wedges)
    )
    assert row["avg_local_clustering"] == _snap9(local / len(elig))


def test_hits_matches_pure_python(spark, sf_dir):
    import json

    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    base = 10**6
    fwd, back = set(), set()
    for u, props in zip(t["user_id"], t["props"]):
        k = json.loads(props)["k"]
        fwd.add((u, base + k))
        if k % 2 == 0:
            back.add((base + k, u))
    e = list(fwd) + list(back)
    a1 = Counter(d for _, d in e)
    h1 = Counter()
    for s, d in e:
        h1[s] += a1[d]
    a2 = Counter()
    for s, d in e:
        a2[d] += h1[s]
    h2 = Counter()
    for s, d in e:
        h2[s] += a2[d]
    nodes = {s for s, _ in e} | {d for _, d in e}
    rows = registry.QUERIES["graph-hits"](spark, sf_dir).collect()
    assert len(rows) == len(nodes)
    for r in rows:
        assert r["authority"] == a2.get(r["node_id"], 0), r
        assert r["hub"] == h2.get(r["node_id"], 0), r
        assert r["is_entity"] == (r["node_id"] >= base)


def test_zipf_matches_pure_python(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    freq = Counter()
    for text in t["text"]:
        for tok in re.split(r"\s+", text.strip().lower()):
            freq[tok] += 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    xi = [math.floor(math.log(float(r)) * 1e9 + 0.5) for r in
          range(1, len(top) + 1)]
    yi = [math.floor(math.log(float(f)) * 1e9 + 0.5) for _, f in top]
    kk = len(top)
    sx, sy = sum(xi), sum(yi)
    sxx = sum(a * a for a in xi)
    sxy = sum(a * b for a, b in zip(xi, yi))
    num, den = kk * sxy - sx * sy, kk * sxx - sx * sx
    slope = _snap9(float(num) / float(den))
    row = registry.QUERIES["text-zipf-fit"](spark, sf_dir).collect()[0]
    assert row["k_fit"] == kk
    assert row["zipf_slope"] == slope
    assert row["intercept"] == _snap9(
        (float(sy) / kk) / 1e9
        - (float(num) / float(den)) * ((float(sx) / kk) / 1e9)
    )


def test_topk_windowed_matches_pure_python(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    cells = Counter()
    for ts, et in zip(t["ts"], t["event_type"]):
        cells[(ts.replace(minute=0, second=0, microsecond=0), et)] += 1
    by_w = defaultdict(list)
    for (w, et), n in cells.items():
        by_w[w].append((et, n))
    expected = []
    for w in sorted(by_w):
        ranked = sorted(by_w[w], key=lambda x: (-x[1], x[0]))[:3]
        for i, (et, n) in enumerate(ranked, 1):
            expected.append((w.strftime("%Y-%m-%d %H:%M:%S"), i, et, n))
    rows = registry.QUERIES["stream-topk-windowed"](
        spark, sf_dir
    ).collect()
    got = [
        (r["window_start"], r["rnk"], r["event_type"], r["n_events"])
        for r in rows
    ]
    assert got == expected


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bootstrap_ci_matches_pure_python(spark, sf_dir):
    from spark_file_mover_spark.operators.aggregates import (
        _BOOT_B,
        _BOOT_CDF,
    )

    pu = _per_user_cents(sf_dir)

    def w(u, b):
        x = _md5_60(f"{u}:{b}")
        for k, thr in enumerate(_BOOT_CDF):
            if x < thr:
                return k
        return 8

    means = []
    for b in range(_BOOT_B):
        wy = wn = 0
        for u, yc in pu.items():
            ww = w(u, b)
            wy += ww * yc
            wn += ww
        if wn > 0:
            means.append(_snap9(float(wy) / wn))
    means.sort()
    nb = len(means)
    k = -(-nb // 20)  # ceil(nb/20)
    row = registry.QUERIES["agg-bootstrap-ci"](spark, sf_dir).collect()[0]
    assert row["n_users"] == len(pu)
    assert row["n_valid_replicates"] == nb
    assert row["mean_cents"] == _snap9(
        float(sum(pu.values())) / len(pu)
    )
    assert row["ci_lo"] == means[k - 1]
    assert row["ci_hi"] == means[nb - k]


def test_webp_meta_matches_spec_formulas(spark, sf_dir):
    rows = registry.QUERIES["multimodal-webp-meta"](
        spark, sf_dir
    ).collect()
    for r in rows:
        doc = r["asset_id"]
        v = doc % 3
        assert r["format"] == ["VP8X", "VP8 ", "VP8L"][v]
        assert r["width"] == 1 + doc % 53
        assert r["height"] == 1 + doc % 41
        assert r["has_alpha"] == (doc % 2 == 0 and v != 1)
        assert r["magic_ok"] and r["size_ok"]
        assert r["file_size"] == (26 if v == 2 else 30)


def test_ohlc_matches_pure_python(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    bars = {}
    for eid, ts, et, v in zip(
        t["event_id"], t["ts"], t["event_type"], t["value"]
    ):
        if v is None:
            continue
        w = ts.replace(minute=0, second=0, microsecond=0)
        c = _cents(v)
        b = bars.setdefault((w, et), [])
        b.append((ts, eid, c))
    rows = registry.QUERIES["window-ohlc-bars"](spark, sf_dir).collect()
    assert len(rows) == len(bars)
    for r in rows:
        import datetime

        w = datetime.datetime.strptime(
            r["window_start"], "%Y-%m-%d %H:%M:%S"
        )
        obs = sorted(bars[(w, r["event_type"])])
        cs = [c for _, _, c in obs]
        assert r["open_cents"] == obs[0][2]
        assert r["close_cents"] == obs[-1][2]
        assert r["high_cents"] == max(cs)
        assert r["low_cents"] == min(cs)
        assert r["n_obs"] == len(cs)
        assert r["total_cents"] == sum(cs)


def test_temporal_split_matches_pure_python(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    days = [(ts - epoch).days for ts in t["ts"]]
    n = len(days)
    sd = sorted(days)
    cutoff = sd[-(-8 * n // 10) - 1]  # nearest-rank ceil(0.8n)
    ut, ue = set(), set()
    for u, d in zip(t["user_id"], days):
        (ut if d <= cutoff else ue).add(u)
    row = registry.QUERIES["sample-temporal-split"](
        spark, sf_dir
    ).collect()[0]
    assert row["cutoff_day"] == cutoff
    assert row["n_train"] == sum(d <= cutoff for d in days)
    assert row["n_test"] == sum(d > cutoff for d in days)
    assert row["n_users_train"] == len(ut)
    assert row["n_users_test"] == len(ue)
    assert row["n_users_overlap"] == len(ut & ue)


def test_flac_meta_matches_spec_formulas(spark, sf_dir):
    rates = [8000, 16000, 22050, 24000, 44100, 48000, 96000]
    rows = registry.QUERIES["multimodal-flac-meta"](
        spark, sf_dir
    ).collect()
    for r in rows:
        doc = r["asset_id"]
        total = (doc * 4801 + 7) % 2**36
        rate = rates[doc % 7]
        assert r["sample_rate"] == rate
        assert r["channels"] == 1 + doc % 8
        assert r["bits_per_sample"] == 8 + doc % 25
        assert r["total_samples"] == total
        assert r["duration_ms"] == total * 1000 // rate
        assert r["min_blocksize"] == 576 + doc % 100
        assert r["max_blocksize"] == 576 + doc % 100 + doc % 50
        assert r["magic_ok"] and r["streaminfo_ok"]


def test_stickiness_matches_pure_python(spark, sf_dir):
    import datetime

    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    epoch = datetime.datetime(1970, 1, 1)
    ud = {(u, (ts - epoch).days) for u, ts in zip(t["user_id"], t["ts"])}
    by_m = defaultdict(lambda: [set(), defaultdict(set)])
    for u, d in ud:
        ym = (epoch + datetime.timedelta(days=d)).strftime("%Y-%m")
        by_m[ym][0].add(u)
        by_m[ym][1][d].add(u)
    rows = registry.QUERIES["agg-stickiness-dau-mau"](
        spark, sf_dir
    ).collect()
    assert len(rows) == len(by_m)
    for r in rows:
        users, days = by_m[r["month"]]
        assert r["mau"] == len(users)
        assert r["n_days"] == len(days)
        sum_dau = sum(len(v) for v in days.values())
        assert r["sum_dau"] == sum_dau
        assert r["stickiness"] == _snap9(
            (float(sum_dau) / len(days)) / float(len(users))
        )


def test_mtd_ytd_matches_pure_python(spark, sf_dir):
    import datetime

    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    epoch = datetime.datetime(1970, 1, 1)
    per_day = defaultdict(lambda: [0, 0])
    for ts, v in zip(t["ts"], t["value"]):
        d = (ts - epoch).days
        per_day[d][0] += 1
        per_day[d][1] += _cents(v) if v is not None else 0
    rows = registry.QUERIES["window-calendar-mtd-ytd"](
        spark, sf_dir
    ).collect()
    assert len(rows) == len(per_day)
    mtd, ytd = defaultdict(int), defaultdict(int)
    for r, d in zip(rows, sorted(per_day)):
        dt = epoch + datetime.timedelta(days=d)
        assert r["day_str"] == dt.strftime("%Y-%m-%d")
        n, cents = per_day[d]
        mtd[dt.strftime("%Y-%m")] += cents
        ytd[dt.strftime("%Y")] += cents
        assert (r["n_events"], r["cents"]) == (n, cents)
        assert r["mtd_cents"] == mtd[dt.strftime("%Y-%m")]
        assert r["ytd_cents"] == ytd[dt.strftime("%Y")]


def test_table_checksum_matches_pure_python(spark, sf_dir):
    import datetime

    t = pq.read_table(f"{sf_dir}/orders.parquet").to_pydict()
    epoch = datetime.datetime(1970, 1, 1)
    hs = []
    for i in range(len(t["o_orderkey"])):
        cents = round(t["o_totalprice"][i] * 100)
        us = int((t["o_orderdate"][i] - epoch).total_seconds() * 1e6)
        canon = (
            f"{t['o_orderkey'][i]}|{t['o_custkey'][i]}|"
            f"{t['o_orderstatus'][i]}|{cents}|{us}|"
            f"{t['o_orderpriority'][i]}"
        )
        hs.append(_md5_60(canon))
    x = 0
    for h in hs:
        x ^= h
    row = registry.QUERIES["etl-table-checksum"](spark, sf_dir).collect()[0]
    assert row["n_rows"] == len(hs)
    assert row["checksum_sum"] == str(sum(hs))
    assert row["checksum_xor"] == x
    assert row["min_row_hash"] == min(hs)
    assert row["max_row_hash"] == max(hs)


def test_pareto_frontier_matches_pure_python(spark, sf_dir):
    import datetime

    t = pq.read_table(f"{sf_dir}/orders.parquet").to_pydict()
    epoch = datetime.datetime(1970, 1, 1)
    spend, last = defaultdict(int), defaultdict(int)
    for ck, tp, od in zip(
        t["o_custkey"], t["o_totalprice"], t["o_orderdate"]
    ):
        spend[ck] += _cents(tp)
        last[ck] = max(last[ck], (od - epoch).days)
    pts = {c: (spend[c], last[c]) for c in spend}
    frontier = []
    for c, (s, d) in pts.items():
        dominated = any(
            (s2 >= s and d2 >= d and (s2 > s or d2 > d))
            for c2, (s2, d2) in pts.items()
            if c2 != c
        )
        if not dominated:
            frontier.append((s, c, d))
    frontier.sort()
    rows = registry.QUERIES["window-pareto-frontier"](
        spark, sf_dir
    ).collect()
    got = [(r["spend_cents"], r["custkey"], r["last_day"]) for r in rows]
    assert got == frontier


def test_survival_km_matches_pure_python(spark, sf_dir):
    import datetime

    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    epoch = datetime.datetime(1970, 1, 1)
    first, conv, horizon = {}, {}, 0
    for u, ts, et in zip(t["user_id"], t["ts"], t["event_type"]):
        d = (ts - epoch).days
        horizon = max(horizon, d)
        first[u] = min(first.get(u, d), d)
        if et == "purchase":
            conv[u] = min(conv.get(u, d), d)
    durs = []
    for u, f in first.items():
        if u in conv:
            durs.append((conv[u] - f, True))
        else:
            durs.append((horizon - f, False))
    times = sorted({t_ for t_, ev in durs if ev})
    surv, out = 1.0, []
    hit_zero = False
    cum_i9 = 0
    for t_ in times:
        n_risk = sum(1 for d, _ in durs if d >= t_)
        d_ = sum(1 for d, ev in durs if d == t_ and ev)
        if d_ == n_risk:
            hit_zero = True
        else:
            cum_i9 += math.floor(
                math.log(1.0 - float(d_) / float(n_risk)) * 1e9 + 0.5
            )
        s = 0.0 if hit_zero else _snap9(math.exp(cum_i9 / 1e9))
        out.append((t_, n_risk, d_, s))
    rows = registry.QUERIES["agg-survival-km"](spark, sf_dir).collect()
    got = [
        (r["t_days"], r["n_risk"], r["n_conv"], r["survival"])
        for r in rows
    ]
    assert got == out


def test_percentile_bands_matches_pure_python(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    by_w = defaultdict(list)
    for ts, v in zip(t["ts"], t["value"]):
        if v is None:
            continue
        w = ts.replace(minute=0, second=0, microsecond=0)
        by_w[w].append(_cents(v))
    rows = registry.QUERIES["window-percentile-bands"](
        spark, sf_dir
    ).collect()
    assert len(rows) == len(by_w)
    for r, w in zip(rows, sorted(by_w)):
        cs = sorted(by_w[w])
        n = len(cs)
        assert r["window_start"] == w.strftime("%Y-%m-%d %H:%M:%S")
        assert r["n_obs"] == n
        for p, col in ((50, "p50_cents"), (95, "p95_cents"),
                       (99, "p99_cents")):
            rank = -(-p * n // 100)  # ceil(p*n/100)
            assert r[col] == cs[rank - 1], (w, p)


def test_assoc_lift_matches_pure_python(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    ut = {(u, et) for u, et in zip(t["user_id"], t["event_type"])}
    users = {u for u, _ in ut}
    n = len(users)
    tc = Counter(et for _, et in ut)
    by_user = defaultdict(set)
    for u, et in ut:
        by_user[u].add(et)
    pairs = Counter()
    for ets in by_user.values():
        s = sorted(ets)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pairs[(a, b)] += 1
    rows = registry.QUERIES["agg-assoc-lift"](spark, sf_dir).collect()
    assert len(rows) == len(pairs)
    for r in rows:
        k = (r["ante"], r["cons"])
        n_ab = pairs[k]
        assert r["n_ab"] == n_ab
        assert r["n_ante"] == tc[r["ante"]]
        assert r["n_cons"] == tc[r["cons"]]
        assert r["support"] == _snap9(float(n_ab) / float(n))
        assert r["confidence"] == _snap9(
            float(n_ab) / float(tc[r["ante"]])
        )
        assert r["lift"] == _snap9(
            (float(n_ab) * float(n))
            / (float(tc[r["ante"]]) * float(tc[r["cons"]]))
        )


def test_drawdown_matches_pure_python(spark, sf_dir):
    import datetime

    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    epoch = datetime.datetime(1970, 1, 1)
    per_day = defaultdict(int)
    for ts, v in zip(t["ts"], t["value"]):
        per_day[(ts - epoch).days] += _cents(v) if v is not None else 0
    rows = registry.QUERIES["window-drawdown"](spark, sf_dir).collect()
    assert len(rows) == len(per_day)
    peak, maxdd = 0, 0
    exp = []
    for d in sorted(per_day):
        c = per_day[d]
        peak = max(peak, c)
        maxdd = max(maxdd, peak - c)
        exp.append((d, c, peak, peak - c))
    for r, (d, c, peak_, dd) in zip(rows, exp):
        dt = epoch + datetime.timedelta(days=d)
        assert r["day_str"] == dt.strftime("%Y-%m-%d")
        assert (r["cents"], r["peak_cents"], r["drawdown_cents"]) == (
            c, peak_, dd,
        )
        assert r["drawdown_frac"] == (
            _snap9(float(dd) / float(peak_)) if peak_ > 0 else None
        )
        assert r["max_drawdown_cents"] == maxdd
