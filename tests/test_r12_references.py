"""Independent pure-Python references for the r12 second-wave
operators — the THIRD formulation next to the Spark plan and the
DuckDB oracle (the r8/r10/r11 pattern): stdlib + pyarrow only,
recomputing each statistic from the raw parquet bytes with naive
textbook algorithms. A bug shared by both SQL derivations fails
here."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from spark_file_mover_spark import registry

registry.load_all()



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
    return round(v * 100)


def _day_cents(sf_dir):
    """events collapsed to the (day, cents) series, day-ordered."""
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    ).to_pydict()
    days = defaultdict(int)
    for ts, v in zip(t["ts"], t["value"]):
        day = _utc_us(ts) // 86_400_000_000
        days[day] += _cents(v) if v is not None else 0
    return sorted(days.items())


def test_cramers_v_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_nationkey"]
    ).to_pydict()
    cells = Counter(zip(t["c_mktsegment"], t["c_nationkey"]))
    n = sum(cells.values())
    rm = defaultdict(int)
    cm = defaultdict(int)
    for (seg, nat), o in cells.items():
        rm[seg] += o
        cm[nat] += o
    # naive textbook chi2 over the COMPLETE table incl. zero cells
    chi2 = 0.0
    for seg in rm:
        for nat in cm:
            e = rm[seg] * cm[nat] / n
            o = cells.get((seg, nat), 0)
            chi2 += (o - e) ** 2 / e
    mindim = min(len(rm), len(cm))
    row = registry.QUERIES["agg-cramers-v"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["n_segments"] == len(rm)
    assert row["n_nations"] == len(cm)
    # the engines sum 1e15-snapped o²/(rc) terms; allow that snap's dust
    assert abs(row["chi2"] - chi2) < 1e-4 * max(chi2, 1.0)
    assert abs(row["cohen_w"] - math.sqrt(chi2 / n)) < 1e-8
    assert (
        abs(row["cramers_v"] - math.sqrt(chi2 / n / (mindim - 1))) < 1e-8
    )
    w = math.sqrt(chi2 / n)
    band = (
        "negligible" if w < 0.1 else
        "small" if w < 0.3 else "medium" if w < 0.5 else "large"
    )
    assert row["effect_band"] == band


def test_jsd_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pydict()
    import datetime

    split = datetime.datetime(2024, 1, 16)  # _KS_SPLIT
    hist = defaultdict(lambda: [0, 0])  # (type, bucket) -> [a, b]
    for ts, ty, v in zip(t["ts"], t["event_type"], t["value"]):
        if v is None:
            continue
        b = len(str(_cents(v)))
        hist[(ty, b)][0 if ts < split else 1] += 1
    types = sorted({k[0] for k in hist})
    rows = {
        r["event_type"]: r
        for r in registry.QUERIES["agg-jsd-drift"](spark, sf_dir).collect()
    }
    for ty in types:
        buckets = {b: c for (t2, b), c in hist.items() if t2 == ty}
        na = sum(c[0] for c in buckets.values())
        nb = sum(c[1] for c in buckets.values())
        row = rows[ty]
        assert row["n_a"] == na and row["n_b"] == nb
        assert row["n_buckets"] == len(buckets)
        if na == 0 or nb == 0:
            assert row["jsd_nats"] is None
            continue
        sa = sb = 0.0
        for a, b in buckets.values():
            pa, pb = a / na, b / nb
            if a > 0:
                sa += _snap9(pa * math.log(2 * pa / (pa + pb)))
            if b > 0:
                sb += _snap9(pb * math.log(2 * pb / (pa + pb)))
        jsd = (sa + sb) / 2
        assert abs(row["jsd_nats"] - jsd) < 1e-8
        assert abs(row["jsd_norm"] - jsd / math.log(2)) < 1e-8
        assert (
            abs(row["js_distance"] - math.sqrt(jsd / math.log(2))) < 1e-8
        )


def test_bollinger_matches_pure_python(spark, sf_dir):
    series = _day_cents(sf_dir)
    rows = registry.QUERIES["window-bollinger"](spark, sf_dir).collect()
    assert len(rows) == len(series)
    for i, (row, (_day, x)) in enumerate(zip(rows, series)):
        win = [c for _, c in series[max(0, i - 19) : i + 1]]
        n = len(win)
        mean = sum(win) / n
        var = sum((c - mean) ** 2 for c in win) / n
        sd = math.sqrt(var)
        assert row["cents"] == x
        assert row["n_window"] == n
        state = (
            "above" if x > mean + 2 * sd
            else "below" if x < mean - 2 * sd else "inside"
        )
        assert row["band_state"] == state, (i, x, mean, sd)
        if var > 0:
            assert abs(row["z_score"] - (x - mean) / sd) < 1e-6


def test_rsi_matches_pure_python(spark, sf_dir):
    series = [c for _, c in _day_cents(sf_dir)]
    deltas = [None] + [
        series[i] - series[i - 1] for i in range(1, len(series))
    ]
    rows = registry.QUERIES["window-rsi"](spark, sf_dir).collect()
    for i, row in enumerate(rows):
        win = [d for d in deltas[max(0, i - 13) : i + 1] if d is not None]
        g = sum(d for d in win if d > 0)
        lo = sum(-d for d in win if d < 0)
        assert row["sum_gain"] == g and row["sum_loss"] == lo
        assert row["n_deltas"] == len(win)
        if g + lo > 0:
            rsi = _snap9(100.0 * g / (g + lo))
            assert row["rsi"] == rsi
            zone = (
                "overbought" if rsi >= 70 else
                "oversold" if rsi <= 30 else "neutral"
            )
            assert row["zone"] == zone
        else:
            assert row["rsi"] is None and row["zone"] == "undefined"


def test_fk_audit_matches_pure_python(spark, sf_dir):
    rows = {
        r["relationship"]: r
        for r in registry.QUERIES["etl-fk-audit"](spark, sf_dir).collect()
    }
    from spark_file_mover_spark.operators.windows import _FK_EDGES

    for rel, child, ckey, parent, pkey in _FK_EDGES:
        ck = pq.read_table(f"{sf_dir}/{child}.parquet", columns=[ckey])[
            ckey
        ].to_pylist()
        pk = set(
            pq.read_table(f"{sf_dir}/{parent}.parquet", columns=[pkey])[
                pkey
            ].to_pylist()
        )
        row = rows[rel]
        nonnull = [k for k in ck if k is not None]
        orphan_rows = sum(1 for k in nonnull if k not in pk)
        orphan_keys = len({k for k in nonnull if k not in pk})
        assert row["child_rows"] == len(ck)
        assert row["null_rows"] == len(ck) - len(nonnull)
        assert row["distinct_keys"] == len(set(nonnull))
        assert row["orphan_keys"] == orphan_keys
        assert row["orphan_rows"] == orphan_rows
        assert row["orphan_frac"] == _snap9(orphan_rows / len(ck))


def _luhn_check_digit(payload: str) -> int:
    s = 0
    for i, ch in enumerate(reversed(payload)):  # i=0 is rightmost
        d = int(ch)
        if i % 2 == 0:  # rightmost payload digit doubles
            d *= 2
            if d > 9:
                d -= 9
        s += d
    return (10 - s % 10) % 10


def _luhn_valid(num: str) -> bool:
    s = 0
    for i, ch in enumerate(reversed(num)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        s += d
    return s % 10 == 0


def test_luhn_matches_pure_python(spark, sf_dir):
    rows = registry.QUERIES["fn-luhn-checksum"](spark, sf_dir).collect()
    ck = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])[
        "c_custkey"
    ].to_pylist()
    assert len(rows) == len(ck)
    for row in rows[:200]:
        payload = str(row["acct_id"] * 48271 % 10**15).zfill(15)
        cd = _luhn_check_digit(payload)
        assert row["card_number"] == payload + str(cd)
        assert row["check_digit"] == cd
        assert row["valid"] is True
        assert _luhn_valid(row["card_number"])
        # Luhn detects every single-digit error
        pos = row["corrupt_pos"]
        d = int(payload[pos - 1])
        corrupted = (
            payload[: pos - 1] + str((d + 1) % 10) + payload[pos:]
        )
        assert row["corrupt_valid"] is False
        assert not _luhn_valid(corrupted + str(cd))


def test_logodds_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]
    ).to_pydict()
    y = defaultdict(lambda: [0, 0])
    for text, lang in zip(t["text"], t["lang"]):
        for tok in re.split(r"\s+", text.strip().lower()):
            y[tok][0 if lang == "en" else 1] += 1
    n_en = sum(v[0] for v in y.values())
    n_rest = sum(v[1] for v in y.values())
    a0 = 1000.0
    scored = {}
    for tok, (ye, yr) in y.items():
        ai = a0 * (ye + yr) / (n_en + n_rest)
        den_a = n_en + a0 - ye - ai
        den_b = n_rest + a0 - yr - ai
        if den_a <= 0 or den_b <= 0:
            continue
        delta = math.log((ye + ai) / den_a) - math.log((yr + ai) / den_b)
        var = 1.0 / (ye + ai) + 1.0 / (yr + ai)
        scored[tok] = (_snap9(delta), _snap9(delta / math.sqrt(var)))
    top_en = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    claimed = {t0 for t0, _ in top_en}
    # the query labels a token en-heavy when it makes BOTH top lists
    # (possible only on a tiny vocabulary like the synthetic corpus's
    # ~31 tokens), so the rest-heavy list excludes en-heavy claims
    top_rest = [
        kv
        for kv in sorted(scored.items(), key=lambda kv: (kv[1][1], kv[0]))[
            :20
        ]
        if kv[0] not in claimed
    ]
    rows = registry.QUERIES["text-logodds-monroe"](spark, sf_dir).collect()
    got_en = [r for r in rows if r["direction"] == "en-heavy"]
    got_rest = [r for r in rows if r["direction"] == "rest-heavy"]
    assert [r["tok"] for r in got_en] == [t0 for t0, _ in top_en]
    assert [r["tok"] for r in got_rest] == [t0 for t0, _ in top_rest]
    for r, (tok, (delta, z)) in zip(got_en, top_en):
        assert r["z"] == z and r["delta"] == delta
        assert (r["y_en"], r["y_rest"]) == tuple(y[tok])


def test_length_buckets_matches_pure_python(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    buckets = defaultdict(lambda: [0, 0, 0])  # ceil -> [docs, toks, pad]
    n_total = 0
    for text in t["text"].to_pylist():
        n = len(re.split(r"\s+", text.strip().lower()))
        ceil = 1 if n <= 1 else 1 << (n - 1).bit_length()
        b = buckets[ceil]
        b[0] += 1
        b[1] += n
        b[2] += ceil - n
        n_total += 1
    rows = registry.QUERIES["sample-length-buckets"](spark, sf_dir).collect()
    assert [r["bucket_ceil"] for r in rows] == sorted(buckets)
    for r in rows:
        docs, toks, pad = buckets[r["bucket_ceil"]]
        assert r["n_docs"] == docs
        assert r["total_tokens"] == toks
        assert r["padding_tokens"] == pad
        assert r["waste_frac"] == _snap9(pad / (docs * r["bucket_ceil"]))
        assert r["doc_share"] == _snap9(docs / n_total)
def test_kendall_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_discount"]
    ).to_pydict()
    xs = [int(q) for q in t["l_quantity"]]
    ys = [round(d * 100) for d in t["l_discount"]]
    cells = Counter(zip(xs, ys))
    conc = disc = 0
    items = list(cells.items())
    for (ax, ay), ac in items:
        for (bx, by), bc in items:
            if bx < ax:
                if by < ay:
                    conc += ac * bc
                elif by > ay:
                    disc += ac * bc
    n = len(xs)
    tx = Counter(xs)
    ty = Counter(ys)
    n0p = n * (n - 1)
    n1p = sum(t0 * (t0 - 1) for t0 in tx.values())
    n2p = sum(t0 * (t0 - 1) for t0 in ty.values())
    row = registry.QUERIES["agg-kendall-tau"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["n_cells"] == len(cells)
    assert row["concordant"] == conc
    assert row["discordant"] == disc
    assert row["tied_x_pairs"] == n1p / 2
    assert row["tied_y_pairs"] == n2p / 2
    tau = (conc - disc) / (0.5 * math.sqrt((n0p - n1p) * (n0p - n2p)))
    assert abs(row["tau_b"] - tau) < 1e-8
    # textbook scipy-free sanity: tau-b lies in [-1, 1]
    assert -1.0 <= row["tau_b"] <= 1.0


def test_modularity_matches_pure_python(spark, sf_dir):
    """Re-derive Q from the partition the ENGINE emits (the partition
    itself is cross-checked by the K3 oracle); the reference here is
    the textbook Q formula over the raw edge list."""
    lab = {
        r["node_id"]: r["label"]
        for r in registry.QUERIES["graph-label-propagation"](
            spark, sf_dir
        ).collect()
    }
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "props"]
    ).to_pydict()
    import json as _json

    edges = set()
    for eid, uid, props in zip(t["event_id"], t["user_id"], t["props"]):
        if eid % 20 == 0:  # _LPA_EDGE_MOD
            ent = 10**6 + int(_json.loads(props)["k"])  # _LPA_ENTITY_BASE
            edges.add((uid, ent))
    m = len(edges)
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    e_in = defaultdict(int)
    d_c = defaultdict(int)
    for a, b in edges:
        if lab[a] == lab[b]:
            e_in[lab[a]] += 1
    for v, d in deg.items():
        d_c[lab[v]] += d
    q_ref = sum(
        e_in[c] / m - (d_c[c] / (2 * m)) ** 2 for c in d_c
    )
    rows = registry.QUERIES["graph-modularity"](spark, sf_dir).collect()
    assert abs(rows[0]["modularity"] - q_ref) < 1e-8
    for r in rows:
        assert r["e_in"] == e_in.get(r["label"], 0)
        assert r["d_c"] == d_c[r["label"]]


def test_mp3_meta_matches_pure_python(spark, sf_dir):
    """Third formulation: parse the SYNTHESIZED bytes with a naive
    pure-Python MP3 header reader (tables from ISO 11172-3)."""
    BITRATES = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320]
    RATES = [44100, 48000, 32000]
    MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]
    rows = registry.QUERIES["multimodal-mp3-meta"](spark, sf_dir).collect()
    for r in rows[:200]:
        doc = r["asset_id"]
        # rebuild the synthesized header independently
        bi, si, pad, mode = 1 + doc % 14, doc % 3, doc % 2, doc % 4
        hdr = bytes([0xFF, 0xFB, (bi << 4) | (si << 2) | (pad << 1),
                     mode << 6])
        # naive parse of those bytes
        assert hdr[0] == 0xFF and (hdr[1] >> 5) == 0b111
        p_bi, p_si = hdr[2] >> 4, (hdr[2] >> 2) & 3
        p_pad, p_mode = (hdr[2] >> 1) & 1, hdr[3] >> 6
        kbps, rate = BITRATES[p_bi - 1], RATES[p_si]
        assert r["bitrate_kbps"] == kbps
        assert r["sample_rate"] == rate
        assert r["padded"] == (p_pad == 1)
        assert r["channel_mode"] == MODES[p_mode]
        assert r["frame_bytes"] == (144000 * kbps) // rate + p_pad
        assert r["sync_ok"] is True


def test_tukey_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).to_pydict()
    pu = defaultdict(int)
    for u, v in zip(t["user_id"], t["value"]):
        pu[u] += _cents(v) if v is not None else 0
    ys = sorted(pu.values())
    n = len(ys)
    q1 = ys[-(-25 * n // 100) - 1]  # nearest-rank ceil(25n/100)
    q3 = ys[-(-75 * n // 100) - 1]
    iqr = q3 - q1
    lo = sum(1 for y in ys if 2 * y < 2 * q1 - 3 * iqr)
    hi = sum(1 for y in ys if 2 * y > 2 * q3 + 3 * iqr)
    row = registry.QUERIES["agg-tukey-fences"](spark, sf_dir).collect()[0]
    assert row["n_users"] == n
    assert row["q1_cents"] == q1 and row["q3_cents"] == q3
    assert row["iqr_cents"] == iqr
    assert row["n_low"] == lo and row["n_high"] == hi
    assert row["outlier_frac"] == _snap9((lo + hi) / n)


def test_local_extrema_matches_pure_python(spark, sf_dir):
    series = _day_cents(sf_dir)
    vals = [c for _, c in series]
    rows = registry.QUERIES["window-local-extrema"](spark, sf_dir).collect()
    assert len(rows) == len(vals)
    n_peak = n_trough = 0
    for i, (row, x) in enumerate(zip(rows, vals)):
        before = vals[max(0, i - 3) : i]
        after = vals[i + 1 : i + 4]
        if not before or not after:
            kind, prom = "edge", None
        elif x > max(before) and x > max(after):
            kind, prom = "peak", x - max(max(before), max(after))
        elif x < min(before) and x < min(after):
            kind, prom = "trough", min(min(before), min(after)) - x
        else:
            kind, prom = "none", None
        assert row["kind"] == kind, (i, x)
        assert row["prominence_cents"] == prom
        n_peak += kind == "peak"
        n_trough += kind == "trough"
    assert n_peak > 0 and n_trough > 0  # non-vacuous on this corpus


def test_codec_matches_pure_python(spark, sf_dir):
    import base64 as b64mod
    import hashlib

    rows = registry.QUERIES["fn-codec-roundtrip"](spark, sf_dir).collect()
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    assert len(rows) == len(texts)
    for r in rows[:200]:
        src = texts[r["doc_id"]][:24]
        assert r["src"] == src
        assert r["b64"] == b64mod.b64encode(src.encode()).decode()
        assert r["hex_str"] == src.encode().hex().upper()
        assert r["md5_8"] == hashlib.md5(src.encode()).hexdigest()[:8]
        assert r["roundtrip_b64"] is True and r["roundtrip_hex"] is True
        assert r["b64_len"] == r["b64_len_expected"] == 4 * -(-len(src) // 3)


def test_standardize_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()
    nano = {
        vid: [math.floor(float(x) * 1e9 + 0.5) for x in emb]
        for vid, emb in zip(t["vec_id"], t["embedding"])
    }
    n = len(nano)
    dims = len(next(iter(nano.values())))
    rows = registry.QUERIES["embed-standardize"](spark, sf_dir).collect()
    assert len(rows) == n * dims
    by_dim = defaultdict(list)
    for v in nano.values():
        for d0, x in enumerate(v):
            by_dim[d0 + 1].append(x)
    # spot-check every dim for the first few vectors
    got = {(r["vec_id"], r["dim"]): r for r in rows}
    for vid in list(nano)[:10]:
        for d0, x in enumerate(nano[vid]):
            dim = d0 + 1
            xs = by_dim[dim]
            s, sq = sum(xs), sum(v * v for v in xs)
            dd = n * x - s
            vr = n * sq - s * s
            r = got[(vid, dim)]
            assert r["value"] == x / 1e9
            if vr > 0:
                assert r["z"] == _snap9(dd / math.sqrt(vr))
            else:
                assert r["z"] is None


def test_overdispersion_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    ).to_pydict()
    pc = Counter(zip(t["event_type"], t["user_id"]))
    rows = {
        r["event_type"]: r
        for r in registry.QUERIES["agg-overdispersion"](
            spark, sf_dir
        ).collect()
    }
    types = {ty for ty, _ in pc}
    assert set(rows) == types
    for ty in types:
        ks = [k for (t2, _), k in pc.items() if t2 == ty]
        n, s = len(ks), sum(ks)
        sq = sum(k * k for k in ks)
        vn = n * sq - s * s
        row = rows[ty]
        assert row["n_users"] == n and row["n_events"] == s
        assert row["mean_k"] == s / n
        assert row["var_k"] == _snap9(vn / (n * n))
        vmr = _snap9(vn / (n * s))
        assert row["vmr"] == vmr
        regime = (
            "overdispersed" if vmr > 1.5
            else "underdispersed" if vmr < 0.75 else "poisson-like"
        )
        assert row["regime"] == regime


def test_epoch_shuffle_matches_pure_python(spark, sf_dir):
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    prefixes = {}
    for ep in range(3):
        ranked = sorted(ids, key=lambda d: (h(f"{ep}:{d}"), d))[:10]
        prefixes[ep] = ranked
    rows = registry.QUERIES["sample-epoch-shuffle"](spark, sf_dir).collect()
    assert len(rows) == 30
    for r in rows:
        assert prefixes[r["epoch"]][r["rank"] - 1] == r["doc_id"]
        assert r["shuffle_key"] == h(f"{r['epoch']}:{r['doc_id']}")
        prev = set(prefixes.get(r["epoch"] - 1, []))
        assert r["overlap_with_prev"] == len(
            prev & set(prefixes[r["epoch"]])
        )


def test_capture_recapture_matches_pure_python(spark, sf_dir):
    import datetime

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).to_pydict()
    split = datetime.datetime(2024, 1, 16)
    a, b = set(), set()
    for u, ts in zip(t["user_id"], t["ts"]):
        (a if ts < split else b).add(u)
    n1, n2, m = len(a), len(b), len(a & b)
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    row = registry.QUERIES["agg-capture-recapture"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"], row["m"]) == (n1, n2, m)
    assert row["n_observed"] == len(a | b)
    assert row["n_hat"] == _snap9(nhat)
    assert row["est_unseen"] == _snap9(nhat - len(a | b))


def test_autocorr_matches_pure_python(spark, sf_dir):
    vals = [c for _, c in _day_cents(sf_dir)]
    n, tot = len(vals), sum(vals)
    dv = [n * x - tot for x in vals]
    den = sum(d * d for d in dv)
    rows = registry.QUERIES["window-autocorr"](spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == list(range(1, 8))
    for r in rows:
        L = r["lag"]
        num = sum(dv[i] * dv[i - L] for i in range(L, n))
        assert r["n_pairs"] == n - L
        assert r["acf"] == _snap9(num / den)
        assert -1.05 <= r["acf"] <= 1.05


def test_hapax_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    tf = defaultdict(Counter)
    for src, text in zip(t["source"], t["text"]):
        tf[src].update(re.split(r"\s+", text.strip().lower()))
    rows = {
        r["source"]: r
        for r in registry.QUERIES["text-hapax-ratio"](spark, sf_dir).collect()
    }
    assert set(rows) == set(tf)
    for src, c in tf.items():
        row = rows[src]
        hapax = sum(1 for v in c.values() if v == 1)
        assert row["n_tokens"] == sum(c.values())
        assert row["vocab"] == len(c)
        assert row["hapax"] == hapax
        assert row["dis_legomena"] == sum(1 for v in c.values() if v == 2)
        assert row["hapax_ratio"] == _snap9(hapax / len(c))
        assert row["type_token_ratio"] == _snap9(len(c) / sum(c.values()))


def test_csv_multiline_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pydict()
    rows = registry.QUERIES["scan-csv-quoted-multiline"](
        spark, sf_dir
    ).collect()
    expect = {
        d: ("x,\n" + text[:20].replace(" ", ",") + '\n"q"\rz', lang)
        for d, text, lang in zip(t["doc_id"], t["text"], t["lang"])
    }
    assert len(rows) == len(expect)
    for r in rows:
        hard, lang = expect[r["doc_id"]]
        assert r["hard"] == hard, r["doc_id"]
        assert r["lang"] == lang


def test_confusion_mcc_matches_pure_python(spark, sf_dir):
    import datetime

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).to_pydict()
    split = datetime.datetime(2024, 1, 16)
    sa = defaultdict(int)
    sb = defaultdict(int)
    users = set()
    for u, ts, v in zip(t["user_id"], t["ts"], t["value"]):
        users.add(u)
        if v is None:
            continue
        (sa if ts < split else sb)[u] += _cents(v)
    ga = sorted(sa.get(u, 0) for u in users)
    gb = sorted(sb.get(u, 0) for u in users)
    n = len(users)
    ta = ga[-(-90 * n // 100) - 1]
    tb = gb[-(-90 * n // 100) - 1]
    tp = sum(1 for u in users if sa.get(u, 0) >= ta and sb.get(u, 0) >= tb)
    fp = sum(1 for u in users if sa.get(u, 0) >= ta and sb.get(u, 0) < tb)
    fn = sum(1 for u in users if sa.get(u, 0) < ta and sb.get(u, 0) >= tb)
    tn = n - tp - fp - fn
    row = registry.QUERIES["agg-confusion-mcc"](spark, sf_dir).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert (row["threshold_a"], row["threshold_b"]) == (ta, tb)
    assert row["precision_"] == _snap9(tp / (tp + fp))
    assert row["recall_"] == _snap9(tp / (tp + fn))
    assert row["f1"] == _snap9(2 * tp / (2 * tp + fp + fn))
    assert row["accuracy"] == _snap9((tp + tn) / n)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(row["mcc"] - mcc) < 1e-8


def test_interval_islands_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).to_pydict()
    import datetime

    epoch = datetime.date(1970, 1, 1)
    by_cust = defaultdict(list)
    for c, d in zip(t["o_custkey"], t["o_orderdate"]):
        s = (d.date() - epoch).days
        by_cust[c].append((s, s + 30))
    expect = []
    for c in sorted(by_cust):
        iv = sorted(by_cust[c])
        islands = []
        for s, e in iv:
            if islands and s <= islands[-1][1]:
                isl = islands[-1]
                isl[1] = max(isl[1], e)
                isl[2] += 1
            else:
                islands.append([s, e, 1])
        for i, (s, e, n) in enumerate(islands, 1):
            expect.append((c, i, n,
                           str(epoch + datetime.timedelta(days=s)),
                           str(epoch + datetime.timedelta(days=e)),
                           e - s))
    rows = registry.QUERIES["etl-interval-islands"](spark, sf_dir).collect()
    got = [
        (r["c_custkey"], r["island_id"], r["n_orders"],
         r["island_start"], r["island_end"], r["span_days"])
        for r in rows
    ]
    assert got == expect


def test_mann_kendall_matches_pure_python(spark, sf_dir):
    vals = [c for _, c in _day_cents(sf_dir)]
    n = len(vals)
    s_stat = 0
    for i in range(n):
        for j in range(i + 1, n):
            s_stat += (vals[j] > vals[i]) - (vals[j] < vals[i])
    ties = Counter(vals)
    tt = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    v18 = n * (n - 1) * (2 * n + 5) - tt
    row = registry.QUERIES["agg-mann-kendall"](spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["s_stat"] == s_stat
    if v18 > 0 and s_stat != 0:
        z = (s_stat - (1 if s_stat > 0 else -1)) / math.sqrt(v18 / 18.0)
        assert row["z_value"] == _snap9(z)
        zs = _snap9(z)
        trend = (
            "none" if abs(zs) <= 1.959963985
            else "increasing" if s_stat > 0 else "decreasing"
        )
        assert row["trend"] == trend


def test_rolling_origin_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).to_pydict()
    days = [_utc_us(ts) // 86_400_000_000 for ts in t["ts"]]
    users = t["user_id"]
    n = len(days)
    sdays = sorted(days)
    rows = registry.QUERIES["sample-rolling-origin"](spark, sf_dir).collect()
    assert [r["fold"] for r in rows] == [1, 2, 3]
    for r, pct in zip(rows, (50, 65, 80)):
        rank = -(-pct * n // 100)
        # nearest-rank cutoff DAY: smallest day with cum events >= rank
        cut = sdays[rank - 1]
        assert r["train_pct"] == pct
        import datetime

        assert r["cutoff_day"] == str(
            datetime.date(1970, 1, 1) + datetime.timedelta(days=cut)
        )
        ntr = sum(1 for d in days if d <= cut)
        assert r["n_train_events"] == ntr
        assert r["n_test_events"] == n - ntr
        tr_users = {u for u, d in zip(users, days) if d <= cut}
        te_users = {u for u, d in zip(users, days) if d > cut}
        assert r["n_train_users"] == len(tr_users)
        assert r["n_test_users"] == len(te_users)
        assert r["n_straddle_users"] == len(tr_users & te_users)


def test_burstiness_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    tf = defaultdict(Counter)  # tok -> doc -> count
    for d, text in zip(t["doc_id"], t["text"]):
        for tok in re.split(r"\s+", text.strip().lower()):
            tf[tok][d] += 1
    scored = {}
    for tok, docs in tf.items():
        df = len(docs)
        if df < 5:
            continue
        n = sum(docs.values())
        sq = sum(c * c for c in docs.values())
        b = _snap9(n / df)
        fano = _snap9((df * sq - n * n) / (df * n))
        scored[tok] = (df, n, b, fano)
    top = sorted(scored.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    rows = registry.QUERIES["text-burstiness"](spark, sf_dir).collect()
    assert [(r["tok"],) for r in rows] == [(k,) for k, _ in top]
    for r, (tok, (df, n, b, fano)) in zip(rows, top):
        assert (r["df"], r["n_occ"]) == (df, n)
        assert r["burstiness"] == b
        assert r["fano"] == fano


def test_seasonal_decompose_matches_pure_python(spark, sf_dir):
    series = _day_cents(sf_dir)
    vals = [c for _, c in series]
    days = [d for d, _ in series]
    n = len(vals)
    rows = registry.QUERIES["window-seasonal-decompose"](
        spark, sf_dir
    ).collect()
    assert len(rows) == n
    # dow group means of 420-scaled exact detrended
    dscaled = defaultdict(int)
    cnt = defaultdict(int)
    per_day = []
    for i, (day, x) in enumerate(series):
        win = vals[max(0, i - 3) : i + 4]
        n7, s7 = len(win), sum(win)
        d7n = n7 * x - s7
        dow = (day + 4) % 7
        dscaled[dow] += (420 // n7) * d7n
        cnt[dow] += 1
        per_day.append((day, x, s7, n7, d7n, dow))
    for r, (day, x, s7, n7, d7n, dow) in zip(rows, per_day):
        assert r["dow"] == dow and r["cents"] == x
        assert r["trend"] == s7 / n7 / 100.0
        assert r["detrended"] == d7n / n7 / 100.0
        seas = dscaled[dow] / cnt[dow] / 420.0 / 100.0
        assert r["seasonal"] == seas
        assert r["residual"] == (d7n / n7 / 100.0) - seas


def test_ico_meta_matches_pure_python(spark, sf_dir):
    rows = registry.QUERIES["multimodal-ico-meta"](spark, sf_dir).collect()
    import struct

    sentinel_seen = False
    for r in rows[:300]:
        doc = r["asset_id"]
        wraw, hraw = doc % 256, (doc * 3) % 256
        # rebuild the 22-byte directory and parse with struct (LE)
        entry = struct.pack(
            "<HHH BBBB HH II".replace(" ", ""),
            0, 1, 1,
            wraw, hraw, 16 if doc % 5 == 0 else 0, 0,
            1, [1, 4, 8, 24, 32][doc % 5],
            40 + doc % 1000, 22,
        )
        rsvd, typ, cnt2 = struct.unpack_from("<HHH", entry, 0)
        w8, h8, cc, _rsv = struct.unpack_from("<BBBB", entry, 6)
        planes, bpp = struct.unpack_from("<HH", entry, 10)
        sz, off = struct.unpack_from("<II", entry, 14)
        assert (rsvd, typ, cnt2) == (0, 1, 1)
        assert r["n_images"] == 1
        assert r["width"] == (256 if w8 == 0 else w8)
        assert r["height"] == (256 if h8 == 0 else h8)
        sentinel_seen = sentinel_seen or w8 == 0 or h8 == 0
        assert r["color_count"] == cc
        assert r["planes"] == planes
        assert r["bits_per_pixel"] == bpp
        assert r["bytes_in_res"] == sz
        assert r["image_offset"] == off
        assert r["magic_ok"] is True
    assert sentinel_seen  # the 0->256 path must be exercised


def test_keep_best_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_pydict()
    clusters = defaultdict(list)
    for i in range(len(t["doc_id"])):
        norm = re.sub(r"\s+", " ", t["text"][i]).strip().lower()
        clusters[norm].append(
            (t["doc_id"][i], t["lang"][i], t["source"][i], t["n_chars"][i])
        )
    expect = {}
    for members in clusters.values():
        best = max(members, key=lambda m: (m[3], -m[0]))
        first = min(m[0] for m in members)
        total = sum(m[3] for m in members)
        expect[best[0]] = (
            best[1], best[2], best[3], len(members),
            len(members) - 1, total - best[3], best[0] != first,
        )
    rows = registry.QUERIES["dedup-keep-best"](spark, sf_dir).collect()
    assert len(rows) == len(expect)
    for r in rows:
        lang, src, nch, nm, nd, cd, beat = expect[r["doc_id"]]
        assert (r["lang"], r["source"], r["n_chars"]) == (lang, src, nch)
        assert (r["n_members"], r["n_dropped"]) == (nm, nd)
        assert r["chars_dropped"] == cd
        assert r["beat_keep_first"] == beat


def test_parkinson_matches_pure_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    ).to_pydict()
    bars = {}
    for ts, v in zip(t["ts"], t["value"]):
        if v is None:
            continue
        day = _utc_us(ts) // 86_400_000_000
        c = _cents(v)
        h, lo = bars.get(day, (c, c))
        bars[day] = (max(h, c), min(lo, c))
    days = sorted(bars)
    lrs = []
    for d in days:
        h, lo = bars[d]
        lrs.append(
            math.floor(math.log(h / lo) * 1e9 + 0.5) if lo > 0 else None
        )
    rows = registry.QUERIES["window-parkinson-vol"](spark, sf_dir).collect()
    assert len(rows) == len(days)
    for i, (r, d) in enumerate(zip(rows, days)):
        h, lo = bars[d]
        assert (r["high_cents"], r["low_cents"]) == (h, lo)
        win = [x for x in lrs[max(0, i - 19) : i + 1] if x is not None]
        assert r["n_bars"] == len(win)
        if win:
            sq = sum(x * x for x in win)
            sig = math.sqrt(
                sq / 1e18 / len(win) / 2.772588722239781
            )
            assert r["parkinson_sigma"] == _snap9(sig)
