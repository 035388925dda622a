"""Session-7 ES-parity additions vs brute-force pure-Python twins:
significant_text (sampled re-analyzed foreground), rate / ip_range /
moving_percentiles aggregations, filter-context (constant_score + ids
+ exists + terms-lookup) search, and the geohash_grid aggregation
(cross-checked against the classic bisection geohash algorithm)."""

import math

import pytest
from pyspark.sql import functions as F


def _oracle_matches(oracle, question):
    from dpr_spark.functions.analysis import analyze_query

    docs = set()
    for t in analyze_query(question, oracle.analyzer):
        docs.update(oracle.postings.get(t, ()))
    return docs


# ---------------------------------------------------------------- sig text


def test_significant_text_vs_twin(spark, index, pages_pdf, queries_pdf, oracle):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.query.aggs import significant_text

    pw = assign_doc_ids(pages_pdf)
    text_of = {int(d): t for d, t in zip(pw.doc_id, pw.text)}
    pages_df = spark.createDataFrame(pw[["doc_id", "text"]])

    qsub = queries_pdf[["qid", "question"]].head(6)
    qdf = spark.createDataFrame(qsub)
    got = {}
    res = significant_text(
        qdf, index, pages_df, size=5, sample_size=15, min_fg=2
    ).collect()
    for r in res:
        got.setdefault(r.qid, []).append(
            (r.rank, r.term, r.fg_count, r.bg_count, round(r.score, 9))
        )

    n_docs = float(len(text_of))
    checked = 0
    for _, q in qsub.iterrows():
        hits = oracle.search(q.question, k=15)
        if not hits:
            assert int(q.qid) not in got
            continue
        # filter_duplicate_text: keep the best-ranked doc per exact text
        seen_text, sample = set(), []
        for d, _s in hits:
            if text_of[d] in seen_text:
                continue
            seen_text.add(text_of[d])
            sample.append(d)
        fg = {}
        for d in sample:
            toks = tokenize(text_of[d])
            if oracle.analyzer is not None:
                toks = oracle.analyzer.analyze_tokens(toks)
            for t in set(toks):
                fg[t] = fg.get(t, 0) + 1
        rows = []
        for t, c in fg.items():
            if c < 2 or t not in oracle.df:
                continue
            fgr = c / len(sample)
            bgr = oracle.df[t] / n_docs
            rows.append((t, c, oracle.df[t], (fgr - bgr) * (fgr / bgr)))
        rows.sort(key=lambda r: (-r[3], r[0]))
        exp = [
            (i + 1, t, c, bc, round(s, 9))
            for i, (t, c, bc, s) in enumerate(rows[:5])
        ]
        if exp:
            assert got[int(q.qid)] == exp, f"qid={q.qid}"
            checked += 1
    assert checked >= 3


# ----------------------------------------------------------------- rate


def test_rate_agg_month_to_day(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import rate_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(6))
    vals = index.docstats.select(
        "doc_id",
        F.to_timestamp(
            F.date_add(
                F.lit("2025-01-01").cast("date"),
                F.pmod("doc_id", F.lit(75)).cast("int"),
            )
        ).alias("warc_ts"),
    )
    res = rate_agg(qdf, index, vals, "warc_ts", unit="month", rate_unit="day")
    rows = res.collect()
    assert rows
    days = {1: 31.0, 2: 28.0, 3: 31.0}
    for r in rows:
        assert r.rate == pytest.approx(r["count"] / days[r.bucket.month], rel=1e-12)

    with pytest.raises(ValueError):
        rate_agg(qdf, index, vals, "warc_ts", unit="day", rate_unit="month")


# ------------------------------------------------------ moving percentiles


def test_moving_percentiles_exact_interpolation(spark, index, queries_pdf):
    from dpr_spark.query.aggs import date_histogram_agg, moving_percentiles

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(4))
    vals = index.docstats.select(
        "doc_id",
        F.to_timestamp(
            F.date_add(
                F.lit("2025-01-01").cast("date"),
                F.pmod("doc_id", F.lit(45)).cast("int"),
            )
        ).alias("warc_ts"),
    )
    hist = date_histogram_agg(qdf, index, vals, "warc_ts", unit="week").select(
        "qid", F.date_format("bucket", "yyyy-MM-dd").alias("week"), "count"
    )
    base = {}
    for r in hist.collect():
        base.setdefault(r.qid, []).append((r.week, r["count"]))
    got = {
        (r.qid, r.week): r.mov_pct
        for r in moving_percentiles(hist, order_col="week", window=4, pct=0.25).collect()
    }
    checked = 0
    for qid, series in base.items():
        series.sort()
        for i, (week, _c) in enumerate(series):
            vals_w = sorted(c for _w, c in series[max(0, i - 3) : i + 1])
            h = (len(vals_w) - 1) * 0.25
            lo, hi = vals_w[math.floor(h)], vals_w[math.ceil(h)]
            exp = lo + (hi - lo) * (h - math.floor(h))
            assert got[(qid, week)] == pytest.approx(exp, abs=5e-7)
            checked += 1
    assert checked >= 8

    with pytest.raises(ValueError):
        moving_percentiles(hist, order_col="week", pct=1.5)


# -------------------------------------------------------------- ip_range


def test_ip_range_agg(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import ip_range_agg

    qsub = queries_pdf[["qid", "question"]].head(5)
    qdf = spark.createDataFrame(qsub)
    ips = index.docstats.select(
        "doc_id",
        F.concat_ws(
            ".",
            F.lit("10"),
            F.pmod("doc_id", F.lit(4)).cast("string"),
            F.pmod("doc_id", F.lit(200)).cast("string"),
            F.lit("1"),
        ).alias("ip"),
    )
    ranges = [(None, "10.1.0.0"), ("10.1.0.0", "10.3.0.0"), ("10.2.128.0", None)]
    res = ip_range_agg(qdf, index, ips, "ip", ranges)
    got = {(r.qid, r.range_idx): r["count"] for r in res.collect()}

    def ipnum(s):
        a, b, c, d = (int(x) for x in s.split("."))
        return (a << 24) + (b << 16) + (c << 8) + d

    checked = 0
    for _, q in qsub.iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        for i, (lo, hi) in enumerate(ranges):
            n = 0
            for d in docs:
                v = ipnum(f"10.{d % 4}.{d % 200}.1")
                if (lo is None or v >= ipnum(lo)) and (hi is None or v < ipnum(hi)):
                    n += 1
            assert got[(int(q.qid), i)] == n, f"qid={q.qid} range={i}"
            checked += 1
    assert checked >= 9


# -------------------------------------------------------- filter context


def test_filter_context_search(spark, index, queries_pdf, oracle):
    from dpr_spark.query.boolquery import filter_context_search

    q = queries_pdf.question.iloc[0]
    docs = sorted(_oracle_matches(oracle, q))
    assert docs
    ids = docs[::2] + [999999]  # half the matches + one bogus id
    # meta: every 3rd doc lacks the field; lookup allows only two sources
    meta = index.docstats.select(
        "doc_id",
        F.when(F.pmod("doc_id", F.lit(3)) != 0, F.lit("present")).alias("fld"),
        F.pmod("doc_id", F.lit(5)).cast("string").alias("src"),
    )
    lookup = spark.createDataFrame([("1",), ("3",)], "v string")
    res = filter_context_search(
        spark,
        [(7, q)],
        index,
        doc_meta=meta,
        ids=ids,
        exists_field="fld",
        terms_lookup=(lookup, "src"),
        boost=2.5,
        k=1000,
    ).collect()
    exp = [
        d
        for d in ids
        if d in set(docs) and d % 3 != 0 and str(d % 5) in ("1", "3")
    ]
    exp.sort()
    assert [r.doc_id for r in sorted(res, key=lambda r: r.rank)] == exp
    assert all(r.score == 2.5 and r.qid == 7 for r in res)


# ------------------------------------------------------------ geohash


def _py_geohash(lat, lon, precision):
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    latr, lonr, bits, even = (-90.0, 90.0), (-180.0, 180.0), [], True
    while len(bits) < 5 * precision:
        if even:
            mid = (lonr[0] + lonr[1]) / 2
            bits.append(1 if lon >= mid else 0)
            lonr = (mid, lonr[1]) if lon >= mid else (lonr[0], mid)
        else:
            mid = (latr[0] + latr[1]) / 2
            bits.append(1 if lat >= mid else 0)
            latr = (mid, latr[1]) if lat >= mid else (latr[0], mid)
        even = not even
    out = ""
    for i in range(precision):
        d = 0
        for b in bits[5 * i : 5 * i + 5]:
            d = d * 2 + b
        out += b32[d]
    return out


@pytest.mark.parametrize("precision", [1, 3, 5])
def test_geohash_matches_bisection_algorithm(spark, index, precision):
    from dpr_spark.query.geo import geohash_cols

    geo = index.docstats.select(
        "doc_id",
        (
            F.lit(-60.0)
            + F.pmod(F.col("doc_id") * F.lit(7919), F.lit(12000)).cast("double")
            / F.lit(100.0)
        ).alias("lat"),
        (
            F.lit(-150.0)
            + F.pmod(F.col("doc_id") * F.lit(104729), F.lit(30000)).cast("double")
            / F.lit(100.0)
        ).alias("lon"),
    )
    _cell, gh = geohash_cols(F.col("lat"), F.col("lon"), precision)
    rows = geo.select("lat", "lon", gh.alias("gh")).limit(60).collect()
    assert rows
    for r in rows:
        assert r.gh == _py_geohash(r.lat, r.lon, precision), (r.lat, r.lon)


def test_geohash_grid_agg_counts(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import _matches
    from dpr_spark.query.geo import geohash_grid_agg

    qsub = queries_pdf[["qid", "question"]].head(4)
    qdf = spark.createDataFrame(qsub)
    geo = index.docstats.select(
        "doc_id",
        (
            F.lit(-60.0)
            + F.pmod(F.col("doc_id") * F.lit(7919), F.lit(12000)).cast("double")
            / F.lit(100.0)
        ).alias("lat"),
        (
            F.lit(-150.0)
            + F.pmod(F.col("doc_id") * F.lit(104729), F.lit(30000)).cast("double")
            / F.lit(100.0)
        ).alias("lon"),
    )
    pts = _matches(qdf, index).join(geo, "doc_id")
    res = geohash_grid_agg(pts, precision=2, size=5)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.geohash, r["count"]))
    checked = 0
    for _, q in qsub.iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        counts = {}
        for d in docs:
            lat = -60.0 + ((d * 7919) % 12000) / 100.0
            lon = -150.0 + ((d * 104729) % 30000) / 100.0
            h = _py_geohash(lat, lon, 2)
            counts[h] = counts.get(h, 0) + 1
        exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        exp = [(i + 1, h, c) for i, (h, c) in enumerate(exp)]
        assert got[int(q.qid)] == exp, f"qid={q.qid}"
        checked += 1
    assert checked >= 3
