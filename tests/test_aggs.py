"""Match-set aggregations (query/aggs.py): match_count / stats_agg /
terms_agg vs a brute-force pure-Python twin over the fixture corpus."""

import pytest
from pyspark.sql import functions as F


def _oracle_matches(oracle, question):
    from dpr_spark.functions.analysis import analyze_query

    docs = set()
    for t in analyze_query(question, oracle.analyzer):
        docs.update(oracle.postings.get(t, ()))
    return docs


def test_match_count(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import match_count

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(12))
    got = {r.qid: r.total_hits for r in match_count(qdf, index).collect()}
    checked = 0
    for _, q in queries_pdf.head(12).iterrows():
        n = len(_oracle_matches(oracle, q.question))
        if n == 0:
            assert int(q.qid) not in got
        else:
            assert got[int(q.qid)] == n, f"qid={q.qid}"
            checked += 1
    assert checked >= 10


def test_stats_agg(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import stats_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(10))
    res = stats_agg(qdf, index, index.docstats, "doclen").collect()
    got = {r.qid: (r.n, r.min, r.max, r.sum, r.avg) for r in res}
    for _, q in queries_pdf.head(10).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        dls = [float(oracle.doclen[d]) for d in docs]
        n, mn, mx, sm, av = got[int(q.qid)]
        assert n == len(dls)
        assert mn == min(dls) and mx == max(dls)
        assert sm == pytest.approx(sum(dls), rel=1e-12)
        assert av == pytest.approx(sm / n, rel=1e-12)


def test_terms_agg_exact_topsize(spark, index, queries_pdf, oracle):
    """Buckets of doc_id % 5: counts and the (count desc, value asc)
    top-3 match the brute-force twin; also exercises the salted path."""
    from dpr_spark.query.aggs import terms_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(10))
    vals = index.docstats.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(5)).alias("bucket")
    )
    for salt in (None, 4):
        res = terms_agg(qdf, index, vals, "bucket", size=3, salt_buckets=salt)
        got = {}
        for r in res.collect():
            got.setdefault(r.qid, []).append((r.rank, r.value, r["count"]))
        for _, q in queries_pdf.head(10).iterrows():
            docs = _oracle_matches(oracle, q.question)
            if not docs:
                continue
            counts = {}
            for d in docs:
                counts[d % 5] = counts.get(d % 5, 0) + 1
            expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            expect = [(i + 1, v, c) for i, (v, c) in enumerate(expect)]
            assert sorted(got[int(q.qid)]) == expect, f"salt={salt} qid={q.qid}"


def test_significant_terms_matches_twin(spark, index, queries_pdf, oracle):
    """JLH scores and top-5 selection vs a brute-force twin."""
    from dpr_spark.query.aggs import significant_terms

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    got = {}
    for r in significant_terms(qdf, index, size=5, min_fg=2).collect():
        got.setdefault(r.qid, []).append(
            (r.rank, r.term, r.fg_count, r.bg_count, r.score)
        )
    N = float(oracle.N)
    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        fg = {}
        for d in docs:
            for t in set(oracle.doc_tokens[d]):
                fg[t] = fg.get(t, 0) + 1
        scored = []
        for t, c in fg.items():
            if c < 2:
                continue
            fgr = c / len(docs)
            bgr = oracle.df[t] / N
            scored.append((t, c, oracle.df[t], (fgr - bgr) * (fgr / bgr)))
        scored.sort(key=lambda x: (-x[3], x[0]))
        expect = [
            (i + 1, t, c, df, sc) for i, (t, c, df, sc) in enumerate(scored[:5])
        ]
        actual = sorted(got.get(int(q.qid), []))
        assert [(a[0], a[1], a[2], a[3]) for a in actual] == [
            (e[0], e[1], e[2], e[3]) for e in expect
        ], f"qid={q.qid}"
        for a, e in zip(actual, expect):
            assert a[4] == pytest.approx(e[4], rel=1e-12)
            checked += 1
    assert checked > 20


def test_histogram_agg_and_empty_buckets(spark, index, queries_pdf, oracle):
    """floor(doclen/25)*25 buckets vs brute force; min_doc_count=0
    densifies every bucket between the observed min and max."""
    from dpr_spark.query.aggs import histogram_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    res = histogram_agg(qdf, index, index.docstats, "doclen", interval=25.0)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, {})[r.bucket] = r["count"]
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        expect = {}
        for d in docs:
            b = (oracle.doclen[d] // 25) * 25.0
            expect[b] = expect.get(b, 0) + 1
        assert got[int(q.qid)] == expect, f"qid={q.qid}"

    dense = histogram_agg(
        qdf, index, index.docstats, "doclen", interval=25.0, min_doc_count=0
    )
    dgot = {}
    for r in dense.collect():
        dgot.setdefault(r.qid, {})[r.bucket] = r["count"]
    for qid, buckets in got.items():
        lo, hi = min(buckets), max(buckets)
        full = {lo + 25.0 * i for i in range(int((hi - lo) / 25) + 1)}
        assert set(dgot[qid]) == full, f"qid={qid} not densified"
        for b in full:
            assert dgot[qid][b] == buckets.get(b, 0)


def test_date_histogram_agg(spark, index, queries_pdf, oracle):
    """Weekly crawl-volume histogram over a warc_ts synthesized from
    doc_id (date 2025-01-01 + doc_id%45 days) vs brute force with
    ISO-Monday week truncation."""
    import datetime

    from dpr_spark.query.aggs import date_histogram_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    vals = index.docstats.select(
        "doc_id",
        F.to_timestamp(
            F.date_add(F.lit("2025-01-01").cast("date"), F.pmod("doc_id", F.lit(45)).cast("int"))
        ).alias("warc_ts"),
    )
    res = date_histogram_agg(qdf, index, vals, "warc_ts", unit="week")
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, {})[r.bucket.date()] = r["count"]

    def week_of(d):
        day = datetime.date(2025, 1, 1) + datetime.timedelta(days=d % 45)
        return day - datetime.timedelta(days=day.weekday())

    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        expect = {}
        for d in docs:
            w = week_of(d)
            expect[w] = expect.get(w, 0) + 1
        assert got[int(q.qid)] == expect, f"qid={q.qid}"
        checked += 1
    assert checked >= 6


def test_percentiles_agg_exact_and_sketch(spark, index, queries_pdf, oracle):
    """Exact percentiles == numpy linear interpolation; the sketch path
    (percentile_approx) is within its positive-error bound."""
    import numpy as np

    from dpr_spark.query.aggs import percentiles_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    pcts = (0.25, 0.5, 0.75, 0.95)
    res = percentiles_agg(qdf, index, index.docstats, "doclen", pcts=pcts)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, {})[r.pct] = r.value
    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        dls = np.array(sorted(float(oracle.doclen[d]) for d in docs))
        for p in pcts:
            expect = float(np.percentile(dls, p * 100, method="linear"))
            assert got[int(q.qid)][p] == pytest.approx(expect, rel=1e-12), (
                f"qid={q.qid} p={p}"
            )
            checked += 1
    assert checked >= 24

    # sketch path: value must be an actually-observed value within the
    # rank-error bound of the exact percentile rank
    sk = percentiles_agg(
        qdf, index, index.docstats, "doclen", pcts=(0.5,), exact=False,
        accuracy=100,
    )
    for r in sk.collect():
        docs = _oracle_matches(oracle, {
            int(q.qid): q.question for _, q in queries_pdf.head(8).iterrows()
        }[r.qid])
        dls = sorted(float(oracle.doclen[d]) for d in docs)
        n = len(dls)
        lo = dls[max(0, int(0.5 * n) - max(1, n // 50) - 1)]
        hi = dls[min(n - 1, int(0.5 * n) + max(1, n // 50))]
        assert lo <= r.value <= hi, f"qid={r.qid}"


def test_cardinality_agg(spark, index, queries_pdf, oracle):
    """Exact two-level distinct == brute force; HLL++ within 3*rsd."""
    from dpr_spark.query.aggs import cardinality_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    vals = index.docstats.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(37)).alias("shard")
    )
    got = {
        r.qid: r.cardinality
        for r in cardinality_agg(qdf, index, vals, "shard").collect()
    }
    approx = {
        r.qid: r.cardinality
        for r in cardinality_agg(
            qdf, index, vals, "shard", exact=False, rsd=0.05
        ).collect()
    }
    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        expect = len({d % 37 for d in docs})
        assert got[int(q.qid)] == expect, f"qid={q.qid}"
        assert abs(approx[int(q.qid)] - expect) <= max(2, 0.15 * expect)
        checked += 1
    assert checked >= 6


def test_top_hits_agg(spark, index, queries_pdf, oracle):
    """Per-(query, bucket) top-2 by BM25 vs brute force over the
    oracle's full candidate scoring; salted and plain paths agree."""
    from dpr_spark.query.aggs import top_hits_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    vals = index.docstats.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(3)).alias("bucket")
    )
    for salt in (None, 4):
        res = top_hits_agg(
            qdf, index, vals, "bucket", size=2, salt_buckets=salt
        )
        got = {}
        for r in res.collect():
            got.setdefault((r.qid, r.value), []).append(
                (r.rank, r.doc_id, r.score)
            )
        checked = 0
        for _, q in queries_pdf.head(8).iterrows():
            full = oracle.search(q.question, k=10**9)
            if not full:
                continue
            buckets = {}
            for d, s in full:  # already score desc, doc_id asc
                buckets.setdefault(d % 3, []).append((d, s))
            for b, hits in buckets.items():
                expect = [
                    (i + 1, d, s) for i, (d, s) in enumerate(hits[:2])
                ]
                actual = sorted(got[(int(q.qid), b)])
                assert [(a[0], a[1]) for a in actual] == [
                    (e[0], e[1]) for e in expect
                ], f"salt={salt} qid={q.qid} bucket={b}"
                for a, e in zip(actual, expect):
                    assert a[2] == pytest.approx(e[2], rel=1e-9)
                checked += 1
        assert checked >= 15


def test_range_agg(spark, index, queries_pdf, oracle):
    """Explicit [lo, hi) ranges incl. unbounded and overlapping; empty
    ranges emit 0 (the range list is the schema)."""
    from dpr_spark.query.aggs import range_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    ranges = [(None, 50.0), (50.0, 100.0), (80.0, None), (10000.0, None)]
    res = range_agg(qdf, index, index.docstats, "doclen", ranges)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, {})[r.range_key] = r["count"]
    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        dls = [float(oracle.doclen[d]) for d in docs]
        expect = {
            "*-50.0": sum(1 for v in dls if v < 50),
            "50.0-100.0": sum(1 for v in dls if 50 <= v < 100),
            "80.0-*": sum(1 for v in dls if v >= 80),
            "10000.0-*": 0,
        }
        assert got[int(q.qid)] == expect, f"qid={q.qid}"
        checked += 1
    assert checked >= 6


def test_composite_agg_pages_cover_all_buckets(spark, index, queries_pdf, oracle):
    """Two-source composite (bucket5, bucket3): pages of 4 walked with
    the after-key reconstruct the full natural-key-ordered bucket list
    exactly."""
    from dpr_spark.query.aggs import composite_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(6))
    vals = index.docstats.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(5)).alias("b5"),
        F.pmod(F.col("doc_id"), F.lit(3)).alias("b3"),
    )
    # walk pages until exhausted (cursor shared across queries — the ES
    # per-request contract; use qid 0's last bucket as the cursor and
    # verify against that query)
    q0 = queries_pdf.head(6).iloc[0]
    docs = _oracle_matches(oracle, q0.question)
    assert docs
    expect_counts = {}
    for d in docs:
        key = (d % 5, d % 3)
        expect_counts[key] = expect_counts.get(key, 0) + 1
    expect = sorted(expect_counts.items())

    after, walked = None, []
    for _ in range(20):
        page = composite_agg(
            qdf, index, vals, ["b5", "b3"], size=4, after=after
        )
        rows = [r for r in page.collect() if r.qid == int(q0.qid)]
        if not rows:
            break
        rows.sort(key=lambda r: (r.b5, r.b3))
        walked.extend(((r.b5, r.b3), r["count"]) for r in rows)
        last = rows[-1]
        after = {"b5": last.b5, "b3": last.b3}
    assert walked == expect


def test_weighted_avg_and_value_count_missing(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import value_count_missing_agg, weighted_avg_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    # value = doclen, weight = (doc_id%5)+1; field missing for doc_id%3==0
    vals = index.docstats.select(
        "doc_id",
        F.col("doclen").cast("double").alias("v"),
        (F.pmod("doc_id", F.lit(5)) + 1).cast("double").alias("w"),
    )
    wa = {
        r.qid: r.weighted_avg
        for r in weighted_avg_agg(qdf, index, vals, "v", "w").collect()
    }
    sparse = vals.filter(F.pmod("doc_id", F.lit(3)) != 0).select("doc_id", "v")
    vc = {
        r.qid: (r.value_count, r.missing)
        for r in value_count_missing_agg(qdf, index, sparse, "v").collect()
    }
    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        num = sum(oracle.doclen[d] * ((d % 5) + 1) for d in docs)
        den = sum((d % 5) + 1 for d in docs)
        assert wa[int(q.qid)] == pytest.approx(num / den, rel=1e-12)
        present = sum(1 for d in docs if d % 3 != 0)
        assert vc[int(q.qid)] == (present, len(docs) - present)
        checked += 1
    assert checked >= 6


def test_pipeline_metrics_and_bucket_tools(spark):
    from pyspark.sql import functions as F
    from dpr_spark.query.aggs import bucket_selector, bucket_sort, pipeline_metrics

    rows = [(0, "a", 4), (0, "b", 10), (0, "c", 1), (1, "a", 2), (1, "b", 2)]
    b = spark.createDataFrame(rows, "qid int, bucket string, count long")
    met = {
        (r.qid, r.bucket): (r.deriv, r.cum, r.mov_avg)
        for r in pipeline_metrics(b, window=2).collect()
    }
    assert met[(0, "a")] == (0.0, 4, 4.0)
    assert met[(0, "b")] == (6.0, 14, 7.0)     # (4+10)/2
    assert met[(0, "c")] == (-9.0, 15, 5.5)    # (10+1)/2
    assert met[(1, "b")] == (0.0, 4, 2.0)
    top = {(r.qid, r.bucket) for r in bucket_sort(b, size=1).collect()}
    assert top == {(0, "b"), (1, "a")}  # qid 1 ties 2/2 -> bucket key breaks
    kept = {
        (r.qid, r.bucket)
        for r in bucket_selector(b, F.col("count") >= 4).collect()
    }
    assert kept == {(0, "a"), (0, "b")}


def test_filters_and_adjacency_and_global(spark, index, queries_pdf, oracle):
    """filters_agg / adjacency_matrix_agg / global_agg vs pure-Python
    twins over index.docstats doclen predicates."""
    from dpr_spark.query.aggs import (
        adjacency_matrix_agg,
        filters_agg,
        global_agg,
    )

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    dv = index.docstats  # (doc_id, doclen)
    med = sorted(oracle.doclen.values())[len(oracle.doclen) // 2]
    filt = [
        ("short", F.col("doclen") < med),
        ("exact", F.col("doclen") == med),
    ]

    res = filters_agg(qdf, index, dv, filt, other_bucket=True).collect()
    got = {(r.qid, r.bucket): r["count"] for r in res}
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        qid = int(q.qid)
        short = sum(1 for d in docs if oracle.doclen[d] < med)
        exact = sum(1 for d in docs if oracle.doclen[d] == med)
        other = sum(1 for d in docs if oracle.doclen[d] > med)
        assert got[(qid, "short")] == short
        assert got[(qid, "exact")] == exact
        assert got[(qid, "_other_")] == other

    adj = adjacency_matrix_agg(qdf, index, dv, filt).collect()
    gadj = {(r.qid, r.bucket): r["count"] for r in adj}
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        qid = int(q.qid)
        short = sum(1 for d in docs if oracle.doclen[d] < med)
        both = 0  # short & exact is contradictory -> always omitted
        assert (qid, "short&exact") not in gadj
        if short:
            assert gadj[(qid, "short")] == short

    g = global_agg(qdf, index, dv, "doclen").collect()
    n_corpus = len(oracle.doclen)
    avg_corpus = sum(oracle.doclen.values()) / n_corpus
    for r in g:
        assert r.g_n == n_corpus
        assert r.g_avg == pytest.approx(avg_corpus)
        docs = _oracle_matches(oracle, queries_pdf.iloc[int(r.qid)].question) \
            if int(r.qid) < len(queries_pdf) else None
        # per-qid stats already covered by test_stats_agg


def test_rare_and_multi_terms(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import multi_terms_agg, rare_terms_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    # categorical doc value: doclen parity + doclen % 3
    dv = index.docstats.select(
        "doc_id",
        (F.col("doclen") % 2).alias("par"),
        (F.col("doclen") % 3).alias("mod3"),
    )
    rare = rare_terms_agg(qdf, index, dv, "par", max_doc_count=3).collect()
    grare = {(r.qid, r.value): r["count"] for r in rare}
    multi = multi_terms_agg(qdf, index, dv, ["par", "mod3"], size=3).collect()
    gmulti = {}
    for r in multi:
        gmulti.setdefault(r.qid, []).append((r.rank, r.par, r.mod3, r["count"]))
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        qid = int(q.qid)
        from collections import Counter

        par = Counter(oracle.doclen[d] % 2 for d in docs)
        for v, c in par.items():
            if c <= 3:
                assert grare[(qid, v)] == c
            else:
                assert (qid, v) not in grare
        pairs = Counter((oracle.doclen[d] % 2, oracle.doclen[d] % 3) for d in docs)
        exp = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        gotl = sorted(gmulti.get(qid, []))
        assert len(gotl) == len(exp)
        for (rank, p, m3, c), ((ep, em), ec) in zip(gotl, exp):
            assert (p, m3, c) == (ep, em, ec), f"qid={qid} rank={rank}"


def test_sibling_normalize_and_bucket_script(spark):
    """avg/sum/min/max/stats_bucket siblings, percent_of_sum /
    rescale_0_1 normalize, and a bucket_script expression — hand graph."""
    import pyspark.sql.functions as F

    from dpr_spark.query.aggs import (
        bucket_script,
        normalize_agg,
        sibling_bucket_metrics,
    )

    buckets = spark.createDataFrame(
        [(0, "w1", 2), (0, "w2", 6), (0, "w3", 4), (1, "w1", 5)],
        "qid int, bucket string, count long",
    )
    sib = {r.qid: r for r in sibling_bucket_metrics(buckets, "qid").collect()}
    assert (sib[0].avg_bucket, sib[0].sum_bucket, sib[0].min_bucket,
            sib[0].max_bucket, sib[0].n_buckets) == (4.0, 12, 2, 6, 3)
    assert sib[1].n_buckets == 1 and sib[1].avg_bucket == 5.0

    pos = {(r.qid, r.bucket): r.share
           for r in normalize_agg(buckets, "qid").collect()}
    assert pos[(0, "w2")] == 0.5 and pos[(1, "w1")] == 1.0

    r01 = {(r.qid, r.bucket): r.share
           for r in normalize_agg(buckets, "qid", method="rescale_0_1").collect()}
    assert r01[(0, "w1")] == 0.0 and r01[(0, "w2")] == 1.0 and r01[(0, "w3")] == 0.5
    assert r01[(1, "w1")] == 0.0  # zero-range partition pins to 0

    bs = bucket_script(buckets, F.col("count") * 2, out_col="doubled")
    assert {(r.qid, r.bucket): r.doubled for r in bs.collect()}[(0, "w2")] == 12


def test_sampler_and_diversified_sampler(spark, index, oracle, queries_pdf):
    """Plain sampler == top-shard_size counts; diversified caps each
    value's docs before the cut — verified against the BM25 oracle."""
    from dpr_spark.query.aggs import sample_docs

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(4))
    vals = index.docstats.select(
        "doc_id", (F.col("doc_id") % 3).cast("string").alias("source")
    )
    plain = sample_docs(qdf, index, vals, "source", shard_size=10)
    div = sample_docs(
        qdf, index, vals, "source", shard_size=10, max_docs_per_value=2
    )
    gp, gd = {}, {}
    for r in plain.collect():
        gp.setdefault(r.qid, []).append((r.doc_id, r.value))
    for r in div.collect():
        gd.setdefault(r.qid, []).append((r.doc_id, r.value))
    for _, q in queries_pdf.head(4).iterrows():
        qid = int(q.qid)
        ranked = [
            (d, str(d % 3))
            for d, s in sorted(
                oracle.search(q.question, 10**9),
                key=lambda ds: (-round(ds[1], 6), ds[0]),
            )
        ]
        assert sorted(gp.get(qid, [])) == sorted(ranked[:10])
        # diversified: walk the ranking keeping <= 2 per value, stop at 10
        kept, seen = [], {}
        for d, v in ranked:
            if seen.get(v, 0) < 2:
                seen[v] = seen.get(v, 0) + 1
                kept.append((d, v))
            if len(kept) == 10:
                break
        assert sorted(gd.get(qid, [])) == sorted(kept)
        # the diversity cap holds
        from collections import Counter

        assert all(c <= 2 for c in Counter(v for _, v in gd.get(qid, [])).values())


def test_auto_date_histogram_unit_selection(spark, index, queries_pdf):
    """Few distinct days -> 'day'; a wide spread overflows day/week and
    lands on a coarser unit; bucket counts always fit the target."""
    import pyspark.sql.functions as F

    from dpr_spark.query.aggs import auto_date_histogram_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(4))
    # narrow: every matched doc in one of 3 days -> day fits target
    narrow = index.docstats.select(
        "doc_id",
        F.to_timestamp(
            F.date_add(F.lit("2025-01-01").cast("date"),
                       F.pmod("doc_id", F.lit(3)).cast("int"))
        ).alias("ts"),
    )
    got = auto_date_histogram_agg(qdf, index, narrow, "ts", target_buckets=10)
    units = {r.unit for r in got.collect()}
    assert units == {"day"}
    # wide: ~3 years of days -> day/week/month overflow 10, quarter fits
    wide = index.docstats.select(
        "doc_id",
        F.to_timestamp(
            F.date_add(F.lit("2025-01-01").cast("date"),
                       F.pmod("doc_id", F.lit(1100)).cast("int"))
        ).alias("ts"),
    )
    got2 = auto_date_histogram_agg(qdf, index, wide, "ts", target_buckets=10)
    rows = got2.collect()
    # a ~3-year day spread overflows day and week for every fixture query
    assert {r.unit for r in rows} <= {"month", "quarter", "year"}
    from collections import Counter

    # the chosen unit actually fits the target
    per_q = Counter(r.qid for r in rows)
    assert all(c <= 10 for c in per_q.values())


def test_string_stats_entropy_vs_python(spark, index, queries_pdf, oracle):
    """string_stats: lengths + character-distribution Shannon entropy
    match a brute-force python twin over the match set."""
    import math

    from pyspark.sql import functions as F

    from dpr_spark.query.aggs import string_stats_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    # synthetic string value: varied lengths and alphabets per doc
    vals = index.docstats.select(
        "doc_id",
        F.concat(
            F.lit("s"),
            F.pmod("doc_id", F.lit(7)).cast("string"),
            F.repeat(F.lit("x"), F.pmod("doc_id", F.lit(4)).cast("int")),
        ).alias("sval"),
    )
    got = {
        r.qid: (r["count"], r.min_length, r.max_length, r.avg_r, r.entropy_r)
        for r in string_stats_agg(qdf, index, vals, "sval").collect()
    }
    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        svals = [f"s{d % 7}" + "x" * (d % 4) for d in docs]
        lens = [len(s) for s in svals]
        freq = {}
        for s in svals:
            for ch in s:
                freq[ch] = freq.get(ch, 0) + 1
        tot = sum(freq.values())
        ent = -sum((n / tot) * math.log2(n / tot) for n in freq.values())
        n, mn, mx, avg, e = got[int(q.qid)]
        assert (n, mn, mx) == (len(svals), min(lens), max(lens))
        assert avg == pytest.approx(sum(lens) / len(lens), abs=1e-6)
        assert e == pytest.approx(ent, abs=1e-5)
        checked += 1
    assert checked >= 6


def test_random_sampler_deterministic_and_scaled(spark, index, queries_pdf, oracle):
    """random_sampler: the sample is a pure function of (doc_id, seed) —
    identical across re-runs and portable/xxhash draws differ; counts
    equal the python replay of the md5 predicate; est = round(n/p)."""
    import hashlib

    from pyspark.sql import functions as F

    from dpr_spark.query.aggs import random_sampler_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(6))
    vals = index.docstats.select(
        "doc_id", F.pmod("doc_id", F.lit(3)).cast("string").alias("bucket")
    )
    P, SEED, M = 0.5, 11, 1 << 20
    thr = int(round(P * M))

    def draw(doc_id):
        h = int(hashlib.md5(f"{doc_id}:{SEED}".encode()).hexdigest()[:15], 16)
        return h % M < thr

    res = random_sampler_agg(
        qdf, index, vals, "bucket", probability=P, seed=SEED, portable=True
    )
    got = {(r.qid, r.value): (r.doc_count, r.est_count) for r in res.collect()}
    rerun = {
        (r.qid, r.value): (r.doc_count, r.est_count) for r in res.collect()
    }
    assert got == rerun  # deterministic across jobs
    checked = 0
    for _, q in queries_pdf.head(6).iterrows():
        docs = _oracle_matches(oracle, q.question)
        exp = {}
        for d in docs:
            if draw(d):
                exp[str(d % 3)] = exp.get(str(d % 3), 0) + 1
        for b, n in exp.items():
            dc, est = got[(int(q.qid), b)]
            assert dc == n
            assert est == round(n * M / thr)
            checked += 1
        # buckets absent from the sample are absent from the result
        assert {b for (qq, b) in got if qq == int(q.qid)} == set(exp)
    assert checked >= 6
