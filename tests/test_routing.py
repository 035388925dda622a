"""Routed (shard-targeted) search — query/routing.py.

Covers: placement (every hit lives in the query's shard), both ES
search types vs the pure-Python oracle (query_then_fetch = shard-local
stats; dfs_query_then_fetch = global stats), portable-vs-xxhash bucket
agreement on placement semantics, and the partition-pruning plan shape
(a routed scan reads ONLY its shard's partition directories).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from dpr_spark.functions.normalize import normalize_question
from dpr_spark.functions.tokenizer import tokenize
from dpr_spark.oracle.bm25 import BM25Oracle

NB = 4


def _py_bucket(v: str, num_buckets: int) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16) % num_buckets


@pytest.fixture(scope="module")
def routed_docs(pages_pdf):
    """(doc_id, text, routing=lang) rows from the shared fixture."""
    pdf = pages_pdf.reset_index(drop=True).copy()
    pdf["doc_id"] = pdf.index.astype("int64")
    return pdf[["doc_id", "text", "lang"]]


@pytest.fixture(scope="module")
def layout(spark, routed_docs, tmp_path_factory):
    from dpr_spark.query.routing import build_routed_layout

    path = str(tmp_path_factory.mktemp("routed"))
    docs = spark.createDataFrame(routed_docs)
    build_routed_layout(
        spark, docs, "lang", path, num_buckets=NB, portable=True
    )
    return path


@pytest.fixture(scope="module")
def routed_queries(routed_docs):
    """Queries routed to the languages actually present, with phrases
    sampled from in-bucket docs so every query has hits."""
    langs = sorted(routed_docs["lang"].unique())
    out = []
    for i, lang in enumerate(langs):
        sub = routed_docs[routed_docs["lang"] == lang]
        words = sub.iloc[0]["text"].split()[:3]
        out.append((i, " ".join(words), lang))
    return out


def _oracle_for(routed_docs, doc_filter=None) -> BM25Oracle:
    o = BM25Oracle()
    for _, r in routed_docs.iterrows():
        if doc_filter is None or doc_filter(r):
            o.add(int(r["doc_id"]), r["text"])
    o.build()
    return o


def test_placement_and_local_stats_match_oracle(
    spark, routed_docs, layout, routed_queries
):
    from dpr_spark.query.routing import search_routed

    res = search_routed(
        spark, layout, routed_queries, num_buckets=NB, k=10,
        mode="local", portable=True,
    ).collect()
    assert res, "routed search returned nothing"
    by_q = {}
    for r in res:
        by_q.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    lang_of = dict(zip(routed_docs["doc_id"], routed_docs["lang"]))
    for qid, question, routing in routed_queries:
        got = sorted(by_q.get(qid, []))
        # placement: every hit hashes to the query's shard
        qb = _py_bucket(routing, NB)
        for _, d, _ in got:
            assert _py_bucket(lang_of[d], NB) == qb
        # shard-local scoring == an oracle built over ONLY that shard
        shard_oracle = _oracle_for(
            routed_docs,
            lambda r: _py_bucket(r["lang"], NB) == qb,
        )
        want = shard_oracle.search(normalize_question(question), k=10)
        assert [(d, round(s, 9)) for _, d, s in got] == [
            (d, round(s, 9)) for d, s in want
        ], f"qid={qid}"


def test_global_stats_mode_matches_full_corpus_oracle(
    spark, routed_docs, layout, routed_queries
):
    from dpr_spark.query.routing import search_routed

    res = search_routed(
        spark, layout, routed_queries, num_buckets=NB, k=10,
        mode="global", portable=True,
    ).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    full = _oracle_for(routed_docs)
    lang_of = dict(zip(routed_docs["doc_id"], routed_docs["lang"]))
    for qid, question, routing in routed_queries:
        qb = _py_bucket(routing, NB)
        # dfs mode: global df/N/avgdl, candidates restricted to the shard
        ranked = full.search(normalize_question(question), k=full.N)
        want = [
            (d, s) for d, s in ranked if _py_bucket(lang_of[d], NB) == qb
        ][:10]
        got = sorted(by_q.get(qid, []))
        assert [(d, round(s, 9)) for _, d, s in got] == [
            (d, round(s, 9)) for d, s in want
        ], f"qid={qid}"


def test_routed_scan_prunes_partitions(spark, layout, routed_queries):
    """The bucket IN (...) filter lands as a partition filter: the scan
    of one routed bucket reads strictly fewer files than the full
    layout, and the physical plan shows PartitionFilters on bucket."""
    from dpr_spark.query.routing import routed_scan

    one = routed_scan(spark, layout, [0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan

    def files_read(df):
        return df.select(F.input_file_name()).distinct().count()

    total = files_read(spark.read.parquet(layout))
    pruned = files_read(one)
    assert 0 < pruned < total, (pruned, total)


def test_xxhash_default_places_consistently(spark, routed_docs, tmp_path):
    """Default (xxhash64) routing: placement is internally consistent —
    a query routed to lang L returns only docs whose lang hashes to the
    same bucket under the SAME engine hash."""
    from dpr_spark.query.routing import (
        build_routed_layout,
        resolve_routing,
        search_routed,
    )

    path = str(tmp_path / "routed_xx")
    docs = spark.createDataFrame(routed_docs)
    build_routed_layout(spark, docs, "lang", path, num_buckets=NB)
    lang = sorted(routed_docs["lang"].unique())[0]
    sub = routed_docs[routed_docs["lang"] == lang]
    q = [(0, " ".join(sub.iloc[0]["text"].split()[:3]), lang)]
    res = search_routed(spark, path, q, num_buckets=NB, k=10).collect()
    assert res
    bmap = resolve_routing(
        spark, sorted(routed_docs["lang"].unique()), NB
    )
    lang_of = dict(zip(routed_docs["doc_id"], routed_docs["lang"]))
    for r in res:
        assert bmap[lang_of[r.doc_id]] == bmap[lang]
