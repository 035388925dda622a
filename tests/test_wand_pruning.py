"""Force the MaxScore pruned path (small k => prune threshold trips) and
assert bit-identity with the oracle still holds, including stopword-heavy
queries with large tie runs."""

import pytest


def test_pruned_path_matches_oracle(spark, index, oracle):
    from dpr_spark.query.wand import build_impact_segments, search_segments

    seg = build_impact_segments(index, num_buckets=4).persist()
    seg.count()
    # stopword-heavy + mixed + rare-term queries; k=3 forces pruning
    questions = [
        (0, "the of and to"),           # huge lists, giant tie runs
        (1, "the café"),                # stopword + rare
        (2, "of naïve zürich the a"),   # mixed
        (3, "the the the"),             # duplicate stopword
    ]
    qdf = spark.createDataFrame(questions, "qid long, question string")
    for k in (3, 10):
        got = {}
        for r in search_segments(spark, qdf, index, seg, k=k).collect():
            got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
        for qid, q in questions:
            expect = oracle.search(q, k)
            actual = sorted(got.get(qid, []))
            assert [d for _, d, _ in actual] == [d for d, _ in expect], (k, q)
            for (_, _, s), (_, es) in zip(actual, expect):
                assert s == es, (k, q, s, es)  # bit-identical floats


def test_absent_query_term_not_double_counted():
    """Regression: when a query term is ABSENT from a partition and its
    searchsorted insertion slot lands on another (present) query term,
    that term's impacts must count exactly once (np.isin-based resolution
    double-counted them)."""
    import numpy as np
    import pandas as pd

    from dpr_spark.query.wand import _search_partition

    # partition holds terms {5, 9}; query asks for {3, 5}: term 3 is
    # absent and its insertion point is term 5's slot.
    pdf = pd.DataFrame(
        {
            "term_id": np.array([5, 5, 9], dtype=np.int64),
            "doc_id": np.array([100, 200, 200], dtype=np.int64),
            "impact": np.array([0.875, 0.5, 2.0], dtype=np.float64),
        }
    )
    qterms = [(0, np.array([3, 5], dtype=np.int64))]
    out = list(_search_partition(iter([pdf]), qterms, k=10, prune=False))
    assert len(out) == 1
    got = {int(d): float(s) for d, s in zip(out[0].doc_id, out[0].score)}
    assert got == {100: 0.875, 200: 0.5}

    # same partition, pruned path, query {3, 5, 9} (3 absent)
    qterms = [(1, np.array([3, 5, 9], dtype=np.int64))]
    out = list(_search_partition(iter([pdf]), qterms, k=1, prune=True))
    got = {int(d): float(s) for d, s in zip(out[0].doc_id, out[0].score)}
    assert got == {200: 2.5}


def test_segments_wave_batching_identical(spark, index, queries_df):
    """search_segments wave splitting (broadcast batches) is a pure
    partition of the query set — results must be bit-identical."""
    from dpr_spark.query.wand import build_impact_segments, search_segments

    seg = build_impact_segments(index, num_buckets=4).persist()
    seg.count()

    def canon(df):
        return sorted((r.qid, r.rank, r.doc_id, r.score) for r in df.collect())

    one = canon(search_segments(spark, queries_df, index, seg, k=10, batch_size=10**6))
    waved = canon(search_segments(spark, queries_df, index, seg, k=10, batch_size=7))
    assert one == waved
    seg.unpersist(True)


def test_values_filter_join_path_matches_isin(spark, index):
    """_values_filter above pushdown_limit switches to a broadcast
    semi-join; both paths must select the same rows."""
    from dpr_spark.query.wand import _values_filter

    terms = [r.term for r in index.dictionary.limit(40).collect()]
    a = sorted(r.term for r in _values_filter(index.dictionary, "term", terms).collect())
    b = sorted(
        r.term
        for r in _values_filter(index.dictionary, "term", terms, pushdown_limit=5).collect()
    )
    assert a == b and len(a) == len(terms)
