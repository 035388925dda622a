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


def test_sparse_accumulator_work_scales_with_postings():
    """Per-query work must scale with postings touched, NOT partition
    size: gen-stamped sparse accumulators (ported from blockmax) replace
    the per-query O(partition_docs) scores.fill/touched.fill. 10k docs in
    the partition, 50 queries each touching a 5-posting term => exactly
    250 score writes, not 500k memset slots."""
    import numpy as np
    import pandas as pd

    from dpr_spark.query.wand import _search_partition

    n_big = 10_000
    big_docs = np.arange(n_big, dtype=np.int64)
    rare_docs = np.array([3, 11, 42, 77, 99], dtype=np.int64)
    pdf = pd.DataFrame(
        {
            "term_id": np.concatenate(
                [np.full(n_big, 1, dtype=np.int64), np.full(5, 7, dtype=np.int64)]
            ),
            "doc_id": np.concatenate([big_docs, rare_docs]),
            "impact": np.concatenate(
                [np.full(n_big, 0.25), np.array([5.0, 4.0, 3.0, 2.0, 1.0])]
            ),
        }
    )
    qterms = [(q, np.array([7], dtype=np.int64)) for q in range(50)]
    stats = {}
    out = list(_search_partition(iter([pdf]), qterms, k=3, stats=stats))
    assert stats["score_writes"] == 5 * 50
    assert stats["postings_touched"] == 5 * 50
    # top-3 of the rare term for every query
    res = sorted(
        (int(q), int(r_d), float(r_s))
        for q, r_d, r_s in zip(out[0].qid, out[0].doc_id, out[0].score)
    )
    for q in range(50):
        rows = [(d, s) for qq, d, s in res if qq == q]
        assert rows == [(3, 5.0), (11, 4.0), (42, 3.0)]

    # MaxScore path on the same partition: query {1, 7}, k=3 trips
    # pruning; gen reuse across queries must not leak scores between them.
    stats2 = {}
    qterms2 = [(q, np.array([1, 7], dtype=np.int64)) for q in range(3)]
    out2 = list(_search_partition(iter([pdf]), qterms2, k=3, stats=stats2))
    res2 = sorted(
        (int(q), int(d), float(s))
        for q, d, s in zip(out2[0].qid, out2[0].doc_id, out2[0].score)
    )
    for q in range(3):
        rows = [(d, s) for qq, d, s in res2 if qq == q]
        assert rows == [(3, 5.25), (11, 4.25), (42, 3.25)]
