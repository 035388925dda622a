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
