"""Completion suggester (query/suggest.py) vs a brute-force twin over
the oracle vocabulary, prefix + infix modes, and analyzed-vocab
suggestions."""

import pytest


def _twin(oracle, prefix, n=5, infix=False):
    cand = [
        (t, d) for t, d in oracle.df.items()
        if (prefix in t if infix else t.startswith(prefix))
    ]
    cand.sort(key=lambda td: (-td[1], td[0]))
    return [(i + 1, t, d) for i, (t, d) in enumerate(cand[:n])]


def _prefixes(oracle, n=4):
    seen = []
    for t in sorted(oracle.df):
        if len(t) >= 4 and t.isalpha() and t[:2] not in seen:
            seen.append(t[:2])
        if len(seen) >= n:
            break
    return seen


@pytest.mark.parametrize("mode", ["prefix", "infix"])
def test_suggest_matches_twin(spark, index, oracle, mode):
    from dpr_spark.query.suggest import suggest_completions

    ps = _prefixes(oracle)
    queries = [(i, p) for i, p in enumerate(ps)] + [(99, "zzznope")]
    res = suggest_completions(spark, queries, index, n=5, mode=mode)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.term, r.weight))
    n_rows = 0
    for qid, p in queries:
        expect = _twin(oracle, p, 5, infix=(mode == "infix"))
        assert sorted(got.get(qid, [])) == expect, f"mode={mode} prefix={p!r}"
        n_rows += len(expect)
    assert n_rows >= 10 and 99 not in got


def test_suggest_analyzed_vocab(spark, pages_pdf):
    """Suggestions over an analyzed index come from the STEMMED
    vocabulary — what a search would actually match."""
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.suggest import suggest_completions

    pw = assign_doc_ids(pages_pdf)
    idx = build_index_from_docs(
        spark, spark.createDataFrame(pw[["doc_id", "text"]]),
        build_blocks=False, analyzer=ENGLISH_S,
    )
    vocab = {r.term for r in idx.dictionary.select("term").collect()}
    ps = sorted({t[:2] for t in vocab if len(t) >= 4 and t.isalpha()})[:3]
    res = suggest_completions(spark, list(enumerate(ps)), idx, n=5)
    rows = res.collect()
    assert rows and all(r.term in vocab for r in rows)
    idx.unpersist()


def test_suggest_validation(spark, index):
    from dpr_spark.query.suggest import suggest_completions

    with pytest.raises(ValueError, match="mode"):
        suggest_completions(spark, [(0, "ab")], index, mode="fuzzy")
    with pytest.raises(ValueError, match="empty"):
        suggest_completions(spark, [(0, "")], index)
