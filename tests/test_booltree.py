"""Nested boolean query trees (query/booltree.py): rank+score identity
vs the recursive pure-Python twin across tree shapes, plus the flat
degenerate case and validation."""

import pytest


def _vocab(pages_pdf, n=8):
    from dpr_spark.functions.tokenizer import tokenize

    df = {}
    for text in pages_pdf.text:
        for t in set(tokenize(text)):
            df[t] = df.get(t, 0) + 1
    mid = sorted(t for t, d in df.items() if 20 <= d <= 200 and t.isalpha())
    assert len(mid) >= n
    return mid[:n]


def _trees(pages_pdf):
    from dpr_spark.query.booltree import Bool, T

    v = _vocab(pages_pdf)
    return [
        # depth 2: (v0 OR v1) AND NOT v2
        (0, Bool(must=[Bool(should=[T(v[0]), T(v[1])])], must_not=[T(v[2])])),
        # depth 3 with msm + boosts
        (1, Bool(
            should=[
                Bool(must=[T(v[0]), T(v[3])], boost=2.0),
                Bool(should=[T(v[1]), T(v[2]), T(v[4])], msm=2),
                T(v[5], boost=0.5),
            ],
            msm=1,
        )),
        # must_not SUBTREE: match v6 unless (v0 AND v1) both present
        (2, Bool(must=[T(v[6])], must_not=[Bool(must=[T(v[0]), T(v[1])])])),
        # flat degenerate: one must term
        (3, Bool(must=[T(v[7])])),
        # OOV must -> empty
        (4, Bool(must=[T("zzznope"), T(v[0])])),
    ]


def test_tree_rank_identity(spark, index, pages_pdf, oracle):
    from dpr_spark.query.booltree import bool_tree_search, search_tree_py

    trees = _trees(pages_pdf)
    got = {}
    for r in bool_tree_search(spark, trees, index, k=10).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    n = 0
    for qid, root in trees:
        expect = search_tree_py(oracle, root, k=10)
        actual = sorted(got.get(qid, []))
        assert len(actual) == len(expect), f"qid={qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"qid={qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9)
            n += 1
    assert n > 25
    assert not got.get(4)  # the OOV-must tree matched nothing


def test_tree_flat_equals_bool_search(spark, index, pages_pdf):
    """A 1-level tree reproduces boolquery.bool_search exactly (same
    scores to 1e-9): the nesting machinery degenerates cleanly."""
    from dpr_spark.query.booltree import Bool, T, bool_tree_search
    from dpr_spark.query.boolquery import bool_search

    v = _vocab(pages_pdf)
    tree = [(0, Bool(must=[T(v[0])], should=[T(v[1])], must_not=[T(v[2])]))]
    flat = [(0, [v[0]], [v[1]], [v[2]])]
    a = sorted(
        (r.rank, r.doc_id, round(r.score, 9))
        for r in bool_tree_search(spark, tree, index, k=10).collect()
    )
    b = sorted(
        (r.rank, r.doc_id, round(r.score, 9))
        for r in bool_search(spark, flat, index, k=10).collect()
    )
    assert a == b and a


def test_tree_validation(spark, index, pages_pdf):
    from dpr_spark.query.booltree import Bool, T, bool_tree_search

    v = _vocab(pages_pdf)
    with pytest.raises(ValueError, match="at least one"):
        bool_tree_search(spark, [(0, Bool(must_not=[T(v[0])]))], index)
    with pytest.raises(ValueError, match="msm"):
        bool_tree_search(spark, [(0, Bool(should=[T(v[0])], msm=2))], index)
    with pytest.raises(TypeError, match="root"):
        bool_tree_search(spark, [(0, T(v[0]))], index)
    with pytest.raises(ValueError, match="analyzes to"):
        bool_tree_search(spark, [(0, Bool(must=[T("two words")]))], index)
