"""Alias + rollover lifecycle (index/aliases.py): rollover fires only
at the max_docs condition and mints ES-convention generation names;
swap is one atomic pointer update; searching an alias equals searching
one index built over the union of its generations (global statistics
via the no-retokenize merge)."""

import os

import pytest


@pytest.fixture(scope="module")
def docs_df(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    return spark.createDataFrame(pw[["doc_id", "text"]])


def test_rollover_condition_and_names(tmp_path):
    from dpr_spark.index.aliases import AliasCatalog

    c = AliasCatalog(str(tmp_path))
    c.create("logs", "logs-000001")
    assert c.resolve("logs") == ["logs-000001"]
    assert c.write_index("logs") == "logs-000001"
    # below the condition: no-op
    assert c.rollover("logs", write_index_docs=99, max_docs=100) is None
    assert c.resolve("logs") == ["logs-000001"]
    # at the condition: generation 2, write pointer moves
    assert c.rollover("logs", 100, 100) == "logs-000002"
    assert c.resolve("logs") == ["logs-000001", "logs-000002"]
    assert c.write_index("logs") == "logs-000002"
    # reads go to ALL generations, writes to the newest only
    assert c.rollover("logs", 250, 100) == "logs-000003"
    assert c.resolve("logs") == ["logs-000001", "logs-000002", "logs-000003"]


def test_swap_is_atomic_pointer_update(tmp_path):
    from dpr_spark.index.aliases import AliasCatalog, AliasError

    c = AliasCatalog(str(tmp_path))
    c.create("search", "idx-a")
    c.swap("search", "idx-a", "idx-b")
    assert c.resolve("search") == ["idx-b"]
    assert c.write_index("search") == "idx-b"
    with pytest.raises(AliasError):
        c.swap("search", "idx-a", "idx-c")  # idx-a no longer behind it
    # the commit is rename-based: no partial temp files left behind
    leftovers = [f for f in os.listdir(tmp_path) if ".tmp-" in f]
    assert not leftovers
    # the on-disk state is the whole contract — reopen and see the same
    assert AliasCatalog(str(tmp_path)).resolve("search") == ["idx-b"]


def test_create_duplicate_and_unknown(tmp_path):
    from dpr_spark.index.aliases import AliasCatalog, AliasError

    c = AliasCatalog(str(tmp_path))
    c.create("a", "i1")
    with pytest.raises(AliasError):
        c.create("a", "i2")
    with pytest.raises(AliasError):
        c.resolve("nope")
    c.delete("a")
    with pytest.raises(AliasError):
        c.resolve("a")


def test_search_alias_equals_full_corpus(spark, docs_df, oracle, queries_df, queries_pdf, tmp_path):
    """Three rollover generations (doc_id mod 3 splits), searched via
    the alias, must rank exactly like the single-index oracle over the
    whole corpus — the merge carries exact global df/N/avgdl."""
    from dpr_spark.index.aliases import AliasCatalog, search_alias
    from dpr_spark.index.build import build_index_from_docs
    from pyspark.sql import functions as F

    c = AliasCatalog(str(tmp_path))
    c.create("corpus", "corpus-000001")
    c.rollover("corpus", 10, 10)
    c.rollover("corpus", 10, 10)
    names = c.resolve("corpus")
    assert names == ["corpus-000001", "corpus-000002", "corpus-000003"]
    indexes = {
        n: build_index_from_docs(
            spark,
            docs_df.filter(F.col("doc_id") % 3 == i),
            build_blocks=False,
        )
        for i, n in enumerate(names)
    }
    got = {}
    res = search_alias(spark, c, "corpus", indexes, queries_df, k=10)
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for q in got:
        got[q].sort()
    n_checked = 0
    for _, row in queries_pdf.iterrows():
        expect = oracle.search(row.question, 10)
        actual = got.get(row.qid, [])
        assert len(actual) == len(expect), f"qid={row.qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"qid={row.qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9)
            n_checked += 1
    assert n_checked > 100
