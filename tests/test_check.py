"""Index integrity checker (Lucene CheckIndex analog): healthy after
build / merge / purge / NRT compaction; corruptions are caught."""

import pytest
from pyspark.sql import functions as F


def _by_check(res):
    return {c: v for c, v, _ in res}


def test_fresh_index_healthy(spark, index):
    from dpr_spark.index.check import assert_healthy, check_index

    res = check_index(spark, index)
    assert _by_check(res) == {c: 0 for c, _, _ in res}
    assert {"dictionary_ids_dense", "dictionary_df_exact", "blocks_roundtrip"} <= {
        c for c, _, _ in res
    }
    assert_healthy(spark, index)


def test_lifecycle_outputs_healthy(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.index.check import assert_healthy
    from dpr_spark.index.deletes import purge_deletes
    from dpr_spark.index.merge import merge_indexes

    pw = assign_doc_ids(pages_pdf.head(120))
    docs = spark.createDataFrame(pw[["doc_id", "url", "text"]])
    a = build_index_from_docs(
        spark, docs.filter(F.col("doc_id") % 2 == 0), build_blocks=False,
        build_positional=True,
    )
    b = build_index_from_docs(
        spark, docs.filter(F.col("doc_id") % 2 == 1), build_blocks=False,
        build_positional=True,
    )
    merged = merge_indexes(spark, [a, b], build_blocks=True)
    assert_healthy(spark, merged)
    purged = purge_deletes(
        spark, merged, docs.filter(F.col("doc_id") % 9 == 0).select("doc_id"),
        build_blocks=True,
    )
    assert_healthy(spark, purged)


def test_corruptions_caught(spark, index):
    from dpr_spark.index.build import InvertedIndex
    from dpr_spark.index.check import check_index

    # df off by one for one term
    bad_dict = index.dictionary.withColumn(
        "df", F.when(F.col("term_id") == 0, F.col("df") + 1).otherwise(F.col("df"))
    )
    broken = InvertedIndex(
        index.docstats, bad_dict, index.postings, None, index.stats,
    )
    got = _by_check(check_index(spark, broken))
    assert got["dictionary_df_exact"] >= 1
    assert got["dictionary_idf_formula"] >= 1  # idf no longer matches the new df

    # duplicated posting row
    dup_post = index.postings.unionByName(index.postings.limit(1))
    broken2 = InvertedIndex(
        index.docstats, index.dictionary, dup_post, None, index.stats,
    )
    got2 = _by_check(check_index(spark, broken2))
    assert got2["postings_unique"] >= 1
    assert got2["dictionary_df_exact"] >= 1

    # stats lie
    from dpr_spark.index.build import IndexStats

    broken3 = InvertedIndex(
        index.docstats, index.dictionary, index.postings, None,
        IndexStats(index.stats.n_docs + 1, index.stats.avgdl),
    )
    got3 = _by_check(check_index(spark, broken3))
    assert got3["stats_n_docs"] == 1
