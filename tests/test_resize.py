"""Index shrink/split (ES _shrink/_split) — dpr_spark/index/resize.py.

The defining invariant: resizing a routed layout from N to M shards is
equivalent to having BUILT it at M shards — same placement, same
shard-local statistics, same scores — without touching the corpus.
"""

import pytest
from pyspark.sql import functions as F

NB_SRC = 8


@pytest.fixture(scope="module")
def routed_docs(pages_pdf):
    pdf = pages_pdf.reset_index(drop=True).copy()
    pdf["doc_id"] = pdf.index.astype("int64")
    return pdf[["doc_id", "text", "lang"]]


@pytest.fixture(scope="module")
def src_layout(spark, routed_docs, tmp_path_factory):
    from dpr_spark.query.routing import build_routed_layout

    path = str(tmp_path_factory.mktemp("resize_src"))
    docs = spark.createDataFrame(routed_docs)
    build_routed_layout(
        spark, docs, "lang", path, num_buckets=NB_SRC, portable=True
    )
    return path


@pytest.fixture(scope="module")
def routed_queries(routed_docs):
    langs = sorted(routed_docs["lang"].unique())
    out = []
    for i, lang in enumerate(langs):
        sub = routed_docs[routed_docs["lang"] == lang]
        words = sub.iloc[0]["text"].split()[:3]
        out.append((i, " ".join(words), lang))
    return out


def _search(spark, path, queries, nb, mode):
    from dpr_spark.query.routing import search_routed

    rows = search_routed(
        spark, path, queries, num_buckets=nb, k=10, mode=mode, portable=True
    ).collect()
    out = {}
    for r in rows:
        out.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for v in out.values():
        v.sort()
    return out


def _assert_same(got, want, label):
    assert set(got) == set(want), label
    for qid in want:
        g, w = got[qid], want[qid]
        assert [(r, d) for r, d, _ in g] == [(r, d) for r, d, _ in w], (
            f"{label} qid={qid} ranking"
        )
        for (_, d, gs), (_, _, ws) in zip(g, w):
            assert gs == pytest.approx(ws, abs=1e-9), f"{label} qid={qid} doc={d}"


@pytest.mark.parametrize("nb_dst,op", [(4, "shrink"), (16, "split")])
def test_resize_equals_fresh_build(
    spark, routed_docs, src_layout, routed_queries, tmp_path_factory, nb_dst, op
):
    from dpr_spark.index.resize import shrink_layout, split_layout
    from dpr_spark.query.routing import build_routed_layout, read_layout_meta

    dst = str(tmp_path_factory.mktemp(f"resize_{op}"))
    fn = shrink_layout if op == "shrink" else split_layout
    meta = fn(spark, src_layout, dst, nb_dst)
    assert meta["num_buckets"] == nb_dst
    assert read_layout_meta(dst)["num_buckets"] == nb_dst

    fresh = str(tmp_path_factory.mktemp(f"fresh_{op}"))
    build_routed_layout(
        spark,
        spark.createDataFrame(routed_docs),
        "lang",
        fresh,
        num_buckets=nb_dst,
        portable=True,
    )
    for mode in ("local", "global"):
        got = _search(spark, dst, routed_queries, nb_dst, mode)
        want = _search(spark, fresh, routed_queries, nb_dst, mode)
        assert want, "fresh build returned nothing"
        _assert_same(got, want, f"{op} {mode}")

    # row-level: placement is rbucket % M and the posting set is intact
    src_df = spark.read.parquet(src_layout)
    dst_df = spark.read.parquet(dst)
    assert dst_df.count() == src_df.count()
    bad = dst_df.filter(
        F.col("bucket") != F.pmod(F.col("rbucket"), F.lit(nb_dst)).cast("int")
    ).count()
    assert bad == 0


def test_resize_rejects_illegal_targets(spark, src_layout, tmp_path_factory):
    from dpr_spark.index.resize import resize_layout, shrink_layout, split_layout

    dst = str(tmp_path_factory.mktemp("resize_bad"))
    with pytest.raises(ValueError):  # 3 does not divide R=1024
        resize_layout(spark, src_layout, dst, 3)
    with pytest.raises(ValueError):  # shrink target must divide 8
        shrink_layout(spark, src_layout, dst, 16)
    with pytest.raises(ValueError):  # split target must be a multiple of 8
        split_layout(spark, src_layout, dst, 4)


def test_resized_scan_still_prunes(spark, src_layout, tmp_path_factory):
    """The shrunk layout keeps the partition-pruning contract: a routed
    scan of one bucket lists only that bucket's files."""
    from dpr_spark.index.resize import shrink_layout
    from dpr_spark.query.routing import routed_scan

    dst = str(tmp_path_factory.mktemp("resize_prune"))
    shrink_layout(spark, src_layout, dst, 2)
    scan = routed_scan(spark, dst, [1])
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    # and the pruned scan actually returns only that shard's rows
    assert [r.bucket for r in scan.select("bucket").distinct().collect()] == [1]


def test_check_layout_healthy_and_catches_corruption(
    spark, src_layout, tmp_path_factory
):
    """check_layout (index/check.py): green after build and after both
    resizes; a tampered layout fails the right checks."""
    from dpr_spark.index.check import assert_layout_healthy, check_layout
    from dpr_spark.index.resize import resize_layout
    from dpr_spark.query.routing import read_layout_meta, write_layout_meta

    assert_layout_healthy(spark, src_layout)
    for nb in (2, 16):
        dst = str(tmp_path_factory.mktemp(f"chk_{nb}"))
        resize_layout(spark, src_layout, dst, nb)
        assert_layout_healthy(spark, dst)

    # tamper: bump one row's impact_local and misplace one row's bucket
    bad = str(tmp_path_factory.mktemp("chk_bad"))
    post = spark.read.parquet(src_layout)
    t = (
        post.withColumn(
            "impact_local",
            F.when(F.col("doc_id") == 0, F.col("impact_local") + 1.0).otherwise(
                F.col("impact_local")
            ),
        )
        .withColumn(
            "rbucket",
            F.when(F.col("doc_id") == 1, F.col("rbucket") + 1).otherwise(
                F.col("rbucket")
            ),
        )
    )
    t.write.mode("overwrite").partitionBy("bucket").parquet(bad)
    write_layout_meta(bad, read_layout_meta(src_layout))
    res = {c: v for c, v, _ in check_layout(spark, bad)}
    assert res["impact_local_exact"] > 0
    assert res["bucket_placement"] > 0
    assert res["impact_global_exact"] == 0
    with pytest.raises(AssertionError):
        from dpr_spark.index.check import assert_layout_healthy as alh

        alh(spark, bad)
