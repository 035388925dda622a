"""Index integrity checker — the Lucene CheckIndex analog: verify the
structural invariants that every engine relies on, as one DataFrame job
per check, and report (check, violations, detail). An index that has
been merged, purged, compacted, or NRT-patched should pass every check;
running this after each lifecycle operation is the operability story a
serving stack needs before swapping an index in.

Checks (each a posting- or vocab-sized aggregation, nothing collects
more than the violation count + a sample):

- dictionary_ids_dense:  term_ids are exactly 0..V-1, no dup, no gap
  (the dense-rank contract every ascending-term_id float fold depends on)
- dictionary_df_exact:   df(term) == count of posting rows of that term
- dictionary_idf_formula: idf == ln((N-df+.5)/(df+.5)+1) recomputed
- postings_doclen_consistent: every posting row's doclen == the doc's
  sum(tf) (the BM25 norm every engine folds)
- postings_unique:       one posting row per (term_id, doc_id)
- docstats_doclen:       docstats.doclen == sum(tf) per doc (0 for
  token-less docs)
- stats_n_docs / stats_avgdl: the broadcast scalars match the tables
- positions_tf (when positional): len(positions) == tf per row, and
  positions strictly ascending
- blocks_roundtrip (when blocks built): decoding every compressed block
  reproduces the exact (doc_id, impact) rows of the postings
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark.index.build import InvertedIndex


def _violations(df: DataFrame) -> int:
    return df.limit(1_000_000).count()


def check_index(
    spark: SparkSession,
    index: InvertedIndex,
    check_blocks: bool = True,
    avgdl_tol: float = 1e-9,
) -> List[Tuple[str, int, str]]:
    """[(check, violations, detail)] — violations == 0 everywhere for a
    healthy index. Runs every applicable check (does not stop at the
    first failure, like CheckIndex -verbose)."""
    out: List[Tuple[str, int, str]] = []
    d = index.dictionary
    p = index.postings

    v = d.count()
    id_bad = d.agg(
        F.count("*").alias("n"),
        F.countDistinct("term_id").alias("nd"),
        F.min("term_id").alias("lo"),
        F.max("term_id").alias("hi"),
    ).first()
    dense_ok = (
        v == 0
        or (id_bad.nd == id_bad.n and id_bad.lo == 0 and id_bad.hi == id_bad.n - 1)
    )
    out.append(
        (
            "dictionary_ids_dense",
            0 if dense_ok else 1,
            f"V={v} distinct={id_bad.nd} range=[{id_bad.lo},{id_bad.hi}]",
        )
    )

    df_actual = p.groupBy("term_id").agg(F.count("*").alias("df_seen"))
    df_bad = (
        d.select("term_id", "df")
        .join(df_actual, "term_id", "full")
        .filter(
            F.coalesce(F.col("df"), F.lit(-1)) != F.coalesce(F.col("df_seen"), F.lit(-1))
        )
    )
    out.append(("dictionary_df_exact", _violations(df_bad), "df != posting-row count"))

    n = float(index.stats.n_docs)
    idf_expr = F.log(
        (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
    )
    idf_bad = d.filter(F.col("idf") != idf_expr)
    out.append(("dictionary_idf_formula", _violations(idf_bad), "idf != formula(df, N)"))

    doc_sums = p.groupBy("doc_id").agg(F.sum("tf").alias("sum_tf"))
    dl_bad = p.join(doc_sums, "doc_id").filter(F.col("doclen") != F.col("sum_tf"))
    out.append(
        ("postings_doclen_consistent", _violations(dl_bad), "posting doclen != sum(tf)")
    )

    dup = (
        p.groupBy("term_id", "doc_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
    )
    out.append(("postings_unique", _violations(dup), "duplicate (term_id, doc_id)"))

    ds_bad = (
        index.docstats.select("doc_id", "doclen")
        .join(doc_sums, "doc_id", "left")
        .filter(F.col("doclen") != F.coalesce(F.col("sum_tf"), F.lit(0)))
    )
    out.append(("docstats_doclen", _violations(ds_bad), "docstats doclen != sum(tf)"))

    n_docs_actual = index.docstats.count()
    out.append(
        (
            "stats_n_docs",
            0 if n_docs_actual == index.stats.n_docs else 1,
            f"stats={index.stats.n_docs} docstats={n_docs_actual}",
        )
    )
    sum_dl = index.docstats.agg(F.sum("doclen")).first()[0] or 0
    avgdl_actual = float(sum_dl) / n_docs_actual if n_docs_actual else 0.0
    out.append(
        (
            "stats_avgdl",
            0 if abs(avgdl_actual - index.stats.avgdl) <= avgdl_tol else 1,
            f"stats={index.stats.avgdl!r} tables={avgdl_actual!r}",
        )
    )

    if index.positions is not None:
        pos_bad = index.positions.filter(
            (F.size("positions") != F.col("tf"))
            | ~F.forall(
                F.zip_with(
                    F.slice("positions", 1, F.greatest(F.size("positions") - 1, F.lit(0))),
                    F.slice("positions", 2, F.greatest(F.size("positions") - 1, F.lit(0))),
                    lambda a, b: a < b,
                ),
                lambda x: x,
            )
        )
        out.append(
            ("positions_tf", _violations(pos_bad), "len/order of positions vs tf")
        )

    if check_blocks and index.blocks is not None:
        import pandas as pd

        def dec(it):
            import numpy as np

            from dpr_spark.index.codec import decode_blocks_batch

            for b in it:
                if not len(b):
                    continue
                docs, tfs, starts = decode_blocks_batch(
                    list(b["doc_ids"]), list(b["tfs"]), b["n"].to_numpy(np.int64)
                )
                tids = np.repeat(b["term_id"].to_numpy(np.int64), b["n"].to_numpy(np.int64))
                yield pd.DataFrame({"term_id": tids, "doc_id": docs, "tf": tfs})

        decoded = index.blocks.mapInPandas(dec, "term_id long, doc_id long, tf long")
        exact = p.select("term_id", "doc_id", F.col("tf").cast("long").alias("tf"))
        mismatch = decoded.exceptAll(exact).unionByName(exact.exceptAll(decoded))
        out.append(
            ("blocks_roundtrip", _violations(mismatch), "decoded blocks != postings")
        )
    return out


def assert_healthy(spark: SparkSession, index: InvertedIndex, **kw) -> None:
    """Raise with the failing checks when any invariant is violated."""
    bad = [(c, v, det) for c, v, det in check_index(spark, index, **kw) if v]
    if bad:
        raise AssertionError(f"index integrity violations: {bad}")


def check_layout(
    spark: SparkSession, path: str, tol: float = 1e-9
) -> List[Tuple[str, int, str]]:
    """CheckIndex for the ROUTED layout (query/routing.py /
    index/resize.py): verify the invariants a resize depends on, so an
    operator can gate an alias swap on a green report after every
    shrink/split. [(check, violations, detail)], 0 everywhere when
    healthy.

    - meta_consistent:   num_buckets divides num_routing_shards
    - rbucket_range:     0 <= rbucket < num_routing_shards
    - bucket_placement:  bucket == rbucket % num_buckets on every row
    - postings_unique:   one row per (term, doc_id)
    - doclen_consistent: doclen constant per doc_id
    - impact_local_exact / impact_global_exact: stored impacts match a
      recompute from the raw (tf, doclen) columns and re-aggregated
      stats within `tol` (summation order may differ by one ulp)
    """
    from dpr_spark.query.routing import idf_expr, impact_expr, read_layout_meta

    out: List[Tuple[str, int, str]] = []
    meta = read_layout_meta(path)
    n, r = int(meta["num_buckets"]), int(meta["num_routing_shards"])
    k1, b = float(meta["k1"]), float(meta["b"])
    out.append(
        (
            "meta_consistent",
            0 if (n > 0 and r % n == 0) else 1,
            f"num_buckets={n} num_routing_shards={r}",
        )
    )
    post = spark.read.parquet(path)
    out.append(
        (
            "rbucket_range",
            _violations(
                post.filter((F.col("rbucket") < 0) | (F.col("rbucket") >= r))
            ),
            f"rbucket outside [0,{r})",
        )
    )
    out.append(
        (
            "bucket_placement",
            _violations(
                post.filter(
                    F.col("bucket")
                    != F.pmod(F.col("rbucket"), F.lit(n)).cast("int")
                )
            ),
            "bucket != rbucket % num_buckets",
        )
    )
    dup = (
        post.groupBy("term", "doc_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
    )
    out.append(("postings_unique", _violations(dup), "dup (term, doc_id) rows"))
    dl = (
        post.groupBy("doc_id")
        .agg(F.countDistinct("doclen").alias("nd"))
        .filter(F.col("nd") > 1)
    )
    out.append(("doclen_consistent", _violations(dl), "doclen varies per doc"))

    ds = post.select("bucket", "doc_id", "doclen").distinct()
    bstats = ds.groupBy("bucket").agg(
        F.count("*").cast("double").alias("n_b"),
        F.avg("doclen").alias("avgdl_b"),
    )
    grow = ds.agg(
        F.count("*").cast("double").alias("n_g"),
        F.avg("doclen").alias("avgdl_g"),
    ).first()
    df_local = post.groupBy("bucket", "term").agg(F.count("*").alias("df_b"))
    df_global = post.groupBy("term").agg(F.count("*").alias("df_g"))
    re_l = impact_expr(idf_expr(F.col("df_b"), F.col("n_b")), F.col("avgdl_b"), k1, b)
    re_g = impact_expr(
        idf_expr(F.col("df_g"), F.lit(float(grow["n_g"]))),
        F.lit(float(grow["avgdl_g"])),
        k1,
        b,
    )
    joined = post.join(df_local, ["bucket", "term"]).join(df_global, "term").join(
        F.broadcast(bstats), "bucket"
    )
    out.append(
        (
            "impact_local_exact",
            _violations(
                joined.filter(F.abs(F.col("impact_local") - re_l) > F.lit(tol))
            ),
            f"stored impact_local off by > {tol}",
        )
    )
    out.append(
        (
            "impact_global_exact",
            _violations(
                joined.filter(F.abs(F.col("impact_global") - re_g) > F.lit(tol))
            ),
            f"stored impact_global off by > {tol}",
        )
    )
    return out


def assert_layout_healthy(spark: SparkSession, path: str, **kw) -> None:
    bad = [(c, v, det) for c, v, det in check_layout(spark, path, **kw) if v]
    if bad:
        raise AssertionError(f"layout integrity violations: {bad}")
