"""A/B the build's two hot phases against candidate variants, same
process, interleaved (same host window).

    python tools/ab_build_variants.py <cores> [docs=400000] [reps=2]

A = current: ranged_parts text shuffle + fused tokenize kernel.
B = narrow ids: rank urls only (20MB shuffle), broadcast-join the id map
    onto the cached input partitions, tokenize in place — text never
    shuffles.
E1 = current mapInPandas encode; E2 = mapInArrow encode (no pandas).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1])
docs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dpr_spark.session import get_spark

spark = get_spark("ab", master=f"local[{cores}]", shuffle_partitions=max(8, cores))
pages = (
    spark.read.parquet(f"/root/repo/.bench_cache/pages_{docs_n}.parquet")
    .repartition(64)
    .persist()
)
pages.count()

from dpr_spark.index.build import (
    POSTINGS_BLOCK_SCHEMA,
    _encode_arrays,
    doc_terms,
    doc_terms_from_parts,
    impact_expr,
)
from dpr_spark.plans.ids import assign_dense_ids, ranged_parts

par = spark.sparkContext.defaultParallelism


def t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def tok_A():
    cleanup = []
    parts, bc, n = ranged_parts(pages.select("url", "text"), "url", 3 * par, cleanup)
    tf = doc_terms_from_parts(parts, bc).persist()
    tf.count()
    tf.unpersist(True)
    for d in cleanup:
        d.unpersist(True)


def tok_B():
    cleanup = []
    docs = assign_dense_ids(pages.select("url", "text"), "url", "doc_id",
                            narrow=True, cleanup=cleanup)
    tf = doc_terms(docs.select("doc_id", "text")).persist()
    tf.count()
    tf.unpersist(True)
    for d in cleanup:
        d.unpersist(True)


# ---- encode variants need a prepared postings table
cleanup0 = []
parts0, bc0, n0 = ranged_parts(pages.select("url", "text"), "url", 3 * par, cleanup0)
tf0 = doc_terms_from_parts(parts0, bc0).persist()
tf0.count()
dfb = tf0.groupBy("term").agg(F.count("*").alias("df"), F.sum("tf").alias("ttf"))
ranked = assign_dense_ids(dfb, "term", "term_id", cleanup=cleanup0)
srow = ranked.agg(F.sum("ttf")).collect()[0]
avgdl = float(srow[0]) / n0
dictionary = ranked.withColumn(
    "idf",
    F.log((F.lit(float(n0)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
).select("term", "term_id", "idf")
postings = tf0.join(F.broadcast(dictionary), "term").select(
    "term_id", "doc_id", "tf", "doclen", "idf"
)
slim = postings.select(
    "term_id", "doc_id", F.col("tf").cast("int").alias("tf"),
    impact_expr(avgdl, 1.2, 0.75).cast("float").alias("score"),
).repartition(2 * par, F.col("term_id")).persist()
slim.count()


def enc_pandas():
    def encode(it):
        ts, ds, fs, ss = [], [], [], []
        for p in it:
            if len(p):
                ts.append(p["term_id"].to_numpy(np.int64))
                ds.append(p["doc_id"].to_numpy(np.int64))
                fs.append(p["tf"].to_numpy(np.int64))
                ss.append(p["score"].to_numpy(np.float64))
        if not ts:
            return
        cat = lambda xs: np.concatenate(xs) if len(xs) > 1 else xs[0]
        tt, dd, ff, sc = cat(ts), cat(ds), cat(fs), cat(ss)
        order = np.lexsort((dd, tt))
        out = _encode_arrays(tt.take(order), dd.take(order), ff.take(order), sc.take(order))
        if out is not None:
            yield out

    slim.mapInPandas(encode, POSTINGS_BLOCK_SCHEMA).write.format("noop").mode(
        "overwrite"
    ).save()


def enc_arrow():
    import pyarrow as pa

    def encode(it):
        ts, ds, fs, ss = [], [], [], []
        for b in it:
            if b.num_rows:
                ts.append(b.column(0).to_numpy(zero_copy_only=False))
                ds.append(b.column(1).to_numpy(zero_copy_only=False))
                fs.append(b.column(2).to_numpy(zero_copy_only=False))
                ss.append(b.column(3).to_numpy(zero_copy_only=False))
        if not ts:
            return
        cat = lambda xs: np.concatenate(xs) if len(xs) > 1 else xs[0]
        tt = cat(ts).astype(np.int64, copy=False)
        dd = cat(ds).astype(np.int64, copy=False)
        ff = cat(fs).astype(np.int64, copy=False)
        sc = cat(ss).astype(np.float64, copy=False)
        order = np.lexsort((dd, tt))
        out = _encode_arrays(tt.take(order), dd.take(order), ff.take(order), sc.take(order))
        if out is not None:
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    slim.mapInArrow(encode, POSTINGS_BLOCK_SCHEMA).write.format("noop").mode(
        "overwrite"
    ).save()


res = {"tok_A": [], "tok_B": [], "enc_pandas": [], "enc_arrow": []}
# warmups
tok_A(); tok_B(); enc_pandas(); enc_arrow()
for _ in range(reps):
    res["tok_A"].append(t(tok_A))
    res["tok_B"].append(t(tok_B))
    res["enc_pandas"].append(t(enc_pandas))
    res["enc_arrow"].append(t(enc_arrow))
print("AB cores=%d " % cores + json.dumps({k: (min(v), v) for k, v in res.items()}))
spark.stop()
