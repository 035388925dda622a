#!/usr/bin/env python
"""Per-phase scaling profile of the index build: run the build's phases
with forced materialization boundaries at one parallelism level per
subprocess, print phase walls. Identifies which phase eats the
scaling-efficiency budget (serial driver work vs parallel stages).

    python tools/profile_build.py [--docs 200000] [--levels 4 16] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = r"""
import json, sys, time
sys.path.insert(0, {here!r})
from dpr_spark.session import get_spark
from pyspark.sql import functions as F

cores = {cores}
spark = get_spark("profile", master=f"local[{{cores}}]", shuffle_partitions=max(8, cores))
pages = spark.read.parquet({pages!r}).repartition(64).persist()
n = pages.count()

from dpr_spark.index.build import prepare_docs, doc_terms, build_index, impact_expr, _encode_blocks, IndexStats
from dpr_spark.plans.ids import assign_dense_ids

def phases():
    out = {{}}
    par = spark.sparkContext.defaultParallelism
    t0 = time.perf_counter()
    cleanup = []
    docs = prepare_docs(pages, cleanup=cleanup, range_partitions=3 * par)
    docs.count()  # materializes the ranked-parts cache
    out["ids_docs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    tf = doc_terms(docs).persist()
    tf.count()
    out["tokenize_tf"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    df_by_term = tf.groupBy("term").agg(F.count("*").alias("df"), F.sum("tf").alias("ttf"))
    ranked = assign_dense_ids(df_by_term, "term", "term_id", cleanup=cleanup)
    sum_dl = ranked.agg(F.sum("ttf")).collect()[0][0]
    out["dictionary"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_docs = docs.count()
    stats = IndexStats(n_docs, float(sum_dl) / n_docs)
    dictionary = ranked.withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    ).select("term", "term_id", "df", "idf")
    postings = tf.join(F.broadcast(dictionary.select("term", "term_id", "idf")), "term").select(
        "term_id", "doc_id", "tf", "doclen", "idf")
    blocks = _encode_blocks(postings, stats.avgdl, 1.2, 0.75, num_partitions=2 * par)
    blocks.write.format("noop").mode("overwrite").save()
    out["encode_blocks"] = time.perf_counter() - t0

    for c in cleanup + [tf, docs]:
        try: c.unpersist()
        except Exception: pass
    return out

p1 = phases()  # warm
results = [phases() for _ in range({reps})]
best = {{k: min(r[k] for r in results) for k in results[0]}}
best["total"] = sum(best.values())
print("RESULT " + json.dumps({{"cores": cores, "docs": n, "phases": {{k: round(v, 2) for k, v in best.items()}}}}))
spark.stop()
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--levels", type=int, nargs="+", default=[4, 16])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    cache = os.path.join(HERE, ".bench_cache")
    pages = os.path.join(cache, f"pages_{args.docs}.parquet")
    if not os.path.exists(pages):
        os.makedirs(cache, exist_ok=True)
        sys.path.insert(0, HERE)
        from dpr_spark.fixtures.corpus import write_pages_parquet

        write_pages_parquet(pages, args.docs, seed=42)

    for cores in args.levels:
        job = _JOB.format(here=HERE, cores=cores, pages=pages, reps=args.reps)
        out = subprocess.run([sys.executable, "-c", job], capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[7:])
                break
        else:
            print(f"cores={cores} FAILED", file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)


if __name__ == "__main__":
    main()
