"""Per-phase profiler for the CURRENT build hot path (build_index's
fused ranged_parts -> doc_terms_from_parts -> _finish_index), used to
locate the non-scaling residual between parallelism levels.

    python tools/profile_build_phases.py <cores> [docs=400000] [reps=2]

Prints one PHASES json per rep (first rep is the cold/warmup one).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1])
docs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

from pyspark.sql import functions as F

from dpr_spark.session import get_spark

spark = get_spark("phase_profile", master=f"local[{cores}]",
                  shuffle_partitions=max(8, cores))
pages = (
    spark.read.parquet(f"/root/repo/.bench_cache/pages_{docs_n}.parquet")
    .repartition(64)
    .persist()
)
pages.count()

from dpr_spark.index.build import IndexStats, _encode_blocks, doc_terms_from_parts
from dpr_spark.plans.ids import assign_dense_ids, ranged_parts


def run_once():
    tm = {}

    def t(name, fn):
        t0 = time.perf_counter()
        r = fn()
        tm[name] = round(time.perf_counter() - t0, 2)
        return r

    par = spark.sparkContext.defaultParallelism
    cleanup = []
    parts, bc, n_docs = t(
        "1_ranged_parts(persist+range_shuffle+counts)",
        lambda: ranged_parts(pages.select("url", "text"), "url", 3 * par, cleanup),
    )
    tf = doc_terms_from_parts(parts, bc).persist()
    t("2_tokenize_tf_kernel(count)", lambda: tf.count())
    df_by_term = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("ttf")
    )
    ranked = t(
        "3_df_agg+term_rank",
        lambda: assign_dense_ids(df_by_term, "term", "term_id", cleanup=cleanup),
    )
    srow = t("4_scalar_stats", lambda: ranked.agg(F.sum("ttf"), F.max("df")).collect()[0])
    stats = IndexStats(n_docs, float(srow[0]) / n_docs)
    dictionary = ranked.withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
    ).select("term", "term_id", "df", "idf")
    postings = tf.join(
        F.broadcast(dictionary.select("term", "term_id", "idf")), "term"
    ).select("term_id", "doc_id", "tf", "doclen", "idf")
    blocks = _encode_blocks(postings, stats.avgdl, 1.2, 0.75, num_partitions=2 * par)
    t("5_blocks(join+hashpart+encode)",
      lambda: blocks.write.format("noop").mode("overwrite").save())
    t("6_unpersist", lambda: [tf.unpersist(True)] + [d.unpersist(True) for d in cleanup])
    tm["total"] = round(sum(v for k, v in tm.items() if k != "total"), 2)
    return tm


for rep in range(reps):
    tm = run_once()
    print(f"PHASES cores={cores} rep={rep} " + json.dumps(tm), flush=True)
spark.stop()
