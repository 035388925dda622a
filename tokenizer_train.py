#!/usr/bin/env python
"""BPE tokenizer-training entry point (extras/bpe.py; SURVEY.md W107) —
the corpus-scale subword learner a training-data pipeline runs before
tensorization.

Launch locally or on a cluster:

    spark-submit --py-files dpr_spark.zip tokenizer_train.py \\
        --pages /data/pages_parquet --out /data/bpe \\
        [--merges 1000] [--min-pair-count 2] [--encode /data/encoded]

Writes `<out>/merges.parquet` (step, left, right, pair_count — merge
order IS the rank) and `<out>/vocab.parquet` (symbol, kind). With
--encode, also applies the learned merges to the corpus in one
Arrow-batched pass and writes (doc_id, subwords, n_subwords)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet dir/file of pages")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--merges", type=int, default=1000)
    ap.add_argument("--min-pair-count", type=int, default=1,
                    help="stop early when the best pair's corpus count "
                         "drops below this")
    ap.add_argument("--encode", default=None,
                    help="also BPE-encode the corpus and write "
                         "(doc_id, subwords, n_subwords) parquet here")
    ap.add_argument("--resumable", default=None,
                    help="workdir for checkpointed training: kill it, "
                         "re-run, it resumes from the newest symbol-table "
                         "checkpoint; re-run with a larger --merges to "
                         "EXTEND the vocabulary without retraining")
    ap.add_argument("--checkpoint-every", type=int, default=20)
    ap.add_argument("--id-col", default="url",
                    help="column to carry as doc_id in --encode output")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dpr_spark.extras.bpe import (
        END,
        bpe_encode,
        bpe_train,
        bpe_train_resumable,
        word_counts,
    )
    from dpr_spark.session import get_spark

    spark = get_spark("dpr_spark_bpe", master=args.master)
    pages = spark.read.parquet(args.pages)

    t0 = time.perf_counter()
    wc = word_counts(pages).persist()
    n_words = wc.count()
    t_wc = time.perf_counter() - t0
    t0 = time.perf_counter()
    if args.resumable:
        merges = bpe_train_resumable(
            spark, wc, args.resumable, num_merges=args.merges,
            min_pair_count=args.min_pair_count,
            checkpoint_every=args.checkpoint_every,
        )
    else:
        merges = bpe_train(
            spark, wc, num_merges=args.merges,
            min_pair_count=args.min_pair_count,
        )
    t_train = time.perf_counter() - t0

    mdf = spark.createDataFrame(
        merges, "step int, left string, right string, pair_count long"
    )
    mdf.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.out, "merges.parquet")
    )
    # vocabulary = base symbols (chars seen in the corpus + the
    # end-of-word marker) + one merged symbol per step
    base = (
        wc.select(F.explode(F.split("word", "")).alias("symbol"))
        .distinct()
        .withColumn("kind", F.lit("char"))
    )
    merged = mdf.select(
        F.concat("left", "right").alias("symbol"), F.lit("merge").alias("kind")
    )
    eow = spark.createDataFrame([(END, "marker")], "symbol string, kind string")
    base.unionByName(merged).unionByName(eow).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(args.out, "vocab.parquet"))
    wc.unpersist()
    print(
        f"words={n_words} merges={len(merges)} "
        f"word_counts={t_wc:.1f}s train={t_train:.1f}s -> {args.out}"
    )

    if args.encode:
        t0 = time.perf_counter()
        enc = bpe_encode(
            pages.withColumn("doc_id", F.col(args.id_col)), merges
        )
        enc.write.mode("overwrite").parquet(args.encode)
        print(f"encoded corpus in {time.perf_counter() - t0:.1f}s -> {args.encode}")


if __name__ == "__main__":
    main()
