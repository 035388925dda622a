#!/usr/bin/env python
"""Index-build entry point (replaces generate_dense_embeddings.py +
faiss index build, SURVEY.md §3.2).

Launch locally or on a cluster:

    spark-submit --py-files dpr_spark.zip build_index.py \\
        --pages /data/pages_parquet --out /data/index \\
        [--lang en] [--verify-extract] [--resumable /data/work --shards 64]

The resumable mode checkpoints per-shard tokenize output with a manifest
(kill it, re-run, only missing shards are processed)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet dir/file of pages")
    ap.add_argument("--out", required=True, help="output index directory")
    ap.add_argument("--lang", default=None)
    ap.add_argument("--verify-extract", action="store_true")
    ap.add_argument("--dedup-latest", action="store_true",
                    help="re-crawl upsert: keep only the newest warc_ts row "
                         "per url before indexing")
    ap.add_argument("--id-strategy", choices=["dense_rank", "hash"],
                    default="dense_rank",
                    help="doc id derivation; 'hash' (xxhash64(url)) is REQUIRED "
                         "for a base index that will serve with a streaming "
                         "delta (query.py --delta-dir) — recorded in stats.json "
                         "and enforced at serve time")
    ap.add_argument("--no-blocks", action="store_true", help="skip compressed blocks")
    ap.add_argument("--positional", action="store_true",
                    help="also build positional postings (term_id, doc_id, tf, "
                         "positions) — the .pos-file analog required by "
                         "query.py --engine phrase")
    ap.add_argument("--segments-buckets", type=int, default=0,
                    help="also materialize doc-bucketed impact segments (0=off)")
    ap.add_argument("--block-buckets", type=int, default=0,
                    help="also materialize doc-bucketed COMPRESSED block segments "
                         "+ norms for the blockmax engine (0=off)")
    ap.add_argument("--analyzer", choices=["none", "english-s", "english-porter"],
                    default="none",
                    help="analysis chain (Lucene EnglishAnalyzer shape): "
                         "lowercase + 33-word stop set + S- or Porter "
                         "stemming; recorded in stats.json — query.py "
                         "automatically analyzes queries with the index's "
                         "chain")
    ap.add_argument("--resumable", default=None, help="workdir for manifest-checkpointed build")
    ap.add_argument("--snapshot-dir", default=None,
                    help="also commit the index tables to an Iceberg-style "
                         "snapshot catalog (versioned; query.py can time-travel)")
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from dpr_spark.session import get_spark

    spark = get_spark("dpr_spark_build", master=args.master)
    t0 = time.perf_counter()
    pages = spark.read.parquet(args.pages)

    from dpr_spark.functions.analysis import ENGLISH_PORTER, ENGLISH_S

    analyzer = {"none": None, "english-s": ENGLISH_S,
                "english-porter": ENGLISH_PORTER}[args.analyzer]
    if args.resumable:
        if analyzer is not None:
            ap.error("--analyzer is not supported with --resumable yet")
        if args.dedup_latest:
            ap.error("--dedup-latest is not supported with --resumable yet: "
                     "dedup the pages table first (plans/latest.py latest_by_key)")
        if args.id_strategy != "dense_rank":
            ap.error("--id-strategy hash is not supported with --resumable "
                     "(shard manifests assume dense ids); build without "
                     "--resumable for an NRT-capable base")
        if args.positional:
            ap.error("--positional is not supported with --resumable yet; "
                     "build without --resumable for a phrase-capable index")
        from dpr_spark.index.manifest import ResumableIndexBuilder

        b = ResumableIndexBuilder(spark, args.resumable, n_shards=args.shards, lang=args.lang)
        done = b.run_shards(pages)
        print(f"shards processed this run: {done}")
        idx = b.assemble(pages, build_blocks=not args.no_blocks)
    else:
        from dpr_spark.index.build import build_index

        idx = build_index(
            spark,
            pages,
            lang=args.lang,
            build_blocks=not args.no_blocks,
            verify_extract=args.verify_extract,
            dedup_latest=args.dedup_latest,
            id_strategy=args.id_strategy,
            build_positional=args.positional,
            analyzer=analyzer,
        )
    idx.save(args.out)
    if args.snapshot_dir:
        from dpr_spark.index.snapshots import SnapshotCatalog, snapshot_index

        sid = snapshot_index(SnapshotCatalog(spark, args.snapshot_dir), idx)
        print(f"committed snapshot {sid} -> {args.snapshot_dir}")
    if args.segments_buckets:
        from dpr_spark.query.wand import build_impact_segments

        seg = build_impact_segments(idx, num_buckets=args.segments_buckets)
        seg.write.mode("overwrite").parquet(os.path.join(args.out, "segments"))
    if args.block_buckets:
        from dpr_spark.query.blockmax import build_block_segments, save_serving_layout

        blocks, norms = build_block_segments(idx, num_buckets=args.block_buckets)
        # bucketed+sorted at-rest layout: a from-storage query cogroups on
        # bucket with no exchange and prunes row groups by term_id
        save_serving_layout(spark, blocks, norms, args.out, args.block_buckets)
    wall = time.perf_counter() - t0
    n = idx.stats.n_docs
    print(
        f"built index: {n} docs, avgdl {idx.stats.avgdl:.2f}, "
        f"{wall:.1f}s, {n / wall:.1f} docs/s -> {args.out}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
