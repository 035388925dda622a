#!/usr/bin/env python
"""Streaming entry point (spark-submit surface for the Structured
Streaming operators — the live-crawl side of the engine):

    spark-submit --py-files dpr_spark.zip stream.py \\
        --mode refresh|dedup|neardup|cdc|rate|trending \\
        --src /data/incoming --out /data/stream_out \\
        [--once | --timeout SEC] [--watermark "2 minutes"] \\
        [--window "1 minute"] [--threshold 0.5] [--positional]

Modes:
  refresh   incremental index delta (+ compaction) — StreamingIndexRefresher
  dedup     exact streaming dedup (first copy per content digest)
  neardup   MinHash-LSH streaming near-dup
  cdc       per-url content-change feed (crawlstats.content_change_stream)
  rate      watermarked windowed crawl-rate aggregation
  trending  windowed term-frequency tracking (exact n_occ, HLL n_docs)

--src is a directory of page files (parquet with url/warc_ts/text[,
html, lang] columns). --once runs a Trigger.AvailableNow pass (drain
what's there, checkpoint, exit — cron-able); otherwise the stream runs
until --timeout or a STOP file appears in --src.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PAGES_DDL = (
    "url string, warc_ts timestamp, text string"
)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["refresh", "dedup", "neardup", "cdc", "rate",
                             "trending"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--once", action="store_true",
                    help="Trigger.AvailableNow: drain, checkpoint, exit")
    ap.add_argument("--timeout", type=float, default=None)
    ap.add_argument("--watermark", default="2 minutes")
    ap.add_argument("--window", default="1 minute")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="neardup est-jaccard threshold")
    ap.add_argument("--positional", action="store_true",
                    help="refresh: maintain the positional delta too")
    ap.add_argument("--group-col", default="source",
                    help="rate: grouping column (must exist in --src)")
    args = ap.parse_args(argv)

    from pyspark.sql.types import StructType

    from dpr_spark.session import get_spark

    spark = get_spark(f"dpr_spark_stream_{args.mode}")
    schema = StructType.fromDDL(PAGES_DDL)
    if args.mode == "rate" and args.group_col not in [
        f.split()[0] for f in PAGES_DDL.split(", ")
    ]:
        schema = StructType.fromDDL(
            PAGES_DDL + f", {args.group_col} string"
        )

    ckpt = os.path.join(args.out, "_checkpoint")

    if args.mode in ("refresh", "dedup", "neardup"):
        if args.mode == "refresh":
            from dpr_spark.streaming.refresh import StreamingIndexRefresher

            op = StreamingIndexRefresher(
                spark, args.out, positional=args.positional
            )
        elif args.mode == "dedup":
            from dpr_spark.streaming.dedup import StreamingDeduper

            op = StreamingDeduper(spark, args.out)
        else:
            from dpr_spark.streaming.neardup import StreamingNearDeduper

            op = StreamingNearDeduper(
                spark, args.out, threshold=args.threshold
            )
        q = op.start(args.src, schema, checkpoint=ckpt)
    else:
        src = spark.readStream.schema(schema).parquet(args.src)
        if args.mode == "cdc":
            from dpr_spark.streaming.crawlstats import content_change_stream

            df = content_change_stream(src, watermark=args.watermark)
        elif args.mode == "rate":
            from dpr_spark.streaming.crawlstats import crawl_rate_stream

            df = crawl_rate_stream(
                src, window=args.window, watermark=args.watermark,
                group_col=args.group_col,
            )
        else:
            from dpr_spark.streaming.trending import trending_terms_stream

            df = trending_terms_stream(
                src, window=args.window, watermark=args.watermark
            )
        writer = (
            df.writeStream.format("parquet")
            .option("path", os.path.join(args.out, "data"))
            .option("checkpointLocation", ckpt)
        )
        if args.once:
            writer = writer.trigger(availableNow=True)
        q = writer.start()

    if args.once:
        q.awaitTermination()
        print(f"[{args.mode}] drained available input -> {args.out}")
        return
    import time

    t0 = time.time()
    stop_file = os.path.join(args.src, "STOP")
    while q.isActive:
        if os.path.exists(stop_file):
            q.stop()
            break
        if args.timeout is not None and time.time() - t0 > args.timeout:
            q.stop()
            break
        q.awaitTermination(2)
    print(f"[{args.mode}] stream stopped -> {args.out}")


if __name__ == "__main__":
    main()
