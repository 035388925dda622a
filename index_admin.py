#!/usr/bin/env python
"""Index lifecycle admin — the spark-submit ops surface for everything
that happens to an index AFTER it is built (ES _shrink/_split + Lucene
CheckIndex analogs over this engine's layouts):

    spark-submit --py-files dpr_spark.zip index_admin.py check \\
        --index /data/index
    spark-submit --py-files dpr_spark.zip index_admin.py build-layout \\
        --pages /data/pages --out /data/layout --routing-col source \\
        --buckets 16
    spark-submit --py-files dpr_spark.zip index_admin.py shrink \\
        --src /data/layout --out /data/layout4 --buckets 4
    spark-submit --py-files dpr_spark.zip index_admin.py split \\
        --src /data/layout --out /data/layout64 --buckets 64
    spark-submit --py-files dpr_spark.zip index_admin.py check-layout \\
        --src /data/layout4

`check` / `check-layout` exit nonzero when any integrity invariant is
violated (the gate a serving alias swap runs behind); `shrink` / `split`
run check-layout on their output by default (--no-verify skips).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _print_report(rows) -> int:
    bad = 0
    for check, violations, detail in rows:
        flag = "OK " if violations == 0 else "BAD"
        print(f"{flag} {check}: violations={violations} ({detail})")
        bad += violations
    return bad


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("check", help="CheckIndex over a saved index")
    p.add_argument("--index", required=True)

    p = sub.add_parser("build-layout", help="build the routed posting layout")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--routing-col", required=True)
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--routing-shards", type=int, default=1024)
    p.add_argument("--portable", action="store_true")

    for name in ("shrink", "split"):
        p = sub.add_parser(name, help=f"ES _{name} over a routed layout")
        p.add_argument("--src", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--buckets", type=int, required=True)
        p.add_argument("--no-verify", action="store_true")

    p = sub.add_parser("check-layout", help="CheckIndex over a routed layout")
    p.add_argument("--src", required=True)

    args = ap.parse_args(argv)

    from dpr_spark.session import get_spark

    spark = get_spark("dpr_spark_admin", master=args.master)
    t0 = time.perf_counter()

    if args.cmd == "check":
        from dpr_spark.index.build import InvertedIndex
        from dpr_spark.index.check import check_index

        idx = InvertedIndex.load(spark, args.index)
        bad = _print_report(check_index(spark, idx))
        print(f"checked index in {time.perf_counter() - t0:.1f}s")
        sys.exit(1 if bad else 0)

    if args.cmd == "build-layout":
        from dpr_spark.query.routing import build_routed_layout

        pages = spark.read.parquet(args.pages)
        build_routed_layout(
            spark, pages, args.routing_col, args.out,
            num_buckets=args.buckets,
            num_routing_shards=args.routing_shards,
            portable=args.portable,
        )
        print(
            f"built layout: {args.buckets} buckets at {args.out} "
            f"in {time.perf_counter() - t0:.1f}s"
        )
        return

    if args.cmd in ("shrink", "split"):
        from dpr_spark.index.check import check_layout
        from dpr_spark.index.resize import shrink_layout, split_layout

        fn = shrink_layout if args.cmd == "shrink" else split_layout
        meta = fn(spark, args.src, args.out, args.buckets)
        print(
            f"{args.cmd}: {args.src} -> {args.out} "
            f"({meta['num_buckets']} buckets) in {time.perf_counter() - t0:.1f}s"
        )
        if not args.no_verify:
            bad = _print_report(check_layout(spark, args.out))
            sys.exit(1 if bad else 0)
        return

    if args.cmd == "check-layout":
        from dpr_spark.index.check import check_layout

        bad = _print_report(check_layout(spark, args.src))
        print(f"checked layout in {time.perf_counter() - t0:.1f}s")
        sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
