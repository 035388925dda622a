#!/usr/bin/env python
"""Isolated index-build benchmark (noop sink, guide §1.4): times the
50k cold build and N warm 200k builds with a host-noise calibration
before AND after, so a neighbor-noise spike is visible per run.

    python bench_build.py [--reps N] [--docs 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--skip-50k", action="store_true")
    args = ap.parse_args()

    from bench import _host_factor, _pages_parquet
    from dpr_spark.index.build import build_index
    from dpr_spark.session import get_spark

    out: dict = {"hf_start": _host_factor()}
    spark = get_spark("bench_build", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, int(CPUS)))

    def one(path):
        pages = spark.read.parquet(path).repartition(64)
        idx = build_index(spark, pages, build_blocks=True)
        idx.blocks.write.format("noop").mode("overwrite").save()
        idx.unpersist()

    if not args.skip_50k:
        p50 = _pages_parquet(50_000)
        t0 = time.perf_counter()
        pages = spark.read.parquet(p50)
        idx = build_index(spark, pages, build_blocks=True)
        idx.blocks.write.format("noop").mode("overwrite").save()
        out["build_50k_cold_sec"] = round(time.perf_counter() - t0, 3)
        idx.unpersist()

    path = _pages_parquet(args.docs)
    one(path)  # warm
    runs = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        one(path)
        runs.append(round(time.perf_counter() - t0, 3))
    out["build_big_warm_secs"] = runs
    out["docs"] = args.docs
    out["docs_per_sec_best"] = round(args.docs / min(runs), 1)
    out["hf_end"] = _host_factor()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
