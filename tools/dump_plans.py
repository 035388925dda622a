#!/usr/bin/env python
"""Dump .explain('formatted') for named entries WITHOUT executing them
(plan-only; for the judge's plans/r06/ evidence files).

    python tools/dump_plans.py OUTDIR [--suffix _after] entry [entry ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from dpr_spark.engine_queries import all_entries
    from dpr_spark.session import get_spark

    spark = get_spark(
        "dump_plans", master=f"local[{CPUS}]", shuffle_partitions=max(8, int(CPUS))
    )
    entries = all_entries()
    os.makedirs(args.outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in args.entries:
        if name not in entries:
            print(f"unknown entry {name}", file=sys.stderr)
            continue
        fn, _sql = entries[name]
        try:
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:
            txt = f"PLAN DUMP FAILED: {e}"
        with open(os.path.join(args.outdir, f"{name}{args.suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
