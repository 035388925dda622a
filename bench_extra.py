#!/usr/bin/env python
"""Extra benchmarks for optimization work (bench.py is FROZEN for the
driver's measurement; this file is where noop-sink isolation per
spark_optimization_guide.md §1.4 lives).

    python bench_extra.py [--reps N] [--plans DIR] [entry ...]

Times each named entry (default: every entry in all_entries()) with the
noop sink, and records the number of Spark jobs each entry ran (job
groups via setJobGroup) — the per-entry fixed-cost driver on local[32]
at sf0.1 scale is job count, not data volume. With --plans DIR, also
writes `<entry>.txt` with the .explain("formatted") plan.

Prints one JSON line: {"entries": {name: {"sec": w, "jobs": n}}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--plans", default=None, help="dir for explain('formatted') dumps")
    args = ap.parse_args()

    from dpr_spark.engine_queries import all_entries
    from dpr_spark.session import get_spark

    spark = get_spark(
        "dpr_spark_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, int(CPUS)),
    )
    sc = spark.sparkContext
    entries = all_entries()
    names = args.entries or list(entries)

    # warm the session like bench.py does
    from dpr_spark.engine_queries import _tokenized

    _tokenized(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    out: dict = {}
    for name in names:
        if name not in entries:
            print(f"unknown entry {name}", file=sys.stderr)
            continue
        fn, _sql = entries[name]
        best, jobs = None, None
        for rep in range(max(1, args.reps)):
            group = f"{name}#{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                if args.plans and rep == 0:
                    os.makedirs(args.plans, exist_ok=True)
                    with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                        f.write(df._jdf.queryExecution().explainString(
                            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(f"entry {name} failed: {e}", file=sys.stderr)
                out[name] = {"sec": -1.0, "jobs": -1}
                break
            w = time.perf_counter() - t0
            nj = len(sc.statusTracker().getJobIdsForGroup(group))
            if best is None or w < best:
                best, jobs = w, nj
            sc.setJobGroup("idle", "idle")
        else:
            out[name] = {"sec": round(best, 3), "jobs": jobs}
        print(f"{name}: {out[name]}", file=sys.stderr)

    total = sum(v["sec"] for v in out.values() if v["sec"] > 0)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS,
                      "total_sec": round(total, 3), "entries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
