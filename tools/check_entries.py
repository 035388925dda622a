"""Driver-gate rehearsal for a subset of entries: run the Spark query
and the DuckDB twin side-by-side at a given sf dir and compare sorted
rows (the same contract tests/test_entry.py sweeps in full).

Usage: python tools/check_entries.py [sf_dir] name [name ...]
       python tools/check_entries.py [sf_dir] --all     # every entry
"""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main():
    args = sys.argv[1:]
    sf = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.001"
    from dpr_spark.session import get_spark
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    if args == ["--all"]:
        args = sorted(q)
    spark = get_spark("check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        except Exception:
            pass
    failed = []
    for name in args:
        try:
            df = q[name](spark, sf)
            sp = df.toPandas()
            op = con.execute(o[name]).fetchdf()
            cols = sorted(sp.columns)
            assert cols == sorted(op.columns), (cols, sorted(op.columns))
            # exact after %.6f formatting — the driver's value-hash bar
            # (assert_frame_equal's default rtol once passed a last-digit
            # rounding split the driver would flag)
            for c in cols:
                if sp[c].dtype.kind == "f" or op[c].dtype.kind == "f":
                    for frame in (sp, op):
                        frame[c] = frame[c].astype(float).map(lambda x: f"{x:.6f}")
            sp = sp[cols].astype(str).sort_values(cols).reset_index(drop=True)
            op = op[cols].astype(str).sort_values(cols).reset_index(drop=True)
            pd.testing.assert_frame_equal(sp, op, check_dtype=False)
            print(f"{name}: OK ({len(sp)} rows)")
        except Exception as ex:
            failed.append(name)
            print(f"{name}: FAIL {type(ex).__name__}: {str(ex)[:400]}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
