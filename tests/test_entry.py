"""Replicates the driver's correctness gate: run each __spark_entry__
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same sf0.01 parquet tables; compare row count, schema width and
order-insensitive values (columns sorted by name, rows sorted)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_entry_has_oracle():
    # the driver records a weaker rows-only check for twinless entries;
    # the repo's contract is a DuckDB twin for EVERY entry
    assert set(ORACLES) == set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check, like the driver
        return
    res = duck.execute(ORACLES[name])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    sc, sn = _normalize(srows, scols)
    dc, dn = _normalize(drows, dcols)
    assert sc == dc, f"{name}: column names differ: {sc} vs {dc}"
    assert len(sn) == len(dn), f"{name}: row count {len(sn)} vs {len(dn)}"
    mismatches = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sn[mismatches[0]]} duck={dn[mismatches[0]]}"
    )
