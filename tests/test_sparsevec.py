"""Learned-sparse retrieval (query/sparsevec.py) vs a numpy twin, plus
the no-crossJoin plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dpr_spark.query.sparsevec import sparse_vector_search, sparsify


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(11)
    m = rng.rand(60, 32) - 0.5
    rows = [(i, [float(x) for x in m[i]]) for i in range(60)]
    return m, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _numpy_sparsify(m, top_m):
    out = {}
    for i, v in enumerate(m):
        pairs = [(float(w), d) for d, w in enumerate(v) if w > 0]
        # engine order: (weight, dim) lexicographic DESC
        pairs.sort(reverse=True)
        out[i] = {d: round(w, 6) for w, d in pairs[:top_m]}
    return out


def test_sparsify_matches_numpy(spark, vecs):
    m, df = vecs
    got = {}
    for r in sparsify(df, top_m=8).collect():
        got.setdefault(r.vec_id, {})[r.dim] = r.weight
    assert got == _numpy_sparsify(m, 8)


def test_sparse_search_matches_numpy(spark, vecs):
    m, df = vecs
    sp = sparsify(df, top_m=8)
    q = sp.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "dim", "weight"
    )
    got = {
        (r.qid, r.rank): (r.vec_id, r.score_r)
        for r in sparse_vector_search(q, sp, k=5).collect()
    }
    sparse = _numpy_sparsify(m, 8)
    for qid in range(3):
        scores = []
        for did, dv in sparse.items():
            s = sum(w * dv[d] for d, w in sparse[qid].items() if d in dv)
            if s:
                scores.append((round(s, 6), -did))
        scores.sort(reverse=True)
        for rank, (s, negd) in enumerate(scores[:5], start=1):
            assert got[(qid, rank)] == (-negd, pytest.approx(s))
    # self-match is always rank 1 (it shares every dim with itself)
    assert got[(0, 1)][0] == 0


def test_sparse_search_plan_has_no_cartesian(spark, vecs):
    _, df = vecs
    sp = sparsify(df, top_m=8)
    q = sp.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "dim", "weight"
    )
    plan = sparse_vector_search(q, sp, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan
