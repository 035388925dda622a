"""Late-interaction MaxSim multi-vector scoring (extras/ann.py) vs a
numpy twin: Σ per-query-token max-over-chunk cosine, group ranking."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dpr_spark.extras.ann import multivector_maxsim_topk


@pytest.fixture(scope="module")
def grouped_vecs(spark):
    rng = np.random.RandomState(5)
    m = rng.rand(40, 16) - 0.5
    groups = [i % 8 for i in range(40)]
    rows = [(i, groups[i], [float(x) for x in m[i]]) for i in range(40)]
    return m, groups, spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_maxsim_matches_numpy(spark, grouped_vecs):
    m, groups, df = grouped_vecs
    # 2 queries x 2 tokens: vecs 0..3
    q = df.filter(F.col("vec_id") < 4).select(
        F.floor(F.col("vec_id") / 2).cast("long").alias("qid"),
        F.pmod(F.col("vec_id"), F.lit(2)).cast("long").alias("qtok"),
        F.col("embedding").alias("qv"),
    )
    got = {
        (r.qid, r.rank): (r.group, r.score_r)
        for r in multivector_maxsim_topk(df, q, k=3, qtok_col="qtok").collect()
    }
    for qid in (0, 1):
        toks = [m[2 * qid], m[2 * qid + 1]]
        scores = []
        for g in sorted(set(groups)):
            chunk = [m[i] for i in range(40) if groups[i] == g]
            s = sum(max(_cos(t, c) for c in chunk) for t in toks)
            scores.append((round(s, 6), -g))
        scores.sort(reverse=True)
        for rank, (s, negg) in enumerate(scores[:3], start=1):
            grp, sr = got[(qid, rank)]
            assert grp == -negg
            assert sr == pytest.approx(s, abs=2e-6)


def test_maxsim_single_vector_is_max_pooling(spark, grouped_vecs):
    m, groups, df = grouped_vecs
    q = df.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("qid"), F.col("embedding").alias("qv")
    )
    got = multivector_maxsim_topk(df, q, k=1).collect()[0]
    # vec 0 belongs to group 0: its self-cosine 1.0 dominates
    assert got.group == 0
    assert got.score_r == pytest.approx(1.0, abs=1e-6)
