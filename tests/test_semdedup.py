"""SemDeDup (extras/dedup.py::semdedup) vs a pure-Python twin:
cluster-confined semantic near-dedup with the keep-lowest-id rule;
planted clones (exact and scaled copies) must drop, near-misses must
survive."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sem_fixture():
    rng = np.random.default_rng(11)
    base = rng.normal(size=(60, 16))
    rows = [(i, base[i]) for i in range(60)]
    # scaled clones of every 7th vector: cosine exactly 1
    clones = [(1000 + i, 2.0 * base[i]) for i in range(0, 60, 7)]
    # near-misses: heavy jitter, cosine well under tau
    misses = [(2000 + i, base[i] + rng.normal(size=16) * 2.0) for i in range(0, 60, 13)]
    all_rows = rows + clones + misses
    all_rows.sort(key=lambda t: t[0])
    return all_rows


def _twin(rows, centroids, tau=0.95, decimals=6):
    ids = np.array([i for i, _ in rows])
    V = np.stack([v for _, v in rows]).astype(np.float64)
    C = np.asarray(centroids, np.float64)
    vn = np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    cn = np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(np.round((V @ C.T) / (vn * cn.T), decimals), axis=1)
    out = {}
    for j in range(len(ids)):
        dup_of = -1
        for i in range(len(ids)):
            if ids[i] >= ids[j] or assign[i] != assign[j]:
                continue
            cos = float(V[i] @ V[j] / (np.linalg.norm(V[i]) * np.linalg.norm(V[j])))
            if round(cos, decimals) >= tau:
                dup_of = int(ids[i])
                break  # ids scanned ascending -> first hit is the min
        out[int(ids[j])] = (int(assign[j]), dup_of == -1, dup_of)
    return out


def test_semdedup_matches_twin(spark, sem_fixture):
    from dpr_spark.extras.dedup import semdedup

    centroids = np.stack([v for _, v in sem_fixture[:6]])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sem_fixture],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.id: (r.cluster, r.keep, r.dup_of)
        for r in semdedup(df, centroids, tau=0.95).collect()
    }
    want = _twin(sem_fixture, centroids)
    assert got == want


def test_clones_drop_near_misses_survive(spark, sem_fixture):
    from dpr_spark.extras.dedup import semdedup

    centroids = np.stack([v for _, v in sem_fixture[:6]])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sem_fixture],
        "vec_id long, embedding array<double>",
    )
    rows = {r.id: r for r in semdedup(df, centroids, tau=0.95).collect()}
    for i in range(0, 60, 7):
        assert not rows[1000 + i].keep, f"clone of {i} survived"
        assert rows[1000 + i].dup_of == i
    for i in range(0, 60, 13):
        assert rows[2000 + i].keep, f"near-miss {i} wrongly dropped"
