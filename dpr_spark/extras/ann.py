"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k as the exact baseline, and LSH-bucketed /
IVF-style variants as the scale path (SURVEY.md M1/M2 analogs — the
reference's search_knn is exact dot-product over an in-RAM matrix,
`/root/reference/dpr/indexer/faiss_indexers.py:107-112`; its HNSW option
`:118-232` is the approximate analog).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a, b):
    """Exact cosine as pure column math (JVM-side, codegen): ordered
    left-to-right float64 fold — deterministic."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    filter_expr=None,
) -> DataFrame:
    """Exact top-k: broadcast queries x scan embeddings; ties by id.
    At scale this is one pass over the corpus (queries broadcast), the
    same shape FAISS Flat gives the reference.

    filter_expr: optional Catalyst predicate over `emb`'s columns — the
    ES `knn.filter` contract (PRE-filter: all k results satisfy it, vs
    post-filtering which can return < k). Applied before the projection
    so Catalyst pushes it into the parquet scan (asserted in
    tests/test_plans.py)."""
    if filter_expr is not None:
        emb = emb.filter(filter_expr)
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.transform(qvec_col, lambda x: x.cast("double")).alias("qv"),
    )
    pairs = F.broadcast(q).crossJoin(e).select(
        "qid", "vec_id", cosine_expr(F.col("qv"), F.col("v")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cosine")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def add_hyperplane_bucket(
    df: DataFrame, vec_col: str, num_planes: int = 16, seed: int = 42, dim: int | None = None
) -> DataFrame:
    """Append a deterministic random-hyperplane LSH bucket id: bit i =
    sign(v . h_i). Pure column math over literal plane arrays (seeded) —
    no UDF, no shuffle."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long"))
    return df.withColumn("bucket", bucket)


def lsh_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    seed: int = 42,
    rank_round: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = vectors whose hyperplane bucket is
    within `probe_hamming` bits of the query's bucket (multi-probe),
    exact cosine re-rank inside. Recall/cost dial = num_planes x probes.
    This is the IVF/LSH scale path: the corpus is scanned once to bucket
    (or pre-bucketed at write time), queries touch only nearby buckets.
    `rank_round` ranks by the cosine ROUNDED to that many decimals (ties
    by vec_id) so rank order is replayable across engines that differ in
    the last ulp."""
    dim = len(emb.select(vec_col).first()[0])
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    e = add_hyperplane_bucket(e, "v", num_planes, seed, dim)
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.transform(qvec_col, lambda x: x.cast("double")).alias("qv"),
    )
    q = add_hyperplane_bucket(q, "qv", num_planes, seed, dim).withColumnRenamed(
        "bucket", "qbucket"
    )
    # multi-probe: query bucket + all buckets at hamming distance <= h
    probes = [0]
    if probe_hamming >= 1:
        probes += [1 << i for i in range(num_planes)]
    if probe_hamming >= 2:
        probes += [
            (1 << i) | (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    q = q.withColumn(
        "bucket", F.explode(F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in probes]))
    )
    cand = F.broadcast(q).join(e, "bucket").select(
        "qid", "vec_id", cosine_expr(F.col("qv"), F.col("v")).alias("cosine")
    ).dropDuplicates(["qid", "vec_id"])
    sort_score = (
        F.round("cosine", rank_round) if rank_round is not None else F.col("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(sort_score), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path.
#
# FAISS IVF (the reference's at-scale option next to Flat/HNSW,
# /root/reference/dpr/indexer/faiss_indexers.py) partitions the corpus
# into nlist Voronoi cells around centroid vectors; a query probes only
# the nprobe nearest cells and re-ranks exactly inside them. Spark-first
# shape: centroids are TINY (nlist x dim floats) and live on the driver /
# in a broadcast closure; cell assignment is one Arrow-batched pass over
# the corpus (pandas_udf, no shuffle); the query->cell probe list is the
# same kernel over the (small) query set; candidate selection is a
# broadcast equi-join on list_id — the corpus is never cross-joined.
# At 100 TB the assignment is written once at index time (a column in the
# embeddings table, partition/bucket by list_id) and queries touch only
# the probed buckets' files.
# ---------------------------------------------------------------------------


def sampled_centroids(emb: DataFrame, nlist: int, id_col: str = "vec_id",
                      vec_col: str = "embedding", sample_mod: int | None = None) -> np.ndarray:
    """Deterministic coarse quantizer without training: every
    (max_id+1)//nlist-th vector by id is a centroid (IVF-flat with
    sampled centroids — iters=0). Replayable in plain SQL, which the
    driver's DuckDB oracle does."""
    if sample_mod is None:
        max_id = emb.agg(F.max(id_col)).first()[0]
        sample_mod = max(1, (int(max_id) + 1) // nlist)
    rows = (
        emb.filter((F.col(id_col) % sample_mod == 0) & (F.col(id_col) / sample_mod < nlist))
        .select(id_col, vec_col).collect()
    )
    rows.sort(key=lambda r: r[0])
    return np.array([r[1] for r in rows], dtype=np.float64)


def train_centroids(emb: DataFrame, nlist: int, iters: int = 5, seed: int = 42,
                    sample_n: int = 100_000, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means on a bounded sample (driver-side numpy — the
    standard IVF training shape: FAISS also trains its quantizer on a
    sample, then assigns the full corpus distributed). The sample is
    capped at sample_n rows so driver memory is bounded regardless of
    corpus size; assignment of the FULL corpus happens in ivf_assign."""
    n = emb.count()
    frac = min(1.0, sample_n / max(n, 1))
    sample = emb.sample(fraction=frac, seed=seed) if frac < 1.0 else emb
    x = np.array([r[0] for r in sample.select(vec_col).collect()], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=nlist, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(nlist):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _cosine_matrix(vecs: np.ndarray, cent: np.ndarray, decimals: int = 6) -> np.ndarray:
    """Rounded cosine of every vector against every centroid — rounding
    makes the argmax/top-nprobe selection replayable across engines
    (same protocol as the rank_round ranking everywhere else)."""
    vn = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    cn = np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return np.round((vecs @ cent.T) / (vn * cn.T), decimals)


def ivf_assign(emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding",
               out_col: str = "list_id") -> DataFrame:
    """Assign every vector to its nearest centroid (rounded cosine, ties
    to the lowest centroid id — np.argmax takes the first max). One
    Arrow-batched map pass; the centroid matrix rides in the UDF closure
    (nlist x dim — a few MB even at nlist=65536, well under the 2 GB
    broadcast ceiling)."""
    from pyspark.sql.functions import pandas_udf

    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def best_list(v: pd.Series) -> pd.Series:
        vecs = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(_cosine_matrix(vecs, cent), axis=1).astype(np.int32))

    return emb.withColumn(out_col, best_list(F.col(vec_col)))


def ivf_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    rank_round: int | None = None,
) -> DataFrame:
    """IVF search: corpus rows are assigned to their nearest centroid's
    inverted list; each query probes its nprobe nearest lists and
    re-ranks exactly (Catalyst cosine fold) inside the candidates.
    Candidate selection is list_id equi-join with the (tiny) exploded
    query-probe side broadcast — never a corpus cross-join."""
    from pyspark.sql.functions import pandas_udf

    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    nprobe = min(nprobe, len(cent))

    @pandas_udf("array<int>")
    def probe_lists(v: pd.Series) -> pd.Series:
        vecs = np.stack(v.to_numpy()).astype(np.float64)
        sims = _cosine_matrix(vecs, cent)
        # top-nprobe by (rounded cosine desc, centroid id asc): stable
        # lexsort on (-sim, id); id asc is implicit in stable sort order.
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    e = ivf_assign(
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
        ),
        cent, vec_col="v",
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.transform(qvec_col, lambda x: x.cast("double")).alias("qv"),
    ).withColumn("list_id", F.explode(probe_lists(F.col("qv"))))
    cand = F.broadcast(q).join(e, "list_id").select(
        "qid", "vec_id", cosine_expr(F.col("qv"), F.col("v")).alias("cosine")
    )
    sort_score = (
        F.round("cosine", rank_round) if rank_round is not None else F.col("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(sort_score), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF-PQ — the memory-bound scale path (FAISS IVFPQ analog,
# /root/reference/dpr/indexer/faiss_indexers.py uses the same family).
#
# Product quantization stores each vector as m_sub codes of nbits bits
# (here 8 codes x 4 bits = 4 bytes) instead of dim float32s (256 bytes
# at dim=64) — the 64x compression that lets a 100 TB embedding corpus
# serve from RAM/flash. Search is asymmetric distance computation (ADC):
# the query precomputes a tiny table of sub-dot-products against every
# codeword; a candidate's approximate score is a table-lookup sum over
# its codes — no float vector is ever touched until the exact refine of
# the shortlist. Spark-first shape: codebooks are tiny driver/closure
# arrays; encoding is one Arrow pass at index time (a codes column next
# to list_id — bucket both and queries scan only probed buckets' codes);
# ADC is a pure-Catalyst aggregate over the codes array against a
# broadcast per-query table, so the per-candidate hot loop is JVM
# codegen, not Python. ADC tables are INTEGER micro-units
# (floor(dot*1e6 + 0.5)) — integer sums are order-independent, so the
# fold is bit-exact across engines and the DuckDB twin replays it.
# ---------------------------------------------------------------------------


def sampled_pq_codebooks(
    emb: DataFrame,
    m_sub: int = 8,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> np.ndarray:
    """Deterministic codebooks without training: the 2^nbits sampled
    vectors of sampled_centroids, each split into m_sub subvectors —
    codebook[s][j] = subvector s of sample j. Replayable in plain SQL
    (the driver's DuckDB twin does). Returns (m_sub, 2^nbits, subdim)."""
    ncode = 1 << nbits
    base = sampled_centroids(emb, ncode, id_col, vec_col, sample_mod)
    dim = base.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub
    return np.ascontiguousarray(
        base.reshape(len(base), m_sub, sub).transpose(1, 0, 2)
    )


def train_pq_codebooks(
    emb: DataFrame,
    m_sub: int = 8,
    nbits: int = 8,
    iters: int = 5,
    seed: int = 42,
    sample_n: int = 100_000,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace k-means (FAISS ProductQuantizer training analog) on
    a bounded sample — driver-side numpy like train_centroids; the full
    corpus is encoded distributed in pq_encode."""
    ncode = 1 << nbits
    n = emb.count()
    frac = min(1.0, sample_n / max(n, 1))
    sample = emb.sample(fraction=frac, seed=seed) if frac < 1.0 else emb
    x = np.array([r[0] for r in sample.select(vec_col).collect()], dtype=np.float64)
    dim = x.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, ncode, sub), dtype=np.float64)
    for s in range(m_sub):
        xs = x[:, s * sub : (s + 1) * sub]
        cent = xs[rng.choice(len(xs), size=min(ncode, len(xs)), replace=False)]
        if len(cent) < ncode:  # degenerate tiny sample: pad by repeat
            cent = np.resize(cent, (ncode, sub))
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ncode):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def _micro(x: np.ndarray) -> np.ndarray:
    """floor(x*1e6 + 0.5) — the engine's shared 6dp integerization
    (round-half-up, identical spelling in the DuckDB twins)."""
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """PQ-encode every vector: per subspace, the code minimizing the
    integerized squared L2 distance (expanded form vv - 2·vc + cc in
    micro-units; ties to the lowest code) — one Arrow-batched pass, the
    codebooks ride in the closure (m_sub · 2^nbits · subdim floats)."""
    from pyspark.sql.functions import pandas_udf

    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m_sub, ncode, sub = books.shape

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        vecs = np.stack(v.to_numpy()).astype(np.float64)
        n = len(vecs)
        codes = np.empty((n, m_sub), dtype=np.int32)
        for s in range(m_sub):
            xs = vecs[:, s * sub : (s + 1) * sub]
            vv = np.einsum("ij,ij->i", xs, xs)[:, None]
            vc = xs @ books[s].T
            cc = np.einsum("ij,ij->i", books[s], books[s])[None, :]
            d2 = _micro(vv - 2.0 * vc + cc)
            codes[:, s] = np.argmin(d2, axis=1)  # first min = lowest code
        return pd.Series(list(codes))

    return emb.withColumn(out_col, encode(F.col(vec_col)))


def ivfpq_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    rank_round: int | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search: probe nprobe inverted lists (coarse quantizer),
    ADC-score candidates from their PQ codes alone (integer micro-unit
    table-lookup sum — pure Catalyst codegen over the codes array),
    shortlist `refine` per query, then exact-cosine re-rank the
    shortlist for the final top-k. Only the shortlist's float vectors
    are ever fetched — at rest the scan reads (list_id, codes), the
    compressed 1-4% of the embedding bytes.

    `encoded` short-circuits assignment+encoding with a prebuilt
    (vec_id, v, list_id, codes) table — the at-rest index-time product."""
    from pyspark.sql.functions import pandas_udf

    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m_sub, ncode, sub = books.shape
    nprobe = min(nprobe, len(cent))

    @pandas_udf("array<int>")
    def probe_lists(v: pd.Series) -> pd.Series:
        vecs = np.stack(v.to_numpy()).astype(np.float64)
        sims = _cosine_matrix(vecs, cent)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    @pandas_udf("array<long>")
    def adc_table(v: pd.Series) -> pd.Series:
        """Per query: dtab[s*ncode + j] = micro(dot(q_s, codebook[s][j]))
        — m_sub·2^nbits longs, broadcast-joined onto candidates."""
        vecs = np.stack(v.to_numpy()).astype(np.float64)
        n = len(vecs)
        tabs = np.empty((n, m_sub * ncode), dtype=np.int64)
        for s in range(m_sub):
            qs = vecs[:, s * sub : (s + 1) * sub]
            tabs[:, s * ncode : (s + 1) * ncode] = _micro(qs @ books[s].T)
        return pd.Series(list(tabs))

    if encoded is None:
        base = emb.select(
            F.col(id_col).alias("vec_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
        )
        encoded = pq_encode(ivf_assign(base, cent, vec_col="v"), books, vec_col="v")

    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.transform(qvec_col, lambda x: x.cast("double")).alias("qv"),
    )
    q = q.withColumn("dtab", adc_table(F.col("qv"))).withColumn(
        "list_id", F.explode(probe_lists(F.col("qv")))
    )
    cand = F.broadcast(q).join(encoded, "list_id")
    adc = F.expr(
        f"aggregate(transform(codes, (c, s) -> element_at(dtab, s * {ncode} + c + 1)), "
        f"cast(0 as bigint), (acc, x) -> acc + x)"
    )
    cand = cand.withColumn("adc", adc)
    ws = Window.partitionBy("qid").orderBy(F.desc("adc"), F.asc("vec_id"))
    short = cand.withColumn("_r", F.row_number().over(ws)).filter(
        F.col("_r") <= refine
    )
    exact = short.select(
        "qid", "vec_id", "adc", cosine_expr(F.col("qv"), F.col("v")).alias("cosine")
    )
    sort_score = (
        F.round("cosine", rank_round) if rank_round is not None else F.col("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(sort_score), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cosine", "adc")
    )


def multivector_maxsim_topk(
    emb: DataFrame,
    queries: DataFrame,
    group_col: str = "label",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qtok_col: str = None,
    qvec_col: str = "qv",
) -> DataFrame:
    """(qid, rank, group, score_r): multi-vector document scoring — a
    document is a GROUP of vectors (chunk/passage embeddings of one
    long page) and the score is late-interaction MaxSim:

        score(Q, doc) = Σ_{q ∈ Q's vectors} max_{v ∈ doc's vectors} cos(q, v)

    (the ES 8.x `max_sim` / ColBERT pooling contract). A single-vector
    query (qtok_col=None) degenerates to plain max-pooling — how a RAG
    stack scores a long document from its chunk embeddings without
    losing to single-vector averaging.

    Scale shape: queries broadcast, ONE pass over the corpus vectors
    (same plan as brute_cosine_topk); the MaxSim fold is two map-side-
    combined aggs — max per (qid, qtok, group), then sum per (qid,
    group) — whose shuffles carry |qids|·|qtoks|·|groups| scalar rows,
    never vectors. Rounds to 6dp before ranking; ties break on group
    asc."""
    e = emb.select(
        F.col(group_col).alias("group"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    qtok = F.col(qtok_col) if qtok_col else F.lit(0)
    q = queries.select(
        F.col(qid_col).alias("qid"),
        qtok.alias("qtok"),
        F.transform(qvec_col, lambda x: x.cast("double")).alias("qv"),
    )
    pairs = F.broadcast(q).crossJoin(e).select(
        "qid", "qtok", "group", cosine_expr(F.col("qv"), F.col("v")).alias("c")
    )
    per_tok = pairs.groupBy("qid", "qtok", "group").agg(F.max("c").alias("m"))
    scored = per_tok.groupBy("qid", "group").agg(
        F.round(F.sum("m"), 6).alias("score_r")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("group"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "group", "score_r")
    )


def mmr_rerank(
    cand: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    sim_decimals: int = None,
    micro_lam: tuple = None,
    micro: int = 10**6,
) -> DataFrame:
    """Maximal Marginal Relevance diversified reranking (Carbonell &
    Goldstein 1998; ES/vector-store "diversity" rerankers): from each
    query's candidate set, greedily select k items maximizing
    ``lam * rel - (1 - lam) * max_{s in selected} cos(v, v_s)`` — the
    result list trades raw relevance for novelty, the standard fix for
    near-duplicate-saturated web results that `collapse` (one per key)
    can't express when duplicates share no key.

    cand: (qid, id, rel, v: array<double>) — the per-query candidate
    pool, e.g. a brute/IVF cosine or BM25 top-N. -> (qid, step, id,
    util) with step = selection order (1-based) and util = the MMR
    utility at selection time (step 1's util is lam * rel: the seed is
    the pure-relevance winner, the textbook convention).

    Scale shape: MMR is sequential per query BUT over an already-bounded
    candidate pool (N ≤ a few hundred), so the kernel is one Arrow batch
    per query — grouped applyInPandas, queries partition-parallel,
    pairwise sims an N×N numpy product per group. Nothing corpus-sized
    moves: the expensive part (candidate generation) stays the existing
    distributed top-N plans. sim_decimals rounds rel and pairwise sims
    before the greedy loop so a SQL twin can replay selection exactly.
    Ties break (util desc, id asc) — deterministic.

    For a cross-engine-exact twin use ``micro_lam=(num, den)`` instead
    of sim_decimals: rel and sims become integer micro-units
    (round(x·10^6)) and util = num·rel_i − (den−num)·sim_i — pure BIGINT
    math, immune to the decimal-vs-float rounding split (Spark's round
    is decimal HALF_UP via the shortest string; DuckDB/python round the
    raw double — they disagree EXACTLY on the x.xxxxxx5 boundaries that
    λ·(6-dp decimal) products systematically produce). The float path
    never re-rounds a short-decimal product, so it keeps the
    conventional (lam, float util) API for library callers."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if micro_lam is not None:
        lam_num, lam_den = micro_lam
        if not 0 <= lam_num <= lam_den:
            raise ValueError("micro_lam must satisfy 0 <= num <= den")

    def _group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy(np.int64)
        rel = pdf["rel"].to_numpy(np.float64)
        V = np.stack(pdf["v"].to_numpy())
        nrm = np.linalg.norm(V, axis=1)
        nrm[nrm == 0.0] = 1.0
        sims = (V @ V.T) / np.outer(nrm, nrm)
        if micro_lam is not None:
            # integer micro-units: exact BIGINT utility, no float rounding
            rel_i = np.round(rel * micro).astype(np.int64)
            sims_i = np.round(sims * micro).astype(np.int64)
        elif sim_decimals is not None:
            rel = np.round(rel, sim_decimals)
            sims = np.round(sims, sim_decimals)
        n = len(ids)
        kk = min(k, n)
        selected = []
        utils = []
        remaining = np.ones(n, dtype=bool)
        if micro_lam is not None:
            int_min = np.iinfo(np.int64).min
            maxsim_i = np.full(n, int_min)
            for step in range(kk):
                if step == 0:
                    util = lam_num * rel_i
                else:
                    util = lam_num * rel_i - (lam_den - lam_num) * maxsim_i
                util_m = np.where(remaining, util, int_min)
                pick = int(np.argmax(util_m))
                selected.append(pick)
                utils.append(int(util_m[pick]))
                remaining[pick] = False
                maxsim_i = np.maximum(maxsim_i, sims_i[:, pick])
            return pd.DataFrame(
                {
                    "qid": pdf["qid"].iloc[0],
                    "step": np.arange(1, kk + 1, dtype=np.int32),
                    "id": ids[selected],
                    "util": np.array(utils, dtype=np.int64),
                }
            )
        maxsim = np.full(n, -np.inf)
        for step in range(kk):
            if step == 0:
                util = lam * rel
            else:
                util = lam * rel - (1.0 - lam) * maxsim
            util_m = np.where(remaining, util, -np.inf)
            # argmax with id-asc tie-break: ids are sorted, argmax takes
            # the first (smallest id) among equals
            pick = int(np.argmax(util_m))
            selected.append(pick)
            utils.append(float(util_m[pick]))
            remaining[pick] = False
            maxsim = np.maximum(maxsim, sims[:, pick])
        return pd.DataFrame(
            {
                "qid": pdf["qid"].iloc[0],
                "step": np.arange(1, kk + 1, dtype=np.int32),
                "id": ids[selected],
                "util": utils,
            }
        )

    util_type = "long" if micro_lam is not None else "double"
    return cand.groupBy("qid").applyInPandas(
        _group, f"qid long, step int, id long, util {util_type}"
    )
