"""Learned-sparse retrieval — the ES `sparse_vector` / SPLADE-family
query: documents and queries are sparse (dim, weight) activations and

    score(q, d) = Σ_{dim ∈ q ∩ d} w_q(dim) · w_d(dim)

served from an inverted index keyed by DIM, exactly like the term
engine's postings keyed by term_id. This is the modern replacement for
the dense path the reference ships (`dense_retriever.py` dot-product
MIPS): same dot-product contract, but the index is sparse so the
candidate set per query is the union of a few dim posting lists, not
the whole corpus.

Scale shape: `sparsify` is pure per-row Catalyst array math (no
shuffle, no UDF) — the activations come from zipping the embedding
with its indices, pruning to the top-m positive components, exploding
to narrow (vec_id, dim, weight) rows; ONE hash partition by dim makes
it a servable posting table. Queries broadcast (a wave is tiny);
scoring probes only the posting rows of the query's dims — a
broadcast-hash join on dim followed by a map-side-combined sum per
(qid, doc). No crossJoin anywhere: brute-force cosine
(`extras/ann.py`) scans the corpus per query; this touches
|q dims| posting lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark import DEFAULT_TOP_K


def sparsify(
    emb: DataFrame,
    top_m: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(vec_id, dim, weight): the top-m POSITIVE components of each
    embedding — a deterministic stand-in for a learned-sparse encoder's
    ReLU activations (no model in this sandbox; the engine contract is
    the (dim, weight) table, not how a model produced it).

    Ties break on dim DESC (the struct sort is lexicographic on
    (weight, dim) descending) — any total order works, it only has to
    be one order. Weights round to 6dp so scores are engine-portable.

    Pure narrow plan: zip → filter > 0 → sort_array desc → slice m →
    explode. No shuffle; the caller partitions the result by dim when
    materializing it as a serving index."""
    pairs = F.zip_with(
        F.col(emb_col).cast("array<double>"),
        F.sequence(F.lit(0), F.size(emb_col) - 1),
        lambda v, i: F.struct(v.alias("w"), i.alias("dim")),
    )
    kept = F.slice(
        F.sort_array(F.filter(pairs, lambda s: s["w"] > 0), asc=False),
        1,
        top_m,
    )
    return (
        emb.select(F.col(id_col).alias("vec_id"), F.explode(kept).alias("a"))
        .select(
            "vec_id",
            F.col("a.dim").cast("int").alias("dim"),
            F.round(F.col("a.w"), 6).alias("weight"),
        )
    )


def sparse_vector_search(
    query_sparse: DataFrame,
    doc_sparse: DataFrame,
    k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """(qid, rank, vec_id, score_r): top-k docs per query by sparse dot
    product. `query_sparse` is (qid, dim, weight) — a wave, broadcast;
    `doc_sparse` is (vec_id, dim, weight) — the corpus-sized posting
    table, probed in place on dim. Scores round to 6dp before ranking
    (rank-stability across engines, same contract as the BM25
    searchers); ties break on vec_id."""
    q = F.broadcast(
        query_sparse.select(
            F.col("qid"), F.col("dim"), F.col("weight").alias("qw")
        )
    )
    scored = (
        doc_sparse.join(q, "dim")
        .groupBy("qid", "vec_id")
        .agg(F.round(F.sum(F.col("qw") * F.col("weight")), 6).alias("score_r"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "score_r")
    )
