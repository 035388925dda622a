"""Indexed-phrase acceleration: a positional index over 2-token
shingles (ES ``index_phrases: true`` / Lucene CommonGramsFilter shape).

Why: on a web corpus most phrase queries are stopword phrases ("the big
table"), and the unigram positional path must intersect the stopwords'
posting lists — the conjunction barely filters, so the verify stage
ships huge position arrays. A bigram's document frequency is the
frequency of the *pair*, orders of magnitude rarer than its parts, so
the same conjunction over shingles touches a sliver of the postings: an
n-term phrase becomes an (n-1)-shingle conjunction whose candidates are
already adjacency-verified pairwise.

Results are BIT-IDENTICAL to ``phrase.phrase_search_index``: a start
position p survives the shingle fold iff gram_i sits at p+i for every
i, i.e. iff tok[p+i] == t_i for all offsets — exactly the unigram
phrase predicate — and scoring reuses the base index's unigram idf
sums, doclen norms, and avgdl (the shingle table carries the UNIGRAM
doclen precisely so the norm is unchanged). tests/test_shingled.py
asserts rank- and bit-identity against the unigram engine.

Scale shape: the shingle table is (gram_id, doc_id, tf, doclen,
positions), term-keyed like the base positional postings; the gram
dictionary join at build time is a plain equi-join (a web-scale bigram
vocabulary is NOT broadcastable — AQE upgrades it to broadcast when it
is small); at query time the handful of query grams broadcasts into
the dictionary scan, never the reverse. Storage trades ~2x the
positional index for phrase latency — exactly the trade ES documents
for index_phrases.

Limits (documented, enforced): shingling assumes consecutive token
positions, so analyzed indexes (stopword removal creates position
gaps) and single-term phrases fall back to the unigram path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.query.phrase import (
    _choose_two_pass,
    _conjunctive_docs,
    _grouped_structs,
    _phrase_offsets,
    _score_phrases,
    _single_pass_grouped,
    _topk,
    _verify_and_count,
)

SHINGLE_POS_SCHEMA = (
    "doc_id long, doclen int, gram string, tf int, positions array<int>"
)


def gram_positions_batch(
    texts, pat, n: int = 2, vocab: Optional[frozenset] = None,
    split_lists: bool = True,
) -> Optional[tuple]:
    """Vectorized tokenize + per-(doc, gram) position-list grouping —
    the shingle twin of ``phrase.positions_batch``. A gram's position
    is its FIRST token's index; doclen stays the unigram token count
    (the BM25 norm must not change). Tokens come from the shared batch
    kernel (ASCII Arrow fast path, regex fallback); grams are n aligned
    slices of the flat token stream joined in ONE pyarrow call (the
    ngrams_fast construction) instead of a per-doc Python loop.
    split_lists=False returns the raw (sorted positions + group offsets)
    form for Arrow-native callers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dpr_spark.functions.ngrams_fast import _tokens_batch

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts
    else:
        arr = pa.array(texts, type=pa.string())
    # match-then-lower (the reference semantics; identical to lower-first
    # on the ASCII fast path)
    flat, unilens = _tokens_batch(arr, lowercase_first=False)
    total = int(unilens.sum())
    if total < n:
        return None
    doc_idx = np.repeat(np.arange(len(unilens), dtype=np.int64), unilens)
    starts = np.zeros(len(unilens), dtype=np.int64)
    np.cumsum(unilens[:-1], out=starts[1:])
    m = total - n + 1
    cols = [flat.slice(j, m) for j in range(n)]
    grams_all = pc.binary_join_element_wise(*cols, " ") if n > 1 else cols[0]
    valid = doc_idx[:m] == doc_idx[n - 1 : n - 1 + m]
    sel = np.flatnonzero(valid)
    if not len(sel):
        return None
    gdoc = doc_idx[sel]
    pos = sel - starts[gdoc]
    enc = pc.dictionary_encode(grams_all.take(pa.array(sel)))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    grams = enc.dictionary.to_numpy(zero_copy_only=False)
    if vocab is not None:
        keep_codes = np.flatnonzero(pd.Series(grams).isin(vocab).to_numpy())
        mask = np.isin(codes, keep_codes)
        if not mask.any():
            return None
        codes, gdoc, pos = codes[mask], gdoc[mask], pos[mask]
    key = (gdoc << np.int64(32)) | codes
    order = np.argsort(key, kind="stable")
    skey = key[order]
    spos = pos[order].astype(np.int32)
    ukey, first = np.unique(skey, return_index=True)
    counts = np.diff(np.append(first, len(skey)))
    u_doc = (ukey >> np.int64(32)).astype(np.int64)
    u_code = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
    if not split_lists:
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        return (
            u_doc, unilens, grams.take(u_code), counts.astype(np.int64),
            spos, offsets,
        )
    pos_lists = np.split(spos, np.cumsum(counts)[:-1])
    return u_doc, unilens, grams.take(u_code), counts.astype(np.int64), pos_lists


def doc_gram_positions(
    docs: DataFrame, n: int = 2, vocab: Optional[Sequence[str]] = None
) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, doclen, gram, tf, positions) in one
    Arrow pass; doclen is the unigram token count."""
    from dpr_spark.functions.tokenizer import _compiled_fast

    vset = frozenset(vocab) if vocab is not None else None

    def run(it):
        import pyarrow as pa

        pat = _compiled_fast()
        for batch in it:
            if not batch.num_rows:
                continue
            out = gram_positions_batch(
                batch.column(1), pat, n=n, vocab=vset, split_lists=False
            )
            if out is None:
                continue
            u_doc, unilens, grams, tfs, spos, offsets = out
            doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids[u_doc], type=pa.int64()),
                    pa.array(unilens[u_doc].astype(np.int32), type=pa.int32()),
                    pa.array(grams, type=pa.string()),
                    pa.array(tfs.astype(np.int32), type=pa.int32()),
                    pa.ListArray.from_arrays(
                        pa.array(offsets, type=pa.int32()),
                        pa.array(spos, type=pa.int32()),
                    ),
                ],
                names=["doc_id", "doclen", "gram", "tf", "positions"],
            )

    return docs.select("doc_id", "text").mapInArrow(run, SHINGLE_POS_SCHEMA)


@dataclass
class ShingleIndex:
    n: int
    grams: DataFrame  # (gram, gram_id, df)
    positions: DataFrame  # (gram_id, doc_id, doclen, tf, positions)


def build_shingle_index(spark: SparkSession, docs: DataFrame, n: int = 2) -> ShingleIndex:
    """Shingle positional postings + gram dictionary. The gram->id join
    is a plain equi-join (bigram vocabulary of a web corpus is far past
    broadcast size; AQE broadcasts when it isn't)."""
    from dpr_spark.plans.ids import assign_dense_ids

    pos = doc_gram_positions(docs, n=n)
    dfreq = pos.groupBy("gram").agg(F.count("*").alias("df"))
    grams = assign_dense_ids(dfreq, "gram", "gram_id")
    positions = pos.join(grams.select("gram", "gram_id"), "gram").select(
        "gram_id", "doc_id", "doclen", "tf", "positions"
    )
    return ShingleIndex(n=n, grams=grams, positions=positions)


def _gram_rows(qrows, n: int):
    """(qid, off, term) offset rows -> (qid, off, gram) shingle rows.
    Raises when any phrase has <n terms or non-consecutive offsets
    (analyzer position gaps) — callers fall back to the unigram path."""
    by_q: dict = {}
    for qid, off, term in qrows:
        by_q.setdefault(qid, []).append((off, term))
    grows = []
    for qid, pairs in by_q.items():
        pairs.sort()
        offs = [o for o, _ in pairs]
        if len(pairs) < n or offs != list(range(len(pairs))):
            raise ValueError(
                f"phrase qid={qid} not shingle-able (needs >= {n} consecutive "
                "tokens); use phrase_search_index"
            )
        toks = [t for _, t in pairs]
        for i in range(len(toks) - n + 1):
            grows.append((qid, i, " ".join(toks[i : i + n])))
    return grows


def phrase_search_shingled(
    spark: SparkSession,
    index,
    sidx: ShingleIndex,
    phrases: Sequence[Tuple[int, str]],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Exact-phrase top-k over the shingle index — bit-identical to
    ``phrase_search_index`` (same pf, same unigram idf sums, same norm)
    with candidate generation and adjacency verification running on the
    (far rarer) shingles. OOV handling matches the unigram engine: a
    query with an out-of-vocabulary unigram is dropped from idf_sums; a
    missing shingle simply produces no conjunction survivors."""
    if getattr(index, "analyzer", None) is not None:
        raise ValueError(
            "shingled phrase search needs gap-free positions; analyzed "
            "indexes use phrase_search_index"
        )
    qrows, _ = _phrase_offsets(phrases)
    if not qrows:
        raise ValueError("no tokenizable phrases")
    grows = _gram_rows(qrows, sidx.n)

    # unigram idf sums from the base dictionary — the scoring contract
    qdf = spark.createDataFrame(qrows, "qid long, off int, term string")
    n_off_all = qdf.groupBy("qid").agg(F.count("*").alias("n_off"))
    idf_sums = (
        index.dictionary.select("term", "idf")
        .join(F.broadcast(qdf), "term")
        .groupBy("qid")
        .agg(F.sum("idf").alias("idf_sum"), F.count("*").alias("n_res"))
        .join(n_off_all, "qid")
        .filter(F.col("n_res") == F.col("n_off"))
        .select("qid", "idf_sum")
    )

    gdf = spark.createDataFrame(grows, "qid long, off int, gram string")
    gsel = sidx.grams.select("gram", "gram_id", "df").join(F.broadcast(gdf), "gram")
    # one gram-dictionary resolution job: prices the pass selection AND
    # pushes the resolved gram_ids into the positions scan (row-group
    # skipping on the at-rest sorted layout — see phrase._index_plumbing)
    rows = gsel.select("qid", "off", "gram_id", "df").collect()
    agg: dict = {}
    for r in rows:
        a = agg.setdefault(r["qid"], [0, None, 0])
        a[0] += 1
        a[1] = r["df"] if a[1] is None else min(a[1], r["df"])
        a[2] += r["df"]
    df_rows = [(q, a[0], a[1], a[2]) for q, a in agg.items()]
    from dpr_spark.query.phrase import MAX_SCAN_PRUNE_IDS

    positions = sidx.positions
    ids = sorted({r["gram_id"] for r in rows})
    if 0 < len(ids) <= MAX_SCAN_PRUNE_IDS:
        positions = positions.filter(F.col("gram_id").isin(ids))
    qsel = F.broadcast(
        spark.createDataFrame(
            [(r["qid"], r["off"], r["gram_id"]) for r in rows],
            "qid long, off int, gram_id long",
        )
    )
    cand = positions.join(qsel, "gram_id").select(
        "qid", "doc_id", "doclen", F.struct("off", "positions").alias("st")
    )
    g_off = gdf.groupBy("qid").agg(F.count("*").alias("n_off"))
    if _choose_two_pass(df_rows):
        light = positions.join(qsel, "gram_id").select(
            "qid", "doc_id", "doclen", "off"
        )
        grouped = _grouped_structs(cand, _conjunctive_docs(light, g_off))
    else:
        grouped = _single_pass_grouped(cand, g_off)
    matched = _verify_and_count(grouped)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)
