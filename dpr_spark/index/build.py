"""Inverted-index build: the Spark-native replacement for DPR's
generate_dense_embeddings.py + faiss_indexers index path (SURVEY.md §3.2).

The reference manually shards the corpus across 50 processes
(`/root/reference/generate_dense_embeddings.py:131-141`) and pickles one
embedding shard per process (`:143-151`); index "build" is then an in-RAM
FAISS add (`dpr/indexer/faiss_indexers.py:93-105`). Here the whole build
is one declarative DataFrame DAG — sharding, shuffle, spill and resume are
Spark's problem:

    pages ──filter(lang)──► extract/verify text ──tokenize (Arrow UDF)──►
      docstats(doc_id, url, doclen)                    [A6]
      tf(term, doc_id, tf, doclen)    explode+groupBy  [A7]
      dictionary(term, term_id, df, idf)               [A6]
      postings v1 (exact rows)  /  posting BLOCKS (delta-gap varint +
      per-block max score)                             [north_star]

Scale notes (the part that must survive 10^12 docs / 1000 executors):
- tokenization is per-partition Arrow batches — embarrassingly parallel;
- tf aggregation is partial+final hash agg (map-side combine absorbs the
  Zipf head: a doc contributes each term once to the shuffle);
- df aggregation over the tf table groups by term — head terms ("the")
  are one group each but their input is already 1 row per (term,doc);
  optional two-level salted merge (plans/skew.py) bounds any single
  reducer;
- posting blocks: repartitionByRange(term_id, doc_id) splits even a
  df≈N head term across range partitions; block_id = first doc_id of the
  block keeps global order without cross-partition coordination;
- doc_id / term_id assignment: dense rank (deterministic, matches the
  single-node oracle). The global window is the one non-scalable step at
  10^12 rows; `id_strategy="hash"` switches to xxhash64 ids (no global
  sort, collision-checked) for large deployments — rank identity vs the
  oracle is then defined over urls/terms instead of dense ids.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.functions.textextract import extract_text_udf
from dpr_spark.index.codec import BLOCK_SIZE, encode_block

POSTINGS_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType()),
        T.StructField("block_id", T.LongType()),  # first doc_id in block
        T.StructField("n", T.IntegerType()),
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("block_max_score", T.FloatType()),
    ]
)


@dataclass
class IndexStats:
    n_docs: int
    avgdl: float


@dataclass
class InvertedIndex:
    """In-session handle to the index tables (persisted via save/load)."""

    docstats: DataFrame  # doc_id, url, doclen
    dictionary: DataFrame  # term, term_id, df, idf
    postings: DataFrame  # term_id, doc_id, tf, doclen   (exact v1)
    blocks: Optional[DataFrame]  # POSTINGS_BLOCK_SCHEMA          (compressed v2)
    stats: IndexStats

    def save(self, path: str) -> None:
        import json
        import os

        self.docstats.write.mode("overwrite").parquet(os.path.join(path, "docstats"))
        self.dictionary.write.mode("overwrite").parquet(os.path.join(path, "dictionary"))
        self.postings.write.mode("overwrite").parquet(os.path.join(path, "postings"))
        if self.blocks is not None:
            self.blocks.write.mode("overwrite").parquet(os.path.join(path, "blocks"))
        with open(os.path.join(path, "stats.json"), "w") as f:
            json.dump({"n_docs": self.stats.n_docs, "avgdl": self.stats.avgdl}, f)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "InvertedIndex":
        import json
        import os

        with open(os.path.join(path, "stats.json")) as f:
            s = json.load(f)
        blocks_path = os.path.join(path, "blocks")
        return InvertedIndex(
            docstats=spark.read.parquet(os.path.join(path, "docstats")),
            dictionary=spark.read.parquet(os.path.join(path, "dictionary")),
            postings=spark.read.parquet(os.path.join(path, "postings")),
            blocks=spark.read.parquet(blocks_path) if os.path.isdir(blocks_path) else None,
            stats=IndexStats(s["n_docs"], s["avgdl"]),
        )


def prepare_docs(
    pages: DataFrame,
    lang: Optional[str] = None,
    verify_extract: bool = False,
    id_strategy: str = "dense_rank",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> docs(doc_id, url, text).

    Only url/text/lang leave storage (column pruning; `html` is read only
    when verify_extract=True — the byte-identity gate of
    BASELINE.json:input_hint). doc_id = dense rank of url via the
    two-phase range rank (plans/ids.py — no single-partition window);
    `hash` strategy = xxhash64(url), no sort at all (collision-check it
    at >10^9 docs before trusting).
    """
    if lang is not None:
        pages = pages.filter(F.col("lang") == lang)  # pushed to the scan
    cols = ["url", "text"] + (["html"] if verify_extract else [])
    docs = pages.select(*cols)
    if verify_extract:
        docs = docs.withColumn("_extracted", extract_text_udf()(F.col("html")))
        # per-row invariant: extract_text(html) == text byte-identically
        docs = docs.withColumn(
            "_extract_ok", F.col("_extracted") == F.col("text")
        ).drop("html", "_extracted")
    if id_strategy == "dense_rank":
        from dpr_spark.plans.ids import assign_dense_ids

        docs = assign_dense_ids(docs, "url", "doc_id")
    elif id_strategy == "hash":
        docs = docs.withColumn("doc_id", F.xxhash64("url"))
    else:
        raise ValueError(id_strategy)
    return docs.select(
        "doc_id", "url", "text", *(["_extract_ok"] if verify_extract else [])
    )


DOC_TERMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("doclen", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.LongType()),
    ]
)


def doc_terms(docs: DataFrame) -> DataFrame:
    """Fused tokenize + per-doc term histogram (T1 + A7) in ONE Arrow
    pass. tf per (term, doc) is a per-document quantity — computing it
    inside the tokenizer UDF removes the explode + groupBy shuffle of
    8.75M token rows entirely (a doc's tokens never leave its partition).
    doclen rides on every row (functionally dependent on doc_id)."""
    from collections import Counter

    from dpr_spark.functions.tokenizer import tokenize_fast

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_dl, out_t, out_tf = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = tokenize_fast(text) if text is not None else []
                c = Counter(toks)
                n = len(toks)
                out_doc.extend([doc_id] * len(c))
                out_dl.extend([n] * len(c))
                out_t.extend(c.keys())
                out_tf.extend(c.values())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "doclen": pd.Series(out_dl, dtype="int32"),
                    "term": pd.Series(out_t, dtype="object"),
                    "tf": pd.Series(out_tf, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(run, DOC_TERMS_SCHEMA)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    lang: Optional[str] = None,
    build_blocks: bool = True,
    verify_extract: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
    salt_df_agg: int = 0,
) -> InvertedIndex:
    docs = prepare_docs(pages, lang=lang, verify_extract=verify_extract)
    if verify_extract:
        n_bad = docs.filter(~F.col("_extract_ok")).count()
        if n_bad:
            raise ValueError(f"extract_text(html) != text for {n_bad} rows")
        docs = docs.drop("_extract_ok")
    return build_index_from_docs(
        spark, docs, build_blocks=build_blocks, k1=k1, b=b, salt_df_agg=salt_df_agg
    )


def build_index_from_docs(
    spark: SparkSession,
    docs: DataFrame,
    build_blocks: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
    salt_df_agg: int = 0,
) -> InvertedIndex:
    """Build from docs that already carry (doc_id, text[, url]) — e.g.
    the driver's `documents` table, or prepare_docs output."""
    if "url" not in docs.columns:
        docs = docs.withColumn("url", F.col("doc_id").cast("string"))
    # one Arrow pass: tokenize + per-doc tf histogram (no explode shuffle)
    tf = doc_terms(docs).persist()

    # docstats: doclen = sum(tf); zero-token docs are kept via left join
    # (they count toward N and avgdl exactly like the oracle).
    doclens = tf.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("doclen"))
    docstats = (
        docs.select("doc_id", "url")
        .join(doclens, "doc_id", "left")
        .withColumn("doclen", F.coalesce("doclen", F.lit(0)))
        .persist()
    )
    row = docstats.agg(F.count("*").alias("n"), F.avg("doclen").alias("avgdl")).collect()[0]
    stats = IndexStats(int(row["n"]), float(row["avgdl"]))

    # A6: document frequency. tf rows are distinct per (term,doc), so df
    # is a plain count — map-side partial agg bounds head-term skew;
    # salt_df_agg>0 forces an explicit two-level salted merge (plans/skew.py).
    if salt_df_agg > 0:
        from dpr_spark.plans.skew import salted_count

        df_by_term = salted_count(tf, key="term", salt_col="doc_id", buckets=salt_df_agg)
    else:
        df_by_term = tf.groupBy("term").agg(F.count("*").alias("df"))

    from dpr_spark.plans.ids import assign_dense_ids

    n_docs = float(stats.n_docs)
    dictionary = (
        assign_dense_ids(df_by_term, "term", "term_id")
        .withColumn(
            "idf",
            F.log((F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
        )
        .select("term", "term_id", "df", "idf")
    )

    postings = (
        tf.join(F.broadcast(dictionary.select("term", "term_id", "idf")), "term")
        .select("term_id", "doc_id", "tf", "doclen", "idf")
    )

    blocks = (
        _encode_blocks(postings, stats.avgdl, k1=k1, b=b) if build_blocks else None
    )
    return InvertedIndex(docstats, dictionary, postings.drop("idf"), blocks, stats)


def _encode_blocks(
    postings: DataFrame, avgdl: float, k1: float, b: float, num_partitions: Optional[int] = None
) -> DataFrame:
    """Compressed posting blocks: repartitionByRange(term_id, doc_id) +
    sortWithinPartitions + mapInPandas run-length blocking (SURVEY.md §4.2).

    The encoder never holds more than one partial block (BLOCK_SIZE rows)
    per term in Python memory; a head term spanning several range
    partitions yields independently-ordered blocks because block_id is the
    block's first doc_id and range partitions are doc_id-disjoint.
    """
    k1p1 = k1 + 1.0

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: Optional[pd.DataFrame] = None
        for pdf in it:
            if buf is not None:
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if len(pdf) == 0:
                continue
            # hold back the trailing (possibly incomplete) term run so a
            # term's postings split across Arrow batches stay contiguous
            last_term = pdf["term_id"].iloc[-1]
            tail = pdf[pdf["term_id"] == last_term]
            head = pdf[pdf["term_id"] != last_term]
            buf = tail.copy()
            if len(head):
                out = _encode_pdf(head, avgdl, k1, b, k1p1)
                if out is not None:
                    yield out
        if buf is not None and len(buf):
            out = _encode_pdf(buf, avgdl, k1, b, k1p1)
            if out is not None:
                yield out

    parts = {"numPartitions": num_partitions} if num_partitions else {}
    return (
        postings.repartitionByRange(*(list(parts.values()) + ["term_id", "doc_id"]))
        .sortWithinPartitions("term_id", "doc_id")
        .mapInPandas(encode, POSTINGS_BLOCK_SCHEMA)
    )


def _encode_pdf(pdf: pd.DataFrame, avgdl: float, k1: float, b: float, k1p1: float):
    rows = []
    tf_arr = pdf["tf"].to_numpy(np.float64)
    dl_arr = pdf["doclen"].to_numpy(np.float64)
    score = pdf["idf"].to_numpy(np.float64) * tf_arr * k1p1 / (
        tf_arr + k1 * (1.0 - b + b * dl_arr / avgdl)
    )
    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    term_ids = pdf["term_id"].to_numpy(np.int64)
    # boundaries of term runs
    starts = np.flatnonzero(np.r_[True, term_ids[1:] != term_ids[:-1]])
    ends = np.r_[starts[1:], len(term_ids)]
    for s, e in zip(starts, ends):
        for bs in range(s, e, BLOCK_SIZE):
            be = min(bs + BLOCK_SIZE, e)
            ids_buf, tfs_buf = encode_block(doc_ids[bs:be], tfs[bs:be])
            rows.append(
                (
                    int(term_ids[s]),
                    int(doc_ids[bs]),
                    int(be - bs),
                    ids_buf,
                    tfs_buf,
                    float(score[bs:be].max()),
                )
            )
    if not rows:
        return None
    return pd.DataFrame(
        rows, columns=["term_id", "block_id", "n", "doc_ids", "tfs", "block_max_score"]
    )
