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

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.functions.textextract import extract_text_udf
from dpr_spark.index.codec import BLOCK_SIZE

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
    cached: Optional[list] = None  # persisted parents (tf, docstats, ...)
    # how doc_id was derived: "dense_rank" | "hash" (= xxhash64(url)) |
    # None (unknown — caller-supplied ids or a pre-round-4 save). The NRT
    # delta override joins on xxhash64(url), so fresh_index requires
    # "hash" and fails fast otherwise (ADVICE r3: with a dense-id base
    # the override silently no-ops and re-crawled urls serve twice).
    id_strategy: Optional[str] = None
    # optional positional postings (term_id, doc_id, tf, positions) —
    # the .pos-file analog consumed by query/phrase.py; built when
    # build_index*(build_positional=True)
    positions: Optional[DataFrame] = None
    # optional analysis chain (functions/analysis.Analyzer) the index was
    # built with — every engine's query-term resolution applies the same
    # chain automatically (Lucene: search with the index's analyzer);
    # None = the identity chain (raw SimpleTokenizer terms)
    analyzer: Optional[object] = None
    # (min, max) doc_id when the build proved them (dense ids: (0, N-1),
    # or the fused stats job's measured bounds). Consumers use this to
    # decide packed int64 encodings (doc_id must fit 31 bits); None =
    # unknown — consumers fall back to unpacked flows.
    doc_id_bounds: Optional[tuple] = None

    def unpersist(self) -> None:
        for df in self.cached or []:
            try:
                # blocking: async unpersist lets stale cache blocks race
                # the next build's allocations (measured: repeated builds
                # degrade 2-4x when eviction overlaps fresh cache writes)
                df.unpersist(True)
            except Exception:
                pass

    def save(self, path: str) -> None:
        import json
        import os

        self.docstats.write.mode("overwrite").parquet(os.path.join(path, "docstats"))
        self.dictionary.write.mode("overwrite").parquet(os.path.join(path, "dictionary"))
        self.postings.write.mode("overwrite").parquet(os.path.join(path, "postings"))
        if self.blocks is not None:
            self.blocks.write.mode("overwrite").parquet(os.path.join(path, "blocks"))
        if self.positions is not None:
            # sort inside parquet row groups by term_id so a phrase
            # query's term_id filter prunes row groups via min/max stats
            self.positions.sortWithinPartitions("term_id").write.mode(
                "overwrite"
            ).parquet(os.path.join(path, "positions"))
        with open(os.path.join(path, "stats.json"), "w") as f:
            json.dump(
                {
                    "n_docs": self.stats.n_docs,
                    "avgdl": self.stats.avgdl,
                    "id_strategy": self.id_strategy,
                    "analyzer": self.analyzer.spec() if self.analyzer else None,
                    "doc_id_bounds": list(self.doc_id_bounds)
                    if self.doc_id_bounds is not None
                    else None,
                },
                f,
            )

    @staticmethod
    def load(spark: SparkSession, path: str) -> "InvertedIndex":
        import json
        import os

        with open(os.path.join(path, "stats.json")) as f:
            s = json.load(f)
        from dpr_spark.functions.analysis import Analyzer

        blocks_path = os.path.join(path, "blocks")
        pos_path = os.path.join(path, "positions")
        return InvertedIndex(
            analyzer=Analyzer.from_spec(s.get("analyzer")),
            docstats=spark.read.parquet(os.path.join(path, "docstats")),
            dictionary=spark.read.parquet(os.path.join(path, "dictionary")),
            postings=spark.read.parquet(os.path.join(path, "postings")),
            blocks=spark.read.parquet(blocks_path) if os.path.isdir(blocks_path) else None,
            stats=IndexStats(s["n_docs"], s["avgdl"]),
            id_strategy=s.get("id_strategy"),
            positions=spark.read.parquet(pos_path) if os.path.isdir(pos_path) else None,
            doc_id_bounds=tuple(s["doc_id_bounds"])
            if s.get("doc_id_bounds") is not None
            else None,
        )


def prepare_docs(
    pages: DataFrame,
    lang: Optional[str] = None,
    verify_extract: bool = False,
    id_strategy: str = "dense_rank",
    cleanup: Optional[list] = None,
    range_partitions: Optional[int] = None,
    collision_check: bool = True,
    dedup_latest: bool = False,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> docs(doc_id, url, text).

    Only url/text/lang leave storage (column pruning; `html` is read only
    when verify_extract=True — the byte-identity gate of
    BASELINE.json:input_hint). doc_id = dense rank of url via the
    two-phase range rank (plans/ids.py — no single-partition window);
    `hash` strategy = xxhash64(url), no sort at all; a one-agg
    distinct-count gate fails loudly on a hash collision
    (collision_check=False skips it).

    range_partitions: rank the FULL rows through one url-range shuffle of
    that partition count instead of the narrow rank-then-join — the
    output is then already spread for the tokenize stage, so the build
    skips its own repartition. One shuffle + one counts pass replaces
    rank-shuffle + map broadcast + join + repartition: fewer driver
    barriers, same ids.

    dedup_latest: re-crawl upsert — when the table holds several crawls
    of the same url (distinct warc_ts), keep only the newest row per url
    (plans/latest.py max_by hash-agg: winners collapse map-side, no
    sort). Applied AFTER the lang filter (the filter prunes at the scan;
    dedup therefore picks the newest row among the requested language's
    crawls). Without it, duplicate urls violate the id-assignment
    uniqueness contract (dense_rank) or trip the collision gate (hash).
    """
    if lang is not None:
        pages = pages.filter(F.col("lang") == lang)  # pushed to the scan
    cols = ["url", "text"] + (["html"] if verify_extract else [])
    if dedup_latest:
        if "warc_ts" not in pages.columns:
            raise ValueError("dedup_latest=True requires a warc_ts version column")
        from dpr_spark.plans.latest import latest_by_key

        pages = latest_by_key(pages.select("warc_ts", *cols), "url", "warc_ts")
    docs = pages.select(*cols)
    if verify_extract:
        docs = docs.withColumn("_extracted", extract_text_udf()(F.col("html")))
        # per-row invariant: extract_text(html) == text byte-identically
        docs = docs.withColumn(
            "_extract_ok", F.col("_extracted") == F.col("text")
        ).drop("html", "_extracted")
    if id_strategy == "dense_rank":
        from dpr_spark.plans.ids import assign_dense_ids

        if range_partitions:
            docs = assign_dense_ids(
                docs, "url", "doc_id", num_partitions=range_partitions, cleanup=cleanup
            )
        else:
            # narrow: rank urls alone (12 bytes/row shuffles, not page text)
            docs = assign_dense_ids(docs, "url", "doc_id", narrow=True, cleanup=cleanup)
    elif id_strategy == "hash":
        docs = docs.withColumn("doc_id", F.xxhash64("url"))
        if collision_check:
            # one cheap agg over two hashed-distinct sketch-free counts: a
            # silent xxhash64 collision would merge two documents' postings,
            # so fail loudly instead (the build is rerunnable with
            # id_strategy="dense_rank" or a salted url)
            row = docs.agg(
                F.countDistinct("url").alias("u"),
                F.countDistinct("doc_id").alias("d"),
            ).collect()[0]
            if int(row["u"]) != int(row["d"]):
                raise ValueError(
                    f"xxhash64 doc_id collision: {int(row['u'])} distinct urls "
                    f"-> {int(row['d'])} distinct ids; use id_strategy="
                    "'dense_rank' or salt the url"
                )
    else:
        raise ValueError(id_strategy)
    out = docs.select(
        "doc_id", "url", "text", *(["_extract_ok"] if verify_extract else [])
    )
    out._dense_id_count = getattr(docs, "_dense_id_count", None)
    return out


DOC_TERMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("doclen", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.LongType()),
    ]
)


def tf_batch(texts, pat, vocab_map=None) -> Optional[tuple]:
    """The fused tokenize + per-document term-histogram kernel (T1 + A7)
    for one Arrow batch. Returns (row_idx, doclen_per_row, terms, tfs)
    where row_idx indexes into `texts`, or None for an all-empty batch.

    Tokenize the whole batch, then count (row, term) pairs with ONE
    factorize + ONE np.unique — no per-doc Python dicts. Tokens are
    factorized RAW and only the (small, Zipf) vocab is lowercased, then
    re-factorized to merge case variants — semantically identical to
    lowering every token, ~25% faster (lowers ~10k vocab strings instead
    of ~3.5M tokens per batch).

    vocab_map (Analyzer.map_vocab): optional per-DISTINCT-term transform
    — None drops the term (stopword), a string renames it (stem). Runs
    over the batch vocabulary only (same trick as the lowercasing);
    doclen then counts SURVIVING tokens, Lucene's field-length norm."""
    tok_lists = [pat.findall(t) if t is not None else [] for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    if lens.sum() == 0:
        return None
    flat = pd.Series([tok for toks in tok_lists for tok in toks], dtype="object")
    codes_raw, vocab_raw = pd.factorize(flat, sort=False)
    code_map, terms = pd.factorize(pd.Series(vocab_raw).str.lower(), sort=False)
    codes = code_map[codes_raw]
    doc_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
    if vocab_map is not None:
        mapped = vocab_map(pd.Series(terms))
        keep_v = mapped.notna().to_numpy()
        if not keep_v.any():
            return None
        remap = np.full(len(terms), -1, dtype=np.int64)
        codes2, terms2 = pd.factorize(mapped[keep_v], sort=False)
        remap[keep_v] = codes2
        codes = remap[codes]
        keep = codes >= 0
        codes = codes[keep]
        doc_idx = doc_idx[keep]
        terms = terms2
        lens = np.bincount(doc_idx, minlength=len(tok_lists)).astype(np.int64)
    key = (doc_idx << np.int64(32)) | codes.astype(np.int64)
    ukey, counts = np.unique(key, return_counts=True)
    u_doc = (ukey >> np.int64(32)).astype(np.int64)
    u_code = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
    return u_doc, lens, terms.take(u_code), counts.astype(np.int64)


def tf_batch_arrow(texts, vocab_map=None) -> Optional[tuple]:
    """Arrow-vectorized twin of :func:`tf_batch` for one Arrow string
    array: ASCII batches tokenize in three RE2/C passes
    (tokenizer.tokenize_ascii_arrow, ~5x the regex-module kernel) and the
    (row, term) histogram runs over pyarrow dictionary codes; non-ASCII
    batches fall back to the regex kernel (identical tokens by
    construction — asserted in tests/test_tokenizer.py). Returns
    (row_idx, doclen_per_row, terms pyarrow.StringArray, tfs)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dpr_spark.functions.tokenizer import (
        _all_ascii,
        _compiled_fast,
        tokenize_ascii_arrow,
    )

    if texts.null_count:
        texts = pc.fill_null(texts, "")
    if not _all_ascii(texts):
        out = tf_batch(texts.to_pandas(), _compiled_fast(), vocab_map=vocab_map)
        if out is None:
            return None
        u_doc, lens, terms, tfs = out
        return u_doc, lens, pa.array(terms, type=pa.string()), tfs
    flat, lens = tokenize_ascii_arrow(texts)
    if lens.sum() == 0:
        return None
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms = enc.dictionary
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    if vocab_map is not None:
        mapped = vocab_map(terms.to_pandas())
        keep_v = mapped.notna().to_numpy()
        if not keep_v.any():
            return None
        remap = np.full(len(terms), -1, dtype=np.int64)
        codes2, terms2 = pd.factorize(mapped[keep_v], sort=False)
        remap[keep_v] = codes2
        codes = remap[codes]
        keep = codes >= 0
        codes = codes[keep]
        doc_idx = doc_idx[keep]
        terms = pa.array(terms2, type=pa.string())
        lens = np.bincount(doc_idx, minlength=len(lens)).astype(np.int64)
    key = (doc_idx << np.int64(32)) | codes
    ukey, counts = np.unique(key, return_counts=True)
    u_doc = (ukey >> np.int64(32)).astype(np.int64)
    u_code = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
    return u_doc, lens, terms.take(pa.array(u_code)), counts.astype(np.int64)


def doc_terms(docs: DataFrame, analyzer=None) -> DataFrame:
    """Fused tokenize + per-doc term histogram (T1 + A7) in ONE Arrow
    pass. tf per (term, doc) is a per-document quantity — computing it
    inside the tokenizer UDF removes the explode + groupBy shuffle of
    8.75M token rows entirely (a doc's tokens never leave its partition).
    doclen rides on every row (functionally dependent on doc_id).
    analyzer: optional functions/analysis.Analyzer, applied vocab-level
    inside the same kernel.

    mapInArrow (not mapInPandas): the text column stays an Arrow buffer
    end-to-end (no per-row Python string objects on either side of the
    boundary — guide §4.2), and (doclen, tf) cross the boundary packed
    into one int64 that a JVM-side projection unpacks (the per-CELL cost
    of the Python boundary dominates at this row count — measured
    ~4.6µs/cell on this host)."""
    import pyarrow as pa

    vocab_map = analyzer.map_vocab if analyzer is not None else None

    def run(it):
        for batch in it:
            out = tf_batch_arrow(batch.column(1), vocab_map=vocab_map)
            if out is None:
                continue
            u_doc, lens, terms, tfs = out
            doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
            dl_tf = (lens[u_doc] << np.int64(32)) | tfs
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids[u_doc], type=pa.int64()),
                    terms,
                    pa.array(dl_tf, type=pa.int64()),
                ],
                names=["doc_id", "term", "dl_tf"],
            )

    packed = docs.select("doc_id", "text").mapInArrow(
        run, "doc_id long, term string, dl_tf long"
    )
    return packed.select(
        "doc_id",
        F.shiftrightunsigned("dl_tf", 32).cast("int").alias("doclen"),
        "term",
        F.col("dl_tf").bitwiseAND(F.lit(0xFFFFFFFF)).alias("tf"),
    )


def doc_terms_from_parts(parts: DataFrame, offsets_bc, analyzer=None) -> DataFrame:
    """The FUSED hot path: dense doc_id assignment (positional, from the
    ranged_parts prefix sums) + tokenize + per-doc tf histogram in ONE
    Python stage. Chaining a separate id-assign mapInPandas in front of
    the tokenizer round-trips the full page text through Arrow twice and
    doubles the Python-stage count — fusing removes both."""
    import pyarrow as pa

    from dpr_spark.plans.ids import _offset_for

    vocab_map = analyzer.map_vocab if analyzer is not None else None

    def run(it):
        seen = 0
        for batch in it:
            if not batch.num_rows:
                continue
            # partition resolved via the stamped column, not TaskContext
            # (a union/coalesce in the consumer plan offsets task ids —
            # see plans/ids.py ranged_parts)
            base = _offset_for(offsets_bc, int(batch.column(1)[0].as_py()))
            ids = np.arange(base + seen, base + seen + batch.num_rows, dtype=np.int64)
            seen += batch.num_rows
            out = tf_batch_arrow(batch.column(0), vocab_map=vocab_map)
            if out is None:
                continue
            u_doc, lens, terms, tfs = out
            dl_tf = (lens[u_doc] << np.int64(32)) | tfs
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids[u_doc], type=pa.int64()),
                    terms,
                    pa.array(dl_tf, type=pa.int64()),
                ],
                names=["doc_id", "term", "dl_tf"],
            )

    packed = parts.select("text", "_range_pid").mapInArrow(
        run, "doc_id long, term string, dl_tf long"
    )
    return packed.select(
        "doc_id",
        F.shiftrightunsigned("dl_tf", 32).cast("int").alias("doclen"),
        "term",
        F.col("dl_tf").bitwiseAND(F.lit(0xFFFFFFFF)).alias("tf"),
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    lang: Optional[str] = None,
    build_blocks: bool = True,
    verify_extract: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
    salt_df_agg: int = 0,
    dedup_latest: bool = False,
    id_strategy: str = "dense_rank",
    build_positional: bool = False,
    analyzer=None,
) -> InvertedIndex:
    cleanup: list = []
    par = spark.sparkContext.defaultParallelism
    if id_strategy not in ("dense_rank", "hash"):
        raise ValueError(id_strategy)
    if id_strategy == "hash":
        # xxhash64(url) ids — REQUIRED for a base index that will serve
        # with a streaming delta (fresh_index's override anti-join keys
        # on the same hash); no rank shuffle at all
        docs = prepare_docs(
            pages, lang=lang, verify_extract=verify_extract,
            id_strategy="hash", cleanup=cleanup, dedup_latest=dedup_latest,
        )
        if verify_extract:
            n_bad = docs.filter(~F.col("_extract_ok")).count()
            if n_bad:
                raise ValueError(f"extract_text(html) != text for {n_bad} rows")
            docs = docs.drop("_extract_ok")
        return build_index_from_docs(
            spark, docs, build_blocks=build_blocks, k1=k1, b=b,
            salt_df_agg=salt_df_agg, cleanup=cleanup, id_strategy="hash",
            build_positional=build_positional, analyzer=analyzer,
        )
    if verify_extract:
        # verification path: ids ride the distribution shuffle, extract
        # byte-identity checked row-wise before tokenization
        docs = prepare_docs(
            pages, lang=lang, verify_extract=True, cleanup=cleanup,
            range_partitions=3 * par, dedup_latest=dedup_latest,
        )
        n_bad = docs.filter(~F.col("_extract_ok")).count()
        if n_bad:
            raise ValueError(f"extract_text(html) != text for {n_bad} rows")
        hint = getattr(docs, "_dense_id_count", None)
        docs = docs.drop("_extract_ok")
        docs._dense_id_count = hint  # .drop() loses the attribute
        return build_index_from_docs(
            spark, docs, build_blocks=build_blocks, k1=k1, b=b,
            salt_df_agg=salt_df_agg, cleanup=cleanup, repartition=False,
            id_strategy="dense_rank", build_positional=build_positional,
            analyzer=analyzer,
        )

    # hot path: ONE url-range shuffle doubles as id assignment and the
    # tokenize distribution, and ids are computed INSIDE the tokenize
    # kernel (one Python stage total on the critical path)
    from dpr_spark.plans.ids import attach_ids, ranged_parts

    src = pages
    if lang is not None:
        src = src.filter(F.col("lang") == lang)  # pushed to the scan
    if dedup_latest:
        # re-crawl upsert (newest warc_ts per url) BEFORE the range
        # shuffle: winners collapse map-side in the latest_by_key hash
        # agg, so only one row per url rides the id-assignment exchange
        if "warc_ts" not in src.columns:
            raise ValueError("dedup_latest=True requires a warc_ts version column")
        from dpr_spark.plans.latest import latest_by_key

        src = latest_by_key(
            src.select("url", "warc_ts", "text"), "url", "warc_ts"
        )
    parts, bc, n_docs_cnt = ranged_parts(
        src.select("url", "text"), "url", 3 * par, cleanup
    )
    tf = doc_terms_from_parts(parts, bc, analyzer=analyzer).persist()
    # the ranged prefix sum already counted the corpus: a small-enough
    # doc count commits to the local vocab rank up front, skipping the
    # tf.count() materialization barrier (the stats job materializes the
    # persisted tf instead); large corpora keep count-then-sample, which
    # shields the two-phase rank's range sampler from re-tokenizing
    local_rank = True if n_docs_cnt <= LOCAL_TERM_RANK_DOCS_MAX else None
    n_tf = None if local_rank else tf.count()
    # docstats' (doc_id, url) view reuses the same offsets — off the
    # critical path, no text column
    docs = attach_ids(parts, bc, "doc_id", columns=["url"])
    idx = _finish_index(
        spark, tf, docs, n_docs_cnt, build_blocks=build_blocks, k1=k1, b=b,
        salt_df_agg=salt_df_agg, cleanup=cleanup, id_strategy="dense_rank",
        n_tf=n_tf, local_rank=local_rank,
        doc_id_bounds=(0, n_docs_cnt - 1) if n_docs_cnt else None,
    )
    idx.analyzer = analyzer
    if build_positional:
        # second Arrow pass over the ranged parts (same ids, same
        # partitioning; the tf histogram already collapsed positions)
        from dpr_spark.query.phrase import build_positions

        idx.positions = build_positions(
            attach_ids(parts, bc, "doc_id", columns=["text"]), idx.dictionary,
            analyzer=analyzer,
        )
    return idx


def build_index_from_docs(
    spark: SparkSession,
    docs: DataFrame,
    build_blocks: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
    salt_df_agg: int = 0,
    cleanup: Optional[list] = None,
    repartition: bool = True,
    doc_split_bits: Optional[int] = None,
    doc_split_threshold: int = 8_000_000,
    id_strategy: Optional[str] = None,
    build_positional: bool = False,
    analyzer=None,
) -> InvertedIndex:
    """Build from docs that already carry (doc_id, text[, url]) — e.g.
    the driver's `documents` table, or prepare_docs output. Pass
    `id_strategy` ("hash" when doc_id = xxhash64(url)) so the saved
    index records how its ids were derived — fresh_index/--delta-dir
    enforce the hash contract from that record.

    Head-term skew: the block encode hash-partitions on term_id, so a
    head term's whole posting list lands in ONE task. When max(df)
    exceeds doc_split_threshold postings, the shuffle key automatically
    gains doc_id>>doc_split_bits — each head term splits into doc-ranges
    sized to ~threshold/2 postings, bounding every encode task. Pass
    doc_split_bits explicitly to override the auto choice. Blocks stay
    globally ordered because block_id is the block's first doc_id and the
    ranges are doc_id-disjoint."""
    cleanup = cleanup if cleanup is not None else []
    if "url" not in docs.columns:
        docs = docs.withColumn("url", F.col("doc_id").cast("string"))
    par = spark.sparkContext.defaultParallelism
    n_docs_hint = getattr(docs, "_dense_id_count", None)
    # local vocab rank decided UP FRONT when the input is provably small
    # (known row count, or Catalyst's free size estimate for the docs
    # plan): the tf.count() materialization job exists only to (a) pick
    # local vs two-phase rank and (b) shield the two-phase path's
    # range-bounds sampler from re-running the tokenizer — both moot
    # when the local rank is already committed, so the build drops one
    # driver barrier (guide §1.2: fewer passes; the first consumer job
    # materializes the persisted tf instead).
    est = _plan_size_bytes(docs)
    local_rank = (
        (n_docs_hint is not None and int(n_docs_hint) <= LOCAL_TERM_RANK_DOCS_MAX)
        or (est is not None and est <= LOCAL_TERM_RANK_EST_BYTES)
    ) or None  # None = unknown, fall back to the n_tf count
    if repartition:
        # D1: spread the corpus over all cores before the tokenize pass —
        # a single-file parquet scan (or a broadcast-join output) otherwise
        # arrives in 1-2 partitions and serializes the expensive Arrow
        # stage. 3 tasks/core smooths stragglers; for small inputs the
        # width is derived from the size estimate instead (a 600 KB corpus
        # across 96 tasks is pure scheduling overhead — guide §2 "make
        # partitioning scale-adaptive"). Callers with an already
        # well-partitioned source pass repartition=False and skip the
        # (10^12-row) extra shuffle.
        nparts = 3 * par
        if est is not None:
            nparts = max(8, min(nparts, -(-est // (1024 * 1024))))
        docs = docs.repartition(nparts)
    # one Arrow pass: tokenize + per-doc tf histogram (no explode shuffle)
    tf = doc_terms(docs, analyzer=analyzer).persist()
    if local_rank:
        n_tf = None
    else:
        # materialize the cache NOW with a plain count: leaving it to the
        # term ranking's range-bounds sampling job pipelines the expensive
        # double Python stage under the sampler and was measured 3-10x
        # slower than count-then-sample on this box (and the count is the
        # posting-row metric the build manifest wants anyway)
        n_tf = tf.count()

    # N is a free byproduct of the dense-id prefix sum when available;
    # without it the corpus count (and the doc-id bounds the packed
    # encode needs) fuse into _finish_index's one scalar-stats job
    n_docs_cnt = int(n_docs_hint) if n_docs_hint is not None else None
    idx = _finish_index(
        spark, tf, docs.select("doc_id", "url"), n_docs_cnt,
        build_blocks=build_blocks, k1=k1, b=b, salt_df_agg=salt_df_agg,
        cleanup=cleanup, doc_split_bits=doc_split_bits,
        doc_split_threshold=doc_split_threshold, id_strategy=id_strategy,
        n_tf=n_tf, local_rank=local_rank,
        doc_id_bounds=(
            (0, int(n_docs_hint) - 1)
            if n_docs_hint is not None and int(n_docs_hint) > 0
            else None
        ),
    )
    idx.analyzer = analyzer
    if build_positional:
        # a second Arrow pass over the docs (positions need the token
        # stream the tf histogram already collapsed); reuses the same
        # partitioning, shuffles only (term_id, doc_id, positions).
        # With an analyzer, survivors keep ORIGINAL token positions
        # (Lucene position-increment gaps) and doclen counts survivors.
        from dpr_spark.query.phrase import build_positions

        idx.positions = build_positions(
            docs.select("doc_id", "text"), idx.dictionary, analyzer=analyzer
        )
    return idx


# vocab dense-rank strategy: when the materialized posting-row count (an
# upper bound on vocab size) is at or below this, term_id assignment uses
# the single-partition window rank (one exchange, zero extra jobs)
# instead of the two-phase ranged rank (a sampling job + a counts job per
# build — pure fixed cost that a vocab-sized sort never repays below
# ~10^7 rows). Above it the scalable two-phase path is unchanged; tune
# via the env knob for cluster deployments.
LOCAL_TERM_RANK_MAX = int(
    os.environ.get("DPR_SPARK_LOCAL_TERM_RANK_MAX", str(32_000_000))
)
# doc-count twin of LOCAL_TERM_RANK_MAX: when the caller already knows
# the corpus row count (ranged_parts prefix sum / dense-id hint), a
# corpus at or below this many docs commits to the local vocab rank
# WITHOUT running the tf.count() materialization job first (one fewer
# driver barrier per build). Vocabulary grows sublinearly in docs
# (Heaps' law), so 1M web docs bound the single-task vocab sort at a
# few million terms — far under LOCAL_TERM_RANK_MAX's intent.
LOCAL_TERM_RANK_DOCS_MAX = int(
    os.environ.get("DPR_SPARK_LOCAL_TERM_RANK_DOCS_MAX", str(1_000_000))
)
# plan-size twin for callers with NO row count (entry queries building
# from a parquet scan): when Catalyst's sizeInBytes estimate for the
# docs plan is at or below this, the build likewise commits to the
# local vocab rank up front and skips the tf.count() job. 64 MB of
# source text tokenizes to well under LOCAL_TERM_RANK_MAX postings.
LOCAL_TERM_RANK_EST_BYTES = int(
    os.environ.get("DPR_SPARK_LOCAL_TERM_RANK_EST_BYTES", str(64 * 1024 * 1024))
)


def _plan_size_bytes(df: DataFrame) -> Optional[int]:
    """Catalyst's optimizer size estimate for a plan (bytes) — free
    (driver-side, no job). For parquet scans this is file-size-derived
    and reliable; opaque plans report huge defaults, which safely fall
    through every "small" test."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
# encode-shuffle packing: ship idf to the encode kernel as a broadcast
# numpy array (indexed by dense term_id) when the vocab is at most this
# many terms (8 B/term); larger vocabs fall back to the idf-on-the-row
# flow
IDF_BCAST_MAX = int(os.environ.get("DPR_SPARK_IDF_BCAST_MAX", str(1 << 24)))


def _finish_index(
    spark: SparkSession,
    tf: DataFrame,
    docs: DataFrame,
    n_docs_cnt: Optional[int],
    build_blocks: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
    salt_df_agg: int = 0,
    cleanup: Optional[list] = None,
    doc_split_bits: Optional[int] = None,
    doc_split_threshold: int = 8_000_000,
    id_strategy: Optional[str] = None,
    n_tf: Optional[int] = None,
    doc_id_bounds: Optional[tuple] = None,
    local_rank: Optional[bool] = None,
) -> InvertedIndex:
    """Shared back half of the build: a materialized tf cache + a
    (doc_id, url) view -> dictionary/stats/postings/blocks.
    sum(doclen) == sum(tf) rides on the df aggregation (one fewer full
    pass over the tf cache); zero-token docs contribute 0 to the sum
    while still counting in N — exactly the oracle's arithmetic.

    n_tf: the caller's already-materialized posting-row count — selects
    the local vs two-phase term rank (LOCAL_TERM_RANK_MAX) when
    `local_rank` is None (callers that committed up front — known-small
    doc count or plan-size estimate — pass local_rank=True and skip the
    count job entirely). n_docs_cnt None fuses the corpus count (plus
    the doc-id bounds the packed encode shuffle needs) into the ONE
    scalar-stats job instead of a separate count() job. doc_id_bounds:
    (min, max) when the caller already knows them (dense ids: (0, N-1))."""
    cleanup = cleanup if cleanup is not None else []
    par = spark.sparkContext.defaultParallelism

    # docstats TABLE stays lazy (used by eval joins / save, not by the
    # build critical path); zero-token docs kept via left join.
    doclens = tf.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("doclen"))
    docstats = (
        docs.select("doc_id", "url")
        .join(doclens, "doc_id", "left")
        .withColumn("doclen", F.coalesce("doclen", F.lit(0)))
    )

    # A6: document frequency. tf rows are distinct per (term,doc), so df
    # is a plain count — map-side partial agg bounds head-term skew;
    # salt_df_agg>0 forces an explicit two-level salted merge (plans/skew.py).
    if salt_df_agg > 0:
        from dpr_spark.plans.skew import salted_count

        df_by_term = salted_count(tf, key="term", salt_col="doc_id", buckets=salt_df_agg)
        df_by_term = df_by_term.join(
            tf.groupBy("term").agg(F.sum("tf").alias("ttf")), "term"
        )
    else:
        df_by_term = tf.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("ttf")
        )

    from dpr_spark.plans.ids import assign_dense_ids

    if local_rank is None:
        local_rank = n_tf is not None and n_tf <= LOCAL_TERM_RANK_MAX
    ranked = assign_dense_ids(
        df_by_term, "term", "term_id", cleanup=cleanup, local=local_rank
    )
    if local_rank:
        # vocab-sized; persisted so downstream consumers (scalar stats,
        # the postings/blocks broadcast, entry queries) don't re-run the
        # df aggregation + sort per job
        ranked = ranked.persist()
        cleanup.append(ranked)
    # scalar corpus stats off the ranked dictionary — a vocab-sized job,
    # not another 10^10-row tf pass; max(df) rides along to drive the
    # head-term split decision for the encode shuffle, count(*) (the
    # vocab size = max term_id + 1) the packed-encode guard. When the
    # caller didn't pre-count the corpus, the doc-side scalars run as a
    # second branch of the SAME job (crossJoin of two 1-row aggregates)
    # instead of a separate count() action. When the corpus count IS
    # known and the encode will need the vocab idf broadcast anyway
    # (local-ranked blocks build with known doc-id bounds), the stats
    # FUSE into that vocab-sized toPandas pull — one job instead of two;
    # idf is computed by the same Spark expression inside the pull job,
    # so packed-encode scores stay bit-identical.
    idf_pdf = None
    n_docs = float(n_docs_cnt) if n_docs_cnt else 0.0
    idf_col = F.log(
        (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    fused_pull = (
        build_blocks
        and local_rank
        and n_docs_cnt is not None
        and doc_id_bounds is not None
        and doc_id_bounds[0] >= 0
        and doc_id_bounds[1] < (1 << 31)
    )
    if fused_pull:
        idf_pdf = (
            ranked.select("term_id", "df", "ttf", idf_col.alias("idf")).toPandas()
        )
        sum_dl = int(idf_pdf["ttf"].sum()) if len(idf_pdf) else 0
        max_df = int(idf_pdf["df"].max()) if len(idf_pdf) else 0
        n_vocab = len(idf_pdf)
    else:
        term_agg = ranked.agg(
            F.sum("ttf").alias("sd"), F.max("df").alias("md"), F.count("*").alias("nv")
        )
        if n_docs_cnt is None:
            drow = docs.agg(
                F.count("*").alias("nd"),
                F.min("doc_id").alias("dmin"),
                F.max("doc_id").alias("dmax"),
            )
            srow = term_agg.crossJoin(drow).collect()[0]
            n_docs_cnt = int(srow["nd"])
            if doc_id_bounds is None and srow["dmin"] is not None:
                doc_id_bounds = (int(srow["dmin"]), int(srow["dmax"]))
        else:
            srow = term_agg.collect()[0]
        sum_dl, max_df = srow["sd"] or 0, srow["md"] or 0
        n_vocab = int(srow["nv"] or 0)
    stats = IndexStats(n_docs_cnt, float(sum_dl) / n_docs_cnt if n_docs_cnt else 0.0)

    if doc_split_bits is None and max_df > doc_split_threshold:
        import math

        # doc-ranges of 2^s docs so the densest term contributes about
        # threshold/2 postings per range: 2^s ~= n_docs * (thr/2) / max_df
        target = max(1.0, n_docs_cnt * (doc_split_threshold / 2.0) / max_df)
        doc_split_bits = max(1, int(math.floor(math.log2(target))))

    n_docs = float(stats.n_docs)
    dictionary = (
        ranked.withColumn(
            "idf",
            F.log((F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
        )
        # rterm (reversed term) makes trailing-literal globs ("*ing")
        # prunable: rterm.startswith(reverse(literal)) is a plain
        # StringStartsWith the parquet dictionary scan can push, where a
        # filter on reverse(term) computed at query time could not be
        # (r4 VERDICT What's-wrong #1). Vocab-sized cost (~bytes/term).
        .select("term", F.reverse("term").alias("rterm"), "term_id", "df", "idf")
    )

    postings = (
        tf.join(F.broadcast(dictionary.select("term", "term_id", "idf")), "term")
        .select("term_id", "doc_id", "tf", "doclen", "idf")
    )

    blocks = None
    if build_blocks:
        # packed encode shuffle: when term_id and doc_id both fit 31 bits
        # (dense vocab rank + known doc-id bounds) and the vocab is small
        # enough to broadcast its idf column as a numpy array, the encode
        # input crosses the shuffle AND the Python boundary as TWO packed
        # int64 columns instead of four — the boundary's per-cell cost
        # dominates this stage (guide §2.3 "narrower types" / §8 "shuffle
        # keys, not payloads"); the kernel recomputes the float64 impact
        # with the exact impact_expr operation order, so blocks are
        # bit-identical (asserted in tests/test_codec.py)
        pack_ids = (
            doc_id_bounds is not None
            and doc_id_bounds[0] >= 0
            and doc_id_bounds[1] < (1 << 31)
            and 0 < n_vocab <= (1 << 31)
            and n_vocab <= IDF_BCAST_MAX
        )
        if pack_ids:
            if idf_pdf is None:
                idf_pdf = dictionary.select("term_id", "idf").toPandas()
            idf_arr = np.zeros(n_vocab, dtype=np.float64)
            idf_arr[idf_pdf["term_id"].to_numpy(np.int64)] = idf_pdf[
                "idf"
            ].to_numpy(np.float64)
            blocks = _encode_blocks(
                postings, stats.avgdl, k1=k1, b=b, num_partitions=2 * par,
                doc_split_bits=doc_split_bits,
                idf_by_term_id=spark.sparkContext.broadcast(idf_arr),
            )
        else:
            # explicit partition count: without it AQE coalesces the
            # encode shuffle to ~64MB partitions, idling most cores in
            # the stage; 2 tasks/core smooths head-term skew
            blocks = _encode_blocks(
                postings, stats.avgdl, k1=k1, b=b, num_partitions=2 * par,
                doc_split_bits=doc_split_bits,
            )
    return InvertedIndex(
        docstats, dictionary, postings.drop("idf"), blocks, stats,
        cached=[tf, docstats] + cleanup,
        id_strategy=id_strategy,
        doc_id_bounds=doc_id_bounds,
    )


def impact_expr(avgdl: float, k1: float = BM25_K1, b: float = BM25_B):
    """The query-independent BM25 component as a column (float64, same
    operation order as oracle/bm25.py::score_one)."""
    return (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl))
        )
    )


def _encode_blocks(
    postings: DataFrame,
    avgdl: float,
    k1: float,
    b: float,
    num_partitions: Optional[int] = None,
    doc_split_bits: Optional[int] = None,
    idf_by_term_id=None,
) -> DataFrame:
    """Compressed posting blocks: slim the shuffle (impact precomputed,
    doclen/idf dropped), HASH repartition on term_id, then ONE numpy
    lexsort + vectorized encode per partition (SURVEY.md §4.2).

    Hash partitioning (vs repartitionByRange) skips Spark's range-bounds
    sampling job, which would execute the postings join TWICE — measured
    ~25% of the blocks-phase wall time. Spark's per-row
    sortWithinPartitions is likewise replaced by the encoder's np.lexsort
    (~2x faster for this narrow schema).

    Skew: a term's postings land in one task (best compression — gaps
    stay dense). Max task skew is max(df)·16B; at 10^12 docs a head term
    ("the", df≈N) must be split: doc_split_bits=s adds doc_id>>s to the
    shuffle key so each term splits into doc-ranges of 2^s docs. Blocks
    stay globally ordered without coordination because block_id is the
    block's first doc_id and the ranges are doc_id-disjoint.
    """
    # doc_split_bits=0 would diverge between the shuffle key (shiftright
    # by 0 == per-doc scatter) and the encoder (falsy -> no run breaks):
    # normalize it to "no split" so both sites agree
    if doc_split_bits is not None and doc_split_bits < 1:
        doc_split_bits = None
    parts = [num_partitions] if num_partitions else []

    if idf_by_term_id is not None:
        # packed flow (guarded by the caller: term_id and doc_id fit 31
        # bits, tf/doclen always fit 32): TWO int64 columns cross the
        # shuffle and the Python boundary — td = term_id<<32 | doc_id,
        # dt = doclen<<32 | tf — and the kernel recomputes the impact in
        # float64 with impact_expr's exact operation order from the
        # broadcast idf (so scores, block maxes and block bytes are
        # bit-identical to the unpacked flow, asserted in
        # tests/test_codec.py). 16 B/posting on the wire instead of 24,
        # and half the per-cell boundary cost.
        packed = postings.select(
            (F.shiftleft(F.col("term_id"), 32).bitwiseOR(F.col("doc_id"))).alias("td"),
            (
                F.shiftleft(F.col("doclen").cast("long"), 32).bitwiseOR(F.col("tf"))
            ).alias("dt"),
        )
        k1p1 = k1 + 1.0
        one_minus_b = 1.0 - b

        def encode_packed(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            tds, dts = [], []
            for p in it:
                if len(p):
                    tds.append(p["td"].to_numpy(np.int64))
                    dts.append(p["dt"].to_numpy(np.int64))
            if not tds:
                return
            td = np.concatenate(tds) if len(tds) > 1 else tds[0]
            dt = np.concatenate(dts) if len(dts) > 1 else dts[0]
            t = td >> np.int64(32)
            d = td & np.int64(0xFFFFFFFF)
            dl = (dt >> np.int64(32)).astype(np.float64)
            f = dt & np.int64(0xFFFFFFFF)
            idf = idf_by_term_id.value
            # impact_expr's exact float64 op order, then the same f32
            # round-trip the unpacked flow's float cast performs
            tf_f = f.astype(np.float64)
            s = ((idf[t] * tf_f) * k1p1) / (
                tf_f + k1 * (one_minus_b + (b * dl) / avgdl)
            )
            s = s.astype(np.float32).astype(np.float64)
            order = np.lexsort((d, t))
            ds = d.take(order)
            splits = (ds >> np.int64(doc_split_bits)) if doc_split_bits else None
            out = _encode_arrays(
                t.take(order), ds, f.take(order), s.take(order),
                run_breaks=splits,
            )
            if out is not None:
                yield out

        keys = [F.shiftrightunsigned(F.col("td"), 32)]
        if doc_split_bits is not None:
            keys.append(
                F.shiftright(
                    F.col("td").bitwiseAND(F.lit(0xFFFFFFFF)), doc_split_bits
                )
            )
        return packed.repartition(*parts, *keys).mapInPandas(
            encode_packed, POSTINGS_BLOCK_SCHEMA
        )

    slim = postings.select(
        "term_id",
        "doc_id",
        F.col("tf").cast("int").alias("tf"),
        # float32 on the wire: block_max_score is stored float32 anyway,
        # and round-to-nearest is monotone, so max(f32(x)) == f32(max(x))
        # — identical block maxes, 4 fewer bytes per shuffled posting
        impact_expr(avgdl, k1, b).cast("float").alias("score"),
    )

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stay in numpy end-to-end: pandas DataFrame take (iloc[order])
        # measured ~5s/1M rows vs ~0.1s for four array takes
        ts, ds, fs, ss = [], [], [], []
        for p in it:
            if len(p):
                ts.append(p["term_id"].to_numpy(np.int64))
                ds.append(p["doc_id"].to_numpy(np.int64))
                fs.append(p["tf"].to_numpy(np.int64))
                ss.append(p["score"].to_numpy(np.float64))
        if not ts:
            return
        t = np.concatenate(ts) if len(ts) > 1 else ts[0]
        d = np.concatenate(ds) if len(ds) > 1 else ds[0]
        f = np.concatenate(fs) if len(fs) > 1 else fs[0]
        s = np.concatenate(ss) if len(ss) > 1 else ss[0]
        order = np.lexsort((d, t))
        # with head-term splitting, one partition can hold several
        # NON-contiguous doc-ranges of the same term (hash collisions):
        # break block runs at range boundaries so every block stays inside
        # one 2^s doc-range and blocks remain doc-disjoint term-wide
        splits = (d.take(order) >> np.int64(doc_split_bits)) if doc_split_bits else None
        out = _encode_arrays(
            t.take(order), d.take(order), f.take(order), s.take(order),
            run_breaks=splits,
        )
        if out is not None:
            yield out

    keys = [F.col("term_id")]
    if doc_split_bits is not None:
        keys.append(F.shiftright(F.col("doc_id"), doc_split_bits))
    return slim.repartition(*parts, *keys).mapInPandas(encode, POSTINGS_BLOCK_SCHEMA)


def _encode_pdf(pdf: pd.DataFrame):
    """Test/compat wrapper over _encode_arrays for a sorted DataFrame."""
    if len(pdf) == 0:
        return None
    return _encode_arrays(
        pdf["term_id"].to_numpy(np.int64),
        pdf["doc_id"].to_numpy(np.int64),
        pdf["tf"].to_numpy(np.int64),
        pdf["score"].to_numpy(np.float64),
    )


def _encode_arrays(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    score: np.ndarray,
    buckets: Optional[np.ndarray] = None,
    run_breaks: Optional[np.ndarray] = None,
):
    """Encode one sorted ([bucket,] term_id, doc_id) run into posting
    blocks. Fully vectorized: ONE varint pass over the whole chunk, then
    blocks are byte-range slices of the shared buffer (no per-block
    encode). With `buckets`, runs additionally break on bucket change and
    the output carries the bucket column (doc-bucketed serving layout,
    query/blockmax.py). `run_breaks` breaks runs on value change without
    emitting a column (head-term doc-range splits)."""
    from dpr_spark.index.codec import varint_encode_with_lengths

    n_rows = len(term_ids)
    if n_rows == 0:
        return None

    # block starts: every term-run start, then every BLOCK_SIZE within a run
    run_start = np.r_[True, term_ids[1:] != term_ids[:-1]]
    if buckets is not None:
        run_start |= np.r_[True, buckets[1:] != buckets[:-1]]
    if run_breaks is not None:
        run_start |= np.r_[True, run_breaks[1:] != run_breaks[:-1]]
    pos_in_run = np.arange(n_rows) - np.maximum.accumulate(
        np.where(run_start, np.arange(n_rows), 0)
    )
    is_block_start = run_start | (pos_in_run % BLOCK_SIZE == 0)
    starts = np.flatnonzero(is_block_start)
    ends = np.r_[starts[1:], n_rows]

    # delta-gap doc ids: first of each block absolute, rest deltas
    gaps = np.empty(n_rows, dtype=np.int64)
    gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    gaps[starts] = doc_ids[starts]

    ids_buf, ids_len = varint_encode_with_lengths(gaps)
    tfs_buf, tfs_len = varint_encode_with_lengths(tfs)
    ids_off = np.r_[0, np.cumsum(ids_len)]
    tfs_off = np.r_[0, np.cumsum(tfs_len)]
    maxes = np.maximum.reduceat(score, starts)

    ids_mv = memoryview(ids_buf)
    tfs_mv = memoryview(tfs_buf)
    return pd.DataFrame(
        {
            **({"bucket": buckets[starts].astype(np.int32)} if buckets is not None else {}),
            "term_id": term_ids[starts],
            "block_id": doc_ids[starts],
            "n": (ends - starts).astype(np.int32),
            "doc_ids": [bytes(ids_mv[ids_off[s] : ids_off[e]]) for s, e in zip(starts, ends)],
            "tfs": [bytes(tfs_mv[tfs_off[s] : tfs_off[e]]) for s, e in zip(starts, ends)],
            "block_max_score": maxes.astype(np.float32),
        }
    )
