"""Exact-phrase search over positional postings (Lucene-parity feature).

The reference's BM25 baseline is Lucene (`/root/reference/README.md`
cites the BM25 rows of Karpukhin et al. 2020 Table 1; DPR hands the
corpus to Lucene via the CSV exporter `dpr/data/tables.py:241`).
Lucene's `PhraseQuery` matches documents where the phrase terms occur
at consecutive positions and scores them with BM25 where

    tf  = phrase frequency (number of adjacent occurrences), and
    idf = sum of the per-term idfs over the phrase's positions
          (duplicate terms counted once per position, as in
          `PhraseWeight`).

This module reproduces that contract Spark-first:

- positions come from ONE fused Arrow pass (`doc_term_positions`) that
  tokenizes and groups positions per (doc, term) inside the kernel —
  a doc's tokens never leave its partition, so there is no
  explode-positions shuffle (same design as `index/build.py:doc_terms`);
- at query time the kernel takes the phrase VOCABULARY as a filter, so
  over a 10^12-doc corpus the emitted rows are only the postings of the
  handful of phrase terms, not the full positional index;
- adjacency verification is pure Catalyst: per (query, doc) the start
  positions of the first term are folded through
  ``aggregate(rest, p0, (acc, x) -> filter(acc, p -> array_contains(
  x.positions, p + x.off)))`` — a per-row O(phrase_len * occurrences)
  expression with no Python and no extra shuffle;
- persistent indexes can carry a positional postings table
  (`build_positions`, saved/loaded by `InvertedIndex` when present),
  the parquet analog of Lucene's .prx/.pos files: (term_id, doc_id,
  positions array<int>) sorted by term_id — scoring joins it exactly
  like the tf postings.

Scale notes (100 TB): the query-time path shuffles only (qid, doc_id,
off, positions) rows for docs containing at least one phrase term —
the same candidate volume the BM25 term join ships. The groupBy key is
(qid, doc_id); a pathological phrase of two stopwords degenerates to
the same candidate set a 2-stopword BM25 query already produces.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K

POSITIONS_SCHEMA = "doc_id long, doclen int, term string, tf long, positions array<int>"


def positions_batch(
    texts, pat, vocab: Optional[frozenset] = None, vocab_map=None,
    split_lists: bool = True,
) -> Optional[tuple]:
    """Vectorized tokenize + per-(doc, term) position-list grouping.

    Same numpy shape as `index/build.py:tf_batch` with one extra gather:
    token positions ride a stable argsort of (doc, term) so each group's
    positions come out ascending. When `vocab` is given, only those
    terms' rows are materialized (query-time path).

    vocab_map (Analyzer.map_vocab) applies the analysis chain VOCAB-
    level, like tf_batch: dropped (stopword) terms lose their rows but
    the SURVIVORS KEEP THEIR ORIGINAL TOKEN POSITIONS — Lucene's
    position-increment gap — while doclen switches to the surviving
    count (the same norm the tf postings carry). Two raw terms stemming
    to one vocab entry merge their position lists (the stable key sort
    keeps each merged list ascending). The analyzer runs BEFORE the
    vocab filter, so a query-time vocab is in analyzed terms."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dpr_spark.functions.tokenizer import _all_ascii, tokenize_ascii_arrow

    # ASCII fast path: the index build's Arrow tokenizer (token-identical
    # to the regex kernel by tests/test_tokenizer.py) + dictionary codes;
    # positions are indexes into each row's flat token run either way.
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts
    else:
        arr = pa.array(texts, type=pa.string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if _all_ascii(arr):
        flat_pa, lens = tokenize_ascii_arrow(arr)
        total = int(lens.sum())
        if total == 0:
            return None
        enc = pc.dictionary_encode(flat_pa)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        terms = enc.dictionary.to_numpy(zero_copy_only=False)
        n_rows = len(lens)
    else:
        tok_lists = [pat.findall(t) for t in arr.to_pylist()]
        lens = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return None
        flat = pd.Series([tok for toks in tok_lists for tok in toks], dtype="object")
        codes_raw, vocab_raw = pd.factorize(flat, sort=False)
        code_map, terms = pd.factorize(pd.Series(vocab_raw).str.lower(), sort=False)
        codes = code_map[codes_raw].astype(np.int64)
        n_rows = len(tok_lists)
    doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - starts[doc_idx]
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
        if not keep.any():
            return None
        codes, doc_idx, pos = codes[keep], doc_idx[keep], pos[keep]
        terms = terms2
        lens = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
    if vocab is not None:
        keep_codes = np.flatnonzero(
            pd.Series(terms).isin(vocab).to_numpy()
        )
        mask = np.isin(codes, keep_codes)
        if not mask.any():
            return None
        codes, doc_idx, pos = codes[mask], doc_idx[mask], pos[mask]
    key = (doc_idx << np.int64(32)) | codes
    order = np.argsort(key, kind="stable")
    skey = key[order]
    spos = pos[order].astype(np.int32)
    ukey, first = np.unique(skey, return_index=True)
    counts = np.diff(np.append(first, len(skey)))
    u_doc = (ukey >> np.int64(32)).astype(np.int64)
    u_code = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
    if not split_lists:
        # raw form for Arrow-native callers: the sorted flat positions +
        # group offsets build a ListArray directly (np.split into millions
        # of per-group Python arrays was the dominant kernel cost)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        return (
            u_doc, lens, terms.take(u_code), counts.astype(np.int64),
            spos, offsets,
        )
    pos_lists = np.split(spos, np.cumsum(counts)[:-1])
    return u_doc, lens, terms.take(u_code), counts.astype(np.int64), pos_lists


def doc_term_positions(
    docs: DataFrame, vocab: Optional[Sequence[str]] = None, analyzer=None
) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, doclen, term, tf, positions).

    One Arrow pass; with `vocab` set only those terms are emitted
    (the 100 TB query-time shape — the kernel is the pushed-down
    filter, since a Python stage can't push predicates to the scan)."""
    from dpr_spark.functions.tokenizer import _compiled_fast

    vset = frozenset(vocab) if vocab is not None else None
    vocab_map = analyzer.map_vocab if analyzer is not None else None

    def run(it):
        import pyarrow as pa

        pat = _compiled_fast()
        for batch in it:
            out = positions_batch(
                batch.column(1), pat, vset, vocab_map=vocab_map,
                split_lists=False,
            )
            if out is None:
                continue
            u_doc, lens, terms, tfs, spos, offsets = out
            doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids[u_doc], type=pa.int64()),
                    pa.array(lens[u_doc].astype(np.int32), type=pa.int32()),
                    pa.array(terms, type=pa.string()),
                    pa.array(tfs, type=pa.int64()),
                    pa.ListArray.from_arrays(
                        pa.array(offsets, type=pa.int32()),
                        pa.array(spos, type=pa.int32()),
                    ),
                ],
                names=["doc_id", "doclen", "term", "tf", "positions"],
            )

    return docs.select("doc_id", "text").mapInArrow(run, POSITIONS_SCHEMA)


def build_positions(docs: DataFrame, dictionary: DataFrame, analyzer=None) -> DataFrame:
    """Positional postings for a persistent index (the .pos analog):
    (term_id, doc_id, tf, doclen, positions), term-keyed like the tf
    postings — doclen rides along (like the tf postings' norm) so a
    phrase query never joins the doc-count-sized docstats table.
    Parquet's int-list encoding delta-compresses the ascending position
    arrays; a broadcast dictionary join swaps the term string for the
    8-byte id before anything shuffles."""
    pos = doc_term_positions(docs, analyzer=analyzer)
    return pos.join(
        F.broadcast(dictionary.select("term", "term_id")), "term"
    ).select("term_id", "doc_id", "tf", "doclen", "positions")


def _phrase_offsets(phrases: Sequence[Tuple[int, str]], analyzer=None):
    """[(qid, phrase)] -> ([(qid, off, term)], vocab). Tokenized with the
    reference tokenizer after question normalization (’ -> ',
    `dpr/utils/data_utils.py:63-65`); phrases are user queries (tiny,
    driver-side). With an analyzer, offsets are the ORIGINAL token
    indices of surviving tokens (position-increment gaps, mirroring the
    analyzed positions table): the phrase "the fast scan" keeps
    fast@1/scan@2, matching docs where the stopword sat between them."""
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    rows: List[Tuple[int, int, str]] = []
    vocab: set = set()
    for qid, phrase in phrases:
        toks = tokenize(normalize_question(phrase))
        pairs = (
            analyzer.analyze_with_positions(toks)
            if analyzer is not None
            else list(enumerate(toks))
        )
        if pairs and pairs[0][0] != 0:
            # rebase so the first surviving token is offset 0 (relative
            # gaps preserved): the verify folds anchor start positions
            # on the FIRST struct's positions, a leading stopword must
            # not shift every anchor
            base_off = pairs[0][0]
            pairs = [(off - base_off, t) for off, t in pairs]
        for off, t in pairs:
            rows.append((qid, off, t))
            vocab.add(t)
    return rows, sorted(vocab)


def _choose_two_pass(df_rows) -> bool:
    """Cost-based pass selection from exact dictionary stats.

    df_rows: [(qid, n_off, min_df, sum_df)]. Single-pass ships every
    matching position row WITH its array into the groupBy (≈ Σ sum_df
    array rows). Two-pass ships arrays only for conjunction survivors,
    bounded by n_off × min_df per query, but pays a second arrayless
    probe. Choose two-pass when its array-row bound is under half the
    single-pass volume — i.e. when the rarest term actually filters
    (a stopword-only phrase keeps the one-shuffle plan)."""
    single = sum(r[3] for r in df_rows)
    two = sum(r[1] * r[2] for r in df_rows)
    return two * 2 < single


def _single_pass_grouped(cand: DataFrame, n_off: DataFrame) -> DataFrame:
    return (
        cand.groupBy("qid", "doc_id")
        .agg(
            F.first("doclen").alias("doclen"),
            F.collect_list("st").alias("structs"),
        )
        .join(F.broadcast(n_off), "qid")
        .filter(F.size("structs") == F.col("n_off"))
        .drop("n_off")
    )


def _conjunctive_docs(light: DataFrame, n_off: DataFrame) -> DataFrame:
    """light(qid, doc_id, doclen, off) -> (qid, doc_id, doclen) for docs
    matching EVERY phrase offset. The light pass ships no position
    arrays — head-term arrays for docs that can never match (missing
    one of the other terms) stay columnar at rest; only the (usually
    tiny) conjunction survivors fetch arrays in the second pass, which
    AQE broadcast-joins at runtime."""
    return (
        light.groupBy("qid", "doc_id")
        .agg(F.first("doclen").alias("doclen"), F.count("*").alias("n_res"))
        .join(F.broadcast(n_off), "qid")
        .filter(F.col("n_res") == F.col("n_off"))
        .select("qid", "doc_id", "doclen")
    )


def _grouped_structs(cand: DataFrame, survivors: DataFrame) -> DataFrame:
    """Second pass: fetch (off, positions) structs only for conjunction
    survivors and group them per (qid, doc_id)."""
    return (
        cand.join(survivors.select("qid", "doc_id"), ["qid", "doc_id"])
        .groupBy("qid", "doc_id")
        .agg(
            F.first("doclen").alias("doclen"),
            F.collect_list("st").alias("structs"),
        )
    )


def _verify_and_count(grouped: DataFrame) -> DataFrame:
    """grouped(qid, doc_id, doclen, n_off, structs<off,positions>) ->
    (qid, doc_id, doclen, pf) for pf > 0. structs are sorted by off;
    the fold keeps only start positions that survive every offset."""
    s = F.sort_array("structs")
    base = F.element_at(s, 1)["positions"]
    rest = F.slice(s, 2, F.size(s) - 1)
    surviving = F.aggregate(
        rest,
        base,
        lambda acc, x: F.filter(
            acc, lambda p: F.array_contains(x["positions"], p + x["off"])
        ),
    )
    return (
        grouped.withColumn("pf", F.size(surviving))
        .filter(F.col("pf") > 0)
        .select("qid", "doc_id", "doclen", "pf")
    )


def _score_phrases(
    matched: DataFrame, idf_sums: DataFrame, avgdl: float, k1: float, b: float
) -> DataFrame:
    """BM25 with tf = phrase frequency, idf = per-query idf sum."""
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl)
    )
    pf = F.col("pf").cast("double")
    return matched.join(F.broadcast(idf_sums), "qid").select(
        "qid",
        "doc_id",
        (F.col("idf_sum") * pf * F.lit(k1 + 1.0) / (pf + norm)).alias("score"),
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


def phrase_search_docs(
    spark: SparkSession,
    docs: DataFrame,
    phrases: Sequence[Tuple[int, str]],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    corpus_stats: Optional[Tuple[int, float]] = None,
) -> DataFrame:
    """Phrase top-k straight off the raw pages table (no prebuilt index):
    one vocab-filtered positional pass + one Catalyst doclen aggregate.

    `corpus_stats=(n_docs, avgdl)` skips the stats scan when the caller
    already knows them (e.g. from an index manifest)."""
    qrows, vocab = _phrase_offsets(phrases)
    if not qrows:
        raise ValueError("no tokenizable phrases")
    qdf = spark.createDataFrame(qrows, "qid long, off int, term string")

    pos = doc_term_positions(docs, vocab=vocab).persist()
    try:
        if corpus_stats is None:
            # same Arrow tokenizer as the positional kernel (ADVICE r4:
            # the Catalyst lowercase-first spelling is only ASCII-equal
            # to _compiled_fast, so mixing them skews BM25 length
            # normalization on non-ASCII corpora)
            from dpr_spark.functions.tokenizer import tokenize_udf

            srow = (
                docs.select(F.size(tokenize_udf()(F.col("text"))).alias("dl"))
                .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
                .collect()[0]
            )
            n_docs, avgdl = int(srow["n"]), float(srow["avgdl"])
        else:
            n_docs, avgdl = corpus_stats

        # global df of each phrase term — the vocab-filtered pass carries
        # exactly the rows needed to count it
        df_tbl = pos.groupBy("term").agg(F.count("*").alias("df"))
        idf = F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        idf_sums = (
            qdf.join(F.broadcast(df_tbl), "term")
            .groupBy("qid")
            .agg(F.sum(idf).alias("idf_sum"), F.count("*").alias("n_terms"))
        )
        n_off = qdf.groupBy("qid").agg(F.count("*").alias("n_off"))

        cand = pos.join(F.broadcast(qdf), "term").select(
            "qid", "doc_id", "doclen", F.struct("off", "positions").alias("st")
        )
        df_rows = [
            (r["qid"], r["n_off"], r["min_df"], r["sum_df"])
            for r in qdf.join(F.broadcast(df_tbl), "term")
            .groupBy("qid")
            .agg(
                F.count("*").alias("n_off"),
                F.min("df").alias("min_df"),
                F.sum("df").alias("sum_df"),
            )
            .collect()
        ]
        if _choose_two_pass(df_rows):
            light = pos.join(F.broadcast(qdf), "term").select(
                "qid", "doc_id", "doclen", "off"
            )
            grouped = _grouped_structs(cand, _conjunctive_docs(light, n_off))
        else:
            grouped = _single_pass_grouped(cand, n_off)
        matched = _verify_and_count(grouped)
        # idf_sums drops queries with an out-of-vocabulary term via the
        # inner df join — matched is empty for those anyway (no postings)
        out = _topk(_score_phrases(matched, idf_sums, avgdl, k1, b), k)
        out = out.localCheckpoint(eager=True)  # cut lineage off the persist
        return out
    finally:
        pos.unpersist()


def _verify_and_count_near(grouped: DataFrame, window: int) -> DataFrame:
    """Span-near verify: pf = number of END positions p (over all term
    occurrences) where every query term occurs in (p - window, p].
    Deterministic, monotone in proximity and frequency — the unordered
    SpanNearQuery counting contract."""
    s = F.col("structs")
    ends = F.array_distinct(
        F.flatten(F.transform(s, lambda x: x["positions"]))
    )
    covered = F.filter(
        ends,
        lambda p: F.forall(
            s,
            lambda x: F.exists(
                x["positions"], lambda y: (y <= p) & (y > p - F.lit(window))
            ),
        ),
    )
    return (
        grouped.withColumn("pf", F.size(covered))
        .filter(F.col("pf") > 0)
        .select("qid", "doc_id", "doclen", "pf")
    )


def _near_terms(queries: Sequence[Tuple[int, str]], analyzer=None):
    """[(qid, query)] -> [(qid, off, term)] over DISTINCT terms (off is
    just an index so the phrase plumbing's n_off completeness check
    counts distinct terms; span-near is unordered, so no gap
    bookkeeping — the analyzer only stems/stops the term set)."""
    from dpr_spark.functions.analysis import analyze_query

    rows: List[Tuple[int, int, str]] = []
    for qid, q in queries:
        for off, t in enumerate(analyze_query(q, analyzer)):
            rows.append((qid, off, t))
    return rows


# largest resolved-id set pushed into the positions scan as an IN
# filter: small enough for a sane plan, large enough for every real
# phrase/span wave (ids are per distinct query TERM, not per doc)
MAX_SCAN_PRUNE_IDS = 4096


def _index_plumbing(spark: SparkSession, index, positions: DataFrame, qrows):
    """Shared candidate plumbing for positional-index searchers:
    (qid, off, term) rows -> (grouped structs per (qid, doc) for docs
    matching EVERY offset, per-qid idf sums for fully-resolved queries).
    Includes the cost-based single/two-pass selection priced from exact
    dictionary df stats.

    The one dictionary-resolution job collects (qid, off, term_id, df)
    — per (query, offset), the same payload the pass-pricer already
    shipped — and its distinct term_ids are pushed into the positions
    scan as an IN filter: on the at-rest parquet layout (sorted by
    term_id) that is row-group skipping, the .pos-seek analog."""
    qdf = spark.createDataFrame(qrows, "qid long, off int, term string")
    # offset rows broadcast INTO the dictionary scan, never the reverse
    qterms = index.dictionary.select("term", "term_id", "idf", "df").join(
        F.broadcast(qdf), "term"
    )
    n_off_all = qdf.groupBy("qid").agg(F.count("*").alias("n_off"))
    # queries whose every offset resolved (an OOV term can never match)
    idf_sums = (
        qterms.groupBy("qid")
        .agg(F.sum("idf").alias("idf_sum"), F.count("*").alias("n_res"))
        .join(n_off_all, "qid")
        .filter(F.col("n_res") == F.col("n_off"))
        .select("qid", "idf_sum")
    )
    rows = qterms.select("qid", "off", "term_id", "df").collect()
    # exact-stats pass selection: the dictionary's df column prices the
    # single-pass (all arrays) vs two-pass (arrayless probe + survivor
    # arrays) shuffle volumes before anything runs
    agg: dict = {}
    for r in rows:
        a = agg.setdefault(r["qid"], [0, None, 0])
        a[0] += 1
        a[1] = r["df"] if a[1] is None else min(a[1], r["df"])
        a[2] += r["df"]
    df_rows = [(q, a[0], a[1], a[2]) for q, a in agg.items()]
    ids = sorted({r["term_id"] for r in rows})
    if 0 < len(ids) <= MAX_SCAN_PRUNE_IDS:
        positions = positions.filter(F.col("term_id").isin(ids))
    qsel = F.broadcast(
        spark.createDataFrame(
            [(r["qid"], r["off"], r["term_id"]) for r in rows],
            "qid long, off int, term_id long",
        )
    )
    cand = positions.join(qsel, "term_id").select(
        "qid", "doc_id", "doclen", F.struct("off", "positions").alias("st")
    )
    if _choose_two_pass(df_rows):
        light = positions.join(qsel, "term_id").select(
            "qid", "doc_id", "doclen", "off"
        )
        grouped = _grouped_structs(cand, _conjunctive_docs(light, n_off_all))
    else:
        grouped = _single_pass_grouped(cand, n_off_all)
    return grouped, idf_sums


def span_near_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    queries: Sequence[Tuple[int, str]],
    window: int = 8,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Unordered proximity top-k over a prebuilt positional index
    (Lucene SpanNearQuery, inOrder=false, slop≈window): all the query's
    distinct terms must co-occur within a `window`-token span; tf = the
    qualifying end-position count, idf = per-term idf sum. Shares the
    phrase path's candidate plumbing including cost-based pass
    selection; an OOV term means no document can match."""
    qrows = _near_terms(queries, analyzer=getattr(index, "analyzer", None))
    if not qrows:
        raise ValueError("no tokenizable queries")
    grouped, idf_sums = _index_plumbing(spark, index, positions, qrows)
    matched = _verify_and_count_near(grouped, window)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)


def _verify_and_count_ordered(grouped: DataFrame, slop: int) -> DataFrame:
    """Ordered-span verify (Lucene SpanNearQuery inOrder=true / sloppy
    PhraseQuery middle ground, made deterministic): a match from start
    position p0 is the GREEDY in-order chain — for each next offset take
    the smallest position > the previous match — and it qualifies when
    its width cur - p0 + 1 <= n_terms + slop (Lucene's ordered-slop
    width bound; greedy minimizes the final position, so a qualifying
    chain exists iff the greedy one qualifies). pf = qualifying start
    positions; slop=0 degenerates to the exact-phrase count (asserted in
    tests/test_phrase_bool.py). Pure Catalyst fold over the per-offset
    position arrays — same shape as the adjacency fold, with a
    (start, cur) struct threaded through instead of a bare position."""
    s = F.sort_array("structs")
    base = F.element_at(s, 1)["positions"]
    rest = F.slice(s, 2, F.size(s) - 1)
    chains = F.aggregate(
        rest,
        F.transform(base, lambda p: F.struct(p.alias("start"), p.alias("cur"))),
        lambda acc, x: F.filter(
            F.transform(
                acc,
                lambda e: F.struct(
                    e["start"].alias("start"),
                    F.array_min(
                        F.filter(x["positions"], lambda y: y > e["cur"])
                    ).alias("cur"),
                ),
            ),
            lambda e: e["cur"].isNotNull(),
        ),
    )
    ok = F.filter(
        chains, lambda e: e["cur"] - e["start"] + 1 <= F.size(s) + F.lit(slop)
    )
    return (
        grouped.withColumn("pf", F.size(ok))
        .filter(F.col("pf") > 0)
        .select("qid", "doc_id", "doclen", "pf")
    )


def span_ordered_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    phrases: Sequence[Tuple[int, str]],
    slop: int = 2,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Ordered proximity top-k over a prebuilt positional index — the
    PhraseQuery(slop) / SpanNearQuery(inOrder=true) middle ground
    (r4 VERDICT Missing #4): the phrase's tokens must appear IN ORDER
    within a width of len(phrase) + slop tokens; tf = qualifying start
    positions (greedy-chain contract, _verify_and_count_ordered),
    idf = per-position idf sum, BM25 as in exact phrase. slop=0 is
    exactly phrase_search_index. Shares the phrase candidate plumbing
    (vocab-filtered positional probe, cost-based pass selection)."""
    if slop < 0:
        raise ValueError("slop must be >= 0")
    qrows, _ = _phrase_offsets(phrases, analyzer=getattr(index, "analyzer", None))
    if not qrows:
        raise ValueError("no tokenizable phrases")
    grouped, idf_sums = _index_plumbing(spark, index, positions, qrows)
    matched = _verify_and_count_ordered(grouped, slop)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)


def phrase_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    phrases: Sequence[Tuple[int, str]],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Phrase top-k over a prebuilt positional index: dictionary lookup
    for term_id + idf (broadcast the handful of phrase terms, probe the
    positions table in place); doclen rides on the positions rows, so
    the doc-count-sized docstats table is never touched."""
    qrows, _ = _phrase_offsets(phrases, analyzer=getattr(index, "analyzer", None))
    if not qrows:
        raise ValueError("no tokenizable phrases")
    grouped, idf_sums = _index_plumbing(spark, index, positions, qrows)
    matched = _verify_and_count(grouped)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)


def _verify_and_count_first(grouped: DataFrame, window: int, first_n: int) -> DataFrame:
    """SpanFirstQuery verify: like the unordered near contract but only
    END positions inside the document's first `first_n` tokens qualify
    (Lucene SpanFirstQuery(match, end) — spans ending past the boundary
    don't count). Positions are 0-based: p < first_n."""
    s = F.col("structs")
    ends = F.array_distinct(
        F.flatten(F.transform(s, lambda x: x["positions"]))
    )
    covered = F.filter(
        ends,
        lambda p: (p < F.lit(first_n))
        & F.forall(
            s,
            lambda x: F.exists(
                x["positions"], lambda y: (y <= p) & (y > p - F.lit(window))
            ),
        ),
    )
    return (
        grouped.withColumn("pf", F.size(covered))
        .filter(F.col("pf") > 0)
        .select("qid", "doc_id", "doclen", "pf")
    )


def span_first_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    queries: Sequence[Tuple[int, str]],
    window: int = 8,
    first_n: int = 50,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Lucene SpanFirstQuery top-k over a prebuilt positional index:
    the query's distinct terms must co-occur within a `window`-token
    span ENDING inside the document's first `first_n` tokens (lead-
    paragraph matching). tf = qualifying end count; same candidate
    plumbing, scoring and OOV semantics as span_near_search_index."""
    qrows = _near_terms(queries, analyzer=getattr(index, "analyzer", None))
    if not qrows:
        raise ValueError("no tokenizable queries")
    grouped, idf_sums = _index_plumbing(spark, index, positions, qrows)
    matched = _verify_and_count_first(grouped, window, first_n)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)


def span_or_near_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    queries: Sequence[Tuple[int, Sequence[Sequence[str]]]],
    window: int = 8,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """SpanOr-inside-SpanNear (Lucene SpanNearQuery over SpanOrQuery
    clauses): queries are [(qid, [clause...])] where each clause is a
    list of alternative terms; a document matches where EVERY clause has
    SOME alternative inside a `window`-token span. Alternative position
    lists are merged per clause before the window verify (SpanOr = the
    union of its sub-spans); clause idf = MAX idf among its resolved
    alternatives (deterministic; Lucene SpanOr takes the wrapping
    query's boost rather than summing). A clause with NO resolved
    alternative makes the query unmatchable (same OOV contract as the
    other span searchers)."""
    from dpr_spark.functions.analysis import analyze_query

    analyzer = getattr(index, "analyzer", None)
    rows: List[Tuple[int, int, str]] = []
    for qid, clauses in queries:
        for off, alts in enumerate(clauses):
            for alt in alts:
                for t in analyze_query(alt, analyzer):
                    rows.append((qid, off, t))
    if not rows:
        raise ValueError("no tokenizable queries")
    qdf = spark.createDataFrame(
        rows, "qid long, off int, term string"
    ).dropDuplicates()
    qterms = index.dictionary.select("term", "term_id", "idf").join(
        F.broadcast(qdf), "term"
    )
    n_off_all = (
        qdf.select("qid", "off").distinct()
        .groupBy("qid").agg(F.count("*").alias("n_off"))
    )
    idf_sums = (
        qterms.groupBy("qid", "off").agg(F.max("idf").alias("cidf"))
        .groupBy("qid")
        .agg(F.sum("cidf").alias("idf_sum"), F.count("*").alias("n_res"))
        .join(F.broadcast(n_off_all), "qid")
        .filter(F.col("n_res") == F.col("n_off"))
        .select("qid", "idf_sum")
    )
    qsel = F.broadcast(qterms.select("qid", "off", "term_id"))
    merged = (
        positions.join(qsel, "term_id")
        .groupBy("qid", "doc_id", "doclen", "off")
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("positions")))
            ).alias("positions")
        )
    )
    grouped = (
        merged.groupBy("qid", "doc_id", "doclen")
        .agg(
            F.collect_list(F.struct("off", "positions")).alias("structs"),
            F.count("*").alias("n_have"),
        )
        .join(F.broadcast(n_off_all), "qid")
        .filter(F.col("n_have") == F.col("n_off"))
        .select("qid", "doc_id", "doclen", "structs")
    )
    matched = _verify_and_count_near(grouped, window)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)


def span_not_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    queries: Sequence[Tuple[int, str, str]],
    dist: int = 3,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Lucene SpanNotQuery top-k: queries are [(qid, include, exclude)]
    single terms; an include occurrence counts only when NO exclude
    occurrence sits within `dist` tokens of it (pre/post exclusion,
    |e - p| <= dist). tf = surviving include occurrences; idf = the
    include term's idf; an unresolvable exclude term simply excludes
    nothing (Lucene: SpanNot with an empty exclusion matches the
    include span)."""
    from dpr_spark.functions.analysis import analyze_query

    analyzer = getattr(index, "analyzer", None)
    rows = []
    for qid, inc, exc in queries:
        it = analyze_query(inc, analyzer)
        et = analyze_query(exc, analyzer)
        if it:
            rows.append((qid, it[0], et[0] if et else None))
    if not rows:
        raise ValueError("no tokenizable queries")
    qdf = spark.createDataFrame(rows, "qid long, inc string, exc string")
    dic = index.dictionary.select("term", "term_id", "idf")
    inc_t = dic.join(
        F.broadcast(qdf.select("qid", F.col("inc").alias("term"))), "term"
    )
    exc_t = dic.select("term", "term_id").join(
        F.broadcast(
            qdf.filter(F.col("exc").isNotNull()).select(
                "qid", F.col("exc").alias("term")
            )
        ),
        "term",
    )
    idf_sums = inc_t.select("qid", F.col("idf").alias("idf_sum"))
    ipos = positions.join(
        F.broadcast(inc_t.select("qid", "term_id")), "term_id"
    ).select("qid", "doc_id", "doclen", F.col("positions").alias("ipos"))
    epos = positions.join(
        F.broadcast(exc_t.select("qid", "term_id")), "term_id"
    ).select("qid", "doc_id", F.col("positions").alias("epos"))
    joined = ipos.join(epos, ["qid", "doc_id"], "left").withColumn(
        "epos", F.coalesce("epos", F.array().cast("array<int>"))
    )
    surviving = F.filter(
        F.col("ipos"),
        lambda p: F.forall(
            F.col("epos"), lambda e: F.abs(e - p) > F.lit(dist)
        ),
    )
    matched = (
        joined.withColumn("pf", F.size(surviving))
        .filter(F.col("pf") > 0)
        .select("qid", "doc_id", "doclen", "pf")
    )
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)


def match_phrase_prefix_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    queries: Sequence[Tuple[int, str]],
    max_expansions: int = 16,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES ``match_phrase_prefix`` (Lucene MultiPhraseQuery with a
    prefix-expanded last position — the search-as-you-type query) over
    a prebuilt positional index.

    Contract: the query's LAST analyzed token is a prefix, expanded to
    the first `max_expansions` dictionary terms in TERM ORDER (the
    Lucene TermEnum contract ES documents for this query); earlier
    tokens keep exact-phrase adjacency. Last-offset positions are the
    union over expanded terms (MultiPhraseQuery position semantics);
    idf = sum of the exact offsets' idfs + MAX idf among expansions
    (the same clause contract as SpanOr). A query with an OOV exact
    term or zero expansions matches nothing. Expansion selection is a
    string sort — no float ties, so a SQL twin selects the identical
    set.

    Scale shape: the prefix reaches the dictionary scan as a pushable
    StartsWith (terms, not docs — same pruning as expand_prefix); the
    positions table is probed in place with the tiny resolved offset
    set broadcast; the only added shuffle vs exact phrase is the
    per-(qid, doc, off) union of expansion position lists, which
    co-partitions with the final (qid, doc) group."""
    analyzer = getattr(index, "analyzer", None)
    qrows, _ = _phrase_offsets(queries, analyzer=analyzer)
    if not qrows:
        raise ValueError("no tokenizable queries")
    last_off = {}
    for qid, off, _t in qrows:
        last_off[qid] = max(off, last_off.get(qid, -1))
    erows = [r for r in qrows if r[1] != last_off[r[0]]]
    prows = [r for r in qrows if r[1] == last_off[r[0]]]
    edf = spark.createDataFrame(erows, "qid long, off int, term string")
    pdf = spark.createDataFrame(prows, "qid long, off int, prefix string")

    dic = index.dictionary.select("term", "term_id", "idf")
    eterms = dic.join(F.broadcast(edf), "term")
    # literal OR-of-StartsWith pushes into the dictionary scan
    # (test_plans asserts) — superset filter, the join condition exacts
    xdic = dic
    lits = sorted({p for _q, _o, p in prows})
    if lits and all(lits):
        flt = None
        for p in lits:
            c = F.col("term").startswith(p)
            flt = c if flt is None else (flt | c)
        xdic = dic.filter(flt)
    xcand = F.broadcast(pdf).join(xdic, F.col("term").startswith(F.col("prefix")))
    wx = Window.partitionBy("qid").orderBy(F.asc("term"))
    xterms = (
        xcand.withColumn("_r", F.row_number().over(wx))
        .filter(F.col("_r") <= max_expansions)
        .drop("_r")
    )
    qn = (
        pdf.select("qid")
        .join(edf.groupBy("qid").agg(F.count("*").alias("n_exact")), "qid", "left")
        .select("qid", F.coalesce("n_exact", F.lit(0)).alias("n_exact"))
    )
    exact_idf = eterms.groupBy("qid").agg(
        F.sum("idf").alias("e_idf"), F.count("*").alias("n_res")
    )
    exp_idf = xterms.groupBy("qid").agg(F.max("idf").alias("x_idf"))
    idf_sums = (
        qn.join(exact_idf, "qid", "left")
        .join(exp_idf, "qid")  # inner: zero expansions -> unmatchable
        .filter(F.coalesce("n_res", F.lit(0)) == F.col("n_exact"))
        .select(
            "qid",
            (F.coalesce("e_idf", F.lit(0.0)) + F.col("x_idf")).alias("idf_sum"),
        )
    )
    ecand = positions.join(
        F.broadcast(eterms.select("qid", "off", "term_id")), "term_id"
    ).select("qid", "doc_id", "doclen", F.struct("off", "positions").alias("st"))
    merged = (
        positions.join(
            F.broadcast(xterms.select("qid", "off", "term_id")), "term_id"
        )
        .groupBy("qid", "doc_id", "doclen", "off")
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("positions")))
            ).alias("positions")
        )
        .select("qid", "doc_id", "doclen", F.struct("off", "positions").alias("st"))
    )
    n_off = qn.select("qid", (F.col("n_exact") + F.lit(1)).alias("n_off"))
    grouped = _single_pass_grouped(ecand.unionByName(merged), n_off)
    matched = _verify_and_count(grouped)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)


def span_within_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    queries: Sequence[Tuple[int, str, str, str]],
    window: int = 8,
    mode: str = "within",
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Lucene SpanWithinQuery / SpanContainingQuery over window spans:
    the BIG span is an unordered pair (a, b) within `window` tokens
    (|pa - pb| < window); the LITTLE span is a single term c.

    mode="within":     tf = c occurrences lying inside some big span
                       (min(pa,pb) <= x <= max(pa,pb)); idf = idf(c).
    mode="containing": tf = a-anchored big spans containing some c
                       occurrence (one count per distinct pa); idf =
                       idf(a) + idf(b).

    queries: [(qid, a, b, c)]. The verify is a bounded Catalyst fold
    over the three position arrays (O(|A|·|B|·|C|) per doc — Lucene's
    span iterators are linear, this is the declared trade of the
    array-fold form); an unresolvable term means no match (all three
    spans are required)."""
    from dpr_spark.functions.analysis import analyze_query

    if mode not in ("within", "containing"):
        raise ValueError(f"unknown mode {mode!r}")
    analyzer = getattr(index, "analyzer", None)
    rows = []
    for qid, a, b_, c in queries:
        at, bt, ct = (analyze_query(x, analyzer) for x in (a, b_, c))
        if at and bt and ct:
            rows.append((qid, at[0], bt[0], ct[0]))
    if not rows:
        raise ValueError("no tokenizable queries")
    qdf = spark.createDataFrame(rows, "qid long, a string, b string, c string")
    dic = index.dictionary.select("term", "term_id", "idf")

    def _pos(col, alias):
        t = dic.join(
            F.broadcast(qdf.select("qid", F.col(col).alias("term"))), "term"
        )
        return (
            positions.join(F.broadcast(t.select("qid", "term_id")), "term_id")
            .select("qid", "doc_id", "doclen", F.col("positions").alias(alias)),
            t.select("qid", F.col("idf").alias(f"idf_{col}")),
        )

    apos, idf_a = _pos("a", "apos")
    bpos, idf_b = _pos("b", "bpos")
    cpos, idf_c = _pos("c", "cpos")
    joined = (
        apos.join(bpos.drop("doclen"), ["qid", "doc_id"])
        .join(cpos.drop("doclen"), ["qid", "doc_id"])
    )
    w = F.lit(window)
    if mode == "within":
        surviving = F.filter(
            F.col("cpos"),
            lambda x: F.exists(
                F.col("apos"),
                lambda pa: F.exists(
                    F.col("bpos"),
                    lambda pb: (F.abs(pa - pb) < w)
                    & (x >= F.least(pa, pb))
                    & (x <= F.greatest(pa, pb)),
                ),
            ),
        )
        idf_sums = idf_c.select("qid", F.col("idf_c").alias("idf_sum"))
    else:
        surviving = F.filter(
            F.col("apos"),
            lambda pa: F.exists(
                F.col("bpos"),
                lambda pb: (F.abs(pa - pb) < w)
                & F.exists(
                    F.col("cpos"),
                    lambda x: (x >= F.least(pa, pb)) & (x <= F.greatest(pa, pb)),
                ),
            ),
        )
        idf_sums = idf_a.join(idf_b, "qid").select(
            "qid", (F.col("idf_a") + F.col("idf_b")).alias("idf_sum")
        )
    matched = (
        joined.withColumn("pf", F.size(surviving))
        .filter(F.col("pf") > 0)
        .select("qid", "doc_id", "doclen", "pf")
    )
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)

def span_multi_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    queries: Sequence[Tuple[int, Sequence[str]]],
    window: int = 8,
    max_expansions: int = 16,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Span-near with multi-term clauses (Lucene
    SpanMultiTermQueryWrapper inside SpanNearQuery, inOrder=false):
    `queries` = [(qid, [clause, ...])] where a clause containing `*`/`?`
    is a wildcard expanded against the dictionary to its
    `max_expansions` highest-df matching terms (Lucene's
    TopTermsSpanBooleanQueryRewrite cap; ties break term asc), and any
    other clause contributes its analyzed tokens as literal clauses.

    Contract: a clause's span positions are the UNION of its expanded
    terms' positions; a doc matches when every clause occurs within a
    `window`-token span; tf = qualifying end-position count; per-clause
    idf uses the df of the UNION (docs containing >=1 expanded term),
    so a clause behaves as one pseudo-term. A clause with zero
    expansions (OOV literal or nothing matching the glob) means no
    document can match — Lucene's empty-rewrite contract.

    Scale shape: globs broadcast INTO the vocab-sized dictionary scan
    with leading/trailing-literal runs pushed as prefix filters
    (boolquery._glob_scan_filter); the capped expansion set (<= clauses
    x max_expansions ids) prunes the positions scan via an IN filter;
    per-clause position-union and union-df come from that ONE probe.
    Everything downstream reuses the span-near verify fold."""
    from dpr_spark.functions.analysis import analyze_query
    from dpr_spark.query.boolquery import _glob_scan_filter, wildcard_regex

    analyzer = getattr(index, "analyzer", None)
    lit_rows: List[Tuple[int, int, str]] = []
    pat_rows: List[Tuple[int, int, str]] = []
    n_off_counts: dict = {}
    globs: List[str] = []
    for qid, clauses in queries:
        off = 0
        seen: set = set()  # duplicate clauses collapse (unordered span
        # semantics — same dedup analyze_query applies on the near path)
        for c in clauses:
            if "*" in c or "?" in c:
                key = ("g", c.lower())
                if key in seen:
                    continue
                seen.add(key)
                pat_rows.append((qid, off, wildcard_regex(c)))
                globs.append(c)
                off += 1
            else:
                for t in analyze_query(c, analyzer):
                    key = ("t", t)
                    if key in seen:
                        continue
                    seen.add(key)
                    lit_rows.append((qid, off, t))
                    off += 1
        n_off_counts[qid] = off
    if not n_off_counts:
        raise ValueError("no clauses")
    n_off = spark.createDataFrame(
        list(n_off_counts.items()), "qid long, n_off int"
    )
    dic = index.dictionary.select("term", "term_id", "df")
    parts = []
    if lit_rows:
        ldf = spark.createDataFrame(lit_rows, "qid long, off int, term string")
        parts.append(dic.join(F.broadcast(ldf), "term"))
    if pat_rows:
        pdf = spark.createDataFrame(pat_rows, "qid long, off int, rx string")
        pdic = dic
        keep = _glob_scan_filter(dic, globs)
        if keep is not None:
            pdic = dic.filter(keep)
        expanded = pdic.join(
            F.broadcast(pdf), F.expr("term rlike rx")
        ).select("term", "term_id", "df", "qid", "off")
        w = Window.partitionBy("qid", "off").orderBy(
            F.desc("df"), F.asc("term")
        )
        parts.append(
            expanded.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_expansions)
            .drop("_r")
        )
    resolved = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    rows = resolved.select("qid", "off", "term_id").collect()
    if not rows:
        return spark.createDataFrame(
            [], "qid long, rank int, doc_id long, score double"
        )
    ids = sorted({r["term_id"] for r in rows})
    if len(ids) <= MAX_SCAN_PRUNE_IDS:
        positions = positions.filter(F.col("term_id").isin(ids))
    qsel = F.broadcast(
        spark.createDataFrame(
            [(r["qid"], r["off"], r["term_id"]) for r in rows],
            "qid long, off int, term_id long",
        )
    )
    # ONE positions probe: per-clause union positions AND union-df
    merged = (
        positions.join(qsel, "term_id")
        .groupBy("qid", "doc_id", "off")
        .agg(
            F.first("doclen").alias("doclen"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("positions")))
            ).alias("positions"),
        )
    )
    n = float(index.stats.n_docs)
    dfu = merged.groupBy("qid", "off").agg(F.count("*").alias("dfu"))
    clause_idf = F.log(
        (F.lit(n) - F.col("dfu") + F.lit(0.5)) / (F.col("dfu") + F.lit(0.5))
        + F.lit(1.0)
    )
    idf_sums = (
        dfu.select("qid", "off", clause_idf.alias("idf"))
        .groupBy("qid")
        .agg(F.sum("idf").alias("idf_sum"), F.count("*").alias("n_res"))
        .join(F.broadcast(n_off), "qid")
        .filter(F.col("n_res") == F.col("n_off"))
        .select("qid", "idf_sum")
    )
    grouped = (
        merged.select(
            "qid", "doc_id", "doclen",
            F.struct("off", "positions").alias("st"),
        )
        .groupBy("qid", "doc_id")
        .agg(
            F.first("doclen").alias("doclen"),
            F.collect_list("st").alias("structs"),
        )
        .join(F.broadcast(n_off), "qid")
        .filter(F.size("structs") == F.col("n_off"))
        .drop("n_off")
    )
    matched = _verify_and_count_near(grouped, window)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)


def phrase_search_index_highlight(
    spark: SparkSession,
    index,
    positions: DataFrame,
    docs: DataFrame,
    phrases: Sequence[Tuple[int, str]],
    k: int = 3,
    lead: int = 3,
    trail: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
    lowercase_first: bool = True,
) -> DataFrame:
    """Phrase-aware best-fragment highlighting (the Lucene unified
    highlighter over a PhraseQuery — the term-window highlighter in
    query/highlight.py can't know WHERE the phrase matched, only where
    its words landed individually): exact-phrase BM25 top-k, each hit
    carrying the FIRST phrase occurrence (min surviving start position
    from the adjacency fold) and a fragment of lead + span + trail
    tokens around it.

    -> (qid, rank, doc_id, score, first_pos, fragment).

    Scale shape: the phrase search is the production positional plan
    (shared `_index_plumbing`); fragments re-tokenize ONLY the k·|q|
    winning docs (the top side broadcasts into the docs scan). The
    index stores positions, not character offsets — re-analysis of k
    docs is Lucene's own unified-highlighter default when offsets
    aren't indexed, and at 10^12 docs it beats carrying a 2×-wider
    positional index for the <0.001% of docs ever highlighted."""
    qrows, _ = _phrase_offsets(phrases, analyzer=getattr(index, "analyzer", None))
    if not qrows:
        raise ValueError("no tokenizable phrases")
    grouped, idf_sums = _index_plumbing(spark, index, positions, qrows)
    # adjacency verify, keeping the first surviving start position
    s = F.sort_array("structs")
    base = F.element_at(s, 1)["positions"]
    rest = F.slice(s, 2, F.size(s) - 1)
    surviving = F.aggregate(
        rest,
        base,
        lambda acc, x: F.filter(
            acc, lambda p: F.array_contains(x["positions"], p + x["off"])
        ),
    )
    matched = (
        grouped.withColumn("surv", surviving)
        .filter(F.size("surv") > 0)
        .select(
            "qid",
            "doc_id",
            "doclen",
            F.size("surv").alias("pf"),
            F.array_min("surv").alias("first_pos"),
        )
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("doclen").cast("double") / F.lit(index.stats.avgdl)
    )
    pf = F.col("pf").cast("double")
    scored = matched.join(F.broadcast(idf_sums), "qid").select(
        "qid",
        "doc_id",
        "first_pos",
        (F.col("idf_sum") * pf * F.lit(k1 + 1.0) / (pf + norm)).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    # per-query phrase span (max offset + 1), tiny driver-side table
    spans: dict = {}
    for qid, off, _t in qrows:
        spans[qid] = max(spans.get(qid, 0), off + 1)
    span_df = spark.createDataFrame(
        [(q, s_) for q, s_ in spans.items()], "qid long, span int"
    )
    from dpr_spark.functions.tokenizer import tokenize_col

    toks = tokenize_col("text", lowercase_first=lowercase_first)
    start0 = F.greatest(F.col("first_pos") - F.lit(lead), F.lit(0))
    frag_len = F.col("first_pos") - start0 + F.col("span") + F.lit(trail)
    frags = docs.join(
        F.broadcast(top.join(F.broadcast(span_df), "qid")), "doc_id"
    ).select(
        "qid",
        "rank",
        "doc_id",
        "score",
        "first_pos",
        F.concat_ws(" ", F.slice(toks, start0 + F.lit(1), frag_len)).alias(
            "fragment"
        ),
    )
    return frags


def _verify_and_count_gapped(grouped: DataFrame, slop: int) -> DataFrame:
    """Gapped ordered-span verify (Lucene SpanNearQuery.Builder with
    addGap(width) elements — SpanGapQuery): offsets are the INFLATED
    query positions (a gap of g between tokens i and i+1 adds g to
    every later offset), and the greedy in-order chain must respect
    each step's minimum spacing — the gap subspan has to FIT between
    the two matched tokens (NearSpansOrdered's non-overlap rule):
    pos_{i+1} >= pos_i + (off_{i+1} - off_i). A start qualifies when
    Lucene's slack (end - start) - totalLength <= slop, i.e.
    cur - start <= off_max - off_min + slop. With all gaps 0 this is
    exactly _verify_and_count_ordered. Greedy minimizes the chain end
    under lower-bound constraints, so existence == greedy
    qualification. Pure Catalyst fold; no UDF."""
    s = F.sort_array("structs")
    first = F.element_at(s, 1)
    rest = F.slice(s, 2, F.size(s) - 1)
    base = F.transform(
        first["positions"],
        lambda p: F.struct(
            p.alias("start"), p.alias("cur"), first["off"].alias("off")
        ),
    )
    chains = F.aggregate(
        rest,
        base,
        lambda acc, x: F.filter(
            F.transform(
                acc,
                lambda e: F.struct(
                    e["start"].alias("start"),
                    F.array_min(
                        F.filter(
                            x["positions"],
                            lambda y: y >= e["cur"] + (x["off"] - e["off"]),
                        )
                    ).alias("cur"),
                    x["off"].alias("off"),
                ),
            ),
            lambda e: e["cur"].isNotNull(),
        ),
    )
    span_1 = F.element_at(s, F.size(s))["off"] - first["off"]
    ok = F.filter(
        chains, lambda e: e["cur"] - e["start"] <= span_1 + F.lit(slop)
    )
    return (
        grouped.withColumn("pf", F.size(ok))
        .filter(F.col("pf") > 0)
        .select("qid", "doc_id", "doclen", "pf")
    )


def span_gap_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    gapped: Sequence[Tuple[int, Sequence[Tuple[str, int]]]],
    slop: int = 0,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Gapped ordered span top-k over a prebuilt positional index —
    Lucene ``SpanNearQuery.Builder(field, true).addClause(a)
    .addGap(g).addClause(b)`` (SpanGapQuery): `gapped` is
    [(qid, [(term, gap_before), ...])] where gap_before is the fixed
    gap width between the previous token and this one (ignored on the
    first). Each term must tokenize to exactly one token. tf =
    qualifying start positions under the gapped greedy-chain contract
    (_verify_and_count_gapped); scoring, OOV semantics and candidate
    plumbing are shared with the other positional searchers."""
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    if slop < 0:
        raise ValueError("slop must be >= 0")
    rows: List[Tuple[int, int, str]] = []
    for qid, seq in gapped:
        off = 0
        for i, (term, gap) in enumerate(seq):
            toks = tokenize(normalize_question(term))
            if len(toks) != 1:
                raise ValueError(
                    f"span_gap clause must be one token: {term!r}"
                )
            if i > 0:
                if gap < 0:
                    raise ValueError("gap must be >= 0")
                off += 1 + gap
            rows.append((qid, off, toks[0]))
    if not rows:
        raise ValueError("no tokenizable clauses")
    grouped, idf_sums = _index_plumbing(spark, index, positions, rows)
    matched = _verify_and_count_gapped(grouped, slop)
    return _topk(_score_phrases(matched, idf_sums, index.stats.avgdl, k1, b), k)
