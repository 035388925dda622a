"""Percolator — reverse search: register queries once, then for each
incoming document emit the queries it matches. The Elasticsearch
`percolate` query / Lucene Monitor (luwak) surface, and the alerting /
routing primitive of a crawl pipeline ("which standing subscriptions
does this fresh page satisfy?").

Registered-query model (the BooleanQuery subset that percolates
exactly):

    PercolatorQuery = (pqid, must, should, must_not, msm)

A document matches when ALL must terms occur, at least `msm` should
terms occur (msm=0 with non-empty should still requires ≥1 if there are
no must terms — ES's implicit-should rule is NOT applied; the caller
sets msm explicitly), and NO must_not term occurs. Terms pass through
the tokenizer's normalize chain (and an analyzer, when given).

Scale shape — the inverse of the search path: the REGISTERED QUERIES
are the small side and broadcast into the document stream; documents
never shuffle. Per batch:

    docs ──fused Arrow tokenize+tf (index/build.doc_terms, the same
      kernel the index build uses — distinct terms per doc)──►
    ⋈ broadcast (term → pqid, clause)   [Lucene Monitor's "presearcher"
      is exactly this join: only queries sharing ≥1 term with the doc
      are ever evaluated for it]
    ──groupBy (doc_id, pqid) conditional counts──filter──matches

must_not is folded into the same single aggregation as a negative
count (no anti-join pass): a clause hit with must_not > 0 disqualifies.
Queries whose must/should sets are empty after analysis never match
(a must_not-only subscription is rejected at registration).

For Structured Streaming, call `percolate` inside foreachBatch — the
plan is stateless per batch (no watermark needed), so it composes with
the NRT refresh loop in streaming/refresh.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PercolatorQuery:
    pqid: int
    must: Tuple[str, ...] = ()
    should: Tuple[str, ...] = ()
    must_not: Tuple[str, ...] = ()
    msm: int = 0  # minimum should matches (0 = should optional)
    phrases: Tuple[str, ...] = ()  # exact phrases, ALL required


@dataclass
class PhraseBook:
    """Registered phrase clauses: (pqid, pid, off, term) rows + the
    phrase vocabulary (drives the positional kernel's pushed filter) +
    required-phrase counts per pqid."""
    rows: DataFrame
    vocab: List[str]
    n_phrases: DataFrame  # (pqid, n_ph)


def register_phrases(
    spark: SparkSession,
    queries: Sequence[PercolatorQuery],
    analyzer=None,
) -> Optional[PhraseBook]:
    """Phrase clauses -> PhraseBook (None when no query has phrases).
    Tokenized/offset exactly like the search path's phrases (analyzer
    position gaps preserved), so percolation and retrieval agree on
    what an 'exact phrase' is."""
    from dpr_spark.query.phrase import _phrase_offsets

    rows, vocab, counts = [], set(), []
    for q in queries:
        if not q.phrases:
            continue
        n_ok = 0
        for pid, ph in enumerate(q.phrases):
            offs, _ = _phrase_offsets([(0, ph)], analyzer=analyzer)
            if not offs:
                raise ValueError(f"pqid {q.pqid}: phrase {ph!r} has no tokens")
            n_ok += 1
            for _, off, t in offs:
                rows.append((q.pqid, pid, off, t))
                vocab.add(t)
        counts.append((q.pqid, n_ok))
    if not rows:
        return None
    return PhraseBook(
        rows=spark.createDataFrame(rows, "pqid long, pid int, off int, term string"),
        vocab=sorted(vocab),
        n_phrases=spark.createDataFrame(counts, "pqid long, n_ph int"),
    )


def _norm_terms(words: Sequence[str], analyzer) -> List[str]:
    from dpr_spark.functions.analysis import analyze_query

    out: List[str] = []
    for w in words:
        out.extend(analyze_query(w, analyzer))
    return sorted(set(out))


def register_queries(
    spark: SparkSession,
    queries: Sequence[PercolatorQuery],
    analyzer=None,
) -> DataFrame:
    """-> registered (pqid, term, clause, n_must, msm) rows — the
    percolator's 'index'. Query-sized; persists/broadcasts wholesale."""
    rows = []
    for q in queries:
        must = _norm_terms(q.must, analyzer)
        should = _norm_terms(q.should, analyzer)
        must_not = _norm_terms(q.must_not, analyzer)
        # phrase terms are necessary conditions: they join the must set
        # (the Monitor presearcher), adjacency verifies later
        must = sorted(set(must) | set(_norm_terms(q.phrases, analyzer)))
        if not must and not should:
            raise ValueError(f"pqid {q.pqid}: nothing to match (no must/should)")
        if q.msm > len(should):
            raise ValueError(f"pqid {q.pqid}: msm {q.msm} > {len(should)} should terms")
        for t in must:
            rows.append((q.pqid, t, "must", len(must), q.msm))
        for t in should:
            # a term may be BOTH must and should (two rows): must_hits
            # and should_hits count their own clause rows independently
            rows.append((q.pqid, t, "should", len(must), q.msm))
        for t in must_not:
            rows.append((q.pqid, t, "must_not", len(must), q.msm))
    return spark.createDataFrame(
        rows, "pqid long, term string, clause string, n_must int, msm int"
    )


def percolate(
    docs: DataFrame,
    registered: DataFrame,
    analyzer=None,
    phrase_book: Optional["PhraseBook"] = None,
) -> DataFrame:
    """(doc_id, pqid) pairs: which registered queries each doc matches.

    docs: (doc_id, text); registered: register_queries output. The doc
    side is tokenized by the index build's own fused Arrow kernel and
    reduced to distinct (doc_id, term) pairs before the broadcast join.

    phrase_book (register_phrases output): exact-phrase clauses — the
    term-level pass already required every phrase term (presearcher);
    candidates then verify adjacency positionally, so ONLY docs that
    passed the term screen ever tokenize with positions. A pqid with
    phrases matches when every one of its phrases occurs verbatim.
    """
    from dpr_spark.index.build import doc_terms

    dterms = doc_terms(docs.select("doc_id", "text"), analyzer=analyzer).select(
        "doc_id", "term"
    )
    hits = dterms.join(F.broadcast(registered), "term")
    agg = hits.groupBy("doc_id", "pqid").agg(
        F.max("n_must").alias("n_must"),
        F.max("msm").alias("msm"),
        F.sum(F.when(F.col("clause") == "must", 1).otherwise(0)).alias("must_hits"),
        F.sum(F.when(F.col("clause") == "should", 1).otherwise(0)).alias("should_hits"),
        F.sum(F.when(F.col("clause") == "must_not", 1).otherwise(0)).alias("neg_hits"),
    )
    base = agg.filter(
        (F.col("must_hits") == F.col("n_must"))
        & (F.col("should_hits") >= F.col("msm"))
        & (F.col("neg_hits") == 0)
        # a should-only query (n_must=0, msm=0) still needs ≥1 should hit
        & ((F.col("n_must") > 0) | (F.col("should_hits") >= F.greatest(F.col("msm"), F.lit(1))))
    ).select("doc_id", "pqid")
    if phrase_book is None:
        return base
    return _verify_phrases(docs, base, phrase_book, analyzer)


def _verify_phrases(
    docs: DataFrame, base: DataFrame, book: "PhraseBook", analyzer
) -> DataFrame:
    """Keep base (doc_id, pqid) pairs whose pqid's phrases ALL occur
    verbatim in the doc; pqids without phrases pass through."""
    from dpr_spark.query.phrase import doc_term_positions

    cand = base.join(F.broadcast(book.n_phrases), "pqid", "left")
    no_phrase = cand.filter(F.col("n_ph").isNull()).select("doc_id", "pqid")
    with_phrase = cand.filter(F.col("n_ph").isNotNull())

    pos = doc_term_positions(
        docs.select("doc_id", "text"), vocab=book.vocab, analyzer=analyzer
    ).select("doc_id", "term", "positions")
    hits = pos.join(F.broadcast(book.rows), "term").join(
        with_phrase.select("doc_id", "pqid"), ["doc_id", "pqid"]
    )
    n_off = book.rows.groupBy("pqid", "pid").agg(F.count("*").alias("n_off"))
    grouped = (
        hits.groupBy("doc_id", "pqid", "pid")
        .agg(F.collect_list(F.struct("off", "positions")).alias("structs"))
        .join(F.broadcast(n_off), ["pqid", "pid"])
        .filter(F.size("structs") == F.col("n_off"))
    )
    s = F.sort_array("structs")
    start = F.element_at(s, 1)["positions"]
    rest = F.slice(s, 2, F.size(s) - 1)
    surviving = F.aggregate(
        rest,
        start,
        lambda acc, x: F.filter(
            acc, lambda p: F.array_contains(x["positions"], p + x["off"])
        ),
    )
    ok = grouped.withColumn("pf", F.size(surviving)).filter(F.col("pf") > 0)
    full = (
        ok.groupBy("doc_id", "pqid")
        .agg(F.countDistinct("pid").alias("n_ok"))
        .join(F.broadcast(book.n_phrases), "pqid")
        .filter(F.col("n_ok") == F.col("n_ph"))
        .select("doc_id", "pqid")
    )
    return no_phrase.unionByName(full)


def percolate_py(
    text: str,
    queries: Sequence[PercolatorQuery],
    analyzer=None,
) -> List[int]:
    """Pure-Python twin of percolate() for one document."""
    from dpr_spark.functions.tokenizer import tokenize

    toks = tokenize(text)
    if analyzer is not None:
        toks = analyzer.analyze_tokens(toks)
    present = set(toks)

    def _phrase_in(ph: str) -> bool:
        from dpr_spark.query.phrase import _phrase_offsets

        offs, _ = _phrase_offsets([(0, ph)], analyzer=analyzer)
        pairs = [(off, t) for _, off, t in offs]
        for p in range(len(toks)):
            if all(
                p + off < len(toks) and toks[p + off] == t for off, t in pairs
            ):
                return True
        return False

    out = []
    for q in queries:
        must = set(_norm_terms(q.must, analyzer)) | set(
            _norm_terms(q.phrases, analyzer)
        )
        should = set(_norm_terms(q.should, analyzer))
        must_not = set(_norm_terms(q.must_not, analyzer))
        if not must and not should:
            continue
        if must - present:
            continue
        if present & must_not:
            continue
        sh = len(should & present)
        if sh < q.msm:
            continue
        if not must and sh < max(q.msm, 1):
            continue
        if q.phrases and not all(_phrase_in(ph) for ph in q.phrases):
            continue
        out.append(q.pqid)
    return sorted(out)
