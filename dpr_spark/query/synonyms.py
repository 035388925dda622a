"""Query-time synonym expansion — the Lucene `SynonymQuery` contract:
all terms of a synonym group score as ONE pseudo-term, with tf = the
SUM of the group members' tfs in the doc and df = the MAX docFreq over
the members (Lucene SynonymQuery javadoc: "scores documents as if the
terms were one term", blended max-docFreq statistics). This keeps a
rare synonym from inflating idf and double-counting a doc that
contains two spellings.

Scale shape: the synonyms table is vocabulary-sized and NEVER
broadcasts — the tiny query-term side is broadcast INTO its scan
(left_semi), same discipline as the dictionary (r4 ADVICE on
spell_suggest). Everything that reaches the postings probe is
query-sized: (qid, group, term_id) triples.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex


def expand_synonyms(
    spark: SparkSession,
    queries: DataFrame,
    synonyms: DataFrame,
    analyzer=None,
) -> DataFrame:
    """(qid, group, term) — one row per group member. `group` is the
    query's own token (each query token starts its own group; its
    synonyms join it). synonyms(term, syn) is DIRECTIONAL — symmetric
    closure is the table builder's job, not query time; with an
    analyzed index, the synonyms table must be in ANALYZED terms (the
    query token is analyzed before the synonym lookup, like Lucene's
    SynonymGraphFilter sitting after the stemmer)."""
    from dpr_spark.functions.analysis import analyze_query
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def qtok(s: pd.Series) -> pd.Series:
        return s.map(
            lambda q: analyze_query(q, analyzer) if q is not None else []
        )

    base = queries.select("qid", F.explode(qtok("question")).alias("group"))
    # query-sized broadcast into the vocab-sized synonyms scan
    syn = synonyms.join(
        F.broadcast(base.select(F.col("group").alias("term")).distinct()), "term"
    ).select(F.col("term").alias("group"), F.col("syn").alias("term"))
    members = base.withColumn("term", F.col("group")).unionByName(
        base.join(F.broadcast(syn), "group").select("qid", "group", "term")
    )
    return members.distinct()


def synonym_search(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    synonyms: DataFrame,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k where each query token and its synonyms score as one
    SynonymQuery group: per (qid, group, doc) tf_sum over members, idf
    from the group's MAX df; per-doc score = Σ over groups, folded in
    ascending group order (deterministic)."""
    members = expand_synonyms(spark, queries, synonyms, analyzer=index.analyzer)
    # group members are query-sized: broadcast INTO the dictionary scan
    resolved = index.dictionary.select("term", "term_id", "df").join(
        F.broadcast(members), "term"
    )
    # blended statistics: df_g = max df over resolved members
    gstats = resolved.groupBy("qid", "group").agg(F.max("df").alias("df_g"))
    n = float(index.stats.n_docs)
    gstats = gstats.withColumn(
        "idf_g",
        F.log(
            (F.lit(n) - F.col("df_g") + F.lit(0.5)) / (F.col("df_g") + F.lit(0.5))
            + F.lit(1.0)
        ),
    )
    probe = index.postings.join(
        F.broadcast(resolved.select("qid", "group", "term_id")), "term_id"
    )
    per_group = probe.groupBy("qid", "group", "doc_id").agg(
        F.sum("tf").alias("tf_g"), F.first("doclen").alias("doclen")
    )
    comp = (
        F.col("idf_g")
        * F.col("tf_g").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf_g").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(index.stats.avgdl))
        )
    )
    scored = (
        per_group.join(F.broadcast(gstats), ["qid", "group"])
        .select("qid", "doc_id", "group", comp.alias("c"))
        .groupBy("qid", "doc_id")
        # ascending-group fold: deterministic float order (same trick as
        # the segments searcher's ascending-term fold)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("group", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("score")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


_GRAPH_MAXC = 1024  # clause slots per query in the composite-qid space


def parse_synonym_graph(
    question: str,
    syn_map,
    analyzer=None,
):
    """Greedy longest-match scan of the query token stream for
    registered multi-word entries (Lucene SynonymGraphFilter's
    query-time parse): returns (phrase_clauses, alt_rows, single_terms)
    where each matched source span becomes one clause with the original
    tokens as a PHRASE path plus each mapped single-token synonym as a
    TERM path; uncovered tokens stay ordinary terms."""
    from dpr_spark.functions.analysis import analyze_query
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    toks = tokenize(normalize_question(question))
    if analyzer is not None:
        toks = analyzer.analyze_tokens(toks)
    keys = {tuple(tokenize(k)): v for k, v in syn_map.items()}
    max_n = max((len(k) for k in keys), default=0)
    phrases, alts, singles = [], [], []
    i, cid = 0, 0
    while i < len(toks):
        hit = None
        for n in range(min(max_n, len(toks) - i), 1, -1):
            span = tuple(toks[i : i + n])
            if span in keys:
                hit = (span, keys[span])
                break
        if hit is None:
            singles.append(toks[i])
            i += 1
            continue
        span, alt_terms = hit
        phrases.append((cid, " ".join(span)))
        for a in alt_terms:
            for t in tokenize(a):
                alts.append((cid, t))
        cid += 1
        i += len(span)
    return phrases, alts, singles


def synonym_graph_search(
    spark: SparkSession,
    index: InvertedIndex,
    positions: DataFrame,
    queries,
    syn_map,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_round: int = 0,
) -> DataFrame:
    """Multi-word synonyms at query time — the Lucene SynonymGraph
    contract: a registered source span ("window data" -> "vector")
    becomes a boolean-of-paths clause, PhraseQuery(original span) OR
    TermQuery(each alternate), and like Lucene's graph query the doc's
    clause score is the SUM of its matching paths. Uncovered tokens
    score as ordinary BM25 terms.

    queries: [(qid, question)]; syn_map: {"multi word": ["alt", ...]}.
    Plan shape: the phrase paths ride the existing positional-candidate
    plumbing (one probe for ALL clauses of all queries via a composite
    qid); the term paths are one postings probe; a final (qid, doc)
    groupBy sums the path contributions."""
    from dpr_spark.query.phrase import (
        _index_plumbing,
        _phrase_offsets,
        _score_phrases,
        _verify_and_count,
    )

    analyzer = getattr(index, "analyzer", None)
    ph_pairs, term_rows = [], []
    for qid, q in queries:
        phrases, alts, singles = parse_synonym_graph(q, syn_map, analyzer)
        if any(cid >= _GRAPH_MAXC for cid, _ in phrases):
            raise ValueError("too many graph clauses in one query")
        for cid, ph in phrases:
            ph_pairs.append((qid * _GRAPH_MAXC + cid, ph))
        for _, t in alts:
            term_rows.append((qid, t))
        for t in singles:
            term_rows.append((qid, t))

    parts = []
    if ph_pairs:
        qrows, _ = _phrase_offsets(ph_pairs, analyzer=analyzer)
        grouped, idf_sums = _index_plumbing(spark, index, positions, qrows)
        ph = _score_phrases(
            _verify_and_count(grouped), idf_sums, index.stats.avgdl, k1, b
        ).select(
            F.expr(f"qid div {_GRAPH_MAXC}L").alias("qid"),
            "doc_id",
            "score",
        )
        parts.append(ph)
    if term_rows:
        tdf = spark.createDataFrame(term_rows, "qid long, term string")
        qt = index.dictionary.select("term", "term_id", "idf").join(
            F.broadcast(tdf), "term"
        )
        norm = F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("doclen").cast("double") / F.lit(index.stats.avgdl)
        )
        tf = F.col("tf").cast("double")
        terms = (
            index.postings.join(
                F.broadcast(qt.select("qid", "term_id", "idf")), "term_id"
            )
            .select(
                "qid",
                "doc_id",
                (F.col("idf") * tf * F.lit(k1 + 1.0) / (tf + norm)).alias("score"),
            )
        )
        parts.append(terms)
    if not parts:
        raise ValueError("no clauses parsed")
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    total = allp.groupBy("qid", "doc_id").agg(F.sum("score").alias("score"))
    key = F.round("score", score_round) if score_round else F.col("score")
    w = Window.partitionBy("qid").orderBy(key.desc(), F.asc("doc_id"))
    return (
        total.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
