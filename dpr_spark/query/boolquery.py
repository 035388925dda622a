"""Boolean (must / should / must_not) and prefix queries over the
inverted index — the Lucene `BooleanQuery` / `PrefixQuery` surface of
the fulltext tier (the reference's BM25 baseline is Lucene, see
`/root/reference/dpr/data/tables.py:241` and BASELINE.md).

Semantics (documented contract, oracle-checked in engine_queries.py):

- bool_search: a document qualifies when it contains EVERY `must` term
  and NO `must_not` term; its score is the BM25 sum over all matched
  `must` + `should` terms (Lucene scores MUST clauses too). Terms are
  sets per clause (duplicates collapse), same as `query_terms`.
- prefix_search: a prefix expands to the `max_expansions` matching
  dictionary terms by (df DESC, term ASC) — the highest-df rewrite,
  deterministic — and the expansion scores as a disjunction (BM25 sum
  over the matched expanded terms, set semantics).

Scale shape: both paths broadcast the tiny query-term side and probe
the postings table in place (no postings shuffle); the must_not
exclusion is a left_anti join on (qid, doc_id) against only the
exclusion terms' postings — the same candidate volume a BM25 query
over those terms would ship. Prefix expansion scans the dictionary
with a `startswith` filter (Catalyst pushes the resulting
`StringStartsWith` to the parquet dictionary scan when persisted).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex

# (qid, must terms, should terms, must_not terms)
BoolQuery = Tuple[int, Sequence[str], Sequence[str], Sequence[str]]


def _component(avgdl: float, k1: float, b: float):
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


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


def _clause_rows(queries: Sequence[BoolQuery]):
    """-> [(qid, term, clause)] with per-clause set semantics; a term in
    both must and should counts once, as must (Lucene collapses the
    duplicate SHOULD into the MUST's score)."""
    from dpr_spark.functions.tokenizer import tokenize

    def norm(terms: Sequence[str]) -> List[str]:
        out: set = set()
        for t in terms:
            out.update(tokenize(t))
        return sorted(out)

    rows = []
    for qid, must, should, must_not in queries:
        m = norm(must)
        rows += [(qid, t, "must") for t in m]
        rows += [(qid, t, "should") for t in norm(should) if t not in m]
        rows += [(qid, t, "must_not") for t in norm(must_not)]
    return rows


def bool_search(
    spark: SparkSession,
    queries: Sequence[BoolQuery],
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    minimum_should_match: int = 0,
    doc_values: DataFrame = None,
    ranges: Sequence[Tuple[int, float, float]] = (),
    range_field: str = None,
) -> DataFrame:
    """minimum_should_match: a doc must additionally match at least this
    many SHOULD terms (Lucene BooleanQuery.setMinimumNumberShouldMatch;
    0 = optional as usual). Counted over resolved terms, so an msm
    larger than a query's should-clause count matches nothing — Lucene's
    unsatisfiable contract.

    ranges + doc_values + range_field: Lucene FILTER-context range
    clauses — per-query [lo, hi] bounds (inclusive) on a stored per-doc
    column; constrains matches WITHOUT contributing to the score.
    `ranges` rows are (qid, lo, hi); queries absent from it are
    unconstrained. doc_values joins on doc_id AFTER the must/should
    collapse, so only candidate (qid, doc_id) rows — not the corpus —
    reach the filter join."""
    rows = _clause_rows(queries)
    if not rows:
        raise ValueError("no tokenizable clauses")
    qdf = spark.createDataFrame(rows, "qid long, term string, clause string")
    # clause rows broadcast INTO the dictionary scan, never the reverse
    qt = index.dictionary.select("term", "term_id", "idf").join(
        F.broadcast(qdf), "term"
    )

    # a must term missing from the dictionary can never be satisfied:
    # require every must clause to resolve, counting from the raw rows
    n_must_raw = (
        qdf.filter(F.col("clause") == "must").groupBy("qid").agg(F.count("*").alias("n_must"))
    )

    scoring = qt.filter(F.col("clause") != "must_not")
    joined = index.postings.join(
        F.broadcast(scoring.select("qid", "term_id", "idf", "clause")), "term_id"
    )
    per_doc = joined.groupBy("qid", "doc_id").agg(
        F.sum(_component(index.stats.avgdl, k1, b)).alias("score"),
        F.sum(F.when(F.col("clause") == "must", 1).otherwise(0)).alias("must_hits"),
        F.sum(F.when(F.col("clause") == "should", 1).otherwise(0)).alias("should_hits"),
    )
    # left join: queries with no must clause keep every candidate
    per_doc = per_doc.join(F.broadcast(n_must_raw), "qid", "left").filter(
        F.col("must_hits") == F.coalesce(F.col("n_must"), F.lit(0))
    )
    if minimum_should_match > 0:
        per_doc = per_doc.filter(F.col("should_hits") >= minimum_should_match)

    excl_terms = qt.filter(F.col("clause") == "must_not").select("qid", "term_id")
    excl = (
        index.postings.join(F.broadcast(excl_terms), "term_id")
        .select("qid", "doc_id")
        .distinct()
    )
    survivors = per_doc.join(excl, ["qid", "doc_id"], "left_anti")

    if ranges:
        if doc_values is None or range_field is None:
            raise ValueError("ranges need doc_values and range_field")
        rdf = spark.createDataFrame(
            [(int(q), lo, hi) for q, lo, hi in ranges], ["qid", "_lo", "_hi"]
        )
        fcol = F.col(range_field)
        survivors = (
            survivors.join(doc_values.select("doc_id", range_field), "doc_id")
            .join(F.broadcast(rdf), "qid", "left")
            .filter(
                F.col("_lo").isNull() | ((fcol >= F.col("_lo")) & (fcol <= F.col("_hi")))
            )
            .drop("_lo", "_hi", range_field)
        )
    return _topk(survivors.select("qid", "doc_id", "score"), k)


def expand_prefix(
    index: InvertedIndex,
    prefixes: DataFrame,
    max_expansions: int = 16,
    scan_prefixes: Optional[Sequence[str]] = None,
) -> DataFrame:
    """prefixes(qid, prefix) -> (qid, term, term_id, idf): the
    `max_expansions` highest-df dictionary terms per prefix (ties by
    term ASC). The dictionary is the small side at any scale (terms,
    not docs) but still distributed: the rank is a per-qid window over
    only the prefix-matching rows.

    scan_prefixes: the prefix LITERALS when the caller has them (it
    almost always does — they arrived as query strings). They become a
    pushable OR-of-StringStartsWith on the dictionary scan (the
    FST-seek analog; same discipline as fuzzy/wildcard literal
    pruning), a superset filter the join condition then exacts. An
    empty-string prefix disables the filter (full scan — the honest
    cost of that query)."""
    dic = index.dictionary.select("term", "term_id", "idf", "df")
    if scan_prefixes is not None:
        lits = sorted(set(scan_prefixes))
        if lits and all(p for p in lits):
            flt = None
            for p in lits:
                c = F.col("term").startswith(p)
                flt = c if flt is None else (flt | c)
            dic = dic.filter(flt)
    cand = F.broadcast(prefixes).join(
        dic,
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_expansions)
        .select("qid", "term", "term_id", "idf")
    )


def wildcard_regex(pattern: str) -> str:
    """`*`/`?` glob -> anchored regex, literals escaped. The escaped
    form uses only constructs Java regex and RE2 read identically, so
    the Spark engine and a DuckDB oracle expand the same term set."""
    import re as _re

    out = []
    for ch in pattern.lower():
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "^" + "".join(out) + "$"


def glob_literal_runs(pattern: str) -> Tuple[str, str]:
    """(leading, trailing) literal runs of a glob — the chars before the
    first and after the last `*`/`?`, lowercased. A pure-literal glob
    returns itself on both sides."""
    g = pattern.lower()
    i = 0
    while i < len(g) and g[i] not in "*?":
        i += 1
    j = len(g)
    while j > 0 and g[j - 1] not in "*?":
        j -= 1
    if i == len(g):
        return g, g
    return g[:i], g[j:]


def _glob_scan_filter(dictionary: DataFrame, globs) -> "F.Column":
    """Scan-prunable superset filter for a glob set: per pattern,
    `term StartsWith <leading literal>` when one exists, else
    `rterm StartsWith reverse(<trailing literal>)` (the reversed-term
    dictionary column turns a `*ing` suffix into a pushable prefix; an
    older dictionary without rterm falls back to EndsWith, still
    scan-stage-evaluated). A pattern with no literal run anywhere (`*`,
    `?*?`) makes the whole filter vacuous -> None (full vocab scan, the
    honest cost of that query). The filter is implied by the RLIKE join
    condition, so results are unchanged (oracle entries + test_plans)."""
    has_rterm = "rterm" in dictionary.columns
    parts = []
    for g in globs:
        lead, trail = glob_literal_runs(g)
        if lead:
            parts.append(F.col("term").startswith(lead))
        elif trail:
            parts.append(
                F.col("rterm").startswith(trail[::-1])
                if has_rterm
                else F.col("term").endswith(trail)
            )
        else:
            return None
    if not parts:
        return None
    keep = parts[0]
    for p in parts[1:]:
        keep = keep | p
    return keep


def expand_wildcard(
    index: InvertedIndex,
    patterns: DataFrame,
    max_expansions: int = 16,
    glob_literals: Sequence[str] = None,
) -> DataFrame:
    """patterns(qid, rx) -> (qid, term, term_id, idf): the
    `max_expansions` highest-df matching dictionary terms per pattern
    (ties term ASC) — the PrefixQuery rewrite generalized to globs.

    glob_literals: the raw glob strings as driver-side literals; their
    leading/trailing literal runs become a pushed StartsWith disjunction
    on the dictionary scan (FST-seek analog — the RLIKE nested-loop then
    only sees the pruned candidate rows, not the whole web vocabulary;
    r4 VERDICT What's-wrong #1)."""
    dic = index.dictionary
    if glob_literals:
        keep = _glob_scan_filter(dic, glob_literals)
        if keep is not None:
            dic = dic.filter(keep)
    cand = F.broadcast(patterns).join(
        dic.select("term", "term_id", "idf", "df"),
        F.expr("term RLIKE rx"),  # column-valued pattern needs the SQL form
    )
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_expansions)
        .select("qid", "term", "term_id", "idf")
    )


def wildcard_search(
    spark: SparkSession,
    patterns: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    max_expansions: int = 16,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Lucene WildcardQuery: `*` = any run, `?` = one char; expansion
    scores as a disjunction (same contract as prefix_search)."""
    pdf = spark.createDataFrame(
        [(qid, wildcard_regex(p)) for qid, p in patterns], "qid long, rx string"
    )
    qt = expand_wildcard(
        index, pdf, max_expansions, glob_literals=[p for _, p in patterns]
    )
    joined = index.postings.join(F.broadcast(qt.select("qid", "term_id", "idf")), "term_id")
    scored = joined.groupBy("qid", "doc_id").agg(
        F.sum(_component(index.stats.avgdl, k1, b)).alias("score")
    )
    return _topk(scored, k)


def regex_literal_prefix(pattern: str) -> str:
    """The longest literal run a regex REQUIRES at position 0 — the
    pushable StringStartsWith for the dictionary scan (the FST-seek
    analog Lucene's RegexpQuery gets from its automaton's common
    prefix). Escaped metacharacters count as literals; a trailing
    literal made optional by `*`, `?` or `{` is dropped. Any unescaped
    `|` anywhere (even grouped: `(a|b)x`) conservatively yields "" —
    an alternation branch need not start with the scanned literals."""
    metas = set(".*+?()[]{}|^$\\")
    j = 0
    in_class = False
    while j < len(pattern):
        c = pattern[j]
        if c == "\\":
            j += 2
            continue
        if c == "[":
            in_class = True
        elif c == "]":
            in_class = False
        elif c == "|" and not in_class:
            return ""
        j += 1
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern) and pattern[i + 1] in metas:
            out.append(pattern[i + 1])
            i += 2
            continue
        if c in metas:
            if c in "*?{" and out:
                out.pop()  # the preceding atom is optional/quantified
            break
        out.append(c)
        i += 1
    return "".join(out).lower()


def expand_regexp(
    index: InvertedIndex, patterns: DataFrame, max_expansions: int = 16,
    raw_patterns: Sequence[str] = None,
) -> DataFrame:
    """patterns(qid, rx anchored) -> (qid, term, term_id, idf): the
    `max_expansions` highest-df matching terms (ties term ASC). When
    EVERY raw pattern has a required literal prefix, the disjunction of
    StartsWith filters is pushed into the dictionary scan; one
    prefix-free pattern honestly costs the full vocab scan."""
    dic = index.dictionary
    if raw_patterns:
        prefixes = [regex_literal_prefix(p) for p in raw_patterns]
        if all(prefixes):
            keep = F.col("term").startswith(prefixes[0])
            for p in prefixes[1:]:
                keep = keep | F.col("term").startswith(p)
            dic = dic.filter(keep)
    cand = F.broadcast(patterns).join(
        dic.select("term", "term_id", "idf", "df"),
        F.expr("term RLIKE rx"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_expansions)
        .select("qid", "term", "term_id", "idf")
    )


def regexp_search(
    spark: SparkSession,
    patterns: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    max_expansions: int = 16,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Lucene RegexpQuery: an (unanchored-input, anchored-match) regex
    over the term dictionary, expanded to the `max_expansions`
    highest-df matches and scored as a disjunction (the same rewrite
    contract as prefix/wildcard). Patterns must use the Java/RE2-shared
    subset (no lookaround/backrefs) so a SQL oracle expands the same
    term set; each pattern is validated by compiling it."""
    import re as _re

    rows = []
    for qid, p in patterns:
        _re.compile(p)  # syntax gate (raises on a malformed pattern)
        if _re.search(r"\(\?[=!<]|\\\d", p):
            raise ValueError(f"pattern {p!r}: lookaround/backrefs not supported")
        rows.append((qid, f"^(?:{p.lower()})$"))
    pdf = spark.createDataFrame(rows, "qid long, rx string")
    qt = expand_regexp(
        index, pdf, max_expansions, raw_patterns=[p for _, p in patterns]
    )
    joined = index.postings.join(F.broadcast(qt.select("qid", "term_id", "idf")), "term_id")
    scored = joined.groupBy("qid", "doc_id").agg(
        F.sum(_component(index.stats.avgdl, k1, b)).alias("score")
    )
    return _topk(scored, k)


def prefix_search(
    spark: SparkSession,
    prefixes: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    max_expansions: int = 16,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    pdf = spark.createDataFrame(
        [(qid, p.lower()) for qid, p in prefixes], "qid long, prefix string"
    )
    qt = expand_prefix(
        index, pdf, max_expansions,
        scan_prefixes=[p.lower() for _q, p in prefixes],
    )
    joined = index.postings.join(F.broadcast(qt.select("qid", "term_id", "idf")), "term_id")
    scored = joined.groupBy("qid", "doc_id").agg(
        F.sum(_component(index.stats.avgdl, k1, b)).alias("score")
    )
    return _topk(scored, k)


def expand_term_range(
    index: InvertedIndex,
    ranges: DataFrame,
    max_expansions: int = 16,
    envelope: Optional[Tuple[Optional[str], Optional[str]]] = None,
) -> DataFrame:
    """ranges(qid, lo, hi, inc_lo, inc_hi) -> (qid, term, term_id, idf):
    the `max_expansions` highest-df dictionary terms per clause whose
    term falls in the clause's lexicographic [lo, hi] interval (NULL
    bound = open side; inc_* toggles inclusive/exclusive), ties term
    ASC — Lucene TermRangeQuery under its TopTermsRewrite.

    envelope: the (min lo, max hi) literals over all clauses when the
    caller has them driver-side (it does — they arrived as query
    strings). They become pushable >=/<= range predicates on the
    dictionary scan (the FST range-seek analog; same discipline as the
    prefix/wildcard literal pruning) — a superset the join condition
    then exacts. A side with any open-bound clause passes None for
    that side and that predicate is skipped (the honest cost of an
    open-ended range)."""
    dic = index.dictionary.select("term", "term_id", "idf", "df")
    if envelope is not None:
        lo_min, hi_max = envelope
        if lo_min is not None:
            dic = dic.filter(F.col("term") >= lo_min)
        if hi_max is not None:
            dic = dic.filter(F.col("term") <= hi_max)
    in_range = (
        F.col("lo").isNull()
        | F.when(F.col("inc_lo"), F.col("term") >= F.col("lo")).otherwise(
            F.col("term") > F.col("lo")
        )
    ) & (
        F.col("hi").isNull()
        | F.when(F.col("inc_hi"), F.col("term") <= F.col("hi")).otherwise(
            F.col("term") < F.col("hi")
        )
    )
    cand = F.broadcast(ranges).join(dic, in_range)
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_expansions)
        .select("qid", "term", "term_id", "idf")
    )


def term_range_search(
    spark: SparkSession,
    ranges: Sequence[Tuple],
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    max_expansions: int = 16,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Lucene TermRangeQuery: each clause is (qid, lo, hi[, inc_lo,
    inc_hi]) — lexicographic term bounds, None = open side, inclusive
    by default — expanded to the `max_expansions` highest-df in-range
    terms and scored as a disjunction (the same rewrite contract as
    prefix/wildcard/regexp). Bounds compare lowercased, matching the
    lowercased vocabulary; term order is binary UTF-8 in both Spark
    and the DuckDB twin."""
    rows = []
    for r in ranges:
        qid, lo, hi = r[0], r[1], r[2]
        inc_lo = bool(r[3]) if len(r) > 3 else True
        inc_hi = bool(r[4]) if len(r) > 4 else True
        if lo is None and hi is None:
            raise ValueError(f"qid {qid}: at least one bound is required")
        rows.append(
            (qid, lo.lower() if lo else lo, hi.lower() if hi else hi, inc_lo, inc_hi)
        )
    pdf = spark.createDataFrame(
        rows, "qid long, lo string, hi string, inc_lo boolean, inc_hi boolean"
    )
    los = [r[1] for r in rows]
    his = [r[2] for r in rows]
    envelope = (
        None if any(v is None for v in los) else min(los),
        None if any(v is None for v in his) else max(his),
    )
    qt = expand_term_range(index, pdf, max_expansions, envelope=envelope)
    joined = index.postings.join(
        F.broadcast(qt.select("qid", "term_id", "idf")), "term_id"
    )
    scored = joined.groupBy("qid", "doc_id").agg(
        F.sum(_component(index.stats.avgdl, k1, b)).alias("score")
    )
    return _topk(scored, k)


def match_bool_prefix_search(
    spark: SparkSession,
    queries: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    max_expansions: int = 16,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES ``match_bool_prefix``: every analyzed token becomes an
    optional (SHOULD) term clause except the LAST, which is a
    PrefixQuery expanded to the `max_expansions` highest-df dictionary
    terms (the same rewrite contract as prefix_search); score = BM25
    sum over all matched clauses, tokens may appear anywhere (the
    no-adjacency sibling of match_phrase_prefix). Head tokens are
    deduplicated (one SHOULD clause per distinct term); a head term
    re-selected by the expansion double-counts, as two ES clauses
    would. Plan shape: clause terms and the prefix both broadcast into
    the dictionary scan (StartsWith pushes down); the postings probe
    and (qid, doc) sum are the plain bool-query plan."""
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize as _tok

    analyzer = getattr(index, "analyzer", None)
    trows: List[Tuple[int, str]] = []
    prows: List[Tuple[int, str]] = []
    for qid, text in queries:
        # ORDERED analysis (analyze_query sorts, which would reassign
        # the last-token prefix role)
        toks = _tok(normalize_question(text))
        if analyzer is not None:
            toks = analyzer.analyze_tokens(toks)
        if not toks:
            continue
        for t in sorted(set(toks[:-1])):
            trows.append((qid, t))
        prows.append((qid, toks[-1]))
    if not prows:
        raise ValueError("no tokenizable queries")
    tdf = spark.createDataFrame(trows, "qid long, term string")
    pdf = spark.createDataFrame(prows, "qid long, prefix string")
    qt_terms = (
        index.dictionary.select("term", "term_id", "idf")
        .join(F.broadcast(tdf), "term")
        .select("qid", "term_id", "idf")
    )
    qt_pre = expand_prefix(
        index, pdf, max_expansions, scan_prefixes=[p for _q, p in prows]
    ).select("qid", "term_id", "idf")
    qt = qt_terms.unionByName(qt_pre)
    joined = index.postings.join(F.broadcast(qt), "term_id")
    scored = joined.groupBy("qid", "doc_id").agg(
        F.sum(_component(index.stats.avgdl, k1, b)).alias("score")
    )
    return _topk(scored, k)


def matched_queries(
    spark: SparkSession,
    results: DataFrame,
    named: Sequence[Tuple[int, str, str]],
    index: InvertedIndex,
) -> DataFrame:
    """results + a `matched_queries` column — the ES per-hit
    `matched_queries` response field (bool clauses carrying `_name`):
    for every result row, the sorted comma-joined names of the named
    clauses with ≥1 term present in the doc ('' when none).

    `named`: (qid, name, clause_text) rows; clause text tokenizes with
    the standard chain (set semantics per clause, like bool_search).

    Scale shape: named terms resolve via the broadcast-into-dictionary
    contract; the postings probe is DOUBLY restricted — broadcast named
    term_ids AND a broadcast left-semi on the top-k (qid, doc_id) result
    set — so annotation touches candidate rows only, never re-scoring
    and never a corpus-sized join."""
    from dpr_spark.functions.tokenizer import tokenize

    rows = []
    for qid, name, text in named:
        for t in sorted(set(tokenize(text))):
            rows.append((qid, name, t))
    if not rows:
        raise ValueError("no tokenizable named clauses")
    nt = spark.createDataFrame(rows, "qid long, name string, term string")
    resolved = index.dictionary.select("term", "term_id").join(
        F.broadcast(nt.select("term").distinct()), "term", "left_semi"
    )
    nt = nt.join(F.broadcast(resolved), "term")
    hits = (
        index.postings.join(
            F.broadcast(nt.select("qid", "name", "term_id").distinct()),
            "term_id",
        )
        .join(
            F.broadcast(results.select("qid", "doc_id").distinct()),
            ["qid", "doc_id"],
            "left_semi",
        )
        .select("qid", "doc_id", "name")
        .distinct()
    )
    names = hits.groupBy("qid", "doc_id").agg(
        F.array_join(F.array_sort(F.collect_set("name")), ",").alias(
            "matched_queries"
        )
    )
    return results.join(F.broadcast(names), ["qid", "doc_id"], "left").fillna(
        {"matched_queries": ""}
    )


def terms_set_search(
    spark: SparkSession,
    queries: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    doc_values: DataFrame,
    msm_field: str,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES `terms_set` query: every query term is a SHOULD clause, but
    the per-document minimum number of matching terms comes from a
    STORED field (minimum_should_match_field) — "match if you satisfy
    as many terms as this doc declares it needs". Unclamped, like ES: a
    doc whose field demands more matches than the query's resolved term
    count can never match it.

    Plan shape: the usual probe-in-place postings join + per-(qid, doc)
    count/sum; the msm doc-values join touches only candidate rows,
    never the corpus."""
    from dpr_spark.functions.tokenizer import tokenize

    rows = []
    for qid, q in queries:
        for t in sorted(set(tokenize(q))):
            rows.append((qid, t))
    if not rows:
        raise ValueError("no tokenizable queries")
    qdf = spark.createDataFrame(rows, "qid long, term string")
    qt = index.dictionary.select("term", "term_id", "idf").join(
        F.broadcast(qdf), "term"
    )
    joined = index.postings.join(
        F.broadcast(qt.select("qid", "term_id", "idf")), "term_id"
    )
    per_doc = joined.groupBy("qid", "doc_id").agg(
        F.sum(_component(index.stats.avgdl, k1, b)).alias("score"),
        F.count("*").alias("n_hits"),
    )
    vals = doc_values.select("doc_id", F.col(msm_field).alias("_msm"))
    survivors = per_doc.join(vals, "doc_id").filter(
        F.col("n_hits") >= F.col("_msm")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


def filter_context_search(
    spark: SparkSession,
    queries: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    doc_meta: DataFrame = None,
    ids: Sequence[int] = None,
    exists_field: str = None,
    terms_lookup: Tuple[DataFrame, str] = None,
    boost: float = 1.0,
    k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """ES FILTER CONTEXT: `constant_score` wrapping a bool.filter — the
    query-cache/scoring-off half of the ES query DSL. Clauses:

    - the query's terms (ANY-match via the inverted index — the scored
      retrieval demoted to a filter);
    - `ids`: an explicit doc_id allowlist (ES `ids` query);
    - `exists_field`: doc_meta[field] IS NOT NULL and non-empty
      (ES `exists` query — our columnar analog of "field is indexed");
    - `terms_lookup`: (df, col) — doc_meta[col] must be IN the values
      of a single-column DataFrame fetched from ANOTHER table (ES
      `terms` lookup: the value list lives in a stored document, not
      in the request body).

    Every hit scores exactly `boost` (the constant_score contract —
    no BM25, no tf; Lucene rewrites to a ConstantScoreQuery and skips
    the similarity entirely), so results order by doc_id asc — the
    deterministic tiebreak ES applies when scores tie.

    Scale shape: term resolution rides query_term_pairs (queries
    broadcast into the dictionary scan, analyzer-aware); the ids list
    is a literal IN filter on the candidate rows; the lookup side is
    request-bounded (one stored document's field values) and
    broadcasts; the exists predicate is a pushable IsNotNull + length
    filter on the meta scan. Only candidate (qid, doc_id) rows reach
    the meta join."""
    from dpr_spark.query.wand import query_term_pairs

    qdf = spark.createDataFrame(
        [(int(qid), q) for qid, q in queries], "qid long, question string"
    )
    qt = query_term_pairs(qdf, index, with_idf=False)
    cand = (
        index.postings.select("term_id", "doc_id")
        .join(F.broadcast(qt), "term_id")
        .select("qid", "doc_id")
        .distinct()
    )
    if ids is not None:
        cand = cand.filter(F.col("doc_id").isin([int(i) for i in ids]))
    if doc_meta is not None and (exists_field or terms_lookup):
        meta = doc_meta
        if exists_field:
            meta = meta.filter(
                F.col(exists_field).isNotNull()
                & (F.length(F.col(exists_field).cast("string")) > 0)
            )
        if terms_lookup is not None:
            ldf, lcol = terms_lookup
            meta = meta.join(
                F.broadcast(ldf.select(F.col(ldf.columns[0]).alias(lcol)).distinct()),
                lcol,
                "left_semi",
            )
        cand = cand.join(meta.select("doc_id"), "doc_id", "left_semi")
    w = Window.partitionBy("qid").orderBy(F.asc("doc_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", F.lit(float(boost)).alias("score"))
    )
