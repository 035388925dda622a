"""Query-string language — the Lucene classic/`simple_query_string`
parser surface compiled onto this engine's existing query machinery:

    +spark windo~ -batch "window agg" filt*

Grammar (whitespace-separated clauses; a documented subset of Lucene's
QueryParser, kept unambiguous so the pure-Python and DuckDB twins can
reproduce every decision):

- leading `+` = MUST, `-` = MUST_NOT, neither = SHOULD;
- `"a b"`   = exact-phrase clause (positional postings; a 1-token
  phrase degenerates to exactly the plain-term BM25 component);
- `tok~` / `tok~2` = fuzzy clause (Levenshtein ≤ edits, default 1;
  expansion rules identical to query/fuzzy.py: dist ASC / df DESC /
  term ASC capped at max_expansions, boost 1 − dist/max(len));
- `to*k` / `t?k` = wildcard clause (glob; top-df max_expansions
  expansion, the query/boolquery.py rewrite with pushed literal runs);
- anything else tokenizes with the standard chain; multi-token input
  yields one term clause per token (Lucene's analyzer-splits-behave-
  as-the-operator-joins rule, default OR).

Duplicate (kind, occur, payload) clauses collapse (set semantics, like
bool_search). Scoring: Σ over matched scoring elements — BM25
components for terms, boost-scaled components for expansions, the
phrase-frequency BM25 of query/phrase.py for phrases. Constraints:
every MUST clause must match (a wildcard/fuzzy MUST needs ≥1 expansion
present), no MUST_NOT clause may (any expansion / phrase occurrence
vetoes). MUST_NOT clauses never contribute score.

Scale shape: everything rides the proven paths — clause terms and
expansions broadcast INTO the dictionary scan (pushed prefix/literal
filters), postings probed in place, phrase verification on the
positional postings with the candidate set broadcast; the per-doc
fold is one map-side-combined aggregation keyed (qid, doc, clause).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex

_FUZZY_RE = re.compile(r"^(.+?)~(\d?)$")
# clause-id keyspace when re-keying expansion calls (qid*_CKEY + cid)
_CKEY = 1000


@dataclass(frozen=True)
class QSClause:
    cid: int
    kind: str  # term | phrase | wildcard | fuzzy
    occur: str  # must | should | must_not
    text: str
    edits: int = 1


def parse_query_string(s: str, default_operator: str = "or") -> List[QSClause]:
    """Deterministic parse; raises ValueError on empty/unparsable.
    default_operator (ES simple_query_string/query_string
    `default_operator`): "or" (default) makes unprefixed clauses
    SHOULD; "and" makes them MUST (explicit +/- prefixes are
    unaffected). A multi-token bare input under "and" therefore
    requires EVERY token, Lucene's analyzer-splits-join-with-the-
    operator rule."""
    if default_operator not in ("or", "and"):
        raise ValueError(f"unknown default_operator {default_operator!r}")
    bare = "should" if default_operator == "or" else "must"
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    raw = normalize_question(s)
    toks = re.findall(r'[+-]?"[^"]*"|\S+', raw)
    seen, out = set(), []

    def add(kind, occur, text, edits=1):
        key = (kind, occur, text, edits)
        if key in seen or not text:
            return
        seen.add(key)
        out.append(QSClause(len(out), kind, occur, text, edits))

    for t in toks:
        occur = bare
        if t.startswith("+"):
            occur, t = "must", t[1:]
        elif t.startswith("-"):
            occur, t = "must_not", t[1:]
        if not t:
            continue
        if t.startswith('"') and t.endswith('"'):
            words = tokenize(t[1:-1])
            if words:
                add("phrase", occur, " ".join(words))
            continue
        m = _FUZZY_RE.match(t)
        if m and "*" not in t and "?" not in t:
            words = tokenize(m.group(1))
            edits = int(m.group(2) or 1)
            for w in words:
                add("fuzzy", occur, w, edits)
            continue
        if "*" in t or "?" in t:
            add("wildcard", occur, t.lower())
            continue
        for w in tokenize(t):
            add("term", occur, w)
    if not out:
        raise ValueError(f"unparsable query string: {s!r}")
    return out


def query_string_search(
    spark: SparkSession,
    queries: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    positions: Optional[DataFrame] = None,
    k: int = DEFAULT_TOP_K,
    max_expansions: int = 8,
    k1: float = BM25_K1,
    b: float = BM25_B,
    default_operator: str = "or",
) -> DataFrame:
    """(qid, rank, doc_id, score) top-k under the parsed semantics."""
    from dpr_spark.query.boolquery import expand_wildcard, wildcard_regex
    from dpr_spark.query.fuzzy import expand_fuzzy
    from dpr_spark.query.scorer import top_k

    parsed = {qid: parse_query_string(q, default_operator) for qid, q in queries}
    if any(
        c.kind == "phrase" for cs in parsed.values() for c in cs
    ) and positions is None:
        raise ValueError("phrase clauses need a positional index")

    avgdl = float(index.stats.avgdl)
    comp = (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl))
        )
    )

    # ---- scoring/veto elements: (qid, cid, occur, term_id, idf, boost)
    term_rows, fuzzy_rows, wild_rows, phrase_list = [], [], [], []
    for qid, cs in parsed.items():
        for c in cs:
            if c.kind == "term":
                term_rows.append((qid, c.cid, c.occur, c.text))
            elif c.kind == "fuzzy":
                fuzzy_rows.append((qid, c.cid, c.occur, c.text, c.edits))
            elif c.kind == "wildcard":
                wild_rows.append((qid, c.cid, c.occur, c.text))
            else:
                phrase_list.append((qid, c.cid, c.occur, c.text))

    elems = None

    def add_elems(df):
        nonlocal elems
        elems = df if elems is None else elems.unionByName(df)

    if term_rows:
        tdf = spark.createDataFrame(
            term_rows, "qid long, cid int, occur string, term string"
        )
        resolved = index.dictionary.select("term", "term_id", "idf").join(
            F.broadcast(tdf.select("term").distinct()), "term", "left_semi"
        )
        add_elems(
            tdf.join(F.broadcast(resolved), "term").select(
                "qid", "cid", "occur", "term_id", "idf",
                F.lit(1.0).alias("boost"),
            )
        )
    if fuzzy_rows:
        # expand_fuzzy partitions by (qid, clause token): re-key per
        # (qid, cid) so identical tokens in different clauses stay
        # apart; one expansion call per distinct edit distance so each
        # clause's top-max_expansions cap sees only its own radius
        for edits in sorted({e for *_r, e in fuzzy_rows}):
            grp = [r for r in fuzzy_rows if r[4] == edits]
            fdf = spark.createDataFrame(
                [(q * _CKEY + c, t) for q, c, _, t, _ in grp],
                "qid long, clause string",
            )
            exp = expand_fuzzy(
                index, fdf, max_edits=edits, max_expansions=max_expansions,
                prefix_len=1, prefix_literals=[t for _, _, _, t, _ in grp],
            )
            occ = spark.createDataFrame(
                [(q * _CKEY + c, o) for q, c, o, _t, _e in grp],
                "skey long, occur string",
            )
            add_elems(
                exp.withColumnRenamed("qid", "skey")
                .join(F.broadcast(occ), "skey")
                .select(
                    F.floor(F.col("skey") / _CKEY).cast("long").alias("qid"),
                    F.pmod("skey", F.lit(_CKEY)).cast("int").alias("cid"),
                    "occur", "term_id", "idf", "boost",
                )
            )
    if wild_rows:
        wdf = spark.createDataFrame(
            [(q * _CKEY + c, wildcard_regex(t)) for q, c, _, t in wild_rows],
            "qid long, rx string",
        )
        exp = expand_wildcard(
            index, wdf, max_expansions,
            glob_literals=[t for _, _, _, t in wild_rows],
        )
        occ = spark.createDataFrame(
            [(q * _CKEY + c, o) for q, c, o, _t in wild_rows],
            "skey long, occur string",
        )
        add_elems(
            exp.withColumnRenamed("qid", "skey")
            .join(F.broadcast(occ), "skey")
            .select(
                F.floor(F.col("skey") / _CKEY).cast("long").alias("qid"),
                F.pmod("skey", F.lit(_CKEY)).cast("int").alias("cid"),
                "occur", "term_id", "idf",
                F.lit(1.0).alias("boost"),
            )
        )

    # ---- per-(qid, doc, clause) contributions
    parts = None
    if elems is not None:
        probe = index.postings.join(
            F.broadcast(
                elems.select("qid", "cid", "occur", "term_id", "idf", "boost")
            ),
            "term_id",
        )
        parts = probe.groupBy("qid", "doc_id", "cid", "occur").agg(
            F.sum(F.col("boost") * comp).alias("contrib")
        )
    if phrase_list:
        from dpr_spark.query.phrase import phrase_search_index

        ph = phrase_search_index(
            spark, index, positions,
            [(q * _CKEY + c, t) for q, c, _, t in phrase_list],
            k=1 << 30, k1=k1, b=b,
        )
        occ = spark.createDataFrame(
            [(q * _CKEY + c, o) for q, c, o, _t in phrase_list],
            "skey long, occur string",
        )
        pparts = (
            ph.withColumnRenamed("qid", "skey")
            .join(F.broadcast(occ), "skey")
            .select(
                F.floor(F.col("skey") / _CKEY).cast("long").alias("qid"),
                F.col("doc_id"),
                F.pmod("skey", F.lit(_CKEY)).cast("int").alias("cid"),
                "occur",
                F.col("score").alias("contrib"),
            )
        )
        parts = pparts if parts is None else parts.unionByName(pparts)
    if parts is None:
        raise ValueError("no clauses resolved")

    # ---- constraints + score
    n_must = {qid: sum(1 for c in cs if c.occur == "must") for qid, cs in parsed.items()}
    nm = spark.createDataFrame(
        [(q, n) for q, n in n_must.items()], "qid long, n_must int"
    )
    cand = parts.filter(F.col("occur") != "must_not")
    per_doc = cand.groupBy("qid", "doc_id").agg(
        F.sum("contrib").alias("score"),
        F.count_distinct(
            F.when(F.col("occur") == "must", F.col("cid"))
        ).alias("must_hits"),
    )
    per_doc = per_doc.join(F.broadcast(nm), "qid").filter(
        F.col("must_hits") == F.col("n_must")
    )
    veto = parts.filter(F.col("occur") == "must_not").select("qid", "doc_id").distinct()
    per_doc = per_doc.join(veto, ["qid", "doc_id"], "left_anti")
    return top_k(per_doc.select("qid", "doc_id", "score"), k)
