"""Configurable analysis chain — the Lucene ``Analyzer`` analog.

The reference delegates its sparse baseline to Lucene/Pyserini
(`/root/reference/README.md:25-26`), whose default English analysis is
tokenize → lowercase → stop-filter → stem (Lucene ``EnglishAnalyzer``:
StandardTokenizer, LowerCaseFilter, StopFilter, PorterStemFilter).
This module reproduces that chain over our SimpleTokenizer tokens:

    tokens (already lowercased, functions/tokenizer.py)
      → stopword filter (Lucene's public 33-word English default)
      → stemmer: "s" (Harman 1991 S-stemmer) or "porter" (Porter 1980)

Two stemmers because of the oracle contract: the S-stemmer's three
rules are expressible as an ANSI-SQL CASE, so driver entries over an
s-stemmed index get a full DuckDB twin; the Porter stemmer (Lucene's
default) is verified by pytest rank-identity against the pure-Python
oracle (DuckDB's native ``stem()`` lives in the fts extension, which is
not installable offline).

Scale shape: the index build applies the analyzer VOCAB-level inside
the fused Arrow kernel (index/build.py::tf_batch) — per Arrow batch it
stems the ~10^4 distinct terms, not the ~10^6 token stream — and the
query side analyzes driver-resident token lists (bytes per query).
Document length (doclen, hence avgdl and BM25 length normalization)
counts SURVIVING tokens, like Lucene's field-length norm, which counts
tokens that reach the index.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import FrozenSet, List, Optional, Sequence

import pandas as pd  # module-level: pandas-UDF string annotations resolve here

# Lucene EnglishAnalyzer / StandardAnalyzer default stop set
# (org.apache.lucene.analysis.en.EnglishAnalyzer#ENGLISH_STOP_WORDS_SET —
# public, 33 words).
LUCENE_ENGLISH_STOPWORDS: FrozenSet[str] = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)


# ---------------------------------------------------------------------------
# S-stemmer (Harman 1991, "How effective is suffixing?") — three rules,
# first match wins; SQL-expressible (see s_stem_sql_case).
# ---------------------------------------------------------------------------


def s_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    if w.endswith("ies") and not w.endswith(("eies", "aies")):
        return w[:-3] + "y"
    if w.endswith("es") and not w.endswith(("aes", "ees", "oes")):
        return w[:-1]
    if w.endswith("s") and not w.endswith(("us", "ss")):
        return w[:-1]
    return w


def s_stem_sql_case(var: str = "t") -> str:
    """The exact same three rules as a SQL CASE over `var` — shared
    DuckDB / Spark-SQL syntax (len, substr 1-based, ||, LIKE)."""
    v = var
    return (
        f"CASE WHEN len({v}) <= 2 THEN {v} "
        f"WHEN {v} LIKE '%ies' AND {v} NOT LIKE '%eies' AND {v} NOT LIKE '%aies' "
        f"THEN substr({v}, 1, len({v}) - 3) || 'y' "
        f"WHEN {v} LIKE '%es' AND {v} NOT LIKE '%aes' AND {v} NOT LIKE '%ees' "
        f"AND {v} NOT LIKE '%oes' THEN substr({v}, 1, len({v}) - 1) "
        f"WHEN {v} LIKE '%s' AND {v} NOT LIKE '%us' AND {v} NOT LIKE '%ss' "
        f"THEN substr({v}, 1, len({v}) - 1) "
        f"ELSE {v} END"
    )


# ---------------------------------------------------------------------------
# Porter stemmer (Porter 1980, "An algorithm for suffix stripping") —
# the classic 5-step algorithm, as published (public domain).
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel→consonant transitions."""
    n = 0
    i = 0
    L = len(w)
    while i < L and _is_cons(w, i):
        i += 1
    while True:
        while i < L and not _is_cons(w, i):
            i += 1
        if i >= L:
            return n
        while i < L and _is_cons(w, i):
            i += 1
        n += 1


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, last consonant not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


# (suffix, replacement) tables, longest-match-first within each step.
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_rule(w: str, rules):
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (m > 0 on the stem)
    r = _longest_rule(w, _STEP2)
    if r is not None:
        stem = w[: len(w) - len(r[0])]
        if _measure(stem) > 0:
            w = stem + r[1]

    # Step 3 (m > 0)
    r = _longest_rule(w, _STEP3)
    if r is not None:
        stem = w[: len(w) - len(r[0])]
        if _measure(stem) > 0:
            w = stem + r[1]

    # Step 4 (m > 1; "ion" additionally requires the stem to end s/t)
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1 and (best != "ion" or stem.endswith(("s", "t"))):
            w = stem

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


_STEMMERS = {"none": None, "s": s_stem, "porter": porter_stem}


# ---------------------------------------------------------------------------
# Analyzer: the chain object carried by an InvertedIndex
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Analyzer:
    """stop-filter + stemmer applied AFTER tokenization; the identity
    analyzer (no stopwords, stemmer='none') is represented as None at
    the index level, never as an Analyzer instance."""

    stopwords: Optional[FrozenSet[str]] = None
    stemmer: str = "none"

    def __post_init__(self):
        if self.stemmer not in _STEMMERS:
            raise ValueError(f"unknown stemmer {self.stemmer!r}")

    # -- python / oracle side ------------------------------------------------

    def analyze_tokens(self, tokens: Sequence[str]) -> List[str]:
        st = _STEMMERS[self.stemmer]
        stop = self.stopwords
        out = []
        for t in tokens:
            if stop is not None and t in stop:
                continue
            out.append(st(t) if st is not None else t)
        return out

    def analyze_with_positions(self, tokens: Sequence[str]) -> List[tuple]:
        """[(original_index, analyzed_term)] for surviving tokens — the
        Lucene position-increment contract: a dropped stopword leaves a
        POSITION GAP (StopFilter bumps the next token's increment), so
        exact-phrase adjacency is judged against original token
        positions, not the compacted stream."""
        st = _STEMMERS[self.stemmer]
        stop = self.stopwords
        out = []
        for i, t in enumerate(tokens):
            if stop is not None and t in stop:
                continue
            out.append((i, st(t) if st is not None else t))
        return out

    # -- build-kernel side (vocab-level, index/build.py::tf_batch) ----------

    def map_vocab(self, terms):
        """pd.Series[str] (distinct lowercased terms) -> pd.Series[object]
        with None for dropped (stopword) terms, stem otherwise. Called
        once per Arrow batch over the batch's ~10^4-term vocabulary."""
        import pandas as pd

        st = _STEMMERS[self.stemmer]
        stop = self.stopwords

        def one(t):
            if stop is not None and t in stop:
                return None
            return st(t) if st is not None else t

        return pd.Series(terms, dtype="object").map(one)

    # -- persistence ---------------------------------------------------------

    def spec(self) -> dict:
        return {
            "stopwords": sorted(self.stopwords) if self.stopwords is not None else None,
            "stemmer": self.stemmer,
        }

    @staticmethod
    def from_spec(spec: Optional[dict]) -> Optional["Analyzer"]:
        if spec is None:
            return None
        sw = spec.get("stopwords")
        return Analyzer(
            stopwords=frozenset(sw) if sw is not None else None,
            stemmer=spec.get("stemmer", "none"),
        )

    # -- oracle-SQL side -----------------------------------------------------

    def sql_toks_expr(self, toks_expr: str) -> str:
        """Wrap a SQL expression producing array<string> tokens with this
        chain — DuckDB list lambdas (list_filter/list_transform). Only
        the S-stemmer is SQL-expressible; Porter entries are pytest-
        verified against the Python oracle instead."""
        if self.stemmer == "porter":
            raise ValueError("porter stemmer has no SQL twin (fts offline)")
        expr = toks_expr
        if self.stopwords is not None:
            lits = ", ".join(f"'{w}'" for w in sorted(self.stopwords))
            expr = f"list_filter({expr}, t -> t NOT IN ({lits}))"
        if self.stemmer == "s":
            expr = f"list_transform({expr}, t -> {s_stem_sql_case('t')})"
        return expr


# The Lucene-EnglishAnalyzer-shaped defaults used by entries/CLI.
ENGLISH_S = Analyzer(stopwords=LUCENE_ENGLISH_STOPWORDS, stemmer="s")
ENGLISH_PORTER = Analyzer(stopwords=LUCENE_ENGLISH_STOPWORDS, stemmer="porter")


def tokenize_analyze_udf(analyzer: Optional[Analyzer]):
    """Arrow-vectorized text -> analyzed token array UDF for DOC-side
    tokenization in query modules that read stored fields (RM3 feedback
    docs, MoreLikeThis seeds): tokens must pass the index's chain or a
    stemmed dictionary would silently drop them. With analyzer=None this
    is exactly functions/tokenizer.tokenize_udf."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dpr_spark.functions.tokenizer import tokenize_fast

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            toks = tokenize_fast(t)
            return analyzer.analyze_tokens(toks) if analyzer is not None else toks

        return s.map(one)

    return _tok


def analyze_query(question: str, analyzer: Optional[Analyzer]) -> List[str]:
    """The query-side chain: normalize (P5) → tokenize (T1) → analyze →
    distinct sorted terms — the single spelling every engine's term
    resolution and the oracle share."""
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    toks = tokenize(normalize_question(question))
    if analyzer is not None:
        toks = analyzer.analyze_tokens(toks)
    return sorted(set(toks))
