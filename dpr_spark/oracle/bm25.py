"""Single-node pure-Python BM25 oracle (SURVEY.md §5).

DPR delegates sparse retrieval to external Lucene/Pyserini
(`/root/reference/README.md:25-26`), so the rank-identity contract is
against THIS deterministic in-repo oracle, which fixes every ambiguous
choice; the Spark engine applies the exact same rules:

- tokenizer: SimpleTokenizer semantics, uncased
  (`dpr/utils/tokenizers.py:157-199`) via dpr_spark.functions.tokenizer.
- question normalization `’`->`'` before tokenizing
  (`dpr/utils/data_utils.py:63-65`).
- BM25 (Okapi, Lucene-style idf): k1=1.2, b=0.75 (BASELINE.json);
    idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    s(t, d) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  computed in float64; duplicate query terms count ONCE (set semantics).
- ties broken by ascending doc_id; ranks are 1-based.

Also hosts the validation oracles:
- has_answer V1 (`dpr/data/qa_validation.py:175-193`): NFD + uncased
  token-subsequence containment.
- accuracy@k A1 (`qa_validation.py:72-78`): cumulative first-hit
  histogram.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Sequence, Tuple

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.functions.normalize import nfd, normalize_question
from dpr_spark.functions.tokenizer import tokenize


@dataclass
class BM25Oracle:
    k1: float = BM25_K1
    b: float = BM25_B
    # doc_id -> token list
    doc_tokens: Dict[int, List[str]] = field(default_factory=dict)
    doc_text: Dict[int, str] = field(default_factory=dict)
    # optional functions/analysis.Analyzer — applied to doc tokens in
    # add() and to query tokens in search(), mirroring the engine's
    # index-analyzer contract (doclen counts surviving tokens)
    analyzer: object = None

    def add(self, doc_id: int, text: str) -> None:
        toks = tokenize(text)
        if self.analyzer is not None:
            toks = self.analyzer.analyze_tokens(toks)
        self.doc_tokens[doc_id] = toks
        self.doc_text[doc_id] = text

    def build(self) -> None:
        self.N = len(self.doc_tokens)
        self.doclen = {d: len(t) for d, t in self.doc_tokens.items()}
        self.avgdl = sum(self.doclen.values()) / self.N if self.N else 0.0
        self.postings: Dict[str, Dict[int, int]] = {}
        for d, toks in self.doc_tokens.items():
            for t in toks:
                self.postings.setdefault(t, {})
                self.postings[t][d] = self.postings[t].get(d, 0) + 1
        self.df = {t: len(p) for t, p in self.postings.items()}

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log((self.N - df + 0.5) / (df + 0.5) + 1.0)

    def score_one(self, term: str, doc_id: int) -> float:
        tf = self.postings.get(term, {}).get(doc_id, 0)
        if tf == 0:
            return 0.0
        dl = self.doclen[doc_id]
        return (
            self.idf(term)
            * tf
            * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        )

    def search(self, question: str, k: int = 10) -> List[Tuple[int, float]]:
        """Top-k (doc_id, score), score desc then doc_id asc; 0-score docs
        are never returned (a doc must contain >=1 query term)."""
        from dpr_spark.functions.analysis import analyze_query

        terms = analyze_query(question, self.analyzer)
        scores: Dict[int, float] = {}
        for t in terms:
            for d in self.postings.get(t, ()):  # docs containing t
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def classic_search(self, question: str, k: int = 10) -> List[Tuple[int, float]]:
        """Classic TF-IDF twin (query/similarity.py contract):
        Σ_t sqrt(tf)·idf²·1/sqrt(dl), idf = 1 + ln(N/(df+1)); ascending-
        term fold order, same as the engine's term_id fold."""
        terms = sorted(set(tokenize(normalize_question(question))))
        scores: Dict[int, float] = {}
        for t in terms:
            df = self.df.get(t, 0)
            if df == 0:
                continue
            idf = 1.0 + math.log(self.N / (df + 1.0))
            for d, tf in self.postings[t].items():
                c = math.sqrt(tf) * idf * idf / math.sqrt(self.doclen[d])
                scores[d] = scores.get(d, 0.0) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def lmdirichlet_search(
        self, question: str, k: int = 10, mu: float = 2000.0
    ) -> List[Tuple[int, float]]:
        """LM Dirichlet twin (query/similarity.py contract):
        Σ_t max(0, ln(1 + tf/(mu·ctf/total)) + ln(mu/(dl+mu)))."""
        terms = sorted(set(tokenize(normalize_question(question))))
        total = float(sum(self.doclen.values()))
        scores: Dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            ctf = float(sum(plist.values()))
            p_c = ctf / total
            for d, tf in plist.items():
                dl = self.doclen[d]
                raw = math.log(1.0 + tf / (mu * p_c)) + math.log(mu / (dl + mu))
                scores[d] = scores.get(d, 0.0) + max(0.0, raw)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def lmjelinekmercer_search(
        self, question: str, k: int = 10, lam: float = 0.1
    ) -> List[Tuple[int, float]]:
        """LM Jelinek-Mercer twin (query/similarity.py contract):
        Σ_t ln(1 + ((1−λ)·tf/dl)/(λ·ctf/total))."""
        terms = sorted(set(tokenize(normalize_question(question))))
        total = float(sum(self.doclen.values()))
        scores: Dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            p_c = float(sum(plist.values())) / total
            for d, tf in plist.items():
                dl = self.doclen[d]
                c = math.log(1.0 + ((1.0 - lam) * tf / dl) / (lam * p_c))
                scores[d] = scores.get(d, 0.0) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def dfi_search(self, question: str, k: int = 10) -> List[Tuple[int, float]]:
        """DFI twin (query/similarity.py contract): expected =
        ctf·dl/total; log2(1 + (tf−e)/sqrt(e)) when tf > e else 0.
        Docs where every term sits at/below independence still appear
        with score 0 (they matched ≥1 term), same as the engine."""
        terms = sorted(set(tokenize(normalize_question(question))))
        total = float(sum(self.doclen.values()))
        scores: Dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            ctf = float(sum(plist.values()))
            for d, tf in plist.items():
                e = ctf * self.doclen[d] / total
                c = math.log2(1.0 + (tf - e) / math.sqrt(e)) if tf > e else 0.0
                scores[d] = scores.get(d, 0.0) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    # ------------------------------------------------------------------
    # Lucene-parity query-surface twins (query/phrase.py, query/boolquery.py)
    # ------------------------------------------------------------------

    def _score_pf(self, pf: int, doc_id: int, idf_sum: float) -> float:
        """BM25 with tf := phrase frequency and idf := per-position sum."""
        dl = self.doclen[doc_id]
        return (
            idf_sum
            * pf
            * (self.k1 + 1.0)
            / (pf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        )

    def phrase_search(self, phrase: str, k: int = 10) -> List[Tuple[int, float]]:
        """Exact-phrase top-k (PhraseQuery twin): docs where the phrase's
        tokens occur at consecutive positions; tf = occurrence count,
        idf = sum over phrase POSITIONS (duplicates count per position)."""
        toks = tokenize(normalize_question(phrase))
        if not toks or any(t not in self.postings for t in toks):
            return []
        idf_sum = sum(self.idf(t) for t in toks)
        scores: Dict[int, float] = {}
        for d in self.postings[toks[0]]:
            dt = self.doc_tokens[d]
            pf = sum(
                1
                for i in range(len(dt) - len(toks) + 1)
                if dt[i : i + len(toks)] == toks
            )
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def match_phrase_prefix_search(
        self, query: str, k: int = 10, max_expansions: int = 16
    ) -> List[Tuple[int, float]]:
        """match_phrase_prefix twin: last token is a prefix, expanded
        to the first max_expansions dictionary terms in TERM ORDER;
        exact adjacency with the last position matching ANY expansion;
        idf = exact-position sum + max over expansions; OOV exact term
        or zero expansions -> no matches."""
        toks = tokenize(normalize_question(query))
        if not toks:
            return []
        head, pre = toks[:-1], toks[-1]
        if any(t not in self.postings for t in head):
            return []
        exp = sorted(t for t in self.postings if t.startswith(pre))
        exp = exp[:max_expansions]
        if not exp:
            return []
        idf_sum = sum(self.idf(t) for t in head) + max(self.idf(t) for t in exp)
        expset = set(exp)
        n = len(toks)
        cand = (
            set(self.postings[head[0]])
            if head
            else {d for t in exp for d in self.postings[t]}
        )
        scores: Dict[int, float] = {}
        for d in cand:
            dt = self.doc_tokens[d]
            pf = sum(
                1
                for i in range(len(dt) - n + 1)
                if dt[i : i + n - 1] == head and dt[i + n - 1] in expset
            )
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def bool_search(
        self,
        must: Sequence[str],
        should: Sequence[str],
        must_not: Sequence[str],
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """BooleanQuery twin: doc qualifies iff it has every must term and
        no must_not term; score = BM25 sum over matched must+should terms
        (set semantics; a term in both clauses scores once)."""

        def norm(terms: Sequence[str]) -> List[str]:
            out: set = set()
            for t in terms:
                out.update(tokenize(t))
            return sorted(out)

        m, s, x = norm(must), norm(should), norm(must_not)
        s = [t for t in s if t not in m]
        scores: Dict[int, float] = {}
        for t in m + s:
            for d in self.postings.get(t, ()):
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        out = []
        for d, sc in scores.items():
            if any(d not in self.postings.get(t, {}) for t in m):
                continue
            if any(d in self.postings.get(t, {}) for t in x):
                continue
            out.append((d, sc))
        # a must-term absent from the corpus vocabulary -> no doc matches
        if any(t not in self.postings for t in m):
            return []
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:k]

    def function_score_search(
        self,
        question: str,
        values: Dict[int, float],
        fn,
        boost_mode: str = "multiply",
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """Function-score twin (query/funcscore.py contract): BM25 over
        ALL matched docs, then score ∘ fn(values[doc]) per doc."""
        from dpr_spark.functions.analysis import analyze_query

        terms = analyze_query(question, self.analyzer)
        scores: Dict[int, float] = {}
        for t in terms:
            for d in self.postings.get(t, ()):
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        out = {}
        for d, s in scores.items():
            boost = fn(values[d])
            out[d] = s * boost if boost_mode == "multiply" else s + boost
        ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def boosting_search(
        self,
        question: str,
        neg_question: str,
        negative_boost: float = 0.2,
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """Boosting-query twin (query/funcscore.py::search_boosting):
        BM25 over all positive matches; docs matching ANY negative term
        are demoted by ×negative_boost (kept, not vetoed)."""
        from dpr_spark.functions.analysis import analyze_query

        terms = analyze_query(question, self.analyzer)
        scores: Dict[int, float] = {}
        for t in terms:
            for d in self.postings.get(t, ()):
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        neg = set()
        for t in analyze_query(neg_question, self.analyzer):
            neg.update(self.postings.get(t, ()))
        out = {
            d: (s * negative_boost if d in neg else s)
            for d, s in scores.items()
        }
        ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def dismax_search(
        self,
        clauses: Sequence[Tuple[str, float]],
        tie_breaker: float = 0.0,
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """Dis-max twin (query/dismax.py contract): clause_score =
        boost · BM25 sum over the clause's token set; doc score =
        max + tie_breaker · (sum − max)."""
        per_doc: Dict[int, List[float]] = {}
        for text, boost in clauses:
            terms = sorted(set(tokenize(normalize_question(text))))
            cs: Dict[int, float] = {}
            for t in terms:
                for d in self.postings.get(t, ()):
                    cs[d] = cs.get(d, 0.0) + self.score_one(t, d)
            for d, s in cs.items():
                per_doc.setdefault(d, []).append(boost * s)
        scores = {
            d: max(bcs) + tie_breaker * (sum(bcs) - max(bcs))
            for d, bcs in per_doc.items()
        }
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def fuzzy_search(
        self,
        query: str,
        k: int = 10,
        max_edits: int = 1,
        max_expansions: int = 8,
        prefix_len: int = 0,
    ) -> List[Tuple[int, float]]:
        """FuzzyQuery twin: per distinct query token, expand to the
        max_expansions dictionary terms within max_edits Levenshtein
        (rank: distance ASC, df DESC, term ASC; optional shared prefix),
        score BM25 * (1 - dist / max(len(clause), len(term))); a term
        reachable from two clauses contributes to both."""
        clauses = sorted(set(tokenize(normalize_question(query))))
        scores: Dict[int, float] = {}
        for c in clauses:
            cand = []
            for t in self.postings:
                if prefix_len > 0 and t[:prefix_len] != c[:prefix_len]:
                    continue
                d = _levenshtein(c, t, max_edits)
                if d >= 0:
                    cand.append((d, -self.df[t], t))
            cand.sort()
            for d, _negdf, t in cand[:max_expansions]:
                boost = 1.0 - d / max(len(c), len(t))
                for doc in self.postings[t]:
                    scores[doc] = scores.get(doc, 0.0) + boost * self.score_one(t, doc)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def span_near_search(
        self, query: str, k: int = 10, window: int = 8
    ) -> List[Tuple[int, float]]:
        """SpanNear (unordered) twin: all distinct query terms within a
        window-token span; pf = qualifying end positions, idf = per-term
        sum; OOV term -> no matches."""
        terms = sorted(set(tokenize(normalize_question(query))))
        if not terms or any(t not in self.postings for t in terms):
            return []
        idf_sum = sum(self.idf(t) for t in terms)
        # docs containing every term
        docs = set(self.postings[terms[0]])
        for t in terms[1:]:
            docs &= set(self.postings[t])
        scores: Dict[int, float] = {}
        for d in docs:
            pos = {
                t: [i for i, tok in enumerate(self.doc_tokens[d]) if tok == t]
                for t in terms
            }
            ends = sorted({p for ps in pos.values() for p in ps})
            pf = sum(
                1
                for p in ends
                if all(any(p - window < x <= p for x in pos[t]) for t in terms)
            )
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def span_ordered_search(
        self, phrase: str, k: int = 10, slop: int = 2
    ) -> List[Tuple[int, float]]:
        """Ordered-span twin (query/phrase.py::span_ordered_search_index
        contract): the phrase tokens must occur IN ORDER within width
        len(tokens) + slop; pf = start positions whose GREEDY chain
        (smallest next position > previous) fits the width; idf =
        per-position sum; slop=0 == phrase_search."""
        toks = tokenize(normalize_question(phrase))
        if not toks or any(t not in self.postings for t in toks):
            return []
        idf_sum = sum(self.idf(t) for t in toks)
        width = len(toks) + slop
        scores: Dict[int, float] = {}
        for d in self.postings[toks[0]]:
            dt = self.doc_tokens[d]
            pos = {t: [i for i, tok in enumerate(dt) if tok == t] for t in set(toks)}
            pf = 0
            for p0 in pos[toks[0]]:
                cur, ok = p0, True
                for t in toks[1:]:
                    nxt = next((p for p in pos[t] if p > cur), None)
                    if nxt is None:
                        ok = False
                        break
                    cur = nxt
                if ok and cur - p0 + 1 <= width:
                    pf += 1
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def span_gap_search(
        self,
        gapped: Sequence[Tuple[str, int]],
        k: int = 10,
        slop: int = 0,
    ) -> List[Tuple[int, float]]:
        """Gapped ordered-span twin (query/phrase.py::
        span_gap_search_index contract — Lucene SpanGapQuery): gapped =
        [(term, gap_before), ...]; offsets inflate by the gaps, the
        greedy chain honors per-step minimum spacing pos >= cur + Δoff,
        and a start qualifies when cur - p0 <= off_max + slop."""
        seq: List[Tuple[int, str]] = []
        off = 0
        for i, (term, gap) in enumerate(gapped):
            ts = tokenize(normalize_question(term))
            if len(ts) != 1:
                raise ValueError(f"span_gap clause must be one token: {term!r}")
            if i > 0:
                off += 1 + gap
            seq.append((off, ts[0]))
        toks = [t for _, t in seq]
        if not toks or any(t not in self.postings for t in toks):
            return []
        idf_sum = sum(self.idf(t) for t in toks)
        span_1 = seq[-1][0] - seq[0][0]
        scores: Dict[int, float] = {}
        for d in self.postings[toks[0]]:
            dt = self.doc_tokens[d]
            pos = {t: [i for i, tok in enumerate(dt) if tok == t] for t in set(toks)}
            pf = 0
            for p0 in pos[toks[0]]:
                cur, prev_off, ok = p0, seq[0][0], True
                for off_i, t in seq[1:]:
                    delta = off_i - prev_off
                    nxt = next((p for p in pos[t] if p >= cur + delta), None)
                    if nxt is None:
                        ok = False
                        break
                    cur, prev_off = nxt, off_i
                if ok and cur - p0 <= span_1 + slop:
                    pf += 1
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def span_first_search(
        self, query: str, k: int = 10, window: int = 8, first_n: int = 50
    ) -> List[Tuple[int, float]]:
        """SpanFirst twin: span_near ends restricted to the document's
        first first_n tokens (0-based p < first_n)."""
        terms = sorted(set(tokenize(normalize_question(query))))
        if not terms or any(t not in self.postings for t in terms):
            return []
        idf_sum = sum(self.idf(t) for t in terms)
        docs = set(self.postings[terms[0]])
        for t in terms[1:]:
            docs &= set(self.postings[t])
        scores: Dict[int, float] = {}
        for d in docs:
            pos = {
                t: [i for i, tok in enumerate(self.doc_tokens[d]) if tok == t]
                for t in terms
            }
            ends = sorted({p for ps in pos.values() for p in ps})
            pf = sum(
                1
                for p in ends
                if p < first_n
                and all(any(p - window < x <= p for x in pos[t]) for t in terms)
            )
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def span_or_near_search(
        self, clauses: List[List[str]], k: int = 10, window: int = 8
    ) -> List[Tuple[int, float]]:
        """SpanOr-inside-SpanNear twin: each clause is a list of
        alternative terms; every clause needs SOME alternative within
        the window; clause positions = union over resolved alternatives;
        clause idf = max over resolved alternatives."""
        resolved = []
        for alts in clauses:
            toks = sorted(
                {t for a in alts for t in tokenize(normalize_question(a))}
            )
            got = [t for t in toks if t in self.postings]
            if not got:
                return []
            resolved.append(got)
        idf_sum = sum(max(self.idf(t) for t in got) for got in resolved)
        docsets = [
            set().union(*(self.postings[t] for t in got)) for got in resolved
        ]
        docs = set.intersection(*docsets)
        scores: Dict[int, float] = {}
        for d in docs:
            dt = self.doc_tokens[d]
            cpos = [
                sorted({i for i, tok in enumerate(dt) if tok in got})
                for got in resolved
            ]
            ends = sorted({p for ps in cpos for p in ps})
            pf = sum(
                1
                for p in ends
                if all(any(p - window < x <= p for x in ps) for ps in cpos)
            )
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def span_multi_search(
        self,
        clauses: List[str],
        k: int = 10,
        window: int = 8,
        max_expansions: int = 16,
    ) -> List[Tuple[int, float]]:
        """SpanMultiTermQueryWrapper-in-SpanNear twin
        (query/phrase.py::span_multi_search_index contract): a clause
        with `*`/`?` expands to its max_expansions highest-df matching
        terms (ties term asc); other clauses contribute their analyzed
        tokens as literal clauses. Clause positions = union over
        expanded terms, clause idf = idf of the UNION df (the clause
        behaves as one pseudo-term); any empty clause -> no matches."""
        import re as _re

        term_sets: List[List[str]] = []
        seen: set = set()  # duplicate clauses collapse (engine contract)
        for c in clauses:
            if "*" in c or "?" in c:
                if ("g", c.lower()) in seen:
                    continue
                seen.add(("g", c.lower()))
                pat = []
                for ch in c.lower():
                    if ch == "*":
                        pat.append(".*")
                    elif ch == "?":
                        pat.append(".")
                    else:
                        pat.append(_re.escape(ch))
                rx = _re.compile("^" + "".join(pat) + "$")
                got = [t for t in self.postings if rx.match(t)]
                got.sort(key=lambda t: (-self.df[t], t))
                got = got[:max_expansions]
                if not got:
                    return []
                term_sets.append(got)
            else:
                for t in tokenize(normalize_question(c)):
                    if ("t", t) in seen:
                        continue
                    seen.add(("t", t))
                    if t not in self.postings:
                        return []
                    term_sets.append([t])
        if not term_sets:
            return []
        idf_sum = 0.0
        for got in term_sets:
            dfu = len(set().union(*(self.postings[t] for t in got)))
            idf_sum += math.log(
                (self.N - dfu + 0.5) / (dfu + 0.5) + 1.0
            )
        docsets = [
            set().union(*(self.postings[t] for t in got)) for got in term_sets
        ]
        docs = set.intersection(*docsets)
        scores: Dict[int, float] = {}
        for d in docs:
            dt = self.doc_tokens[d]
            cpos = [
                sorted({i for i, tok in enumerate(dt) if tok in got})
                for got in term_sets
            ]
            ends = sorted({p for ps in cpos for p in ps})
            pf = sum(
                1
                for p in ends
                if all(any(p - window < x <= p for x in ps) for ps in cpos)
            )
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def span_not_search(
        self, include: str, exclude: str, k: int = 10, dist: int = 3
    ) -> List[Tuple[int, float]]:
        """SpanNot twin: include occurrences with no exclude occurrence
        within dist tokens (|e - p| <= dist kills the occurrence); an
        unresolvable exclude excludes nothing."""
        it = tokenize(normalize_question(include))
        et = tokenize(normalize_question(exclude))
        if not it or it[0] not in self.postings:
            return []
        inc = it[0]
        exc = et[0] if et else None
        idf_sum = self.idf(inc)
        scores: Dict[int, float] = {}
        for d in self.postings[inc]:
            dt = self.doc_tokens[d]
            ipos = [i for i, tok in enumerate(dt) if tok == inc]
            epos = (
                [i for i, tok in enumerate(dt) if tok == exc] if exc else []
            )
            pf = sum(
                1
                for p in ipos
                if all(abs(e - p) > dist for e in epos)
            )
            if pf:
                scores[d] = self._score_pf(pf, d, idf_sum)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def rm3_search(
        self,
        question: str,
        k: int = 10,
        fb_docs: int = 10,
        fb_terms: int = 10,
        alpha: float = 0.5,
    ) -> List[Tuple[int, float]]:
        """RM3 twin (query/rm3.py contract): BM25 top fb_docs -> RM1
        term weights (tf/dl * doc_score, normalized, top fb_terms, ties
        term ASC) -> alpha-interpolated weighted BM25 rescore."""
        base = self.search(question, fb_docs)
        w_raw: Dict[str, float] = {}
        for d, s in base:
            toks = self.doc_tokens[d]
            dl = len(toks)
            tf: Dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for t, c in tf.items():
                w_raw[t] = w_raw.get(t, 0.0) + (c / dl) * s
        total = sum(w_raw.values())
        exp: Dict[str, float] = {}
        if total > 0:
            cand = sorted((-(w / total), t) for t, w in w_raw.items())
            exp = {t: -negw for negw, t in cand[:fb_terms]}
        qterms = sorted(set(tokenize(normalize_question(question))))
        final: Dict[str, float] = {}
        for t in qterms:
            final[t] = final.get(t, 0.0) + alpha / len(qterms)
        for t, wn in exp.items():
            final[t] = final.get(t, 0.0) + (1.0 - alpha) * wn
        scores: Dict[int, float] = {}
        for t, wt in final.items():
            for d in self.postings.get(t, ()):
                scores[d] = scores.get(d, 0.0) + wt * self.score_one(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def more_like_this(
        self,
        seed_doc: int,
        k: int = 10,
        min_tf: int = 2,
        min_df: int = 3,
        max_query_terms: int = 25,
        unlike_docs: Sequence[int] = (),
    ) -> List[Tuple[int, float]]:
        """MoreLikeThis twin: seed terms with tf>=min_tf and df>=min_df
        ranked (tf*idf DESC, term ASC), top max_query_terms, run as a
        BM25 disjunction excluding the seed itself. `unlike_docs`
        (ES more_like_this `unlike`): any term occurring in an unlike
        doc is dropped before ranking, and unlike docs are excluded
        from the results."""
        skip = set()
        for u in unlike_docs:
            skip.update(self.doc_tokens[u])
        tf: Dict[str, int] = {}
        for t in self.doc_tokens[seed_doc]:
            tf[t] = tf.get(t, 0) + 1
        cand = [
            (-(c * self.idf(t)), t)
            for t, c in tf.items()
            if c >= min_tf and self.df.get(t, 0) >= min_df and t not in skip
        ]
        cand.sort()
        terms = [t for _s, t in cand[:max_query_terms]]
        excluded = {seed_doc, *unlike_docs}
        scores: Dict[int, float] = {}
        for t in terms:
            for d in self.postings.get(t, ()):
                if d in excluded:
                    continue
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def wildcard_search(
        self, pattern: str, k: int = 10, max_expansions: int = 16
    ) -> List[Tuple[int, float]]:
        """WildcardQuery twin: `*`/`?` glob over the vocabulary,
        expansion ranked (df DESC, term ASC), scored as a disjunction."""
        import re

        from dpr_spark.query.boolquery import wildcard_regex

        rx = re.compile(wildcard_regex(pattern))
        cand = sorted(
            (t for t in self.postings if rx.match(t)),
            key=lambda t: (-self.df[t], t),
        )[:max_expansions]
        scores: Dict[int, float] = {}
        for t in cand:
            for d in self.postings[t]:
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def regexp_search(
        self, pattern: str, k: int = 10, max_expansions: int = 16
    ) -> List[Tuple[int, float]]:
        """RegexpQuery twin (query/boolquery.py regexp_search): anchored
        regex over the vocabulary, expansion ranked (df DESC, term ASC),
        scored as a disjunction."""
        import re

        rx = re.compile(f"^(?:{pattern.lower()})$")
        cand = sorted(
            (t for t in self.postings if rx.match(t)),
            key=lambda t: (-self.df[t], t),
        )[:max_expansions]
        scores: Dict[int, float] = {}
        for t in cand:
            for d in self.postings[t]:
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def term_range_search(
        self,
        lo,
        hi,
        k: int = 10,
        max_expansions: int = 16,
        inc_lo: bool = True,
        inc_hi: bool = True,
    ) -> List[Tuple[int, float]]:
        """TermRangeQuery twin (query/boolquery.py term_range_search):
        vocabulary terms in the lexicographic [lo, hi] interval (None =
        open side), expansion ranked (df DESC, term ASC), scored as a
        disjunction."""
        lo = lo.lower() if lo else lo
        hi = hi.lower() if hi else hi

        def ok(t: str) -> bool:
            if lo is not None and not (t >= lo if inc_lo else t > lo):
                return False
            if hi is not None and not (t <= hi if inc_hi else t < hi):
                return False
            return True

        cand = sorted(
            (t for t in self.postings if ok(t)),
            key=lambda t: (-self.df[t], t),
        )[:max_expansions]
        scores: Dict[int, float] = {}
        for t in cand:
            for d in self.postings[t]:
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def spell_suggest(
        self,
        query: str,
        max_edits: int = 2,
        min_df_ratio: float = 0.0,
        n_suggestions: int = 3,
        prefix_len: int = 1,
        suggest_mode: str = "missing",
    ) -> Dict[str, List[Tuple[int, str, int]]]:
        """DirectSpellChecker twin: per low-df/OOV token, the top
        suggestions (dist ASC, df DESC, term ASC) sharing a prefix.
        suggest_mode: "missing" (df-bar gate), "popular" (every token;
        suggestion df must exceed the token's df), "always" (every
        token, no df bar; self excluded).
        -> {clause: [(rank, suggestion, df)]}."""
        bar = min_df_ratio * self.N
        out: Dict[str, List[Tuple[int, str, int]]] = {}
        for c in sorted(set(tokenize(normalize_question(query)))):
            cdf = self.df.get(c, 0)
            if suggest_mode == "missing" and cdf > bar:
                continue
            cand = []
            for t in self.postings:
                if prefix_len > 0 and t[:prefix_len] != c[:prefix_len]:
                    continue
                if suggest_mode != "missing" and t == c:
                    continue
                if suggest_mode == "popular" and self.df[t] <= cdf:
                    continue
                d = _levenshtein(c, t, max_edits)
                if d >= 0:
                    cand.append((d, -self.df[t], t))
            cand.sort()
            out[c] = [
                (i + 1, t, self.df[t])
                for i, (_d, _n, t) in enumerate(cand[:n_suggestions])
            ]
        return out

    def prefix_search(
        self, prefix: str, k: int = 10, max_expansions: int = 16
    ) -> List[Tuple[int, float]]:
        """PrefixQuery twin: expand to the max_expansions highest-df
        (ties: term asc) vocabulary terms, score as a disjunction."""
        p = prefix.lower()
        cand = sorted(
            (t for t in self.postings if t.startswith(p)),
            key=lambda t: (-self.df[t], t),
        )[:max_expansions]
        scores: Dict[int, float] = {}
        for t in cand:
            for d in self.postings[t]:
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def match_bool_prefix_search(
        self, query: str, k: int = 10, max_expansions: int = 16
    ) -> List[Tuple[int, float]]:
        """match_bool_prefix twin: distinct head tokens are optional
        term clauses, the last token a highest-df prefix expansion
        (prefix_search rewrite); score = BM25 sum over matched clauses
        (a head term re-selected by the expansion double-counts, as two
        ES clauses would)."""
        toks = tokenize(normalize_question(query))
        if not toks:
            return []
        head = sorted(set(toks[:-1]))
        exp = sorted(
            (t for t in self.postings if t.startswith(toks[-1])),
            key=lambda t: (-self.df[t], t),
        )[:max_expansions]
        scores: Dict[int, float] = {}
        for t in head:
            for d in self.postings.get(t, ()):
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        for t in exp:
            for d in self.postings[t]:
                scores[d] = scores.get(d, 0.0) + self.score_one(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


@dataclass
class FieldedBM25Oracle:
    """Pure-Python twin of index/fielded.py: per-field BM25 (own df/idf,
    doclen, avgdl per field) summed with field weights —
    score(q,d) = Σ_f w_f · BM25_f(q,d). Float fold order matches the
    engine's sort_array(term_id) fold: ascending (term, field_id), and
    the component is multiplied in the same order (w·idf·tf·(k1+1)/…),
    so scores are bit-identical (tests/test_fielded.py)."""

    fields: Tuple[str, ...] = ("text", "title")
    weights: Dict[str, float] = None
    k1: float = BM25_K1
    b: float = BM25_B
    analyzer: object = None  # same contract as BM25Oracle.analyzer

    def __post_init__(self):
        if self.weights is None:
            self.weights = {f: (2.0 if f == "title" else 1.0) for f in self.fields}
        self.doc_tokens: Dict[str, Dict[int, List[str]]] = {f: {} for f in self.fields}

    def add(self, doc_id: int, field_texts: Dict[str, str]) -> None:
        for f in self.fields:
            toks = tokenize(field_texts.get(f) or "")
            if self.analyzer is not None:
                toks = self.analyzer.analyze_tokens(toks)
            self.doc_tokens[f][doc_id] = toks

    def build(self) -> None:
        self.N = len(self.doc_tokens[self.fields[0]])
        self.doclen = {f: {d: len(t) for d, t in self.doc_tokens[f].items()} for f in self.fields}
        self.avgdl = {
            f: (sum(self.doclen[f].values()) / self.N if self.N else 0.0)
            for f in self.fields
        }
        self.postings: Dict[str, Dict[str, Dict[int, int]]] = {f: {} for f in self.fields}
        for f in self.fields:
            for d, toks in self.doc_tokens[f].items():
                for t in toks:
                    self.postings[f].setdefault(t, {})
                    self.postings[f][t][d] = self.postings[f][t].get(d, 0) + 1
        self.df = {f: {t: len(p) for t, p in self.postings[f].items()} for f in self.fields}

    def idf(self, field: str, term: str) -> float:
        df = self.df[field].get(term, 0)
        return math.log((self.N - df + 0.5) / (df + 0.5) + 1.0)

    def score_one(self, field: str, term: str, doc_id: int) -> float:
        tf = self.postings[field].get(term, {}).get(doc_id, 0)
        if tf == 0:
            return 0.0
        dl = self.doclen[field][doc_id]
        return (
            self.weights[field]
            * self.idf(field, term)
            * tf
            * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl[field]))
        )

    def search(self, question: str, k: int = 10) -> List[Tuple[int, float]]:
        """Top-k (doc_id, score); a doc qualifies when ANY field contains
        ≥1 query term. Fold order: term ASC, then field_id ASC — the
        engine's ascending-term_id order."""
        from dpr_spark.functions.analysis import analyze_query

        terms = analyze_query(question, self.analyzer)
        scores: Dict[int, float] = {}
        for t in terms:
            for f in self.fields:  # field_id order == tuple position
                for d in self.postings[f].get(t, ()):
                    scores[d] = scores.get(d, 0.0) + self.score_one(f, t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def _component(self, field: str, term: str, doc_id: int) -> float:
        """idf·tfnorm WITHOUT the field weight (the engine multiplies
        w_f after the per-field fold in best_fields)."""
        tf = self.postings[field].get(term, {}).get(doc_id, 0)
        if tf == 0:
            return 0.0
        dl = self.doclen[field][doc_id]
        return self.idf(field, term) * (
            tf * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl[field]))
        )

    def best_fields_search(
        self, question: str, k: int = 10, tie_breaker: float = 0.0
    ) -> List[Tuple[int, float]]:
        """multi_match best_fields twin (query/multimatch.py): per-field
        BM25 sums folded ascending term, score = max_f s_f +
        tie_breaker·(Σ_f s_f − max). Engine fold order mirrored:
        components ascending term within a field, fields ascending."""
        from dpr_spark.functions.analysis import analyze_query

        terms = sorted(analyze_query(question, self.analyzer))
        per_field: Dict[int, List[float]] = {}
        for fi, f in enumerate(self.fields):
            docs = set()
            for t in set(terms):
                docs.update(self.postings[f].get(t, ()))
            for d in docs:
                s = 0.0
                for t in terms:  # ascending, dups double-count like qt
                    s = s + self._component(f, t, d)
                s = self.weights[f] * s
                per_field.setdefault(d, [0.0] * len(self.fields))[fi] = s
        scores = {}
        for d, svals in per_field.items():
            sm = 0.0
            for s in svals:  # ascending field_id
                sm = sm + s
            mx = max(svals)
            scores[d] = mx + tie_breaker * (sm - mx)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def cross_fields_search(
        self, question: str, k: int = 10
    ) -> List[Tuple[int, float]]:
        """multi_match cross_fields twin: per term, idf blended from the
        MAX df across fields; per (term, doc) the best per-field
        contribution (exact max); contributions sum ascending term.
        Terms dedupe (the engine's distinct (qid, term) resolution)."""
        from dpr_spark.functions.analysis import analyze_query

        terms = sorted(set(analyze_query(question, self.analyzer)))
        scores: Dict[int, float] = {}
        for t in terms:
            df_b = max(self.df[f].get(t, 0) for f in self.fields)
            if df_b == 0:
                continue
            idf_b = math.log((self.N - df_b + 0.5) / (df_b + 0.5) + 1.0)
            per_doc: Dict[int, float] = {}
            for f in self.fields:
                w_idf = self.weights[f] * idf_b
                for d, tf in self.postings[f].get(t, {}).items():
                    dl = self.doclen[f][d]
                    cand = w_idf * (
                        tf * (self.k1 + 1.0)
                        / (
                            tf
                            + self.k1
                            * (1.0 - self.b + self.b * dl / self.avgdl[f])
                        )
                    )
                    if d not in per_doc or cand > per_doc[d]:
                        per_doc[d] = cand
            for d, c in per_doc.items():
                scores[d] = scores.get(d, 0.0) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def best_fragment(tokens, terms, window: int = 30):
    """Highlighter twin (query/highlight.py contract): the window-token
    window with the most query-term hits among windows starting at a hit
    (ties leftmost); -> (start_tok, n_hits, fragment) or None."""
    tset = set(terms)
    hits = [i for i, t in enumerate(tokens) if t in tset]
    if not hits:
        return None
    neg, s = min(
        (-sum(1 for p in hits if st <= p < st + window), st) for st in hits
    )
    return s, -neg, " ".join(tokens[s : s + window])


def best_fragments(tokens, terms, window: int = 30, n_fragments: int = 3):
    """Multi-fragment twin (query/highlight.py highlight_multi):
    candidates ranked (hits DESC, start ASC), greedily accepted while
    disjoint from every accepted window, up to n_fragments; -> list of
    (frag_rank, start_tok, n_hits, fragment) in selection order."""
    tset = set(terms)
    hits = [i for i, t in enumerate(tokens) if t in tset]
    ranked = sorted(
        (-sum(1 for p in hits if st <= p < st + window), st) for st in hits
    )
    sel: list = []
    for neg, st in ranked:
        if len(sel) >= n_fragments:
            break
        if all(abs(st - s0) >= window for _r, s0, _n, _f in sel):
            sel.append(
                (len(sel) + 1, st, -neg, " ".join(tokens[st : st + window]))
            )
    return sel


def _levenshtein(a: str, b: str, threshold: int) -> int:
    """Plain DP edit distance; returns -1 when > threshold (the Spark
    `levenshtein(l, r, threshold)` contract the engine filters on)."""
    if abs(len(a) - len(b)) > threshold:
        return -1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1] if prev[-1] <= threshold else -1


def has_answer(answers: Sequence[str], text: str) -> bool:
    """V1 string match: `qa_validation.py:175-193`."""
    text_toks = tokenize(nfd(text))
    for ans in answers:
        a = tokenize(nfd(ans))
        if not a:
            continue
        for i in range(0, len(text_toks) - len(a) + 1):
            if a == text_toks[i : i + len(a)]:
                return True
    return False


def top_k_hits(per_question_hits: Iterable[List[bool]], n_docs: int) -> List[int]:
    """A1 cumulative histogram: `qa_validation.py:72-78`."""
    out = [0] * n_docs
    for hits in per_question_hits:
        best = next((i for i, h in enumerate(hits) if h), None)
        if best is not None:
            out[best:] = [v + 1 for v in out[best:]]
    return out


def phrase_suggest_twin(
    doc_tokens,
    df,
    question: str,
    max_edits: int = 1,
    per_term: int = 3,
    topn: int = 3,
    alpha: float = 0.4,
    prefix_len: int = 1,
):
    """Pure-Python twin of query/phrasesuggest.py::suggest_phrases:
    stupid-backoff bigram LM over `doc_tokens` (dict doc_id -> raw
    token list), candidates from the `df` dictionary (term -> doc
    frequency), one substitution per suggestion, ordered log fold.
    -> [(rank, suggestion, score)]."""
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    uni: Dict[str, int] = {}
    bi: Dict[Tuple[str, str], int] = {}
    for toks in doc_tokens.values():
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    T, V = sum(uni.values()), len(uni)
    t_v = float(T + V)

    def uni_prob(w):
        return (uni.get(w, 0) + 1.0) / t_v

    toks = tokenize(normalize_question(question))
    if not toks:
        return []
    # candidates per position: (dist ASC, df DESC, term ASC) capped
    cands = []  # (pos 1-based, cand)
    for i, tok in enumerate(toks):
        pool = []
        for term, d in df.items():
            if prefix_len > 0 and term[:prefix_len] != tok[:prefix_len]:
                continue
            dist = _levenshtein(term, tok, max_edits)
            if 1 <= dist <= max_edits:
                pool.append((dist, -d, term))
        pool.sort()
        for _, _, term in pool[:per_term]:
            cands.append((i + 1, term))
    cands.append((1, toks[0]))  # the original phrase competes

    def score_phrase(ws):
        lp = 0.0
        lp = lp + math.log(uni_prob(ws[0]))  # j=0 head
        for a, b in zip(ws, ws[1:]):  # j ascending
            cb = bi.get((a, b), 0)
            if cb > 0:
                lp = lp + math.log(cb / uni[a])
            else:
                lp = lp + math.log(alpha * uni_prob(b))
        return lp

    best: Dict[str, float] = {}
    for pos, cand in cands:
        ws = list(toks)
        ws[pos - 1] = cand
        s = " ".join(ws)
        sc = score_phrase(ws)
        if s not in best or sc > best[s]:
            best[s] = sc
    ranked = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:topn]
    return [(i + 1, s, sc) for i, (s, sc) in enumerate(ranked)]


def query_string_twin(oracle, s: str, k: int = 10, max_expansions: int = 8,
                      default_operator: str = "or"):
    """Pure-Python twin of query/querystring.py::query_string_search
    over a BM25Oracle: same parse (shared parser — deterministic pure
    Python), same expansion ranking, phrase pf-scoring, must/must_not
    constraints. -> [(doc_id, score)] top-k."""
    import re as _re

    from dpr_spark.query.boolquery import wildcard_regex
    from dpr_spark.query.querystring import parse_query_string

    clauses = parse_query_string(s, default_operator)
    contribs: Dict[int, Dict[int, float]] = {}  # doc -> cid -> contrib
    matched_cids: Dict[int, set] = {}  # doc -> set(cid)
    veto: set = set()
    n_must = sum(1 for c in clauses if c.occur == "must")
    for c in clauses:
        matched: Dict[int, float] = {}
        if c.kind == "term":
            for d in oracle.postings.get(c.text, ()):
                matched[d] = oracle.score_one(c.text, d)
        elif c.kind == "fuzzy":
            pool = []
            for term, dfv in oracle.df.items():
                if term[:1] != c.text[:1]:
                    continue
                dist = _levenshtein(term, c.text, c.edits)
                if 0 <= dist <= c.edits:
                    pool.append((dist, -dfv, term))
            pool.sort()
            for dist, _, term in pool[:max_expansions]:
                boost = 1.0 - dist / max(len(c.text), len(term))
                for d in oracle.postings[term]:
                    matched[d] = matched.get(d, 0.0) + boost * oracle.score_one(
                        term, d
                    )
        elif c.kind == "wildcard":
            rx = _re.compile(wildcard_regex(c.text))
            cand = sorted(
                (t for t in oracle.postings if rx.match(t)),
                key=lambda t: (-oracle.df[t], t),
            )[:max_expansions]
            for term in cand:
                for d in oracle.postings[term]:
                    matched[d] = matched.get(d, 0.0) + oracle.score_one(term, d)
        else:  # phrase
            toks = c.text.split(" ")
            if all(t in oracle.postings for t in toks):
                idf_sum = sum(oracle.idf(t) for t in toks)
                for d in oracle.postings[toks[0]]:
                    dt = oracle.doc_tokens[d]
                    pf = sum(
                        1
                        for i in range(len(dt) - len(toks) + 1)
                        if dt[i : i + len(toks)] == toks
                    )
                    if pf:
                        matched[d] = oracle._score_pf(pf, d, idf_sum)
        if c.occur == "must_not":
            veto.update(matched)
            continue
        for d, v in matched.items():
            contribs.setdefault(d, {})[c.cid] = v
            if c.occur == "must":
                matched_cids.setdefault(d, set()).add(c.cid)
    scores = {}
    for d, by_cid in contribs.items():
        if d in veto:
            continue
        if len(matched_cids.get(d, ())) != n_must:
            continue
        scores[d] = sum(by_cid.values())
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
