"""ES `intervals` query — a nestable minimal-interval algebra over
positional postings (Lucene's IntervalsSource family, the modern
generalization of the span queries in query/phrase.py).

Rules (the ES query DSL surface we implement):

- ``Match(text, ordered=False, max_gaps=None)``: the text is analyzed
  into terms; the rule produces the minimal intervals covering one
  occurrence of every term, optionally in order, optionally with a
  bound on internal gaps.
- ``AllOf(children, ordered=False, max_gaps=None)``: like Match but
  over arbitrary sub-rules.
- ``AnyOf(children)``: the union of the children's intervals,
  re-minimized across sources.

Semantics (the Clarke–Cormack–Burkowski minimal-interval algebra, the
published model behind Lucene's implementation):

- every rule produces only MINIMAL intervals — an interval that
  contains another interval produced by the same rule is absorbed;
- ``max_gaps`` filters a rule's minimal intervals AFTER minimization
  (the Lucene ``Intervals.maxgaps`` contract: it wraps a source and
  filters the source's produced stream), with
  gaps = (end - start + 1) - Σ(positions covered by the constituents);
  for overlapping constituents of an unordered AllOf the covered sum
  double-counts, i.e. gaps is computed as if constituents were
  disjoint — stated so the twin and the engine agree exactly;
- ``ordered`` chains constituents strictly left to right (each child's
  interval starts after the previous child's interval ends), taking
  per start the GREEDY earliest-continuation chain; after absorption
  this equals the minimal set over all ordered combinations
  (asserted against a brute-force enumerator in
  tests/test_intervals.py).

Scoring: documents rank by the ROOT rule's minimal-interval count
(n_intervals desc, doc_id asc). An exact integer — unlike Lucene's
width-weighted interval frequency — chosen so the oracle comparison is
bit-exact; callers wanting BM25-weighted intervals can feed
n_intervals into the shared scorer as a tf.

Scale shape: leaf terms resolve once against the dictionary (the tiny
clause side broadcasts INTO the dictionary scan); resolved term_ids
push into the positions scan as an IN filter (row-group skipping on
the at-rest layout, the .pos-seek analog); candidate (qid, doc) groups
are pruned by a per-query CNF-style bitmask over present leaves BEFORE
the per-doc kernel runs, so the Arrow-batched evaluator only ever sees
docs that could match. The kernel itself is per-(qid, doc) linear in
the doc's matched positions (plane-sweep + greedy chain), never
quadratic in doclen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MAX_LEAVES = 63  # leaf-presence bitmask fits a signed long


@dataclass(frozen=True)
class Match:
    text: str
    ordered: bool = False
    max_gaps: Optional[int] = None


@dataclass(frozen=True)
class AllOf:
    children: tuple
    ordered: bool = False
    max_gaps: Optional[int] = None

    def __init__(self, children, ordered=False, max_gaps=None):
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "ordered", bool(ordered))
        object.__setattr__(self, "max_gaps", max_gaps)


@dataclass(frozen=True)
class AnyOf:
    children: tuple

    def __init__(self, children):
        object.__setattr__(self, "children", tuple(children))


_FILTER_KINDS = (
    "containing",
    "contained_by",
    "not_containing",
    "not_contained_by",
    "overlapping",
    "not_overlapping",
    "before",
    "after",
)


@dataclass(frozen=True)
class Filtered:
    """ES intervals `filter`: keep the source rule's minimal intervals
    standing in `kind` relation to the filter rule's intervals —
    containing / contained_by (and their not_ negations), overlapping /
    not_overlapping, before / after (source interval entirely before /
    after SOME filter interval). Filtering a minimal stream preserves
    minimality, so no re-minimization happens (the Lucene
    IntervalsSource filtering contract)."""

    source: object
    filter: object
    kind: str = "containing"

    def __post_init__(self):
        if self.kind not in _FILTER_KINDS:
            raise ValueError(
                f"kind must be one of {_FILTER_KINDS}, got {self.kind!r}"
            )


# ---------------------------------------------------------------- algebra


def _absorb(cands: List[Tuple[int, int, int]]) -> List[Tuple[int, int, int]]:
    """Keep minimal (start, end) intervals; duplicates keep min gaps.
    Scan by start desc / end asc tracking the min end seen — an
    interval whose end >= that min contains (or equals) a later-or-
    equal-starting one and is absorbed."""
    best: Dict[Tuple[int, int], int] = {}
    for s, e, g in cands:
        k = (s, e)
        if k not in best or g < best[k]:
            best[k] = g
    out: List[Tuple[int, int, int]] = []
    min_end: Optional[int] = None
    for (s, e), g in sorted(best.items(), key=lambda kv: (-kv[0][0], kv[0][1])):
        if min_end is None or e < min_end:
            out.append((s, e, g))
            min_end = e
    out.sort()
    return out


def eval_tree(node, pos: Dict[int, Sequence[int]]) -> List[Tuple[int, int, int]]:
    """Evaluate a compiled tree (see _compile) against {leaf_id:
    ascending positions}; returns minimal (start, end, gaps) sorted by
    start. The engine kernel AND nothing else — the pytest twin is an
    independent brute-force enumerator."""
    kind = node[0]
    if kind == "leaf":
        return [(int(p), int(p), 0) for p in pos.get(node[1], ())]
    if kind == "any":
        cands: List[Tuple[int, int, int]] = []
        for c in node[1]:
            cands.extend(eval_tree(c, pos))
        return _absorb(cands)
    if kind == "filter":
        src = eval_tree(node[1], pos)
        flt = eval_tree(node[2], pos)
        rel = node[3]

        def hit(i):
            s, e, _ = i
            if rel in ("containing", "not_containing"):
                m = any(s <= fs and fe <= e for fs, fe, _ in flt)
            elif rel in ("contained_by", "not_contained_by"):
                m = any(fs <= s and e <= fe for fs, fe, _ in flt)
            elif rel in ("overlapping", "not_overlapping"):
                m = any(fs <= e and s <= fe for fs, fe, _ in flt)
            elif rel == "before":
                return any(e < fs for fs, _fe, _ in flt)
            else:  # after
                return any(fe < s for _fs, fe, _ in flt)
            return m if not rel.startswith("not_") else not m

        return [i for i in src if hit(i)]
    # kind == "all"
    children = [eval_tree(c, pos) for c in node[1]]
    ordered, max_gaps = node[2], node[3]
    if any(not c for c in children):
        return []
    cands = []
    if ordered:
        for s0, e0, g0 in children[0]:
            cov = (e0 - s0 + 1) - g0
            prev_e, ok = e0, True
            for ch in children[1:]:
                nxt = next((c for c in ch if c[0] > prev_e), None)
                if nxt is None:
                    ok = False
                    break
                cov += (nxt[1] - nxt[0] + 1) - nxt[2]
                prev_e = nxt[1]
            if ok:
                cands.append((s0, prev_e, (prev_e - s0 + 1) - cov))
    else:
        n = len(children)
        ptrs = [0] * n
        while all(ptrs[i] < len(children[i]) for i in range(n)):
            cur = [children[i][ptrs[i]] for i in range(n)]
            s = min(c[0] for c in cur)
            e = max(c[1] for c in cur)
            cov = sum((c[1] - c[0] + 1) - c[2] for c in cur)
            cands.append((s, e, max(0, (e - s + 1) - cov)))
            i = min(range(n), key=lambda j: (cur[j][0], cur[j][1]))
            ptrs[i] += 1
    iv = _absorb(cands)
    if max_gaps is not None and max_gaps >= 0:
        iv = [c for c in iv if c[2] <= max_gaps]
    return iv


# ------------------------------------------------------------- compilation


def _compile(node, leaf_of: Dict[str, int], analyzer) -> tuple:
    """User rule tree -> compiled tuples with integer leaf ids
    (('leaf', i) | ('all', children, ordered, max_gaps) |
    ('any', children)); registers terms in leaf_of."""
    from dpr_spark.query.phrase import _phrase_offsets

    if isinstance(node, Match):
        rows, _ = _phrase_offsets([(0, node.text)], analyzer=analyzer)
        terms = [t for _, _, t in rows]
        if not terms:
            raise ValueError(f"Match text analyzed to no terms: {node.text!r}")
        leaves = []
        for t in terms:
            if t not in leaf_of:
                leaf_of[t] = len(leaf_of)
            leaves.append(("leaf", leaf_of[t]))
        if len(leaves) == 1:
            # single term: max_gaps/ordered are vacuous
            return leaves[0]
        return ("all", tuple(leaves), node.ordered, node.max_gaps)
    if isinstance(node, AllOf):
        kids = tuple(_compile(c, leaf_of, analyzer) for c in node.children)
        return ("all", kids, node.ordered, node.max_gaps)
    if isinstance(node, AnyOf):
        kids = tuple(_compile(c, leaf_of, analyzer) for c in node.children)
        return ("any", kids)
    if isinstance(node, Filtered):
        return (
            "filter",
            _compile(node.source, leaf_of, analyzer),
            _compile(node.filter, leaf_of, analyzer),
            node.kind,
        )
    raise TypeError(f"unknown intervals rule: {type(node).__name__}")


def _conjunct_masks(node) -> List[int]:
    """CNF-style presence prune: a doc can match only if, for every
    returned mask, it contains >= 1 of the mask's leaves. all_of
    concatenates children's conjuncts; any_of collapses to ONE
    disjunctive mask (sound, possibly loose — the kernel reverifies)."""
    kind = node[0]
    if kind == "leaf":
        return [1 << node[1]]
    if kind == "all":
        out: List[int] = []
        for c in node[1]:
            out.extend(_conjunct_masks(c))
        return out
    if kind == "filter":
        out = _conjunct_masks(node[1])
        if not node[3].startswith("not_"):
            # positive relations need the filter rule to match too
            out = out + _conjunct_masks(node[2])
        return out
    m = 0
    for c in node[1]:
        for x in _conjunct_masks(c):
            m |= x
    return [m]


# ------------------------------------------------------------------ search


def intervals_search_index(
    spark: SparkSession,
    index,
    positions: DataFrame,
    queries: Sequence[Tuple[int, object]],
    k: int = 10,
) -> DataFrame:
    """(qid, rank, doc_id, n_intervals): top-k docs per interval rule.
    `positions` is the positional postings table (term_id, doc_id,
    doclen, positions) from build_positions; `queries` = [(qid, rule)]
    with rule a Match/AllOf/AnyOf tree. Docs with zero root intervals
    never surface. See the module docstring for the exact contract."""
    from dpr_spark.query.phrase import MAX_SCAN_PRUNE_IDS

    analyzer = getattr(index, "analyzer", None)
    trees: Dict[int, tuple] = {}
    leaf_rows: List[Tuple[int, int, str]] = []  # (qid, leaf, term)
    masks_rows: List[Tuple[int, List[int]]] = []
    for qid, rule in queries:
        leaf_of: Dict[str, int] = {}
        t = _compile(rule, leaf_of, analyzer)
        if len(leaf_of) > MAX_LEAVES:
            raise ValueError(f"qid {qid}: >{MAX_LEAVES} distinct leaf terms")
        trees[int(qid)] = t
        for term, leaf in leaf_of.items():
            leaf_rows.append((int(qid), leaf, term))
        masks_rows.append((int(qid), [int(m) for m in _conjunct_masks(t)]))
    if not leaf_rows:
        raise ValueError("no queries")

    qdf = spark.createDataFrame(leaf_rows, "qid long, leaf int, term string")
    # tiny clause side broadcasts INTO the dictionary scan
    resolved = index.dictionary.select("term", "term_id").join(
        F.broadcast(qdf), "term"
    )
    rows = resolved.select("qid", "leaf", "term_id").collect()
    ids = sorted({r["term_id"] for r in rows})
    if not ids:
        return spark.createDataFrame(
            [], "qid long, rank int, doc_id long, n_intervals long"
        )
    if len(ids) <= MAX_SCAN_PRUNE_IDS:
        positions = positions.filter(F.col("term_id").isin(ids))
    qsel = F.broadcast(
        spark.createDataFrame(
            [(r["qid"], r["leaf"], r["term_id"]) for r in rows],
            "qid long, leaf int, term_id long",
        )
    )
    cand = positions.join(qsel, "term_id").select(
        "qid", "doc_id", F.struct("leaf", "positions").alias("st"),
        F.expr("shiftleft(1L, leaf)").alias("bit"),
    )
    grouped = cand.groupBy("qid", "doc_id").agg(
        F.collect_list("st").alias("sts"),
        F.bit_or("bit").alias("leafmask"),
    )
    mdf = F.broadcast(
        spark.createDataFrame(masks_rows, "qid long, masks array<long>")
    )
    pruned = (
        grouped.join(mdf, "qid")
        .filter(
            F.forall("masks", lambda m: F.col("leafmask").bitwiseAND(m) != 0)
        )
        .select("qid", "doc_id", "sts")
    )

    out_schema = "qid long, doc_id long, n_intervals long"

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            qids = pdf["qid"].to_numpy(np.int64)
            dids = pdf["doc_id"].to_numpy(np.int64)
            ns = np.zeros(len(pdf), dtype=np.int64)
            for i, sts in enumerate(pdf["sts"]):
                pos = {int(st["leaf"]): st["positions"] for st in sts}
                ns[i] = len(eval_tree(trees[int(qids[i])], pos))
            keep = ns > 0
            yield pd.DataFrame(
                {"qid": qids[keep], "doc_id": dids[keep], "n_intervals": ns[keep]}
            )

    scored = pruned.mapInPandas(kernel, out_schema)
    w = Window.partitionBy("qid").orderBy(
        F.desc("n_intervals"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "n_intervals")
    )
