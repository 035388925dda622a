"""Nested boolean query trees — the FULL Lucene ``BooleanQuery``
composition (clauses are themselves queries, arbitrarily deep), which
query/boolquery.py's flat must/should/must_not surface cannot express:

    Bool(must=[Bool(should=[T("spark"), T("window")], msm=1)],
         must_not=[T("batch")],
         should=[Bool(must=[T("customer"), T("join")], boost=2.0)])

Matching (Lucene contract):
- a Bool matches iff every must child matches, at least
  max(msm, 1 if it has no must/filter children else msm) of its should
  children match, and NO must_not child matches;
- score = boost · Σ (matching must + should children scores), folded in
  child order (deterministic bits); must_not never contributes.
- a Term leaf matches docs containing the term; score = its BM25
  component. Leaf text passes the index's analysis chain and must
  yield exactly ONE token (Lucene's QueryParser produces the same
  one-term TermQuery).

Spark plan — LEVEL-SYNCHRONOUS bottom-up fold, one stage per tree
depth (depth is query-sized, typically ≤ 4):

1. trees flatten driver-side to (qid, node, parent, clause, meta) rows
   (queries are tiny);
2. ALL leaves across ALL queries resolve in ONE dictionary probe
   (leaf terms broadcast into the vocab-sized dictionary scan, postings
   probed in place — the same J6 shape as every searcher);
3. per depth d = max..1: candidate rows of depth-d children group by
   (qid, parent, doc_id) with conditional counts (must/should hits,
   must_not vetoes ride the SAME aggregation as a negative count) and
   an ordered struct fold for the score — each level is one shuffle of
   candidate rows only, nothing doc-sized.

The pure-Python twin (eval_tree_py) evaluates recursively; rank+score
identity asserted in tests/test_booltree.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.boolquery import _component


@dataclass(frozen=True)
class T:
    """Term leaf."""

    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class Bool:
    must: Tuple = ()
    should: Tuple = ()
    must_not: Tuple = ()
    msm: int = 0
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "must", tuple(self.must))
        object.__setattr__(self, "should", tuple(self.should))
        object.__setattr__(self, "must_not", tuple(self.must_not))


def _flatten(qid: int, node, parent: int, clause: str, rows: list, analyzer) -> int:
    """DFS-number the tree; rows: (qid, node_id, parent_id, clause,
    depth-filled-later, is_leaf, term, msm, boost, n_must, n_sh)."""
    from dpr_spark.functions.analysis import analyze_query

    nid = len(rows)
    if isinstance(node, T):
        toks = analyze_query(node.text, analyzer)
        if len(toks) != 1:
            raise ValueError(
                f"term leaf {node.text!r} analyzes to {toks!r} (need exactly 1)"
            )
        rows.append([qid, nid, parent, clause, True, toks[0], 0, node.boost, 0, 0])
        return nid
    if not isinstance(node, Bool):
        raise TypeError(f"unknown node {node!r}")
    if not node.must and not node.should:
        raise ValueError("Bool needs at least one must/should child")
    if node.msm > len(node.should):
        raise ValueError(f"msm {node.msm} > {len(node.should)} should children")
    rows.append(
        [qid, nid, parent, clause, False, None, node.msm, node.boost,
         len(node.must), len(node.should)]
    )
    for c in node.must:
        _flatten(qid, c, nid, "must", rows, analyzer)
    for c in node.should:
        _flatten(qid, c, nid, "should", rows, analyzer)
    for c in node.must_not:
        _flatten(qid, c, nid, "must_not", rows, analyzer)
    return nid


def _depths(rows) -> Dict[Tuple[int, int], int]:
    d = {}
    for qid, nid, parent, *_ in ((r[0], r[1], r[2]) for r in rows):
        d[(qid, nid)] = 0 if parent < 0 else d[(qid, parent)] + 1
    return d


def bool_tree_search(
    spark: SparkSession,
    queries: Sequence[Tuple[int, Bool]],
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """[(qid, root Bool)] -> results(qid, rank, doc_id, score)."""
    rows: list = []
    for qid, root in queries:
        if not isinstance(root, Bool):
            raise TypeError("root must be a Bool")
        _flatten(qid, root, -1, "root", rows, index.analyzer)
    depth = _depths(rows)
    max_d = max(depth.values())

    # node metadata, broadcast-joined at each fold level
    meta = spark.createDataFrame(
        [
            (r[0], r[1], r[6], r[7], r[8], r[9])
            for r in rows
            if not r[4]
        ],
        "qid long, node long, msm int, boost double, n_must int, n_should int",
    )

    # ONE leaf resolution across all queries/levels: (qid, node, clause,
    # term) broadcast into the dictionary scan, postings probed in place
    leaves = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[7], r[5]) for r in rows if r[4]],
        "qid long, node long, parent long, clause string, boost double, term string",
    )
    qt = index.dictionary.select("term", "term_id", "idf").join(
        F.broadcast(leaves), "term"
    )
    leaf_scores = (
        index.postings.join(
            F.broadcast(
                qt.select("qid", "node", "parent", "clause", "boost", "term_id", "idf")
            ),
            "term_id",
        )
        .select(
            "qid",
            "node",
            "parent",
            "clause",
            "doc_id",
            (F.col("boost") * _component(index.stats.avgdl, k1, b)).alias("score"),
        )
    )

    # level-synchronous fold: children at depth d collapse into their
    # parents (depth d-1); levels[(d)] collects child rows of that depth
    node_depth = {(r[0], r[1]): depth[(r[0], r[1])] for r in rows}
    parent_of = {(r[0], r[1]): r[2] for r in rows}
    clause_of = {(r[0], r[1]): r[3] for r in rows}

    current = leaf_scores  # rows: (qid, node, parent, clause, doc_id, score)
    for d in range(max_d, 0, -1):
        lvl_nodes = [
            (q, n) for (q, n), dd in node_depth.items() if dd == d
        ]
        ldf = spark.createDataFrame(
            [(q, n) for q, n in lvl_nodes], "qid long, node long"
        )
        this = current.join(F.broadcast(ldf), ["qid", "node"], "left_semi")
        rest = current.join(F.broadcast(ldf), ["qid", "node"], "left_anti")
        agg = (
            this.groupBy("qid", "parent", "doc_id")
            .agg(
                F.sum(F.when(F.col("clause") == "must", 1).otherwise(0)).alias("mh"),
                F.sum(F.when(F.col("clause") == "should", 1).otherwise(0)).alias("sh"),
                F.sum(F.when(F.col("clause") == "must_not", 1).otherwise(0)).alias("nh"),
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("clause") != "must_not",
                            F.struct(F.col("node"), F.col("score")),
                        )
                    )
                ).alias("parts"),
            )
            .withColumnRenamed("parent", "node")
        )
        agg = agg.join(F.broadcast(meta), ["qid", "node"])
        matched = agg.filter(
            (F.col("mh") == F.col("n_must"))
            & (F.col("nh") == 0)
            & (
                F.col("sh")
                >= F.when(
                    (F.col("n_must") == 0) & (F.col("msm") == 0), F.lit(1)
                ).otherwise(F.col("msm"))
            )
        )
        folded = matched.select(
            "qid",
            "node",
            "doc_id",
            (
                F.col("boost")
                * F.aggregate("parts", F.lit(0.0), lambda a, x: a + x["score"])
            ).alias("score"),
        )
        # re-attach parent/clause of the FOLDED nodes (the depth-(d-1)
        # parents the children just collapsed into) for the next level
        parents = sorted({(q, parent_of[(q, n)]) for q, n in lvl_nodes})
        pmap = spark.createDataFrame(
            [(q, p, parent_of[(q, p)], clause_of[(q, p)]) for q, p in parents],
            "qid long, node long, parent long, clause string",
        )
        folded = folded.join(F.broadcast(pmap), ["qid", "node"])
        current = rest.unionByName(
            folded.select("qid", "node", "parent", "clause", "doc_id", "score")
        )

    roots = current.filter(F.col("clause") == "root").select("qid", "doc_id", "score")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        roots.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


# ---------------------------------------------------------------------------
# pure-Python twin
# ---------------------------------------------------------------------------


def eval_tree_py(oracle, node, analyzer=None) -> Dict[int, float]:
    """{doc_id: score} of docs matching `node` (recursive twin).
    Children fold in DFS order — the engine's ascending-node_id struct
    fold — so float addition rounds identically."""
    from dpr_spark.functions.analysis import analyze_query

    if isinstance(node, T):
        toks = analyze_query(node.text, analyzer)
        if len(toks) != 1:
            raise ValueError(node.text)
        t = toks[0]
        return {
            d: node.boost * oracle.score_one(t, d)
            for d in oracle.postings.get(t, ())
        }
    out: Dict[int, float] = {}
    must = [eval_tree_py(oracle, c, analyzer) for c in node.must]
    should = [eval_tree_py(oracle, c, analyzer) for c in node.should]
    must_not = [eval_tree_py(oracle, c, analyzer) for c in node.must_not]
    cands = set()
    for m in must + should:
        cands.update(m)
    need_sh = node.msm if (node.must or node.msm) else 1
    for d in cands:
        if any(d not in m for m in must):
            continue
        sh = sum(1 for s in should if d in s)
        if sh < need_sh:
            continue
        if any(d in n for n in must_not):
            continue
        s = 0.0
        for child in must + should:  # DFS child order
            if d in child:
                s += child[d]
        out[d] = node.boost * s
    return out


def search_tree_py(oracle, root, analyzer=None, k: int = 10):
    scores = eval_tree_py(oracle, root, analyzer)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
