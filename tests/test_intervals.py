"""ES intervals query (query/intervals.py): the engine's plane-sweep /
greedy-chain minimal-interval evaluator vs an independent BRUTE-FORCE
enumerator (all combinations, then absorption, then max_gaps — the
documented contract), plus the end-to-end Spark searcher on the fixture
corpus vs a python full-scan twin."""

import itertools
import random

import pytest

from dpr_spark.query.intervals import AllOf, AnyOf, Filtered, Match, eval_tree


# ---------------------------------------------------------- brute twin


def _brute_absorb(cands):
    best = {}
    for s, e, g in cands:
        if (s, e) not in best or g < best[(s, e)]:
            best[(s, e)] = g
    keep = []
    for (s, e), g in best.items():
        if not any(
            (s2 >= s and e2 <= e and (s2, e2) != (s, e)) for (s2, e2) in best
        ):
            keep.append((s, e, g))
    return sorted(keep)


def _brute(node, pos):
    kind = node[0]
    if kind == "leaf":
        return [(p, p, 0) for p in pos.get(node[1], ())]
    if kind == "any":
        cands = []
        for c in node[1]:
            cands.extend(_brute(c, pos))
        return _brute_absorb(cands)
    if kind == "filter":
        src, flt, rel = _brute(node[1], pos), _brute(node[2], pos), node[3]
        out = []
        for s, e, g in src:
            if rel == "before":
                keep = any(e < fs for fs, _fe, _ in flt)
            elif rel == "after":
                keep = any(fe < s for _fs, fe, _ in flt)
            else:
                if rel.endswith("containing") and not rel.endswith("_by"):
                    m = any(s <= fs and fe <= e for fs, fe, _ in flt)
                elif rel.endswith("contained_by"):
                    m = any(fs <= s and e <= fe for fs, fe, _ in flt)
                else:  # overlapping
                    m = any(fs <= e and s <= fe for fs, fe, _ in flt)
                keep = (not m) if rel.startswith("not_") else m
            if keep:
                out.append((s, e, g))
        return out
    children = [_brute(c, pos) for c in node[1]]
    ordered, max_gaps = node[2], node[3]
    if any(not c for c in children):
        return []
    cands = []
    for combo in itertools.product(*children):
        if ordered:
            ok = all(
                combo[i][0] > combo[i - 1][1] for i in range(1, len(combo))
            )
            if not ok:
                continue
        s = min(c[0] for c in combo)
        e = max(c[1] for c in combo)
        cov = sum((c[1] - c[0] + 1) - c[2] for c in combo)
        cands.append((s, e, max(0, (e - s + 1) - cov)))
    iv = _brute_absorb(cands)
    if max_gaps is not None and max_gaps >= 0:
        iv = [c for c in iv if c[2] <= max_gaps]
    return iv


# ------------------------------------------------------------ hand cases


def test_two_term_ordered_minimal():
    pos = {0: [1, 5], 1: [3, 6, 20]}
    t = ("all", (("leaf", 0), ("leaf", 1)), True, None)
    # minimal ordered (a then b): (1,3) absorbs (1,6); (5,6) absorbs (5,20)
    assert eval_tree(t, pos) == [(1, 3, 1), (5, 6, 0)]


def test_two_term_unordered_adjacent_pairs():
    pos = {0: [1, 5], 1: [3]}
    t = ("all", (("leaf", 0), ("leaf", 1)), False, None)
    assert eval_tree(t, pos) == [(1, 3, 1), (3, 5, 1)]


def test_max_gaps_filters_after_minimality():
    # absorber has larger gaps than the interval it absorbed: Lucene's
    # maxgaps-wraps-the-source contract keeps NEITHER
    pos = {0: [0], 1: [4]}
    t = ("all", (("leaf", 0), ("leaf", 1)), True, 2)
    assert eval_tree(t, pos) == []
    t2 = ("all", (("leaf", 0), ("leaf", 1)), True, 3)
    assert eval_tree(t2, pos) == [(0, 4, 3)]


def test_any_of_cross_source_absorption():
    pos = {0: [0], 1: [9], 2: [3, 4]}
    wide = ("all", (("leaf", 0), ("leaf", 1)), False, None)  # (0,9)
    narrow = ("all", (("leaf", 2),), False, None)
    t = ("any", (wide, narrow))
    # (3,3) and (4,4) absorb (0,9)
    assert eval_tree(t, pos) == [(3, 3, 0), (4, 4, 0)]


def test_filter_combinators_hand_cases():
    pos = {0: [1, 10], 1: [3], 2: [2, 11]}
    pair = ("all", (("leaf", 0), ("leaf", 1)), False, None)  # (1,3)
    # minimal pairs: (1,3) and (3,10)
    f = ("filter", pair, ("leaf", 2), "containing")
    assert eval_tree(f, pos) == [(1, 3, 1)]  # contains 2; (3,10) doesn't
    f = ("filter", pair, ("leaf", 2), "not_containing")
    assert eval_tree(f, pos) == [(3, 10, 6)]
    f = ("filter", ("leaf", 2), pair, "contained_by")
    assert eval_tree(f, pos) == [(2, 2, 0)]  # 11 outside both pairs
    f = ("filter", ("leaf", 0), ("leaf", 2), "before")
    assert eval_tree(f, pos) == [(1, 1, 0), (10, 10, 0)]  # both < 11
    f = ("filter", ("leaf", 0), ("leaf", 2), "after")
    assert eval_tree(f, pos) == [(10, 10, 0)]
    f = ("filter", pair, ("leaf", 2), "overlapping")
    assert eval_tree(f, pos) == [(1, 3, 1)]
    f = ("filter", pair, ("leaf", 2), "not_overlapping")
    assert eval_tree(f, pos) == [(3, 10, 6)]
    # doc lacking the filter term: positive kinds drop, negations keep
    pos2 = {0: [1], 1: [3]}
    assert eval_tree(("filter", pair, ("leaf", 2), "containing"), pos2) == []
    assert eval_tree(
        ("filter", pair, ("leaf", 2), "not_containing"), pos2
    ) == [(1, 3, 1)]


def test_nested_all_of_over_any_of():
    pos = {0: [2], 1: [10], 2: [4]}
    inner = ("any", (("leaf", 1), ("leaf", 2)))  # {4, 10}
    t = ("all", (("leaf", 0), inner), True, None)
    assert eval_tree(t, pos) == [(2, 4, 1)]


# ------------------------------------------------------- property sweep


def test_engine_equals_brute_force_randomized():
    rng = random.Random(1234)
    mismatches = []
    for trial in range(300):
        n_leaves = rng.randint(2, 4)
        pos = {
            i: sorted(rng.sample(range(0, 30), rng.randint(0, 5)))
            for i in range(n_leaves)
        }

        def leaf(i):
            return ("leaf", i)

        KINDS = [
            "containing", "contained_by", "not_containing",
            "not_contained_by", "overlapping", "not_overlapping",
            "before", "after",
        ]

        def rand_tree(depth):
            if depth == 0 or rng.random() < 0.4:
                return leaf(rng.randrange(n_leaves))
            r = rng.random()
            if r < 0.2:
                return (
                    "filter",
                    rand_tree(depth - 1),
                    rand_tree(depth - 1),
                    rng.choice(KINDS),
                )
            kids = tuple(rand_tree(depth - 1) for _ in range(rng.randint(2, 3)))
            if r < 0.6:
                mg = rng.choice([None, 0, 1, 3, 8])
                return ("all", kids, rng.random() < 0.5, mg)
            return ("any", kids)

        t = rand_tree(2)
        got = eval_tree(t, pos)
        exp = _brute(t, pos)
        if got != exp:
            mismatches.append((t, pos, got, exp))
    assert not mismatches, mismatches[:2]


# ------------------------------------------------------------ end to end


def test_search_index_vs_python_scan(spark, index, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.query.intervals import intervals_search_index
    from dpr_spark.query.phrase import build_positions

    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    positions = build_positions(docs, index.dictionary)

    queries = [
        (0, Match("the café", ordered=True, max_gaps=3)),
        (1, AnyOf([Match("of the", ordered=True, max_gaps=2),
                   Match("café naïve", max_gaps=4)])),
        (2, AllOf([Match("the"), Match("of"), Match("and")], max_gaps=10)),
        (3, Match("zzznope the")),  # OOV leaf -> all_of never matches
        (4, Filtered(Match("of the", ordered=True, max_gaps=2),
                     Match("café"), "not_containing")),
        (5, Filtered(Match("the and", max_gaps=6), Match("café"), "before")),
    ]
    got = {
        (r.qid, r.doc_id): (r.rank, r.n_intervals)
        for r in intervals_search_index(
            spark, index, positions, queries, k=1000
        ).collect()
    }

    # python twin: full scan, independent brute evaluator
    def tok(text):
        return tokenize(normalize_question(text))

    def compile_brute(rule, leaf_of):
        if isinstance(rule, Match):
            leaves = []
            for t in tok(rule.text):
                leaf_of.setdefault(t, len(leaf_of))
                leaves.append(("leaf", leaf_of[t]))
            if len(leaves) == 1:
                return leaves[0]
            return ("all", tuple(leaves), rule.ordered, rule.max_gaps)
        if isinstance(rule, AllOf):
            return ("all", tuple(compile_brute(c, leaf_of) for c in rule.children),
                    rule.ordered, rule.max_gaps)
        if isinstance(rule, Filtered):
            return ("filter", compile_brute(rule.source, leaf_of),
                    compile_brute(rule.filter, leaf_of), rule.kind)
        return ("any", tuple(compile_brute(c, leaf_of) for c in rule.children))

    exp = {}
    for qid, rule in queries:
        leaf_of = {}
        t = compile_brute(rule, leaf_of)
        per_doc = []
        for _, row in pw.iterrows():
            toks = tok(row.text)
            pos = {}
            for i, w in enumerate(toks):
                if w in leaf_of:
                    pos.setdefault(leaf_of[w], []).append(i)
            n = len(_brute(t, pos))
            if n > 0:
                per_doc.append((int(row.doc_id), n))
        per_doc.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, n) in enumerate(per_doc, 1):
            exp[(qid, d)] = (rank, n)

    assert got == exp
    assert not any(q == 3 for (q, _) in got)  # OOV query matched nothing
    assert any(q == 0 for (q, _) in got) and any(q == 1 for (q, _) in got)
