"""Hypothesis property tests: randomized micro-corpora against naive
python semantics — the fuzz layer over the hand-picked fixtures.

Each example builds a real (tiny) index, so examples are capped low;
shrinking still gives a minimal corpus when a property fails.
"""

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ALPHABET = ["aa", "bb", "cc", "dd"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(ALPHABET), min_size=0, max_size=10),
    min_size=2,
    max_size=8,
)
phrase_strategy = st.lists(st.sampled_from(ALPHABET), min_size=2, max_size=3)


def _naive_phrase_counts(tok_docs, phrase):
    out = {}
    n = len(phrase)
    for d, toks in enumerate(tok_docs):
        pf = sum(
            1
            for i in range(len(toks) - n + 1)
            if toks[i : i + n] == phrase
        )
        if pf:
            out[d] = pf
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, phrase=phrase_strategy)
def test_phrase_engines_agree_with_naive_count(spark, docs, phrase):
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.phrase import phrase_search_index
    from dpr_spark.query.shingled import build_shingle_index, phrase_search_shingled

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index_from_docs(sdf.sparkSession, sdf, build_blocks=False,
                                build_positional=True)
    q = [(0, " ".join(phrase))]
    uni = {
        (r.doc_id): r.score
        for r in phrase_search_index(spark, idx, idx.positions, q, k=100).collect()
    }
    expected_docs = set(_naive_phrase_counts(docs, phrase))
    assert set(uni) == expected_docs
    # the shingled engine is bit-identical on every example
    sidx = build_shingle_index(spark, sdf)
    shi = {
        (r.doc_id): r.score
        for r in phrase_search_shingled(spark, idx, sidx, q, k=100).collect()
    }
    assert shi == uni


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        max_size=20,
        unique=True,
    )
)
def test_pagerank_matches_python_on_random_digraphs(spark, edges):
    from dpr_spark.extras.graph import SCALE, pagerank

    nodes = list(range(10))
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long") if edges else (
        spark.createDataFrame([], "src long, dst long")
    )
    got = {r.node: r.pr for r in pagerank(ndf, edf, n_iter=3).collect()}

    od = collections.Counter(s for s, _ in edges)
    rank = {v: SCALE for v in nodes}
    tele = (SCALE * 15) // 100
    for _ in range(3):
        dang = sum(rank[v] for v in nodes if od[v] == 0)
        dsh = dang // len(nodes)
        s = collections.Counter()
        for u, v in edges:
            s[v] += rank[u] // od[u]
        rank = {v: tele + (85 * (s[v] + dsh)) // 100 for v in nodes}
    assert got == rank


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user
        st.integers(min_value=0, max_value=50),         # seconds
        st.sampled_from(["A", "B", "C"]),               # type
    ),
    min_size=0,
    max_size=25,
)


def _naive_sequences(rows, steps, maxspan):
    """Brute-force greedy earliest-strictly-after chains."""
    out = []
    by_user = collections.defaultdict(list)
    for u, s, t in rows:
        by_user[u].append((s, t))
    for u, evs in by_user.items():
        for s0, t0 in evs:
            if t0 != steps[0]:
                continue
            chain = [s0]
            ok = True
            for st_ in steps[1:]:
                nxts = [s for s, t in evs if t == st_ and s > chain[-1]]
                if not nxts:
                    ok = False
                    break
                chain.append(min(nxts))
            if ok and chain[-1] - chain[0] <= maxspan:
                out.append((u, *chain))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_eql_sequence_agrees_with_naive(spark, rows):
    import datetime

    from dpr_spark.extras.eql import sequence_match

    T0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, T0 + datetime.timedelta(seconds=s), t) for u, s, t in rows]
        or [(99, T0, "X")],  # createDataFrame needs >= 1 row
        "user_id long, ts timestamp, event_type string",
    )
    got = sorted(
        (r.user_id, *[int((getattr(r, f"t{i}") - T0).total_seconds())
                      for i in range(1, 4)])
        for r in sequence_match(
            ev, ["A", "B", "C"], maxspan_seconds=30
        ).collect()
    )
    assert got == _naive_sequences(rows, ["A", "B", "C"], 30)
